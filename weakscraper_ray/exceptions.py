"""Mismatch-exception hierarchy (SURVEY.md §2.6).

Reconstructed from the public ``y2kconnect/weakscraper`` repo's
``weakscraper/exceptions.py`` (reference checkout empty — SURVEY.md §0;
the *kinds* below are the contract, exact reference class names were
unverifiable). Inside the Ray pipeline these never fail a task: the
extractor catches ``TemplateMismatch`` per row and emits
``status="error"``, ``error_kind=<exc.kind>`` columns.
"""

from __future__ import annotations


class TemplateError(Exception):
    """Template compile-time error (bad directive usage)."""


class TemplateMismatch(Exception):
    """Base class for page-vs-template mismatches raised during match.

    ``kind`` is the stable machine-readable classification recorded in
    the ``error_kind`` output column.
    """

    kind = "mismatch"

    def __init__(self, message: str = "", *, template_node=None, html_node=None):
        super().__init__(message or self.kind)
        self.template_node = template_node
        self.html_node = html_node


class NodetypeMismatch(TemplateMismatch):
    kind = "nodetype_mismatch"


class TagMismatch(TemplateMismatch):
    kind = "tag_mismatch"


class TextMismatch(TemplateMismatch):
    kind = "text_mismatch"


class AttrsMismatch(TemplateMismatch):
    kind = "attrs_mismatch"


class ExcessNode(TemplateMismatch):
    kind = "excess_node"


class MissingNode(TemplateMismatch):
    kind = "missing_node"


class LeafViolation(TemplateMismatch):
    kind = "leaf_violation"


#: every error kind the engine can emit (conformance tests iterate this)
ALL_KINDS = (
    NodetypeMismatch.kind,
    TagMismatch.kind,
    TextMismatch.kind,
    AttrsMismatch.kind,
    ExcessNode.kind,
    MissingNode.kind,
    LeafViolation.kind,
)
