"""Template compile + recursive match (the reference's heart).

Re-expresses, from public knowledge, ``weakscraper/template.py::
Template.__init__ / compare / compare_wrapper`` of the
``y2kconnect/weakscraper`` repo (reconstructed — SURVEY.md §0, §2.2
C2/C3, §2.3 D1–D12; the local reference checkout is empty, so the
precise semantics written here ARE this engine's reference behavior,
as FIXTURES.md sanctions).

Directive vocabulary (attrs on template tags unless noted):

- ``wp-name="k"``       capture this node's text content under ``k``
- ``wp-name-attrs="k"`` capture this node's HTML attrs dict under ``k``
- ``wp-recursive``      capture the whole subtree (serialized HTML);
                        node is a match leaf
- ``wp-leaf``           assert the matched HTML node has no children
- ``wp-function="f"``   post-process the text capture with
                        ``functions["f"]``
- ``wp-function-attrs="f"`` same for the attrs capture
- ``wp-list``           node may repeat 0..n times among siblings;
                        captures append to ``results[k]`` (list of dict)
- ``wp-optional``       node may be absent (0 or 1 matches)
- ``wp-ignore-content`` match the node, do not descend; its content is
                        boilerplate
- ``wp-ignore-attrs``   do not require the HTML node's attrs to equal
                        the template's
- ``<wp-ignore/>``      (tag among children) wildcard: arbitrary
                        unmatched HTML siblings may appear and are
                        skipped as boilerplate
- ``<wp-nugget wp-name="k"/>`` (tag inside a text run) capture a text
                        fragment; a run of literal texts + nuggets
                        compiles to one texts-and-nuggets regex matcher
                        aligned against a single HTML text node

Engine-defined clarifications (deterministic, documented because the
reference is empty):

- a ``wp-name`` tag node with NO template children captures
  ``text_content`` of the HTML node and does not constrain the HTML
  node's children (capture-content leaf);
- a ``wp-name`` tag node WITH children matches children normally and
  additionally captures the node's full ``text_content``;
- results are a FLAT dict by default, except ``wp-list`` items, which
  each get their own nested dict. ``Template(..., nested=True)``
  switches to the reconstructed reference shape (SURVEY.md §1.1
  "Results: nested dict keyed by wp-name values"): a named tag node
  with named descendants yields ``results[k] = {**child_captures,
  "content": matched_text}`` — child captures nest under their
  ancestor's key instead of landing in the top-level dict;
- ``extracted_text`` is the "\\n"-join, in document order, of every
  HTML text fragment that was *matched or captured* (boilerplate —
  wildcard-skips and ignored content — is excluded);
- ``spans`` are ``(name, start, end)`` character offsets of each text
  capture within ``extracted_text``.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from .dom import parse, serialize, text_bytes, text_content
from .exceptions import (
    AttrsMismatch,
    ExcessNode,
    LeafViolation,
    MissingNode,
    NodetypeMismatch,
    TagMismatch,
    TemplateError,
    TemplateMismatch,
    TextMismatch,
)

_WP_ATTRS = (
    "wp-name",
    "wp-name-attrs",
    "wp-recursive",
    "wp-leaf",
    "wp-function",
    "wp-function-attrs",
    "wp-list",
    "wp-optional",
    "wp-ignore-content",
    "wp-ignore-attrs",
)


class _Ctx:
    """Accumulates match output; forkable for backtracking trials."""

    __slots__ = ("results", "kept", "spans", "nodes_matched", "boilerplate", "cur")

    def __init__(self, cur: int = 0):
        self.results: dict[str, Any] = {}
        self.kept: list[str] = []
        self.spans: list[tuple[str, int, int]] = []
        self.nodes_matched = 0
        self.boilerplate = 0
        self.cur = cur  # char length of extracted_text so far (global)

    def append_text(self, t: str) -> tuple[int, int]:
        """Append a kept text fragment; return its (start, end) span."""
        start = self.cur + 1 if self.cur else 0
        self.kept.append(t)
        self.cur = start + len(t)
        return start, self.cur

    def fork(self) -> "_Ctx":
        return _Ctx(cur=self.cur)

    def merge(self, sub: "_Ctx", *, results: bool = True) -> None:
        if results:
            self.results.update(sub.results)
        self.kept.extend(sub.kept)
        self.spans.extend(sub.spans)
        self.nodes_matched += sub.nodes_matched
        self.boilerplate += sub.boilerplate
        self.cur = sub.cur


class MatchResult:
    __slots__ = ("fields", "extracted_text", "spans", "nodes_matched", "boilerplate_bytes")

    def __init__(self, ctx: _Ctx):
        self.fields = ctx.results
        self.extracted_text = "\n".join(ctx.kept)
        self.spans = ctx.spans
        self.nodes_matched = ctx.nodes_matched
        self.boilerplate_bytes = ctx.boilerplate


class _TextsAndNuggets:
    """A run of literal texts and <wp-nugget> markers compiled into one
    regex matched against a single HTML text node (SURVEY.md D12)."""

    kind = "texts_and_nuggets"
    is_list = False
    is_optional = False

    def __init__(self, run: list[dict], functions: dict[str, Callable]):
        pattern_parts: list[str] = ["^"]
        self.nuggets: list[tuple[str, Callable | None]] = []
        literal: list[str] = []
        for node in run:
            if node["nodetype"] == "text":
                pattern_parts.append(re.escape(node["content"]))
                literal.append(node["content"])
            else:  # wp-nugget tag
                attrs = node["attrs"]
                name = attrs.get("wp-name")
                if not name:
                    raise TemplateError("<wp-nugget> requires wp-name")
                fn = _resolve_fn(attrs.get("wp-function"), functions)
                self.nuggets.append((name, fn))
                pattern_parts.append("(.*?)")
        pattern_parts.append("$")
        self.literal_text = " ".join(literal)
        self.regex = re.compile("".join(pattern_parts), re.S) if self.nuggets else None

    def probe(self, hnode: dict) -> bool:
        """Cheap can-this-possibly-match check (no exception, no ctx
        fork) — lets the wildcard scan skip non-candidates without the
        cost of a raised TemplateMismatch per skipped sibling."""
        if hnode["nodetype"] != "text":
            return False
        if self.regex is None:
            return hnode["content"] == self.literal_text
        return True

    def match(self, hnode: dict, ctx: _Ctx) -> None:
        if hnode["nodetype"] != "text":
            raise NodetypeMismatch(
                f"expected text node, got {hnode['nodetype']}", html_node=hnode
            )
        content = hnode["content"]
        if self.regex is None:
            if content != self.literal_text:
                raise TextMismatch(
                    f"expected {self.literal_text!r}, got {content!r}", html_node=hnode
                )
            ctx.append_text(content)
            ctx.nodes_matched += 1
            return
        m = self.regex.match(content)
        if not m:
            raise TextMismatch(
                f"text {content!r} does not fit template run", html_node=hnode
            )
        base, _ = ctx.append_text(content)
        ctx.nodes_matched += 1
        for i, (name, fn) in enumerate(self.nuggets, start=1):
            raw = m.group(i)
            value = raw.strip()
            gstart, _gend = m.span(i)
            lead = len(raw) - len(raw.lstrip())
            ctx.spans.append((name, base + gstart + lead, base + gstart + lead + len(value)))
            ctx.results[name] = fn(value) if fn else value


def _resolve_fn(name: str | None, functions: dict[str, Callable]) -> Callable | None:
    if name is None:
        return None
    try:
        return functions[name]
    except KeyError:
        raise TemplateError(f"wp-function {name!r} not in functions registry") from None


class _TagTemplate:
    """One compiled template tag node (SURVEY.md C2)."""

    kind = "tag"

    __slots__ = (
        "name", "attrs", "children", "wildcard",
        "name_key", "name_attrs_key", "recursive", "leaf",
        "function", "function_attrs", "is_list", "is_optional",
        "ignore_content", "ignore_attrs", "nested",
    )

    def __init__(self, raw: dict, functions: dict[str, Callable],
                 nested: bool = False):
        attrs = dict(raw["attrs"])
        self.name = raw["name"]
        self.name_key = attrs.pop("wp-name", None)
        self.name_attrs_key = attrs.pop("wp-name-attrs", None)
        self.recursive = "wp-recursive" in attrs
        attrs.pop("wp-recursive", None)
        self.leaf = "wp-leaf" in attrs
        attrs.pop("wp-leaf", None)
        self.function = _resolve_fn(attrs.pop("wp-function", None), functions)
        self.function_attrs = _resolve_fn(attrs.pop("wp-function-attrs", None), functions)
        self.is_list = "wp-list" in attrs
        attrs.pop("wp-list", None)
        self.is_optional = "wp-optional" in attrs
        attrs.pop("wp-optional", None)
        self.ignore_content = "wp-ignore-content" in attrs
        attrs.pop("wp-ignore-content", None)
        self.ignore_attrs = "wp-ignore-attrs" in attrs
        attrs.pop("wp-ignore-attrs", None)
        self.attrs = attrs
        if self.is_list and not self.name_key:
            raise TemplateError("wp-list requires wp-name")
        if self.recursive and not self.name_key:
            raise TemplateError("wp-recursive requires wp-name")
        self.nested = nested
        self.children, self.wildcard = _compile_children(
            raw["children"], functions, nested
        )

    def probe(self, hnode: dict) -> bool:
        """Cheap top-level mismatch filter (see _TextsAndNuggets.probe)."""
        if hnode["nodetype"] != "tag" or hnode["name"] != self.name:
            return False
        return self.ignore_attrs or hnode["attrs"] == self.attrs

    # -- matching -------------------------------------------------------
    def match(self, hnode: dict, ctx: _Ctx) -> None:
        if hnode["nodetype"] != "tag":
            raise NodetypeMismatch(
                f"expected tag <{self.name}>, got {hnode['nodetype']}",
                html_node=hnode,
            )
        if hnode["name"] != self.name:
            raise TagMismatch(
                f"expected <{self.name}>, got <{hnode['name']}>", html_node=hnode
            )
        if not self.ignore_attrs and hnode["attrs"] != self.attrs:
            raise AttrsMismatch(
                f"<{self.name}> attrs {hnode['attrs']!r} != {self.attrs!r}",
                html_node=hnode,
            )
        if self.leaf and hnode["children"]:
            raise LeafViolation(f"<{self.name}> expected to be a leaf", html_node=hnode)
        ctx.nodes_matched += 1

        if self.recursive:
            captured = "".join(serialize(c) for c in hnode["children"])
            txt = text_content(hnode)
            if txt:
                start, end = ctx.append_text(txt)
                ctx.spans.append((self.name_key, start, end))
            else:
                ctx.spans.append((self.name_key, ctx.cur, ctx.cur))
            ctx.results[self.name_key] = (
                self.function(captured) if self.function else captured
            )
        elif self.ignore_content:
            ctx.boilerplate += text_bytes(hnode)
        elif not self.children and self.name_key:
            # capture-content leaf: grab text, don't constrain children.
            # For wp-list nodes the wp-name names the LIST itself (the
            # alignment loop owns that key); each item's own text goes
            # under "content" in its item dict.
            key = "content" if self.is_list else self.name_key
            value = text_content(hnode)
            if value:
                start, end = ctx.append_text(value)
            else:
                start = end = ctx.cur
            ctx.spans.append((key, start, end))
            ctx.results[key] = self.function(value) if self.function else value
        elif self.nested and self.name_key and not self.is_list:
            # nested-results mode (reconstructed reference shape):
            # descendants' captures collect in a CHILD dict under this
            # node's key instead of the enclosing scope's dict
            start_pos = ctx.cur
            k0 = len(ctx.kept)
            sub = ctx.fork()
            _match_children(self.children, hnode["children"], sub, self.wildcard)
            ctx.merge(sub, results=False)
            value = "\n".join(ctx.kept[k0:])
            if len(ctx.kept) > k0 and start_pos > 0:
                start_pos += 1
            ctx.spans.append((self.name_key, start_pos, ctx.cur))
            captured: Any = dict(sub.results) if sub.results else value
            if sub.results:
                captured.setdefault("content", value)
            ctx.results[self.name_key] = (
                self.function(captured) if self.function else captured
            )
        else:
            start_pos = ctx.cur
            k0 = len(ctx.kept)
            _match_children(self.children, hnode["children"], ctx, self.wildcard)
            if self.name_key and not self.is_list:
                # capture = the MATCHED text under this node (wildcard
                # skips / ignored content excluded), not raw subtree text
                value = "\n".join(ctx.kept[k0:])
                # span starts at the first appended fragment (skip the
                # "\n" separator that precedes it in extracted_text)
                if len(ctx.kept) > k0 and start_pos > 0:
                    start_pos += 1
                ctx.spans.append((self.name_key, start_pos, ctx.cur))
                ctx.results[self.name_key] = (
                    self.function(value) if self.function else value
                )

        if self.name_attrs_key:
            adict = dict(hnode["attrs"])
            ctx.results[self.name_attrs_key] = (
                self.function_attrs(adict) if self.function_attrs else adict
            )


def _compile_children(
    raw_children: list[dict], functions: dict[str, Callable], nested: bool = False
) -> tuple[list, bool]:
    """Group text/<wp-nugget> runs, detect <wp-ignore> wildcard mode,
    compile tag children recursively."""
    wildcard = any(
        c["nodetype"] == "tag" and c["name"] == "wp-ignore" for c in raw_children
    )
    compiled: list = []
    run: list[dict] = []

    def flush_run() -> None:
        if run:
            compiled.append(_TextsAndNuggets(list(run), functions))
            run.clear()

    for c in raw_children:
        if c["nodetype"] == "text" or (
            c["nodetype"] == "tag" and c["name"] == "wp-nugget"
        ):
            run.append(c)
        elif c["nodetype"] == "tag" and c["name"] == "wp-ignore":
            flush_run()
        else:
            flush_run()
            compiled.append(_TagTemplate(c, functions, nested))
    flush_run()
    return compiled, wildcard


def _match_children(
    tchildren: list, hchildren: list[dict], ctx: _Ctx, wildcard: bool
) -> None:
    """Ordered child alignment with wildcard skipping, wp-optional
    backtracking and wp-list greedy repetition (SURVEY.md C3)."""
    hi = 0
    n = len(hchildren)
    for tc in tchildren:
        if tc.is_list:
            items = ctx.results.setdefault(tc.name_key, [])
            if wildcard:
                # scan forward (in a trial) to the first occurrence
                scan = ctx.fork()
                pos = hi
                first = None
                while pos < n:
                    h = hchildren[pos]
                    if not tc.probe(h):  # cheap skip: no fork, no raise
                        scan.boilerplate += text_bytes(h)
                        pos += 1
                        continue
                    sub = scan.fork()
                    try:
                        tc.match(h, sub)
                    except TemplateMismatch:
                        scan.boilerplate += text_bytes(h)
                        pos += 1
                        continue
                    first = (pos, sub)
                    break
                if first is None:
                    continue  # zero occurrences: rewind, no boilerplate charged
                pos, sub = first
                ctx.merge(scan, results=False)
                ctx.merge(sub, results=False)
                items.append(sub.results)
                hi = pos + 1
            # greedy consume consecutive occurrences
            while hi < n:
                if not tc.probe(hchildren[hi]):
                    break
                sub = ctx.fork()
                try:
                    tc.match(hchildren[hi], sub)
                except TemplateMismatch:
                    break
                ctx.merge(sub, results=False)
                items.append(sub.results)
                hi += 1
        elif tc.is_optional:
            if wildcard:
                scan = ctx.fork()
                pos = hi
                hit = None
                while pos < n:
                    h = hchildren[pos]
                    if not tc.probe(h):
                        scan.boilerplate += text_bytes(h)
                        pos += 1
                        continue
                    sub = scan.fork()
                    try:
                        tc.match(h, sub)
                    except TemplateMismatch:
                        scan.boilerplate += text_bytes(h)
                        pos += 1
                        continue
                    hit = (pos, sub)
                    break
                if hit is not None:
                    pos, sub = hit
                    ctx.merge(scan, results=False)
                    ctx.merge(sub)
                    hi = pos + 1
                # absent: rewind (no skip charged; later children rescan)
            else:
                if hi < n:
                    sub = ctx.fork()
                    try:
                        tc.match(hchildren[hi], sub)
                    except TemplateMismatch:
                        pass
                    else:
                        ctx.merge(sub)
                        hi += 1
        else:  # required child
            if wildcard:
                scan = ctx.fork()
                pos = hi
                while pos < n:
                    h = hchildren[pos]
                    if not tc.probe(h):
                        scan.boilerplate += text_bytes(h)
                        pos += 1
                        continue
                    sub = scan.fork()
                    try:
                        tc.match(h, sub)
                    except TemplateMismatch:
                        scan.boilerplate += text_bytes(h)
                        pos += 1
                        continue
                    ctx.merge(scan, results=False)
                    ctx.merge(sub)
                    hi = pos + 1
                    break
                else:
                    raise MissingNode(
                        f"no HTML sibling matches required template child",
                        template_node=tc,
                    )
            else:
                if hi >= n:
                    raise MissingNode(
                        "HTML children exhausted before template children",
                        template_node=tc,
                    )
                tc.match(hchildren[hi], ctx)
                hi += 1
    if hi < n:
        if wildcard:
            for rest in hchildren[hi:]:
                ctx.boilerplate += text_bytes(rest)
        else:
            raise ExcessNode(
                f"{n - hi} unmatched trailing HTML children", html_node=hchildren[hi]
            )


class Template:
    """Compiled template: ``Template(template_html, functions).match(page_html)``.

    Compile once (per actor, SURVEY.md ST1); ``match`` / ``match_tree``
    are pure and reusable across rows.
    """

    def __init__(self, template_html: str, functions: dict[str, Callable] | None = None,
                 nested: bool = False):
        self.functions = functions or {}
        raw = parse(template_html)
        self.children, self.wildcard = _compile_children(
            raw["children"], self.functions, nested
        )

    def match_tree(self, page_root: dict) -> MatchResult:
        ctx = _Ctx()
        _match_children(self.children, page_root["children"], ctx, self.wildcard)
        return MatchResult(ctx)

    def match(self, page_html: str) -> MatchResult:
        return self.match_tree(parse(page_html))
