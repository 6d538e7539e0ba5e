"""Lightweight DOM: HTML string -> nested-dict tree.

Re-expresses the reference parser semantics (reconstructed in
SURVEY.md §1.1 / §2.2 C1 from the public ``y2kconnect/weakscraper``
repo, ``weakscraper/htmlparser.py::Parser`` — the local reference
checkout is empty, see SURVEY.md §0) on top of the stdlib
``html.parser.HTMLParser``.

Node shapes (plain dicts so they serialize trivially and never cross
the Arrow boundary — they live only inside ``map_batches`` UDFs):

- root:  ``{"nodetype": "root", "children": [...]}``
- tag:   ``{"nodetype": "tag", "name": str, "attrs": {str: str},
  "children": [...]}``
- text:  ``{"nodetype": "text", "content": str}``

Normalization rules (SURVEY.md §1.3 — these define the per-turn
text-equality contract for this engine, since the reference is empty
and FIXTURES.md sanctions the synthesized semantics as the oracle):

- tag names lowercased (stdlib behavior);
- attrs dict; valueless attributes map to ``""``;
- text content stripped of leading/trailing whitespace; interior
  whitespace runs collapsed to a single space;
- whitespace-only text nodes dropped;
- HTML void elements treated as childless even without ``/>``;
- ``<!DOCTYPE ...>`` and comments consumed and dropped;
- ``<script>``/``<style>`` raw content kept as a text child (stdlib
  CDATA handling), subject to the same normalization.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

_WS_RUN = re.compile(r"\s+")


def normalize_text(raw: str) -> str:
    """Strip ends and collapse interior whitespace runs to one space."""
    return _WS_RUN.sub(" ", raw).strip()


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root: dict = {"nodetype": "root", "children": []}
        self._stack: list[dict] = [self.root]
        # Adjacent data chunks (e.g. split by charrefs) are buffered and
        # flushed as one text node so "a &amp; b" is a single node.
        self._text_buf: list[str] = []

    # -- text buffering -------------------------------------------------
    def _flush_text(self) -> None:
        if not self._text_buf:
            return
        content = normalize_text("".join(self._text_buf))
        self._text_buf.clear()
        if content:
            self._stack[-1]["children"].append(
                {"nodetype": "text", "content": content}
            )

    # -- HTMLParser hooks ----------------------------------------------
    def handle_starttag(self, tag: str, attrs: list) -> None:
        self._flush_text()
        node = {
            "nodetype": "tag",
            "name": tag,
            "attrs": {k: (v if v is not None else "") for k, v in attrs},
            "children": [],
        }
        self._stack[-1]["children"].append(node)
        if tag not in VOID_ELEMENTS:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        self._flush_text()
        self._stack[-1]["children"].append(
            {
                "nodetype": "tag",
                "name": tag,
                "attrs": {k: (v if v is not None else "") for k, v in attrs},
                "children": [],
            }
        )

    def handle_endtag(self, tag: str) -> None:
        self._flush_text()
        if tag in VOID_ELEMENTS:
            return
        # Pop to the matching open tag; tolerate stray close tags.
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i]["name"] == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        self._text_buf.append(data)

    def handle_entityref(self, name: str) -> None:  # pragma: no cover
        self._text_buf.append(f"&{name};")

    def handle_decl(self, decl: str) -> None:
        self._flush_text()

    def handle_comment(self, data: str) -> None:
        self._flush_text()

    def close(self) -> None:
        super().close()
        self._flush_text()


def parse(html: str) -> dict:
    """Parse an HTML string into the nested-dict DOM (root node)."""
    builder = _DomBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def text_content(node: dict, sep: str = "\n") -> str:
    """Document-order concatenation of all descendant text contents.

    ``sep`` joins distinct text nodes; this is the engine's canonical
    "content of a node as text" rule (SURVEY.md §1.2 extracted_text).
    """
    parts: list[str] = []
    _collect_text(node, parts)
    return sep.join(parts)


def _collect_text(node: dict, out: list[str]) -> None:
    nt = node["nodetype"]
    if nt == "text":
        out.append(node["content"])
        return
    for child in node.get("children", ()):
        _collect_text(child, out)


def text_bytes(node: dict) -> int:
    """UTF-8 byte length of all text content under ``node`` (used for
    ``boilerplate_bytes_stripped`` accounting, SURVEY.md §2.2 C4)."""
    parts: list[str] = []
    _collect_text(node, parts)
    return sum(len(p.encode("utf-8")) for p in parts)


def serialize(node: dict) -> str:
    """Render a DOM node back to normalized HTML (for wp-recursive
    captures and debugging; deterministic attr order = insertion order)."""
    nt = node["nodetype"]
    if nt == "text":
        return node["content"]
    if nt == "root":
        return "".join(serialize(c) for c in node["children"])
    attrs = "".join(
        f' {k}="{v}"' if v != "" else f" {k}" for k, v in node["attrs"].items()
    )
    name = node["name"]
    if name in VOID_ELEMENTS and not node["children"]:
        return f"<{name}{attrs}/>"
    inner = "".join(serialize(c) for c in node["children"])
    return f"<{name}{attrs}>{inner}</{name}>"
