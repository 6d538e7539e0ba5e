"""Render pages FROM templates with seeded fills (FIXTURES.md §1/§2).

The inverse of matching: given a template (the same ``wp-*`` dialect
:mod:`template` compiles), produce a concrete HTML page whose field
values are known by construction, with random boilerplate injected at
wildcard points. This is the engine's strongest oracle given the empty
reference checkout (SURVEY.md §0, §5.2): render → extract must recover
the exact injected values, and the transcripts generator uses it to
build the per-turn expected-output twin table.

Fully deterministic: all randomness flows from the caller's
``random.Random`` instance; no wall clock.
"""

from __future__ import annotations

import random
from typing import Any

from .dom import parse, serialize

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu data stream shard actor block arrow batch"
).split()

_BOILER_TAGS = ("nav", "aside", "footer", "span", "small")


def _words(rng: random.Random, lo: int = 1, hi: int = 5) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(lo, hi)))


def _boiler_node(rng: random.Random) -> dict:
    tag = rng.choice(_BOILER_TAGS)
    children = [{"nodetype": "text", "content": _words(rng, 2, 6)}]
    if rng.random() < 0.3:
        children.append(
            {
                "nodetype": "tag",
                "name": "b",
                "attrs": {},
                "children": [{"nodetype": "text", "content": _words(rng)}],
            }
        )
    return {"nodetype": "tag", "name": tag, "attrs": {"class": "boiler"}, "children": children}


class RenderedPage:
    __slots__ = ("html", "fills")

    def __init__(self, html: str, fills: dict[str, Any]):
        self.html = html
        self.fills = fills


def render(template_html: str, rng: random.Random) -> RenderedPage:
    """Render one page; ``fills`` maps capture names to injected values
    (wp-list names map to a list of per-item dicts)."""
    raw = parse(template_html)
    fills: dict[str, Any] = {}
    children = _render_children(raw["children"], rng, fills)
    html = "".join(serialize(c) for c in children)
    return RenderedPage(html, fills)


def _render_children(
    raw_children: list[dict], rng: random.Random, fills: dict[str, Any]
) -> list[dict]:
    out: list[dict] = []
    for c in raw_children:
        if c["nodetype"] == "text":
            out.append(dict(c))
        elif c["name"] == "wp-nugget":
            name = c["attrs"]["wp-name"]
            value = _words(rng, 1, 3)
            fills[name] = value
            out.append({"nodetype": "text", "content": value})
        elif c["name"] == "wp-ignore":
            for _ in range(rng.randint(0, 3)):
                out.append(_boiler_node(rng))
        else:
            out.extend(_render_tag(c, rng, fills))
    # Adjacent text nodes (literal + nugget values) merge into one HTML
    # text node when reparsed; join them with spaces here so the
    # rendered page round-trips through the normalizing parser.
    merged: list[dict] = []
    for node in out:
        if (
            node["nodetype"] == "text"
            and merged
            and merged[-1]["nodetype"] == "text"
        ):
            merged[-1] = {
                "nodetype": "text",
                "content": f"{merged[-1]['content']} {node['content']}".strip(),
            }
        else:
            merged.append(node)
    return merged


def _render_tag(c: dict, rng: random.Random, fills: dict[str, Any]) -> list[dict]:
    attrs = {k: v for k, v in c["attrs"].items() if not k.startswith("wp-")}
    wp = c["attrs"]
    name_key = wp.get("wp-name")
    is_list = "wp-list" in wp
    is_optional = "wp-optional" in wp
    recursive = "wp-recursive" in wp
    ignore_content = "wp-ignore-content" in wp
    leaf = "wp-leaf" in wp

    if is_optional and rng.random() < 0.5:
        if name_key and not is_list:
            pass  # absent: no fill recorded
        return []

    def render_one(item_fills: dict[str, Any]) -> dict:
        node = {"nodetype": "tag", "name": c["name"], "attrs": dict(attrs), "children": []}
        if "wp-ignore-attrs" in wp and rng.random() < 0.5:
            node["attrs"][f"data-extra{rng.randint(0, 9)}"] = _words(rng, 1, 1)
        if recursive:
            sub = [_boiler_node(rng) for _ in range(rng.randint(1, 2))]
            node["children"] = sub
            item_fills[name_key] = "".join(serialize(s) for s in sub)
        elif ignore_content:
            node["children"] = [_boiler_node(rng) for _ in range(rng.randint(0, 2))]
        elif leaf:
            node["children"] = []
            if name_key:
                item_fills["content" if is_list else name_key] = ""
        elif not c["children"] and name_key:
            value = _words(rng, 1, 4)
            item_fills["content" if is_list else name_key] = value
            node["children"] = [{"nodetype": "text", "content": value}]
        else:
            node["children"] = _render_children(c["children"], rng, item_fills)
            if name_key and not is_list:
                # the matcher captures the matched text; the render-side
                # expectation for container captures is checked via the
                # matcher oracle in the generator, not recorded here
                pass
        return node

    if is_list:
        items: list[dict] = []
        nodes: list[dict] = []
        for _ in range(rng.randint(0, 3)):
            item_fills: dict[str, Any] = {}
            nodes.append(render_one(item_fills))
            items.append(item_fills)
        fills[name_key] = items
        return nodes

    return [render_one(fills)]
