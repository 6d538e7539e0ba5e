"""Template-less main-content extraction: text-density DOM heuristic
(north_rule: "HTML boilerplate strip, PDF/layout parse, DOM
heuristics"; SURVEY.md §2.2 C4 fallback).

Public readability/boilerpipe-style idea re-expressed from scratch:
score every container element by the text it DIRECTLY contains
(favoring long text runs, paragraph children and link-sparse content),
propagate scores to parents, pick the best-scoring subtree as main
content. Pure Python, no Ray; used by the Extractor's
``heuristic_fallback`` path and directly for pages with no template.
"""

from __future__ import annotations

from .dom import parse, text_content

#: elements that never hold main content — their subtree text counts
#: as boilerplate for density scoring
_NOISE_TAGS = frozenset(
    {"nav", "aside", "footer", "header", "script", "style", "form",
     "button", "iframe", "noscript"}
)

_CONTENT_TAGS = frozenset({"p", "article", "section", "main", "pre", "blockquote"})


def _score_node(node: dict, scores: list) -> tuple[int, int, int]:
    """Post-order walk: returns (text_len, link_text_len, n_tags) of the
    subtree; appends (score, node) for container candidates."""
    if node["nodetype"] == "text":
        return len(node["content"]), 0, 0
    name = node.get("name", "")
    if name in _NOISE_TAGS:
        # boilerplate subtree: contributes nothing to any ancestor
        return 0, 0, 1
    text_len = 0
    link_len = 0
    n_tags = 1 if node["nodetype"] == "tag" else 0
    for child in node.get("children", ()):
        t, l, k = _score_node(child, scores)
        text_len += t
        link_len += l
        n_tags += k
    if name == "a":
        link_len = text_len
    if node["nodetype"] == "tag" and name not in ("a", "b", "i", "em", "strong", "span"):
        # density score: text minus links, lightly penalized by markup
        # count, boosted for semantic content containers
        score = (text_len - 2 * link_len) - 3 * n_tags
        if name in _CONTENT_TAGS:
            score = int(score * 1.5)
        scores.append((score, node))
    return text_len, link_len, n_tags


def extract_main_content(html: str) -> tuple[str, int]:
    """Returns (main_text, boilerplate_bytes_stripped).

    main_text = text of the best-scoring container (empty if nothing
    scores positive); boilerplate = total text bytes minus kept bytes.
    """
    root = parse(html)
    scores: list = []
    _score_node(root, scores)
    total_bytes = len(text_content(root).encode("utf-8"))
    if not scores:
        return "", total_bytes
    best_score, best_node = max(scores, key=lambda sn: sn[0])
    if best_score <= 0:
        return "", total_bytes
    # strip noise subtrees inside the winner too
    kept = _text_without_noise(best_node)
    kept_bytes = len(kept.encode("utf-8"))
    return kept, max(0, total_bytes - kept_bytes)


def _text_without_noise(node: dict) -> str:
    parts: list[str] = []
    _collect(node, parts)
    return "\n".join(parts)


def _collect(node: dict, out: list[str]) -> None:
    if node["nodetype"] == "text":
        out.append(node["content"])
        return
    if node.get("name") in _NOISE_TAGS:
        return
    for child in node.get("children", ()):
        _collect(child, out)
