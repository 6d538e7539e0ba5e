"""Skeleton-template learner (BASELINE.json north_star: "learn a
skeleton template by DOM-tree diffing sample pages (marking
wildcard/texts-and-nugget nodes as weakscraper does)").

Pure Python, deterministic. Given k sample DOM trees presumed to come
from the same page source:

- positions where all samples agree on (tag, attrs) → structural
  template node, recurse into children;
- text positions where all samples carry the SAME text → literal text;
- text positions where samples diverge → a ``<wp-nugget>`` capture
  (auto-named ``f0, f1, ...`` in discovery order);
- child positions/subtrees that are not common to all samples →
  ``<wp-ignore/>`` wildcard;
- attrs that diverge across samples → ``wp-ignore-attrs``.

Child alignment across samples uses longest-common-subsequence on node
signatures (tag name / "#text"), anchored on the first sample —
a classic tree-diff/wrapper-induction shape (see PAPERS.md; public
RoadRunner-style idea re-expressed from scratch).

The learned skeleton is emitted as template HTML in the same ``wp-*``
dialect :mod:`template` compiles, so learned and hand-written
templates flow through the identical extraction path (SURVEY.md ST4).
"""

from __future__ import annotations

from .dom import parse


def _sig(node: dict) -> str:
    """Alignment signature: tag name (text nodes all share '#text').
    Attrs deliberately excluded — divergent attrs must still align so
    they can become ``wp-ignore-attrs``; same-tag boilerplate collisions
    are resolved by the subtree-size weighting instead."""
    if node["nodetype"] == "text":
        return "#text"
    return node["name"]


def _weight(node: dict) -> int:
    """Subtree node count — weighted LCS prefers aligning the big
    content subtree over same-signature boilerplate leaves."""
    if node["nodetype"] == "text":
        return 1
    return 1 + sum(_weight(c) for c in node.get("children", ()))


def _lcs_pairs(a: list[dict], b: list[dict]) -> list[tuple[int, int]]:
    """Index pairs of the maximum-weight common subsequence of two
    child lists by signature, weighted by subtree size."""
    n, m = len(a), len(b)
    wa = [_weight(x) for x in a]
    wb = [_weight(x) for x in b]
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n - 1, -1, -1):
        for j in range(m - 1, -1, -1):
            best = max(dp[i + 1][j], dp[i][j + 1])
            if _sig(a[i]) == _sig(b[j]):
                best = max(best, min(wa[i], wb[j]) + dp[i + 1][j + 1])
            dp[i][j] = best
    out = []
    i = j = 0
    while i < n and j < m:
        if (
            _sig(a[i]) == _sig(b[j])
            and dp[i][j] == min(wa[i], wb[j]) + dp[i + 1][j + 1]
        ):
            out.append((i, j))
            i += 1
            j += 1
        elif dp[i + 1][j] >= dp[i][j + 1]:
            i += 1
        else:
            j += 1
    return out


class _NameGen:
    def __init__(self) -> None:
        self.n = 0

    def next(self) -> str:
        name = f"f{self.n}"
        self.n += 1
        return name


def learn(sample_htmls: list[str]) -> str:
    """k sample pages → skeleton template HTML (wp-* dialect)."""
    if not sample_htmls:
        raise ValueError("need at least one sample page")
    roots = [parse(h) for h in sample_htmls]
    names = _NameGen()
    parts = _learn_children([r["children"] for r in roots], names)
    return "".join(parts)


def _learn_children(children_lists: list[list[dict]], names: _NameGen) -> list[str]:
    """Align all samples' child lists against the first sample; emit
    template fragments. Positions not common to all samples (a gap in
    ANY sample) get a ``<wp-ignore/>`` wildcard."""
    anchor = children_lists[0]
    maps: list[dict[int, int]] = []  # per non-anchor sample: anchor idx → its idx
    keep = set(range(len(anchor)))
    for other in children_lists[1:]:
        m = dict(_lcs_pairs(anchor, other))
        maps.append(m)
        keep &= set(m)
    kept = sorted(keep)

    out: list[str] = []
    prev_idx = [-1] * len(children_lists)
    for ai in kept:
        idxs = [ai] + [m[ai] for m in maps]
        if any(idx != prev + 1 for idx, prev in zip(idxs, prev_idx)):
            out.append("<wp-ignore/>")
        nodes = [children_lists[s][idxs[s]] for s in range(len(children_lists))]
        out.extend(_learn_node(nodes, names))
        prev_idx = idxs
    if any(prev + 1 < len(cl) for prev, cl in zip(prev_idx, children_lists)):
        out.append("<wp-ignore/>")
    return out


def _learn_text_run(texts: list[str], names: _NameGen) -> list[str]:
    """Divergent text position → texts-and-nuggets: keep the common
    word-level prefix/suffix as literal anchors, capture the divergent
    middle with a <wp-nugget> (the D12 vocabulary BASELINE.json names)."""
    split = [t.split(" ") for t in texts]
    p = 0
    while all(len(s) > p for s in split) and all(s[p] == split[0][p] for s in split):
        p += 1
    rev = [s[p:][::-1] for s in split]
    q = 0
    while all(len(s) > q for s in rev) and all(s[q] == rev[0][q] for s in rev):
        q += 1
    prefix = " ".join(split[0][:p])
    suffix = " ".join(split[0][len(split[0]) - q :]) if q else ""
    parts: list[str] = []
    if prefix:
        parts.append(prefix + " ")
    parts.append(f"<wp-nugget wp-name='{names.next()}'/>")
    if suffix:
        parts.append(" " + suffix)
    return parts


def _learn_node(nodes: list[dict], names: _NameGen) -> list[str]:
    """All nodes share a signature; emit one template fragment."""
    first = nodes[0]
    if first["nodetype"] == "text":
        texts = [n["content"] for n in nodes]
        if all(t == texts[0] for t in texts):
            return [texts[0]]
        return _learn_text_run(texts, names)
    # tag node
    attrs_equal = all(n["attrs"] == first["attrs"] for n in nodes)
    attr_str = "".join(
        f' {k}="{v}"' if v != "" else f" {k}" for k, v in first["attrs"].items()
    )
    extra = "" if attrs_equal else " wp-ignore-attrs"
    inner = _learn_children([n["children"] for n in nodes], names)
    return [f"<{first['name']}{attr_str}{extra}>", *inner, f"</{first['name']}>"]
