"""Round-3 continuation #13: semiring path-relaxation family — the
same K-round Bellman-Ford skeleton the green ``bfs_hops`` uses
(graph.py:600), instantiated over THREE different semirings, because
that is exactly how production graph engines (Pregel/GraphX's
``aggregateMessages``) generalize one relaxation kernel:

- ``sssp_weighted``  (min, +):    weighted shortest distance
- ``widest_path``    (max, min):  bottleneck bandwidth
- ``walk_counts``    (+, x):      number of distinct walks

Graph: the repo's derived citation graph (graph.py header — dst =
``(src * KNUTH + j) % N``, j = 1..3), with an INTEGER edge weight
``w = 1 + (src + dst) % 7`` derived arithmetically so the oracle can
rebuild the identical weighted edge set.  Seeds: ``doc_id % 97 == 0``
(shared with ``bfs_hops``).

Distributed shape (identical for all three): each round is ONE
``map_batches`` over the labelled frontier (out-edges + weights
derived arithmetically, so expansion ships no edge table) followed by
one ``groupby(node)`` combine (Min / Max / Sum respectively) over the
labelled set only.  Rounds materialize because each reach set is
consumed twice.  K rounds = exact K-hop-bounded semiring distance —
the fixed-round prefix of the full fixpoint; at scale the loop runs
until the frontier is empty, with the identical per-round plan.

Exactness: all carried values are int64 (weights, bottlenecks, walk
counts); Min/Max/Sum are associative and partitioning-independent, so
the result is bit-identical to the unrolled-walk DuckDB mirrors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .graph import _PR_KNUTH, _PR_OUTDEG, _derived_dsts
from .relational import _read

_SEED_MOD = 97
_ROUNDS = 3
#: widest-path convention: a seed's bandwidth to itself is "infinite";
#: both engines use the same integer sentinel so the row is exact.
_WIDEST_INF = 10**9


def _edge_w(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """integer edge weight 1..7, a pure function of the endpoints."""
    return 1 + (src + dst) % 7


def _seeds_table(t: pa.Table, init_val: int) -> pa.Table:
    ids = t.column("doc_id").to_numpy()
    s = ids[ids % _SEED_MOD == 0]
    return pa.table(
        {
            "node": pa.array(s, pa.int64()),
            "val": pa.array(np.full(len(s), init_val, dtype=np.int64)),
        }
    )


def _relax(sf_dir: str, combine: str, init_val: int, step):
    """shared K-round relaxation: ``step(val, w) -> new val`` per edge,
    ``combine`` in {'min','max','sum'} per node."""
    from ray.data.aggregate import Max, Min, Sum

    agg = {"min": Min, "max": Max, "sum": Sum}[combine]

    ds0 = _read(sf_dir, "documents", ["doc_id"])
    n = ds0.count()  # parquet-metadata count

    reach = ds0.map_batches(
        lambda t: _seeds_table(t, init_val), batch_format="pyarrow"
    ).materialize()

    def _expand(t: pa.Table, n=n) -> pa.Table:
        src = t.column("node").to_numpy()
        val = t.column("val").to_numpy()
        dsts = _derived_dsts(src, n)
        nodes, vals = [], []
        for d in dsts:
            nodes.append(d)
            vals.append(step(val, _edge_w(src, d)))
        return pa.table(
            {
                "node": pa.array(np.concatenate(nodes), pa.int64()),
                "val": pa.array(
                    np.concatenate(vals).astype(np.int64), pa.int64()
                ),
            }
        )

    for _ in range(_ROUNDS):
        nxt = reach.map_batches(_expand, batch_format="pyarrow")
        reach = (
            reach.union(nxt)
            .groupby("node")
            .aggregate(agg("val", alias_name="val"))
            .materialize()
        )
    return reach


def q_sssp_weighted(sf_dir: str):
    """(min, +) semiring: exact 3-hop-bounded weighted shortest
    distance from the seed set.  See module docstring."""
    out = _relax(sf_dir, "min", 0, lambda v, w: v + w)
    return out.map_batches(
        lambda t: t.rename_columns(["node", "dist"]), batch_format="pyarrow"
    )


def q_widest_path(sf_dir: str):
    """(max, min) semiring: bottleneck bandwidth — the widest path's
    narrowest edge — from the seed set, 3-hop-bounded."""
    out = _relax(
        sf_dir, "max", _WIDEST_INF, lambda v, w: np.minimum(v, w)
    )
    return out.map_batches(
        lambda t: t.rename_columns(["node", "bandwidth"]),
        batch_format="pyarrow",
    )


def q_walk_counts(sf_dir: str):
    """counting semiring: number of distinct walks of length <= 3 from
    ANY seed to each node (the empty walk counts each seed once) —
    the path-multiplicity pass of influence/contamination audits.

    Unlike min/max, Sum is NOT idempotent, so the union-with-reach
    relaxation of :func:`_relax` would double-count shorter walks.
    The counting recursion instead carries EXACT-length frontiers
    (frontier_{k+1}[v] = sum over in-edges of frontier_k[u]) and
    accumulates them, combining once at the end."""
    from ray.data.aggregate import Sum

    ds0 = _read(sf_dir, "documents", ["doc_id"])
    n = ds0.count()

    frontier = ds0.map_batches(
        lambda t: _seeds_table(t, 1), batch_format="pyarrow"
    ).materialize()

    def _expand(t: pa.Table, n=n) -> pa.Table:
        src = t.column("node").to_numpy()
        val = t.column("val").to_numpy()
        dsts = _derived_dsts(src, n)
        return pa.table(
            {
                "node": pa.array(np.concatenate(dsts), pa.int64()),
                "val": pa.array(
                    np.concatenate([val] * len(dsts)).astype(np.int64)
                ),
            }
        )

    acc = frontier
    for _ in range(_ROUNDS):
        frontier = (
            frontier.map_batches(_expand, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("val", alias_name="val"))
            .materialize()
        )
        acc = acc.union(frontier)
    out = acc.groupby("node").aggregate(Sum("val", alias_name="val"))
    return out.map_batches(
        lambda t: t.rename_columns(["node", "n_walks"]),
        batch_format="pyarrow",
    )


def _walks_cte() -> str:
    """shared unrolled-walk CTE prefix: the weighted edge set and the
    per-round relaxation tables d0..d3 carrying (node, dist, band)."""
    return f"""
WITH nodes AS (SELECT doc_id FROM documents),
p AS (SELECT cast(count(*) AS BIGINT) AS n FROM nodes),
e AS (SELECT src, dst, 1 + (src + dst) % 7 AS w
      FROM (SELECT n.doc_id AS src,
                   (n.doc_id * {_PR_KNUTH} + j.j) % p.n AS dst
            FROM nodes n, p, range(1, {_PR_OUTDEG + 1}) j(j))),
d0 AS (SELECT doc_id AS node, cast(0 AS BIGINT) AS dist,
              cast({_WIDEST_INF} AS BIGINT) AS band
       FROM nodes WHERE doc_id % {_SEED_MOD} = 0),
d1 AS (SELECT e.dst AS node, d0.dist + e.w AS dist,
              least(d0.band, e.w) AS band
       FROM d0 JOIN e ON e.src = d0.node),
d2 AS (SELECT e.dst AS node, d1.dist + e.w AS dist,
              least(d1.band, e.w) AS band
       FROM d1 JOIN e ON e.src = d1.node),
d3 AS (SELECT e.dst AS node, d2.dist + e.w AS dist,
              least(d2.band, e.w) AS band
       FROM d2 JOIN e ON e.src = d2.node),
allw AS (SELECT * FROM d0 UNION ALL SELECT * FROM d1
         UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3)
"""


SQL_SSSP = (
    _walks_cte()
    + "SELECT node, min(dist) AS dist FROM allw GROUP BY node"
)

SQL_WIDEST = (
    _walks_cte()
    + "SELECT node, max(band) AS bandwidth FROM allw GROUP BY node"
)

SQL_WALK_COUNTS = (
    _walks_cte()
    + "SELECT node, cast(count(*) AS BIGINT) AS n_walks "
    "FROM allw GROUP BY node"
)


QUERIES = {
    "sssp_weighted": q_sssp_weighted,
    "widest_path": q_widest_path,
    "walk_counts": q_walk_counts,
}

ORACLE_SQL = {
    "sssp_weighted": SQL_SSSP,
    "widest_path": SQL_WIDEST,
    "walk_counts": SQL_WALK_COUNTS,
}

# self-register (same pattern as graph.py)
from . import relational as _rel  # noqa: E402

_rel.QUERIES.update(QUERIES)
_rel.ORACLE_SQL.update(ORACLE_SQL)
