"""Round-3 continuation #15: near-duplicate detection extensions —
the two published dedup families the engine did not yet cover:

- ``dedup_containment`` asymmetric shingle CONTAINMENT (Broder 1997's
                        second resemblance measure, |A∩B|/|A|):
                        catches quote/excerpt/superset duplication
                        that symmetric Jaccard misses — a short doc
                        wholly quoted inside a long one has high
                        containment but low Jaccard, so the MinHash
                        family never pairs them
- ``semdedup``          SemDeDup (Abbas et al. 2023, public arXiv
                        2303.09540): k-means-cluster the embedding
                        space, then prune within-cluster pairs whose
                        cosine exceeds a threshold — the "semantic
                        near-dup" pass production LLM pipelines run
                        AFTER lexical MinHash, implemented here over
                        the integer-exact Lloyd fit shared with
                        ``kmeans_clusters``

Exactness strategy:
- containment is all-integer (``10·|A∩B| ≥ 9·|A|``) over the SAME
  3-gram shingle construction as the MinHash family; the oracle
  reuses relational's ``_SQL_SHINGLE_SH`` CTE verbatim, so the two
  tokenizers cannot drift.
- semdedup's cosine test runs on the e6-quantized integer grid:
  cos(a,b) ≥ τ  ⟺  dot > 0 ∧ 400·dot² ≥ 49·|a|²·|b|²  for τ = 0.35
  (= 7/20, so τ² = 49/400 exactly; testdata embeddings are random —
  see relational._NEARDUP_THRESHOLD — production τ ≈ 0.95 = 19/20 is
  the same rational shape).  dot ≤ 64·(0.53e6)² ≈ 1.8e13 fits int64;
  its SQUARE does not, so the comparison runs in Python-int (object
  dtype) arithmetic — exact, no ulp anywhere.  The oracle is an
  independent single-threaded twin (per-pair loop; the Ray path is a
  per-cluster matmul + lower-triangle scan), written to parquet like
  the kmeans twin.

Scale shape:
- containment: per-batch distinct (gram, doc, |A|) partials → ONE
  gram-hash shard exchange (a gram lives in exactly one shard, so
  per-shard pair counts SUM to the exact intersection — no pair
  dedupe pass) → bounded ``groupby(pair)`` roll-up.  Pair volume is
  bounded by gram co-occurrence, the same profile as
  ``dup_ngram_fraction``/``source_overlap``; at 100 TB the gram
  string becomes a 64-bit hash (same documented swap).
- semdedup: ONE extra labeling scan over the kmeans fit's cached
  working set + a ``groupby(cluster)`` exchange whose groups are the
  clusters themselves — the SemDeDup paper's own partitioning (its
  clusters are capped; skewed clusters split by re-clustering, noted
  on the query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray  # noqa: F401  (kept for parity with sibling modules)

from . import relational as _rel
from .relational import _read, _schema_guard

#: containment threshold C ≥ 0.9 as the integer pair (num, den)
_CONT_NUM = 9
_CONT_DEN = 10
_CONT_SHARDS = 64

#: semdedup cosine threshold τ = 0.35 (testdata embeddings are random;
#: τ² = 49/400 exactly — see module docstring)
_SEM_NUM2 = 49    # 400·dot² ≥ 49·|a|²·|b|²
_SEM_DEN2 = 400

#: stage-1 shard count for the dedup_chain exact pass (bounded-
#: cardinality exchange key; per-shard work is vectorized, so this is
#: a parallelism knob, not a correctness one)
_CHAIN_SHARDS = 256


# =====================================================================
# Asymmetric shingle containment (Broder's second measure)
# =====================================================================


def _shingle_partial(batch: pa.Table) -> pa.Table:
    """Distinct (gram, doc, |A|) rows for a documents batch — the
    3-gram shingle construction of the MinHash family (same tokenizer:
    lower → \\s+ split → empty tokens dropped), with the doc's distinct
    shingle-set size riding along so the roll-up needs no second
    join/broadcast for |A|."""
    from .curation import _explode_tokens

    rows, toks = _explode_tokens(batch)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    empty = pa.table(
        {
            "gram": pa.array([], pa.string()),
            "shard": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "na": pa.array([], pa.int64()),
        }
    )
    if len(toks) < 3:
        return empty
    valid = rows[:-2] == rows[2:]
    if not valid.any():
        return empty
    gram = (
        toks[:-2].astype(object)
        + " " + toks[1:-1].astype(object)
        + " " + toks[2:].astype(object)
    )
    df = pd.DataFrame(
        {"doc": ids[rows[:-2][valid]], "gram": gram[valid]}
    ).drop_duplicates()
    sizes = df.groupby("doc", sort=False)["gram"].transform("size")
    grams = df["gram"].to_numpy()
    return pa.table(
        {
            "gram": pa.array(grams, pa.string()),
            "shard": pa.array(
                (pd.util.hash_array(grams.astype("O")) % _CONT_SHARDS
                 ).astype("int64")
            ),
            "doc_id": pa.array(df["doc"].to_numpy(), pa.int64()),
            "na": pa.array(sizes.to_numpy(), pa.int64()),
        }
    )


#: second-exchange shard count for the pair roll-up (the pair-key
#: domain grows with data, but a groupby over ~10^6 DISTINCT pair keys
#: hits Ray's high-cardinality hash-aggregate degradation — the
#: theta_join_cdf lesson — so the roll-up is re-keyed onto a BOUNDED
#: shard exchange and folded with one C-level pandas groupby per shard)
_CONT_PAIR_SHARDS = 256


def _shard_pairs(shard: pd.DataFrame) -> pd.DataFrame:
    """Per-shard pair partials: a gram lives in exactly ONE shard, so
    per-shard pair counts SUM globally to the exact |A∩B| — no pair
    dedupe exchange needed (contrast the retired 5×-replicated ssjoin
    design).  |A|/|B| ride along (identical on every shard).  The pair
    is packed into one int64 (doc ids < 2^31 — the itemset_pairs
    idiom) keyed to a bounded pair shard for the roll-up."""
    d = shard[["gram", "doc_id", "na"]]
    m = d.merge(d, on="gram")
    m = m[m["doc_id_x"] < m["doc_id_y"]]
    if m.empty:
        return pd.DataFrame(
            {
                "pshard": pd.array([], dtype="int64"),
                "pair": pd.array([], dtype="int64"),
                "shared": pd.array([], dtype="int64"),
                "na": pd.array([], dtype="int64"),
                "nb": pd.array([], dtype="int64"),
            }
        )
    pair = (m["doc_id_x"].to_numpy(np.int64) << np.int64(32)) | m[
        "doc_id_y"
    ].to_numpy(np.int64)
    g = (
        pd.DataFrame(
            {"pair": pair, "na": m["na_x"].to_numpy(np.int64),
             "nb": m["na_y"].to_numpy(np.int64)}
        )
        .groupby("pair", sort=False)
        .agg(shared=("pair", "size"), na=("na", "first"), nb=("nb", "first"))
        .reset_index()
    )
    g["pshard"] = g["pair"].to_numpy() % _CONT_PAIR_SHARDS
    return g[["pshard", "pair", "shared", "na", "nb"]]


_CONT_PARTIAL_SCHEMA = pa.schema(
    [
        ("pshard", pa.int64()),
        ("pair", pa.int64()),
        ("shared", pa.int64()),
        ("na", pa.int64()),
        ("nb", pa.int64()),
    ]
)


def _pair_fold(shard: pd.DataFrame) -> pd.DataFrame:
    """All partials of a pair land in its pshard, so the fold sees each
    pair complete: sum the per-gram-shard counts, apply the integer
    containment flags, unpack the ids."""
    g = (
        shard.groupby("pair", sort=False)
        .agg(shared=("shared", "sum"), na=("na", "first"), nb=("nb", "first"))
        .reset_index()
    )
    sh = g["shared"].to_numpy(np.int64)
    na = g["na"].to_numpy(np.int64)
    nb = g["nb"].to_numpy(np.int64)
    a_in_b = _CONT_DEN * sh >= _CONT_NUM * na
    b_in_a = _CONT_DEN * sh >= _CONT_NUM * nb
    keep = (sh > 0) & (a_in_b | b_in_a)
    pair = g["pair"].to_numpy(np.int64)[keep]
    return pd.DataFrame(
        {
            "doc_a": pair >> np.int64(32),
            "doc_b": pair & np.int64(0xFFFFFFFF),
            "shared": sh[keep],
            "na": na[keep],
            "nb": nb[keep],
            "a_in_b": a_in_b[keep].astype(np.int64),
            "b_in_a": b_in_a[keep].astype(np.int64),
        }
    )


def q_dedup_containment(sf_dir: str):
    """Asymmetric near-dup: pairs where one doc's 3-gram shingle set is
    ≥ 90 % contained in the other's (Broder containment — the
    quote/excerpt detector symmetric Jaccard misses).  Emits
    (doc_a, doc_b, shared, na, nb, a_in_b, b_in_a), flags integer:
    ``a_in_b = [10·shared ≥ 9·na]``.

    Two bounded keyed exchanges: gram-hash shards (intersection
    partials) → pair-hash shards (C-level fold + flags); the pair KEY
    domain grows with data but both exchange key domains stay
    constant, dodging the high-cardinality hash-aggregate degradation
    (measured 39 s → ~5 s at sf0.1)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    partials = _schema_guard(
        ds.map_batches(_shingle_partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(_shard_pairs, batch_format="pandas"),
        _CONT_PARTIAL_SCHEMA,
    )
    return _schema_guard(
        partials.groupby("pshard").map_groups(_pair_fold, batch_format="pandas"),
        pa.schema(
            [
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
                ("shared", pa.int64()),
                ("na", pa.int64()),
                ("nb", pa.int64()),
                ("a_in_b", pa.int64()),
                ("b_in_a", pa.int64()),
            ]
        ),
    )


def _sql_containment() -> str:
    inter = "len(list_intersect(a.s, b.s))"
    return f"""
WITH {_rel._SQL_SHINGLE_SH}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast({inter} AS BIGINT) AS shared,
       cast(len(a.s) AS BIGINT) AS na,
       cast(len(b.s) AS BIGINT) AS nb,
       cast(CASE WHEN {_CONT_DEN} * {inter} >= {_CONT_NUM} * len(a.s)
                 THEN 1 ELSE 0 END AS BIGINT) AS a_in_b,
       cast(CASE WHEN {_CONT_DEN} * {inter} >= {_CONT_NUM} * len(b.s)
                 THEN 1 ELSE 0 END AS BIGINT) AS b_in_a
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE {inter} > 0
  AND ({_CONT_DEN} * {inter} >= {_CONT_NUM} * len(a.s)
       OR {_CONT_DEN} * {inter} >= {_CONT_NUM} * len(b.s))
"""


# =====================================================================
# SemDeDup (semantic near-dup over the k-means partition)
# =====================================================================


def _labeled_clusters(sf_dir: str):
    """(vec_id, cluster, q) over the shared integer Lloyd fit — the
    common front half of ``semdedup`` and ``dedup_chain``'s semantic
    stage."""
    from ..functions.embed import fixed_list_to_numpy
    from .clustering import _assign, kmeans_fit

    base, C = kmeans_fit(sf_dir)

    def _label_q(batch: pa.Table, C=C) -> pa.Table:
        X = fixed_list_to_numpy(batch.column("q"), dtype=np.int64).astype(
            np.int64
        )
        a = _assign(X, C)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(a.astype(np.int64)),
                "q": batch.column("q"),
            }
        )

    return base.map_batches(_label_q, batch_format="pyarrow")


def _sim_matrix(group: pd.DataFrame):
    """(ids ascending, boolean similarity matrix) for one cluster —
    int64 Gram matmul + the exact object-int threshold test."""
    ids = group["vec_id"].to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    X = np.asarray(group["q"].to_list(), dtype=np.int64)[order]
    D = X @ X.T                                   # int64-exact
    n2 = np.einsum("nd,nd->n", X, X).astype(object)
    Do = D.astype(object)
    sim = (D > 0) & np.asarray(
        _SEM_DEN2 * Do * Do >= _SEM_NUM2 * n2[:, None] * n2[None, :],
        dtype=bool,
    )
    return ids, sim


def q_semdedup(sf_dir: str):
    """SemDeDup: within each k-means cluster of the embedding space,
    prune every vector that has a SMALLER-id cluster-mate with cosine
    ≥ τ (deterministic min-id keeper — the paper keeps one exemplar
    per semantic duplicate group; random/centroid-distance keeper
    rules drop into the same scan).  Emits (vec_id, cluster, pruned).

    Shape: the integer Lloyd fit is shared with ``kmeans_clusters``
    (one fit, two read-outs); one labeling scan over the cached
    quantized working set → ``groupby(cluster)`` → per-cluster int64
    Gram matmul + a lower-triangle Python-int comparison (dot² needs
    >64 bits; object arithmetic keeps it exact).  Clusters are the
    partition unit — the SemDeDup paper's own layout (it caps cluster
    sizes; a skewed cluster is re-clustered, which composes with this
    operator unchanged)."""
    labeled = _labeled_clusters(sf_dir)

    def _prune(group: pd.DataFrame) -> pd.DataFrame:
        ids, sim = _sim_matrix(group)
        pruned = np.tril(sim, -1).any(axis=1)         # smaller-id mate
        return pd.DataFrame(
            {
                "vec_id": ids.astype(np.int64),
                "cluster": np.full(len(ids), int(group["cluster"].iloc[0]),
                                   dtype=np.int64),
                "pruned": pruned.astype(np.int64),
            }
        )

    return _schema_guard(
        labeled.groupby("cluster").map_groups(_prune, batch_format="pandas"),
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("cluster", pa.int64()),
                ("pruned", pa.int64()),
            ]
        ),
    )


# =====================================================================
# End-to-end dedup chain (exact → MinHash clusters → semantic)
# =====================================================================


def q_dedup_chain(sf_dir: str):
    """The production dedup PIPELINE as one verified composition
    (the order real LLM-data systems run: exact hash → lexical
    near-dup → semantic near-dup; each stage sees only the previous
    stage's survivors).  Emits (doc_id, stage) for EVERY document:
    stage 0 = survives all three, 1 = exact duplicate of a
    smaller-id doc, 2 = MinHash-verified near-dup cluster non-keeper,
    3 = semantic duplicate of a smaller-id stage-2 survivor in its
    k-means cluster.

    Composition semantics (mirrored in the SQL): a doc dropped at
    stage k is invisible to later stages; the semantic rule prunes v
    iff some stage-2 SURVIVOR a < v is integer-cosine-similar — a
    doc already dropped cannot prune anyone.

    Scale shape (rebuilt per VERDICT r3 #1/#2): stage-1 non-keepers
    come out of ONE crc-shard exchange with a vectorized per-shard
    sorted-adjacency scan (no per-hash pandas UDF); every drop set
    stays a Dataset end-to-end — survivor filtering and the final
    tagging scan go through the GATED broadcast / hash-exchange
    anti-join helpers (:func:`~weakscraper_ray.functions.dedup.
    anti_member_filter` / :func:`~weakscraper_ray.functions.dedup.
    tag_disjoint_stages`), so driver memory is bounded by the logged
    broadcast threshold, not by duplicate volume. The driver verifies
    the chain, not just each stage (the ``training_prep`` /
    ``seed_select`` precedent)."""
    from ..functions.dedup import (
        anti_member_filter,
        cluster_pairs,
        tag_disjoint_stages,
    )
    from .relational import q_dedup_minhash

    # ---- stage 1: exact content hash, keeper = min doc_id. One pass
    # computes (doc_id, md5, shard-of-md5); the non-keeper extraction
    # is one bounded-cardinality shard exchange + a vectorized
    # sort/adjacent-equal scan per shard — one UDF call per SHARD,
    # never per distinct hash (the qa_pairs re-keying shape).
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _hash_shard(t: pa.Table) -> pa.Table:
        import hashlib

        hs, sh = [], []
        for txt in t.column("text").to_pylist():
            d = hashlib.md5((txt or "").encode("utf-8")).digest()
            hs.append(d.hex())
            sh.append(int.from_bytes(d[:4], "little") & (_CHAIN_SHARDS - 1))
        return pa.table(
            {
                "shard": pa.array(sh, pa.int64()),
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "content_hash": pa.array(hs, pa.string()),
            }
        )

    sharded = ds.map_batches(_hash_shard, batch_format="pyarrow")

    def _nonmin_shard(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["content_hash", "doc_id"], kind="mergesort")
        h = d["content_hash"].to_numpy()
        dup = np.zeros(len(d), dtype=bool)
        if len(d) > 1:
            dup[1:] = h[1:] == h[:-1]
        return d.loc[dup, ["doc_id"]]

    drop1_ds = _schema_guard(
        sharded.groupby("shard").map_groups(
            _nonmin_shard, batch_format="pandas"
        ),
        pa.schema([("doc_id", pa.int64())]),
    ).materialize()

    # ---- stage 2: MinHash-verified pairs among stage-1 survivors
    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    pairs2 = anti_member_filter(
        q_dedup_minhash(sf_dir), ["doc_a", "doc_b"], drop1_ds,
        schema=pair_schema,
    )
    clusters = cluster_pairs(pairs2)
    drop2_ds = clusters.map_batches(
        lambda t: t.filter(pc.equal(t.column("is_keeper"), 0)).select(
            ["doc_id"]
        ),
        batch_format="pyarrow",
    ).materialize()

    # ---- stage 3: semantic pairs among stage-2 survivors
    labeled = _labeled_clusters(sf_dir)

    def _sim_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids, sim = _sim_matrix(group)
        bi, ai = np.nonzero(np.tril(sim, -1))  # ids[ai] < ids[bi]
        return pd.DataFrame(
            {
                "vec_a": ids[ai].astype(np.int64),
                "vec_b": ids[bi].astype(np.int64),
            }
        )

    sim_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    sim_pairs = _schema_guard(
        labeled.groupby("cluster").map_groups(
            _sim_pairs, batch_format="pandas"
        ),
        sim_schema,
    )
    drop12_ds = drop1_ds.union(drop2_ds)
    sim_live = anti_member_filter(
        sim_pairs, ["vec_a", "vec_b"], drop12_ds, schema=sim_schema
    )
    drop3_ds = sim_live.map_batches(
        lambda t: pa.table({"doc_id": t.column("vec_b")}),
        batch_format="pyarrow",
    )

    # ---- tagging scan: gated broadcast / groupby-Max, disjoint by
    # construction (a doc dropped at stage k is invisible later)
    return tag_disjoint_stages(
        _read(sf_dir, "documents", ["doc_id"]),
        "doc_id",
        [
            (drop1_ds, "doc_id", 1),
            (drop2_ds, "doc_id", 2),
            (drop3_ds, "doc_id", 3),
        ],
    )


def _sql_dedup_chain(sf_dir: str) -> str:
    from .. import oracles

    return f"""
WITH RECURSIVE {_rel._SQL_SHINGLE_SH},
ex AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY md5(coalesce(text, ''))) AS k
  FROM documents),
d1 AS (SELECT doc_id FROM ex WHERE doc_id <> k),
s1 AS (SELECT doc_id FROM ex WHERE doc_id = k),
p2 AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE a.doc_id IN (SELECT doc_id FROM s1)
    AND b.doc_id IN (SELECT doc_id FROM s1)
    AND len(a.s) + len(b.s) > 0
    AND 3 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s)),
edges AS (SELECT u, v FROM p2 UNION SELECT v, u FROM p2),
reach(u, v) AS (
  SELECT u, u FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v),
d2 AS (SELECT u AS doc_id FROM reach GROUP BY u HAVING u <> min(v)),
s2 AS (SELECT doc_id FROM s1
       WHERE doc_id NOT IN (SELECT doc_id FROM d2)),
sp AS (SELECT vec_a, vec_b
       FROM read_parquet('{oracles.semdedup_pairs_twin(sf_dir)}')),
d3 AS (
  SELECT DISTINCT vec_b AS doc_id FROM sp
  WHERE vec_a IN (SELECT doc_id FROM s2)
    AND vec_b IN (SELECT doc_id FROM s2))
SELECT d.doc_id,
       cast(CASE WHEN d.doc_id IN (SELECT doc_id FROM d1) THEN 1
                 WHEN d.doc_id IN (SELECT doc_id FROM d2) THEN 2
                 WHEN d.doc_id IN (SELECT doc_id FROM d3) THEN 3
                 ELSE 0 END AS BIGINT) AS stage
FROM documents d
"""


# =====================================================================
# registration
# =====================================================================

QUERIES = {
    "dedup_containment": q_dedup_containment,
    "semdedup": q_semdedup,
    "dedup_chain": q_dedup_chain,
}

ORACLE_SQL = {
    "dedup_containment": _sql_containment(),
}


def dynamic_oracle_sql(sf_dir: str) -> dict[str, str]:
    """semdedup's oracle is an independent single-threaded twin (the
    kmeans-twin pattern — integer arithmetic end-to-end makes both
    sides partitioning-independent, so agreement is exact); the chain
    oracle composes the exact/minhash SQL stages with the twin's raw
    similar-pair relation."""
    from .. import oracles

    return {
        "semdedup": (
            "SELECT vec_id, cluster, pruned "
            f"FROM read_parquet('{oracles.semdedup_twin(sf_dir)}')"
        ),
        "dedup_chain": _sql_dedup_chain(sf_dir),
    }


_rel.QUERIES.update(QUERIES)
_rel.ORACLE_SQL.update(ORACLE_SQL)
