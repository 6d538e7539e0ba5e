"""Embedding-space operators: distributed exact PCA (the
whitening/compression step that precedes ANN indexing in production
similarity pipelines — public idiom: OPQ/PCA rotation before IVF, e.g.
Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011) and an oracled per-dimension moment profile.

Scale shapes:

- ``embedding_dim_stats``: per-batch moment partials (one 64-row table
  per batch: dim, n, s, ss) → one tiny ``groupby(dim)`` exchange whose
  payload is 3 doubles per dimension per batch — never a vector.
- ``embedding_pca``: classic two-pass distributed PCA. Pass 1 computes
  per-batch Gram partials (n, Σx, ΣxᵀΣx as a d×d block); the driver
  reduces the ~d² floats per block (bounded by block count × 33 KB,
  NOT by corpus size), eigendecomposes the d×d covariance (trivial at
  any corpus scale — the matrix is d×d regardless of row count), and
  broadcasts (μ, W) once via ``ray.put``. Pass 2 is an embarrassingly
  parallel streaming projection. No all-to-all anywhere.

Determinism: partials are reduced in sorted order of each block's
minimum vec_id and eigenvector signs are fixed (largest-|component|
coordinate made positive), so the output is reproducible for a given
blocking. Exact float equality across DIFFERENT blockings is not
guaranteed (summation order), which is why ``embedding_pca`` is
rows-only for the driver; ``tests/test_round3b.py`` pins it against a
single-threaded numpy twin with tolerance plus orthonormality /
variance-spectrum invariants.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.embed import fixed_list_to_numpy
from . import relational as _rel
from .relational import _i64_away_np, _read

_DIM = 64
#: retained PCA components (the compressed ANN dimensionality)
_PCA_K = 8

# =====================================================================
# Per-dimension moment profile (oracled: integer e6 mirrors)
# =====================================================================


def q_embedding_dim_stats(sf_dir: str):
    """Per-dimension mean and population variance of the embedding
    table (×1e6, half-away rounded like the DuckDB twin) — the profile
    pass that sizes PCA/quantization decisions.

    Both sides accumulate float64 sums and compute
    ``ss/n - (s/n)^2`` op-for-op, so the only divergence is summation
    order (~1e-13 relative), far below the e6 rounding grain."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _partial(batch: pa.Table) -> pa.Table:
        x = fixed_list_to_numpy(batch.column("embedding"), np.float64)
        return pa.table(
            {
                "dim": pa.array(np.arange(_DIM, dtype=np.int32)),
                "n_part": pa.array(
                    np.full(_DIM, len(x), dtype=np.int64)
                ),
                "s": pa.array(x.sum(axis=0)),
                "ss": pa.array((x * x).sum(axis=0)),
            }
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n_part", alias_name="n"),
            Sum("s", alias_name="s_tot"),
            Sum("ss", alias_name="ss_tot"),
        )
    )

    def _final(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column("s_tot").to_numpy(zero_copy_only=False)
        ss = batch.column("ss_tot").to_numpy(zero_copy_only=False)
        mean = s / n
        var = ss / n - mean * mean  # op-order mirror of the SQL
        return pa.table(
            {
                "dim": batch.column("dim"),
                "n": batch.column("n"),
                "mean_e6": pa.array(_i64_away_np(mean, 1e6)),
                "var_e6": pa.array(_i64_away_np(var, 1e6)),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


SQL_EMBEDDING_DIM_STATS = f"""
SELECT cast(i - 1 AS BIGINT) AS dim,
       cast(count(*) AS BIGINT) AS n,
       cast(round(sum(cast(embedding[i] AS DOUBLE)) / count(*) * 1000000,
                  0) AS BIGINT) AS mean_e6,
       cast(round((sum(cast(embedding[i] AS DOUBLE) *
                       cast(embedding[i] AS DOUBLE)) / count(*)
                   - pow(sum(cast(embedding[i] AS DOUBLE)) / count(*), 2))
                  * 1000000, 0) AS BIGINT) AS var_e6
FROM embeddings, range(1, {_DIM + 1}) t(i)
GROUP BY i
"""


# =====================================================================
# Distributed exact PCA: Gram partials → driver eigh → broadcast proj
# =====================================================================


def _pca_partials(ds) -> list[dict]:
    """Per-block (min vec_id, n, Σx, XᵀX) partials, collected to the
    driver. The collected set is O(num_blocks × d²) — independent of
    row count — which is the standard legal driver materialization
    (same bound class as a groupby over a fixed key domain)."""

    def _gram(batch: pa.Table) -> pa.Table:
        x = fixed_list_to_numpy(batch.column("embedding"), np.float64)
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "block_key": pa.array([int(vid.min())], pa.int64()),
                "n": pa.array([len(x)], pa.int64()),
                "s": pa.array([x.sum(axis=0).tolist()]),
                "g": pa.array([(x.T @ x).reshape(-1).tolist()]),
            }
        )

    return ds.map_batches(_gram, batch_format="pyarrow").take_all()


def fit_pca(sf_dir: str, k: int = _PCA_K):
    """Fit the PCA model: returns (mu, W, eigvals) with W of shape
    (d, k), columns orthonormal, signs fixed deterministically."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    parts = sorted(_pca_partials(ds), key=lambda r: r["block_key"])
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum(
        [np.asarray(p["g"]).reshape(_DIM, _DIM) for p in parts], axis=0
    )
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    w = eigvecs[:, order]
    vals = eigvals[order]
    # deterministic sign: the largest-|component| coordinate is positive
    flip = w[np.abs(w).argmax(axis=0), np.arange(w.shape[1])] < 0
    w[:, flip] *= -1.0
    return mu, w, vals


def q_embedding_pca(sf_dir: str):
    """Project every embedding onto its corpus' top-k principal
    components — distributed exact PCA (two linear passes, no
    shuffle). Output: (vec_id, pc fixed_size_list<float32, k>).

    Rows-only for the driver (eigenvectors are float-summation-order
    sensitive across blockings); pinned in tests against a
    single-threaded twin with tolerance + spectral invariants."""
    mu, w, _ = fit_pca(sf_dir)
    model = ray.put((mu, w))

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _project(batch: pa.Table) -> pa.Table:
        m, proj = ray.get(model)
        x = fixed_list_to_numpy(batch.column("embedding"), np.float64)
        coords = ((x - m) @ proj).astype(np.float32)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "pc": pa.FixedSizeListArray.from_arrays(
                    pa.array(coords.reshape(-1), pa.float32()),
                    coords.shape[1],
                ),
            }
        )

    return ds.map_batches(_project, batch_format="pyarrow")


QUERIES = {
    "embedding_dim_stats": q_embedding_dim_stats,
    "embedding_pca": q_embedding_pca,
}

ORACLE_SQL = {
    "embedding_dim_stats": SQL_EMBEDDING_DIM_STATS,
}

_rel.QUERIES.update(QUERIES)
_rel.ORACLE_SQL.update(ORACLE_SQL)
