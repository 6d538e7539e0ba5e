"""Round-3 continuation #17: classical corpus / series / association
measures, each exact-integer until one mirrored read-out.

- ``yule_k``        Yule's characteristic K (Yule 1944), the
                    repetitiveness read-out of a training corpus'
                    word-frequency spectrum: K = 10⁴·(S₂−N)/N² with
                    N = total tokens, S₂ = Σ m_w² over per-type
                    counts.  Template-heavy / synthetic text drives K
                    up; natural prose sits low — the corpus-quality
                    cousin of ``zipf_slope``.
- ``spearman_rho``  tie-corrected Spearman rank correlation between
                    l_quantity and discount_pct — Pearson over average
                    ranks, computed from the same BOUNDED (≤ 50 × 11)
                    value-pair census as ``kendall_tau`` (doubled
                    ranks keep every sum an integer; doubling cancels
                    in the correlation).
- ``mann_kendall``  the Mann–Kendall trend test (Mann 1945, Kendall
                    1975) over the daily order-count series: exact S
                    statistic, tie-corrected 18·Var(S) as a bigint,
                    and the continuity-corrected z read-out.

Exactness strategy (the repo's census convention): every input is a
bounded census — vocabulary counts (Heaps-law bound), a ≤ 50×11 value
grid, ≤ #days daily totals — folded exactly in integers; the single
final expression (a division or z-score) is mirrored op-for-op against
DuckDB with the shared half-away e6 rule or one identical double
expression computed from identical integers on both engines.

Scale shapes: yule_k pays ONE keyed exchange whose payload is the
vocabulary, not the corpus (the ``oov_rate`` pass-1 discipline), then
folds three scalars; spearman_rho and mann_kendall are zero-exchange —
per-batch 2-D bincount / day-census partials fold on the driver
(the ``emd_drift`` / ``kendall_tau`` discipline), because their
aggregate domains are FIXED or day-bounded, never data-sized.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import relational as _rel
from .relational import _i64_away_np, _read

# NOTE: _ols_e6 must be imported LAZILY (inside functions): this
# module is imported by relational's tail, so when a Ray worker
# unpickles a class defined in patterns.py, patterns is the in-flight
# outermost import and a top-level `from .patterns import` here sees a
# partially initialized module (observed: every lexicon_scan actor
# died in a restart loop under the 4-CPU test session — the mlprep
# _WS lesson).
_US_PER_DAY = 86_400_000_000

def _ols_e6(p: int, d: int) -> int:
    """Lazy proxy for patterns._ols_e6 — see import note above."""
    from .patterns import _ols_e6 as _f

    return _f(p, d)



# =====================================================================
# yule_k — Yule's characteristic of the corpus word-frequency spectrum
# =====================================================================


def q_yule_k(sf_dir: str):
    """Yule's K over the documents corpus: one vocabulary-bounded
    ``groupby(word)`` exchange (payload = per-batch distinct terms,
    the Heaps-law bound shared with ``oov_rate``/``zipf_slope``), then
    per-block scalar partials (N, types, S₂) folded on the driver —
    the spectrum never materializes.  Output: one row
    ``(n_tokens, n_types, s2, yule_k_e6)``; K = 10⁴·(S₂−N)/N² ≥ 0 via
    the shared half-away e6 integer division, so the row is
    partitioning-independent and hash-exact."""
    from ray.data.aggregate import Sum

    from .curation import _explode_tokens

    ds = _read(sf_dir, "documents", ["text"])

    def _vocab_partial(batch: pa.Table) -> pa.Table:
        _, toks = _explode_tokens(batch)
        t = pa.table({"w": pa.array(toks, pa.string())})
        return t.group_by("w").aggregate([("w", "count")])

    counts = (
        ds.map_batches(_vocab_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("w_count", alias_name="m"))
    )

    def _spectrum_partial(batch: pa.Table) -> pa.Table:
        m = batch.column("m").to_numpy(zero_copy_only=False).astype(object)
        return pa.table(
            {
                "n": pa.array([int(m.sum())], pa.int64()),
                "types": pa.array([len(m)], pa.int64()),
                "s2": pa.array([int((m * m).sum())], pa.int64()),
            }
        )

    n = types = s2 = 0
    for t in counts.map_batches(
        _spectrum_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        n += sum(t.column("n").to_pylist())
        types += sum(t.column("types").to_pylist())
        s2 += sum(t.column("s2").to_pylist())
    k_e6 = _ols_e6(10_000 * (s2 - n), n * n)
    return pa.table(
        {
            "n_tokens": pa.array([n], pa.int64()),
            "n_types": pa.array([types], pa.int64()),
            "s2": pa.array([s2], pa.int64()),
            "yule_k_e6": pa.array([k_e6], pa.int64()),
        }
    )


SQL_YULE_K = r"""
WITH tk AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
  FROM documents),
c AS (SELECT w, cast(count(*) AS BIGINT) AS m FROM tk WHERE w <> ''
      GROUP BY w),
s AS (SELECT cast(sum(m) AS HUGEINT) AS n,
             cast(count(*) AS BIGINT) AS types,
             cast(sum(m * m) AS HUGEINT) AS s2
      FROM c)
SELECT cast(n AS BIGINT) AS n_tokens,
       types AS n_types,
       cast(s2 AS BIGINT) AS s2,
       cast((2000000 * (10000 * (s2 - n)) + n * n) // (2 * n * n)
            AS BIGINT) AS yule_k_e6
FROM s
"""


# =====================================================================
# chao1_richness — nonparametric vocabulary-size estimation
# =====================================================================


def q_chao1_richness(sf_dir: str):
    """Chao1 species-richness estimate (Chao 1984) of the corpus
    VOCABULARY — how many word types the corpus would reveal with
    unbounded sampling, from the observed spectrum alone: with f1 =
    hapax count and f2 = dis-legomena count, the bias-corrected form

        Chao1 = types + f1·(f1 − 1) / (2·(f2 + 1))

    is a PURE integer rational (defined even at f2 = 0), read out as
    ``chao1_e6 = 10⁶·types + e6(f1(f1−1)/(2(f2+1)))`` with the shared
    half-away division.  The coverage read-out an LLM-corpus curator
    wants beside ``yule_k`` (repetitiveness) and ``zipf_slope``
    (decay): types/Chao1 ≈ sample completeness.  Shape: the same ONE
    vocabulary-bounded exchange as ``yule_k`` (payload = per-batch
    distinct terms), then a 3-scalar spectrum fold.  Output: one row
    ``(n_types, f1, f2, chao1_e6)``."""
    from ray.data.aggregate import Sum

    from .curation import _explode_tokens

    ds = _read(sf_dir, "documents", ["text"])

    def _vocab_partial(batch: pa.Table) -> pa.Table:
        _, toks = _explode_tokens(batch)
        t = pa.table({"w": pa.array(toks, pa.string())})
        return t.group_by("w").aggregate([("w", "count")])

    counts = (
        ds.map_batches(_vocab_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("w_count", alias_name="m"))
    )

    def _spec(batch: pa.Table) -> pa.Table:
        m = batch.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "types": pa.array([len(m)], pa.int64()),
                "f1": pa.array([int((m == 1).sum())], pa.int64()),
                "f2": pa.array([int((m == 2).sum())], pa.int64()),
            }
        )

    types = f1 = f2 = 0
    for t in counts.map_batches(_spec, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        types += sum(t.column("types").to_pylist())
        f1 += sum(t.column("f1").to_pylist())
        f2 += sum(t.column("f2").to_pylist())
    chao1_e6 = 1_000_000 * types + _ols_e6(f1 * (f1 - 1), 2 * (f2 + 1))
    return pa.table(
        {
            "n_types": pa.array([types], pa.int64()),
            "f1": pa.array([f1], pa.int64()),
            "f2": pa.array([f2], pa.int64()),
            "chao1_e6": pa.array([chao1_e6], pa.int64()),
        }
    )


SQL_CHAO1 = r"""
WITH tk AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
  FROM documents),
c AS (SELECT w, cast(count(*) AS BIGINT) AS m FROM tk WHERE w <> ''
      GROUP BY w),
s AS (SELECT cast(count(*) AS BIGINT) AS types,
             cast(coalesce(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS f1,
             cast(coalesce(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS f2
      FROM c)
SELECT types AS n_types, f1, f2,
       1000000 * types
         + (2000000 * (f1 * (f1 - 1)) + 2 * (f2 + 1))
           // (2 * (2 * (f2 + 1))) AS chao1_e6
FROM s
"""


# =====================================================================
# spearman_rho — tie-corrected rank correlation from the value census
# =====================================================================


#: sf_dir → folded value-pair census (spearman_rho + hoeffding_d)
_CELLS_MEMO: dict[str, dict[tuple[int, int], int]] = {}


def _census_cells(sf_dir: str) -> dict[tuple[int, int], int]:
    """(quantity, discount_pct) → count census, folded on the driver —
    the bounded-grid partial shared with ``kendall_tau`` (patterns.py),
    re-derived here so neither module imports the other's privates.
    Memoized per sf_dir (immutable testdata; callers must not mutate)."""
    if sf_dir in _CELLS_MEMO:
        return _CELLS_MEMO[sf_dir]
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def _partial(t: pa.Table) -> pa.Table:
        x = _i64_away_np(
            t.column("l_quantity").to_numpy(zero_copy_only=False), 1.0
        )
        y = _i64_away_np(
            t.column("l_discount").to_numpy(zero_copy_only=False), 100.0
        )
        g = (
            pd.DataFrame({"x": x, "y": y})
            .groupby(["x", "y"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "x": pa.array(g["x"].to_numpy(np.int64)),
                "y": pa.array(g["y"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    cells: dict[tuple[int, int], int] = {}
    for t in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for x, y, n in zip(
            t.column("x").to_pylist(),
            t.column("y").to_pylist(),
            t.column("n").to_pylist(),
        ):
            cells[(int(x), int(y))] = cells.get((int(x), int(y)), 0) + int(n)
    _CELLS_MEMO[sf_dir] = cells
    return cells


def _rank2(marg: dict[int, int]) -> dict[int, int]:
    """value → 2·(average mid-rank) over a marginal census; doubling
    keeps tied mid-ranks (k + (t+1)/2) integral."""
    out, cum = {}, 0
    for v in sorted(marg):
        out[v] = 2 * cum + marg[v] + 1
        cum += marg[v]
    return out


def q_spearman_rho(sf_dir: str):
    """Tie-corrected Spearman ρ (Spearman 1904; mid-rank form) between
    l_quantity and discount_pct: Pearson over 2×-scaled average ranks,
    every sum a Python bigint from the ≤ 50×11 census, one mirrored
    double read-out ``rho_e6`` (identical num/den integers → identical
    IEEE divide/sqrt on both engines).  Output: one row
    ``(n, nx, ny, rho_e6)``.  Zero keyed exchange (census partials
    fold on the driver)."""
    cells = _census_cells(sf_dir)
    mx: dict[int, int] = {}
    my: dict[int, int] = {}
    for (x, y), n in cells.items():
        mx[x] = mx.get(x, 0) + n
        my[y] = my.get(y, 0) + n
    rx, ry = _rank2(mx), _rank2(my)
    n_tot = sum(cells.values())
    sx = sy = sxy = sxx = syy = 0
    for (x, y), n in cells.items():
        a, b = rx[x], ry[y]
        sx += n * a
        sy += n * b
        sxy += n * a * b
        sxx += n * a * a
        syy += n * b * b
    num = n_tot * sxy - sx * sy
    denx = n_tot * sxx - sx * sx
    deny = n_tot * syy - sy * sy
    rho = float(num) / math.sqrt(float(denx) * float(deny))
    rho_e6 = int(math.floor(abs(rho) * 1e6 + 0.5)) * (1 if rho >= 0 else -1)
    return pa.table(
        {
            "n": pa.array([n_tot], pa.int64()),
            "nx": pa.array([len(mx)], pa.int64()),
            "ny": pa.array([len(my)], pa.int64()),
            "rho_e6": pa.array([rho_e6], pa.int64()),
        }
    )


SQL_SPEARMAN = """
WITH v AS (
  SELECT cast(round(l_quantity) AS BIGINT) AS x,
         cast(round(l_discount * 100) AS BIGINT) AS y
  FROM lineitem),
c AS (SELECT x, y, cast(count(*) AS BIGINT) AS n FROM v GROUP BY 1, 2),
gx AS (SELECT x, sum(n) AS t FROM c GROUP BY x),
gy AS (SELECT y, sum(n) AS t FROM c GROUP BY y),
rx AS (SELECT x, 2 * (sum(t) OVER (ORDER BY x) - t) + t + 1 AS r FROM gx),
ry AS (SELECT y, 2 * (sum(t) OVER (ORDER BY y) - t) + t + 1 AS r FROM gy),
j AS (SELECT cast(c.n AS HUGEINT) AS n,
             cast(rx.r AS HUGEINT) AS a,
             cast(ry.r AS HUGEINT) AS b
      FROM c JOIN rx ON rx.x = c.x JOIN ry ON ry.y = c.y),
s AS (SELECT sum(n) AS nt, sum(n * a) AS sx, sum(n * b) AS sy,
             sum(n * a * b) AS sxy, sum(n * a * a) AS sxx,
             sum(n * b * b) AS syy
      FROM j),
f AS (SELECT cast(nt AS BIGINT) AS n,
             (SELECT cast(count(*) AS BIGINT) FROM gx) AS nx,
             (SELECT cast(count(*) AS BIGINT) FROM gy) AS ny,
             (nt * sxy - sx * sy) AS num,
             (nt * sxx - sx * sx) AS denx,
             (nt * syy - sy * sy) AS deny
      FROM s)
SELECT n, nx, ny,
       cast(CASE WHEN num >= 0
         THEN floor(1e6 * num::DOUBLE
                    / sqrt(denx::DOUBLE * deny::DOUBLE) + 0.5)
         ELSE -floor(1e6 * (-num)::DOUBLE
                    / sqrt(denx::DOUBLE * deny::DOUBLE) + 0.5)
       END AS BIGINT) AS rho_e6
FROM f
"""


# =====================================================================
# mann_kendall — trend test over the daily order-count series
# =====================================================================


#: sf_dir → folded day census; ~14 series statistics consume this one
#: bounded fold, so one pass per process (the _NB_CENSUS_MEMO pattern)
_DAY_CENSUS_MEMO: dict[str, dict[int, int]] = {}


def _day_census(sf_dir: str) -> dict[int, int]:
    """epoch-day → order count, folded on the driver (the
    ``autocorr_daily`` discipline: per-batch partials are ≤ #days
    rows, the domain is day-bounded, zero keyed exchange).  Shared by
    the whole daily-series statistics family.  Memoized per sf_dir
    (testdata is immutable; callers must not mutate the returned
    dict)."""
    if sf_dir in _DAY_CENSUS_MEMO:
        return _DAY_CENSUS_MEMO[sf_dir]
    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def _partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = pd.Series(us // _US_PER_DAY).value_counts()
        return pa.table(
            {
                "day": pa.array(g.index.to_numpy(np.int64)),
                "n": pa.array(g.to_numpy(np.int64)),
            }
        )

    census: dict[int, int] = {}
    for t in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for d, n in zip(t.column("day").to_pylist(), t.column("n").to_pylist()):
            census[int(d)] = census.get(int(d), 0) + int(n)
    _DAY_CENSUS_MEMO[sf_dir] = census
    return census


def q_mann_kendall(sf_dir: str):
    """Mann–Kendall trend test of the daily order-count series:
    S = Σ_{i<j} sgn(c_j − c_i) over days in date order, tie-corrected
    18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (both exact bigints),
    and the continuity-corrected z = (S∓1)/√(Var S) as the one
    mirrored double.  Output: one row ``(n_days, s_stat, var18,
    z_e6)``.

    Shape: per-batch day-census partials (≤ #days rows each) fold on
    the driver — zero keyed exchange (the ``autocorr_daily``
    discipline); the O(days²) sign sweep runs on the ≤ few-thousand-day
    folded series."""
    census = _day_census(sf_dir)
    days = sorted(census)
    c = np.array([census[d] for d in days], dtype=np.int64)
    n = len(c)
    # S via the per-j "less-before minus greater-before" identity,
    # O(n²) on the bounded day series (int8 sign matrix ≈ 6 MB).
    sgn = np.sign(c[None, :] - c[:, None])
    s_stat = int(np.triu(sgn, k=1).sum())
    var18 = n * (n - 1) * (2 * n + 5)
    for t_sz in pd.Series(c).value_counts():
        t_sz = int(t_sz)
        var18 -= t_sz * (t_sz - 1) * (2 * t_sz + 5)
    if s_stat > 0:
        z = (s_stat - 1) / math.sqrt(var18 / 18.0)
    elif s_stat < 0:
        z = (s_stat + 1) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    z_e6 = int(math.floor(abs(z) * 1e6 + 0.5)) * (1 if z >= 0 else -1)
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "s_stat": pa.array([s_stat], pa.int64()),
            "var18": pa.array([var18], pa.int64()),
            "z_e6": pa.array([z_e6], pa.int64()),
        }
    )


SQL_MANN_KENDALL = """
WITH c AS (
  SELECT cast(o_orderdate AS DATE) AS d, cast(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1),
p AS (SELECT coalesce(sum(CASE WHEN b.n > a.n THEN 1
                               WHEN b.n < a.n THEN -1 ELSE 0 END), 0) AS s
      FROM c a JOIN c b ON a.d < b.d),
t AS (SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS corr
      FROM (SELECT cast(count(*) AS BIGINT) AS t FROM c GROUP BY n)),
f AS (SELECT (SELECT cast(count(*) AS BIGINT) FROM c) AS nd,
             cast(p.s AS BIGINT) AS s, t.corr AS corr
      FROM p, t)
SELECT nd AS n_days, s AS s_stat,
       cast(nd * (nd - 1) * (2 * nd + 5) - corr AS BIGINT) AS var18,
       cast(CASE
         WHEN s > 0 THEN floor(1e6 * (s - 1)::DOUBLE
           / sqrt((nd * (nd - 1) * (2 * nd + 5) - corr)::DOUBLE / 18.0)
           + 0.5)
         WHEN s < 0 THEN -floor(1e6 * (-s - 1)::DOUBLE
           / sqrt((nd * (nd - 1) * (2 * nd + 5) - corr)::DOUBLE / 18.0)
           + 0.5)
         ELSE 0 END AS BIGINT) AS z_e6
FROM f
"""


# =====================================================================
# matrix_profile — all-pairs nearest-subsequence distances (Yeh 2016)
# =====================================================================

_MP_W = 7  #: subsequence window (one week of the daily series)


def q_matrix_profile(sf_dir: str):
    """Matrix profile (Yeh et al. 2016, ICDM) of the daily order-count
    series under NON-normalized squared Euclidean distance — the
    all-pairs nearest-subsequence index behind motif discovery and
    discord (anomaly) detection.  For every length-7 window i:
    the minimum dist²(i, j) over all j with |i − j| ≥ w (the standard
    trivial-match exclusion zone) and its argmin (ties → smallest j).
    Integer counts → every distance is an exact int64
    (Σ of 7 squared diffs ≤ 7·(Δcount)²), so min and argmin are exact
    on both engines — the z-normalized variant would put a float mean
    and σ in every window; the non-normalized profile is the
    hash-exact family member (documented choice).  Output: one row
    per window ``(idx, nn_idx, nn_dist2)``.

    Shape: day census folds driver-side (zero keyed exchange); the
    O(n²) window sweep is ONE numpy matmul (W·Wᵀ over the ≤ 2500×7
    window matrix) — constant work at any corpus size."""
    census = _day_census(sf_dir)
    days = sorted(census)
    c = np.array([census[d] for d in days], dtype=np.int64)
    n_w = len(c) - _MP_W + 1
    idx = np.arange(n_w)
    W = np.lib.stride_tricks.sliding_window_view(c, _MP_W).astype(
        np.int64
    )
    s2 = np.einsum("ij,ij->i", W, W)
    d2 = s2[:, None] + s2[None, :] - 2 * (W @ W.T)
    excl = np.abs(idx[:, None] - idx[None, :]) < _MP_W
    big = np.iinfo(np.int64).max
    d2 = np.where(excl, big, d2)
    nn_dist = d2.min(axis=1)
    nn_idx = d2.argmin(axis=1)  # first minimum = smallest j
    return pa.table(
        {
            "idx": pa.array(idx.astype(np.int64)),
            "nn_idx": pa.array(nn_idx.astype(np.int64)),
            "nn_dist2": pa.array(nn_dist.astype(np.int64)),
        }
    )


SQL_MATRIX_PROFILE = f"""
WITH c AS (
  SELECT cast(o_orderdate AS DATE) AS d, cast(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1),
w AS (SELECT row_number() OVER (ORDER BY d) - 1 AS i,
             n AS c0,
             lead(n, 1) OVER (ORDER BY d) AS c1,
             lead(n, 2) OVER (ORDER BY d) AS c2,
             lead(n, 3) OVER (ORDER BY d) AS c3,
             lead(n, 4) OVER (ORDER BY d) AS c4,
             lead(n, 5) OVER (ORDER BY d) AS c5,
             lead(n, 6) OVER (ORDER BY d) AS c6
      FROM c),
win AS (SELECT * FROM w WHERE c6 IS NOT NULL),
pairs AS (
  SELECT a.i AS idx, b.i AS j,
         (a.c0 - b.c0) * (a.c0 - b.c0) + (a.c1 - b.c1) * (a.c1 - b.c1)
         + (a.c2 - b.c2) * (a.c2 - b.c2) + (a.c3 - b.c3) * (a.c3 - b.c3)
         + (a.c4 - b.c4) * (a.c4 - b.c4) + (a.c5 - b.c5) * (a.c5 - b.c5)
         + (a.c6 - b.c6) * (a.c6 - b.c6) AS d2
  FROM win a JOIN win b ON abs(a.i - b.i) >= {_MP_W}),
best AS (SELECT idx, j, d2,
                row_number() OVER (PARTITION BY idx
                                   ORDER BY d2 ASC, j ASC) AS rn
         FROM pairs)
SELECT idx, j AS nn_idx, cast(d2 AS BIGINT) AS nn_dist2
FROM best WHERE rn = 1
"""


# =====================================================================
# haar_energy — dyadic Haar detail energies of the daily series
# =====================================================================

_HAAR_LEVELS = 4


def q_haar_energy(sf_dir: str):
    """Unnormalized Haar wavelet detail energies (Haar 1910; the
    multi-resolution energy signature behind change/seasonality
    screening): at level k (block 2^k), each FULL block of
    consecutive days contributes coeff = (first-half sum) − (second-
    half sum), and energy_k = Σ coeff² — all exact int64 because the
    normalizing 2^(−k/2) is dropped symmetrically (documented: the
    e-ladder across levels is energy_k / 2^k).  Days index by rank in
    day order (gaps adjacent, the series convention).  Output: one
    row per level ``(level, n_coeffs, energy)``.  Zero keyed
    exchange — the day census folds, the ladder is O(n) driver
    work."""
    census = _day_census(sf_dir)
    days = sorted(census)
    c = np.array([census[d] for d in days], dtype=np.int64)
    rows = []
    for k in range(1, _HAAR_LEVELS + 1):
        b = 1 << k
        n_b = len(c) // b
        if n_b == 0:
            rows.append((k, 0, 0))
            continue
        blocks = c[: n_b * b].reshape(n_b, b)
        half = b // 2
        coeff = blocks[:, :half].sum(axis=1) - blocks[:, half:].sum(axis=1)
        rows.append((k, n_b, int((coeff.astype(object) ** 2).sum())))
    return pa.table(
        {
            "level": pa.array([r[0] for r in rows], pa.int64()),
            "n_coeffs": pa.array([r[1] for r in rows], pa.int64()),
            "energy": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


SQL_HAAR_ENERGY = f"""
WITH c AS (
  SELECT cast(o_orderdate AS DATE) AS d, cast(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1),
ix AS (SELECT row_number() OVER (ORDER BY d) - 1 AS i, n FROM c),
lv AS (SELECT k FROM range(1, {_HAAR_LEVELS + 1}) t(k)),
co AS (
  SELECT lv.k, ix.i // (1 << lv.k) AS blk,
         sum(CASE WHEN (ix.i % (1 << lv.k)) < (1 << (lv.k - 1))
                  THEN ix.n ELSE -ix.n END) AS coeff,
         count(*) AS m
  FROM ix, lv GROUP BY 1, 2),
full_blocks AS (SELECT k, coeff FROM co WHERE m = (1 << k))
SELECT lv.k AS level,
       cast(coalesce(count(f.coeff), 0) AS BIGINT) AS n_coeffs,
       cast(coalesce(sum(f.coeff * f.coeff), 0) AS BIGINT) AS energy
FROM lv LEFT JOIN full_blocks f ON f.k = lv.k
GROUP BY lv.k
"""


QUERIES = {
    "yule_k": q_yule_k,
    "chao1_richness": q_chao1_richness,
    "spearman_rho": q_spearman_rho,
    "mann_kendall": q_mann_kendall,
    "matrix_profile": q_matrix_profile,
    "haar_energy": q_haar_energy,
}

ORACLE_SQL = {
    "yule_k": SQL_YULE_K,
    "chao1_richness": SQL_CHAO1,
    "spearman_rho": SQL_SPEARMAN,
    "mann_kendall": SQL_MANN_KENDALL,
    "matrix_profile": SQL_MATRIX_PROFILE,
    "haar_energy": SQL_HAAR_ENERGY,
}

# self-register (same pattern and import-cycle note as analytics.py)
_rel.QUERIES.update(QUERIES)
_rel.ORACLE_SQL.update(ORACLE_SQL)
