"""Round-3 continuation #11 unit tests: weighted-median tie/crossing
semantics, chi-square zero-cell inclusion, MAD cut arithmetic.
Query-level driver parity is covered by the auto-harness in
test_relational.py; these pin the helper contracts on hand-built
micro-inputs where the edge cases are forced."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from weakscraper_ray.pipelines.stats import _q_e6


# ------------------------------------------- weighted median semantics

def _wmedian_rowwise(vals, weights):
    """The Ray path's row-wise rule: sort by v, first v where
    cumulative weight ≥ ⌈W/2⌉."""
    order = np.argsort(np.asarray(vals), kind="stable")
    v = np.asarray(vals)[order]
    cw = np.cumsum(np.asarray(weights)[order])
    target = (int(cw[-1]) + 1) // 2
    return int(v[int(np.searchsorted(cw, target))])


def _wmedian_sql(vals, weights):
    """The oracle's peer-inclusive window rule."""
    con = duckdb.connect()
    con.execute("CREATE TABLE c(v BIGINT, w BIGINT)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(zip(vals, weights)))
    return con.execute(
        "WITH t AS (SELECT sum(w) AS W FROM c),"
        "r AS (SELECT v, sum(w) OVER (ORDER BY v) AS cw FROM c) "
        "SELECT min(r.v) FROM r, t WHERE 2 * r.cw >= t.W"
    ).fetchone()[0]


def test_wmedian_tie_group_crossing_agrees_with_sql():
    # target crossed mid-tie-group: row-wise cum hits the target inside
    # the v=5 group while SQL's peer-inclusive cw jumps past it — both
    # rules must still pick v=5
    vals = [1, 5, 5, 5, 9]
    weights = [2, 1, 1, 1, 2]  # W=7, target=4 → crossed at 2nd v=5 row
    assert _wmedian_rowwise(vals, weights) == 5
    assert _wmedian_sql(vals, weights) == 5


def test_wmedian_even_total_lower_median():
    # W=4, target=2: lower weighted median = first v reaching half mass
    assert _wmedian_rowwise([10, 20], [2, 2]) == 10
    assert _wmedian_sql([10, 20], [2, 2]) == 10


def test_wmedian_heavy_single_row_dominates():
    assert _wmedian_rowwise([1, 2, 3], [1, 1, 100]) == 3
    assert _wmedian_sql([1, 2, 3], [1, 1, 100]) == 3


def test_wmedian_random_agreement():
    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(1, 12))
        vals = rng.integers(-50, 50, n).tolist()
        weights = rng.integers(1, 9, n).tolist()
        assert _wmedian_rowwise(vals, weights) == _wmedian_sql(vals, weights)


# ------------------------------------------- chi-square zero cells

def test_chisq_zero_cell_contributes_expected_mass():
    # 2×2 with an empty cell: O=[[4,0],[0,4]]; E=2 everywhere;
    # each cell term = (O-E)^2/E = 2 → chi2 = 8 exactly
    obs = {("a", "x"): 4, ("b", "y"): 4}
    langs, sources = ["a", "b"], ["x", "y"]
    rt = {l: sum(obs.get((l, s), 0) for s in sources) for l in langs}
    ct = {s: sum(obs.get((l, s), 0) for l in langs) for s in sources}
    n = 8
    chi2_e6 = 0
    for l in langs:
        for s in sources:
            e = float(rt[l] * ct[s]) / float(n)
            d = float(obs.get((l, s), 0)) - e
            chi2_e6 += _q_e6(d * d / e)
    assert chi2_e6 == 8_000_000


def test_q_e6_matches_duckdb_round_for_nonnegative():
    con = duckdb.connect()
    for x in [0.0, 0.1234565, 2.5e-7, 1.9999995, 123456.789]:
        sql = con.execute(
            "SELECT cast(round(? * 1000000, 0) AS BIGINT)", [x]
        ).fetchone()[0]
        assert _q_e6(x) == sql, x


# ------------------------------------------- MAD arithmetic

def test_mad_cut_is_strict_integer_compare():
    # v (cents): median 10, devs [9,1,0,1,9] → MAD (lower median) 1,
    # cut 3 → outliers are the two devs of 9
    v = np.array([1, 9, 10, 11, 19], dtype=np.int64)
    med = int(np.sort(v)[(len(v) - 1) // 2])
    dev = np.abs(v - med)
    mad = int(np.sort(dev)[(len(dev) - 1) // 2])
    assert (med, mad) == (10, 1)
    assert int((dev > 3 * mad).sum()) == 2


def test_mad_all_equal_values_zero_mad_zero_outliers():
    v = np.full(9, 42, dtype=np.int64)
    med = int(np.sort(v)[(len(v) - 1) // 2])
    dev = np.abs(v - med)
    mad = int(np.sort(dev)[(len(dev) - 1) // 2])
    assert mad == 0 and int((dev > 0).sum()) == 0
