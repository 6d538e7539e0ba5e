"""Continuation-#17 contracts: the census-based Spearman/Mann–Kendall
reductions equal brute-force definitions over expanded values; Yule's K
e6 read-out matches Fraction rounding; doubled mid-ranks match the
textbook average-rank assignment."""

import math
import random
from fractions import Fraction

import numpy as np


def _brute_spearman(xs, ys):
    """Textbook tie-corrected Spearman: Pearson over average ranks."""

    def avg_ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        r = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and v[order[j]] == v[order[i]]:
                j += 1
            mid = (i + 1 + j) / 2.0
            for k in range(i, j):
                r[order[k]] = mid
            i = j
        return r

    ra, rb = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    sx, sy = sum(ra), sum(rb)
    sxy = sum(a * b for a, b in zip(ra, rb))
    sxx = sum(a * a for a in ra)
    syy = sum(b * b for b in rb)
    num = n * sxy - sx * sy
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return num / den


def test_census_spearman_matches_brute_force():
    from weakscraper_ray.pipelines.measures import _rank2

    rng = random.Random(7)
    xs = [rng.randint(0, 5) for _ in range(400)]
    ys = [x + rng.randint(0, 3) for x in xs]  # correlated, heavy ties
    cells = {}
    for x, y in zip(xs, ys):
        cells[(x, y)] = cells.get((x, y), 0) + 1
    mx, my = {}, {}
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
    assert abs(rho - _brute_spearman(xs, ys)) < 1e-12


def test_rank2_is_doubled_average_rank():
    from weakscraper_ray.pipelines.measures import _rank2

    marg = {3: 4, 7: 1, 9: 2}  # values 3,3,3,3,7,9,9
    r2 = _rank2(marg)
    # average ranks: 3 → (1+2+3+4)/4 = 2.5; 7 → 5; 9 → (6+7)/2 = 6.5
    assert r2 == {3: 5, 7: 10, 9: 13}


def test_mann_kendall_census_matches_brute_force():
    rng = random.Random(11)
    c = np.array([rng.randint(0, 4) for _ in range(200)], dtype=np.int64)
    n = len(c)
    # module path (mirrors q_mann_kendall's folded sweep)
    sgn = np.sign(c[None, :] - c[:, None])
    s_stat = int(np.triu(sgn, k=1).sum())
    var18 = n * (n - 1) * (2 * n + 5)
    vals, cnts = np.unique(c, return_counts=True)
    for t in cnts:
        t = int(t)
        var18 -= t * (t - 1) * (2 * t + 5)
    # brute force over all ordered pairs
    s_brute = sum(
        (1 if c[j] > c[i] else -1 if c[j] < c[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert s_stat == s_brute
    ties = {}
    for v in c:
        ties[int(v)] = ties.get(int(v), 0) + 1
    var18_brute = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values()
    )
    assert var18 == var18_brute
    assert var18 >= 0


def test_yule_k_e6_matches_fraction_rounding():
    from weakscraper_ray.pipelines.patterns import _ols_e6

    # tiny corpus: counts {the:3, cat:2, sat:1, mat:1} → N=7, S2=15
    counts = [3, 2, 1, 1]
    n = sum(counts)
    s2 = sum(m * m for m in counts)
    k_e6 = _ols_e6(10_000 * (s2 - n), n * n)
    exact = Fraction(10_000 * (s2 - n) * 10**6, n * n)
    # half-away-from-zero rounding of the exact rational
    want = int(exact) + (1 if (exact - int(exact)) * 2 >= 1 else 0)
    assert k_e6 == want
    assert s2 >= n  # K is non-negative for every census


def test_yule_k_spectrum_identity():
    """S₂ from per-type counts equals Σ m²·V_m from the spectrum —
    the identity the docstring's formula quotes (Yule's original form
    uses the spectrum; the implementation folds per-type squares)."""
    rng = random.Random(3)
    counts = [rng.randint(1, 9) for _ in range(50)]
    s2_types = sum(m * m for m in counts)
    spectrum = {}
    for m in counts:
        spectrum[m] = spectrum.get(m, 0) + 1
    s2_spec = sum(m * m * v for m, v in spectrum.items())
    assert s2_types == s2_spec


def test_var_edges_matches_brute_force_and_knuth_pinned():
    from weakscraper_ray.pipelines import graph as g
    from weakscraper_ray.pipelines.graphstats import (
        _GS_KNUTH,
        _GS_MAXOUT,
        _out_deg,
        _var_edges,
    )

    assert _GS_KNUTH == g._PR_KNUTH  # shared public constant, pinned
    n = 97
    src = np.arange(n, dtype=np.int64)
    es, ed = _var_edges(src, n)
    brute = set()
    for u in range(n):
        for j in range(1, 1 + (u % _GS_MAXOUT) + 1):
            brute.add((u, (u * _GS_KNUTH + j) % n))
    assert set(zip(es.tolist(), ed.tolist())) == brute
    assert len(es) == len(brute)  # no duplicate edges
    # out-degree identity
    out = np.bincount(es, minlength=n)
    assert (out == _out_deg(src)).all()


def test_assortativity_moments_equal_corrcoef():
    from weakscraper_ray.pipelines.graphstats import _out_deg, _var_edges

    n = 64
    src = np.arange(n, dtype=np.int64)
    es, ed = _var_edges(src, n)
    indeg = np.bincount(ed, minlength=n)
    deg = indeg + _out_deg(src)
    x, y = deg[es].astype(np.int64), deg[ed].astype(np.int64)
    m = len(x)
    num = m * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    denx = m * int((x * x).sum()) - int(x.sum()) ** 2
    deny = m * int((y * y).sum()) - int(y.sum()) ** 2
    r = float(num) / math.sqrt(float(denx) * float(deny))
    want = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
    assert abs(r - want) < 1e-12


def test_rich_club_census_cumulative_identity():
    from weakscraper_ray.pipelines.graphstats import _out_deg, _var_edges

    n = 64
    src = np.arange(n, dtype=np.int64)
    es, ed = _var_edges(src, n)
    indeg = np.bincount(ed, minlength=n)
    deg = indeg + _out_deg(src)
    md = np.minimum(deg[es], deg[ed])
    census = {}
    for v in md:
        census[int(v)] = census.get(int(v), 0) + 1
    for k in range(10):
        e_k = sum(c for v, c in census.items() if v > k)
        brute = int(((deg[es] > k) & (deg[ed] > k)).sum())
        assert e_k == brute


def test_ams_signs_match_md5_bit_definition():
    import hashlib

    from weakscraper_ray.pipelines.moments import _AMS_K, _ams_signs

    users = np.array([0, 1, 42, 999999, 2**31], dtype=np.int64)
    s = _ams_signs(users)
    assert s.shape == (len(users), _AMS_K)
    for i, u in enumerate(users):
        h = int.from_bytes(
            hashlib.md5(str(int(u)).encode()).digest()[8:], "little"
        )
        for j in (0, 1, 31, 62, 63):
            assert s[i, j] == (1 if (h >> j) & 1 else -1)


def test_ams_counter_partials_are_linear_and_readout_is_median():
    """Per-batch distinct-user partials fold to the same 64 counters as
    one global pass (c_j is linear in counts), and est_x32 equals
    32 x the textbook median of the 4 group means."""
    import statistics

    from weakscraper_ray.pipelines.moments import (
        _AMS_GROUP, _AMS_K, _ams_signs)

    rng = random.Random(13)
    events = [rng.randint(0, 40) for _ in range(3000)]
    # global pass
    uniq, cnt = np.unique(np.array(events, dtype=np.int64),
                          return_counts=True)
    c_global = _ams_signs(uniq).T @ cnt.astype(np.int64)
    # three arbitrary batches, folded
    c_fold = np.zeros(_AMS_K, dtype=np.int64)
    for lo, hi in [(0, 1000), (1000, 1700), (1700, 3000)]:
        u, k = np.unique(np.array(events[lo:hi], dtype=np.int64),
                         return_counts=True)
        c_fold += _ams_signs(u).T @ k.astype(np.int64)
    assert (c_global == c_fold).all()
    g = sorted(
        sum(int(c_global[j]) ** 2 for j in range(k, k + _AMS_GROUP))
        for k in range(0, _AMS_K, _AMS_GROUP)
    )
    est_x32 = g[1] + g[2]
    means = sorted(gs / _AMS_GROUP for gs in g)
    assert est_x32 / 32.0 == statistics.median(means)
    # sanity: the estimator is within 3x of exact F2 on this input
    f2 = int((cnt.astype(object) ** 2).sum())
    assert f2 / 3 < est_x32 / 32 < f2 * 3
