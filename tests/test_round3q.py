"""Continuation-#20 batch-2 contracts: the census/rank identities the
new hypothesis tests rely on equal textbook brute-force definitions —
Jonckheere pair counts + the no-tie variance identity, the Bartlett
quantized-ln chain vs the float statistic, Wilcoxon doubled mid-ranks
vs sorted average ranks, the Pettitt rank identity vs the sgn double
sum, and Ljung–Box n-scaled autocorrelations vs Fraction-exact
deviation ratios."""

import math
import random
from fractions import Fraction


def _rank2(marg):
    out, cum = {}, 0
    for v in sorted(marg):
        out[v] = 2 * cum + marg[v] + 1
        cum += marg[v]
    return out


# ---------------------------------------------------------------- JT


def _jt_u2_census(groups):
    """2U from per-group value->count dicts (the q_jonckheere_trend
    sweep)."""
    u2 = 0
    ks = sorted(groups)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            for x, ma in groups[a].items():
                for y, mb in groups[b].items():
                    if y > x:
                        u2 += 2 * ma * mb
                    elif y == x:
                        u2 += ma * mb
    return u2


def test_jonckheere_census_equals_brute_force_pairs():
    rng = random.Random(31)
    data = {o: [rng.randint(1, 9) + o for _ in range(80)] for o in range(3)}
    groups = {}
    for o, xs in data.items():
        groups[o] = {}
        for x in xs:
            groups[o][x] = groups[o].get(x, 0) + 1
    # brute force: U = #(y>x) + 0.5*#(y==x) over ordered group pairs
    u_twice = 0
    for a in range(3):
        for b in range(a + 1, 3):
            for x in data[a]:
                for y in data[b]:
                    if y > x:
                        u_twice += 2
                    elif y == x:
                        u_twice += 1
    assert _jt_u2_census(groups) == u_twice


def test_jonckheere_no_tie_variance_identity():
    # with all values distinct, A/72 must equal the classical
    # [n^2(2n+3) - sum n_g^2 (2n_g+3)] / 72 no-tie JT variance
    ng = [7, 11, 5]
    n = sum(ng)
    ga = sum(v * (v - 1) * (2 * v + 5) for v in ng)
    ta = sum(1 * 0 * 7 for _ in range(n))  # every tie group size 1 -> 0
    aa = n * (n - 1) * (2 * n + 5) - ga - ta
    classical = n * n * (2 * n + 3) - sum(v * v * (2 * v + 3) for v in ng)
    assert aa == classical


# ----------------------------------------------------------- Bartlett


def test_bartlett_quantized_chain_matches_float_statistic():
    rng = random.Random(37)
    data = {f: [rng.randint(1, 12) for _ in range(60 + i * 10)]
            for i, f in enumerate("ANR")}
    n = {f: len(v) for f, v in data.items()}
    s = {f: sum(v) for f, v in data.items()}
    q = {f: sum(x * x for x in v) for f, v in data.items()}
    nt, k = sum(n.values()), 3
    vg = {f: n[f] * q[f] - s[f] * s[f] for f in "ANR"}
    p_all = n["A"] * n["N"] * n["R"]
    w = sum(vg[f] * (p_all // n[f]) for f in "ANR")

    def _e6(v):
        return int(math.floor(abs(v) * 1e6 + 0.5)) * (1 if v >= 0 else -1)

    lp = _e6(math.log(float(w) / float(p_all * (nt - k))))
    lg = {f: _e6(math.log(float(vg[f]) / float(n[f] * (n[f] - 1))))
          for f in "ANR"}
    num_e6 = (nt - k) * lp - sum((n[f] - 1) * lg[f] for f in "ANR")
    pg = (n["A"] - 1) * (n["N"] - 1) * (n["R"] - 1)
    t_den = (nt - k) * pg
    t_num = (nt - k) * sum(pg // (n[f] - 1) for f in "ANR") - pg
    chi_q = (float(num_e6) / 1e6) / (1.0 + float(t_num) / (6.0 * float(t_den)))

    # float textbook Bartlett
    sg2 = {f: (q[f] - s[f] ** 2 / n[f]) / (n[f] - 1) for f in "ANR"}
    sp2 = sum((n[f] - 1) * sg2[f] for f in "ANR") / (nt - k)
    numf = (nt - k) * math.log(sp2) - sum(
        (n[f] - 1) * math.log(sg2[f]) for f in "ANR"
    )
    cf = 1.0 + (sum(1.0 / (n[f] - 1) for f in "ANR") - 1.0 / (nt - k)) / 6.0
    chi_f = numf / cf
    # quantization error bound: each ln off by <= 5e-7, amplified by
    # (nt-k) + sum(n_g - 1) = 2(nt - k) weights
    assert abs(chi_q - chi_f) <= 2 * (nt - k) * 5e-7 / cf + 1e-9


# ----------------------------------------------------------- Wilcoxon


def test_wilcoxon_doubled_midranks_equal_sorted_average_ranks():
    rng = random.Random(41)
    diffs = [rng.randint(-6, 6) for _ in range(120)]
    diffs = [d for d in diffs if d != 0]
    marg = {}
    for d in diffs:
        marg[abs(d)] = marg.get(abs(d), 0) + 1
    r2 = _rank2(marg)
    w2 = sum(r2[abs(d)] for d in diffs if d > 0)
    # brute force: average ranks of |d| via a sorted sweep
    srt = sorted(abs(d) for d in diffs)
    avg_rank = {}
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j] == srt[i]:
            j += 1
        avg_rank[srt[i]] = (i + 1 + j) / 2.0
        i = j
    w_brute = sum(avg_rank[abs(d)] for d in diffs if d > 0)
    assert w2 == int(2 * w_brute)
    # no-tie v48 reduces to 2n(n+1)(2n+1)
    npair = len(diffs)
    tie = sum(t ** 3 - t for t in marg.values())
    v48 = 2 * npair * (npair + 1) * (2 * npair + 1) - tie
    var_text = (npair * (npair + 1) * (2 * npair + 1) / 24.0
                - tie / 48.0)
    assert math.isclose(v48 / 48.0, var_text, rel_tol=1e-12)


# ------------------------------------------------------------ Pettitt


def test_pettitt_rank_identity_equals_sgn_double_sum():
    rng = random.Random(43)
    xs = [rng.randint(1, 7) for _ in range(60)]
    n = len(xs)
    marg = {}
    for x in xs:
        marg[x] = marg.get(x, 0) + 1
    r2 = _rank2(marg)
    cum = 0
    for t in range(1, n):
        cum += r2[xs[t - 1]]
        ut_rank = cum - t * (n + 1)
        ut_brute = sum(
            (1 if xs[i] > xs[j] else -1 if xs[i] < xs[j] else 0)
            for i in range(t)
            for j in range(t, n)
        )
        assert ut_rank == ut_brute, t


# ---------------------------------------------------------- Ljung–Box


def test_ljung_box_n_scaled_ratio_is_exact_autocorrelation():
    rng = random.Random(47)
    xs = [rng.randint(5, 40) for _ in range(50)]
    n = len(xs)
    s = sum(xs)
    ev = [n * x - s for x in xs]
    den = sum(e * e for e in ev)
    for k in (1, 2, 3):
        num = sum(ev[i] * ev[i + k] for i in range(n - k))
        # Fraction-exact deviations x - mean = e / n: the n^2 cancels
        mean = Fraction(s, n)
        num_f = sum(
            (Fraction(xs[i]) - mean) * (Fraction(xs[i + k]) - mean)
            for i in range(n - k)
        )
        den_f = sum((Fraction(x) - mean) ** 2 for x in xs)
        assert Fraction(num, den) == num_f / den_f


# ================= continuation-21 (nonparam.py) contracts =================


def test_cvm_cell_closed_form_equals_direct_sum():
    from weakscraper_ray.pipelines.nonparam import _sq_dev_sum

    for c, lo, hi in ((7, 1, 5), (100, 3, 3), (11, 2, 9), (0, 1, 4)):
        direct = sum((c - 2 * i) ** 2 for i in range(lo, hi + 1))
        assert _sq_dev_sum(c, lo, hi) == direct


def test_cvm_census_path_equals_midrank_brute_force():
    from weakscraper_ray.pipelines.nonparam import _sq_dev_sum

    rng = random.Random(53)
    a = [rng.randint(1, 9) for _ in range(40)]
    b = [rng.randint(2, 10) for _ in range(55)]
    n, m = len(a), len(b)
    nt = n + m
    # brute force: pooled average mid-ranks, U = n*sum(r_i - i)^2 + ...
    pooled = sorted(a + b)
    mid = {}
    i = 0
    while i < nt:
        j = i
        while j < nt and pooled[j] == pooled[i]:
            j += 1
        mid[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    u_brute = n * sum(
        (mid[v] - (i + 1)) ** 2 for i, v in enumerate(sorted(a))
    ) + m * sum((mid[v] - (j + 1)) ** 2 for j, v in enumerate(sorted(b)))
    t_brute = u_brute / (nt * m * n) - (4.0 * m * n - 1) / (6.0 * nt)
    # census path (the q_cramer_vonmises arithmetic)
    ga, gr, poolc = {}, {}, {}
    for v in a:
        ga[v] = ga.get(v, 0) + 1
    for v in b:
        gr[v] = gr.get(v, 0) + 1
    for d in (ga, gr):
        for v, c in d.items():
            poolc[v] = poolc.get(v, 0) + c
    r2 = _rank2(poolc)
    u4 = 0
    for grp, w in ((ga, n), (gr, m)):
        cum = 0
        for v in sorted(grp):
            u4 += w * _sq_dev_sum(r2[v], cum + 1, cum + grp[v])
            cum += grp[v]
    t_census = float(u4) / (4.0 * nt * m * n) - (4.0 * m * n - 1.0) / (
        6.0 * nt
    )
    assert u4 == int(round(4 * u_brute))
    assert math.isclose(t_census, t_brute, rel_tol=1e-12)


def test_hoeffding_census_sums_equal_observation_brute_force():
    rng = random.Random(59)
    xs = [rng.randint(1, 6) for _ in range(35)]
    ys = [x % 3 + rng.randint(0, 2) for x in xs]
    n = len(xs)
    # observation-level brute force with phi weights (x2 scale)
    def phi2(a, b):
        return 2 if a < b else (1 if a == b else 0)

    d1b = d2b = d3b = 0
    for i in range(n):
        q4 = 4 + sum(
            phi2(xs[j], xs[i]) * phi2(ys[j], ys[i])
            for j in range(n) if j != i
        )
        r2v = 1 + sum(phi2(xs[j], xs[i]) for j in range(n) if j != i) + 1
        s2v = 1 + sum(phi2(ys[j], ys[i]) for j in range(n) if j != i) + 1
        d1b += (q4 - 4) * (q4 - 8)
        d2b += (r2v - 2) * (r2v - 4) * (s2v - 2) * (s2v - 4)
        d3b += (r2v - 4) * (s2v - 4) * (q4 - 4)
    # census sweep (the q_hoeffding_d arithmetic)
    cells = {}
    for x, y in zip(xs, ys):
        cells[(x, y)] = cells.get((x, y), 0) + 1
    mx, my = {}, {}
    for (x, y), m in cells.items():
        mx[x] = mx.get(x, 0) + m
        my[y] = my.get(y, 0) + m
    rx, ry = _rank2(mx), _rank2(my)
    d1c = d2c = d3c = 0
    items = sorted(cells.items())
    for (x, y), m in items:
        q4 = 3
        for (x2, y2), m2 in items:
            wx = 2 if x2 < x else (1 if x2 == x else 0)
            if wx == 0:
                continue
            wy = 2 if y2 < y else (1 if y2 == y else 0)
            q4 += m2 * wx * wy
        d1c += m * (q4 - 4) * (q4 - 8)
        d2c += m * (rx[x] - 2) * (rx[x] - 4) * (ry[y] - 2) * (ry[y] - 4)
        d3c += m * (rx[x] - 4) * (ry[y] - 4) * (q4 - 4)
    assert (d1c, d2c, d3c) == (d1b, d2b, d3b)


def test_cochran_q_integer_identity_equals_textbook():
    rng = random.Random(61)
    rows = [(rng.randint(0, 1), rng.randint(0, 1), rng.randint(0, 1))
            for _ in range(200)]
    k = 3
    cj = [sum(r[j] for r in rows) for j in range(k)]
    t = sum(cj)
    r2 = sum(sum(r) ** 2 for r in rows)
    q_text = (k * (k - 1) * sum((c - t / k) ** 2 for c in cj)) / (
        k * t - r2
    )
    num = 2 * sum((3 * c - t) ** 2 for c in cj)
    den = 3 * (3 * t - r2)
    assert math.isclose(num / den, q_text, rel_tol=1e-12)


def test_hodges_lehmann_walsh_census_equals_brute_force():
    rng = random.Random(67)
    xs = [rng.randint(3, 20) for _ in range(45)]
    walsh_brute = sorted(
        xs[i] + xs[j] for i in range(len(xs)) for j in range(i, len(xs))
    )
    nw = len(walsh_brute)
    med2 = (
        walsh_brute[(nw + 1) // 2 - 1] + walsh_brute[nw // 2 + 1 - 1]
    )
    # census path
    vals = {}
    for x in xs:
        vals[x] = vals.get(x, 0) + 1
    walsh = {}
    items = sorted(vals.items())
    for i, (u, cu) in enumerate(items):
        walsh[2 * u] = walsh.get(2 * u, 0) + cu * (cu + 1) // 2
        for v, cv in items[i + 1:]:
            walsh[u + v] = walsh.get(u + v, 0) + cu * cv
    assert sum(walsh.values()) == nw

    def med2_census(marg):
        n = sum(marg.values())
        lo_pos, hi_pos = (n + 1) // 2, n // 2 + 1
        lo = hi = None
        cum = 0
        for v in sorted(marg):
            cum += marg[v]
            if lo is None and cum >= lo_pos:
                lo = v
            if hi is None and cum >= hi_pos:
                hi = v
                break
        return lo + hi

    assert med2_census(walsh) == med2


# ============ continuation-21b (mood_scale/hurst/sampen/alpha) ============


def test_mood_scale_moments_equal_subset_enumeration():
    from itertools import combinations

    # tiny pooled sample with ties; enumerate ALL m-subsets to verify
    # the finite-population mean/variance of W
    xs = [3, 5, 5, 7, 9, 9]
    n_all = len(xs)
    m = 3
    marg = {}
    for x in xs:
        marg[x] = marg.get(x, 0) + 1
    r2 = _rank2(marg)
    a4 = {v: (r2[v] - n_all - 1) ** 2 for v in marg}
    scores = [a4[x] for x in xs]
    t4 = sum(scores)
    t8 = sum(s * s for s in scores)
    e_formula = m * t4 / n_all
    var_formula = (
        m * (n_all - m) * (n_all * t8 - t4 * t4)
        / (n_all ** 2 * (n_all - 1))
    )
    ws = [sum(c) for c in combinations(scores, m)]
    e_brute = sum(ws) / len(ws)
    var_brute = sum((w - e_brute) ** 2 for w in ws) / len(ws)
    assert math.isclose(e_formula, e_brute, rel_tol=1e-12)
    assert math.isclose(var_formula, var_brute, rel_tol=1e-12)


def test_mood_scale_doubled_scores_are_4x_classic():
    xs = [2, 4, 4, 6, 8]
    n_all = len(xs)
    marg = {}
    for x in xs:
        marg[x] = marg.get(x, 0) + 1
    r2 = _rank2(marg)
    # classic scores with average mid-ranks
    srt = sorted(xs)
    mid = {}
    i = 0
    while i < n_all:
        j = i
        while j < n_all and srt[j] == srt[i]:
            j += 1
        mid[srt[i]] = (i + 1 + j) / 2.0
        i = j
    for v in marg:
        classic = (mid[v] - (n_all + 1) / 2.0) ** 2
        assert (r2[v] - n_all - 1) ** 2 == int(round(4 * classic))


def test_hurst_block_integer_ratio_equals_float_rs():
    rng = random.Random(71)
    s = 16
    blk = [rng.randint(10, 40) for _ in range(s)]
    mean = sum(blk) / s
    dev = [x - mean for x in blk]
    cums = []
    c = 0.0
    for d in dev:
        c += d
        cums.append(c)
    r_float = max(cums) - min(cums)
    s_float = math.sqrt(sum(d * d for d in dev) / s)
    # integer path
    sb = sum(blk)
    ev = [s * x - sb for x in blk]
    e2 = sum(e * e for e in ev)
    cum = 0
    mx, mn = -10**30, 10**30
    for e in ev:
        cum += e
        mx, mn = max(mx, cum), min(mn, cum)
    ratio_int = float(mx - mn) / math.sqrt(float(e2) / float(s))
    assert math.isclose(ratio_int, r_float / s_float, rel_tol=1e-12)


def test_hurst_slope_division_is_half_away_of_float_slope():
    ys = [1_234_567, 2_345_678, 3_456_788, 4_567_900]
    num = sum((2 * t - 9) * y for t, y in zip((3, 4, 5, 6), ys))
    h_e6 = (2 * num + 10) // 20 if num >= 0 else -((2 * (-num) + 10) // 20)
    tbar = 4.5
    slope = sum((t - tbar) * y for t, y in zip((3, 4, 5, 6), ys)) / sum(
        (t - tbar) ** 2 for t in (3, 4, 5, 6)
    )
    assert abs(h_e6 - slope) <= 0.5 + 1e-9


def test_sample_entropy_counts_equal_loop_reference():
    rng = random.Random(73)
    xs = [rng.randint(5, 15) for _ in range(40)]
    n = len(xs)
    r_tol = 2
    nt = n - 2
    b_ref = a_ref = 0
    for i in range(nt):
        for j in range(i + 1, nt):
            d01 = max(abs(xs[i] - xs[j]), abs(xs[i + 1] - xs[j + 1]))
            if d01 <= r_tol:
                b_ref += 1
                if max(d01, abs(xs[i + 2] - xs[j + 2])) <= r_tol:
                    a_ref += 1
    import numpy as np

    a = np.array(xs, dtype=np.int64)
    d0 = np.abs(a[:nt, None] - a[None, :nt])
    d1 = np.abs(a[1:nt + 1, None] - a[None, 1:nt + 1])
    d2 = np.abs(a[2:nt + 2, None] - a[None, 2:nt + 2])
    iu = np.triu_indices(nt, k=1)
    chem = np.maximum(d0[iu], d1[iu])
    assert int(np.sum(chem <= r_tol)) == b_ref
    assert int(np.sum(np.maximum(chem, d2[iu]) <= r_tol)) == a_ref


def test_cronbach_rational_equals_textbook_float_alpha():
    rng = random.Random(79)
    rows = [
        [rng.randint(1, 9) for _ in range(4)] for _ in range(150)
    ]
    n = len(rows)
    k = 4
    cols = list(zip(*rows))
    s = [sum(c) for c in cols]
    xy = {}
    for i in range(4):
        for j in range(i, 4):
            xy[(i, j)] = sum(a * b for a, b in zip(cols[i], cols[j]))
    v_items = sum(n * xy[(i, i)] - s[i] * s[i] for i in range(4))
    tot2 = sum(
        (1 if i == j else 2) * xy[(min(i, j), max(i, j))]
        for i in range(4)
        for j in range(i, 4)
    )
    s_tot = sum(s)
    v_tot = n * tot2 - s_tot * s_tot
    alpha_int = 4 * (v_tot - v_items) / (3 * v_tot)
    # textbook: k/(k-1) * (1 - sum(var_i)/var_total), sample variances
    def var(vals):
        mu = sum(vals) / len(vals)
        return sum((v - mu) ** 2 for v in vals) / (len(vals) - 1)

    tots = [sum(r) for r in rows]
    alpha_text = (k / (k - 1)) * (1 - sum(var(c) for c in cols) / var(tots))
    assert math.isclose(alpha_int, alpha_text, rel_tol=1e-12)


# ===== continuation-21c (ldiv/seasonal/gumbel/chao1) contracts =====


def test_ldiv_distinct_dedupe_equals_direct_distinct_count():
    import pandas as pd

    rng = random.Random(83)
    rows = pd.DataFrame(
        {
            "day": [rng.randint(0, 5) for _ in range(300)],
            "band": [rng.randint(0, 3) for _ in range(300)],
            "event_type": [rng.choice("abcde") for _ in range(300)],
        }
    )
    direct = rows.groupby(["day", "band"])["event_type"].nunique()
    # the pipeline identity: per-batch drop_duplicates -> global
    # triple dedupe -> per-class count
    batches = [rows.iloc[:100], rows.iloc[100:180], rows.iloc[180:]]
    trip = pd.concat(
        [b.drop_duplicates() for b in batches]
    ).drop_duplicates()
    via = trip.groupby(["day", "band"]).size()
    assert via.sort_index().equals(direct.sort_index())


def test_seasonal_indices_weighted_sum_is_zero():
    from fractions import Fraction

    rng = random.Random(89)
    census = {d: rng.randint(1, 30) for d in range(200) if rng.random() < 0.9}
    nd = {d: 0 for d in range(7)}
    sd = {d: 0 for d in range(7)}
    for day, c in census.items():
        nd[day % 7] += 1
        sd[day % 7] += c
    n_all, s_all = sum(nd.values()), sum(sd.values())
    total = sum(
        nd[d] * Fraction(sd[d] * n_all - s_all * nd[d], nd[d] * n_all)
        for d in range(7)
        if nd[d]
    )
    assert total == 0


def test_gumbel_moments_invert_to_sample_moments():
    rng = random.Random(97)
    vals = [rng.randint(20, 60) for _ in range(40)]
    nb = len(vals)
    sm = sum(vals)
    sq = sum(v * v for v in vals)
    var = float(nb * sq - sm * sm) / float(nb * (nb - 1))
    beta = math.sqrt(6.0 * var) / 3.141592653589793
    mu = float(sm) / float(nb) - 0.5772156649015329 * beta
    # MoM identities: mean = mu + gamma*beta, var = pi^2 beta^2 / 6
    assert math.isclose(
        mu + 0.5772156649015329 * beta, sm / nb, rel_tol=1e-12
    )
    assert math.isclose(
        3.141592653589793 ** 2 * beta * beta / 6.0, var, rel_tol=1e-12
    )


def test_chao1_bias_corrected_formula_is_exact_rational():
    from fractions import Fraction

    for types, f1, f2 in ((100, 30, 10), (50, 7, 0), (10, 0, 3)):
        chao = Fraction(types) + Fraction(f1 * (f1 - 1), 2 * (f2 + 1))
        e6 = 1_000_000 * types + (
            (2_000_000 * (f1 * (f1 - 1)) + 2 * (f2 + 1))
            // (2 * (2 * (f2 + 1)))
        )
        assert abs(Fraction(e6, 10**6) - chao) <= Fraction(1, 2 * 10**6)
        assert chao >= types


# ===== continuation-21d (moran/logrank/forecast/xcorr) contracts =====


def test_moran_shifted_products_equal_double_loop():
    import numpy as np

    rng = random.Random(101)
    dim = 6
    grid = np.array(
        [[rng.randint(0, 9) for _ in range(dim)] for _ in range(dim)],
        dtype=np.int64,
    )
    n_cells = dim * dim
    s = int(grid.sum())
    z = n_cells * grid - s
    u_fast = int((z[:-1, :] * z[1:, :]).sum()) + int(
        (z[:, :-1] * z[:, 1:]).sum()
    )
    u_loop = 0
    for i in range(dim):
        for j in range(dim):
            if i + 1 < dim:
                u_loop += int(z[i, j]) * int(z[i + 1, j])
            if j + 1 < dim:
                u_loop += int(z[i, j]) * int(z[i, j + 1])
    assert u_fast == u_loop
    # checkerboard -> strongly negative I; flat gradient -> positive
    cb = np.fromfunction(lambda i, j: (i + j) % 2, (dim, dim)).astype(
        np.int64
    ) * 10
    zc = n_cells * cb - int(cb.sum()) * np.ones_like(cb)
    uc = int((zc[:-1, :] * zc[1:, :]).sum()) + int(
        (zc[:, :-1] * zc[:, 1:]).sum()
    )
    assert uc < 0
    gr = np.fromfunction(lambda i, j: i, (dim, dim)).astype(np.int64)
    zg = n_cells * gr - int(gr.sum()) * np.ones_like(gr)
    ug = int((zg[:-1, :] * zg[1:, :]).sum()) + int(
        (zg[:, :-1] * zg[:, 1:]).sum()
    )
    assert ug > 0


def test_logrank_quantized_sums_match_fraction_reference():
    from fractions import Fraction

    rng = random.Random(103)
    # synthetic streams: (death_day, group); censor at cutoff
    streams = [(rng.randint(0, 19), rng.randint(0, 1)) for _ in range(400)]
    cutoff = 17
    days = sorted({d for d, _ in streams})
    risk0 = sum(1 for _, g in streams if g == 0)
    risk1 = len(streams) - risk0

    def away(v):
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    o1 = e_sum = v_sum = 0
    e_frac = Fraction(0)
    v_frac = Fraction(0)
    for d in days:
        d0 = sum(1 for dd, g in streams if dd == d and g == 0)
        d1 = sum(1 for dd, g in streams if dd == d and g == 1)
        if d < cutoff:
            n0, n1 = risk0, risk1
            n, dd_ = n0 + n1, d0 + d1
            o1 += d1
            e_sum += away(1e9 * (float(dd_ * n1) / float(n)))
            v_sum += away(
                1e9
                * (
                    float(dd_ * n1)
                    * float(n0)
                    * float(n - dd_)
                    / (float(n) * float(n) * float(n - 1))
                )
            )
            e_frac += Fraction(dd_ * n1, n)
            v_frac += Fraction(dd_ * n1 * n0 * (n - dd_), n * n * (n - 1))
        risk0 -= d0
        risk1 -= d1
    # each quantized term is within 0.5 of the exact e9-scaled value
    n_terms = sum(1 for d in days if d < cutoff)
    assert abs(e_sum - float(e_frac * 10**9)) <= 0.5 * n_terms + 1
    assert abs(v_sum - float(v_frac * 10**9)) <= 0.5 * n_terms + 1
    assert o1 == sum(1 for d, g in streams if g == 1 and d < cutoff)


def test_mase_rational_equals_float_reference():
    rng = random.Random(107)
    xs = [rng.randint(10, 50) for _ in range(60)]
    n = len(xs)
    mae7 = sum(abs(xs[t] - xs[t - 7]) for t in range(7, n))
    mae1 = sum(abs(xs[t] - xs[t - 1]) for t in range(1, n))
    mase_float = (mae7 / (n - 7)) / (mae1 / (n - 1))
    assert math.isclose(
        mae7 * (n - 1) / (mae1 * (n - 7)), mase_float, rel_tol=1e-12
    )


def test_xcorr_lag0_is_exact_pearson():
    from fractions import Fraction

    rng = random.Random(109)
    xs = [rng.randint(0, 20) for _ in range(50)]
    ys = [x + rng.randint(-3, 3) for x in xs]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    ev = [n * x - sx for x in xs]
    fv = [n * y - sy for y in ys]
    num = sum(e * f for e, f in zip(ev, fv))
    dx = sum(e * e for e in ev)
    dy = sum(f * f for f in fv)
    r_int = float(num) / math.sqrt(float(dx) * float(dy))
    # Fraction-exact Pearson over raw values (n^2 scale cancels)
    mx, my = Fraction(sx, n), Fraction(sy, n)
    cov = sum((Fraction(x) - mx) * (Fraction(y) - my) for x, y in zip(xs, ys))
    vx = sum((Fraction(x) - mx) ** 2 for x in xs)
    vy = sum((Fraction(y) - my) ** 2 for y in ys)
    assert Fraction(num * num, dx * dy) == cov * cov / (vx * vy)
    r_float = float(cov) / math.sqrt(float(vx) * float(vy))
    assert math.isclose(r_int, r_float, rel_tol=1e-9)


# ===== continuation-21e (effective_dim / mmd_embeddings) contracts =====


def test_participation_ratio_equals_eigen_definition():
    import numpy as np

    rng = np.random.RandomState(113)
    x = rng.randn(80, 6) * np.array([5, 3, 2, 1, 0.5, 0.1])
    q = np.floor(np.abs(x * 1000) + 0.5).astype(np.int64) * np.sign(
        x
    ).astype(np.int64)
    n = len(q)
    p = q.T @ q
    s = q.sum(axis=0)
    m = n * p - np.outer(s, s)
    tr = int(np.trace(m))
    frob = int((m.astype(object) * m.astype(object)).sum())
    pr_int = tr * tr / frob
    # eigen definition over the float centered covariance of q
    c = np.cov(q.T, bias=True)
    lam = np.linalg.eigvalsh(c)
    pr_eig = lam.sum() ** 2 / (lam**2).sum()
    assert math.isclose(pr_int, pr_eig, rel_tol=1e-9)
    # PR of an isotropic identity covariance is exactly dim
    mi = np.eye(4, dtype=object)
    tr_i = 4
    frob_i = 4
    assert tr_i * tr_i / frob_i == 4


def test_mmd_frobenius_identity_equals_pairwise_kernel_sums():
    import numpy as np

    rng = np.random.RandomState(127)
    a = rng.randint(-9, 10, size=(12, 5)).astype(np.int64)
    b = rng.randint(-9, 10, size=(15, 5)).astype(np.int64)
    pa_ = a.T @ a
    pb = b.T @ b
    faa = int((pa_.astype(object) * pa_.astype(object)).sum())
    fbb = int((pb.astype(object) * pb.astype(object)).sum())
    fab = int((pa_.astype(object) * pb.astype(object)).sum())
    # brute-force pairwise (x.y)^2 sums
    saa = sum(int(np.dot(a[i], a[j])) ** 2 for i in range(12) for j in range(12))
    sbb = sum(int(np.dot(b[i], b[j])) ** 2 for i in range(15) for j in range(15))
    sab = sum(int(np.dot(a[i], b[j])) ** 2 for i in range(12) for j in range(15))
    assert (faa, fbb, fab) == (saa, sbb, sab)
    # identical clouds -> MMD^2 == 0 exactly
    num = 12 * 12 * faa + 12 * 12 * faa - 2 * 12 * 12 * faa
    assert num == 0


# ===== continuation-22 (cuped/mantel-haenszel/fleiss) contracts =====


def test_cuped_moment_rationals_equal_float_theta_and_r2():
    rng = random.Random(131)
    xs = [rng.randint(0, 500) for _ in range(200)]
    ys = [x // 2 + rng.randint(-40, 40) for x in xs]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    # float reference: population cov / var and squared Pearson r
    mx, my = sx / n, sy / n
    cov_f = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    vx_f = sum((x - mx) ** 2 for x in xs) / n
    vy_f = sum((y - my) ** 2 for y in ys) / n
    assert math.isclose(cov / vx, cov_f / vx_f, rel_tol=1e-12)
    assert math.isclose(
        (cov * cov) / (vx * vy),
        (cov_f / math.sqrt(vx_f * vy_f)) ** 2,
        rel_tol=1e-12,
    )


def test_mantel_haenszel_cleared_product_equals_fraction_sum():
    rng = random.Random(137)
    strata = []
    for _ in range(6):
        a, b = rng.randint(1, 40), rng.randint(1, 40)
        c, d = rng.randint(1, 40), rng.randint(1, 40)
        strata.append((a, b, c, d, a + b + c + d))
    p_all = 1
    for t in strata:
        p_all *= t[4]
    num = sum(t[0] * t[3] * (p_all // t[4]) for t in strata)
    den = sum(t[1] * t[2] * (p_all // t[4]) for t in strata)
    ref_num = sum(Fraction(t[0] * t[3], t[4]) for t in strata)
    ref_den = sum(Fraction(t[1] * t[2], t[4]) for t in strata)
    assert Fraction(num, den) == ref_num / ref_den


def test_fleiss_kappa_integer_identity_equals_textbook():
    rng = random.Random(139)
    rs = [rng.randint(0, 3) for _ in range(300)]
    n = len(rs)
    a = sum(r * r + (3 - r) * (3 - r) - 3 for r in rs)
    s = sum(rs)
    b = s * s + (3 * n - s) ** 2
    kappa_int = (3 * n * a - 2 * b) / (2 * (9 * n * n - b))
    # textbook Fleiss 1971, k=3 raters, 2 categories
    p_bar = sum(
        (r * r + (3 - r) ** 2 - 3) / (3 * 2) for r in rs
    ) / n
    p1 = s / (3 * n)
    pe = p1 * p1 + (1 - p1) ** 2
    kappa_text = (p_bar - pe) / (1 - pe)
    assert math.isclose(kappa_int, kappa_text, rel_tol=1e-12)


# --------------------------------------------- good_turing / heaps_law


def test_good_turing_e6_rational_matches_fraction():
    from weakscraper_ray.pipelines.patterns import _ols_e6

    rng = random.Random(149)
    # random frequency-of-frequencies spectrum, some zero cells
    nr = {r: rng.choice([0, rng.randint(1, 500)]) for r in range(1, 12)}
    for r in range(1, 11):
        if nr[r] == 0:
            continue
        got = _ols_e6((r + 1) * nr[r + 1], nr[r])
        ref = Fraction((r + 1) * nr[r + 1] * 1_000_000, nr[r])
        # half-away e6 of a non-negative rational
        assert got == int(ref) + (1 if ref - int(ref) >= Fraction(1, 2) else 0)


def test_good_turing_smoothed_mass_conservation():
    # textbook GT identity: sum over r>=1 of N_r * r* equals
    # sum over r>=2 of r * N_r  (mass shifted down one count level),
    # exact in Fractions — the identity the r* table encodes
    rng = random.Random(151)
    nr = {r: rng.randint(1, 200) for r in range(1, 30)}
    nr[30] = 0  # spectrum ends
    lhs = sum(
        Fraction((r + 1) * nr.get(r + 1, 0), nr[r]) * nr[r]
        for r in range(1, 30)
        if nr[r] > 0
    )
    rhs = sum(r * nr.get(r, 0) for r in range(2, 31))
    assert lhs == rhs


def test_heaps_quantized_log_ols_recovers_beta():
    # V = K * N^beta exactly in floats -> the e6-quantized-log OLS
    # chain (the zipf_slope/heaps_law convention) recovers beta to
    # within the quantization grain
    def q_e6(v):
        return int(math.floor(abs(v) * 1e6 + 0.5)) * (1 if v >= 0 else -1)

    beta, K = 0.5, 3.0
    pts = [(n, K * n**beta) for n in (10 ** (k / 2) for k in range(2, 18))]
    lx = [q_e6(math.log(n)) for n, _ in pts]
    ly = [q_e6(math.log(v)) for _, v in pts]
    k = len(pts)
    sx, sy = sum(lx), sum(ly)
    sxx = sum(v * v for v in lx)
    sxy = sum(a * b for a, b in zip(lx, ly))
    slope = float(k * sxy - sx * sy) / float(k * sxx - sx * sx)
    assert abs(slope - beta) < 1e-5


def test_heaps_bucket_assignment_matches_sql_least():
    # numpy bucket expression == SQL least(Q-1, doc_id * Q // span)
    import numpy as np

    q, span = 16, 501
    ids = np.arange(span)
    ray_b = np.minimum(q - 1, ids * q // span)
    sql_b = np.array([min(q - 1, int(i) * q // span) for i in ids])
    assert (ray_b == sql_b).all() and ray_b.max() == q - 1 and ray_b[0] == 0


def test_kendall_w_doubled_rank_identity_equals_textbook():
    # W = 3*S4 / (m^2(n^3-n) - m*sum T')  with doubled ranks equals
    # the textbook tie-corrected W over average ranks
    rng = random.Random(157)
    n, m = 120, 3
    cols = [[rng.randint(0, 15) for _ in range(n)] for _ in range(m)]

    def avg_ranks(vs):
        order = sorted(range(n), key=lambda i: vs[i])
        ranks = [0.0] * n
        i = 0
        while i < n:
            j = i
            while j < n and vs[order[j]] == vs[order[i]]:
                j += 1
            r = (i + 1 + j) / 2  # average of ranks i+1..j
            for k in range(i, j):
                ranks[order[k]] = r
            i = j
        return ranks

    # textbook: S over average-rank sums, tie term sum(t^3 - t)
    ar = [avg_ranks(c) for c in cols]
    R = [sum(ar[j][i] for j in range(m)) for i in range(n)]
    Rbar = m * (n + 1) / 2
    S = sum((r - Rbar) ** 2 for r in R)
    t_sum = 0
    for c in cols:
        from collections import Counter

        for t in Counter(c).values():
            t_sum += t**3 - t
    W_text = 12 * S / (m * m * (n**3 - n) - m * t_sum)

    # doubled-rank integer chain (the q_kendall_w computation)
    def dranks(vs):
        from collections import Counter

        cnt = Counter(vs)
        out, cum = {}, 0
        for v in sorted(cnt):
            out[v] = 2 * cum + cnt[v] + 1
            cum += cnt[v]
        return out

    dms = [dranks(c) for c in cols]
    R2 = [sum(dms[j][cols[j][i]] for j in range(m)) for i in range(n)]
    S4 = sum((r2 - m * (n + 1)) ** 2 for r2 in R2)
    W_int = Fraction(3 * S4, m * m * (n**3 - n) - m * t_sum)
    assert math.isclose(float(W_int), W_text, rel_tol=1e-12)
    assert 0 <= W_int <= 1


def test_ansari_bradley_doubled_scores_and_z_match_textbook():
    # doubled folded scores s' = min(r', 2(N+1)-r') are exactly twice
    # the textbook AB scores min(avgrank, N+1-avgrank), and the
    # doubled-score z chain equals the single-rank z (doubling cancels)
    rng = random.Random(163)
    pooled_vals = [rng.randint(0, 12) for _ in range(150)]
    labels = [rng.random() < 0.4 for _ in range(150)]  # True = group A
    from collections import Counter

    cnt = Counter(pooled_vals)
    n = len(pooled_vals)
    # doubled mid-ranks
    dr, cum = {}, 0
    for v in sorted(cnt):
        dr[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    # textbook average ranks + scores
    ar = {v: dr[v] / 2 for v in dr}
    for v in cnt:
        assert min(dr[v], 2 * (n + 1) - dr[v]) == 2 * min(ar[v], n + 1 - ar[v])
    s2 = {v: min(dr[v], 2 * (n + 1) - dr[v]) for v in cnt}
    sA = {v: sum(1 for x, a in zip(pooled_vals, labels) if a and x == v)
          for v in cnt}
    m = sum(sA.values())
    w2 = sum(sA[v] * s2[v] for v in cnt)
    t1 = sum(cnt[v] * s2[v] for v in cnt)
    t2 = sum(cnt[v] * s2[v] ** 2 for v in cnt)
    z2 = (n * w2 - m * t1) / math.sqrt(
        m * (n - m) * (n * t2 - t1 * t1) / (n - 1)
    )
    # single-rank textbook chain
    s1 = {v: min(ar[v], n + 1 - ar[v]) for v in cnt}
    w1 = sum(sA[v] * s1[v] for v in cnt)
    u1 = sum(cnt[v] * s1[v] for v in cnt)
    u2 = sum(cnt[v] * s1[v] ** 2 for v in cnt)
    z1 = (n * w1 - m * u1) / math.sqrt(
        m * (n - m) * (n * u2 - u1 * u1) / (n - 1)
    )
    assert math.isclose(z1, z2, rel_tol=1e-12)
