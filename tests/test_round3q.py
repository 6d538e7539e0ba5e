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
