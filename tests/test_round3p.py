"""Continuation-#18 contracts: the census-moment ANOVA / Kruskal–Wallis
chains equal textbook brute-force statistics on expanded values; the
periodogram trig literals match libm; the k = 0 DFT line is the mean
line."""

import math
import random

import numpy as np


def _census(xs, fs):
    cells = {}
    for f, x in zip(fs, xs):
        cells[(f, x)] = cells.get((f, x), 0) + 1
    return cells


def test_anova_moments_equal_brute_force_f():
    rng = random.Random(11)
    fs = [rng.choice("ANR") for _ in range(600)]
    xs = [rng.randint(1, 10) + (0 if f == "A" else 2) for f in fs]
    # brute-force F from definitions
    groups = {f: [x for g, x in zip(fs, xs) if g == f] for f in "ANR"}
    n = len(xs)
    gm = sum(xs) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    f_brute = (ssb / 2.0) / (ssw / (n - 3.0))
    # moment-chain F (the q_anova_f arithmetic over the census)
    cells = _census(xs, fs)
    ng = {f: 0 for f in "ANR"}
    s = {f: 0 for f in "ANR"}
    q = {f: 0 for f in "ANR"}
    for (f, x), m in cells.items():
        ng[f] += m
        s[f] += m * x
        q[f] += m * x * x
    nt, st, qt = sum(ng.values()), sum(s.values()), sum(q.values())
    t1 = sum(float(s[f]) * float(s[f]) / float(ng[f]) for f in "ANR")
    f_chain = ((t1 - float(st) * float(st) / float(nt)) / 2.0) / (
        (float(qt) - t1) / (float(nt) - 3.0)
    )
    assert math.isclose(f_chain, f_brute, rel_tol=1e-9)


def test_kruskal_chain_equals_brute_force_h():
    rng = random.Random(13)
    fs = [rng.choice("ANR") for _ in range(500)]
    xs = [rng.randint(1, 8) + (1 if f == "R" else 0) for f in fs]
    n = len(xs)
    # textbook tie-corrected H over average ranks
    order = sorted(range(n), key=lambda i: xs[i])
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and xs[order[j]] == xs[order[i]]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for t in range(i, j):
            ranks[order[t]] = mid
        i = j
    rsum = {f: 0.0 for f in "ANR"}
    cnt = {f: 0 for f in "ANR"}
    for f, r in zip(fs, ranks):
        rsum[f] += r
        cnt[f] += 1
    h_raw = 12.0 / (n * (n + 1)) * sum(
        rsum[f] ** 2 / cnt[f] for f in "ANR"
    ) - 3.0 * (n + 1)
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(xs).values())
    h_brute = h_raw / (1.0 - tie / (n**3 - n))
    # doubled-midrank census chain (the q_kruskal_wallis arithmetic)
    from weakscraper_ray.pipelines.measures import _rank2

    cells = _census(xs, fs)
    marg = {}
    for (_, x), m in cells.items():
        marg[x] = marg.get(x, 0) + m
    r2 = _rank2(marg)
    ng = {f: 0 for f in "ANR"}
    rp = {f: 0 for f in "ANR"}
    for (f, x), m in cells.items():
        ng[f] += m
        rp[f] += m * r2[x]
    t1 = sum(float(rp[f]) * float(rp[f]) / float(ng[f]) for f in "ANR")
    nd = float(n)
    h_chain = (3.0 * t1 / (nd * (nd + 1.0)) - 3.0 * (nd + 1.0)) / (
        1.0 - float(tie) / (nd * nd * nd - nd)
    )
    assert math.isclose(h_chain, h_brute, rel_tol=1e-9)


def test_rank2_doubling_cancels_in_t1():
    # R'_g = 2 R_g exactly: the factor 4 moved into 12/4 = 3
    from weakscraper_ray.pipelines.measures import _rank2

    marg = {3: 2, 5: 1, 9: 4}
    r2 = _rank2(marg)
    # expanded average ranks: value 3 -> (1+2)/2 = 1.5, 5 -> 3, 9 -> 5.5
    assert r2[3] == int(2 * 1.5) and r2[5] == int(2 * 3.0)
    assert r2[9] == int(2 * 5.5)


def test_dft_literals_match_libm():
    from weakscraper_ray.pipelines.hypotests import _COS_E9, _SIN_E9

    for k in range(4):
        for m in range(7):
            ang = 2.0 * math.pi * k * m / 7.0
            c = math.cos(ang) * 1e9
            s = math.sin(ang) * 1e9
            assert _COS_E9[k][m] == int(np.rint(c))
            assert _SIN_E9[k][m] == int(np.rint(s))
            # rint is within half an ulp of the true value
            assert abs(_COS_E9[k][m] - c) <= 0.5 + 1e-6
            assert abs(_SIN_E9[k][m] - s) <= 0.5 + 1e-6


def test_dft_k0_is_mean_line_and_power_matches_complex_dft():
    from weakscraper_ray.pipelines.hypotests import _COS_E9, _SIN_E9

    rng = random.Random(17)
    n_m = [rng.randint(100, 999) for _ in range(7)]
    tot = sum(n_m)
    for k in range(4):
        a = sum(n_m[m] * _COS_E9[k][m] for m in range(7))
        b = sum(n_m[m] * _SIN_E9[k][m] for m in range(7))
        if k == 0:
            assert a == tot * 10**9 and b == 0
        # quantized power tracks the float DFT power within the
        # quantization error bound (7 * tot * 0.5 per component)
        za = sum(n_m[m] * math.cos(2 * math.pi * k * m / 7) for m in range(7))
        zb = sum(n_m[m] * math.sin(2 * math.pi * k * m / 7) for m in range(7))
        assert abs(a - za * 1e9) <= 3.5 * tot + 1
        assert abs(b - zb * 1e9) <= 3.5 * tot + 1


def test_brier_bin_identity_matches_expanded_definition():
    """4B²N·Brier integer fold == Σ_docs (m_b − y)² over expanded docs."""
    rng = random.Random(19)
    B = 10
    # synthetic bin census
    bins = {b: (rng.randint(1, 50), 0) for b in range(B)}
    bins = {b: (n, rng.randint(0, n)) for b, (n, _) in bins.items()}
    num = sum(
        npos * (2 * B - (2 * b + 1)) ** 2 + (n - npos) * (2 * b + 1) ** 2
        for b, (n, npos) in bins.items()
    )
    nt = sum(n for n, _ in bins.values())
    # expanded brute force over individual docs
    brute = 0.0
    for b, (n, npos) in bins.items():
        m = (2 * b + 1) / (2 * B)
        brute += npos * (m - 1.0) ** 2 + (n - npos) * (m - 0.0) ** 2
    brute /= nt
    assert math.isclose(num / (4 * B * B * nt), brute, rel_tol=1e-12)


def test_hilbert_is_unit_step_hamiltonian_path():
    """The defining Hilbert property: d is a bijection on the 256x256
    grid and consecutive codes are grid-adjacent (|dx|+|dy| == 1) —
    which Morton/z-order violates at every seam."""
    from weakscraper_ray.pipelines.dataops import hilbert_xy2d

    side = 256
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    d = hilbert_xy2d(xs.ravel(), ys.ravel())
    assert sorted(d.tolist()) == list(range(side * side))  # bijection
    order = np.argsort(d)
    px, py = xs.ravel()[order], ys.ravel()[order]
    steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (steps == 1).all()


def test_hilbert_matches_scalar_reference():
    """Vectorized walk == the classic scalar xy2d on random cells."""
    from weakscraper_ray.pipelines.dataops import hilbert_xy2d

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    rng = random.Random(23)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(300)]
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    vec = hilbert_xy2d(xs, ys)
    for (x, y), v in zip(pts, vec):
        assert xy2d(256, x, y) == int(v)


def test_hilbert_tiles_are_tighter_than_zorder_worst_case():
    """Every 64-code Hilbert tile is a connected region with span <= 15
    per axis over the full grid (Morton tiles are exact 8x8 boxes but
    adjacent CODES can jump across the grid; Hilbert trades box shape
    for path continuity)."""
    from weakscraper_ray.pipelines.dataops import hilbert_xy2d

    side = 256
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    d = hilbert_xy2d(xs.ravel(), ys.ravel())
    tile = d >> 6
    import pandas as pd

    df = pd.DataFrame({"t": tile, "x": xs.ravel(), "y": ys.ravel()})
    g = df.groupby("t").agg(
        sx=("x", lambda v: v.max() - v.min()),
        sy=("y", lambda v: v.max() - v.min()),
    )
    assert (g["sx"] <= 15).all() and (g["sy"] <= 15).all()


def _brute_dbscan(q, eps2, minpts):
    """Textbook DBSCAN with the repo's deterministic border rule."""
    n = len(q)
    s2 = (q**2).sum(1)
    d2 = s2[:, None] + s2[None, :] - 2 * (q @ q.T)
    adj = d2 <= eps2
    deg = adj.sum(1)  # includes self
    core = deg >= minpts
    # components over core-core edges (incl. singleton cores)
    parent = list(range(n))

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for a in range(n):
        if not core[a]:
            continue
        for b in range(a + 1, n):
            if core[b] and adj[a, b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    label = [-1] * n
    roots = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            roots.setdefault(r, []).append(i)
    rootmin = {r: min(m) for r, m in roots.items()}
    out = []
    for i in range(n):
        if core[i]:
            out.append((i, "core", rootmin[find(i)]))
        else:
            anchors = [j for j in range(n) if core[j] and adj[i, j]]
            if anchors:
                out.append((i, "border", rootmin[find(min(anchors))]))
            else:
                out.append((i, "noise", -1))
    return out


def test_dbscan_pass_structure_matches_brute_force():
    """The three-pass decomposition (degree → core edges+self-loops →
    label) reproduces the single-machine reference, including
    singleton-core clusters and the min-anchor border rule."""
    from weakscraper_ray.functions.dedup import union_find_labels

    rng = np.random.RandomState(29)
    # three planted blobs + scattered noise, exercising all roles
    q = np.vstack(
        [
            rng.randint(-3, 4, (12, 4)) + np.array([100, 0, 0, 0]),
            rng.randint(-3, 4, (12, 4)) + np.array([0, 100, 0, 0]),
            rng.randint(-2, 3, (2, 4)) + np.array([0, 0, 100, 0]),
            rng.randint(-200, 200, (10, 4)),
        ]
    ).astype(np.int64)
    eps2, minpts = 40, 4
    expect = _brute_dbscan(q, eps2, minpts)
    # replay the distributed passes in-process
    n = len(q)
    s2 = (q**2).sum(1)
    d2 = s2[:, None] + s2[None, :] - 2 * (q @ q.T)
    adj = d2 <= eps2
    core = adj.sum(1) >= minpts
    ids = np.arange(n)
    bi, oi = np.nonzero(adj & core[:, None] & core[None, :] & (ids[:, None] < ids[None, :]))
    edges = list(zip(bi.tolist(), oi.tolist())) + [
        (int(i), int(i)) for i in ids[core]
    ]
    labels_map = union_find_labels(edges)
    lab = np.full(n, -1, dtype=np.int64)
    for k, v in labels_map.items():
        lab[k] = v
    got = []
    for i in range(n):
        if core[i]:
            got.append((i, "core", int(lab[i])))
        else:
            core_nb = adj[i] & core
            if core_nb.any():
                got.append((i, "border", int(lab[core_nb.argmax()])))
            else:
                got.append((i, "noise", -1))
    assert got == expect


def test_dbscan_eps_gate_constants_pinned():
    from weakscraper_ray.pipelines import clustering as c

    assert c._DBSCAN_MINPTS == 4
    assert c._DBSCAN_EPS2_SMALL == 1_350_000_000_000
    assert c._DBSCAN_EPS2_LARGE == 1_280_000_000_000
    assert c._DBSCAN_GATE == 1000
    assert "1350000000000" in c.SQL_DBSCAN and "1280000000000" in c.SQL_DBSCAN


def test_ks_census_d_matches_brute_force():
    rng = random.Random(31)
    a = [rng.randint(1, 12) for _ in range(300)]
    b = [rng.randint(2, 14) for _ in range(220)]
    na, nb = len(a), len(b)
    # brute force over the empirical CDFs
    d_brute = max(
        abs(sum(x <= v for x in a) / na - sum(x <= v for x in b) / nb)
        for v in set(a) | set(b)
    )
    # census integer form
    ca, cb = {}, {}
    for x in a:
        ca[x] = ca.get(x, 0) + 1
    for x in b:
        cb[x] = cb.get(x, 0) + 1
    d_num, cum_a, cum_b = 0, 0, 0
    for v in sorted(set(ca) | set(cb)):
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        d_num = max(d_num, abs(cum_a * nb - cum_b * na))
    assert math.isclose(d_num / (na * nb), d_brute, rel_tol=1e-12)


def test_med2_is_exact_doubled_median():
    from weakscraper_ray.pipelines.hypotests import _med2

    rng = random.Random(37)
    for trial in range(30):
        vals = [rng.randint(0, 9) for _ in range(rng.randint(1, 40))]
        marg = {}
        for v in vals:
            marg[v] = marg.get(v, 0) + 1
        vs = sorted(vals)
        n = len(vs)
        if n % 2:
            want = 2 * vs[n // 2]
        else:
            want = vs[n // 2 - 1] + vs[n // 2]
        assert _med2(marg) == want, (trial, vals)


def test_levene_chain_matches_brute_force_w():
    rng = random.Random(41)
    fs = [rng.choice("ANR") for _ in range(400)]
    xs = [rng.randint(1, 9) * (2 if f == "N" else 1) for f in fs]
    import statistics

    groups = {f: sorted(x for g, x in zip(fs, xs) if g == f) for f in "ANR"}
    med = {f: statistics.median(v) for f, v in groups.items()}
    z = {f: [abs(x - med[f]) for x in v] for f, v in groups.items()}
    n = len(xs)
    zbar = {f: sum(v) / len(v) for f, v in z.items()}
    gz = sum(sum(v) for v in z.values()) / n
    ssb = sum(len(v) * (zbar[f] - gz) ** 2 for f, v in z.items())
    ssw = sum(sum((x - zbar[f]) ** 2 for x in v) for f, v in z.items())
    w_brute = (ssb / 2.0) / (ssw / (n - 3.0))
    # doubled-deviation moment chain (q_levene_test arithmetic)
    from weakscraper_ray.pipelines.hypotests import _med2

    cells = _census(xs, fs)
    margs = {f: {} for f in "ANR"}
    for (f, x), m in cells.items():
        margs[f][x] = margs[f].get(x, 0) + m
    m2 = {f: _med2(margs[f]) for f in "ANR"}
    ng = {f: 0 for f in "ANR"}
    s = {f: 0 for f in "ANR"}
    q = {f: 0 for f in "ANR"}
    for (f, x), m in cells.items():
        z2 = abs(2 * x - m2[f])
        ng[f] += m
        s[f] += m * z2
        q[f] += m * z2 * z2
    nt, st, qt = n, sum(s.values()), sum(q.values())
    t1 = sum(float(s[f]) * float(s[f]) / float(ng[f]) for f in "ANR")
    w_chain = ((t1 - float(st) * float(st) / float(nt)) / 2.0) / (
        (float(qt) - t1) / (float(nt) - 3.0)
    )
    # doubling cancels: z2 = 2z scales ssb and ssw by 4
    assert math.isclose(w_chain, w_brute, rel_tol=1e-9)


def test_chi2_quantized_sum_tracks_float_chi2():
    rng = random.Random(43)
    cells = {
        (i, j): rng.randint(5, 400) for i in range(4) for j in range(3)
    }
    rows, cols = {}, {}
    for (i, j), m in cells.items():
        rows[i] = rows.get(i, 0) + m
        cols[j] = cols.get(j, 0) + m
    n = sum(cells.values())
    chi_float = sum(
        (o - rows[i] * cols[j] / n) ** 2 / (rows[i] * cols[j] / n)
        for (i, j), o in cells.items()
    )

    def e6(p, d):
        return (2_000_000 * p + d) // (2 * d)

    total = sum(
        e6(n * o * o, rows[i] * cols[j]) for (i, j), o in cells.items()
    )
    chi_q = (total - 10**6 * n) / 1e6
    # per-cell quantization error <= 0.5e-6 each
    assert abs(chi_q - chi_float) <= len(cells) * 1e-6 + 1e-9


def test_chi2_terms_formula_matches_definition():
    """N(ad-bc)^2/((a+b)(c+d)(a+c)(b+d)) == sum over the 2x2 table of
    (O-E)^2/E."""
    rng = random.Random(47)
    for _ in range(50):
        N, NE = 1000, 400
        ab = rng.randint(1, 999)
        a = rng.randint(max(0, ab - (N - NE)), min(ab, NE))
        b = ab - a
        c, d = NE - a, (N - NE) - b
        table = [(a, NE), (b, N - NE), (c, NE), (d, N - NE)]
        colsums = [ab, ab, N - ab, N - ab]
        chi_def = 0.0
        for (o, rowsum), colsum in zip(table, colsums):
            e = rowsum * colsum / N
            if e > 0:
                chi_def += (o - e) ** 2 / e
        chi_closed = N * (a * d - b * c) ** 2 / (ab * (N - ab) * NE * (N - NE))
        assert math.isclose(chi_def, chi_closed, rel_tol=1e-9)


def test_avg_precision_per_term_quantized_sum_tracks_float_ap():
    rng = random.Random(59)
    cen = [(s, rng.randint(1, 20), 0) for s in range(40)]
    cen = [(s, n, rng.randint(0, n)) for s, n, _ in cen]
    cen.sort(key=lambda r: -r[0])  # thresholds descending
    p = sum(np_ for _, _, np_ in cen)
    tp = tot = 0
    ap_float = 0.0
    total = 0
    for _, n, np_ in cen:
        tp += np_
        tot += n
        ap_float += (np_ / p) * (tp / tot)
        num, den = np_ * tp, p * tot
        total += (2_000_000 * num + den) // (2 * den)
    assert abs(total / 1e6 - ap_float) <= len(cen) * 1e-6


def test_best_f1_e12_is_collision_free_and_maximal():
    rng = random.Random(61)
    cen = [(s, rng.randint(1, 15), 0) for s in range(30)]
    cen = [(s, n, rng.randint(0, n)) for s, n, _ in cen]
    cen.sort(key=lambda r: -r[0])
    p = sum(np_ for _, _, np_ in cen)
    from fractions import Fraction

    tp = fp = 0
    rows = []
    for s, n, np_ in cen:
        tp += np_
        fp += n - np_
        fn = p - tp
        f1 = Fraction(2 * tp, 2 * tp + fp + fn)
        e12 = (2 * 10**12 * f1.numerator * 1 + (f1.denominator)) // (
            2 * f1.denominator
        )
        rows.append((s, f1, e12))
    # collision-freeness: distinct fractions -> distinct e12
    seen = {}
    for s, f1, e12 in rows:
        if e12 in seen:
            assert seen[e12] == f1
        seen[e12] = f1
    best_exact = max(rows, key=lambda r: (r[1], -r[0]))
    best_e12 = max(rows, key=lambda r: (r[2], -r[0]))
    assert best_exact[0] == best_e12[0]


def test_corr_moment_chain_matches_numpy_corrcoef():
    rng = np.random.RandomState(67)
    x = rng.randint(1, 50, 500).astype(np.int64)
    y = (x * 3 + rng.randint(0, 40, 500)).astype(np.int64)
    n = 500
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy, sxy = int((x * x).sum()), int((y * y).sum()), int((x * y).sum())
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    r_chain = float(num) / math.sqrt(float(denx) * float(deny))
    r_np = np.corrcoef(x, y)[0, 1]
    assert math.isclose(r_chain, r_np, rel_tol=1e-12)


def test_runs_test_chain_matches_brute_force():
    rng = random.Random(71)
    c = [rng.randint(1, 11) for _ in range(200)]
    import statistics

    med = statistics.median(c)
    signs = [1 if v > med else 0 for v in c if v != med]
    n1 = sum(signs)
    n2 = len(signs) - n1
    r = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
    nn = n1 + n2
    mu = 2 * n1 * n2 / nn + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - nn) / (nn**2 * (nn - 1))
    z_brute = (r - mu) / math.sqrt(var)
    # the operator's 2-median comparison (2v vs m2) == (v vs median)
    from weakscraper_ray.pipelines.hypotests import _med2

    marg = {}
    for v in c:
        marg[v] = marg.get(v, 0) + 1
    m2 = _med2(marg)
    signs2 = [1 if 2 * v > m2 else 0 for v in c if 2 * v != m2]
    assert signs2 == signs
    nn_f = float(n1 + n2)
    mu_f = 2.0 * float(n1) * float(n2) / nn_f + 1.0
    var_f = (
        2.0 * float(n1) * float(n2)
        * (2.0 * float(n1) * float(n2) - nn_f)
        / (nn_f * nn_f * (nn_f - 1.0))
    )
    z_chain = (float(r) - mu_f) / math.sqrt(var_f)
    assert math.isclose(z_chain, z_brute, rel_tol=1e-12)


def test_perm_entropy_rank_encoding_is_bijective_on_permutations():
    """Every strict-order triple maps to a distinct legal code, ties
    resolve by position (left wins), and entropy of a monotone series
    is zero."""
    from itertools import permutations

    codes = set()
    for p in permutations([10, 20, 30]):
        a, b, c3 = p
        r0 = (b < a) + (c3 < a)
        r1 = (a <= b) + (c3 < b)
        r2 = (a <= c3) + (b <= c3)
        codes.add(r0 * 9 + r1 * 3 + r2)
    assert codes == {5, 7, 11, 15, 19, 21}
    # tie rule: equal values rank by position (earlier = smaller)
    a, b, c3 = 5, 5, 5
    r0 = (b < a) + (c3 < a)
    r1 = (a <= b) + (c3 < b)
    r2 = (a <= c3) + (b <= c3)
    assert (r0, r1, r2) == (0, 1, 2)  # flat triple == ascending
    # monotone series: all windows the same pattern -> H == 0
    n_w = 17
    counts = {5: n_w}
    import numpy as np

    def ln_e6(v):
        return int(np.rint(np.log(float(v)) * 1e6))

    hq = n_w * ln_e6(n_w) - sum(m * ln_e6(m) for m in counts.values())
    assert hq == 0


def test_quantile_map_is_monotone_and_matches_inverse_cdf():
    rng = random.Random(73)
    a = [rng.randint(1, 20) for _ in range(300)]
    b = [rng.randint(5, 40) for _ in range(500)]
    ca, cb = {}, {}
    for v in a:
        ca[v] = ca.get(v, 0) + 1
    for v in b:
        cb[v] = cb.get(v, 0) + 1
    na, nb = len(a), len(b)
    r_vals = sorted(cb)
    r_cum = []
    cum = 0
    for w in r_vals:
        cum += cb[w]
        r_cum.append(cum)
    cum_a = 0
    prev = None
    for v in sorted(ca):
        cum_a += ca[v]
        mapped = next(
            (w for w, cw in zip(r_vals, r_cum) if cw * na >= cum_a * nb),
            r_vals[-1],
        )
        # integer cross-mult == float inverse-CDF at the same quantile
        q = cum_a / na
        float_map = next(
            (w for w, cw in zip(r_vals, r_cum) if cw / nb >= q - 1e-15),
            r_vals[-1],
        )
        assert mapped == float_map
        if prev is not None:
            assert mapped >= prev  # monotone map
        prev = mapped


def test_durbin_watson_integer_chain_matches_float_definition():
    rng = random.Random(79)
    ts = sorted(random.Random(80).sample(range(500), 60))
    cs = [rng.randint(20, 99) for _ in ts]
    n = len(ts)
    # float reference: OLS residuals then DW
    st, stt = sum(ts), sum(t * t for t in ts)
    sc, stc = sum(cs), sum(t * c for t, c in zip(ts, cs))
    d = n * stt - st * st
    b = (n * stc - st * sc) / d
    a = (sc * stt - st * stc) / d
    e = [c - (a + b * t) for t, c in zip(ts, cs)]
    dw_float = sum((x - y) ** 2 for x, y in zip(e[1:], e[:-1])) / sum(
        x * x for x in e
    )
    # integer chain (D-scaled residuals, D cancels)
    b_num = n * stc - st * sc
    a_num = sc * stt - st * stc
    ed = [d * c - (a_num + b_num * t) for t, c in zip(ts, cs)]
    num = sum((x - y) ** 2 for x, y in zip(ed[1:], ed[:-1]))
    den = sum(x * x for x in ed)
    assert math.isclose(num / den, dw_float, rel_tol=1e-12)


def test_cochran_armitage_reduces_to_two_group_proportion_z():
    """With two groups scored 0/1, CA z equals the standard two-sample
    proportion z-test (pooled)."""
    n1, r1 = 400, 120
    n2, r2 = 600, 260
    nt, rt = n1 + n2, r1 + r2
    # CA with scores s in {0, 1}
    a = 0 * (r1 * nt - n1 * rt) + 1 * (r2 * nt - n2 * rt)
    sns = n2
    snss = n2
    b = rt * (nt - rt) * (nt * snss - sns * sns)
    z_ca = a * math.sqrt(nt / b)
    # pooled two-proportion z
    p = rt / nt
    z_prop = (r2 / n2 - r1 / n1) / math.sqrt(
        p * (1 - p) * (1 / n1 + 1 / n2)
    )
    assert math.isclose(z_ca, z_prop, rel_tol=1e-12)


def test_full_outer_merge_covers_all_three_sides():
    import pandas as pd

    c = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30], "src": "c"})
    o = pd.DataFrame({"k": [2, 3, 4, 4], "v": [1, 1, 1, 1], "src": "o"})
    g = pd.concat([c, o])
    from weakscraper_ray.pipelines.dataops import _FOJ_SHARDS  # noqa: F401

    cc = g[g["src"] == "c"][["k", "v"]].rename(columns={"v": "cents"})
    oo = (
        g[g["src"] == "o"].groupby("k", sort=False)["v"].sum()
        .reset_index(name="n")
    )
    m = cc.merge(oo, on="k", how="outer")
    has_c, has_o = m["cents"].notna(), m["n"].notna()
    side = np.where(has_c & has_o, "both", np.where(has_c, "left", "right"))
    out = dict(zip(m["k"], side))
    assert out == {1: "left", 2: "both", 3: "both", 4: "right"}
    assert m.set_index("k")["n"].fillna(0).astype(int).to_dict() == {
        1: 0, 2: 1, 3: 1, 4: 2,
    }



def test_assoc_rule_identities():
    """conf(a->b)·n_a == n_ab·1e6-scaled; lift symmetric; lift ==
    conf(a->b)/support(b)."""
    n_tot, n_a, n_b, n_ab = 1000, 40, 25, 10

    def e6(p, d):
        return (2_000_000 * p + d) // (2 * d)

    conf_ab = e6(n_ab, n_a)
    conf_ba = e6(n_ab, n_b)
    lift = e6(n_tot * n_ab, n_a * n_b)
    assert conf_ab == 250_000 and conf_ba == 400_000
    assert lift == 10_000_000  # 10x independence
    # lift is direction-free: same formula both ways
    assert e6(n_tot * n_ab, n_b * n_a) == lift
    # lift == conf(a->b) / (n_b / n_tot) up to quantization
    assert abs(lift / 1e6 - (n_ab / n_a) / (n_b / n_tot)) < 1e-9


def test_matrix_profile_matches_brute_force_with_exclusion():
    rng = random.Random(97)
    c = np.array([rng.randint(30, 99) for _ in range(60)], dtype=np.int64)
    w = 7
    n_w = len(c) - w + 1
    W = np.lib.stride_tricks.sliding_window_view(c, w).astype(np.int64)
    s2 = np.einsum("ij,ij->i", W, W)
    d2 = s2[:, None] + s2[None, :] - 2 * (W @ W.T)
    idx = np.arange(n_w)
    d2m = np.where(np.abs(idx[:, None] - idx[None, :]) < w,
                   np.iinfo(np.int64).max, d2)
    nn_d, nn_i = d2m.min(axis=1), d2m.argmin(axis=1)
    for i in range(n_w):
        best, bestj = None, None
        for j in range(n_w):
            if abs(i - j) < w:
                continue
            d = int(((W[i] - W[j]) ** 2).sum())
            if best is None or d < best or (d == best and j < bestj):
                best, bestj = d, j
        assert (int(nn_d[i]), int(nn_i[i])) == (best, bestj)


def test_mutual_knn_sentinel_survives_negation():
    """Regression: masking self with int64.min wraps under negation
    (-int64.min == int64.min) and steals a top-k slot, silently
    producing mutual-top-(k-1); the -1e18 sentinel must not."""
    bad = np.array([np.iinfo(np.int64).min], dtype=np.int64)
    with np.errstate(over="ignore"):
        assert (-bad)[0] == bad[0]  # the wraparound that caused the bug
    ok = np.array([-(10**18)], dtype=np.int64)
    assert (-ok)[0] == 10**18 > 0
    # a masked row never enters the top-k under either sort key
    dots = np.array([5, 3, -(10**18), 9], dtype=np.int64)
    thresh = np.partition(dots, len(dots) - 2)[len(dots) - 2]
    cols = np.where(dots >= thresh)[0]
    assert 2 not in cols


def test_mutual_knn_reciprocity_on_synthetic_points():
    rng = np.random.RandomState(101)
    q = rng.randint(-1000, 1000, (30, 8)).astype(np.int64)
    ids = np.arange(30, dtype=np.int64)
    dots = q @ q.T
    np.fill_diagonal(dots, -(10**18))
    k = 3
    topk = []
    for r in range(30):
        thresh = np.partition(dots[r], 30 - k)[30 - k]
        cols = np.where(dots[r] >= thresh)[0]
        order = np.lexsort((ids[cols], -dots[r][cols]))[:k]
        topk.append(set(ids[cols[order]].tolist()))
    # canonical-pair count==2 == textbook reciprocity
    from collections import Counter

    cnt = Counter()
    for r in range(30):
        for nb in topk[r]:
            cnt[(min(r, nb), max(r, nb))] += 1
    via_count = {p for p, c in cnt.items() if c == 2}
    via_def = {
        (a, b)
        for a in range(30)
        for b in range(a + 1, 30)
        if b in topk[a] and a in topk[b]
    }
    assert via_count == via_def


def test_burst_viterbi_matches_exhaustive_path_enumeration():
    """The 2-state DP with pinned ties returns the min-cost path; on
    ties the stay-preferring backtrace is among the minimizers."""
    import itertools

    rng = random.Random(103)
    c = [rng.randint(1, 6) + (8 if 5 <= i < 9 else 0) for i in range(14)]
    n = len(c)
    lam0 = sum(c) / n
    lam1 = 2.0 * lam0
    g = int(math.floor(abs(math.log(float(n))) * 1e6 + 0.5))

    def cost(ct, lam):
        v = (lam - float(ct) * math.log(lam)) * 1e6
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    def path_cost(path):
        tot = 0
        prev = 0
        for t, s in enumerate(path):
            tot += cost(c[t], lam1 if s else lam0)
            if s == 1 and (t == 0 or prev == 0):
                tot += g
            prev = s
        return tot

    best = min(path_cost(p) for p in itertools.product([0, 1], repeat=n))
    # DP replay (q_burst_detect arithmetic)
    d0 = cost(c[0], lam0)
    d1 = cost(c[0], lam1) + g
    p0, p1 = [0], [1]
    for t in range(1, n):
        e0, e1 = cost(c[t], lam0), cost(c[t], lam1)
        nd0, np0 = (d0 + e0, p0 + [0]) if d0 <= d1 else (d1 + e0, p1 + [0])
        nd1, np1 = (
            (d1 + e1, p1 + [1]) if d1 <= d0 + g else (d0 + g + e1, p0 + [1])
        )
        d0, d1, p0, p1 = nd0, nd1, np0, np1
    dp_cost = min(d0, d1)
    dp_path = p0 if d0 <= d1 else p1
    assert dp_cost == best
    assert path_cost(dp_path) == best
    # the planted burst is detected
    assert all(dp_path[i] == 1 for i in range(5, 9))


def test_poisson_factorial_term_cancels_between_states():
    """-ln p(c|λ) = λ - c·lnλ + ln c!: the ln c! term is identical for
    both states, so state choice depends only on λ - c·lnλ."""
    for c in (0, 1, 7, 40):
        lnfact = math.lgamma(c + 1)
        l0, l1 = 3.0, 6.0
        full0 = l0 - c * math.log(l0) + lnfact
        full1 = l1 - c * math.log(l1) + lnfact
        red0 = l0 - c * math.log(l0)
        red1 = l1 - c * math.log(l1)
        assert (full0 < full1) == (red0 < red1) or math.isclose(
            full0, full1
        )


def test_haar_energy_matches_direct_convolution():
    rng = random.Random(107)
    c = np.array([rng.randint(10, 99) for _ in range(37)], dtype=np.int64)
    for k in (1, 2, 3):
        b = 1 << k
        n_b = len(c) // b
        blocks = c[: n_b * b].reshape(n_b, b)
        half = b // 2
        coeff = blocks[:, :half].sum(1) - blocks[:, half:].sum(1)
        # direct: inner product with the +1/-1 Haar pattern per block
        pat = np.concatenate([np.ones(half, np.int64), -np.ones(half, np.int64)])
        direct = np.array(
            [int(blocks[i] @ pat) for i in range(n_b)], dtype=np.int64
        )
        assert (coeff == direct).all()
        assert int((coeff**2).sum()) == sum(int(x) ** 2 for x in direct)


def test_burst_recovers_planted_weeks_and_nothing_degenerate():
    """End-to-end pin: on the boosted series every planted week's day
    is a burst day (sf0.001 census replayed driver-side)."""
    from weakscraper_ray.pipelines.monitor import q_burst_detect  # noqa: F401
    # replay the arithmetic on a synthetic census
    rng = random.Random(109)
    days = list(range(400))
    c = [rng.randint(50, 70) for _ in days]
    base_tot = sum(c)
    boost = (2 * base_tot) // len(c)
    c = [ct + (boost if (d // 7) % 13 == 0 else 0) for d, ct in zip(days, c)]
    n = len(c)
    lam0 = sum(c) / n
    lam1 = 2.0 * lam0
    g = int(math.floor(abs(math.log(float(n))) * 1e6 + 0.5))

    def cost(ct, lam):
        v = (lam - float(ct) * math.log(lam)) * 1e6
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    d0, d1 = cost(c[0], lam0), cost(c[0], lam1) + g
    p0, p1 = [0], [1]
    for t in range(1, n):
        e0, e1 = cost(c[t], lam0), cost(c[t], lam1)
        nd0, np0 = (d0 + e0, p0 + [0]) if d0 <= d1 else (d1 + e0, p1 + [0])
        nd1, np1 = (
            (d1 + e1, p1 + [1]) if d1 <= d0 + g else (d0 + g + e1, p0 + [1])
        )
        d0, d1, p0, p1 = nd0, nd1, np0, np1
    path = p0 if d0 <= d1 else p1
    planted = [(d // 7) % 13 == 0 for d in days]
    hits = sum(s for s, pl in zip(path, planted) if pl)
    assert hits == sum(planted)  # every planted day recovered
    extras = sum(s for s, pl in zip(path, planted) if not pl)
    assert extras <= 0.05 * n  # no runaway false positives


def test_silhouette_quantized_chain_tracks_float_silhouette():
    rng = np.random.RandomState(113)
    q = np.vstack(
        [
            rng.randint(-50, 50, (20, 4)) + np.array([300, 0, 0, 0]),
            rng.randint(-50, 50, (25, 4)) + np.array([0, 300, 0, 0]),
            rng.randint(-50, 50, (15, 4)) + np.array([0, 0, 300, 0]),
        ]
    ).astype(np.int64)
    labels = np.array([0] * 20 + [1] * 25 + [2] * 15)
    s2 = (q**2).sum(1)
    d2 = s2[:, None] + s2[None, :] - 2 * (q @ q.T)
    counts = np.bincount(labels)
    for i in range(len(q)):
        c = labels[i]
        own = (labels == c) & (np.arange(len(q)) != i)
        a_f = d2[i][own].mean()
        b_f = min(
            d2[i][labels == oc].mean() for oc in range(3) if oc != c
        )
        s_float = (b_f - a_f) / max(a_f, b_f)
        # quantized chain (q_silhouette_score arithmetic)
        sa = int(d2[i][own].sum())
        n_own = int(counts[c])
        a_q = (2000 * sa + (n_own - 1)) // (2 * (n_own - 1))
        b_q = min(
            (2000 * int(d2[i][labels == oc].sum()) + int(counts[oc]))
            // (2 * int(counts[oc]))
            for oc in range(3)
            if oc != c
        )
        diff = b_q - a_q
        den = max(a_q, b_q)
        s_q = (
            (2_000_000 * diff + den) // (2 * den)
            if diff >= 0
            else -((2_000_000 * -diff + den) // (2 * den))
        )
        assert abs(s_q / 1e6 - s_float) < 1e-2  # e3 mean-grain bound


def test_medoid_is_brute_force_argmin_with_id_ties():
    rng = np.random.RandomState(127)
    q = rng.randint(-10, 10, (12, 3)).astype(np.int64)
    ids = np.arange(12)
    s2 = (q**2).sum(1)
    d2 = s2[:, None] + s2[None, :] - 2 * (q @ q.T)
    tot = d2.sum(axis=1)
    best = min(zip(tot.tolist(), ids.tolist()))
    # replay the fold rule: (total, vec_id) lexicographic min
    got = None
    for vid, td in zip(ids.tolist(), tot.tolist()):
        if got is None or (td, vid) < got:
            got = (td, vid)
    assert got == best


def test_textrank_numpy_path_equals_dict_reference():
    """The Ray path's numpy index-array iteration equals the twin's
    dict-loop reference on random token streams (incl. repeated and
    self-adjacent tokens)."""
    rng = random.Random(131)

    def dict_rank(toks):
        nodes = sorted(set(toks))
        nbr = {w: set() for w in nodes}
        for a, b in zip(toks, toks[1:]):
            if a != b:
                nbr[a].add(b)
                nbr[b].add(a)
        n = len(nodes)
        mass, tele = 10**12, (15 * 10**12) // (100 * n)
        r = {w: mass // n for w in nodes}
        for _ in range(10):
            r = {
                w: tele
                + sum((85 * r[j]) // (100 * len(nbr[j])) for j in nbr[w])
                for w in nodes
            }
        return sorted(nodes, key=lambda w: (-r[w], w))[:3], r

    def np_rank(toks):
        nodes = sorted(set(toks))
        index = {w: i for i, w in enumerate(nodes)}
        n = len(nodes)
        seq = np.fromiter((index[w] for w in toks), np.int64, len(toks))
        pairs = np.unique(
            np.sort(np.stack([seq[:-1], seq[1:]], axis=1), axis=1), axis=0
        )
        pairs = pairs[pairs[:, 0] != pairs[:, 1]]
        src = np.concatenate([pairs[:, 0], pairs[:, 1]])
        dst = np.concatenate([pairs[:, 1], pairs[:, 0]])
        deg = np.bincount(src, minlength=n).astype(np.int64)
        mass, tele = 10**12, (15 * 10**12) // (100 * n)
        r = np.full(n, mass // n, dtype=np.int64)
        for _ in range(10):
            contrib = (85 * r[src]) // (100 * deg[src])
            nr = np.full(n, tele, dtype=np.int64)
            np.add.at(nr, dst, contrib)
            r = nr
        order = np.lexsort((np.array(nodes), -r))[:3]
        return [nodes[i] for i in order], {
            nodes[i]: int(r[i]) for i in range(n)
        }

    for trial in range(25):
        toks = [
            rng.choice("abcdefgh") for _ in range(rng.randint(2, 60))
        ]
        dt, dr = dict_rank(toks)
        nt, nr = np_rank(toks)
        assert dt == nt, (trial, toks)
        assert dr == nr


def test_textrank_hub_term_wins_on_star_graph():
    toks = []
    for leaf in "bcdefg":
        toks.extend(["a", leaf])
    # star centered on 'a': it must rank first
    nodes = sorted(set(toks))
    n = len(nodes)
    # quick dict replay
    nbr = {w: set() for w in nodes}
    for x, y in zip(toks, toks[1:]):
        if x != y:
            nbr[x].add(y)
            nbr[y].add(x)
    mass, tele = 10**12, (15 * 10**12) // (100 * n)
    r = {w: mass // n for w in nodes}
    for _ in range(10):
        r = {
            w: tele
            + sum((85 * r[j]) // (100 * len(nbr[j])) for j in nbr[w])
            for w in nodes
        }
    assert max(r, key=lambda w: (r[w], w)) == "a"


def test_friedman_doubled_rank_chain_matches_brute_force():
    rng = random.Random(137)
    b, k = 40, 5
    data = [[rng.randint(0, 9) for _ in range(k)] for _ in range(b)]
    # textbook tie-corrected Friedman over mid-ranks
    ranks = []
    for row in data:
        order = sorted(range(k), key=lambda j: row[j])
        rr = [0.0] * k
        i = 0
        while i < k:
            j = i
            while j < k and row[order[j]] == row[order[i]]:
                j += 1
            mid = (i + 1 + j) / 2.0
            for t in range(i, j):
                rr[order[t]] = mid
            i = j
        ranks.append(rr)
    rj = [sum(ranks[i][j] for i in range(b)) for j in range(k)]
    bb = sum((r - b * (k + 1) / 2.0) ** 2 for r in rj)
    cc = sum(r**2 for row in ranks for r in row) - b * k * (k + 1) ** 2 / 4.0
    chi_brute = (k - 1) * bb / cc
    # doubled-rank integer chain
    from weakscraper_ray.pipelines.measures import _rank2

    r_sum = {j: 0 for j in range(k)}
    sq = 0
    for row in data:
        marg = {}
        for v in row:
            marg[v] = marg.get(v, 0) + 1
        r2 = _rank2(marg)
        for j in range(k):
            r_sum[j] += r2[row[j]]
            sq += r2[row[j]] ** 2
    b4 = sum((r_sum[j] - b * (k + 1)) ** 2 for j in range(k))
    c4 = sq - b * k * (k + 1) ** 2
    assert math.isclose((k - 1) * b4 / c4, chi_brute, rel_tol=1e-12)


def test_page_l_statistic_maximal_for_perfectly_ordered_blocks():
    k, b = 5, 10
    # strictly increasing within every block -> L is maximal
    from weakscraper_ray.pipelines.measures import _rank2

    r_sum = {j: 0 for j in range(1, k + 1)}
    for _ in range(b):
        row = {j: j * 10 for j in range(1, k + 1)}
        marg = {}
        for v in row.values():
            marg[v] = marg.get(v, 0) + 1
        r2 = _rank2(marg)
        for j in range(1, k + 1):
            r_sum[j] += r2[row[j]]
    l2 = sum(j * r_sum[j] for j in range(1, k + 1))
    # max of 2L = 2·b·Σ j·j (rank j goes to treatment j)
    assert l2 == 2 * b * sum(j * j for j in range(1, k + 1))
    e2 = b * k * (k + 1) ** 2 // 2
    assert l2 > e2  # strictly above the null mean


def test_tukey_kramer_reduces_to_t_statistic_times_sqrt2():
    """For any pair, q = |mean diff| / sqrt(MSW/2·(1/n1+1/n2)) equals
    √2 × the pooled-MSW two-sample t statistic — the classical
    relation q = t·√2."""
    rng = random.Random(139)
    fs = [rng.choice("ANR") for _ in range(300)]
    xs = [rng.randint(1, 9) + (2 if f == "N" else 0) for f in fs]
    groups = {f: [x for g, x in zip(fs, xs) if g == f] for f in "ANR"}
    n = {f: len(v) for f, v in groups.items()}
    mean = {f: sum(v) / len(v) for f, v in groups.items()}
    ssw = sum(
        sum((x - mean[f]) ** 2 for x in v) for f, v in groups.items()
    )
    msw = ssw / (len(xs) - 3)
    for a, b in (("A", "N"), ("A", "R"), ("N", "R")):
        q = abs(mean[a] - mean[b]) / math.sqrt(
            msw / 2 * (1 / n[a] + 1 / n[b])
        )
        t = abs(mean[a] - mean[b]) / math.sqrt(
            msw * (1 / n[a] + 1 / n[b])
        )
        assert math.isclose(q, t * math.sqrt(2), rel_tol=1e-12)
