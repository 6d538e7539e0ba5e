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


# ------------------------------------------- kcore / MST contracts

def _peel(adj):
    """Reference peel (the twin's rule) over an adjacency dict."""
    alive = {u: set(ns) for u, ns in adj.items()}
    core, k = {}, 1
    while alive:
        dying = [u for u, ns in alive.items() if len(ns) < k]
        if not dying:
            k += 1
            continue
        for u in dying:
            core[u] = k - 1
            for w in alive.pop(u):
                if w in alive:
                    alive[w].discard(u)
    return core


def test_kcore_star_center_dies_with_leaves():
    # star K1,5: every node core 1 (center's degree collapses to 0
    # mid-peel at k=2 and must still be caught)
    adj = {0: {1, 2, 3, 4, 5}}
    for i in range(1, 6):
        adj[i] = {0}
    assert _peel(adj) == {i: 1 for i in range(6)}


def test_kcore_clique_plus_tail():
    # K4 with a pendant path: clique nodes core 3, path nodes core 1
    adj = {i: {j for j in range(4) if j != i} for i in range(4)}
    adj[3] = adj[3] | {4}
    adj[4] = {3, 5}
    adj[5] = {4}
    core = _peel(adj)
    assert core[0] == core[1] == core[2] == core[3] == 3
    assert core[4] == core[5] == 1


def test_mst_packed_key_orders_by_weight_then_endpoints():
    from weakscraper_ray.pipelines.graph import _MST_ID_BITS

    def pack(w, u, v):
        return (w << (2 * _MST_ID_BITS)) | (u << _MST_ID_BITS) | v

    assert pack(2, 0, 1) > pack(1, 9, 9)          # weight dominates
    assert pack(1, 0, 2) < pack(1, 1, 0)          # then u
    assert pack(1, 0, 1) < pack(1, 0, 2)          # then v


def test_boruvka_equals_kruskal_on_random_graphs():
    from weakscraper_ray.pipelines.graph import _edge_weight

    rng = np.random.default_rng(11)
    for _ in range(10):
        n = int(rng.integers(4, 16))
        # random undirected simple graph
        es = set()
        for _ in range(int(rng.integers(n, 3 * n))):
            a, b = int(rng.integers(n)), int(rng.integers(n))
            if a != b:
                es.add((min(a, b), max(a, b)))
        uu = np.array([a for a, _ in sorted(es)], dtype=np.int64)
        vv = np.array([b for _, b in sorted(es)], dtype=np.int64)
        w = _edge_weight(uu, vv)

        def kruskal():
            parent = list(range(n))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            out = []
            for i in sorted(range(len(uu)), key=lambda i: (int(w[i]), int(uu[i]), int(vv[i]))):
                a, b = find(int(uu[i])), find(int(vv[i]))
                if a != b:
                    parent[max(a, b)] = min(a, b)
                    out.append((int(uu[i]), int(vv[i]), int(w[i])))
            return sorted(out)

        def boruvka():
            parent = np.arange(n)

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = int(parent[x])
                return x

            key = (w.astype(object) * (1 << 42)) + (uu.astype(object) << 21) + vv
            out = []
            for _ in range(32):
                comp_u = np.array([find(int(x)) for x in uu])
                comp_v = np.array([find(int(x)) for x in vv])
                inter = comp_u != comp_v
                if not inter.any():
                    break
                best = {}
                for i in np.flatnonzero(inter):
                    for c in (comp_u[i], comp_v[i]):
                        if c not in best or key[i] < best[c]:
                            best[c] = key[i]
                for kk in sorted(best.values()):
                    i = int(np.flatnonzero(key == kk)[0])
                    a, b = find(int(uu[i])), find(int(vv[i]))
                    if a != b:
                        parent[max(a, b)] = min(a, b)
                        out.append((int(uu[i]), int(vv[i]), int(w[i])))
            return sorted(out)

        assert kruskal() == boruvka()


# ------------------------------------------- embedding_rp / label kNN

def test_rp_sign_matrix_matches_sql_hash():
    import duckdb

    from weakscraper_ray.pipelines.embedding_ops import (
        _RP_A,
        _RP_B,
        _RP_C,
        _RP_K,
        _RP_P,
        _rp_signs,
    )

    signs = _rp_signs()
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT i.i, j.j, CASE WHEN ((i.i * {_RP_A} + j.j * {_RP_B} + {_RP_C})"
        f" % {_RP_P}) % 2 = 0 THEN 1 ELSE -1 END"
        f" FROM range(0, 64) i(i), range(0, {_RP_K}) j(j)"
    ).fetchall()
    for i, j, s in rows:
        assert signs[i, j] == s
    # both signs actually occur (a degenerate all-+1 matrix would be a
    # projection onto the all-ones direction 16 times)
    assert (signs == 1).any() and (signs == -1).any()


def test_drop_self_topk_equals_exclude_self_topk():
    # the k+1-then-drop-self rule must equal exclude-self top-k under
    # the (score desc, id asc) rank — including when duplicates tie at
    # score 1.0 with ids lower than self (self pushed out of the k+1)
    rng = np.random.default_rng(3)
    k = 3
    for _ in range(50):
        n = int(rng.integers(4, 10))
        scores = np.round(rng.random((n, n)) * 4, 1)
        scores = (scores + scores.T) / 2
        np.fill_diagonal(scores, 1.0)
        # force duplicate groups: some rows identical → mutual score 1.0
        if n >= 6:
            scores[1] = scores[0]
            scores[:, 1] = scores[:, 0]
            scores[0, 1] = scores[1, 0] = 1.0
            np.fill_diagonal(scores, 1.0)
        for q in range(n):
            order = sorted(range(n), key=lambda v: (-scores[q, v], v))
            exclude_self = [v for v in order if v != q][:k]
            top_k1 = order[: k + 1]
            dropped = [v for v in top_k1 if v != q][:k]
            assert dropped == exclude_self, (q, order)


# ------------------------------------------- prefix-filter theorem

def test_prefix_filter_candidate_generation_is_lossless():
    """Brute force vs the prefix rule on random small universes: every
    pair with J >= 4/5 must share a token within both prefixes of
    length |x| - ceil(4|x|/5) + 1 under the (df, token) global order
    (the exact rule q_ssjoin_prefix indexes with)."""
    from weakscraper_ray.pipelines.ssjoin import _prefix_len

    rng = np.random.default_rng(5)
    for trial in range(200):
        vocab = int(rng.integers(6, 20))
        nsets = int(rng.integers(3, 10))
        sets = []
        for _ in range(nsets):
            k = int(rng.integers(1, vocab + 1))
            sets.append(frozenset(rng.choice(vocab, k, replace=False).tolist()))
        # global order: document frequency ascending, then token
        df = {t: sum(t in s for s in sets) for t in range(vocab)}
        order = sorted(range(vocab), key=lambda t: (df[t], t))
        rank = {t: i for i, t in enumerate(order)}
        pref = [
            set(sorted((rank[t] for t in s))[: _prefix_len(len(s))])
            for s in sets
        ]
        for i in range(nsets):
            for j in range(i + 1, nsets):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                if union and 5 * inter >= 4 * union:  # J >= 0.8
                    assert pref[i] & pref[j], (
                        trial, sorted(sets[i]), sorted(sets[j])
                    )


def test_prefix_len_boundaries():
    from weakscraper_ray.pipelines.ssjoin import _prefix_len

    # |x|=5: ceil(4) = 4 → prefix 2; |x|=1: ceil(0.8)=1 → prefix 1
    assert _prefix_len(5) == 2
    assert _prefix_len(1) == 1
    assert _prefix_len(10) == 3
    for n in range(1, 200):
        p = _prefix_len(n)
        assert 1 <= p <= n
