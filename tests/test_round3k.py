"""Round-3 continuation #12 unit tests: retrieval / LM-curation family
(rrf_fusion weight identities, stupid_backoff hand-computed held-out
scores + backoff firing, skipgram_pairs window enumeration), plus the
governance/placement batch (dp_counts mechanism invariants,
holt_linear fixed points, rendezvous_assign determinism + coverage)."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    """Tiny crafted corpus. Even doc_ids = the Stupid-Backoff train
    slice; doc 1 contains a bigram ("b x") unseen in training so the
    backoff branch must fire; doc 3 is the 4-token skipgram probe."""
    d = tmp_path_factory.mktemp("sb_docs")
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["a b a b c", "a b x", "a c", "p q r s"], pa.string()
            ),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_stupid_backoff_hand_computed(docs_dir, ray_session):
    import weakscraper_ray.pipelines.retrieval as R

    out = (
        R.QUERIES["stupid_backoff"](docs_dir)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # train slice (docs 0, 2): unigrams a:3 b:2 c:2 → N=7, V=3;
    # bigrams "a b":2 "b a":1 "b c":1 "a c":1
    def e6(x):
        return math.floor(abs(x) * 1e6 + 0.5) * (1 if x >= 0 else -1)

    # doc 0 "a b a b c": hits ln(2/3), ln(1/2), ln(2/3), ln(1/2)
    assert out.loc[0, "n_bigrams"] == 4
    assert out.loc[0, "n_backoff"] == 0
    assert out.loc[0, "sb_e6"] == 2 * e6(math.log(2 / 3)) + 2 * e6(
        math.log(1 / 2)
    )
    # doc 1 "a b x": hit ln(2/3); "b x" unseen → backoff with c(x)=0:
    # ln(0.4 * (0+1) / (7+3))
    assert out.loc[1, "n_bigrams"] == 2
    assert out.loc[1, "n_backoff"] == 1
    assert out.loc[1, "sb_e6"] == e6(math.log(2 / 3)) + e6(
        math.log(0.4 * 1.0 / 10.0)
    )
    # doc 3 "p q r s": every bigram backs off with unseen unigrams
    assert out.loc[3, "n_backoff"] == 3
    assert out.loc[3, "sb_e6"] == 3 * e6(math.log(0.4 * 1.0 / 10.0))


def test_skipgram_window_enumeration(docs_dir, ray_session):
    import weakscraper_ray.pipelines.retrieval as R

    out = R.QUERIES["skipgram_pairs"](docs_dir).to_pandas()
    pairs = {
        (r.center, r.context): r.n for r in out.itertuples(index=False)
    }
    # doc 3 "p q r s": distance-3 pair appears in BOTH directions
    assert pairs[("p", "s")] == 1 and pairs[("s", "p")] == 1
    # symmetric window → symmetric counts for every pair
    for (c, x), n in pairs.items():
        assert pairs.get((x, c)) == n, (c, x)
    # (a, b) windowed pairs — doc0 a@1,b@2,a@3,b@4,c@5:
    # a@1→b@2 (d=1), a@1→b@4 (d=3), a@3→b@2 (d=−1), a@3→b@4 (d=1);
    # doc1 a@1→b@2. Total 5.
    assert pairs[("a", "b")] == 5


def test_rrf_fusion_weight_identities(ray_session):
    import weakscraper_ray.pipelines.retrieval as R

    out = R.QUERIES["rrf_fusion"]("/root/testdata/sf0.001")
    assert set(out["n_lists"].unique()) <= {1, 2}
    # every weight is a sum of n_lists terms, each 10^9 // (60 + r)
    # with 1 <= r <= K: bounds follow
    wmax1 = 1_000_000_000 // (R._RRF_C + 1)
    wmin1 = 1_000_000_000 // (R._RRF_C + R._RRF_K)
    one = out[out["n_lists"] == 1]
    two = out[out["n_lists"] == 2]
    assert (one["rrf_e9"] >= wmin1).all() and (one["rrf_e9"] <= wmax1).all()
    assert (two["rrf_e9"] >= 2 * wmin1).all() and (
        two["rrf_e9"] <= 2 * wmax1
    ).all()
    # the semantic list contains the query vector itself at rank 1
    assert (out["doc_id"] == R._RRF_QID).any()
    qrow = out[out["doc_id"] == R._RRF_QID].iloc[0]
    assert qrow["rrf_e9"] >= wmax1  # rank-1 term present


def test_dp_magnitude_thresholds_match_cdf():
    """T_k = GRID − 2^(21−k) really is the exact integer CDF of the
    two-sided geometric magnitude with p = 1/2: P(M ≤ k) = 1 −
    (2/3)·2^−k, and searchsorted(right) == the SQL CASE scan."""
    import weakscraper_ray.pipelines.audit as A

    from fractions import Fraction

    for k, t in enumerate(A._DP_T):
        cdf = 1 - Fraction(2, 3) * Fraction(1, 2**k)
        assert t == int(cdf * A._DP_GRID)  # exact: denominator divides
    thr = np.asarray(A._DP_T, dtype=np.int64)
    g = np.arange(0, A._DP_GRID, 9973, dtype=np.int64)
    fast = np.searchsorted(thr, g, side="right")
    slow = np.array([sum(1 for t in A._DP_T if t <= gi) for gi in g])
    assert (fast == slow).all()


def test_dp_counts_release_identity(ray_session):
    import weakscraper_ray.pipelines.audit as A

    out = A.QUERIES["dp_counts"]("/root/testdata/sf0.001")
    assert (out["n_released"] == out["n_true"] + out["noise"]).all()
    assert (out["noise"].abs() <= 21).all()
    again = A.QUERIES["dp_counts"]("/root/testdata/sf0.001")
    assert out.equals(again)  # hash noise, not RNG noise


def test_holt_constant_series_is_fixed_point(tmp_path, ray_session):
    import weakscraper_ray.pipelines.audit as A

    DAY = 86_400_000_000
    t = pa.table(
        {
            "ts": pa.array([d * DAY for d in range(1, 7)],
                           pa.timestamp("us")),
            "value": pa.array([5.0] * 6, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = A.QUERIES["holt_linear"](str(tmp_path))
    assert (out["level"] == 500).all()  # $5.00 = 500 cents, every day
    assert (out["trend"] == 0).all()


def test_holt_tracks_upward_step(tmp_path_factory, ray_session):
    """After a level step the trend goes positive, then decays back
    toward zero once the level catches up."""
    import weakscraper_ray.pipelines.audit as A

    d = tmp_path_factory.mktemp("holt_step")
    DAY = 86_400_000_000
    vals = [1.0] * 4 + [9.0] * 8
    t = pa.table(
        {
            "ts": pa.array([(i + 1) * DAY for i in range(len(vals))],
                           pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    out = A.QUERIES["holt_linear"](str(d)).set_index("day")
    assert out.loc[5, "trend"] > 0  # step day: trend turns positive
    assert out["level"].iloc[-1] > out["level"].iloc[3]
    assert abs(out["trend"].iloc[-1]) < out.loc[5, "trend"]


def test_rendezvous_assignment_hand_check(ray_session):
    """Recompute one user's argmax from the module constants and check
    the per-node totals cover the whole table."""
    import weakscraper_ray.pipelines.dataops as D

    out = D.QUERIES["rendezvous_assign"]("/root/testdata/sf0.001").to_pandas()
    assert out["node"].between(0, D._HRW_NODES - 1).all()
    assert out["node"].is_unique
    import pyarrow.parquet as _pq

    ev = _pq.read_table("/root/testdata/sf0.001/events.parquet",
                        columns=["user_id"])
    assert int(out["n_events"].sum()) == len(ev)
    # hand-recompute the double-affine argmax for the first user
    u = int(ev.column("user_id")[0].as_py()) % D._HRW_P
    ws = []
    for nd in range(D._HRW_NODES):
        a = (D._HRW_A0 + nd * D._HRW_AS) % D._HRW_P
        b = D._HRW_B0 + nd * D._HRW_BS
        ws.append(((u * a + b) % D._HRW_P * a + b) % D._HRW_P)
    expect = int(np.argmax(ws))
    assert expect in set(out["node"])  # that node received load
