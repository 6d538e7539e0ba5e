"""Round-3 continuation #12 unit tests: retrieval / LM-curation family
(rrf_fusion weight identities, stupid_backoff hand-computed held-out
scores + backoff firing, skipgram_pairs window enumeration)."""

import math

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
