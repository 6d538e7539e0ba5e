"""Round-3 continuation #10 unit tests: BPE helpers, wedge sharding,
CMS hashing, Benford digit extraction, conversation-structure
fingerprint pieces. Query-level driver parity is covered by the
auto-harness in test_relational.py; these pin the helper contracts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from weakscraper_ray.pipelines.monitor import (
    _CMS_P,
    _CMS_W,
    _cms_bucket,
    _lead_digit,
)
from weakscraper_ray.pipelines.tokenizer import encode_word, train_bpe


# ------------------------------------------------------------- BPE

def test_train_bpe_learns_most_frequent_pair_first():
    vocab = [("aab", 10), ("ab", 5), ("zz", 1)]
    merges = train_bpe(vocab, 1)
    # pair counts: (a,a)=10, (a,b)=15, (z,z)=1 → (a,b) wins
    assert merges[0] == ("a", "b")


def test_train_bpe_tie_breaks_lexicographic():
    # (a,b) and (c,d) both occur once → lexicographically smaller wins
    merges = train_bpe([("ab", 1), ("cd", 1)], 1)
    assert merges[0] == ("a", "b")


def test_train_bpe_chains_merges():
    # "abab" × 100: first merge (a,b) → symbol "ab", second ("ab","ab")
    merges = train_bpe([("abab", 100)], 2)
    assert merges == [("a", "b"), ("ab", "ab")]


def test_encode_word_priority_equals_rank_sweep():
    # independent formulations must agree (the oracle-twin argument)
    vocab = [("banana", 7), ("bandana", 3), ("ananas", 5), ("nab", 2)]
    merges = train_bpe(vocab, 8)
    rank = {p: i for i, p in enumerate(merges)}

    def sweep(word: str) -> int:
        syms = list(word)
        for a, b in merges:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    for w in ["banana", "bandana", "ananas", "nab", "ban", "x", "", "aa"]:
        assert encode_word(w, rank) == sweep(w), w


def test_encode_word_no_applicable_merges():
    assert encode_word("xyz", {}) == 3
    assert encode_word("", {}) == 0


# ------------------------------------------------------------- CMS

def test_cms_bucket_matches_sql_arithmetic():
    u = np.array([0, 1, 17, 123456, 999999], dtype=np.int64)
    for r in range(4):
        b = _cms_bucket(u, r)
        assert ((0 <= b) & (b < _CMS_W)).all()
        # direct mirror of the SQL expression
        a_r = 2_654_435_761 + r * 40_503
        b_r = r * 97 + 7
        expect = ((u * a_r + b_r) % _CMS_P) % _CMS_W
        assert (b == expect).all()


def test_cms_estimate_is_one_sided():
    # sketch estimate >= true count, always (CMS guarantee)
    rng = np.random.RandomState(7)
    stream = rng.randint(0, 50, size=5000).astype(np.int64)
    S = np.zeros((4, _CMS_W), dtype=np.int64)
    for r in range(4):
        np.add.at(S[r], _cms_bucket(stream, r), 1)
    uu, true = np.unique(stream, return_counts=True)
    est = np.min(
        np.stack([S[r, _cms_bucket(uu, r)] for r in range(4)]), axis=0
    )
    assert (est >= true).all()


# ------------------------------------------------------------- digits

def test_lead_digit():
    v = np.array([1, 9, 10, 19, 99, 100, 12345, 10**12], dtype=np.int64)
    out = _lead_digit(v)
    assert out.tolist() == [1, 9, 1, 1, 9, 1, 1, 1]


# ------------------------------------------------------------- wedges

def test_sharded_wedges_enumerates_neighbor_pairs(ray_session):
    import ray

    from weakscraper_ray.pipelines.graph import _sharded_wedges

    edges = pa.table(
        {
            "u": pa.array([0, 0, 0, 1, 2], pa.int64()),
            "v": pa.array([5, 7, 9, 5, 9], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(edges)
    out = _sharded_wedges(ds, with_center=True).to_pandas()
    got = sorted(map(tuple, out[["a", "b", "c"]].to_numpy().tolist()))
    assert got == [(0, 5, 7), (0, 5, 9), (0, 7, 9)]

    out2 = _sharded_wedges(ds, with_center=False).to_pandas()
    assert sorted(out2.columns) == ["b", "c"]
    assert len(out2) == 3


# ----------------------------------------------------- attribution

def test_attribution_same_microsecond_click_excluded(ray_session, tmp_path):
    """A click at the purchase's exact timestamp must NOT get credit
    (strictly-before rule), while an earlier one within the window
    must; among equal-time earlier clicks the max event_id wins."""
    import pyarrow.parquet as pq

    from weakscraper_ray.pipelines.analytics import q_attribution

    ts = pa.array(
        [1_000_000, 5_000_000, 5_000_000, 5_000_000, 9_000_000],
        pa.timestamp("us"),
    )
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 7], pa.int64()),
            "event_type": pa.array(
                ["click", "click", "click", "purchase", "purchase"]
            ),
            "value": pa.array([0.0] * 5),
            "ts": ts,
            "props": pa.array(["{}"] * 5),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = q_attribution(str(d)).to_pandas().set_index("purchase_id")
    # purchase 4 at t=5s: clicks 2,3 share t=5s (excluded) → click 1
    assert int(out.loc[4, "click_id"]) == 1
    assert int(out.loc[4, "lag_seconds"]) == 4
    # purchase 5 at t=9s: latest prior clicks are 2,3 at t=5s → max id 3
    assert int(out.loc[5, "click_id"]) == 3


def test_event_dedup_window_boundary(ray_session, tmp_path):
    """Exactly one hour apart counts as a duplicate (<=); one
    microsecond beyond does not; different users never pair."""
    import pyarrow.parquet as pq

    from weakscraper_ray.pipelines.monitor import q_event_dedup

    h = 3_600_000_000
    ts = pa.array([0, h, 2 * h + 1, 0], pa.timestamp("us"))
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "event_type": pa.array(["click"] * 4),
            "value": pa.array([0.0] * 4),
            "ts": ts,
            "props": pa.array(["{}"] * 4),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = q_event_dedup(str(d))
    row = out[out["event_type"] == "click"].iloc[0]
    assert int(row["n_events"]) == 4
    assert int(row["n_dups"]) == 1  # only the exact-1h gap


# ------------------------------------------------------- struct hash

def test_conv_structure_fingerprint_order_sensitive():
    # the positional weight (turn_idx+1) must distinguish reordered flows
    import hashlib

    from weakscraper_ray.pipelines.curation import _STRUCT_M

    def fp(seq):
        acc = 0
        for t, key in enumerate(seq):
            h = (
                int.from_bytes(hashlib.md5(key.encode()).digest()[8:], "little")
                % _STRUCT_M
            )
            acc = (acc + (t + 1) * h) % _STRUCT_M
        return acc

    a = fp(["user|0", "assistant|1", "tool|2"])
    b = fp(["assistant|1", "user|0", "tool|2"])
    assert a != b
    assert fp(["user|0", "assistant|1", "tool|2"]) == a
