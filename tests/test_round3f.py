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
