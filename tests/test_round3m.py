"""Continuation-#13 late contracts: ssjoin bucket-ownership dedupe
(each qualifying pair emitted by exactly one bucket, union equals
brute force) and the stream-join shard sweep vs the quadratic join."""

import random

import numpy as np
import pandas as pd
import pytest


def _brute_jaccard_pairs(sets, tau_num=4, tau_den=5):
    out = {}
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            inter = len(a & b)
            if (tau_den + tau_num) * inter >= tau_num * (len(a) + len(b)):
                out[(ids[i], ids[j])] = inter
    return out


def test_ssjoin_ownership_union_equals_bruteforce():
    """drive the REAL _bucket_pairs over per-bucket groups built the
    way _index builds them; the union across buckets must equal the
    brute-force J>=0.8 pair set WITH exact intersection counts and
    no duplicates (the ownership rule's whole claim)."""
    from weakscraper_ray.pipelines.ssjoin import _bucket_pairs, _prefix_len

    rng = random.Random(17)
    for trial in range(8):
        uni = list(range(12))
        sets = {}
        for d in range(30):
            k = rng.randint(3, 9)
            sets[d] = frozenset(rng.sample(uni, k))
        # rank = identity (tokens are already integers; df order is
        # irrelevant to correctness, only to candidate pruning)
        buckets: dict[int, list] = {}
        for d, s in sets.items():
            rs = sorted(s)
            p = _prefix_len(len(rs))
            for b in rs[:p]:
                buckets.setdefault(b, []).append((b, d, len(rs), rs))
        got = {}
        for b, rows in buckets.items():
            g = pd.DataFrame(
                rows, columns=["bucket", "doc_id", "size", "toks"]
            )
            res = _bucket_pairs(g)
            for da, db, nc in zip(
                res["doc_a"], res["doc_b"], res["n_common"]
            ):
                key = (int(da), int(db))
                assert key not in got, f"pair {key} emitted twice"
                got[key] = int(nc)
        want = _brute_jaccard_pairs({d: set(s) for d, s in sets.items()})
        assert got == want, (trial, len(got), len(want))


def test_stream_join_sweep_vs_quadratic():
    """the shard sweep (segment-relative packed keys, host/guest
    replication, same-user subtraction) must count exactly the
    quadratic rule: (ts,id) lexicographically earlier, within 60s,
    different users."""
    from weakscraper_ray.pipelines.ranges import (
        _SJ_BAND_US,
        q_stream_join_60s,  # noqa: F401 (import keeps module loaded)
    )
    from weakscraper_ray.pipelines import ranges as R

    rng = random.Random(23)
    n = 400
    us = np.array(
        sorted(rng.randrange(0, 40 * _SJ_BAND_US) for _ in range(n)),
        dtype=np.int64,
    )
    eid = np.arange(n, dtype=np.int64)
    uid = np.array([rng.randrange(6) for _ in range(n)], dtype=np.int64)

    # quadratic reference
    want = 0
    for i in range(n):
        for j in range(n):
            if (us[i], eid[i]) < (us[j], eid[j]) and us[j] <= us[
                i
            ] + _SJ_BAND_US and uid[i] != uid[j]:
                want += 1

    # replicate the host/guest emission and run the real sweep per shard
    bucket = us // _SJ_BAND_US
    rows = []
    for k in range(n):
        rows.append((int(bucket[k]), int(us[k]), int(eid[k]), int(uid[k]), 1))
        rows.append(
            (int(bucket[k]) - 1, int(us[k]), int(eid[k]), int(uid[k]), 0)
        )
    df = pd.DataFrame(
        rows, columns=["seg", "us", "eid", "uid", "is_host"]
    )
    df["shard"] = df["seg"] & 255
    got = 0
    for _, g in df.groupby("shard"):
        out = R._sweep(g.reset_index(drop=True))
        got += int(out["n"].sum())
    assert got == want
