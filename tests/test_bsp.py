"""Contracts of the BSP substrate (weakscraper_ray/state/bsp.py):
message routing, fold delivery, and the partition-count-independence
guarantee the ported graph operators rely on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from weakscraper_ray.state.bsp import BSPGraph, bucket

SF = "/root/testdata/sf0.001"


def test_bucket_ownership_partition():
    dest = np.array([0, 1, 2, 3, 4, 5, 10, 11], dtype=np.int64)
    pay = {"v": dest * 10}
    out = bucket(dest, 4, pay)
    assert len(out) == 4
    seen = []
    for p, entry in enumerate(out):
        assert entry is not None
        d, pl = entry
        assert (d % 4 == p).all()  # ownership contract
        assert (pl["v"] == d * 10).all()  # payload stays aligned
        seen.extend(d.tolist())
    assert sorted(seen) == sorted(dest.tolist())


def test_bucket_empty_partitions_are_none():
    out = bucket(np.array([0, 4], dtype=np.int64), 4, {})
    assert out[0] is not None and out[1] is None and out[2] is None


@pytest.mark.usefixtures("ray_session")
def test_exchange_routes_and_folds():
    def _init(s, pid, P):
        s["got"] = None

    def _scatter(s, pid, P):
        # every partition sends its pid to every partition (incl. self)
        dest = np.arange(P, dtype=np.int64)
        return bucket(dest, P, {"src": np.full(P, pid, dtype=np.int64)})

    def _fold(s, pid, P, payloads):
        srcs = np.concatenate([pl["src"] for _, pl in payloads])
        return (pid, sorted(srcs.tolist()))

    with BSPGraph(4) as g:
        g.run(_init)
        res = g.exchange(_scatter, _fold)
    for pid, srcs in res:
        assert srcs == [0, 1, 2, 3]  # every sender reached every owner


@pytest.mark.usefixtures("ray_session")
def test_partition_count_independence_mis():
    """The ported algorithms' correctness rests on order-independent
    folds: the result must not depend on P.  mis_luby is the probe
    (md5 priorities + Min folds)."""
    import weakscraper_ray.state.bsp as bsp
    from weakscraper_ray.pipelines.rounds import q_mis_luby

    def run_with(P):
        orig = bsp.BSPGraph.__init__

        def patched(self, n_parts=P):
            orig(self, n_parts)

        bsp.BSPGraph.__init__ = patched
        try:
            df = q_mis_luby(SF).to_pandas()
        finally:
            bsp.BSPGraph.__init__ = orig
        return df.sort_values(["node"]).reset_index(drop=True)

    a = run_with(3)
    b = run_with(8)
    pd.testing.assert_frame_equal(a, b)
