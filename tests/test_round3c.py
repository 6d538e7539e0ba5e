"""Round-3 continuation #7 unit tests: pure helpers of the clustering /
OLAP / skyline operators (no Ray session needed — the integration and
oracle-exactness paths are covered by the driver-mimic harness in
test_relational.py)."""

import numpy as np
import pandas as pd

from weakscraper_ray.pipelines.analytics import _pareto_2d
from weakscraper_ray.pipelines.clustering import _assign, quantize_e6


# ------------------------------------------------------------- pareto

def _front(rows):
    df = pd.DataFrame(rows, columns=["o_orderkey", "cents", "d"]).astype(
        {"o_orderkey": np.int64, "cents": np.int64, "d": np.int64}
    )
    out = _pareto_2d(df)
    return sorted(out["o_orderkey"].tolist())


def test_pareto_dominated_point_dropped():
    # (2) dominated by (1): strictly worse on both axes
    assert _front([(1, 10, 10), (2, 5, 5)]) == [1]


def test_pareto_incomparable_points_both_survive():
    assert _front([(1, 10, 1), (2, 1, 10)]) == [1, 2]


def test_pareto_exact_duplicates_coexist():
    # equal on both axes: neither strictly dominates
    assert _front([(1, 7, 7), (2, 7, 7)]) == [1, 2]


def test_pareto_tie_one_axis_strict_other_dominates():
    # same cents, (1) has larger d -> (2) dominated within the group
    assert _front([(1, 7, 9), (2, 7, 8)]) == [1]
    # same d, (1) richer -> (2) dominated by the strictly-richer group
    assert _front([(1, 9, 7), (2, 8, 7)]) == [1]


def test_pareto_chain_only_endpoint_of_maxima_survives():
    # staircase: all incomparable -> all survive
    rows = [(i, 10 - i, i) for i in range(5)]
    assert _front(rows) == [0, 1, 2, 3, 4]
    # add one point dominating the middle of the staircase
    rows.append((99, 8, 3))  # dominates (8-i? no): beats (2: cents 8,d 2) and (3: cents 7,d 3)
    assert 99 in _front(rows)
    assert 2 not in _front(rows) and 3 not in _front(rows)


def test_pareto_empty_frame():
    df = pd.DataFrame({"o_orderkey": [], "cents": [], "d": []}).astype(np.int64)
    assert len(_pareto_2d(df)) == 0


# ------------------------------------------------------------- kmeans

def test_kmeans_assign_tie_breaks_to_lowest_cluster_id():
    X = np.array([[5, 5]], dtype=np.int64)
    C = np.array([[5, 5], [5, 5], [0, 0]], dtype=np.int64)  # 0 and 1 tie
    assert _assign(X, C).tolist() == [0]


def test_kmeans_assign_matches_direct_distance():
    rng = np.random.RandomState(7)
    X = quantize_e6(rng.randn(50, 8))
    C = quantize_e6(rng.randn(4, 8))
    got = _assign(X, C)
    # independent direct computation
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assert (got == d.argmin(axis=1)).all()


def test_quantize_e6_integer_grid():
    q = quantize_e6(np.array([[0.1234567, -0.9999996]], dtype=np.float32))
    assert q.dtype == np.int64
    # rint of float64-upcast values at e6 grain
    assert abs(q[0, 0] - 123457) <= 1 and abs(q[0, 1] + 1000000) <= 1


# ------------------------------------------------------------- loader

def test_loader_deterministic_epochs_and_geometry(ray_session):
    import ray.data

    from weakscraper_ray.loader import iter_training_batches

    ds = ray.data.range(1000)  # column "id"

    def collect(epoch):
        out = []
        for b in iter_training_batches(
            ds, batch_size=256, seed=7, epoch=epoch, drop_last=True
        ):
            assert b.num_rows == 256  # fixed geometry, ragged tail dropped
            out.extend(b.column("id").to_pylist())
        return out

    e0a, e0b, e1 = collect(0), collect(0), collect(1)
    assert e0a == e0b                      # same (seed, epoch) -> same order
    assert e0a != e1                       # distinct epochs reshuffle
    assert len(e0a) == 768                 # 1000 -> 3 full batches of 256
    assert set(e1) <= set(range(1000))
