"""Round-3 additions: pairs→clusters dedup, embedding stage,
sample_events determinism, LSH shuffle slimming."""

import numpy as np
import pyarrow as pa
import pytest


# ------------------------------------------------- pairs -> clusters

def _labels_via_ray(pairs, ray_session):
    import ray.data

    from weakscraper_ray.functions.dedup import cluster_pairs

    t = pa.table(
        {
            "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
            "doc_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    out = cluster_pairs(ray.data.from_arrow(t)).to_pandas()
    assert set(out.columns) == {"doc_id", "cluster_id", "is_keeper"}
    return {
        int(r.doc_id): (int(r.cluster_id), int(r.is_keeper))
        for r in out.itertuples()
    }


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2)],
        [(1, 2), (2, 3), (3, 4)],                      # chain
        [(5, 6), (5, 7), (5, 8)],                      # star
        [(1, 2), (3, 4), (10, 11), (2, 1)],            # two comps + dup pair
        [(i, i + 1) for i in range(30)],               # long path: >1 round
        [(100, 3), (50, 3), (2, 100)],                 # min arrives transitively
    ],
)
def test_cluster_pairs_matches_union_find(pairs, ray_session):
    from weakscraper_ray.functions.dedup import union_find_labels

    want = union_find_labels(pairs)
    got = _labels_via_ray(pairs, ray_session)
    assert set(got) == set(want)
    for node, label in want.items():
        assert got[node] == (label, int(node == label)), node


def test_union_find_labels_basic():
    from weakscraper_ray.functions.dedup import union_find_labels

    lab = union_find_labels([(4, 2), (2, 9), (7, 8)])
    assert lab == {4: 2, 2: 2, 9: 2, 7: 7, 8: 7}
