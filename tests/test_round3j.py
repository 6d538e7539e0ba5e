"""Round-3 continuation #11 unit tests: HITS (mass conservation,
hub/authority distinctness) and the exact 2-segment changepoint
(crafted step recovery)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DAY = 86_400_000_000


def test_hits_mass_and_distinctness(ray_session):
    import weakscraper_ray.pipelines.graph as G

    out = G.QUERIES["hits"]("/root/testdata/sf0.001")
    n = len(out)
    # L1 mass after a truncating normalization: MASS − n < Σ ≤ MASS
    for col in ("hub_e6", "auth_e6"):
        s = int(out[col].sum())
        assert G._HITS_MASS - n < s <= G._HITS_MASS, (col, s)
        assert (out[col] >= 0).all()
    # hubs and authorities are different score vectors (the modular
    # graph is not symmetric), and neither is the uniform start
    assert not (out["hub_e6"] == out["auth_e6"]).all()
    assert out["hub_e6"].nunique() > 1
    assert out["auth_e6"].nunique() > 1


def test_hits_inverse_edges_match_forward():
    """The hub step enumerates in-neighbours via the modular inverse —
    verify (v − j)·K⁻¹ mod n really inverts u → (u·K + j) mod n."""
    import weakscraper_ray.pipelines.graph as G

    for n in (7, 500, 4999, 5000):
        kinv = pow(G._PR_KNUTH, -1, n)
        u = np.arange(n, dtype=np.int64)
        for j in range(1, G._PR_OUTDEG + 1):
            v = (u * G._PR_KNUTH + j) % n
            back = ((v - j) * kinv) % n
            assert (back == u).all(), (n, j)


@pytest.fixture(scope="module")
def step_dir(tmp_path_factory):
    """Days 1–4 at $1.00, days 5–8 at $9.00 (three events each) — the
    optimal 2-mean split is exactly after day 4 with SSE 0."""
    d = tmp_path_factory.mktemp("step_events")
    rows = []
    eid = 0
    for day in range(1, 9):
        val = 1.00 if day <= 4 else 9.00
        for _ in range(3):
            rows.append((eid, day * DAY + eid, eid % 5, "A", val, "{}"))
            eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_best_split_recovers_step(step_dir, ray_session):
    import weakscraper_ray.pipelines.monitor as M

    out = M.QUERIES["best_split"](step_dir).iloc[0]
    assert out["split_day"] == 4
    assert out["n_left"] == 12 and out["n_right"] == 12
    assert out["sse_e6"] == 0
    assert out["mean_left_e6"] == 100_000_000  # $1.00 → 100c → e6
    assert out["mean_right_e6"] == 900_000_000
