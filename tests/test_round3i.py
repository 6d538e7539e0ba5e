"""Round-3 continuation #11 unit tests: the statistical-inference
family (inference.py) — Poisson-threshold contract, exact-zero MI
under independence, hand-computed Kaplan–Meier, and the shift /
identity properties of the exact 1-D Wasserstein."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import weakscraper_ray.pipelines.inference as I

DAY = 86_400_000_000


def _vh(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


# --------------------------------------------- bootstrap weight law


def test_poisson_thresholds_monotone_and_calibrated():
    T = np.array(I._BOOT_T, dtype=np.int64)
    assert (np.diff(T) > 0).all() and T[-1] <= I._BOOT_GRID
    # exact expected weight over the uniform grid ≈ 1 (Poisson mean)
    widths = np.diff(np.concatenate([[0], T, [I._BOOT_GRID]]))
    ks = np.arange(len(widths))
    mean = float((ks * widths).sum()) / I._BOOT_GRID
    assert abs(mean - 1.0) < 2e-3
    # boundary semantics identical to the SQL CASE: h < T_k → k
    probes = np.array([0, T[0] - 1, T[0], T[1] - 1, T[1], T[-1] - 1, T[-1]])
    w = np.searchsorted(T, probes, side="right")
    assert list(w) == [0, 0, 1, 1, 2, 9, 10]


def test_bootstrap_ci_brackets_mean(ray_session):
    out = I.QUERIES["bootstrap_ci"]("/root/testdata/sf0.001")
    row = out.iloc[0]
    assert row["lo_e6"] <= row["mean_e6"] <= row["hi_e6"]
    assert row["n"] == 1000


# --------------------------------------------- MI exact zero


@pytest.fixture(scope="module")
def indep_dir(tmp_path_factory):
    """2 types × 2 bands with counts exactly proportional — MI terms
    are ln(1) = 0 EXACTLY, so mi_e9 must be 0, not merely small."""
    d = tmp_path_factory.mktemp("indep_events")
    rows = []
    eid = 0
    # joint counts: (A,0):2 (A,1):4 (B,0):1 (B,1):2 → nxy·N == nx·ny
    for et, band, cnt in [("A", 0, 2), ("A", 1, 4), ("B", 0, 1), ("B", 1, 2)]:
        for _ in range(cnt):
            rows.append((eid, DAY + eid, eid % 7, et, band * 10.0 + 1.0, "{}"))
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


def test_mutual_info_zero_under_independence(indep_dir, ray_session):
    out = I.QUERIES["mutual_info"](indep_dir)
    row = out.iloc[0]
    assert row["mi_e9"] == 0
    assert row["n"] == 9
    assert row["hx_e9"] > 0 and row["hy_e9"] > 0


# --------------------------------------------- KM hand-computed


@pytest.fixture(scope="module")
def km_dir(tmp_path_factory):
    """Streams (user, type) with last days: day1 ×2 deaths, day2 ×1
    death, day5/day6 censored (max day 6, cutoff 4). Risk sets:
    day1 n=5 d=2 → S=0.6; day2 n=3 d=1 → S=0.4."""
    d = tmp_path_factory.mktemp("km_events")
    rows = [
        (0, 1 * DAY, 1, "A", 1.0, "{}"),
        (1, 1 * DAY, 2, "A", 1.0, "{}"),
        (2, 2 * DAY, 3, "A", 1.0, "{}"),
        (3, 5 * DAY, 4, "A", 1.0, "{}"),
        (4, 6 * DAY, 5, "A", 1.0, "{}"),
    ]
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


def test_survival_km_hand_computed(km_dir, ray_session):
    out = (
        I.QUERIES["survival_km"](km_dir).sort_values("day").reset_index(drop=True)
    )
    assert list(out["day"]) == [1, 2]
    assert list(out["n_risk"]) == [5, 3]
    assert list(out["n_death"]) == [2, 1]
    # S(1) = 3/5, S(2) = 3/5 · 2/3 = 2/5 (e9-quantized ln path)
    assert abs(out.loc[0, "surv_e6"] - 600000) <= 1
    assert abs(out.loc[1, "surv_e6"] - 400000) <= 1
    # and the SQL twin agrees exactly
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{km_dir}/events.parquet')"
    )
    sdf = con.execute(I.ORACLE_SQL["survival_km"]).fetchdf()
    assert _vh(out) == _vh(sdf)


# --------------------------------------------- EMD properties


@pytest.fixture(scope="module")
def emd_dir(tmp_path_factory):
    """First half: one event at $1.00; second half: one at $3.00 —
    unit mass moved 200 cents, so W₁ = 200 cents exactly."""
    d = tmp_path_factory.mktemp("emd_events")
    rows = [
        (0, 1 * DAY, 1, "A", 1.00, "{}"),
        (1, 9 * DAY, 2, "A", 3.00, "{}"),
    ]
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


def test_emd_unit_shift(emd_dir, ray_session):
    out = I.QUERIES["emd_drift"](emd_dir).iloc[0]
    assert out["na"] == 1 and out["nb"] == 1
    assert out["emd_scaled"] == 200
    assert out["emd_e6"] == 200_000_000


def test_emd_identical_halves_zero(tmp_path, ray_session):
    rows = [
        (0, 1 * DAY, 1, "A", 2.50, "{}"),
        (1, 9 * DAY, 2, "A", 2.50, "{}"),
    ]
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
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = I.QUERIES["emd_drift"](str(tmp_path)).iloc[0]
    assert out["emd_scaled"] == 0 and out["emd_e6"] == 0


# --------------------------------------------- isotonic regression


def _pav_fit(s, c):
    import weakscraper_ray.pipelines.fitting as F

    blocks = []
    for si, ci in zip(s, c):
        blocks.append([int(si), int(ci), 1])
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
            blocks[-1][2] += b[2]
    out = []
    for bs, bc, bn in blocks:
        out.extend([F._away(1_000_000.0 * (bs / bc))] * bn)
    return out


def test_pav_equals_minimax_bruteforce_random():
    """PAV (the engine path) vs the minimax identity (the oracle path)
    on random integer series — the theorem the isotonic_daily pair
    rests on, pinned without any SQL in the loop."""
    import weakscraper_ray.pipelines.fitting as F

    rng = np.random.default_rng(11)
    for _ in range(100):
        n = int(rng.integers(1, 12))
        s = rng.integers(-50, 51, n).astype(np.int64)
        c = rng.integers(1, 6, n).astype(np.int64)
        pav = _pav_fit(s, c)
        ps = np.concatenate([[0], np.cumsum(s)])
        pc_ = np.concatenate([[0], np.cumsum(c)])
        minimax = []
        for i in range(n):
            best = -np.inf
            for j in range(i + 1):
                worst = np.inf
                for k in range(i, n):
                    worst = min(
                        worst, (ps[k + 1] - ps[j]) / (pc_[k + 1] - pc_[j])
                    )
                best = max(best, worst)
            minimax.append(F._away(1_000_000.0 * best))
        assert pav == minimax, (list(s), list(c))
        assert all(a <= b for a, b in zip(pav, pav[1:]))  # monotone


def test_llr_nonnegative_and_sorted(ray_session):
    import weakscraper_ray.pipelines.fitting as F

    out = F.QUERIES["llr_bigrams"]("/root/testdata/sf0.001")
    # G² ≥ 0 up to per-cell quantization slack (4 cells × 0.5 ulp × 2)
    assert (out["llr_e6"] >= -4).all()
    v = out["llr_e6"].to_numpy()
    assert (v[:-1] >= v[1:]).all()
    assert (out["n"] >= 5).all()
