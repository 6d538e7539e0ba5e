"""Round-3 continuation #11 unit tests: the governance / history
family (audit.py) on crafted inputs that hit the edges sf data never
does — negative values (truncating-division mirrors), timestamp ties
broken by event_id, open SCD2 intervals, the n == k anonymity
boundary."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import weakscraper_ray.pipelines.audit as A

_I64_MAX = 9_223_372_036_854_775_807


def _vh(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    """A tiny events table with adversarial edges:

    - user 1: A, A (same us! tie broken by event_id), B, A — repeats
      collapse, ties order deterministically, last interval is open
    - user 2: single event — one open interval
    - NEGATIVE values — DuckDB's `//` truncates toward zero while
      Python floors, so the band / EWMA mirrors only agree if the
      sign-corrected trunc mirror is used
    - one (type, day, band) class with exactly k=5 members (not risky)
      and one singleton (risky)
    """
    d = tmp_path_factory.mktemp("audit_events")
    day = 86_400_000_000
    rows = [
        # user 1 — ts tie at day1+100 between event_id 10 and 11
        (10, day + 100, 1, "A", -15.004, "{}"),
        (11, day + 100, 1, "A", -15.004, "{}"),
        (12, day + 200, 1, "B", -15.004, "{}"),
        (13, day + 300, 1, "A", -15.004, "{}"),
        # user 2 — lone event
        (20, 2 * day + 5, 2, "C", 3.10, "{}"),
    ]
    # the exactly-k class: 5 events, same type/day/band
    rows += [
        (30 + i, 3 * day + i, 3 + i, "D", 55.0, "{}") for i in range(5)
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


@pytest.fixture(scope="module")
def crafted_con(crafted_dir):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{crafted_dir}/events.parquet')"
    )
    return c


@pytest.mark.parametrize(
    "name", ["kanon_audit", "scd2_intervals", "transition_probs", "ewma_daily"]
)
def test_audit_queries_match_oracle_on_crafted_edges(
    name, crafted_dir, crafted_con, ray_session
):
    res = A.QUERIES[name](crafted_dir)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    sdf = crafted_con.execute(A.ORACLE_SQL[name]).fetchdf()
    assert len(rdf) == len(sdf), (name, len(rdf), len(sdf))
    assert sorted(rdf.columns) == sorted(sdf.columns)
    assert _vh(rdf) == _vh(sdf), name


def test_scd2_semantics_direct(crafted_dir, ray_session):
    df = (
        A.QUERIES["scd2_intervals"](crafted_dir)
        .to_pandas()
        .sort_values(["user_id", "valid_from_us"])
        .reset_index(drop=True)
    )
    day = 86_400_000_000
    u1 = df[df["user_id"] == 1]
    # A (collapsed tie), B, A — three intervals, last open
    assert list(u1["event_type"]) == ["A", "B", "A"]
    assert list(u1["valid_from_us"]) == [day + 100, day + 200, day + 300]
    assert list(u1["valid_to_us"]) == [day + 200, day + 300, _I64_MAX]
    u2 = df[df["user_id"] == 2]
    assert list(u2["valid_to_us"]) == [_I64_MAX]
    # intervals never overlap and chain exactly per user
    for _, g in df.groupby("user_id"):
        froms = g["valid_from_us"].to_numpy()
        tos = g["valid_to_us"].to_numpy()
        assert (tos[:-1] == froms[1:]).all()


def test_kanon_boundary_and_negative_band(crafted_dir, ray_session):
    out = A.QUERIES["kanon_audit"](crafted_dir)
    row = out.iloc[0]
    # cents = round_away(-1500.4) = -1500; band = trunc(-1500/1000) =
    # -1 (floor would give -2 and break the oracle match). Classes:
    # (A, day1, -1) ×3, (B, day1, -1) ×1, (C, day2, 0) ×1,
    # (D, day3, 5) ×5 → the D class (exactly k) is NOT risky
    assert row["k"] == 5
    assert row["n_classes"] == 4
    assert row["n_records"] == 10
    assert row["n_risky_classes"] == 3
    assert row["n_risky_records"] == 5
    assert row["min_class_size"] == 1


def test_trunc_div_matches_duckdb():
    con = duckdb.connect()
    v = np.array([-7, -1, 0, 1, 7, -1500, 1500], dtype=np.int64)
    got = A._trunc_div(v, 2)
    want = [con.execute(f"SELECT cast({x} AS BIGINT) // 2").fetchone()[0] for x in v]
    assert list(got) == want


def test_ewma_recurrence_reference(crafted_dir, ray_session):
    df = A.QUERIES["ewma_daily"](crafted_dir)
    # independent reference for type A (user 1's three negative events
    # share day 1, so the series is a single day: ewma = x itself)
    a = df[df["event_type"] == "A"].reset_index(drop=True)
    assert len(a) == 1 and a.loc[0, "ewma"] == 3 * -1500  # -15.004 → -1500c
