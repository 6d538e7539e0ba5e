"""Round-3 continuation #13: engagement / stream-hygiene family over
the event log — the user-lifecycle reporting and ingestion-order
audits of a product warehouse, each a ``queries()`` entry with a
DuckDB oracle:

- ``cohort_retention``  weekly cohort × week-offset active-user grid
                        (the classic retention triangle)
- ``recency_score``     per-user integer exponential-decay engagement
                        score (weight 2^(day - day_min) — EXACT, the
                        halving-decay idiom of ``ewma_daily`` inverted
                        so recency weighs more, no float decay)
- ``watermark_late``    per-type late-arrival census under a 5-minute
                        watermark in INGESTION order (event_id) — the
                        out-of-orderness audit that sizes streaming
                        watermark delays

Exactness: day = ``epoch_us // 86400e6``; weights are powers of two
over a ≤31-day span (max 2^30, per-user sums << 2^63); watermark
comparison is strict integer microseconds; cohort weeks floor-divide
non-negative day offsets identically in both engines.

Scale shapes: cohort_retention's first exchange is the distinct
(user, week) grid (per-batch dedupe first), the second keys by user
with a bounded per-user week list; recency_score pre-aggregates per
batch so the exchange carries (user, partial) rows; watermark_late
shards by event_type and does one vectorized running-max per shard —
an ingestion-ordered re-sort per type is inherent to the semantics
(at 10^12 rows you'd range-partition by event_id and carry the
per-range max forward, same arithmetic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _read

_US_PER_DAY = 86_400_000_000
_WM_LAG_US = 300_000_000  # 5-minute watermark


def _day_col(t: pa.Table) -> np.ndarray:
    us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
    return us // _US_PER_DAY


def q_cohort_retention(sf_dir: str):
    """Retention triangle: users bucket into the week of their first
    event (cohort); each later active week counts them at offset
    ``week - cohort``.  Output (cohort_week, week_offset, n_users).

    Two keyed exchanges: distinct (user, week) — deduped per batch
    first, so the payload is the activity GRID, not the stream — then
    a per-user ``map_groups`` that emits each user's offsets from its
    own min week; the final (cohort, offset) aggregate is a ≤(weeks²)
    grid."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    d0 = int(
        ds.map_batches(
            lambda t: pa.table(
                {"d": pa.array([int(_day_col(t).min())], pa.int64())}
            ),
            batch_format="pyarrow",
        ).min("d")
    )

    def _user_weeks(t: pa.Table, d0=d0) -> pa.Table:
        week = (_day_col(t) - d0) // 7
        df = pd.DataFrame(
            {"user_id": t.column("user_id").to_numpy(), "week": week}
        ).drop_duplicates()
        return pa.table(
            {
                "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
                "week": pa.array(df["week"].to_numpy(np.int64)),
            }
        )

    def _offsets(g: pd.DataFrame) -> pd.DataFrame:
        weeks = np.unique(g["week"].to_numpy(np.int64))
        cw = int(weeks.min())
        return pd.DataFrame(
            {
                "cohort_week": np.full(len(weeks), cw, dtype=np.int64),
                "week_offset": weeks - cw,
                "n": np.ones(len(weeks), dtype=np.int64),
            }
        )

    grid = (
        ds.map_batches(_user_weeks, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_offsets, batch_format="pandas")
        .materialize()  # bounded: users x weeks; guards the 2nd exchange
    )
    out = grid.groupby(["cohort_week", "week_offset"]).aggregate(
        Sum("n", alias_name="n_users")
    )
    return out


SQL_COHORT = """
WITH d AS (SELECT user_id,
                  epoch_us(ts) // 86400000000 AS day FROM events),
m AS (SELECT min(day) AS d0 FROM d),
w AS (SELECT DISTINCT user_id, (day - d0) // 7 AS week FROM d, m),
c AS (SELECT user_id, min(week) AS cw FROM w GROUP BY user_id)
SELECT c.cw AS cohort_week, w.week - c.cw AS week_offset,
       cast(count(*) AS BIGINT) AS n_users
FROM w JOIN c USING (user_id)
GROUP BY cohort_week, week_offset
"""


def q_recency_score(sf_dir: str):
    """Integer exponential-recency engagement score per user:
    weight(event) = 2^(day - day_min) — the most recent day weighs
    2^30-ish, yesterday half that — summed exactly in int64 (span is
    ≤31 days, per-user sums << 2^63).  The float-free way to rank
    users by decayed activity; halving-decay sibling of
    ``ewma_daily``.  Per-batch partial sums keyed by user → one
    exchange bounded by the user count."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    d0 = int(
        ds.map_batches(
            lambda t: pa.table(
                {"d": pa.array([int(_day_col(t).min())], pa.int64())}
            ),
            batch_format="pyarrow",
        ).min("d")
    )

    def _partial(t: pa.Table, d0=d0) -> pa.Table:
        w = np.int64(1) << (_day_col(t) - d0)
        df = pd.DataFrame({"user_id": t.column("user_id").to_numpy(), "w": w})
        g = df.groupby("user_id", sort=False)["w"].sum().reset_index()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                "score": pa.array(g["w"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("score", alias_name="score"))
    )


SQL_RECENCY = """
WITH d AS (SELECT user_id,
                  epoch_us(ts) // 86400000000 AS day FROM events),
m AS (SELECT min(day) AS d0 FROM d)
SELECT user_id,
       cast(sum(cast(1 AS BIGINT) << cast(day - d0 AS INTEGER))
            AS BIGINT) AS score
FROM d, m GROUP BY user_id
"""


def q_watermark_late(sf_dir: str):
    """Late-arrival census: scanning each event_type's stream in
    INGESTION order (event_id), an event is late when its timestamp
    trails the running max by more than the 5-minute watermark
    (strictly: ``us + lag < watermark``).  Output (event_type,
    n_events, n_late) — the measurement that sizes a streaming
    pipeline's allowed-lateness.  One vectorized running-max per
    type shard; the first event of a type is never late."""

    ds = _read(sf_dir, "events", ["event_type", "event_id", "ts"])

    def _audit(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["event_id"].to_numpy(np.int64), kind="stable")
        us = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )[order]
        wm = np.maximum.accumulate(us)
        late = us + _WM_LAG_US < wm
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_events": np.array([len(us)], dtype=np.int64),
                "n_late": np.array([int(late.sum())], dtype=np.int64),
            }
        )

    return ds.groupby("event_type").map_groups(_audit, batch_format="pandas")


SQL_WATERMARK = f"""
WITH o AS (
  SELECT event_type, epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING) AS wm
  FROM events)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_events,
       cast(sum(CASE WHEN us + {_WM_LAG_US} < wm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late
FROM o GROUP BY event_type
"""


QUERIES = {
    "cohort_retention": q_cohort_retention,
    "recency_score": q_recency_score,
    "watermark_late": q_watermark_late,
}

ORACLE_SQL = {
    "cohort_retention": SQL_COHORT,
    "recency_score": SQL_RECENCY,
    "watermark_late": SQL_WATERMARK,
}

# self-register (same pattern as monitor.py)
from . import relational as _rel  # noqa: E402

_rel.QUERIES.update(QUERIES)
_rel.ORACLE_SQL.update(ORACLE_SQL)
