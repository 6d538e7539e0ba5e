"""Round-3 continuation #13: product-analytics family — the reporting
pass a training-data/product pipeline runs over the event stream after
ingestion.  Three operators, each a ``queries()`` entry with a DuckDB
oracle:

- ``funnel_conversion``  ordered view→click→purchase funnel per user
- ``ols_daily``          exact least-squares trend of daily revenue
                         (integer normal equations — num/den released)
- ``decile_census``      GLOBAL decile bin census WITHOUT a global
                         sort (selection-pass boundaries + broadcast
                         compare) — contrast ``ntile_assign``
                         (series.py:452), which assigns per-type
                         quartiles inside a group sort, and
                         ``equidepth_bins``, which emits only the
                         boundaries: this one labels EVERY row against
                         global boundaries and reduces to the 10-row
                         census, the shape a 100 TB binning pass needs

Exactness strategy (repo conventions): cents via ``_i64_away``
(DuckDB round-half-away), day = ``epoch_us // 86400e6``, OLS
released as exact integer numerator/denominator plus a truncating
``slope_e6`` mirroring DuckDB's toward-zero ``//``.

Scale shapes: funnel shards users (user_id % 256) and does per-shard
vectorized merges, never a per-user Python loop; OLS reduces to
bounded (day, total) partials before its single exchange;
the decile census reuses the two-pass selection helper
(monitor.py:552) — the whole point is that global binning costs two
scans + a 10-row exchange, not a sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .monitor import _selection_rank_values
from .relational import _i64_away, _read

_US_PER_DAY = 86_400_000_000


# ------------------------------------------------------------- funnel

_FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel_conversion(sf_dir: str):
    """Ordered conversion funnel: a user reaches stage k+1 at the
    FIRST event of that type STRICTLY after their stage-k time (the
    standard product-analytics "unordered funnel with ordering
    constraint").  Output is one row of stage counts.

    Shape: shard by ``user_id % 256``; inside a shard the three stage
    times resolve with vectorized pandas groupby-min + merges (no
    per-user loop); the exchange carries (user, t1..t3) candidates
    only — at 10^12 events the payload is one row per user per stage,
    not the stream."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def _key(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("event_type"),
            value_set=pa.array(list(_FUNNEL_STAGES)),
        )
        t = t.filter(keep)
        u = t.column("user_id")
        return t.append_column(
            "shard",
            pc.bit_wise_and(pc.cast(u, pa.int64()), pa.scalar(255)),
        )

    def _stage_times(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].astype("int64")
        df = pd.DataFrame(
            {"user_id": g["user_id"], "type": g["event_type"], "us": us}
        )
        v = (
            df[df["type"] == "view"]
            .groupby("user_id", sort=False)["us"]
            .min()
            .rename("t1")
            .reset_index()
        )
        c = df[df["type"] == "click"].merge(v, on="user_id")
        c = c[c["us"] > c["t1"]]
        c2 = c.groupby("user_id", sort=False)["us"].min().rename("t2").reset_index()
        p = df[df["type"] == "purchase"].merge(c2, on="user_id")
        p = p[p["us"] > p["t2"]]
        p2 = p.groupby("user_id", sort=False)["us"].min().rename("t3").reset_index()
        out = v.merge(c2, on="user_id", how="left").merge(
            p2, on="user_id", how="left"
        )
        return pd.DataFrame(
            {
                "n_view": np.array([len(out)], dtype=np.int64),
                "n_view_click": np.array(
                    [int(out["t2"].notna().sum())], dtype=np.int64
                ),
                "n_full_funnel": np.array(
                    [int(out["t3"].notna().sum())], dtype=np.int64
                ),
            }
        )

    parts = (
        ds.map_batches(_key, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(_stage_times, batch_format="pandas")
        .to_pandas()
    )
    return pa.table(
        {
            c: pa.array([int(parts[c].sum())], pa.int64())
            for c in ("n_view", "n_view_click", "n_full_funnel")
        }
    )


SQL_FUNNEL = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT (SELECT cast(count(*) AS BIGINT) FROM v) AS n_view,
       (SELECT cast(count(*) AS BIGINT) FROM c) AS n_view_click,
       (SELECT cast(count(*) AS BIGINT) FROM p) AS n_full_funnel
"""


# ---------------------------------------------------------------- OLS

def q_ols_daily(sf_dir: str):
    """Exact ordinary-least-squares trend of daily revenue cents:
    the normal-equation moments (n, Σx, Σy, Σxy, Σx²) are INTEGER
    (x = epoch day, y = day total cents), so slope and intercept are
    released as exact integer numerator/denominator — no float
    summation anywhere — plus a truncating ``slope_e6`` for human
    consumption (sign*(abs//) mirrors DuckDB's toward-zero ``//``).
    Complements ``theil_sen`` (robust) with the classical estimator.

    Shape: per-batch (day, cents) partials → one ≤#days exchange →
    constant-size moment fold on the driver."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        y = _i64_away(t.column("value"), 100.0).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": us // _US_PER_DAY, "y": y})
        g = df.groupby("day", sort=False)["y"].sum().reset_index()
        return pa.table(
            {
                "day": pa.array(g["day"].to_numpy(np.int64)),
                "y": pa.array(g["y"].to_numpy(np.int64)),
            }
        )

    daily = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("y", alias_name="y"))
        .to_pandas()  # bounded by #days
    )
    x = daily["day"].to_numpy(np.int64)
    y = daily["y"].to_numpy(np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x.astype(object) * y.astype(object)).sum())
    sxx = int((x.astype(object) * x.astype(object)).sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope_e6 = (abs(10**6 * num) // den) * (1 if num >= 0 else -1)
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "slope_num": pa.array([num], pa.int64()),
            "slope_den": pa.array([den], pa.int64()),
            "slope_e6": pa.array([slope_e6], pa.int64()),
        }
    )


SQL_OLS = """
WITH d AS (
  SELECT cast(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         cast(sum(cast(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY day),
m AS (SELECT cast(count(*) AS BIGINT) AS n,
             cast(sum(day) AS BIGINT) AS sx,
             cast(sum(y) AS BIGINT) AS sy,
             cast(sum(cast(day AS HUGEINT) * y) AS HUGEINT) AS sxy,
             cast(sum(cast(day AS HUGEINT) * day) AS HUGEINT) AS sxx
      FROM d)
SELECT n AS n_days,
       cast(n * sxy - cast(sx AS HUGEINT) * sy AS BIGINT) AS slope_num,
       cast(n * sxx - cast(sx AS HUGEINT) * sx AS BIGINT) AS slope_den,
       cast((1000000 * (n * sxy - cast(sx AS HUGEINT) * sy))
            // (n * sxx - cast(sx AS HUGEINT) * sx) AS BIGINT) AS slope_e6
FROM m
"""


# -------------------------------------------------------------- ntile

def q_decile_census(sf_dir: str):
    """Decile assignment without a global sort: the nine equi-depth
    boundaries resolve via the two-pass selection helper
    (monitor.py:552 — histogram pass + probe pass), then ONE broadcast
    ``searchsorted`` labels every row; output is the 10-row (bin, n)
    census.  bin(v) = #{boundaries < v}, a pure function of the value,
    so ties land deterministically on both engines (unlike SQL NTILE,
    which splits ties by row position)."""
    from ray.data.aggregate import Sum

    n, vals = _selection_rank_values(
        sf_dir, lambda n: [(j * (n - 1)) // 10 for j in range(1, 10)]
    )
    bounds = np.array(
        sorted(vals[(j * (n - 1)) // 10] for j in range(1, 10)),
        dtype=np.int64,
    )

    ds = _read(sf_dir, "events", ["value"])

    def _assign(t: pa.Table, bounds=bounds) -> pa.Table:
        v = _i64_away(t.column("value"), 100.0).to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, v, side="left")  # == #{bounds < v}
        bc = np.bincount(b, minlength=10).astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(np.arange(10, dtype=np.int64)),
                "n": pa.array(bc),
            }
        )

    out = (
        ds.map_batches(_assign, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )
    return out.filter(expr="n > 0")


SQL_DECILE_CENSUS = """
WITH c AS (
  SELECT cast(round(value * 100, 0) AS BIGINT) AS v FROM events),
t AS (SELECT cast(count(*) AS BIGINT) AS n FROM c),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
bounds AS (
  SELECT r.v AS b FROM range(1, 10) j(j), t
  JOIN r ON r.rn = (j.j * (t.n - 1)) // 10 + 1)
SELECT (SELECT cast(count(*) AS BIGINT) FROM bounds WHERE b < c.v) AS bin,
       cast(count(*) AS BIGINT) AS n
FROM c GROUP BY bin HAVING count(*) > 0
"""


QUERIES = {
    "funnel_conversion": q_funnel_conversion,
    "ols_daily": q_ols_daily,
    "decile_census": q_decile_census,
}

ORACLE_SQL = {
    "funnel_conversion": SQL_FUNNEL,
    "ols_daily": SQL_OLS,
    "decile_census": SQL_DECILE_CENSUS,
}

# self-register (same pattern as monitor.py)
from . import relational as _rel  # noqa: E402

_rel.QUERIES.update(QUERIES)
_rel.ORACLE_SQL.update(ORACLE_SQL)
