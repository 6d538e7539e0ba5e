"""Round-3 continuation #9 (batch 2): corpus/experiment statistics —
Zipf rank-frequency fit and a Welch two-sample experiment read-out.
Each is a ``queries()`` entry with a DuckDB oracle twin.

Exactness strategy (the repo's quantize-then-sum convention, see
``series.q_token_entropy`` / ``q_trend_slope``): every logarithm is
quantized to an e6 integer FIRST (DuckDB ``ln`` and Python
``math.log`` are the same libm call — verified bit-identical over the
full count range in tests), all sums then run in exact integer
arithmetic, and the single final double expression is mirrored
op-for-op — so the result is partitioning- and order-independent and
hash-exact against SQL.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _i64_away, _read

_ZIPF_TOPK = 200


def _q_e6(v: float) -> int:
    """round(v * 1e6) half away from zero (DuckDB round), exact for
    the non-negative ln values used here."""
    return int(math.floor(abs(v) * 1e6 + 0.5)) * (1 if v >= 0 else -1)


def _away(v: float) -> int:
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


# =====================================================================
# Zipf rank-frequency slope over the corpus vocabulary
# =====================================================================

def q_zipf_slope(sf_dir: str):
    """Fit ln(count) = slope·ln(rank) + intercept over the top-200
    corpus terms — the Zipf's-law read-out used to sanity-check a
    training corpus's token distribution (natural text ≈ −1; templated
    or synthetic text drifts toward 0). The heavy part reuses the
    vocabulary-bounded term-count reduction (shuffle payload = batch
    vocabulary, never the token stream); the regression itself runs on
    ≤200 (rank, count) integers via quantized-log OLS."""
    from .analytics import _term_partial, _topk_terms

    ds = _read(sf_dir, "documents", ["text"])
    top = _topk_terms(
        ds.map_batches(_term_partial, batch_format="pyarrow"), "term", _ZIPF_TOPK
    ).to_pandas()  # ordered (n desc, term asc); bounded at 200 rows
    k = len(top)
    lx = [_q_e6(math.log(r)) for r in range(1, k + 1)]
    ly = [_q_e6(math.log(int(n))) for n in top["n"]]
    sx, sy = sum(lx), sum(ly)
    sxx = sum(v * v for v in lx)
    sxy = sum(a * b for a, b in zip(lx, ly))
    den = float(k * sxx - sx * sx)
    slope = float(k * sxy - sx * sy) / den
    intercept = (float(sy) - slope * float(sx)) / float(k)
    return pd.DataFrame(
        {
            "n_terms": pd.array([k], dtype="int64"),
            "slope_e6": pd.array([_away(slope * 1e6)], dtype="int64"),
            "intercept_e6": pd.array([_away(intercept)], dtype="int64"),
        }
    )


SQL_ZIPF = rf"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS term FROM documents),
wc AS (
  SELECT term, cast(count(*) AS BIGINT) AS n
  FROM toks GROUP BY term ORDER BY n DESC, term LIMIT {_ZIPF_TOPK}),
rk AS (
  SELECT cast(round(ln(cast(row_number() OVER (ORDER BY n DESC, term)
                            AS DOUBLE)) * 1000000, 0) AS BIGINT) AS lx,
         cast(round(ln(cast(n AS DOUBLE)) * 1000000, 0) AS BIGINT) AS ly
  FROM wc),
s AS (
  SELECT cast(count(*) AS BIGINT) AS k, sum(lx) AS sx, sum(ly) AS sy,
         sum(lx*lx) AS sxx, sum(lx*ly) AS sxy
  FROM rk)
SELECT k AS n_terms,
       cast(round(cast(k*sxy - sx*sy AS DOUBLE)
                  / cast(k*sxx - sx*sx AS DOUBLE) * 1000000, 0) AS BIGINT)
           AS slope_e6,
       cast(round((cast(sy AS DOUBLE)
                   - cast(k*sxy - sx*sy AS DOUBLE)
                     / cast(k*sxx - sx*sx AS DOUBLE) * cast(sx AS DOUBLE))
                  / cast(k AS DOUBLE), 0) AS BIGINT)
           AS intercept_e6
FROM s
"""


# =====================================================================
# Welch two-sample experiment read-out (A/B by user_id parity)
# =====================================================================

def _ab_partial(batch: pa.Table) -> pa.Table:
    u = batch.column("user_id").to_numpy(zero_copy_only=False)
    y = _i64_away(batch.column("value"), 100.0).to_numpy(zero_copy_only=False)
    out = {"variant": [], "n": [], "sy": [], "syy": []}
    for v in (0, 1):
        m = (u % 2) == v
        out["variant"].append(v)
        out["n"].append(int(m.sum()))
        out["sy"].append(int(y[m].sum()))
        out["syy"].append(int((y[m] * y[m]).sum()))
    return pa.table(
        {
            "variant": pa.array(out["variant"], pa.int64()),
            "n": pa.array(out["n"], pa.int64()),
            "sy": pa.array(out["sy"], pa.int64()),
            "syy": pa.array(out["syy"], pa.int64()),
        }
    )


def q_ab_test(sf_dir: str):
    """Welch's t read-out of a (deterministic, user-parity) A/B
    assignment over event value-cents: the experiment-analysis
    primitive. The scan reduces to 2×(n, Σy, Σy²) int64 partials per
    batch — map-only, constant-size exchange — and the final t
    statistic is ONE double expression from exact integer sums,
    mirrored op-for-op in SQL. (Σy² stays int64-exact here; at larger
    value scales the partial would move to HUGEINT/float128 the same
    way ``analytics.q_corr_stats`` documents.)"""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "value"])
    agg = (
        ds.map_batches(_ab_partial, batch_format="pyarrow")
        .groupby("variant")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sy", alias_name="sy"),
            Sum("syy", alias_name="syy"),
        )
        .to_pandas()  # 2 rows
        .set_index("variant")
    )
    res = {}
    for v in (0, 1):
        n = int(agg.loc[v, "n"])
        sy = int(agg.loc[v, "sy"])
        syy = int(agg.loc[v, "syy"])
        m = float(sy) / float(n)
        var = (float(syy) - float(sy) * float(sy) / float(n)) / float(n - 1)
        res[v] = (n, m, var)
    (na, ma, va), (nb, mb, vb) = res[0], res[1]
    t = (mb - ma) / math.sqrt(va / float(na) + vb / float(nb))
    return pd.DataFrame(
        {
            "n_a": pd.array([na], dtype="int64"),
            "n_b": pd.array([nb], dtype="int64"),
            "mean_diff_e6": pd.array([_away((mb - ma) * 1e6)], dtype="int64"),
            "t_e6": pd.array([_away(t * 1e6)], dtype="int64"),
        }
    )


SQL_AB = """
WITH c AS (
  SELECT user_id % 2 AS variant,
         cast(round(value * 100, 0) AS BIGINT) AS y
  FROM events),
s AS (
  SELECT variant, cast(count(*) AS BIGINT) AS n,
         cast(sum(y) AS BIGINT) AS sy, cast(sum(y*y) AS BIGINT) AS syy
  FROM c GROUP BY variant),
p AS (
  SELECT max(CASE WHEN variant = 0 THEN n END)  AS na,
         max(CASE WHEN variant = 0 THEN sy END) AS sya,
         max(CASE WHEN variant = 0 THEN syy END) AS syya,
         max(CASE WHEN variant = 1 THEN n END)  AS nb,
         max(CASE WHEN variant = 1 THEN sy END) AS syb,
         max(CASE WHEN variant = 1 THEN syy END) AS syyb
  FROM s),
f AS (
  SELECT na, nb,
         cast(sya AS DOUBLE)/cast(na AS DOUBLE) AS ma,
         cast(syb AS DOUBLE)/cast(nb AS DOUBLE) AS mb,
         (cast(syya AS DOUBLE)
          - cast(sya AS DOUBLE)*cast(sya AS DOUBLE)/cast(na AS DOUBLE))
           / cast(na - 1 AS DOUBLE) AS va,
         (cast(syyb AS DOUBLE)
          - cast(syb AS DOUBLE)*cast(syb AS DOUBLE)/cast(nb AS DOUBLE))
           / cast(nb - 1 AS DOUBLE) AS vb
  FROM p)
SELECT na AS n_a, nb AS n_b,
       cast(round((mb - ma) * 1000000, 0) AS BIGINT) AS mean_diff_e6,
       cast(round((mb - ma)
                  / sqrt(va / cast(na AS DOUBLE) + vb / cast(nb AS DOUBLE))
                  * 1000000, 0) AS BIGINT) AS t_e6
FROM f
"""


# =====================================================================
# Rolling 7-day correlation between two metric streams
# =====================================================================

_US_PER_DAY = 86_400_000_000
_CORR_W = 7
_CORR_A, _CORR_B = "click", "view"


def _daily_partial(batch: pa.Table) -> pa.Table:
    et = batch.column("event_type").to_numpy(zero_copy_only=False)
    us = pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
    y = _i64_away(batch.column("value"), 100.0).to_numpy(zero_copy_only=False)
    day = us // _US_PER_DAY
    df = pd.DataFrame(
        {
            "day": day,
            "x": np.where(et == _CORR_A, y, 0),
            "y": np.where(et == _CORR_B, y, 0),
        }
    )
    g = df.groupby("day", sort=False).sum()
    return pa.table(
        {
            "day": pa.array(g.index.to_numpy(np.int64)),
            "x": pa.array(g["x"].to_numpy(np.int64)),
            "y": pa.array(g["y"].to_numpy(np.int64)),
        }
    )


def q_rolling_corr(sf_dir: str):
    """Trailing-7-row Pearson correlation between the daily cents
    totals of two event streams (the 'do these metrics co-move' ops
    read-out). The scan reduces to day-bounded (day, Σx, Σy) int64
    partials — one constant-size exchange; the window pass runs over
    one row per day (bounded metadata) with exact integer window sums
    and ONE mirrored double expression per output row. Window is
    row-based over the ordered daily series (frames shorter than 7
    are not emitted), matching the SQL ROWS frame exactly."""
    from ray.data.aggregate import Sum

    daily = (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(_daily_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("x", alias_name="x"), Sum("y", alias_name="y"))
        .to_pandas()  # one row per day
        .sort_values("day")
        .reset_index(drop=True)
    )
    x = daily["x"].astype("int64").tolist()  # Python ints: exact products
    y = daily["y"].astype("int64").tolist()
    days = daily["day"].tolist()
    out_day, out_corr = [], []
    w = _CORR_W
    for i in range(w - 1, len(daily)):
        xs, ys = x[i - w + 1: i + 1], y[i - w + 1: i + 1]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = float(w * sxy - sx * sy)
        den = math.sqrt(float(w * sxx - sx * sx)) * math.sqrt(
            float(w * syy - sy * sy)
        )
        out_day.append(int(days[i]))
        out_corr.append(_away(num / den * 1e6))
    return pd.DataFrame(
        {
            "day": pd.array(out_day, dtype="int64"),
            "corr_e6": pd.array(out_corr, dtype="int64"),
        }
    )


SQL_ROLLING_CORR = f"""
WITH c AS (
  SELECT epoch_us(cast(ts AS TIMESTAMP)) // {_US_PER_DAY} AS day,
         cast(sum(CASE WHEN event_type = '{_CORR_A}'
                       THEN cast(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         cast(sum(CASE WHEN event_type = '{_CORR_B}'
                       THEN cast(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1),
w AS (
  SELECT day,
         row_number() OVER (ORDER BY day) AS rn,
         sum(x)   OVER win AS sx,  sum(y)   OVER win AS sy,
         sum(x*x) OVER win AS sxx, sum(y*y) OVER win AS syy,
         sum(x*y) OVER win AS sxy
  FROM c
  WINDOW win AS (ORDER BY day ROWS BETWEEN {_CORR_W - 1} PRECEDING
                 AND CURRENT ROW))
SELECT day,
       cast(round(cast({_CORR_W}*sxy - sx*sy AS DOUBLE)
                  / (sqrt(cast({_CORR_W}*sxx - sx*sx AS DOUBLE))
                     * sqrt(cast({_CORR_W}*syy - sy*sy AS DOUBLE)))
                  * 1000000, 0) AS BIGINT) AS corr_e6
FROM w WHERE rn >= {_CORR_W}
"""


# =====================================================================
# Time-series densification (fill missing days with zeros)
# =====================================================================

def _day_count_partial(batch: pa.Table) -> pa.Table:
    us = pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
    day, cnt = np.unique(us // _US_PER_DAY, return_counts=True)
    return pa.table(
        {"day": pa.array(day, pa.int64()), "n": pa.array(cnt.astype(np.int64))}
    )


def q_fill_days(sf_dir: str):
    """Calendar densification: daily event counts re-indexed onto the
    full [min_day, max_day] range with explicit zeros — the
    completeness pass every downstream window/rolling computation
    assumes (a missing day silently shifts a ROWS frame). Day-bounded
    count exchange; the densify runs over one row per day."""
    from ray.data.aggregate import Sum

    d = (
        _read(sf_dir, "events", ["ts"])
        .map_batches(_day_count_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # one row per observed day
    )
    full = np.arange(int(d["day"].min()), int(d["day"].max()) + 1, dtype=np.int64)
    n = (
        d.set_index("day")["n"]
        .reindex(full, fill_value=0)
        .to_numpy(np.int64)
    )
    return pd.DataFrame({"day": full, "n": n})


SQL_FILL_DAYS = """
WITH d AS (
  SELECT epoch_us(cast(ts AS TIMESTAMP)) // 86400000000 AS day,
         cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
s AS (
  SELECT unnest(generate_series((SELECT min(day) FROM d),
                                (SELECT max(day) FROM d))) AS day)
SELECT s.day, coalesce(d.n, 0) AS n
FROM s LEFT JOIN d USING (day)
"""


# =====================================================================
# Theil–Sen robust slope over the daily click series
# =====================================================================

def q_theil_sen(sf_dir: str):
    """Theil–Sen estimator (median of all pairwise slopes) over the
    daily click-cents series — the robust companion to the OLS
    trend_slope: a corrupted day shifts OLS arbitrarily but moves the
    pairwise-slope median by at most one rank. The distributed part is
    the day-bounded total reduction; the O(days²) pair enumeration
    runs on bounded per-day metadata (30 days → 435 pairs; at larger
    horizons the public randomized-median variant applies). Each
    slope is ONE double division of exact integer diffs, and the
    median of an even count averages two doubles — both mirrored
    op-for-op in SQL."""
    from ray.data.aggregate import Sum

    daily = (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(_daily_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("x", alias_name="x"), Sum("y", alias_name="y"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    days = daily["day"].astype("int64").tolist()
    xs = daily["x"].astype("int64").tolist()
    slopes = []
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            slopes.append(float(xs[j] - xs[i]) / float(days[j] - days[i]))
    slopes.sort()
    m = len(slopes)
    med = (
        slopes[m // 2]
        if m % 2
        else (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0
    )
    return pd.DataFrame(
        {
            "n_days": pd.array([len(days)], dtype="int64"),
            "n_pairs": pd.array([m], dtype="int64"),
            "slope_e6": pd.array([_away(med * 1e6)], dtype="int64"),
        }
    )


SQL_THEIL_SEN = f"""
WITH c AS (
  SELECT epoch_us(cast(ts AS TIMESTAMP)) // {_US_PER_DAY} AS day,
         cast(sum(CASE WHEN event_type = '{_CORR_A}'
                       THEN cast(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x
  FROM events GROUP BY 1),
p AS (
  SELECT cast(b.x - a.x AS DOUBLE) / cast(b.day - a.day AS DOUBLE) AS sl
  FROM c a JOIN c b ON b.day > a.day)
SELECT (SELECT cast(count(*) AS BIGINT) FROM c) AS n_days,
       cast(count(*) AS BIGINT) AS n_pairs,
       cast(round(median(sl) * 1000000, 0) AS BIGINT) AS slope_e6
FROM p
"""


# =====================================================================
# Mann-Whitney U (rank-based two-sample test, exact midranks)
# =====================================================================

def q_mannwhitney_u(sf_dir: str):
    """Rank-based companion to the Welch ``ab_test``: the Mann-Whitney
    U statistic between the user-parity variants over value cents —
    the non-parametric read-out that survives the heavy-tailed revenue
    distributions Welch assumes away.  Ranks never materialize:
    because midranks depend only on per-distinct-value counts, the
    scan reduces to (value, variant) count partials → one bounded
    groupby(value) exchange → a prefix-scan over the distinct-value
    table (driver-side here; a 100 TB run replaces it with the
    repo's sort + two-phase prefix-scan, ``running_sum`` shape).
    Everything stays integer: per-element 2×midrank at value v is
    ``2·count(<v) + count(=v) + 1``, so ``u2_a = Σ_A 2·midrank −
    n_a(n_a+1)`` is exact (the tie-midrank sum is always integral),
    and the identity u2_a + u2_b = 2·n_a·n_b is asserted by the
    oracle comparison for free."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        v = _i64_away(batch.column("value"), 100.0).to_numpy(
            zero_copy_only=False
        )
        df = pd.DataFrame({"v": v, "variant": (u % 2).astype(np.int64)})
        g = df.groupby(["v", "variant"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "v": pa.array(g["v"].to_numpy(np.int64)),
                "variant": pa.array(g["variant"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    counts = (
        _read(sf_dir, "events", ["user_id", "value"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["v", "variant"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded by distinct cents values
    )
    piv = (
        counts.pivot_table(index="v", columns="variant", values="n", fill_value=0)
        .reindex(columns=[0, 1], fill_value=0)
        .sort_index()
    )
    na_v = piv[0].to_numpy(np.int64)
    nb_v = piv[1].to_numpy(np.int64)
    cnt = na_v + nb_v
    lo = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    mid2 = 2 * lo + cnt + 1  # 2× midrank of every element at this value
    n_a, n_b = int(na_v.sum()), int(nb_v.sum())
    sum2_a = int((na_v * mid2).sum())
    u2_a = sum2_a - n_a * (n_a + 1)
    u2_b = 2 * n_a * n_b - u2_a
    return pd.DataFrame(
        {
            "n_a": pd.array([n_a], dtype="int64"),
            "n_b": pd.array([n_b], dtype="int64"),
            "u2_a": pd.array([u2_a], dtype="int64"),
            "u2_b": pd.array([u2_b], dtype="int64"),
        }
    )


SQL_MANNWHITNEY = """
WITH c AS (
  SELECT cast(round(value * 100, 0) AS BIGINT) AS v,
         cast(user_id % 2 AS BIGINT) AS variant
  FROM events),
g AS (
  SELECT v,
         cast(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         cast(count(*) AS BIGINT) AS cnt
  FROM c GROUP BY v),
o AS (
  SELECT v, na, cnt,
         cast(sum(cnt) OVER (ORDER BY v) - cnt AS BIGINT) AS lo
  FROM g),
s AS (
  SELECT cast(sum(na) AS BIGINT) AS n_a,
         cast(sum(cnt - na) AS BIGINT) AS n_b,
         cast(sum(na * (2 * lo + cnt + 1)) AS BIGINT) AS sum2_a
  FROM o)
SELECT n_a, n_b,
       cast(sum2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       cast(2 * n_a * n_b - (sum2_a - n_a * (n_a + 1)) AS BIGINT) AS u2_b
FROM s
"""


# =====================================================================
# Leave-one-out target encoding (categorical → numeric feature)
# =====================================================================

def q_target_encode_loo(sf_dir: str):
    """Leave-one-out target encoding of event_type against value
    cents: each event's feature is the mean of the OTHER events of its
    category, (S_t − v) / (n_t − 1) — the standard leakage-free
    categorical encoder for tree/linear models.  Two-phase: a tiny
    per-type (S, n) aggregate broadcasts via closure, then one
    streaming map emits the per-event encodings — no second exchange,
    no per-row Python.  The division is the one mirrored double op
    (e6-quantized, half away from zero)."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = _i64_away(batch.column("value"), 100.0).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"event_type": et, "s": v})
            .groupby("event_type", sort=False)
            .agg(s=("s", "sum"), n=("s", "size"))
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"]),
                "s": pa.array(g["s"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    stats = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()  # one row per type
    )
    sn = {
        r.event_type: (int(r.s), int(r.n)) for r in stats.itertuples()
    }

    def _encode(batch: pa.Table, sn=sn) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = _i64_away(batch.column("value"), 100.0).to_numpy(zero_copy_only=False)
        s = np.array([sn[t][0] for t in et], dtype=np.int64)
        n = np.array([sn[t][1] for t in et], dtype=np.int64)
        enc = 1e6 * (s - v) / (n - 1)
        out = (np.sign(enc) * np.floor(np.abs(enc) + 0.5)).astype(np.int64)
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "event_type": batch.column("event_type"),
                "v_cents": pa.array(v),
                "loo_mean_e6": pa.array(out),
            }
        )

    return _read(
        sf_dir, "events", ["event_id", "event_type", "value"]
    ).map_batches(_encode, batch_format="pyarrow")


SQL_TARGET_ENCODE = """
WITH c AS (
  SELECT cast(event_id AS BIGINT) AS event_id, event_type,
         cast(round(value * 100, 0) AS BIGINT) AS v
  FROM events),
t AS (
  SELECT event_type, cast(sum(v) AS BIGINT) AS s,
         cast(count(*) AS BIGINT) AS n
  FROM c GROUP BY event_type)
SELECT c.event_id, c.event_type, c.v AS v_cents,
       cast(round(1000000.0 * (t.s - c.v) / (t.n - 1), 0) AS BIGINT)
           AS loo_mean_e6
FROM c JOIN t USING (event_type)
"""


# =====================================================================
# Chi-square test of independence (lang × source contingency)
# =====================================================================

def q_chisq_independence(sf_dir: str):
    """Pearson chi-square test of independence over the documents
    lang × source contingency table — the corpus-composition audit
    ("is language mix independent of source?") run before fixing
    sampling weights.  The ONLY distributed work is a bounded partial
    count per batch keyed on (lang, source) followed by one tiny
    groupby-sum exchange (payload = observed vocabulary of the cross
    product, never the documents); the statistic itself runs on the
    driver over the full grid INCLUDING zero cells (O=0, E>0 cells
    contribute E — textbook definition).  Per-cell terms are e6-
    quantized then integer-summed (the psi_drift convention), so the
    result is partitioning-independent and hash-exact vs SQL."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "source"])

    def _partial(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "lang": t.column("lang").to_numpy(zero_copy_only=False),
                    "source": t.column("source").to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["lang", "source"], sort=False)
            .size()
            .reset_index(name="o")
        )
        return pa.table(
            {
                "key": pa.array(g["lang"] + "\x1f" + g["source"]),
                "o": pa.array(g["o"].to_numpy(np.int64)),
            }
        )

    cnt = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("o", alias_name="o"))
        .to_pandas()
    )
    obs: dict[tuple[str, str], int] = {}
    for k, o in zip(cnt["key"], cnt["o"]):
        lang, source = k.split("\x1f")
        obs[(lang, source)] = int(o)
    langs = sorted({l for l, _ in obs})
    sources = sorted({s for _, s in obs})
    rt = {l: sum(obs.get((l, s), 0) for s in sources) for l in langs}
    ct = {s: sum(obs.get((l, s), 0) for l in langs) for s in sources}
    n = sum(rt.values())
    chi2_e6 = 0
    for l in langs:
        for s in sources:
            e = float(rt[l] * ct[s]) / float(n)
            d = float(obs.get((l, s), 0)) - e
            chi2_e6 += _q_e6(d * d / e)
    return pd.DataFrame(
        {
            "n": pd.array([n], dtype="int64"),
            "n_lang": pd.array([len(langs)], dtype="int64"),
            "n_source": pd.array([len(sources)], dtype="int64"),
            "dof": pd.array(
                [(len(langs) - 1) * (len(sources) - 1)], dtype="int64"
            ),
            "chi2_e6": pd.array([chi2_e6], dtype="int64"),
        }
    )


SQL_CHISQ = """
WITH o AS (
  SELECT lang, source, cast(count(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2),
rt AS (SELECT lang, cast(sum(o) AS BIGINT) AS rt FROM o GROUP BY 1),
ct AS (SELECT source, cast(sum(o) AS BIGINT) AS ct FROM o GROUP BY 1),
t AS (SELECT cast(sum(o) AS BIGINT) AS n FROM o),
grid AS (
  SELECT rt.lang, ct.source, rt.rt, ct.ct, coalesce(o.o, 0) AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source),
terms AS (
  SELECT cast(round(
           (cast(o AS DOUBLE) - cast(rt * ct AS DOUBLE) / cast(t.n AS DOUBLE))
           * (cast(o AS DOUBLE) - cast(rt * ct AS DOUBLE) / cast(t.n AS DOUBLE))
           / (cast(rt * ct AS DOUBLE) / cast(t.n AS DOUBLE))
           * 1000000, 0) AS BIGINT) AS term
  FROM grid, t)
SELECT t.n,
       (SELECT cast(count(*) AS BIGINT) FROM rt) AS n_lang,
       (SELECT cast(count(*) AS BIGINT) FROM ct) AS n_source,
       ((SELECT count(*) FROM rt) - 1) * ((SELECT count(*) FROM ct) - 1) AS dof,
       (SELECT cast(sum(term) AS BIGINT) FROM terms) AS chi2_e6
FROM t
"""


QUERIES = {
    "chisq_independence": q_chisq_independence,
    "fill_days": q_fill_days,
    "mannwhitney_u": q_mannwhitney_u,
    "target_encode_loo": q_target_encode_loo,
    "theil_sen": q_theil_sen,
    "zipf_slope": q_zipf_slope,
    "ab_test": q_ab_test,
    "rolling_corr": q_rolling_corr,
}

ORACLE_SQL = {
    "chisq_independence": SQL_CHISQ,
    "fill_days": SQL_FILL_DAYS,
    "mannwhitney_u": SQL_MANNWHITNEY,
    "target_encode_loo": SQL_TARGET_ENCODE,
    "theil_sen": SQL_THEIL_SEN,
    "zipf_slope": SQL_ZIPF,
    "ab_test": SQL_AB,
    "rolling_corr": SQL_ROLLING_CORR,
}

# self-register into the driver-facing registries (same pattern as
# analytics.py / series.py / dataops.py)
from . import relational as _rel  # noqa: E402

_rel.QUERIES.update(QUERIES)
_rel.ORACLE_SQL.update(ORACLE_SQL)
