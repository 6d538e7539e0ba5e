"""Round-3 continuation #20: classical hypothesis tests II — the
nonparametric / paired / ordered-alternative companions of the
continuation-18/19 family, each exact-integer until (at most) one
mirrored fixed-order double chain.

Group-comparison tests over the bounded 3 × 50 returnflag × quantity
census (shared with ``anova_f``; zero keyed exchange):

- ``mood_median``       Mood's median test (Brown & Mood 1951): the
                        2 × 3 above/below-grand-median table is pure
                        integers (at-median dropped, the ``runs_test``
                        tie rule); Pearson χ² one mirrored chain.
- ``jonckheere_trend``  Jonckheere–Terpstra (1954) ordered-alternative
                        test under the pinned order A < N < R: the
                        doubled statistic 2U and the three
                        tie-correction terms are exact bigints.
- ``bartlett_test``     Bartlett (1937) variance homogeneity: group
                        variances are exact rationals from the nine
                        census moments; each ln term is e6-quantized
                        BEFORE combination (the ``kn_bigram`` ln
                        discipline) so the χ² numerator is integer.

Paired / binary designs:

- ``mcnemar_test``      McNemar (1947, Edwards-corrected) marginal
                        homogeneity of two deterministic document
                        quality predictors — χ² = (|b−c|−1)²/(b+c) a
                        PURE integer rational (no double anywhere).
- ``wilcoxon_signed``   Wilcoxon (1945) signed-rank over day-paired
                        priority-1 vs priority-2 order counts: doubled
                        mid-ranks of |d| keep W and the tie-corrected
                        12·Var exact bigints.

Series diagnostics over the daily / weekly order-count census:

- ``cox_stuart``        Cox & Stuart (1955) trend sign test: first-half
                        vs second-half pairing, z = (2S⁺ − m)/√m.
- ``pettitt_test``      Pettitt (1979) changepoint: U_t = t(n+1) −
                        Σ_{i≤t} R'_i with doubled mid-ranks — every
                        U_t an exact integer, K = max|U_t| pure
                        integer, NO double chain at all.
- ``ljung_box``         Ljung & Box (1978) portmanteau Q over lags
                        1..7 of the daily series: n-scaled deviations
                        e_i = n·x_i − S make every autocorrelation an
                        exact bigint ratio; Q one mirrored chain.

Exactness strategy: identical to ``hypotests`` — bounded/day-bounded
censuses folded exactly in integers on the driver, statistics read out
either pure-integer (mcnemar, pettitt) or as ONE fixed-order double
chain over integers each cast once per engine (the ``spearman_rho`` /
``cochran_armitage`` precedent: a single bigint→double cast is
correctly rounded on both engines).

Scale shapes: all map-only passes with constant-size partials; at
100 TB the driver fold stays a few KB per block and every finish is
O(cells) / O(days) constant work.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import relational as _rel
from .relational import _read
from .hypotests import _FLAGS, _e6_signed, _flag_qty_census, _med2

_US_PER_DAY = 86_400_000_000


def _ols_e6(p: int, d: int) -> int:
    """Lazy proxy for patterns._ols_e6 (the shared half-away e6
    integer division) — lazy for the same worker-unpickle
    circular-import reason as measures.py / graphstats.py."""
    from .patterns import _ols_e6 as _f

    return _f(p, d)


# =====================================================================
# mood_median — k-sample median test over the returnflag census
# =====================================================================


def q_mood_median(sf_dir: str):
    """Mood's median test (Mood 1950; Brown & Mood 1951) of whether
    the three returnflag groups share a common l_quantity median:
    classify each row above/below the pooled grand median (2x ≷ m2
    exact via the ``_med2`` mid-pair sum; rows AT the median are
    dropped — the ``runs_test`` tie rule), pivot into the 2 × 3
    integer table, and read out Pearson χ² as ONE fixed-order double
    chain (groups in (A, N, R) order, above-term then below-term;
    every E = row·col/N is a ratio of < 2⁵³ integers).  Output: one
    row ``(a_a, a_n, a_r, b_a, b_n, b_r, chi2_e6)``.  Zero keyed
    exchange (census fold shared with anova_f)."""
    cells = _flag_qty_census(sf_dir)
    marg: dict[int, int] = {}
    for (_, x), m in cells.items():
        marg[x] = marg.get(x, 0) + m
    m2 = _med2(marg)
    above = {f: 0 for f in _FLAGS}
    below = {f: 0 for f in _FLAGS}
    for (f, x), m in cells.items():
        if 2 * x > m2:
            above[f] += m
        elif 2 * x < m2:
            below[f] += m
    ta = sum(above.values())
    tb = sum(below.values())
    nt = ta + tb
    chi = 0.0
    # fixed-order chain mirrored op-for-op in SQL_MOOD_MEDIAN
    for f in _FLAGS:
        ng = above[f] + below[f]
        ea = float(ta) * float(ng) / float(nt)
        eb = float(tb) * float(ng) / float(nt)
        chi += (float(above[f]) - ea) * (float(above[f]) - ea) / ea
        chi += (float(below[f]) - eb) * (float(below[f]) - eb) / eb
    return pa.table(
        {
            "a_a": pa.array([above["A"]], pa.int64()),
            "a_n": pa.array([above["N"]], pa.int64()),
            "a_r": pa.array([above["R"]], pa.int64()),
            "b_a": pa.array([below["A"]], pa.int64()),
            "b_n": pa.array([below["N"]], pa.int64()),
            "b_r": pa.array([below["R"]], pa.int64()),
            "chi2_e6": pa.array([_e6_signed(chi)], pa.int64()),
        }
    )


SQL_MOOD_MEDIAN = """
WITH c AS (
  SELECT l_returnflag AS f, cast(round(l_quantity) AS BIGINT) AS x,
         cast(count(*) AS BIGINT) AS m
  FROM lineitem GROUP BY 1, 2),
marg AS (SELECT x AS v, cast(sum(m) AS BIGINT) AS mm FROM c GROUP BY x),
cum AS (SELECT v, sum(mm) OVER (ORDER BY v) AS cm,
               sum(mm) OVER () AS nt
        FROM marg),
med AS (SELECT min(CASE WHEN cm >= (nt + 1) // 2 THEN v END)
               + min(CASE WHEN cm >= nt // 2 + 1 THEN v END) AS m2
        FROM cum),
p AS (SELECT
  sum(CASE WHEN f = 'A' AND 2 * x > m2 THEN m ELSE 0 END) AS aa,
  sum(CASE WHEN f = 'N' AND 2 * x > m2 THEN m ELSE 0 END) AS an,
  sum(CASE WHEN f = 'R' AND 2 * x > m2 THEN m ELSE 0 END) AS ar,
  sum(CASE WHEN f = 'A' AND 2 * x < m2 THEN m ELSE 0 END) AS ba,
  sum(CASE WHEN f = 'N' AND 2 * x < m2 THEN m ELSE 0 END) AS bn,
  sum(CASE WHEN f = 'R' AND 2 * x < m2 THEN m ELSE 0 END) AS br
  FROM c, med),
t AS (SELECT aa, an, ar, ba, bn, br,
             aa + an + ar AS ta, ba + bn + br AS tb,
             aa + an + ar + ba + bn + br AS nt
      FROM p),
z AS (SELECT aa, an, ar, ba, bn, br,
  (aa::DOUBLE - ta::DOUBLE * (aa + ba)::DOUBLE / nt::DOUBLE)
    * (aa::DOUBLE - ta::DOUBLE * (aa + ba)::DOUBLE / nt::DOUBLE)
    / (ta::DOUBLE * (aa + ba)::DOUBLE / nt::DOUBLE)
  + (ba::DOUBLE - tb::DOUBLE * (aa + ba)::DOUBLE / nt::DOUBLE)
    * (ba::DOUBLE - tb::DOUBLE * (aa + ba)::DOUBLE / nt::DOUBLE)
    / (tb::DOUBLE * (aa + ba)::DOUBLE / nt::DOUBLE)
  + (an::DOUBLE - ta::DOUBLE * (an + bn)::DOUBLE / nt::DOUBLE)
    * (an::DOUBLE - ta::DOUBLE * (an + bn)::DOUBLE / nt::DOUBLE)
    / (ta::DOUBLE * (an + bn)::DOUBLE / nt::DOUBLE)
  + (bn::DOUBLE - tb::DOUBLE * (an + bn)::DOUBLE / nt::DOUBLE)
    * (bn::DOUBLE - tb::DOUBLE * (an + bn)::DOUBLE / nt::DOUBLE)
    / (tb::DOUBLE * (an + bn)::DOUBLE / nt::DOUBLE)
  + (ar::DOUBLE - ta::DOUBLE * (ar + br)::DOUBLE / nt::DOUBLE)
    * (ar::DOUBLE - ta::DOUBLE * (ar + br)::DOUBLE / nt::DOUBLE)
    / (ta::DOUBLE * (ar + br)::DOUBLE / nt::DOUBLE)
  + (br::DOUBLE - tb::DOUBLE * (ar + br)::DOUBLE / nt::DOUBLE)
    * (br::DOUBLE - tb::DOUBLE * (ar + br)::DOUBLE / nt::DOUBLE)
    / (tb::DOUBLE * (ar + br)::DOUBLE / nt::DOUBLE) AS chi
  FROM t)
SELECT cast(aa AS BIGINT) AS a_a, cast(an AS BIGINT) AS a_n,
       cast(ar AS BIGINT) AS a_r, cast(ba AS BIGINT) AS b_a,
       cast(bn AS BIGINT) AS b_n, cast(br AS BIGINT) AS b_r,
       cast(CASE WHEN chi >= 0 THEN floor(abs(chi) * 1e6 + 0.5)
                 ELSE -floor(abs(chi) * 1e6 + 0.5) END AS BIGINT) AS chi2_e6
FROM z
"""


# =====================================================================
# mcnemar_test — paired binary predictors over documents
# =====================================================================

_MCN_LEN = 300  #: predictor A: char length ≥ 300 (near the corpus median)
_MCN_SPACES = 55  #: predictor B: space count ≥ 55 (median space count)


def q_mcnemar_test(sf_dir: str):
    """McNemar's test (McNemar 1947; Edwards 1948 continuity form) of
    whether two deterministic document quality predictors — A:
    char-length ≥ 300, B: space-count ≥ 55 — disagree symmetrically:
    with b = #(A ∧ ¬B) and c = #(¬A ∧ B),
    χ² = (max(|b−c|−1, 0))² / (b+c) is a PURE integer rational read
    out via the shared half-away e6 division (no double anywhere).
    Output: one row ``(n_docs, b_cell, c_cell, chi2_e6)``.  Zero
    keyed exchange (4-cell census fold)."""
    ds = _read(sf_dir, "documents", ["text"])

    def _partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column("text"), "")
        ln = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        sp = pc.count_substring(txt, " ").to_numpy(zero_copy_only=False)
        a = ln >= _MCN_LEN
        bb = sp >= _MCN_SPACES
        return pa.table(
            {
                "n": pa.array([len(ln)], pa.int64()),
                "b": pa.array([int(np.sum(a & ~bb))], pa.int64()),
                "c": pa.array([int(np.sum(~a & bb))], pa.int64()),
            }
        )

    n = b = c = 0
    for t in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        n += sum(t.column("n").to_pylist())
        b += sum(t.column("b").to_pylist())
        c += sum(t.column("c").to_pylist())
    num = max(abs(b - c) - 1, 0) ** 2
    chi2_e6 = _ols_e6(num, b + c) if (b + c) > 0 else 0
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "b_cell": pa.array([b], pa.int64()),
            "c_cell": pa.array([c], pa.int64()),
            "chi2_e6": pa.array([chi2_e6], pa.int64()),
        }
    )


SQL_MCNEMAR = """
WITH f AS (
  SELECT length(coalesce(text, '')) >= 300 AS a,
         (length(coalesce(text, ''))
          - length(replace(coalesce(text, ''), ' ', ''))) >= 55 AS b
  FROM documents),
p AS (SELECT cast(count(*) AS BIGINT) AS n,
             cast(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                  AS BIGINT) AS bb,
             cast(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
                  AS BIGINT) AS cc
      FROM f)
SELECT n AS n_docs, bb AS b_cell, cc AS c_cell,
       CASE WHEN bb + cc = 0 THEN 0
            ELSE (2000000 * greatest(abs(bb - cc) - 1, 0)
                          * greatest(abs(bb - cc) - 1, 0)
                  + (bb + cc)) // (2 * (bb + cc))
       END AS chi2_e6
FROM p
"""


# =====================================================================
# cox_stuart — first-half / second-half trend sign test
# =====================================================================


def q_cox_stuart(sf_dir: str):
    """Cox–Stuart trend test (Cox & Stuart 1955) of the daily
    order-count series: pair day i with day i + (n − ⌊n/2⌋) (the
    middle day is dropped when n is odd — the textbook pairing),
    count S⁺ = #(later > earlier) over the m non-tied pairs, and read
    out z = (2S⁺ − m)/√m — one mirrored fixed-order chain over exact
    integers.  Output: one row ``(n_days, n_pairs, n_pos, z_e6)``.
    Zero keyed exchange (day-census fold; O(days) driver pairing)."""
    from .measures import _day_census

    census = _day_census(sf_dir)
    days = sorted(census)
    cvals = [census[d] for d in days]
    n = len(cvals)
    h = n // 2
    off = n - h
    pos = neg = 0
    for i in range(h):
        if cvals[i + off] > cvals[i]:
            pos += 1
        elif cvals[i + off] < cvals[i]:
            neg += 1
    m = pos + neg
    z = (2.0 * float(pos) - float(m)) / math.sqrt(float(m))
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "n_pairs": pa.array([m], pa.int64()),
            "n_pos": pa.array([pos], pa.int64()),
            "z_e6": pa.array([_e6_signed(z)], pa.int64()),
        }
    )


SQL_COX_STUART = """
WITH c AS (
  SELECT datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS d,
         cast(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1),
r AS (SELECT n, row_number() OVER (ORDER BY d) AS rn,
             count(*) OVER () AS nt
      FROM c),
pr AS (SELECT a.n AS x, b.n AS y
       FROM r a JOIN r b
         ON b.rn = a.rn + (a.nt - a.nt // 2)
       WHERE a.rn <= a.nt // 2),
agg AS (SELECT (SELECT max(nt) FROM r) AS n_days,
               cast(sum(CASE WHEN y > x THEN 1 ELSE 0 END)
                    + sum(CASE WHEN y < x THEN 1 ELSE 0 END)
                    AS BIGINT) AS m,
               cast(sum(CASE WHEN y > x THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM pr),
z AS (SELECT n_days, m, pos,
             (2.0 * pos::DOUBLE - m::DOUBLE) / sqrt(m::DOUBLE) AS zz
      FROM agg)
SELECT cast(n_days AS BIGINT) AS n_days, m AS n_pairs, pos AS n_pos,
       cast(CASE WHEN zz >= 0 THEN floor(abs(zz) * 1e6 + 0.5)
                 ELSE -floor(abs(zz) * 1e6 + 0.5) END AS BIGINT) AS z_e6
FROM z
"""


QUERIES = {
    "mood_median": q_mood_median,
    "mcnemar_test": q_mcnemar_test,
    "cox_stuart": q_cox_stuart,
}

ORACLE_SQL = {
    "mood_median": SQL_MOOD_MEDIAN,
    "mcnemar_test": SQL_MCNEMAR,
    "cox_stuart": SQL_COX_STUART,
}

# self-register (same pattern and import-cycle note as analytics.py)
_rel.QUERIES.update(QUERIES)
_rel.ORACLE_SQL.update(ORACLE_SQL)
