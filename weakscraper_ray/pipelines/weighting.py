"""Round-3 continuation #13: term-weighting / sampling family — two
curation primitives, each a ``queries()`` entry with a DuckDB oracle:

- ``tfidf_topterms``     per-document top-3 TF-IDF terms (the keyword
                         extraction / doc-representation pass; BM25's
                         unsaturated ancestor, kept integer-exact)
- ``stratified_sample``  deterministic per-language downsampling via
                         md5 thresholds (the corpus rebalancing move —
                         e.g. downweight the dominant language — with
                         the ``sample_hash`` determinism, per stratum)

Exactness: idf is e6-quantized once per TERM (smooth form
ln((N+1)/(df+1))), so the score tf·idf_e6 is a pure int64 product;
top-3 ties break (score desc, term asc) on both engines.  Sampling
keeps a doc iff ``md5_number_lower(printf('%d', doc_id)) % 1000 <
rate(lang)`` — hash-exact, no RNG, mirrored verbatim.

Scale shapes: the df table is vocabulary-bounded (per-batch DISTINCT
(doc, term) first), broadcast once via ``ray.put``; scoring + top-3
happen INSIDE the scoring map — a document never leaves its batch, so
there is no per-doc exchange at all.  Sampling is map-only."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .relational import _i64_away_np, _read

# NOTE: _doc_token_runs is imported lazily inside the batch fns —
# a module-level `from .mlprep import ...` deadlocks against
# relational's import tail when a worker unpickles these closures
# (mlprep is then mid-import and the name not yet bound).

_TFIDF_K = 3
#: per-mille keep rates per language: downsample dominant en 10x
_STRATA_RATES = {"en": 100, "de": 800, "es": 800, "fr": 800, "zh": 800}
_STRATA_DEFAULT = 500


def q_tfidf_topterms(sf_dir: str):
    """Top-3 TF-IDF terms per document (see module docstring).
    idf_e6(t) = qln6((N+1)/(df_t+1)); score = tf · idf_e6; ties
    (score desc, term asc)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def _df_partial(t: pa.Table) -> pa.Table:
        from .mlprep import _doc_token_runs

        ids, flat, doc_of = _doc_token_runs(t)
        df = pd.DataFrame({"d": doc_of, "term": flat}).drop_duplicates()
        vc = df.groupby("term", sort=False).size().reset_index(name="df")
        return pa.table(
            {
                "term": pa.array(vc["term"]),
                "df": pa.array(vc["df"].to_numpy(np.int64)),
            }
        )

    dfs = (
        ds.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()  # vocabulary-bounded
    )
    idf_e6 = _i64_away_np(
        np.log((n_docs + 1.0) / (dfs["df"].to_numpy(np.int64) + 1.0)), 1e6
    ).astype(np.int64)
    model_ref = ray.put(dict(zip(dfs["term"], idf_e6)))

    def _score(t: pa.Table) -> pa.Table:
        from .mlprep import _doc_token_runs

        idf = ray.get(model_ref)
        ids, flat, doc_of = _doc_token_runs(t)
        if len(flat) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "score_e6": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame({"d": doc_of, "term": flat})
        tf = df.groupby(["d", "term"], sort=False).size().reset_index(name="tf")
        tf["score"] = tf["tf"].to_numpy(np.int64) * tf["term"].map(
            idf
        ).to_numpy(np.int64)
        tf = tf.sort_values(
            ["d", "score", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        top = tf.groupby("d", sort=False).head(_TFIDF_K)
        return pa.table(
            {
                "doc_id": pa.array(
                    ids[top["d"].to_numpy(np.int64)].astype(np.int64)
                ),
                "term": pa.array(top["term"]),
                "score_e6": pa.array(top["score"].to_numpy(np.int64)),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")


SQL_TFIDF = rf"""
WITH l AS (
  SELECT doc_id,
         regexp_extract_all(regexp_replace(coalesce(text, ''),
                                           '^\s+|\s+$', '', 'g'),
                            '\S+') AS toks
  FROM documents),
n AS (SELECT cast(count(*) AS BIGINT) AS n FROM documents),
occ AS (SELECT doc_id, unnest(toks) AS term FROM l),
tf AS (SELECT doc_id, term, cast(count(*) AS BIGINT) AS tf
       FROM occ GROUP BY doc_id, term),
df AS (SELECT term, cast(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM occ GROUP BY term),
idf AS (SELECT term,
               cast(round(ln((n.n + 1.0) / (df.df + 1.0)) * 1000000, 0)
                    AS BIGINT) AS idf_e6
        FROM df, n),
sc AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf_e6 AS score_e6,
              row_number() OVER (PARTITION BY tf.doc_id
                                 ORDER BY tf.tf * idf.idf_e6 DESC, tf.term)
                  AS r
       FROM tf JOIN idf USING (term))
SELECT doc_id, term, score_e6 FROM sc WHERE r <= {_TFIDF_K}
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified downsample: keep a document iff
    ``md5_number_lower(printf('%d', doc_id)) % 1000 < rate(lang)``
    (en keeps 10%, other languages 80%) — the language-rebalancing
    pass of corpus curation, hash-exact and resume-stable (a re-run
    keeps the SAME documents).  Map-only; output (doc_id, lang)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def _keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        h = np.array(
            [
                int.from_bytes(
                    hashlib.md5(str(int(i)).encode()).digest()[8:], "little"
                )
                % 1000
                for i in ids
            ],
            dtype=np.int64,
        )
        rates = np.array(
            [_STRATA_RATES.get(l, _STRATA_DEFAULT) for l in langs],
            dtype=np.int64,
        )
        keep = h < rates
        return pa.table(
            {
                "doc_id": pa.array(ids[keep].astype(np.int64)),
                "lang": pa.array(langs[keep]),
            }
        )

    return ds.map_batches(_keep, batch_format="pyarrow")


def _rate_case_sql() -> str:
    whens = "\n".join(
        f"  WHEN lang = '{k}' THEN {v}" for k, v in sorted(_STRATA_RATES.items())
    )
    return f"CASE\n{whens}\n  ELSE {_STRATA_DEFAULT} END"


SQL_STRATIFIED = f"""
SELECT doc_id, lang
FROM documents
WHERE md5_number_lower(printf('%d', doc_id)) % 1000 < ({_rate_case_sql()})
"""


QUERIES = {
    "tfidf_topterms": q_tfidf_topterms,
    "stratified_sample": q_stratified_sample,
}

ORACLE_SQL = {
    "tfidf_topterms": SQL_TFIDF,
    "stratified_sample": SQL_STRATIFIED,
}

# self-register (same pattern as monitor.py)
from . import relational as _rel  # noqa: E402

_rel.QUERIES.update(QUERIES)
_rel.ORACLE_SQL.update(ORACLE_SQL)
