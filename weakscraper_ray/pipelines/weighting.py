"""Round-3 continuation #13: corpus-rebalancing sampler — a
``queries()`` entry with a DuckDB oracle:

- ``lang_rebalance``  deterministic per-language Bernoulli downsample
                      via md5 thresholds: keep a doc iff
                      ``md5_number_lower(printf('%d', doc_id)) % 1000 <
                      rate(lang)`` — the corpus-mixture move (downweight
                      the dominant language 10x) that complements
                      ``stratified_sample`` (curation.py:95), which
                      draws EXACTLY k per stratum; a Bernoulli rate
                      keeps the stratum's internal distribution and
                      scales with the stratum, a top-k cap does not.

Hash-exact (no RNG, resume-stable: a re-run keeps the SAME docs) and
map-only — zero exchanges; the rate table is a literal."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .relational import _read

#: per-mille keep rates per language: downsample dominant en 10x
_STRATA_RATES = {"en": 100, "de": 800, "es": 800, "fr": 800, "zh": 800}
_STRATA_DEFAULT = 500


def q_lang_rebalance(sf_dir: str):
    """Deterministic per-language Bernoulli downsample: keep a doc iff
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
    "lang_rebalance": q_lang_rebalance,
}

ORACLE_SQL = {
    "lang_rebalance": SQL_STRATIFIED,
}

# self-register (same pattern as monitor.py)
from . import relational as _rel  # noqa: E402

_rel.QUERIES.update(QUERIES)
_rel.ORACLE_SQL.update(ORACLE_SQL)
