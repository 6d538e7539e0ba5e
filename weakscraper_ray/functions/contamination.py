"""Test-set decontamination: flag corpus documents that share any
word n-gram with a benchmark / held-out set.

The op every pretraining-data pipeline runs before training: remove
(or down-weight) documents that leak evaluation data.  The standard
published recipe (GPT-3 appendix C / PaLM / Llama: 8–13-gram overlap
against each benchmark) reduces to exactly this primitive: tokenize,
shingle into n-grams, intersect against the benchmark's n-gram set.

Scale shape — deliberately asymmetric, matching the real workload:

- The **benchmark side is small by design assumption** (real eval sets
  are MB-scale against a 100 TB corpus).  Its distinct n-gram set is
  collected once (per-batch distinct → driver union, logged) and
  broadcast via ``ray.put`` — read once per worker process through a
  module-global cache, never re-shipped per batch.
- The **corpus side streams**: one ``map_batches`` pass, no shuffle,
  no materialization.  Per-document work is a set intersection against
  the broadcast set; memory is bounded by the benchmark, not the
  corpus.

Tokenization mirrors the MinHash shingle pipeline (``functions.dedup``)
so the DuckDB oracle can reproduce it op-for-op:
``(text or "").lower().split()`` ≡
``regexp_split_to_array(trim(lower(coalesce(text,''))), '\\s+')``.

Determinism: no RNG, no wall clock; the benchmark membership rule is a
content hash (md5 of the doc id), mirrored verbatim in SQL.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

#: n-gram width.  Published decontamination uses 8–13 words; the
#: synthetic test corpus has short documents, so the conformance
#: setting is 5 — the operator is width-agnostic.
DEFAULT_N = 5


def is_benchmark_doc(doc_id: object) -> bool:
    """Deterministic membership rule for the held-out set: first hex
    digit of ``md5(str(doc_id))`` == '0' (1/16 of docs).  Mirrored in
    SQL as ``substr(md5(cast(doc_id AS VARCHAR)), 1, 1) = '0'``."""
    return hashlib.md5(str(doc_id).encode()).hexdigest()[0] == "0"


def doc_ngrams(text: str | None, n: int = DEFAULT_N) -> set[str]:
    """Distinct word n-grams of a document (lowercased, whitespace
    tokenized — the MinHash tokenizer)."""
    w = (text or "").lower().split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def split_benchmark_batch(batch: pa.Table, keep_benchmark: bool,
                          id_column: str = "doc_id") -> pa.Table:
    """Filter a batch to the benchmark side (``keep_benchmark=True``)
    or the corpus side (``False``)."""
    keep = [
        is_benchmark_doc(d) == keep_benchmark
        for d in batch.column(id_column).to_pylist()
    ]
    return batch.filter(pa.array(keep))


def benchmark_grams_batch(batch: pa.Table, n: int = DEFAULT_N,
                          column: str = "text") -> pa.Table:
    """Per-batch distinct n-grams of the benchmark side — the
    pre-aggregation step before the driver union (each batch emits its
    grams once, so the driver sees |distinct grams per batch| rows, not
    |tokens|)."""
    grams: set[str] = set()
    for t in batch.column(column).to_pylist():
        grams |= doc_ngrams(t, n)
    return pa.table({"gram": pa.array(sorted(grams), pa.string())})


#: worker-persistent broadcast cache (same pattern as the MinHash
#: verify stage): the ray.put'd gram set is fetched once per worker
#: process, keyed by object-ref hex, NOT once per batch.
_GRAM_SETS: dict[str, frozenset[str]] = {}


def contamination_batch(batch: pa.Table, grams_ref=None, n: int = DEFAULT_N,
                        id_column: str = "doc_id",
                        column: str = "text") -> pa.Table:
    """Corpus-side streaming pass: emit ``(doc_id, n_overlap)`` for
    every document with >= 1 distinct n-gram present in the broadcast
    benchmark set."""
    import ray

    key = grams_ref.hex() if hasattr(grams_ref, "hex") else str(id(grams_ref))
    grams = _GRAM_SETS.get(key)
    if grams is None:
        _GRAM_SETS.clear()
        obj = ray.get(grams_ref) if hasattr(grams_ref, "hex") else grams_ref
        grams = _GRAM_SETS[key] = frozenset(obj)

    ids, overlaps = [], []
    texts = batch.column(column).to_pylist()
    for d, t in zip(batch.column(id_column).to_pylist(), texts):
        hits = len(doc_ngrams(t, n) & grams)
        if hits:
            ids.append(d)
            overlaps.append(hits)
    return pa.table(
        {
            id_column: pa.array(ids, batch.column(id_column).type),
            "n_overlap": pa.array(overlaps, pa.int64()),
        }
    )
