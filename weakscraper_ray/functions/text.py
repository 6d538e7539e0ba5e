"""Text-analysis batch functions over a ``text`` column.

All are vectorized (pyarrow.compute / numpy) map_batches bodies; the
stateful ones (compiled regexes, stopword tables) are callable classes
so the setup runs once per actor.

Operators: token counting (whitespace + BPE-ish word/punct regex),
document fingerprinting (md5 + 64-bit rolling hash), language ID
(stopword n-gram heuristic), quality scoring (length/punct/stopword
ratios) — the text family the 100 TB pipeline needs beyond the
reference's extraction surface.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens): whitespace-delimited token count, Arrow kernel."""
    n = pc.count_substring_regex(batch.column("text"), r"\S+")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(n, pa.int64()),
        }
    )


#: BPE-ish subword pieces: words, numbers, single punct — the classic
#: GPT-2-style pretokenizer shape, public regex idiom
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def subword_count_batch(batch: pa.Table) -> pa.Table:
    n = pc.count_substring_regex(batch.column("text"), _BPE_RE)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "n_subwords": pc.cast(n, pa.int64())}
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fp): md5 hex of the raw text (DuckDB-oracle-friendly)."""
    fps = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
        for t in batch.column("text").to_pylist()
    ]
    return pa.table({"doc_id": batch.column("doc_id"), "fp": pa.array(fps)})


#: polynomial-hash base, modulus 2^64 (uint64 wraparound IS the mod)
_ROLL_BASE = 1_000_003

_ROLL_WINDOW = 16
#: BASE^(window-1-t) mod 2^64 for t in [0, window) — position weights
_ROLL_POWS = np.array(
    [pow(_ROLL_BASE, _ROLL_WINDOW - 1 - t, 1 << 64) for t in range(_ROLL_WINDOW)],
    dtype=np.uint64,
)


def rolling_fingerprint_batch(batch: pa.Table, window: int = _ROLL_WINDOW) -> pa.Table:
    """(doc_id, min_rolling_hash): min of rolling polynomial hashes over
    byte windows — a winnowing-style content fingerprint robust to
    appends (public Rabin-Karp/winnowing idiom).

    Vectorized per document: one ``sliding_window_view`` × power-vector
    multiply-accumulate in uint64 (wraparound == arithmetic mod 2^64),
    then a single ``min``. Equivalent to the interpreted rolling
    recurrence (oracles._rolling_ref) because both evaluate the same
    degree-(window-1) polynomial in the 2^64 ring.
    """
    if window == _ROLL_WINDOW:
        pows = _ROLL_POWS
    else:
        pows = np.array(
            [pow(_ROLL_BASE, window - 1 - t, 1 << 64) for t in range(window)],
            dtype=np.uint64,
        )
    out = np.zeros(len(batch), dtype=np.uint64)
    texts = batch.column("text").to_pylist()
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            if len(data) < window:
                h = np.uint64(0)
                base = np.uint64(_ROLL_BASE)
                for b in data:  # < 16 bytes: negligible
                    h = h * base + np.uint64(b)
                out[i] = h
                continue
            win = np.lib.stride_tricks.sliding_window_view(data, window)
            hashes = (win.astype(np.uint64) * pows).sum(axis=1, dtype=np.uint64)
            out[i] = hashes.min()
    return pa.table({"doc_id": batch.column("doc_id"), "min_rolling_hash": out})


def chunk_batch(batch: pa.Table, window: int = 50, stride: int = 40) -> pa.Table:
    """Document chunking (flat-map: 1 doc → N overlapping chunks):
    fixed word windows with overlap ``window - stride`` — the training
    pipeline shape for embedding/pretraining corpus prep. Chunk count
    per doc = ceil(n_words / stride); trailing chunks may be short.
    Emits (doc_id, chunk_idx, chunk_text, n_words)."""
    doc_ids, idxs, chunks, sizes = [], [], [], []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        words = (text or "").split()
        for i, s in enumerate(range(0, max(len(words), 1), stride)):
            piece = words[s : s + window]
            doc_ids.append(doc_id)
            idxs.append(i)
            chunks.append(" ".join(piece))
            sizes.append(len(piece))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "chunk_text": pa.array(chunks, pa.string()),
            "n_words": pa.array(sizes, pa.int64()),
        }
    )


class LangId:
    """Stopword/char-n-gram language heuristic; tables built per actor.

    Pure-heuristic (no model libs in the container); deterministic.
    """

    STOPWORDS = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
        "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
        "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans"},
        "es": {"el", "la", "los", "las", "es", "un", "una", "para", "por"},
    }

    def __init__(self):
        self.word_re = re.compile(r"[A-Za-z]+")
        self.cjk_re = re.compile(r"[一-鿿]")

    def _predict(self, text: str) -> str:
        if text is None:
            return "und"
        if self.cjk_re.search(text):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und"
        ws = set(words)
        scores = {
            lang: len(ws & sw) for lang, sw in self.STOPWORDS.items()
        }
        best = max(sorted(scores), key=lambda k: scores[k])
        return best if scores[best] > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._predict(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds)}
        )


class QualityScore:
    """Length / punctuation / stopword-ratio quality features + a single
    [0,1] score (public C4/Gopher-style heuristic shape), vectorized
    with Arrow kernels; regexes compiled once per actor.

    Raw counts are emitted as integers and the score as a scaled
    integer (``floor(x*1e6 + 0.5)``) so the DuckDB oracle — which
    mirrors every double-precision operation in the same order — hashes
    identically (IEEE ops on identical operands are bit-exact).
    """

    def __init__(self):
        self.stop = self.__class__._ALL_STOP

    _ALL_STOP = frozenset().union(*LangId.STOPWORDS.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        n_punct = pc.cast(pc.count_substring_regex(text, r"[^\w\s]"), pa.int64())
        n_alpha_words = pc.cast(
            pc.count_substring_regex(text, r"[A-Za-z]{2,}"), pa.int64()
        )
        # stopword count needs exact-token membership (regex \b would
        # also hit punctuation-adjacent words); one tokenize per row
        n_stop = np.fromiter(
            (
                sum(1 for w in t.lower().split() if w in self.stop) if t else 0
                for t in text.to_pylist()
            ),
            dtype=np.int64,
            count=len(batch),
        )
        nt = np.maximum(n_tokens.to_numpy(zero_copy_only=False), 1)
        nc = np.maximum(n_chars.to_numpy(zero_copy_only=False), 1)
        punct_ratio = n_punct.to_numpy(zero_copy_only=False) / nc
        alpha_ratio = n_alpha_words.to_numpy(zero_copy_only=False) / nt
        stop_ratio = n_stop / nt
        score = (
            np.clip(nt / 50.0, 0, 1) * 0.3
            + np.clip(alpha_ratio, 0, 1) * 0.3
            + (1.0 - np.clip(punct_ratio * 5, 0, 1)) * 0.2
            + np.clip(stop_ratio * 4, 0, 1) * 0.2
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_punct": n_punct,
                "n_alpha_words": n_alpha_words,
                "n_stop": pa.array(n_stop, pa.int64()),
                "quality_score_e6": pa.array(
                    np.floor(score * 1_000_000 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )


def compression_signal_batch(batch: pa.Table) -> pa.Table:
    """Per-document compressibility signal: utf-8 byte length and its
    zlib(level=6) compressed length, as exact integers (ratio derivable
    downstream; emitting bytes instead of a float ratio keeps the
    oracle comparison rounding-free).

    The published quality rules this feeds (Gopher / FineWeb
    repetition filters) drop documents whose compressed size is far
    below raw size — boilerplate-heavy or looping text compresses
    unusually well.  zlib has no Arrow kernel, so the per-row loop is
    inherent (same caveat as the md5 fingerprint: do not copy this
    shape into hotter stages); level is pinned for determinism.
    """
    import zlib

    raw, comp = [], []
    for t in batch.column("text").to_pylist():
        b = (t or "").encode("utf-8")
        raw.append(len(b))
        comp.append(len(zlib.compress(b, 6)))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "raw_bytes": pa.array(raw, pa.int64()),
            "zlib_bytes": pa.array(comp, pa.int64()),
        }
    )
