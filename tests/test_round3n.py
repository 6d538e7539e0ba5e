"""Continuation-#15b contracts: the hashing-trick feature sketch's
batch function is row-local (splitting a batch never changes a row's
read-out) and matches an interpreted per-token twin."""

import hashlib

import pyarrow as pa


def _twin_row(text: str, B: int):
    """Interpreted hashing-trick read-out: one dict per document."""
    v = [0] * B
    for t in (text or "").lower().split():
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")
        b = h % B
        s = 1 if ((h >> 8) & 1) == 0 else -1
        v[b] += s
    return {
        "nnz": sum(1 for x in v if x != 0),
        "l1": sum(abs(x) for x in v),
        "l2sq": sum(x * x for x in v),
        "sketch_dot": sum(x * (i + 1) for i, x in enumerate(v)),
    }


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "alpha beta alpha beta alpha GAMMA gamma",
    "",
    "   ",
    "one",
    "repeat repeat repeat repeat",
    "Mixed CASE Tokens mixed case tokens",
    None,
]


def _table(texts, start=0):
    return pa.table(
        {
            "doc_id": pa.array(
                list(range(start, start + len(texts))), pa.int64()
            ),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_fh_batch_matches_interpreted_twin():
    from weakscraper_ray.pipelines.features import _FH_B, _fh_batch

    out = _fh_batch(_table(TEXTS)).to_pydict()
    got = {
        out["doc_id"][i]: {
            k: out[k][i] for k in ("nnz", "l1", "l2sq", "sketch_dot")
        }
        for i in range(len(out["doc_id"]))
    }
    for i, txt in enumerate(TEXTS):
        want = _twin_row(txt, _FH_B)
        if want["nnz"] == 0:
            # all-whitespace / empty / NULL docs emit no row (the SQL
            # twin's WHERE t <> '' drops them too)
            assert i not in got
        else:
            assert got[i] == want, (i, txt)


def test_fh_batch_is_row_local_under_splits():
    """concat(_fh_batch(part) for parts) == _fh_batch(whole) — the
    map-only / zero-exchange claim in the module docstring."""
    from weakscraper_ray.pipelines.features import _fh_batch

    whole = _fh_batch(_table(TEXTS)).sort_by("doc_id").to_pydict()
    parts = pa.concat_tables(
        [
            _fh_batch(_table(TEXTS[:3], start=0)),
            _fh_batch(_table(TEXTS[3:6], start=3)),
            _fh_batch(_table(TEXTS[6:], start=6)),
        ]
    ).sort_by("doc_id").to_pydict()
    assert whole == parts
