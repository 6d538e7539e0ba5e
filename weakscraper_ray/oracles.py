"""Pure-Python expected-twin builders for the driver's DuckDB oracle.

The extraction-family queries (template extract, learned extract,
heuristic extract, rolling fingerprint, stubbed multimodal / PDF
stages) are not SQL-expressible, but they ARE deterministic. For each
one this module computes the expected result with an INDEPENDENT,
single-threaded pure-Python implementation (the same role the
reference library's own fixture tests play — SURVEY.md §5.1) and
writes it to a parquet "twin". The driver's oracle SQL is then just
``SELECT ... FROM read_parquet('<twin>')``, which upgrades these
queries from the weak rows-only check to the full
rows+schema+value-hash gate.

What makes each twin a real oracle rather than a tautology:

- ``transcripts`` twin: written by the generator at render time from
  the KNOWN template fills (weakscraper_ray/transcripts.py) — the Ray
  pipeline must reproduce it through parse→match→extract.
- ``learned``/``heuristic`` twins: recompute the whole pipeline
  single-threaded with plain loops — no Ray, no batching, no actor
  pools — so they verify the distributed plumbing (routing, ordering,
  batch boundaries) against straight-line execution.
- ``rolling`` twin: an interpreted byte-at-a-time Rabin-Karp loop,
  independent of the engine's vectorized sliding-window matmul.
- ``simhash`` twin: only the per-doc signatures (shared math); the
  banding/pairing logic the engine distributes is re-derived by the
  SQL itself (cross join + bit_count(xor(...))).

Twins are cached under ``/tmp/ws_oracle`` keyed by an explicit
version tag — bump the tag when the engine semantics change.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ORACLE_ROOT = "/tmp/ws_oracle"

_M64 = 1 << 64


def _cached(name: str, version: str, build) -> str:
    """Build-once parquet twin; returns the absolute path."""
    os.makedirs(ORACLE_ROOT, exist_ok=True)
    path = os.path.join(ORACLE_ROOT, f"{name}-{version}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(build(), tmp)
        os.replace(tmp, path)
    return path


# ------------------------------------------------------------ textrank

def textrank_twin(sf_dir: str, version: str = "v1") -> str:
    """Independent single-threaded TextRank (Mihalcea & Tarau 2004)
    per document: dict-based adjacency and plain Python loops (the Ray
    path vectorizes each doc's iteration with numpy index arrays).
    Integer-exact spec shared by both sides: lowercase whitespace
    tokens; UNDIRECTED deduped adjacent-pair edges (self-pairs
    dropped); MASS = 1e12, r0 = MASS // n, TELE = 15·MASS // (100·n);
    10 iterations of r'_i = TELE + Σ_{j∈N(i)} (85·r_j) // (100·deg_j)
    with PER-TERM floor division; top-3 by (score DESC, term ASC)."""
    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        out_doc, out_rank, out_term, out_score = [], [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = [w for w in (text or "").lower().split() if w]
            if not toks:
                continue
            nodes = sorted(set(toks))
            nbr: dict[str, set] = {w: set() for w in nodes}
            for a, b in zip(toks, toks[1:]):
                if a != b:
                    nbr[a].add(b)
                    nbr[b].add(a)
            n = len(nodes)
            mass = 10**12
            tele = (15 * mass) // (100 * n)
            r = {w: mass // n for w in nodes}
            for _ in range(10):
                nr = {}
                for w in nodes:
                    acc = tele
                    for j in nbr[w]:
                        acc += (85 * r[j]) // (100 * len(nbr[j]))
                    nr[w] = acc
                r = nr
            top = sorted(nodes, key=lambda w: (-r[w], w))[:3]
            for rk, w in enumerate(top, 1):
                out_doc.append(doc_id)
                out_rank.append(rk)
                out_term.append(w)
                out_score.append(r[w])
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "rank": pa.array(out_rank, pa.int64()),
                "term": pa.array(out_term, pa.string()),
                "score_e12": pa.array(out_score, pa.int64()),
            }
        )

    return _cached(f"textrank-{tag}", version, build)


# ------------------------------------------------------------ transcripts

def transcripts_twin(size: str) -> str:
    """The generator's expected.parquet (computed at render time from
    the known template fills — weakscraper_ray/transcripts.py)."""
    from .transcripts import ensure_generated

    return os.path.join(ensure_generated(size), "expected.parquet")


def _read_transcript_rows(size: str) -> pa.Table:
    import glob

    from .transcripts import ensure_generated

    d = ensure_generated(size)
    shards = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
    return pa.concat_tables([pq.read_table(s) for s in shards])


def _is_html(text: str) -> bool:
    return text is not None and "<" in text and ">" in text


# ---------------------------------------------------------- learned twin

LEARNED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("template_id", pa.int32()),
        ("status", pa.string()),
        ("error_kind", pa.string()),
        ("extracted_text", pa.string()),
        ("fields", pa.large_string()),
    ]
)


def learn_reference_templates(size: str, k: int = 5) -> dict[int, str]:
    """Single-threaded mirror of pipelines.learning.learn_templates:
    per template_id, the k rows with smallest (conv_id, turn_idx),
    pages sorted by text, learned with the pure-Python learner."""
    from .learner import learn

    t = _read_transcript_rows(size)
    rows = [
        r for r in t.select(["conv_id", "turn_idx", "template_id", "text"]).to_pylist()
        if r["template_id"] >= 0
    ]
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    by_tid: dict[int, list[str]] = {}
    for r in rows:
        lst = by_tid.setdefault(int(r["template_id"]), [])
        if len(lst) < k:
            lst.append(r["text"])
    return {tid: learn(sorted(pages)[:k]) for tid, pages in sorted(by_tid.items())}


def learned_twin(size: str = "tiny", k: int = 5, version: str = "v1") -> str:
    def build() -> pa.Table:
        from .exceptions import TemplateMismatch
        from .template import Template

        compiled = {
            tid: Template(src)
            for tid, src in learn_reference_templates(size, k).items()
        }
        out = []
        for r in _read_transcript_rows(size).to_pylist():
            tid = int(r["template_id"])
            text = r["text"]
            if not _is_html(text):
                out.append(
                    dict(conv_id=r["conv_id"], turn_idx=r["turn_idx"],
                         template_id=-1, status="skipped", error_kind="not_html",
                         extracted_text="", fields="{}")
                )
                continue
            try:
                m = compiled[tid].match(text)
                out.append(
                    dict(conv_id=r["conv_id"], turn_idx=r["turn_idx"],
                         template_id=tid, status="ok", error_kind="",
                         extracted_text=m.extracted_text,
                         fields=json.dumps(m.fields, sort_keys=True))
                )
            except TemplateMismatch as e:
                out.append(
                    dict(conv_id=r["conv_id"], turn_idx=r["turn_idx"],
                         template_id=tid, status="error", error_kind=e.kind,
                         extracted_text="", fields="{}")
                )
        return pa.Table.from_pylist(out, schema=LEARNED_SCHEMA)

    return _cached(f"learned-{size}-k{k}", version, build)


# --------------------------------------------------------- heuristic twin

HEURISTIC_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("error_kind", pa.string()),
        ("extracted_text", pa.string()),
        ("boilerplate_bytes_stripped", pa.int64()),
    ]
)


def heuristic_twin(size: str = "small", version: str = "v1") -> str:
    """Rows where the routed template mismatches AND the text-density
    heuristic recovers non-empty main content (mirrors
    Extractor._extract_one with heuristic_fallback=True, status ==
    'heuristic')."""

    def build() -> pa.Table:
        from .exceptions import TemplateMismatch
        from .heuristic import extract_main_content
        from .template import Template
        from .transcripts import TEMPLATES

        compiled = [Template(t) for t in TEMPLATES]
        out = []
        for r in _read_transcript_rows(size).to_pylist():
            tid = int(r["template_id"])
            text = r["text"]
            if tid < 0 or not _is_html(text):
                continue
            try:
                compiled[tid].match(text)
                continue  # template matched: no fallback
            except TemplateMismatch as e:
                kind = e.kind
            extracted, boiler = extract_main_content(text)
            if not extracted:
                continue  # stays status="error"
            out.append(
                dict(conv_id=r["conv_id"], turn_idx=r["turn_idx"],
                     error_kind=kind, extracted_text=extracted,
                     boilerplate_bytes_stripped=boiler)
            )
        return pa.Table.from_pylist(out, schema=HEURISTIC_SCHEMA)

    return _cached(f"heuristic-{size}", version, build)


AGREEMENT_SCHEMA = pa.schema(
    [
        ("template_id", pa.int64()),
        ("n_turns", pa.int64()),
        ("n_equal", pa.int64()),
        ("n_contained", pa.int64()),
        ("template_chars", pa.int64()),
        ("heuristic_chars", pa.int64()),
    ]
)


def extract_agreement_twin(size: str = "small", version: str = "v1") -> str:
    """Per-template agreement between the TEMPLATE extraction and the
    text-density HEURISTIC on the turns where the routed template
    matches: the audit that says how much the fallback would lose
    before you trust it on unroutable pages.  Single-threaded plain
    loop (no Ray, no batching) — the Ray path must reproduce it
    through the actor pool + partial-aggregate exchange."""

    def build() -> pa.Table:
        from .exceptions import TemplateMismatch
        from .heuristic import extract_main_content
        from .template import Template
        from .transcripts import TEMPLATES

        compiled = [Template(t) for t in TEMPLATES]
        agg: dict[int, list[int]] = {}
        for r in _read_transcript_rows(size).to_pylist():
            tid = int(r["template_id"])
            text = r["text"]
            if tid < 0 or not _is_html(text):
                continue
            try:
                m = compiled[tid].match(text)
            except TemplateMismatch:
                continue  # only matched turns are comparable
            t_text = m.extracted_text
            h_text, _ = extract_main_content(text)
            a = agg.setdefault(tid, [0, 0, 0, 0, 0])
            a[0] += 1
            a[1] += int(t_text == h_text)
            a[2] += int(t_text in h_text)
            a[3] += len(t_text)
            a[4] += len(h_text)
        rows = [
            dict(template_id=tid, n_turns=v[0], n_equal=v[1],
                 n_contained=v[2], template_chars=v[3],
                 heuristic_chars=v[4])
            for tid, v in sorted(agg.items())
        ]
        return pa.Table.from_pylist(rows, schema=AGREEMENT_SCHEMA)

    return _cached(f"agreement-{size}", version, build)


# ------------------------------------------------- rolling fingerprint twin

def _rolling_ref(data: bytes, window: int, base: int) -> int:
    """Interpreted Rabin-Karp reference (mod 2^64), independent of the
    engine's vectorized sliding-window implementation."""
    if len(data) < window:
        h = 0
        for b in data:
            h = (h * base + b) % _M64
        return h
    h = 0
    for b in data[:window]:
        h = (h * base + b) % _M64
    best = h
    pow_w = pow(base, window - 1, _M64)
    for j in range(window, len(data)):
        h = ((h - data[j - window] * pow_w) * base + data[j]) % _M64
        if h < best:
            best = h
    return best


def rolling_twin(sf_dir: str, window: int = 16, version: str = "v2") -> str:
    from .functions.text import _ROLL_BASE

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        hashes = [
            _rolling_ref((x or "").encode("utf-8"), window, _ROLL_BASE)
            for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "min_rolling_hash": pa.array(hashes, pa.uint64()),
            }
        )

    return _cached(f"rolling-{tag}-w{window}", version, build)


# ------------------------------------------------------ simhash signature twin

def simhash_twin(sf_dir: str, version: str = "v1") -> str:
    """Per-doc 64-bit SimHash signatures as signed BIGINT. Only the
    signature math is shared with the engine; the SQL re-derives all
    pairs with bit_count(xor(...)) — independently of the engine's
    banded LSH candidate generation."""
    from .functions.dedup import SimHasher

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        sh = SimHasher()
        sigs = np.array(
            [sh.signature(x) for x in t.column("text").to_pylist()], dtype=np.uint64
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sig": pa.array(sigs.view(np.int64), pa.int64()),
            }
        )

    return _cached(f"simhash-{tag}", version, build)


# ------------------------------------------------ text-embedding twin

def embeddings_twin(sf_dir: str, dim: int = 64, version: str = "v1") -> str:
    """Per-doc embeddings from the stub-contract TextEncoder, computed
    SINGLE-THREADED one document at a time (no batching, no actors).
    Only the encoder math is shared; the knn SQL over this twin
    re-derives the whole top-k independently, so the oracle verifies
    the distributed encode+ANN plumbing (batch boundaries, broadcast,
    partial top-k reduce) against straight-line execution."""
    from .functions.embed import _load_model, encode_text

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        model = _load_model(dim, seed=42)
        rows = [
            encode_text([x], model)[0] for x in t.column("text").to_pylist()
        ]
        emb = np.stack(rows)
        return pa.table(
            {
                "vec_id": t.column("doc_id").combine_chunks().cast(pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.reshape(-1), pa.float32()), dim
                ),
            }
        )

    return _cached(f"embed-{tag}-d{dim}", version, build)


# ------------------------------------------------- stubbed-decode stage twins

def multimodal_twin(n: int = 200, version: str = "v1") -> str:
    def build() -> pa.Table:
        from .functions.multimodal import MediaFeaturizer, make_media_table

        out = MediaFeaturizer()(make_media_table(n))
        return out.drop_columns(["feature"])

    return _cached(f"multimodal-n{n}", version, build)


def frame_sample_twin(n: int = 200, version: str = "v1") -> str:
    """Serial run of the FrameSampler stage (plumbing twin, same
    pattern as multimodal_twin) with the same scaled-int feature
    checksum the query emits."""

    def build() -> pa.Table:
        from .functions.embed import fixed_list_to_numpy
        from .functions.multimodal import FrameSampler, make_media_table

        out = FrameSampler()(make_media_table(n))
        feats = fixed_list_to_numpy(out.column("frame_feature"), dtype=np.float64)
        s = feats.sum(axis=1)
        return pa.table(
            {
                "media_id": out.column("media_id"),
                "frame_idx": out.column("frame_idx").cast(pa.int64()),
                "feature_sum_e6": pa.array(
                    np.copysign(np.floor(np.abs(s * 1e6) + 0.5), s).astype("int64")
                ),
            }
        )

    return _cached(f"frame-sample-n{n}", version, build)


def pdf_layout_twin(n: int = 500, version: str = "v1") -> str:
    def build() -> pa.Table:
        import pandas as pd

        from .functions.layout import PdfLayoutParser, make_pdf_table

        blocks = PdfLayoutParser()(make_pdf_table(n)).to_pandas()
        blocks = blocks.sort_values(
            ["doc_id", "page", "y1", "x0"], ascending=[True, True, False, True]
        )
        blocks["reading_idx"] = blocks.groupby(["doc_id", "page"]).cumcount()
        return pa.Table.from_pandas(blocks, preserve_index=False)

    return _cached(f"pdf-layout-n{n}", version, build)


# ------------------------------------------------ compression-signal twin

def compression_twin(sf_dir: str, version: str = "v1") -> str:
    """Single-threaded zlib(level=6) compressed size per document.
    Only the zlib size is shared math with the engine; the SQL twin
    recomputes raw_bytes independently via octet_length(encode(...))."""
    import zlib

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        comp = [
            len(zlib.compress((x or "").encode("utf-8"), 6))
            for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "zlib_bytes": pa.array(comp, pa.int64()),
            }
        )

    return _cached(f"compression-{tag}", version, build)


# ------------------------------------------------------- k-means twin

def kmeans_twin(sf_dir: str, version: str = "v1") -> str:
    """Independent single-threaded Lloyd's: per-cluster Python loop
    with DIRECT ``sum((x - c)^2)`` distances (the Ray path uses the
    ``|x|^2 - 2 x·c + |c|^2`` matmul expansion) and a row-wise update
    loop. Only the e6 quantization op is shared math. Integer
    arithmetic end-to-end makes both sides partitioning-independent,
    so agreement is exact, not approximate."""
    from .pipelines.clustering import _ITERS, _K, _SCALE

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        t = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        X = np.rint(
            np.array(t.column("embedding").to_pylist(), dtype=np.float64)
            * _SCALE
        ).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        C = X[order[:_K]].copy()

        def assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
            # per-cluster distance columns, explicit loop
            d = np.empty((len(X), len(C)), dtype=np.int64)
            for k in range(len(C)):
                diff = X - C[k]
                d[:, k] = (diff * diff).sum(axis=1)
            return d.argmin(axis=1)

        for _ in range(_ITERS):
            a = assign(X, C)
            for k in range(_K):
                members = X[a == k]
                if len(members):
                    C[k] = members.sum(axis=0) // len(members)
        a = assign(X, C)
        diff = X - C[a]
        dist = (diff * diff).sum(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(a.astype(np.int64)),
                "dist_e12": pa.array(dist.astype(np.int64)),
            }
        )

    return _cached(f"kmeans-{tag}-k{_K}-i{_ITERS}", version, build)


def kcenter_twin(sf_dir: str, version: str = "v1") -> str:
    """Independent single-threaded greedy k-center: a plain Python
    scan in vec_id order computing DIRECT ``sum((x - c)^2)`` distances
    per vector (the Ray path runs batched numpy einsum partials with a
    lexsort pick). Only the e6 quantizer is shared math; int64
    arithmetic end-to-end makes both sides partitioning-independent,
    so agreement is exact."""
    from .pipelines.clustering import _KC_K, _SCALE

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        t = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        X = np.rint(
            np.array(t.column("embedding").to_pylist(), dtype=np.float64)
            * _SCALE
        ).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, X = ids[order], X[order]
        centers = [0]  # index of min vec_id after the sort
        ranks, sel, radii = [0], [int(ids[0])], [0]
        mind = [None] * len(ids)
        for rank in range(1, _KC_K):
            c = X[centers[-1]]
            best_i, best_d = -1, -1
            for i in range(len(ids)):
                d = 0
                for a, b in zip(X[i], c):
                    d += (int(a) - int(b)) ** 2
                if mind[i] is None or d < mind[i]:
                    mind[i] = d
                if mind[i] > best_d:  # strict: ties keep earliest (min id)
                    best_d, best_i = mind[i], i
            centers.append(best_i)
            ranks.append(rank)
            sel.append(int(ids[best_i]))
            radii.append(int(best_d))
        return pa.table(
            {
                "rank": pa.array(ranks, pa.int64()),
                "vec_id": pa.array(sel, pa.int64()),
                "radius2_e12": pa.array(radii, pa.int64()),
            }
        )

    return _cached(f"kcenter-{tag}-k{_KC_K}", version, build)


def semdedup_twin(sf_dir: str, version: str = "v1") -> str:
    """Independent single-threaded SemDeDup (continuation #15): cluster
    assignments come from the kmeans twin (itself independent of the
    Ray path), then a per-PAIR loop in vec_id order — early-exit on the
    first smaller-id similar mate — with each dot squared in Python int
    (the Ray path runs a per-cluster full-matrix matmul + a
    lower-triangle object-dtype scan).  Integer arithmetic end-to-end
    on the shared e6 grid: agreement is exact, not approximate."""
    from .pipelines.clustering import _SCALE
    from .pipelines.neardup import _SEM_DEN2, _SEM_NUM2

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        at = pq.read_table(kmeans_twin(sf_dir),
                           columns=["vec_id", "cluster"])
        cl_of = dict(
            zip(
                at.column("vec_id").to_pylist(),
                at.column("cluster").to_pylist(),
            )
        )
        t = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        X = np.rint(
            np.array(t.column("embedding").to_pylist(), dtype=np.float64)
            * _SCALE
        ).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, X = ids[order], X[order]
        members: dict[int, list[int]] = {}
        for i, v in enumerate(ids):
            members.setdefault(cl_of[int(v)], []).append(i)
        n2 = [int(x @ x) for x in X]
        out_id, out_cl, out_pr = [], [], []
        for cl in sorted(members):
            idx = members[cl]  # already in ascending vec_id order
            for a_pos, i in enumerate(idx):
                pruned = 0
                for j in idx[:a_pos]:
                    d = int(X[i] @ X[j])
                    if d > 0 and _SEM_DEN2 * d * d >= _SEM_NUM2 * n2[i] * n2[j]:
                        pruned = 1
                        break
                out_id.append(int(ids[i]))
                out_cl.append(int(cl))
                out_pr.append(pruned)
        return pa.table(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "cluster": pa.array(out_cl, pa.int64()),
                "pruned": pa.array(out_pr, pa.int64()),
            }
        )

    return _cached(f"semdedup-{tag}", version, build)


def semdedup_pairs_twin(sf_dir: str, version: str = "v1") -> str:
    """Raw within-cluster integer-similar PAIR relation (vec_a < vec_b)
    for the dedup_chain oracle — same independent per-pair loop as
    ``semdedup_twin`` but without the early exit (the chain's SQL does
    its own survivor-restricted EXISTS over these pairs)."""
    from .pipelines.clustering import _SCALE
    from .pipelines.neardup import _SEM_DEN2, _SEM_NUM2

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        at = pq.read_table(kmeans_twin(sf_dir),
                           columns=["vec_id", "cluster"])
        cl_of = dict(
            zip(
                at.column("vec_id").to_pylist(),
                at.column("cluster").to_pylist(),
            )
        )
        t = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        X = np.rint(
            np.array(t.column("embedding").to_pylist(), dtype=np.float64)
            * _SCALE
        ).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, X = ids[order], X[order]
        members: dict[int, list[int]] = {}
        for i, v in enumerate(ids):
            members.setdefault(cl_of[int(v)], []).append(i)
        n2 = [int(x @ x) for x in X]
        out_a, out_b = [], []
        for cl in sorted(members):
            idx = members[cl]
            for a_pos, i in enumerate(idx):
                for j in idx[:a_pos]:
                    d = int(X[i] @ X[j])
                    if d > 0 and _SEM_DEN2 * d * d >= _SEM_NUM2 * n2[i] * n2[j]:
                        out_a.append(int(ids[j]))  # smaller vec_id
                        out_b.append(int(ids[i]))
        return pa.table(
            {
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
            }
        )

    return _cached(f"semdedup-pairs-{tag}", version, build)


def phash_twin(version: str = "v1") -> str:
    """Independent single-threaded perceptual-hash dedup: a plain dict
    grouping pass over the same 300-row media table (the shared math
    is the stubbed decode + packing, like the simhash signature
    twin)."""
    from .functions.multimodal import make_media_dup_table, phash63

    def build() -> pa.Table:
        t = make_media_dup_table()
        ids = t.column("media_id").to_pylist()
        payloads = t.column("payload").to_pylist()
        metas = t.column("meta").to_pylist()
        hashes = [phash63(p, m) for p, m in zip(payloads, metas)]
        groups: dict[int, list[int]] = {}
        for i, h in zip(ids, hashes):
            groups.setdefault(h, []).append(int(i))
        rows = []
        for h, members in groups.items():
            keeper = min(members)
            for m in members:
                rows.append((m, h, keeper, len(members)))
        rows.sort()
        return pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int64()),
                "phash": pa.array([r[1] for r in rows], pa.int64()),
                "keeper_media": pa.array([r[2] for r in rows], pa.int64()),
                "group_size": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    return _cached("phash-dedup-300", version, build)


def pq_twin(sf_dir: str, version: str = "v1") -> str:
    """Independent single-threaded product quantization: per-cluster
    loop distances (no matmul expansion), per-subspace sequential
    Lloyd's, and DIRECT ``sum((q_sub - centroid)^2)`` asymmetric
    distances (the Ray path precomputes an M×k lookup table). Integer
    arithmetic end-to-end → exact agreement."""
    from .pipelines.clustering import (
        _PQ_DSUB,
        _PQ_ITERS,
        _PQ_K,
        _PQ_KSUB,
        _PQ_M,
        _PQ_NQ,
        _SCALE,
    )

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        t = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        X = np.rint(
            np.array(t.column("embedding").to_pylist(), dtype=np.float64)
            * _SCALE
        ).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, X = ids[order], X[order]

        def assign(Xm: np.ndarray, Cm: np.ndarray) -> np.ndarray:
            d = np.empty((len(Xm), len(Cm)), dtype=np.int64)
            for k in range(len(Cm)):
                diff = Xm - Cm[k]
                d[:, k] = (diff * diff).sum(axis=1)
            return d.argmin(axis=1)

        books = []
        for m in range(_PQ_M):
            Xm = X[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
            Cm = Xm[:_PQ_KSUB].copy()  # ids sorted → smallest vec_ids
            for _ in range(_PQ_ITERS):
                a = assign(Xm, Cm)
                for k in range(_PQ_KSUB):
                    members = Xm[a == k]
                    if len(members):
                        Cm[k] = members.sum(axis=0) // len(members)
            books.append(Cm)

        codes = np.empty((len(X), _PQ_M), dtype=np.int64)
        for m in range(_PQ_M):
            codes[:, m] = assign(
                X[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB], books[m]
            )

        rows_q, rows_v, rows_d = [], [], []
        for qi in range(len(ids)):
            if ids[qi] >= _PQ_NQ:
                continue
            adc = np.zeros(len(X), dtype=np.int64)
            for m in range(_PQ_M):
                qm = X[qi, m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
                diff = books[m][codes[:, m]] - qm
                adc += np.einsum("nd,nd->n", diff, diff)
            picked = sorted(range(len(X)), key=lambda i: (adc[i], ids[i]))[:_PQ_K]
            for i in picked:
                rows_q.append(int(ids[qi]))
                rows_v.append(int(ids[i]))
                rows_d.append(int(adc[i]))
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int64()),
                "vec_id": pa.array(rows_v, pa.int64()),
                "adc_e12": pa.array(rows_d, pa.int64()),
            }
        )

    return _cached(
        f"pq-{tag}-m{_PQ_M}-k{_PQ_KSUB}-i{_PQ_ITERS}-q{_PQ_NQ}", version, build
    )


def bpe_twin(sf_dir: str, version: str = "v1") -> str:
    """Independent single-threaded BPE train+encode (Sennrich 2016).
    Training: Counter over tuple-words with the shared tie rule
    (count DESC, pair ASC).  Encoding: RANK-ORDER SWEEP (apply each
    merge left-to-right in learned order) — provably equivalent to the
    Ray path's priority loop because a merge can only create pairs
    involving its own new symbol, whose merges are necessarily
    later-ranked; using the other formulation here keeps the two
    implementations independent."""
    import re
    from collections import Counter

    from .pipelines.tokenizer import _BPE_VOCAB, _N_MERGES

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        wc: Counter = Counter()
        for s in texts:
            wc.update(re.findall(r"\S+", s or ""))
        vocab = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_VOCAB]

        words = {w: tuple(w) for w, _ in vocab}
        merges: list[tuple[str, str]] = []
        for _ in range(_N_MERGES):
            pc_: Counter = Counter()
            for w, c in vocab:
                syms = words[w]
                for i in range(len(syms) - 1):
                    pc_[(syms[i], syms[i + 1])] += c
            if not pc_:
                break
            best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            a, b = best
            for w in words:
                syms = words[w]
                i, out = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = tuple(out)

        memo: dict[str, int] = {}

        def enc(word: str) -> int:
            k = memo.get(word)
            if k is not None:
                return k
            syms = list(word)
            for a, b in merges:  # rank-order sweep
                i, out = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
                if len(syms) == 1:
                    break
            memo[word] = len(syms)
            return len(syms)

        n_words = np.zeros(len(ids), dtype=np.int64)
        n_bpe = np.zeros(len(ids), dtype=np.int64)
        for j, s in enumerate(texts):
            ws = re.findall(r"\S+", s or "")
            n_words[j] = len(ws)
            n_bpe[j] = sum(enc(w) for w in ws)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words),
                "n_bpe_tokens": pa.array(n_bpe),
            }
        )

    return _cached(f"bpe-{tag}-v{_BPE_VOCAB}-m{_N_MERGES}", version, build)


# ------------------------------------------------ graph fixpoint twins

def _twin_edges(sf_dir: str) -> tuple[int, "np.ndarray", "np.ndarray"]:
    """Canonical distinct (u < v) edges of the derived citation graph,
    built single-threaded from the SAME public modular rule the Ray
    path uses (pipelines/graph.py:_canonical_edges) — shared CONSTANTS
    only, independent mechanism (python set, no numpy dedup)."""
    from .pipelines.graph import _PR_KNUTH, _PR_OUTDEG

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    n = len(ids)
    es = set()
    for u in ids:
        u = int(u)
        for j in range(1, _PR_OUTDEG + 1):
            d = (u * _PR_KNUTH + j) % n
            if d != u:
                es.add((min(u, d), max(u, d)))
    uu = np.array([a for a, _ in sorted(es)], dtype=np.int64)
    vv = np.array([b for _, b in sorted(es)], dtype=np.int64)
    return n, uu, vv


def kcore_twin(sf_dir: str, version: str = "v1") -> str:
    """Independent single-threaded core decomposition: adjacency-list
    peeling with an explicit per-level worklist (the Ray path runs
    bitmap-filtered degree exchanges). k-core numbers are
    partitioning- and order-independent, so agreement is exact."""
    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        _, uu, vv = _twin_edges(sf_dir)
        adj: dict[int, set] = {}
        for a, b in zip(uu.tolist(), vv.tolist()):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        core: dict[int, int] = {}
        alive = dict(adj)  # node -> live neighbour set (copied below)
        alive = {u: set(ns) for u, ns in adj.items()}
        k = 1
        while alive:
            dying = [u for u, ns in alive.items() if len(ns) < k]
            if not dying:
                k += 1
                continue
            for u in dying:
                core[u] = k - 1
                for w in alive.pop(u):
                    if w in alive:
                        alive[w].discard(u)
        nodes = sorted(core)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "core": pa.array([core[u] for u in nodes], pa.int64()),
            }
        )

    return _cached(f"kcore-{tag}", version, build)


def mst_twin(sf_dir: str, version: str = "v1") -> str:
    """Independent single-threaded Kruskal over the packed (w, u, v)
    total order (the Ray path runs Borůvka rounds — distinct effective
    weights make the minimum spanning forest unique, so the two
    algorithms must agree edge-for-edge)."""
    from .pipelines.graph import _edge_weight

    tag = os.path.basename(sf_dir.rstrip("/"))

    def build() -> pa.Table:
        n, uu, vv = _twin_edges(sf_dir)
        w = _edge_weight(uu, vv)
        order = sorted(range(len(uu)), key=lambda i: (int(w[i]), int(uu[i]), int(vv[i])))
        parent = list(range(n))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        out = []
        for i in order:
            a, b = find(int(uu[i])), find(int(vv[i]))
            if a != b:
                parent[max(a, b)] = min(a, b)
                out.append((int(uu[i]), int(vv[i]), int(w[i])))
        out.sort()
        return pa.table(
            {
                "u": pa.array([e[0] for e in out], pa.int64()),
                "v": pa.array([e[1] for e in out], pa.int64()),
                "weight": pa.array([e[2] for e in out], pa.int64()),
            }
        )

    return _cached(f"mst-{tag}", version, build)
