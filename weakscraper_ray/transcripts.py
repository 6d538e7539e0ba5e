"""Deterministic synthetic transcripts tables (FIXTURES.md §1).

Generates the engine's primary input — a Parquet table of multi-turn
conversation/agent transcripts with the exact schema mandated by
BASELINE.json's ``input_hint``: ``(conv_id: string, turn_idx: int32,
role: string, text: string, tool: string, ts: timestamp[us])`` — plus
an ``expected.parquet`` twin holding the per-turn oracle
``(conv_id, turn_idx, template_id, extracted_text, fields, error_kind)``
computed at generation time from the known template fills (via the
unit-tested pure-Python matcher).

Properties exercised on purpose:
- rows written SHUFFLED across multiple files → the pipeline's stable
  (conv_id, turn_idx) ordering restore (SURVEY.md R4) is real work;
- ~1% of conversations are HOT (many turns) → salting (R3) is real;
- a fraction of HTML turns are MUTATED to mismatch their template →
  the error-as-data path (§2.6) is exercised end-to-end;
- non-HTML turns (plain lorem text) → the R1 HTML filter is real.

Everything flows from one ``random.Random(seed)``; timestamps are a
fixed epoch + arithmetic (no wall clock).
"""

from __future__ import annotations

import datetime as _dt
import json
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .render import render
from .template import Template
from .exceptions import TemplateMismatch

#: The template library rendered into transcripts. Literal anchor words
#: are deliberately disjoint from render._WORDS so nugget recovery is
#: unambiguous. ``template_id`` = index in this tuple.
TEMPLATES: tuple[str, ...] = (
    # 0: article with byline nuggets, wildcard boilerplate, list of paras
    """
    <html><body><wp-ignore/><article>
      <h1 wp-name='title'></h1>
      <p>By: <wp-nugget wp-name='author'/> On: <wp-nugget wp-name='date'/></p>
      <div class='content' wp-name='body'><wp-ignore/>
        <p wp-list wp-name='paras'><wp-nugget wp-name='t'/></p>
      <wp-ignore/></div>
    </article><wp-ignore/></body></html>
    """,
    # 1: tool-result card: attrs capture, optional, ignore-content
    """
    <div class='card'>
      <span class='tool' wp-name='tool_name'></span>
      <a wp-ignore-attrs wp-name-attrs='link' wp-name='label'></a>
      <em wp-optional wp-name='note'></em>
      <div class='debug' wp-ignore-content></div>
    </div>
    """,
    # 2: table-ish report: nested lists + leaf assert + recursive capture
    """
    <section>
      <h2>Report: <wp-nugget wp-name='report'/></h2>
      <ul><wp-ignore/>
        <li wp-list wp-name='rows'>Item: <wp-nugget wp-name='k'/> Val: <wp-nugget wp-name='v'/></li>
      </ul>
      <hr wp-leaf>
      <footer wp-name='raw' wp-recursive></footer>
    </section>
    """,
)

EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)

_LOREM = (
    "Plain turn text with no markup at all just words about pipelines "
    "and schedulers and object stores and compaction strategies"
).split()

SIZES = {
    "tiny": dict(n_convs=10, mean_turns=10, n_files=2),
    "small": dict(n_convs=1000, mean_turns=20, n_files=8),
    "bench": dict(n_convs=50_000, mean_turns=20, n_files=32),
}


def _compiled() -> list[Template]:
    return [Template(t) for t in TEMPLATES]


def _mutate_html(html: str, rng: random.Random) -> str:
    """Break a rendered page so the template no longer matches."""
    choice = rng.randint(0, 2)
    if choice == 0 and "<h1" in html:
        return html.replace("<h1", "<h3", 1).replace("</h1>", "</h3>", 1)
    if choice == 1 and "class='card'" not in html:
        return html.replace("<article>", "<article><p>injected rogue</p>", 1)
    return "<div class='unrelated'><p>totally different page</p></div>"


def generate(
    out_dir: str,
    size: str = "tiny",
    seed: int = 42,
    html_frac: float = 0.5,
    error_frac: float = 0.08,
    hot_frac: float = 0.01,
    hot_mult: int = 100,
) -> dict:
    """Write ``part-*.parquet`` shards + ``expected.parquet`` under
    ``out_dir``. Returns summary stats. Deterministic in (size, seed)."""
    import os

    cfg = SIZES[size]
    rng = random.Random(seed)
    templates = _compiled()
    os.makedirs(out_dir, exist_ok=True)

    rows: list[dict] = []
    expected: list[dict] = []
    conv_seq = 0
    for ci in range(cfg["n_convs"]):
        conv_id = f"conv-{ci:08d}"
        n_turns = max(2, int(rng.expovariate(1.0 / cfg["mean_turns"])) + 2)
        if rng.random() < hot_frac:
            n_turns *= hot_mult
        for ti in range(n_turns):
            role = ("user", "assistant", "tool")[ti % 3]
            tool = f"tool-{rng.randint(0, 5)}" if role == "tool" else ""
            ts = EPOCH + _dt.timedelta(seconds=conv_seq * 3600 + ti * 7)
            if rng.random() < html_frac:
                tid = rng.randint(0, len(TEMPLATES) - 1)
                page = render(TEMPLATES[tid], rng)
                text = page.html
                if rng.random() < error_frac:
                    text = _mutate_html(text, rng)
                try:
                    m = templates[tid].match(text)
                    expected.append(
                        dict(
                            conv_id=conv_id, turn_idx=ti, template_id=tid,
                            extracted_text=m.extracted_text,
                            fields=json.dumps(m.fields, sort_keys=True),
                            error_kind="",
                        )
                    )
                except TemplateMismatch as e:
                    expected.append(
                        dict(
                            conv_id=conv_id, turn_idx=ti, template_id=tid,
                            extracted_text="", fields="{}", error_kind=e.kind,
                        )
                    )
            else:
                tid = -1
                text = " ".join(rng.choice(_LOREM) for _ in range(rng.randint(5, 30)))
                expected.append(
                    dict(
                        conv_id=conv_id, turn_idx=ti, template_id=-1,
                        extracted_text="", fields="{}", error_kind="not_html",
                    )
                )
            rows.append(
                dict(conv_id=conv_id, turn_idx=ti, role=role, text=text,
                     tool=tool, ts=ts, template_id=tid)
            )
        conv_seq += 1

    # deterministic shuffle so ordering restore is exercised
    rng.shuffle(rows)

    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
            ("template_id", pa.int32()),
        ]
    )
    n_files = cfg["n_files"]
    per = (len(rows) + n_files - 1) // n_files
    for f in range(n_files):
        chunk = rows[f * per : (f + 1) * per]
        if not chunk:
            continue
        tbl = pa.Table.from_pylist(chunk, schema=schema)
        pq.write_table(tbl, os.path.join(out_dir, f"part-{f:04d}.parquet"))

    etbl = pa.Table.from_pylist(
        expected,
        schema=pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("template_id", pa.int32()),
                ("extracted_text", pa.string()),
                ("fields", pa.large_string()),
                ("error_kind", pa.string()),
            ]
        ),
    )
    pq.write_table(etbl, os.path.join(out_dir, "expected.parquet"))
    n_err = sum(1 for e in expected if e["error_kind"] not in ("", "not_html"))
    return dict(rows=len(rows), html_rows=sum(1 for r in rows if r["template_id"] >= 0),
                error_rows=n_err, files=n_files)


def ensure_generated(size: str, seed: int = 42, root: str = "/tmp/ws_transcripts") -> str:
    """Idempotent cached generation keyed by (size, seed)."""
    import os

    out = os.path.join(root, f"{size}-seed{seed}")
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        generate(out, size=size, seed=seed)
        with open(marker, "w") as fh:
            fh.write("ok")
    return out
