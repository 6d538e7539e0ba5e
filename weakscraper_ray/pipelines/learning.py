"""Distributed template learning + learned-template extraction
(SURVEY.md ST4, §7 step 8).

Pipeline shape: deterministic-sample k pages per source (template_id
stands in for a source key) → collect the SMALL sample set driver-side
→ pure-Python DOM-diff learner per source (tiny CPU work; the samples
are the only rows that ever leave the cluster) → broadcast the learned
skeleton templates to an extractor actor pool exactly like hand-written
ones.
"""

from __future__ import annotations

import ray

from ..learner import learn
from ..transcripts import ensure_generated
from .extraction import extraction_pipeline, read_transcripts


def learn_templates(ds, k: int = 5, route_column: str = "template_id",
                    seed: int = 7) -> dict[int, str]:
    """Learn one skeleton per source from k sampled HTML-bearing rows.

    The sample collection is the only materialization — k rows per
    source, bounded and tiny. Sampling is deterministic (seeded) per
    SURVEY.md R9.
    """
    import pyarrow.compute as pc

    html = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column(route_column), 0)).select(
            [route_column, "text"]
        ),
        batch_format="pyarrow",
    )

    def _first_k(group):
        return group.head(k)

    samples = (
        html.groupby(route_column)
        .map_groups(_first_k, batch_format="pandas")
        .to_pandas()
    )
    learned: dict[int, str] = {}
    for tid, g in samples.groupby(route_column):
        pages = sorted(g["text"].tolist())[:k]  # deterministic order
        learned[int(tid)] = learn(pages)
    return learned


def learned_extraction(size: str = "tiny", k: int = 5):
    """End-to-end: learn skeletons from the table itself, then extract
    every row with the LEARNED templates (auto-named f* captures)."""
    input_dir = ensure_generated(size)
    ds = read_transcripts(input_dir)
    learned = learn_templates(ds, k=k)
    out = extraction_pipeline(ds, templates=learned)
    return out.drop_columns(["spans"])
