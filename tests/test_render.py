"""Round-trip property tests (SURVEY.md §5.2 item 2): render a page
from a template with seeded fills → extract → recover exact values."""

import json
import random

import pytest

from weakscraper_ray.render import render
from weakscraper_ray.template import Template
from weakscraper_ray.transcripts import TEMPLATES, generate


def _subset(expect, got):
    """fills must be a subset of match fields (matcher may add container
    captures like wp-name-with-children that render doesn't record)."""
    if isinstance(expect, list):
        assert isinstance(got, list) and len(got) == len(expect)
        for e, g in zip(expect, got):
            _subset(e, g)
        return
    if isinstance(expect, dict):
        for k, v in expect.items():
            assert k in got, f"missing key {k}"
            _subset(v, got[k])
        return
    assert expect == got


@pytest.mark.parametrize("tid", range(len(TEMPLATES)))
@pytest.mark.parametrize("seed", range(10))
def test_render_extract_roundtrip(tid, seed):
    rng = random.Random(seed * 1000 + tid)
    tmpl = Template(TEMPLATES[tid])
    page = render(TEMPLATES[tid], rng)
    result = tmpl.match(page.html)
    _subset(page.fills, result.fields)


def test_generate_tiny(tmp_path):
    stats = generate(str(tmp_path), size="tiny", seed=42)
    assert stats["rows"] > 50
    assert 0 < stats["html_rows"] < stats["rows"]
    assert stats["error_rows"] > 0

    import pyarrow.parquet as pq

    expected = pq.read_table(tmp_path / "expected.parquet")
    assert expected.num_rows == stats["rows"]
    # every successful HTML row has JSON-decodable fields
    for fields in expected.column("fields").to_pylist()[:50]:
        json.loads(fields)


def test_generate_deterministic(tmp_path):
    a = generate(str(tmp_path / "a"), size="tiny", seed=7)
    b = generate(str(tmp_path / "b"), size="tiny", seed=7)
    assert a == b
    import pyarrow.parquet as pq

    ta = pq.read_table(tmp_path / "a" / "expected.parquet")
    tb = pq.read_table(tmp_path / "b" / "expected.parquet")
    assert ta.equals(tb)
