"""On-disk conformance corpus (FIXTURES.md §2 layout): each case dir
holds (template.html, page.html, expected.json) — the reference's own
fixture-triplet test pattern. expected.json values are hand-written
literals, so this is an independent check on the matcher, not a
self-oracle."""

import json
import os

import pytest

from weakscraper_ray import WeakScraper, TemplateMismatch

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "conformance")
CASES = sorted(
    c for c in os.listdir(ROOT)
    if os.path.exists(os.path.join(ROOT, c, "template.html"))
)


#: registry for the wp-function/-attrs cases (D5/D6): passed to every
#: case — templates that don't reference a function never resolve it
DEMO_FUNCTIONS = {
    "to_int": int,
    "upper": str.upper,
    "count_attrs": lambda d: len(d),
}


@pytest.mark.parametrize("case", CASES)
def test_conformance_case(case):
    d = os.path.join(ROOT, case)
    template = open(os.path.join(d, "template.html")).read()
    page = open(os.path.join(d, "page.html")).read()
    expected = json.load(open(os.path.join(d, "expected.json")))
    scraper = WeakScraper(template, DEMO_FUNCTIONS)
    if "error_kind" in expected and len(expected) == 1 and case.startswith("err-"):
        with pytest.raises(TemplateMismatch) as ei:
            scraper.scrap(page)
        assert ei.value.kind == expected["error_kind"]
    else:
        assert scraper.scrap(page) == expected


def test_corpus_covers_every_error_kind():
    from weakscraper_ray.exceptions import ALL_KINDS

    kinds = set()
    for case in CASES:
        if case.startswith("err-"):
            kinds.add(
                json.load(open(os.path.join(ROOT, case, "expected.json")))["error_kind"]
            )
    assert kinds == set(ALL_KINDS)
