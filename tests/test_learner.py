"""Learner tests (FIXTURES.md `learner-k{3,5}`): skeletons learned from
k seeded renderings must extract equivalently to the hand template."""

import random

import pytest

from weakscraper_ray.learner import learn
from weakscraper_ray.render import render
from weakscraper_ray.template import Template


def test_learn_single_sample_reproduces_page():
    page = "<div><h1>Hi</h1><p>Body</p></div>"
    tmpl = learn([page])
    r = Template(tmpl).match(page)
    assert r.extracted_text == "Hi\nBody"


def test_learn_divergent_text_becomes_nugget():
    pages = [
        "<div><h1>Title One</h1><p>common</p></div>",
        "<div><h1>Another Title</h1><p>common</p></div>",
    ]
    tmpl = learn(pages)
    assert "wp-nugget" in tmpl
    r = Template(tmpl).match("<div><h1>Third</h1><p>common</p></div>")
    assert "Third" in r.fields.values()
    assert r.extracted_text == "Third\ncommon"


def test_learn_divergent_subtree_becomes_wildcard():
    pages = [
        "<div><nav><a>x</a></nav><p>keep</p></div>",
        "<div><p>keep</p></div>",
    ]
    tmpl = learn(pages)
    assert "<wp-ignore/>" in tmpl
    r = Template(tmpl).match("<div><aside>other junk</aside><p>keep</p></div>")
    assert r.extracted_text == "keep"


def test_learn_divergent_attrs():
    pages = [
        "<div><a href='/1'>x</a></div>",
        "<div><a href='/2'>x</a></div>",
    ]
    tmpl = learn(pages)
    assert "wp-ignore-attrs" in tmpl
    Template(tmpl).match("<div><a href='/3'>x</a></div>")


SIMPLE_TEMPLATE = """
<html><body><wp-ignore/><article>
  <h1 wp-name='title'></h1>
  <p>Written-by: <wp-nugget wp-name='author'/></p>
  <span class='x'>fixed text</span>
</article><wp-ignore/></body></html>
"""


@pytest.mark.parametrize("k", [3, 5])
def test_learned_skeleton_matches_hand_template(k):
    """Render k pages from a hand template; the learned skeleton must
    extract the same text from a FRESH rendering (names differ: hand
    template names vs auto f*; values must agree)."""
    rng = random.Random(123)
    samples = [render(SIMPLE_TEMPLATE, rng) for _ in range(k)]
    learned_src = learn([s.html for s in samples])
    learned = Template(learned_src)
    hand = Template(SIMPLE_TEMPLATE)

    fresh = render(SIMPLE_TEMPLATE, random.Random(999))
    want = hand.match(fresh.html)
    got = learned.match(fresh.html)
    # same captured VALUES (auto names differ from hand-written ones)
    assert sorted(
        str(v) for v in want.fields.values()
    ) == sorted(str(v) for v in got.fields.values())
    assert got.extracted_text == want.extracted_text


def test_learner_deterministic():
    rng1 = random.Random(5)
    rng2 = random.Random(5)
    pages1 = [render(SIMPLE_TEMPLATE, rng1).html for _ in range(3)]
    pages2 = [render(SIMPLE_TEMPLATE, rng2).html for _ in range(3)]
    assert learn(pages1) == learn(pages2)
