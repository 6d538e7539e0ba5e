"""Template directive conformance corpus (FIXTURES.md §2, SURVEY.md §2.3).

One case per directive D1–D12 + combinations + every error kind, run
through the reference-shaped ``WeakScraper`` API (unit level; the same
semantics are exercised end-to-end through Ray in test_pipeline.py).
"""

import pytest

from weakscraper_ray import Template, WeakScraper
from weakscraper_ray.exceptions import (
    ALL_KINDS,
    AttrsMismatch,
    ExcessNode,
    LeafViolation,
    MissingNode,
    NodetypeMismatch,
    TagMismatch,
    TemplateError,
    TemplateMismatch,
    TextMismatch,
)


def scrap(template, page, functions=None):
    return WeakScraper(template, functions).scrap(page)


def full(template, page, functions=None):
    return WeakScraper(template, functions).scrap_full(page)


# ---------------------------------------------------------------- D1 wp-name
def test_wp_name_capture_content_leaf():
    res = scrap("<div><h1 wp-name='title'></h1></div>",
                "<div><h1>My Title</h1></div>")
    assert res == {"title": "My Title"}


def test_wp_name_with_children_captures_subtree_text():
    res = scrap(
        "<div wp-name='all'><p>a</p><p wp-name='b'></p></div>",
        "<div><p>a</p><p>bee</p></div>",
    )
    assert res == {"all": "a\nbee", "b": "bee"}


def test_wp_name_capture_leaf_ignores_html_children():
    # capture-content leaf: HTML children are not constrained
    res = scrap("<div wp-name='x'></div>", "<div><p>a</p><p>b</p></div>")
    assert res == {"x": "a\nb"}


# --------------------------------------------------------- D2 wp-name-attrs
def test_wp_name_attrs():
    res = scrap(
        "<div><a wp-name='t' wp-name-attrs='link' wp-ignore-attrs></a></div>",
        "<div><a href='http://x' rel='nofollow'>click</a></div>",
    )
    assert res == {"t": "click", "link": {"href": "http://x", "rel": "nofollow"}}


# ----------------------------------------------------------- D3 wp-recursive
def test_wp_recursive_serializes_subtree():
    res = scrap(
        "<div><section wp-name='body' wp-recursive></section></div>",
        "<div><section><p>a <b>bold</b></p><p>c</p></section></div>",
    )
    assert res == {"body": "<p>a<b>bold</b></p><p>c</p>"}


def test_wp_recursive_requires_name():
    with pytest.raises(TemplateError):
        Template("<div wp-recursive></div>")


# ---------------------------------------------------------------- D4 wp-leaf
def test_wp_leaf_ok_and_violation():
    t = "<div><span wp-leaf wp-name='x'></span></div>"
    assert scrap(t, "<div><span></span></div>") == {"x": ""}
    with pytest.raises(LeafViolation):
        scrap(t, "<div><span><i>no</i></span></div>")


# ------------------------------------------------- D5/D6 wp-function[-attrs]
def test_wp_function_and_function_attrs():
    fns = {"to_int": int, "get_href": lambda a: a["href"]}
    res = scrap(
        "<div><span wp-name='n' wp-function='to_int'></span>"
        "<a wp-name-attrs='u' wp-function-attrs='get_href' wp-ignore-attrs>"
        "<wp-nugget wp-name='txt'/></a></div>",
        "<div><span>42</span><a href='/x'>go</a></div>",
        fns,
    )
    assert res == {"n": 42, "u": "/x", "txt": "go"}


def test_unknown_function_is_compile_error():
    with pytest.raises(TemplateError):
        Template("<div wp-name='x' wp-function='nope'></div>")


# ---------------------------------------------------------------- D7 wp-list
def test_wp_list_n_repeats():
    t = "<ul><li wp-list wp-name='items'><wp-nugget wp-name='v'/></li></ul>"
    res = scrap(t, "<ul><li>a</li><li>b</li><li>c</li></ul>")
    assert res == {"items": [{"v": "a"}, {"v": "b"}, {"v": "c"}]}


def test_wp_list_zero_repeats():
    t = "<ul><li wp-list wp-name='items'></li></ul>"
    assert scrap(t, "<ul></ul>") == {"items": []}


def test_wp_list_stops_at_nonmatching_sibling():
    t = ("<div><p wp-list wp-name='ps'><wp-nugget wp-name='v'/></p>"
         "<span wp-name='tail'></span></div>")
    res = scrap(t, "<div><p>1</p><p>2</p><span>end</span></div>")
    assert res == {"ps": [{"v": "1"}, {"v": "2"}], "tail": "end"}


def test_wp_list_requires_name():
    with pytest.raises(TemplateError):
        Template("<div><p wp-list></p></div>")


# ------------------------------------------------------------ D8 wp-optional
def test_wp_optional_present_and_absent():
    t = ("<div><h2 wp-optional wp-name='sub'></h2>"
         "<p wp-name='body'></p></div>")
    assert scrap(t, "<div><h2>s</h2><p>b</p></div>") == {"sub": "s", "body": "b"}
    assert scrap(t, "<div><p>b</p></div>") == {"body": "b"}


# ----------------------------------------------------- D9 wp-ignore-content
def test_wp_ignore_content_skips_and_counts_boilerplate():
    t = "<div><nav wp-ignore-content></nav><p wp-name='x'></p></div>"
    r = full(t, "<div><nav><a>Home</a><a>About</a></nav><p>body</p></div>")
    assert r.fields == {"x": "body"}
    assert r.extracted_text == "body"
    assert r.boilerplate_bytes == len(b"HomeAbout")


# ------------------------------------------------------- D10 wp-ignore-attrs
def test_wp_ignore_attrs():
    t = "<div><p wp-ignore-attrs wp-name='x'></p></div>"
    assert scrap(t, "<div><p class='c' id='i'>y</p></div>") == {"x": "y"}


def test_attrs_must_match_without_ignore():
    with pytest.raises(AttrsMismatch):
        scrap("<div><p class='a'>x</p></div>", "<div><p class='b'>x</p></div>")


# ------------------------------------------------------ D11 <wp-ignore> tag
def test_wildcard_skips_boilerplate_siblings():
    t = ("<div><wp-ignore/><h1 wp-name='t'></h1><wp-ignore/>"
         "<p wp-name='b'></p><wp-ignore/></div>")
    r = full(
        t,
        "<div><nav>menu</nav><h1>Title</h1><aside>ads</aside>"
        "<p>Body</p><footer>foot</footer></div>",
    )
    assert r.fields == {"t": "Title", "b": "Body"}
    assert r.extracted_text == "Title\nBody"
    assert r.boilerplate_bytes == len(b"menu") + len(b"ads") + len(b"foot")


def test_wildcard_zero_skips():
    t = "<div><wp-ignore/><p wp-name='x'></p></div>"
    assert scrap(t, "<div><p>a</p></div>") == {"x": "a"}


def test_wildcard_missing_required_raises():
    t = "<div><wp-ignore/><h1 wp-name='t'></h1></div>"
    with pytest.raises(MissingNode):
        scrap(t, "<div><p>only</p></div>")


def test_wildcard_optional_absent_rewinds():
    t = ("<div><wp-ignore/><h2 wp-optional wp-name='sub'></h2>"
         "<p wp-name='b'></p></div>")
    # optional absent: the <span> must still be skippable for <p>
    res = scrap(t, "<div><span>junk</span><p>body</p></div>")
    assert res == {"b": "body"}


def test_wildcard_list():
    t = "<ul><wp-ignore/><li wp-list wp-name='xs'><wp-nugget wp-name='v'/></li></ul>"
    res = scrap(t, "<ul><script>s</script><li>1</li><li>2</li><div>tail</div></ul>")
    assert res == {"xs": [{"v": "1"}, {"v": "2"}]}


# ------------------------------------------------------ D12 <wp-nugget> tag
def test_single_nugget_gap():
    t = "<p>Hello <wp-nugget wp-name='who'/>, welcome!</p>"
    assert scrap(t, "<p>Hello Alice, welcome!</p>") == {"who": "Alice"}


def test_multiple_nuggets_one_text_run():
    t = "<p>From <wp-nugget wp-name='a'/> to <wp-nugget wp-name='b'/> km</p>"
    assert scrap(t, "<p>From Paris to Lyon km</p>") == {"a": "Paris", "b": "Lyon"}


def test_nugget_at_start_and_end():
    t = "<p><wp-nugget wp-name='a'/> mid <wp-nugget wp-name='b'/></p>"
    assert scrap(t, "<p>start mid end</p>") == {"a": "start", "b": "end"}


def test_nugget_adjacent_no_space():
    t = "<p>v<wp-nugget wp-name='ver'/></p>"
    assert scrap(t, "<p>v1.2.3</p>") == {"ver": "1.2.3"}


def test_plain_text_equality():
    assert scrap("<p>exact</p>", "<p>exact</p>") == {}
    with pytest.raises(TextMismatch):
        scrap("<p>exact</p>", "<p>different</p>")


def test_nugget_spans_point_into_extracted_text():
    t = "<p>Hello <wp-nugget wp-name='who'/>!</p>"
    r = full(t, "<p>Hello World!</p>")
    assert r.extracted_text == "Hello World!"
    (span,) = r.spans
    name, start, end = span
    assert name == "who" and r.extracted_text[start:end] == "World"


# ----------------------------------------------------------- error kinds
def test_err_nodetype():
    with pytest.raises(NodetypeMismatch):
        scrap("<div><p>t</p></div>", "<div>just text</div>")


def test_err_tag():
    with pytest.raises(TagMismatch):
        scrap("<div><p>x</p></div>", "<div><span>x</span></div>")


def test_err_excess_node():
    with pytest.raises(ExcessNode):
        scrap("<div><p>x</p></div>", "<div><p>x</p><p>extra</p></div>")


def test_err_missing_node():
    with pytest.raises(MissingNode):
        scrap("<div><p>x</p><p>y</p></div>", "<div><p>x</p></div>")


def test_error_kinds_cover_all():
    kinds = {
        NodetypeMismatch.kind, TagMismatch.kind, TextMismatch.kind,
        AttrsMismatch.kind, ExcessNode.kind, MissingNode.kind,
        LeafViolation.kind,
    }
    assert kinds == set(ALL_KINDS)
    assert all(issubclass(k, TemplateMismatch) for k in (
        NodetypeMismatch, TagMismatch, TextMismatch, AttrsMismatch,
        ExcessNode, MissingNode, LeafViolation))


# ----------------------------------------------------------- kitchen sink
KITCHEN_TEMPLATE = """
<html>
<head><title wp-name='page_title'></title></head>
<body>
  <wp-ignore/>
  <article>
    <h1 wp-name='title'></h1>
    <p class='byline'>By <wp-nugget wp-name='author'/> on <wp-nugget wp-name='date'/></p>
    <div class='body' wp-name='body'>
      <wp-ignore/>
      <p wp-list wp-name='paras'><wp-nugget wp-name='text'/></p>
      <wp-ignore/>
    </div>
    <ul class='links'>
      <li wp-list wp-name='links'><a wp-ignore-attrs wp-name-attrs='attrs' wp-name='label'></a></li>
    </ul>
    <aside wp-optional wp-ignore-content></aside>
  </article>
  <wp-ignore/>
</body>
</html>
"""

KITCHEN_PAGE = """
<html>
<head><title>My Site</title></head>
<body>
  <nav><a href='/'>Home</a> | <a href='/about'>About</a></nav>
  <article>
    <h1>Big News</h1>
    <p class='byline'>By Jane Doe on 2026-01-02</p>
    <div class='body'>
      <script>track();</script>
      <p>First paragraph.</p>
      <p>Second paragraph.</p>
      <div class='ad'>BUY NOW</div>
    </div>
    <ul class='links'>
      <li><a href='/a'>Alpha</a></li>
      <li><a href='/b'>Beta</a></li>
    </ul>
    <aside><b>related junk</b></aside>
  </article>
  <footer>(c) 2026</footer>
</body>
</html>
"""


def test_kitchen_sink():
    r = full(KITCHEN_TEMPLATE, KITCHEN_PAGE)
    f = r.fields
    assert f["page_title"] == "My Site"
    assert f["title"] == "Big News"
    assert f["author"] == "Jane Doe"
    assert f["date"] == "2026-01-02"
    assert f["paras"] == [{"text": "First paragraph."}, {"text": "Second paragraph."}]
    assert f["links"] == [
        {"attrs": {"href": "/a"}, "label": "Alpha"},
        {"attrs": {"href": "/b"}, "label": "Beta"},
    ]
    assert f["body"] == "First paragraph.\nSecond paragraph."
    assert r.extracted_text == (
        "My Site\nBig News\nBy Jane Doe on 2026-01-02\n"
        "First paragraph.\nSecond paragraph.\nAlpha\nBeta"
    )
    # nav, script, ad div, aside, footer are all boilerplate
    assert r.boilerplate_bytes > 0
    assert r.nodes_matched > 10
    # spans all index correctly into extracted_text
    for name, start, end in r.spans:
        assert 0 <= start <= end <= len(r.extracted_text)


# ---------------------------------------------------- nested-results mode

def test_nested_results_shape():
    """Template(..., nested=True): descendants' captures nest under
    their named ancestor's key (reconstructed reference shape) instead
    of flattening into the top-level dict."""
    tpl = """
    <div wp-name='card'>
      <h1 wp-name='title'></h1>
      <p>By: <wp-nugget wp-name='author'/></p>
    </div>
    """
    page = "<div><h1>Hello</h1><p>By: ada</p></div>"
    flat = Template(tpl).match(page).fields
    assert flat == {"card": "Hello\nBy: ada", "title": "Hello", "author": "ada"}
    nested = Template(tpl, nested=True).match(page).fields
    assert nested == {
        "card": {"title": "Hello", "author": "ada", "content": "Hello\nBy: ada"}
    }
    # extracted_text is mode-independent
    assert (
        Template(tpl).match(page).extracted_text
        == Template(tpl, nested=True).match(page).extracted_text
    )


def test_nested_results_leaf_and_list():
    tpl = """
    <section wp-name='s'>
      <ul><li wp-list wp-name='items'><wp-nugget wp-name='v'/></li></ul>
    </section>
    """
    page = "<section><ul><li>a</li><li>b</li></ul></section>"
    nested = Template(tpl, nested=True).match(page).fields
    assert nested["s"]["items"] == [{"v": "a"}, {"v": "b"}]
    # a named node with no named descendants stays a plain text capture
    plain = Template("<p wp-name='x'></p>", nested=True).match("<p>t</p>").fields
    assert plain == {"x": "t"}
