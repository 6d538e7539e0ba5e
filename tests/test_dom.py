"""DOM parser conformance (FIXTURES.md §2 `plain-structure` family)."""

from weakscraper_ray.dom import parse, serialize, text_bytes, text_content


def test_basic_tree():
    root = parse("<div id='a'><p>Hello</p><p>World</p></div>")
    assert root["nodetype"] == "root"
    (div,) = root["children"]
    assert div["name"] == "div"
    assert div["attrs"] == {"id": "a"}
    p1, p2 = div["children"]
    assert p1["children"][0] == {"nodetype": "text", "content": "Hello"}
    assert p2["children"][0]["content"] == "World"


def test_whitespace_normalization():
    root = parse("<p>  Hello \n\t  big   world  </p>")
    assert root["children"][0]["children"][0]["content"] == "Hello big world"


def test_whitespace_only_text_dropped():
    root = parse("<div> \n <p>x</p> \t </div>")
    div = root["children"][0]
    assert [c["nodetype"] for c in div["children"]] == ["tag"]


def test_tag_name_lowercased_and_valueless_attr():
    root = parse("<DIV CLASS='x' hidden><P>y</P></DIV>")
    div = root["children"][0]
    assert div["name"] == "div"
    assert div["attrs"] == {"class": "x", "hidden": ""}
    assert div["children"][0]["name"] == "p"


def test_void_elements_childless():
    root = parse("<div><br><img src='u'><p>after</p></div>")
    div = root["children"][0]
    names = [c["name"] for c in div["children"]]
    assert names == ["br", "img", "p"]
    assert div["children"][1]["children"] == []
    assert div["children"][2]["children"][0]["content"] == "after"


def test_doctype_and_comment_dropped():
    root = parse("<!DOCTYPE html><!-- c --><html><body>x</body></html>")
    assert len(root["children"]) == 1
    assert root["children"][0]["name"] == "html"


def test_charref_merged_into_one_text_node():
    root = parse("<p>a &amp; b</p>")
    assert root["children"][0]["children"] == [
        {"nodetype": "text", "content": "a & b"}
    ]


def test_self_closing_custom_tag():
    root = parse("<div><wp-nugget wp-name='x'/>tail</div>")
    div = root["children"][0]
    assert div["children"][0]["name"] == "wp-nugget"
    assert div["children"][1]["content"] == "tail"


def test_stray_end_tag_tolerated():
    root = parse("<div><p>x</p></span></div>")
    assert root["children"][0]["children"][0]["name"] == "p"


def test_text_content_and_bytes():
    root = parse("<div><p>ab</p><p>cdé</p></div>")
    assert text_content(root) == "ab\ncdé"
    assert text_bytes(root) == 2 + 4  # é is 2 bytes in UTF-8


def test_serialize_roundtrip():
    html = '<div id="a"><p>x</p><br/><span class="b">y</span></div>'
    assert serialize(parse(html)) == html


# ------------------------------------------------- fast-parser equivalence

def test_fast_parser_equivalence_corpus():
    """parse_fast must produce the IDENTICAL DOM to the stdlib-based
    reference parser on the conformance corpus + rendered pages."""
    import random

    from weakscraper_ray.dom import parse_fast, parse_stdlib
    from weakscraper_ray.render import render
    from weakscraper_ray.transcripts import TEMPLATES, _mutate_html

    cases = [
        "<div id='a'><p>Hello</p><p>World</p></div>",
        "<p>  Hello \n\t  big   world  </p>",
        "<div> \n <p>x</p> \t </div>",
        "<DIV CLASS='x' hidden><P>y</P></DIV>",
        "<div><br><img src='u'><p>after</p></div>",
        "<!DOCTYPE html><!-- c --><html><body>x</body></html>",
        "<p>a &amp; b &lt;tag&gt; &#65;</p>",
        "<div><wp-nugget wp-name='x'/>tail</div>",
        "<div><p>x</p></span></div>",
        "<div><p>a<p>b",                          # unclosed tags
        "<script>if (a < b) { track(); }</script><p>x</p>",
        "<style>.x > .y { color: red }</style>",
        "<a href=/bare attr2 = 'q'>t</a>",        # unquoted + spaced attrs
        '<a title="x>y">t</a>',                   # '>' inside quoted value
        "<a title='x>y' b=c>t</a>",
        '<a title= "x > y" hidden>t</a>',
        "<a title=don't>t</a>",                   # quote inside unquoted value
        '<div data-x="a>b" data-y=\'c>d\'><p>in</p></div>',
        '<img src="a>b"/>',
        "< notatag",
        "",
        "plain text only",
    ]
    rng = random.Random(77)
    for tid in range(len(TEMPLATES)):
        for _ in range(10):
            page = render(TEMPLATES[tid], rng).html
            cases.append(page)
            cases.append(_mutate_html(page, rng))
        cases.append(TEMPLATES[tid])
    for html in cases:
        assert parse_fast(html) == parse_stdlib(html), html[:120]


def test_fast_parser_nonascii_whitespace_normalized():
    """ADVICE r2: the flush() fast path must not skip normalization for
    text whose whitespace is not in the plain-ASCII \\t\\n\\r/space set —
    notably U+00A0 from &nbsp;, \\x0b, \\x0c, \\x1c-\\x1f, U+2028."""
    from weakscraper_ray.dom import parse_fast, parse_stdlib

    cases = [
        "<p>x&nbsp;y</p>",
        "<p>a\x0bb</p>",
        "<p>a\x0cb</p>",
        "<p>a\x1cb\x1dc\x1ed\x1fe</p>",
        "<p>x y</p>",
        "<p>x y</p>",
        "<p>x　y</p>",
        "<p>x\x85y</p>",
        "<p>caf\xe9\xa0au\xa0lait</p>",
        "<p>&nbsp;lead</p>",
        "<p>trail&nbsp;</p>",
    ]
    for html in cases:
        fast, std = parse_fast(html), parse_stdlib(html)
        assert fast == std, (html, fast, std)
    # the canonical ADVICE example, value-asserted
    assert (
        parse_fast("<p>x&nbsp;y</p>")["children"][0]["children"][0]["content"]
        == "x y"
    )


def test_tagtok_linear_on_truncated_tags():
    """ADVICE r2: an unterminated start tag full of ="x" units must fail
    in linear time (the old ambiguous alternation backtracked
    exponentially — 3.5 s at 24 units, doubling per unit)."""
    import time

    from weakscraper_ray.dom import parse_fast

    bomb = "<a " + '="x"' * 60  # no closing '>' anywhere
    t0 = time.perf_counter()
    parse_fast(bomb + " trailing text")
    assert time.perf_counter() - t0 < 0.5  # old regex: heat death


def test_fast_parser_is_default_and_faster():
    import time

    from weakscraper_ray.dom import parse, parse_fast, parse_stdlib

    assert parse is parse_fast
    page = ("<div class='a'><h1>T</h1>" + "<p>some text here</p>" * 50
            + "<ul>" + "<li><a href='/x'>l</a></li>" * 30 + "</ul></div>")
    for fn in (parse_fast, parse_stdlib):
        fn(page)  # warm
    t0 = time.perf_counter()
    for _ in range(200):
        parse_stdlib(page)
    t_std = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(200):
        parse_fast(page)
    t_fast = time.perf_counter() - t0
    assert t_fast < t_std  # strictly faster on a typical page


def test_fast_parser_equivalence_fuzz():
    """Structured hypothesis fuzz: random well-formed-ish trees with
    entities, void elements, weird attrs, comments — parse_fast must
    equal parse_stdlib on every one."""
    from hypothesis import given, settings, strategies as st

    from weakscraper_ray.dom import parse_fast, parse_stdlib

    tag = st.sampled_from(["div", "p", "span", "ul", "li", "br", "img", "SECTION"])
    attr = st.sampled_from(
        ["", " class='x'", ' id="a b"', " data-k=v", " hidden",
         ' title="x>y"', " alt='a > b'"]  # '>' inside quoted values
    )
    # unescaped '<' inside text creates tags-named-garbage where stdlib
    # attr tolerance differs on nonsense like 'b<!--' — out of scope
    # (explicit corpus covers stray '<'; real pages escape it)
    text = st.sampled_from(
        ["hi", "  spaced   out  ", "a &amp; b", "&lt;x&gt;", "", "100%", "a < b"]
    )

    node = st.deferred(
        lambda: st.one_of(
            text,
            st.builds(
                lambda t, a, inner: f"<{t}{a}>{inner}</{t}>",
                tag, attr, st.lists(node, max_size=3).map("".join),
            ),
            st.builds(lambda t, a: f"<{t}{a}/>", tag, attr),
            st.builds(lambda c: f"<!-- {c} -->", st.sampled_from(["c", "<p>", "--"])),
        )
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(node, max_size=5).map("".join))
    def run(html):
        assert parse_fast(html) == parse_stdlib(html)

    run()
