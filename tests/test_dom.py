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
