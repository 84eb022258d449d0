"""DOM tokenizer/parser behaviors the cascade relies on
(reference: /root/reference/lib/src/utils.dart:194-235 loadHtml contract)."""

from trafilatura_spark.dom import get_body, parse_html, strip_tags


def test_basic_tree():
    t = parse_html("<html><body><p>hello <b>world</b> tail</p></body></html>")
    body = get_body(t)
    p = body.children[0]
    assert p.tag == "p"
    assert p.text == "hello "
    assert p.children[0].tag == "b"
    assert p.children[0].text == "world"
    assert p.children[0].tail == " tail"


def test_body_synthesis():
    t = parse_html("<p>one</p><p>two</p>")
    body = get_body(t)
    assert [c.tag for c in body.children] == ["p", "p"]


def test_implicit_p_close():
    t = parse_html("<body><p>one<p>two</body>")
    body = get_body(t)
    assert [c.tag for c in body.children] == ["p", "p"]
    assert body.children[0].text == "one"
    assert body.children[1].text == "two"


def test_implicit_li_close():
    t = parse_html("<ul><li>a<li>b</ul>")
    ul = get_body(t).children[0]
    assert [c.tag for c in ul.children] == ["li", "li"]
    assert [c.text for c in ul.children] == ["a", "b"]


def test_void_elements():
    t = parse_html("<p>before<br>after<img src='x'>tail</p>")
    p = get_body(t).children[0]
    assert [c.tag for c in p.children] == ["br", "img"]
    assert p.children[0].tail == "after"
    assert p.children[1].tail == "tail"


def test_attrs_lowercase_tags():
    t = parse_html('<DIV CLASS="Post-Content" id="Main">x</DIV>')
    d = get_body(t).children[0]
    assert d.tag == "div"
    assert d.attrs["class"] == "Post-Content"


def test_text_content_and_tails():
    t = parse_html("<div>a<span>b</span>c<em>d</em>e</div>")
    assert get_body(t).children[0].text_content() == "abcde"


def test_strip_tags_keeps_content():
    t = parse_html("<p>one <span>two</span> three</p>")
    strip_tags(get_body(t), "span")
    p = get_body(t).children[0]
    assert not p.children
    assert p.text == "one two three"


def test_drop_tree_keeps_tail():
    t = parse_html("<div><span>x</span>tail</div>")
    d = get_body(t).children[0]
    d.children[0].drop_tree()
    assert d.text == "tail"


def test_table_structure():
    t = parse_html("<table><tr><th>h</th><td>a</td></tr><tr><td>b</td></tr></table>")
    table = get_body(t).children[0]
    rows = table.find_all("tr")
    assert len(rows) == 2
    assert [c.tag for c in rows[0].children] == ["th", "td"]


def test_script_style_cdata():
    t = parse_html("<body><script>if (a<b) {x}</script><p>ok</p></body>")
    body = get_body(t)
    assert body.children[0].tag == "script"
    assert "a<b" in body.children[0].text
    assert body.children[1].tag == "p"


def test_malformed_nesting_recovery():
    t = parse_html("<div><b>bold<i>both</b>italic?</i></div>")
    assert "bold" in get_body(t).text_content()
