"""Micro-DOM parser/serializer tests (reference: SgmlDomBuilderTests.cs,
DomExtensionsTests.cs semantics)."""

from nreadspark.dom import (
    build_document,
    inner_html,
    parse_fragment,
    remove_script_tags,
    serialize_node,
    set_inner_html,
)


def test_empty_input_gives_empty_document():
    assert build_document("").root is None
    assert build_document("   \n\t ").root is None


def test_fragment_gets_html_root():
    doc = build_document('<div id="x">hello</div>')
    assert doc.root.tag == "html"
    div = next(doc.root.elements_by_tag_name("div"), None)
    assert div is not None and div.get_id() == "x"


def test_tags_case_folded_to_lower():
    doc = build_document("<DIV><SpAn>x</SpAn></DIV>")
    assert next(doc.root.elements_by_tag_name("div"), None) is not None
    assert next(doc.root.elements_by_tag_name("span"), None) is not None


def test_whitespace_only_text_nodes_dropped():
    doc = build_document("<div>  \n  <p>x</p>  \t </div>")
    div = next(doc.root.elements_by_tag_name("div"))
    assert len(div.children) == 1 and div.children[0].tag == "p"


def test_nbsp_only_text_node_survives():
    # XML whitespace is space/tab/CR/LF only; &nbsp; is content
    doc = build_document("<div>&nbsp;</div>")
    div = next(doc.root.elements_by_tag_name("div"))
    assert len(div.children) == 1
    assert div.children[0].value == "\xa0"


def test_truncation_after_html_end():
    doc = build_document("<html><body><p>keep</p></body></html><script>drop()</script>")
    assert next(doc.root.elements_by_tag_name("script"), None) is None
    assert next(doc.root.elements_by_tag_name("p"), None) is not None


def test_entities_decoded():
    doc = build_document("<p>a &amp; b &lt; c</p>")
    p = next(doc.root.elements_by_tag_name("p"))
    assert p.value == "a & b < c"


def test_p_auto_close():
    doc = build_document("<body><p>one<p>two</body>")
    body = doc.get_body()
    ps = list(body.elements_by_tag_name("p"))
    assert len(ps) == 2
    assert ps[0].parent is body and ps[1].parent is body


def test_li_auto_close():
    doc = build_document("<ul><li>a<li>b</ul>")
    ul = next(doc.root.elements_by_tag_name("ul"))
    assert len(ul.child_elements()) == 2


def test_unmatched_close_tag_ignored():
    doc = build_document("<div>some text</p><p>other</p></div>")
    div = next(doc.root.elements_by_tag_name("div"))
    assert div.value == "some textother"


def test_comments_preserved_at_parse():
    doc = build_document("<div><!-- hi --><p>x</p></div>")
    div = next(doc.root.elements_by_tag_name("div"))
    assert any(c.is_comment for c in div.children)


def test_script_content_not_parsed():
    doc = build_document('<script>if (a < b) { document.write("<div>"); }</script><p>x</p>')
    script = next(doc.root.elements_by_tag_name("script"))
    assert next(script.elements_by_tag_name("div"), None) is None


def test_serialize_roundtrip():
    html = '<div id="a" class="b c"><p>text &amp; more</p><br /><img src="x.png" /></div>'
    doc = build_document(html)
    div = next(doc.root.elements_by_tag_name("div"))
    s = serialize_node(div)
    doc2 = build_document(s)
    assert serialize_node(next(doc2.root.elements_by_tag_name("div"))) == s


def test_serialize_empty_element_self_closes():
    doc = build_document("<div><br></div>")
    div = next(doc.root.elements_by_tag_name("div"))
    assert inner_html(div) == "<br />"


def test_set_inner_html_reparses_and_wipes_attrs():
    doc = build_document('<div id="keep">old</div>')
    div = next(doc.root.elements_by_tag_name("div"))
    set_inner_html(div, "<p>new</p>")
    # XElement.RemoveAll drops attributes too (reference behaviour)
    assert div.get_id() == ""
    assert div.children[0].tag == "p"


def test_remove_script_tags():
    assert remove_script_tags("a<script>x</script>b") == "ab"
    assert remove_script_tags("a<script>x") == "a"
    assert remove_script_tags("<SCRIPT>x</SCRIPT>y") == "y"
    assert remove_script_tags("plain") == "plain"


def test_parse_fragment_returns_top_level_nodes():
    nodes = parse_fragment("text<p>para</p>")
    assert len(nodes) == 2
    assert nodes[0].is_text and nodes[1].tag == "p"


def test_bare_text_wrapped_in_html():
    doc = build_document("test")
    assert doc.root.tag == "html"
    assert doc.root.children[0].value == "test"


def test_element_value_concatenates_descendant_text():
    doc = build_document("<div>a<span>b<i>c</i></span>d</div>")
    div = next(doc.root.elements_by_tag_name("div"))
    assert div.value == "abcd"


def test_append_child_clones_parented_node():
    from nreadspark.dom import Node

    doc = build_document("<div><p>x</p></div>")
    div = next(doc.root.elements_by_tag_name("div"))
    p = div.children[0]
    other = Node("section")
    added = other.append_child(p)
    assert added is not p  # cloned
    assert p.parent is div  # original untouched
    assert added.value == "x"


def test_deep_nesting_does_not_recurse():
    html = "<div>" * 5000 + "x" + "</div>" * 5000
    doc = build_document(html)
    assert doc.root is not None
    assert serialize_node(doc.root).count("<div") == 5000
