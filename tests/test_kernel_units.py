"""Operator-level tests ported from the reference suite
(NReadability.Tests/NReadabilityTranscoderTests.cs, cited per test)."""

from nreadspark.dom import build_document, serialize_node
from nreadspark.kernel import (
    Options,
    collapse_redundant_paragraph_divs,
    create_article_content_element,
    determine_top_candidate,
    extract_article_title,
    find_candidates_for_article_content,
    get_class_weight,
    get_inner_text,
    get_links_density,
    get_segments_count,
    get_user_style_class,
    glue_document,
    prepare_document,
    strip_unlikely_candidates,
    transcode,
)

LOREM_LONG_1 = (
    "Praesent in arcu vitae erat sodales consequat. Nam tellus purus, volutpat ac "
    "elementum tempus, sagittis sed lacus. Sed lacus ligula, sodales id vehicula at, "
    "semper a turpis. Curabitur et augue odio, sed auctor massa. Ut odio massa, "
    "fringilla eu elementum sit amet, eleifend congue erat. Lorem ipsum dolor sit "
    "amet, consectetur adipiscing elit. Sed ultrices turpis dignissim metus porta id "
    "iaculis purus facilisis. Curabitur auctor purus eu nulla venenatis non ultrices "
    "nibh venenatis. Aenean dapibus pellentesque felis, ac malesuada nibh fringilla "
    "malesuada. In non mi vitae ipsum vehicula adipiscing. Sed a velit ipsum. Sed at "
    "velit magna, in euismod neque. Proin feugiat diam at lectus dapibus sed "
    "malesuada orci malesuada. Mauris sit amet orci tortor. Sed mollis, turpis in "
    "cursus elementum, sapien ante semper leo, nec venenatis velit sapien id elit. "
    "Praesent vel nulla mauris, nec tincidunt ipsum. Nulla at augue vestibulum est "
    "elementum sodales."
)
LOREM_LONG_2 = (
    "Lorem ipsum dolor sit amet, consectetur adipiscing elit. Proin lacus ipsum, "
    "blandit sit amet cursus ut, posuere quis velit. Vivamus ut lectus quam, "
    "venenatis posuere erat. Sed pellentesque suscipit rhoncus. Vestibulum dictum "
    "est ut elit molestie vel facilisis dui tincidunt. Nulla adipiscing metus in "
    "nulla condimentum non mattis lacus tempus. Phasellus sed ipsum in felis "
    "molestie molestie. Sed sagittis massa orci, ut sagittis sem. Cras eget feugiat "
    "nulla. Nunc lacus turpis, porttitor eget congue quis, accumsan sed nunc. "
    "Vivamus imperdiet luctus molestie. Suspendisse eu est sed ligula pretium "
    "blandit. Proin eget metus nisl, at convallis metus. In commodo nibh a arcu "
    "pellentesque iaculis. Cras tincidunt vehicula malesuada. Duis tellus mi, "
    "ultrices sit amet dapibus sit amet, semper ac elit. Cras lobortis, urna eget "
    "consectetur consectetur, enim velit tempus neque, et tincidunt risus quam id "
    "mi. Morbi sit amet odio magna, vitae tempus sem. Lorem ipsum dolor sit amet, "
    "consectetur adipiscing elit. Curabitur at lectus sit amet augue tincidunt "
    "ornare sed vitae lorem. Cum sociis natoque penatibus et magnis dis parturient "
    "montes, nascetur ridiculus mus."
)
DUMMY_PARAGRAPHS = (
    "<p>Lorem ipsum dolor et amet. Lorem ipsum dolor et amet. Lorem ipsum dolor et "
    "amet. Lorem ipsum dolor et amet.</p>" * 5
)


def _non_chrome_nodes(document):
    out = []
    for node in document.iter_descendants():
        name = node.tag if node.is_element else ""
        if name not in ("html", "head", "meta"):
            out.append(node)
    return out


# --- StripUnlikelyCandidates (tests cs:64-99) ------------------------------


def test_unlikely_candidates_removed():
    doc = build_document('<div class="sidebar">Some content.</div>')
    strip_unlikely_candidates(doc)
    assert _non_chrome_nodes(doc) == []


def test_unlikely_but_maybe_candidates_kept():
    content = '<div id="article" class="sidebar"><a href="#">Some widget</a></div>'
    doc = build_document(content)
    strip_unlikely_candidates(doc)
    expected = serialize_node(build_document(content).root)
    assert serialize_node(doc.root) == expected


def test_text_nodes_in_div_with_blocks_wrapped_in_paragraphs():
    doc = build_document('<div>text node1<a href="#">Link</a>text node2</div>')
    strip_unlikely_candidates(doc)
    assert sum(1 for _ in doc.root.elements_by_tag_name("p")) == 2


def test_dont_strip_option_disables_everything():
    doc = build_document('<div class="sidebar">Some content.</div>')
    strip_unlikely_candidates(doc, Options(dont_strip_unlikelys=True))
    assert next(doc.root.elements_by_tag_name("div"), None) is not None


# --- CollapseRedundantParagraphDivs (tests cs:105-125) ---------------------


def test_redundant_paragraph_divs_collapsed():
    paragraph = "<p>\r\n    Some paragraph.\r\n  </p>"
    doc = build_document("<div>\r\n  " + paragraph + "\r\n</div>\r\n")
    collapse_redundant_paragraph_divs(doc)
    expected = serialize_node(build_document(paragraph).root)
    assert serialize_node(doc.root) == expected


def test_nested_div_collapse_is_single_pass():
    # known reference quirk (cs:991-1022 single pre-order pass): the outer div
    # was already visited when the inner collapses, so one level remains
    doc = build_document("<div><div><p>x</p></div></div>")
    collapse_redundant_paragraph_divs(doc)
    divs = list(doc.root.elements_by_tag_name("div"))
    assert len(divs) == 1
    assert divs[0].children[0].tag == "p"


# --- GetLinksDensity (tests cs:131-159) ------------------------------------


def test_links_density_zero_without_links():
    doc = build_document('<div id="container"></div>')
    assert get_links_density(doc.get_element_by_id("container")) == 0.0


def test_links_density_one_for_only_a_link():
    doc = build_document('<div id="container"><a href="#">some link</a></div>')
    assert abs(get_links_density(doc.get_element_by_id("container")) - 1.0) < 1e-9


def test_links_density_half():
    doc = build_document('<div id="container"><a href="#">some link</a>some link</div>')
    assert abs(get_links_density(doc.get_element_by_id("container")) - 0.5) < 1e-9


# --- DetermineTopCandidateElement (tests cs:165-218) ------------------------


def test_top_candidate_determinable_without_body():
    doc = build_document("")
    candidates, scores = find_candidates_for_article_content(doc)
    assert candidates == []
    top = determine_top_candidate(doc, candidates, scores)
    assert top is not None


def test_top_candidate_falls_back_to_body():
    doc = build_document("<body><p>Some paragraph.</p><p>Some paragraph.</p>some text</body>")
    candidates, scores = find_candidates_for_article_content(doc)
    assert candidates == []  # paragraphs shorter than 25 chars
    top = determine_top_candidate(doc, candidates, scores)
    assert top is not None
    assert len(top.children) == 3
    assert top.children[0].tag == "p"
    assert top.children[1].tag == "p"
    assert top.children[2].is_text


def test_top_candidate_prefers_longer_paragraph():
    doc = build_document(
        f'<div id="first-div"><p>{LOREM_LONG_1}</p></div>'
        f'<div id="second-div"><p>{LOREM_LONG_2}</p></div>'
    )
    candidates, scores = find_candidates_for_article_content(doc)
    assert len(candidates) == 2
    top = determine_top_candidate(doc, candidates, scores)
    assert top.get_id() == "second-div"


# --- CreateArticleContentElement (tests cs:224-262) --------------------------


def test_create_article_content_with_empty_html():
    doc = build_document("")
    candidates, scores = find_candidates_for_article_content(doc)
    top = determine_top_candidate(doc, candidates, scores)
    article = create_article_content_element(doc, top, scores)
    assert article.tag == "div"
    assert article.get_id()
    assert len(article.children) == 1  # one empty div inside


def test_create_article_content_extracts_paragraph():
    doc = build_document(
        f'<div id="first-div"><p>{LOREM_LONG_1}</p></div><div id="">some text</div>'
    )
    candidates, scores = find_candidates_for_article_content(doc)
    top = determine_top_candidate(doc, candidates, scores)
    article = create_article_content_element(doc, top, scores)
    assert article.tag == "div"
    assert len(article.children) == 1
    first = article.children[0]
    assert first.get_id() == "first-div"
    assert len(first.children) == 1
    assert first.children[0].tag == "p"


# --- PrepareDocument (tests cs:268-389) --------------------------------------


def test_prepare_document_creates_body():
    doc = build_document("")
    assert doc.get_body() is None
    prepare_document(doc)
    assert doc.get_body() is not None


def _count_tags(doc, *tags):
    return sum(1 for n in doc.iter_descendants() if n.is_element and n.tag in tags)


def test_prepare_document_removes_scripts_and_stylesheets():
    content = (
        '<html><head><link rel="StyleSheet" href="#" /><style></style><style />'
        '<style type="text/css"></style></head><body>'
        '<script type="text/javascript"></script><script type="text/javascript" />'
        '<style type="text/css"></style><link rel="styleSheet"></link>'
        "<script></script></body></html>"
    )
    doc = build_document(content)
    assert _count_tags(doc, "script", "style", "link") > 0
    prepare_document(doc)
    assert _count_tags(doc, "script", "style", "link") == 0


def test_prepare_document_removes_noscript():
    for content in (
        "<html><head></head><noscript /><body>abc</body></html>",
        "<html><head></head><noscript>abc</noscript><body>abc</body></html>",
        "<html><head></head><body><noscript />abc</body></html>",
        "<html><head></head><body><noscript>abc</noscript>abc</body></html>",
    ):
        doc = build_document(content)
        assert _count_tags(doc, "noscript") > 0
        prepare_document(doc)
        assert _count_tags(doc, "noscript") == 0


def test_prepare_document_keeps_readability_scripts_and_styles():
    content = (
        '<html><head><link rel="stylesheet" href="http://domain.com/readability.css" />'
        '<script src="http://domain.com/readability.js"></script></head>'
        '<body><script src="http://domain.com/readability.js"></script>'
        '<link rel="stylesheet" href="http://domain.com/readability.css" /></body></html>'
    )
    doc = build_document(content)
    before = _count_tags(doc, "script", "link")
    prepare_document(doc)
    assert _count_tags(doc, "script", "link") == before


def test_prepare_document_replaces_double_br_with_p():
    doc = build_document("<html><body>some text<br /><br />some other text</body></html>")
    assert _count_tags(doc, "p") == 0
    assert _count_tags(doc, "br") > 0
    prepare_document(doc)
    assert _count_tags(doc, "br") == 0
    assert _count_tags(doc, "p") == 1


def test_prepare_document_replaces_font_with_span():
    doc = build_document("<html><body><font>some text</font></body></html>")
    prepare_document(doc)
    assert _count_tags(doc, "font") == 0
    assert _count_tags(doc, "span") == 1


def test_prepare_document_removes_named_anchors_without_href():
    doc = build_document('<body><a name="x">anchor</a><a href="#" name="y">keep</a></body>')
    prepare_document(doc)
    anchors = list(doc.root.elements_by_tag_name("a"))
    assert len(anchors) == 1
    assert anchors[0].get_attribute("href") == "#"


# --- GlueDocument (tests cs:395-432) ----------------------------------------


def test_glue_document_adds_head():
    doc = build_document("")
    prepare_document(doc)
    assert _count_tags(doc, "head") == 0
    glue_document(doc, None, doc.get_body())
    assert _count_tags(doc, "head") == 1


def test_glue_document_adds_stylesheet():
    doc = build_document("")
    prepare_document(doc)
    glue_document(doc, None, doc.get_body())
    assert _count_tags(doc, "style") == 1


def test_glue_document_creates_container_structure():
    doc = build_document("")
    prepare_document(doc)
    glue_document(doc, None, doc.get_body())
    assert doc.get_element_by_id("readOverlay") is not None
    assert doc.get_element_by_id("readInner") is not None


# --- GetUserStyleClass (tests cs:437-445) ------------------------------------


def test_get_user_style_class():
    assert get_user_style_class("prefix", "") == "prefix"
    assert get_user_style_class("prefix", "abc") == "prefix-abc"
    assert get_user_style_class("prefix", "Abc") == "prefix-abc"
    assert get_user_style_class("prefix", "ABc") == "prefix-a-bc"
    assert get_user_style_class("prefix", "ABcD") == "prefix-a-bc-d"


# --- scalar helpers -----------------------------------------------------------


def test_segments_count():
    assert get_segments_count("", ",") == 1
    assert get_segments_count("a,b,c", ",") == 3


def test_inner_text_normalization():
    doc = build_document("<p>  a   b\n\nc </p>")
    p = next(doc.root.elements_by_tag_name("p"))
    assert get_inner_text(p) == "a b c"
    assert get_inner_text(p, dont_normalize_spaces=True) == "a   b\n\nc"


def test_class_weight():
    doc = build_document('<div id="a" class="article"></div>')
    el = next(doc.root.elements_by_tag_name("div"))
    assert get_class_weight(el) == 25
    doc = build_document('<div id="sidebar" class="comment"></div>')
    el = next(doc.root.elements_by_tag_name("div"))
    assert get_class_weight(el) == -50
    assert get_class_weight(el, dont_weight_classes=True) == 0


# --- Transcode end-to-end bits (tests cs:773-994) -----------------------------


def test_empty_article_not_extracted():
    result = transcode("<html><body></body></html>", "http://wikipedia.org/wiki/baseArticle")
    assert result.content_extracted is False


def test_title_extracted_from_head():
    expected = "Some title ąęłóżźńć"
    result = transcode(f"<html><head><title>{expected}</title></head><body></body></html>")
    assert result.title == expected


def test_title_extracted_from_body_h1():
    expected = "Some title ąęłóżźńć"
    html = f'<html><body><div id="main"><h1>{expected}</h1>{DUMMY_PARAGRAPHS}</div></body></html>'
    result = transcode(html)
    assert result.title == expected


def test_title_extracted_from_body_h2():
    expected = "Some title ąęłóżźńć"
    html = f'<html><body><div id="main"><h2>{expected}</h2>{DUMMY_PARAGRAPHS}</div></body></html>'
    result = transcode(html)
    assert result.title == expected


def test_title_whitespace_cleanup():
    title = "Гостиница\n-  \r Ги  \t  де \n\n \r Мопассан \r\n"
    html = f"<html><head><title>{title}</title></head><body></body></html>"
    result = transcode(html)
    assert result.title == "Гостиница - Ги де Мопассан"


def test_extract_article_title_variants():
    # " | " / " - " separators keep the left side unless too short
    doc = build_document(
        "<html><head><title>The Great Article Headline Is Here - Example Site</title></head>"
        "<body></body></html>"
    )
    el = extract_article_title(doc)
    assert el.value == "The Great Article Headline Is Here"

    # a <=4-word remainder reverts to the full document title (cs:815-819)
    doc = build_document(
        "<html><head><title>The Article Headline Here - Example Site</title></head>"
        "<body></body></html>"
    )
    el = extract_article_title(doc)
    assert el.value == "The Article Headline Here - Example Site"

    # colon titles keep the part after the colon
    doc = build_document(
        "<html><head><title>Review: A Wonderful Device For Everyone Involved</title></head>"
        "<body></body></html>"
    )
    el = extract_article_title(doc)
    assert el.value == "A Wonderful Device For Everyone Involved"


def test_transcode_no_title():
    result = transcode("test")
    assert result.title is None
    assert result.content_extracted is False
