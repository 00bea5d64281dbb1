"""Lightweight mutable DOM used inside the extraction kernel.

This is a from-scratch, Spark-worker-side micro-DOM replacing the reference's
``System.Xml.Linq`` tree (reference: NReadability/SgmlDomBuilder.cs:43-110 builds
an XDocument via SgmlReader).  Semantics intentionally preserved:

* tag names case-folded to lower      (SgmlDomBuilder.cs:97, CaseFolding.ToLower)
* XML-whitespace-only text dropped    (SgmlDomBuilder.cs:99, WhitespaceHandling.None;
  XML whitespace = space/tab/CR/LF only -- an ``&nbsp;``-only node survives)
* input truncated after last </html>  (SgmlDomBuilder.cs:55-67)
* on a parse crash, retry with <script> blocks spliced out
  (SgmlDomBuilder.cs:75-88 + HtmlUtils.cs:7-38)
* serialization mimics XNode.ToString(SaveOptions.DisableFormatting):
  empty elements as ``<tag />``, text escaping of ``& < >``.

All traversals are iterative (no recursion) so arbitrarily deep documents
cannot blow the Python stack inside an executor.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = [
    "Node",
    "TextNode",
    "CommentNode",
    "Document",
    "build_document",
    "parse_fragment",
    "remove_script_tags",
    "inner_html",
    "set_inner_html",
    "serialize_node",
    "serialize_node_pretty",
]


# HTML void elements: may not have children; a start tag never opens a scope.
VOID_ELEMENTS = frozenset(
    "area base basefont br col embed frame hr img input isindex keygen "
    "link meta param source track wbr".split()
)

# Elements whose start tag implicitly closes an open <p> (HTML content model,
# mirroring what the reference's SGML/DTD reader enforces on re-parse).
_P_CLOSERS = frozenset(
    "address article aside blockquote center details dir div dl fieldset "
    "figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr main menu "
    "nav ol p pre section table ul".split()
)

# tag-on-stack -> set of incoming start tags that implicitly close it
_AUTO_CLOSE = {
    "p": _P_CLOSERS,
    "li": frozenset(("li",)),
    "dt": frozenset(("dt", "dd")),
    "dd": frozenset(("dt", "dd")),
    "td": frozenset(("td", "th", "tr")),
    "th": frozenset(("td", "th", "tr")),
    "tr": frozenset(("tr", "tbody", "tfoot")),
    "thead": frozenset(("tbody", "tfoot")),
    "tbody": frozenset(("tbody", "tfoot")),
    "option": frozenset(("option", "optgroup")),
    "optgroup": frozenset(("optgroup",)),
}

_XML_WS = " \t\r\n"


class TextNode:
    __slots__ = ("value", "parent")

    # class attributes, not properties: these are read millions of times
    # per batch in the traversal hot paths
    is_element = False
    is_text = True
    is_comment = False

    def __init__(self, value: str):
        self.value = value
        self.parent = None

    def remove(self):
        _detach(self)

    def __repr__(self):  # pragma: no cover - debug aid
        return f"TextNode({self.value[:30]!r})"


class CommentNode:
    __slots__ = ("value", "parent")

    is_element = False
    is_text = False
    is_comment = True

    def __init__(self, value: str):
        self.value = value
        self.parent = None

    def remove(self):
        _detach(self)

    def __repr__(self):  # pragma: no cover - debug aid
        return f"CommentNode({self.value[:30]!r})"


def _detach(node):
    parent = node.parent
    if parent is not None:
        parent.children.remove(node)
        node.parent = None


class Node:
    """Element node: tag (lowercase), ordered attrs dict, ordered children."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None):
        self.tag = tag
        self.attrs = attrs if attrs is not None else {}
        self.children = []
        self.parent = None

    # kind flags as class attributes (hot-path reads, no property call)
    is_element = True
    is_text = False
    is_comment = False

    # ----------------------------------------------------------- structure
    def append_child(self, node):
        """Append ``node``; a node that already has a parent is deep-cloned
        first (LINQ-to-XML semantics: XContainer.Add clones parented nodes)."""
        if node.parent is not None:
            node = clone_node(node)
        node.parent = self
        self.children.append(node)
        return node

    def append_moved(self, node):
        """Append ``node``, detaching it from its current parent (move, not
        clone).  Used where the kernel has proven the clone is unobservable."""
        _detach(node)
        node.parent = self
        self.children.append(node)
        return node

    def insert_before_self(self, node):
        parent = self.parent
        idx = parent.children.index(self)
        if node.parent is not None:
            node = clone_node(node)
        node.parent = parent
        parent.children.insert(idx, node)
        return node

    def remove(self):
        _detach(self)

    def remove_all(self):
        """XElement.RemoveAll(): drop children AND attributes."""
        for child in self.children:
            child.parent = None
        self.children = []
        self.attrs = {}

    def next_sibling(self, node):
        """Node following ``node`` in self.children, else None."""
        ch = self.children
        i = ch.index(node)
        return ch[i + 1] if i + 1 < len(ch) else None

    # -------------------------------------------------------------- queries
    def iter_descendants(self):
        """All descendant nodes (elements/text/comments), document order,
        excluding self.  Snapshot-free; do not mutate while iterating."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if node.is_element and node.children:
                stack.extend(reversed(node.children))

    def iter_descendant_elements(self):
        for node in self.iter_descendants():
            if node.is_element:
                yield node

    def elements_by_tag_name(self, tag):
        """Descendant elements with the given (lowercase) tag, doc order.
        Reference: DomExtensions.GetElementsByTagName (DomExtensions.cs:269-283)."""
        tag = tag.lower()
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if node.is_element:
                if node.tag == tag:
                    yield node
                if node.children:
                    stack.extend(reversed(node.children))

    def elements_list_by_tag_name(self, tag):
        """List form of :meth:`elements_by_tag_name` for hot call sites --
        same document order, no generator resume per match."""
        tag = tag.lower()
        out = []
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if node.is_element:
                if node.tag == tag:
                    out.append(node)
                if node.children:
                    stack.extend(reversed(node.children))
        return out

    def children_by_tag_name(self, tag):
        tag = tag.lower()
        return [c for c in self.children if c.is_element and c.tag == tag]

    def child_elements(self):
        return [c for c in self.children if c.is_element]

    @property
    def value(self) -> str:
        """Concatenated descendant text (XElement.Value); comments excluded."""
        parts = []
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if node.is_text:
                parts.append(node.value)
            elif node.is_element and node.children:
                stack.extend(reversed(node.children))
        return "".join(parts)

    # ----------------------------------------------------------- attributes
    def get_attribute(self, name, default=None):
        return self.attrs.get(name, default)

    def set_attribute(self, name, value):
        """SetAttributeValue semantics: value None removes the attribute
        (DomExtensions.cs:153-178)."""
        if value is None:
            self.attrs.pop(name, None)
        else:
            self.attrs[name] = value

    def get_class(self):
        return self.attrs.get("class", "")

    def get_id(self):
        return self.attrs.get("id", "")

    def attributes_string(self, separator):
        """Non-empty attribute values joined by ``separator``
        (DomExtensions.GetAttributesString, DomExtensions.cs:180-219)."""
        return separator.join(v for v in self.attrs.values() if v)

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<{self.tag} {self.attrs}>({len(self.children)} children)"


def clone_node(node):
    """Deep copy (iterative)."""
    if node.is_text:
        return TextNode(node.value)
    if node.is_comment:
        return CommentNode(node.value)
    root = Node(node.tag, dict(node.attrs))
    stack = [(node, root)]
    while stack:
        src, dst = stack.pop()
        for child in src.children:
            if child.is_text:
                c = TextNode(child.value)
            elif child.is_comment:
                c = CommentNode(child.value)
            else:
                c = Node(child.tag, dict(child.attrs))
                stack.append((child, c))
            c.parent = dst
            dst.children.append(c)
    return root


class Document:
    """Document wrapper; ``root`` is the <html> element or None (empty input)."""

    __slots__ = ("root",)

    def __init__(self, root=None):
        self.root = root

    def iter_descendants(self):
        """All nodes including the root element (XDocument.Descendants
        includes the root)."""
        if self.root is None:
            return
        yield self.root
        yield from self.root.iter_descendants()

    def elements_by_tag_name(self, tag):
        tag = tag.lower()
        for node in self.iter_descendants():
            if node.is_element and node.tag == tag:
                yield node

    def elements_list_by_tag_name(self, tag):
        """List form (XDocument.Descendants includes the root)."""
        if self.root is None:
            return []
        tag = tag.lower()
        out = [self.root] if self.root.tag == tag else []
        out.extend(self.root.elements_list_by_tag_name(tag))
        return out

    def children_by_tag_name(self, tag):
        tag = tag.lower()
        if self.root is not None and self.root.tag == tag:
            return [self.root]
        return []

    def add_root(self, element):
        self.root = element

    def get_body(self):
        """First descendant <body> (DomExtensions.GetBody, DomExtensions.cs:33-48)."""
        if self.root is None:
            return None
        return next(self.root.elements_by_tag_name("body"), None)

    def get_title_text(self):
        """<head>'s first child <title> text, trimmed
        (DomExtensions.GetTitle, DomExtensions.cs:50-79)."""
        if self.root is None:
            return None
        head = next(self.root.elements_by_tag_name("head"), None)
        if head is None:
            return ""
        titles = head.children_by_tag_name("title")
        if not titles:
            return ""
        return titles[0].value.strip()

    def get_element_by_id(self, el_id):
        found = [
            n
            for n in self.iter_descendants()
            if n.is_element and n.attrs.get("id") == el_id
        ]
        return found[0] if len(found) == 1 else None


# --------------------------------------------------------------------------
# Parsing
# --------------------------------------------------------------------------


class _TreeSink:
    """Tree-construction state shared by both parser front-ends (the fast
    single-pass tokenizer and the stdlib html.parser fallback)."""

    def __init__(self):
        self.top = Node("#fragment")
        self.stack = [self.top]
        self._pending_text = []

    # -- text buffering (merge adjacent data chunks into one text node)
    def _flush_text(self):
        if not self._pending_text:
            return
        data = "".join(self._pending_text)
        self._pending_text.clear()
        if data.strip(_XML_WS) == "":
            return  # WhitespaceHandling.None: XML-whitespace-only nodes dropped
        parent = self.stack[-1]
        last = parent.children[-1] if parent.children else None
        if last is not None and last.is_text:
            last.value += data
        else:
            t = TextNode(data)
            t.parent = parent
            parent.children.append(t)

    def handle_data(self, data):
        if data:
            self._pending_text.append(data)

    # -- elements
    def _open(self, tag, attrs, self_closing):
        self._flush_text()
        tag = tag.lower()
        # implicit closes per HTML content model
        stack = self.stack
        while len(stack) > 1:
            closers = _AUTO_CLOSE.get(stack[-1].tag)
            if closers is not None and tag in closers:
                stack.pop()
            else:
                break
        attr_map = {}
        for name, value in attrs:
            name = name.lower()
            if name not in attr_map:
                # bare attribute (<input checked>): SGML minimization expands
                # the value to the attribute name
                attr_map[name] = name if value is None else value
        node = Node(tag, attr_map)
        parent = stack[-1]
        node.parent = parent
        parent.children.append(node)
        if not self_closing and tag not in VOID_ELEMENTS:
            stack.append(node)

    def handle_starttag(self, tag, attrs):
        self._open(tag, attrs, self_closing=False)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs, self_closing=True)

    def handle_endtag(self, tag):
        self._flush_text()
        tag = tag.lower()
        if tag in VOID_ELEMENTS:
            return
        stack = self.stack
        for i in range(len(stack) - 1, 0, -1):
            if stack[i].tag == tag:
                del stack[i:]
                return
        # unmatched close tag: ignored (tolerant parse)

    def handle_comment(self, data):
        self._flush_text()
        parent = self.stack[-1]
        c = CommentNode(data)
        c.parent = parent
        parent.children.append(c)

    # declarations / processing instructions are dropped
    def handle_decl(self, decl):
        self._flush_text()

    def unknown_decl(self, data):
        self._flush_text()

    def handle_pi(self, data):
        self._flush_text()

    def finish(self):
        self._flush_text()
        return self.top


class _TreeBuilder(_TreeSink, HTMLParser):
    """stdlib front-end: exact html.parser tokenization feeding the sink.
    _TreeSink is first in the MRO so its handler methods shadow HTMLParser's
    no-op defaults."""

    def __init__(self):
        HTMLParser.__init__(self, convert_charrefs=True)
        _TreeSink.__init__(self)

    def finish(self):
        self.close()
        return _TreeSink.finish(self)


# ---------------------------------------------------------------------------
# Fast single-pass tokenizer
# ---------------------------------------------------------------------------
#
# Replicates html.parser's *observable* tokenization (same tolerant regexes,
# same recovery rules, same CDATA/bogus-comment semantics) without the
# incremental-buffer machinery -- we always hold the whole document, so the
# "wait for more data" paths collapse into EOF recovery.  Anything exotic
# (marked sections ``<![...``) raises _FastUnsupported and the document is
# re-parsed with the stdlib front-end, guaranteeing behavioral equality.
# Parity is enforced by tests/test_fast_parser.py (A/B tree comparison over
# all vendored fixtures + fuzzed documents).

from html import unescape as _unescape  # noqa: E402
from html import parser as _hp  # noqa: E402  (tolerant regexes reused verbatim)

_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s\s*>" % t, re.I) for t in ("script", "style")
}
_LETTERS_EQ_SLASH = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")


class _FastUnsupported(Exception):
    pass


def _fp_recover(sink, rawdata, i):
    """goahead's k<0 EOF recovery (html/parser.py:176-189)."""
    k = rawdata.find(">", i + 1)
    if k < 0:
        k = rawdata.find("<", i + 1)
        if k < 0:
            k = i + 1
    else:
        k += 1
    sink.handle_data(_unescape(rawdata[i:k]))
    return k


def _fp_starttag(sink, rawdata, i):
    """parse_starttag + check_for_whole_start_tag (html/parser.py:300-377).
    Returns (next_pos, cdata_tag_or_None); next_pos < 0 means incomplete."""
    m = _hp.locatestarttagend_tolerant.match(rawdata, i)
    j = m.end()
    nxt = rawdata[j : j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/":
        if rawdata.startswith("/>", j):
            endpos = j + 2
        else:
            return -1, None
    elif nxt == "":
        return -1, None
    elif nxt in _LETTERS_EQ_SLASH:
        return -1, None
    else:
        endpos = j if j > i else i + 1

    match = _hp.tagfind_tolerant.match(rawdata, i + 1)
    if match is None:
        return -1, None
    k = match.end()
    tag = match.group(1).lower()
    attrs = []
    while k < endpos:
        am = _hp.attrfind_tolerant.match(rawdata, k)
        if not am:
            break
        attrname, rest, attrvalue = am.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif attrvalue[:1] == "'" == attrvalue[-1:] or attrvalue[:1] == '"' == attrvalue[-1:]:
            attrvalue = attrvalue[1:-1]
        if attrvalue:
            attrvalue = _unescape(attrvalue)
        attrs.append((attrname.lower(), attrvalue))
        k = am.end()

    end = rawdata[k:endpos].strip()
    if end not in (">", "/>"):
        sink.handle_data(rawdata[i:endpos])  # junk start tag -> raw data
        return endpos, None
    if end.endswith("/>"):
        sink.handle_startendtag(tag, attrs)
        return endpos, None
    sink.handle_starttag(tag, attrs)
    return endpos, (tag if tag in ("script", "style") else None)


def _fp_endtag(sink, rawdata, i):
    """parse_endtag outside CDATA mode (html/parser.py:379-420)."""
    m = _hp.endendtag.search(rawdata, i + 1)
    if not m:
        return -1
    gtpos = m.end()
    m2 = _hp.endtagfind.match(rawdata, i)
    if not m2:
        nm = _hp.tagfind_tolerant.match(rawdata, i + 2)
        if not nm:
            if rawdata[i : i + 3] == "</>":
                return i + 3
            pos = rawdata.find(">", i + 2)  # bogus comment
            if pos == -1:
                return -1
            sink.handle_comment(rawdata[i + 2 : pos])
            return pos + 1
        tagname = nm.group(1).lower()
        gt = rawdata.find(">", nm.end())
        sink.handle_endtag(tagname)
        return (gt + 1) if gt != -1 else gtpos
    sink.handle_endtag(m2.group(1).lower())
    return gtpos


def _fast_feed(sink, rawdata: str) -> None:
    i, n = 0, len(rawdata)
    cdata_elem = None
    while i < n:
        if cdata_elem is None:
            j = rawdata.find("<", i)
            if j < 0:
                j = n
        else:
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if m is None:
                return  # unterminated rawtext: dropped, like goahead(end=1)
            j = m.start()
        if i < j:
            seg = rawdata[i:j]
            sink.handle_data(seg if cdata_elem else _unescape(seg))
        i = j
        if i >= n:
            break

        if cdata_elem is not None:
            # the CDATA close regex guarantees endtagfind matches here
            m = _hp.endtagfind.match(rawdata, i)
            sink.handle_endtag(m.group(1).lower())
            cdata_elem = None
            i = m.end()
            continue

        if _hp.starttagopen.match(rawdata, i):
            k, opened = _fp_starttag(sink, rawdata, i)
            if k < 0:
                i = _fp_recover(sink, rawdata, i)
                continue
            cdata_elem = opened
            i = k
        elif rawdata.startswith("</", i):
            k = _fp_endtag(sink, rawdata, i)
            if k < 0:
                i = _fp_recover(sink, rawdata, i)
                continue
            i = k
        elif rawdata.startswith("<!--", i):
            m = _hp.commentclose.search(rawdata, i + 4)
            if not m:
                i = _fp_recover(sink, rawdata, i)
                continue
            sink.handle_comment(rawdata[i + 4 : m.start()])
            i = m.end()
        elif rawdata.startswith("<?", i):
            pos = rawdata.find(">", i + 2)
            if pos == -1:
                i = _fp_recover(sink, rawdata, i)
                continue
            sink.handle_pi("")  # dropped, but flushes pending text like stdlib
            i = pos + 1
        elif rawdata.startswith("<!", i):
            if rawdata.startswith("<![", i):
                raise _FastUnsupported("marked section")
            if rawdata[i : i + 9].lower() == "<!doctype":
                pos = rawdata.find(">", i + 9)
                if pos == -1:
                    i = _fp_recover(sink, rawdata, i)
                    continue
                sink.handle_decl("")  # dropped, but flushes pending text
                i = pos + 1
            else:
                pos = rawdata.find(">", i + 2)  # bogus comment
                if pos == -1:
                    i = _fp_recover(sink, rawdata, i)
                    continue
                sink.handle_comment(rawdata[i + 2 : pos])
                i = pos + 1
        else:
            sink.handle_data("<")
            i += 1


def _parse_nodes_stdlib(html_content: str):
    builder = _TreeBuilder()
    builder.feed(html_content)
    top = builder.finish()
    for child in top.children:
        child.parent = None
    return top.children


def _parse_nodes_fast(html_content: str):
    sink = _TreeSink()
    _fast_feed(sink, html_content)
    top = sink.finish()
    for child in top.children:
        child.parent = None
    return top.children


def _parse_nodes(html_content: str):
    """Parse markup into a list of top-level nodes: fast tokenizer first,
    stdlib front-end for constructs the fast path doesn't model."""
    try:
        return _parse_nodes_fast(html_content)
    except _FastUnsupported:
        return _parse_nodes_stdlib(html_content)


def remove_script_tags(html_content: str) -> str:
    """Splice out <script>...</script> blocks (HtmlUtils.RemoveScriptTags,
    HtmlUtils.cs:7-38), iterative version."""
    if not html_content:
        return ""
    lower = html_content.lower()
    out = []
    pos = 0
    while True:
        start = lower.find("<script", pos)
        if start == -1:
            out.append(html_content[pos:])
            break
        out.append(html_content[pos:start])
        end = lower.find("</script>", start)
        if end == -1:
            break  # tail dropped, like the reference
        pos = end + len("</script>")
    return "".join(out)


def build_document(html_content: str, _retrying: bool = False, stats: dict | None = None) -> Document:
    """Parse a full page into a Document (SgmlDomBuilder.BuildDocument,
    SgmlDomBuilder.cs:43-91): empty input -> empty document; truncate after
    the last </html>; synthesize an <html> root for fragments; retry without
    scripts if the parser chokes (retries recorded in ``stats``)."""
    if html_content is None:
        raise ValueError("html_content is required")
    if html_content.strip() == "":
        return Document(None)
    # a leading BOM is an encoding artifact, not content: .NET's decoder
    # consumes it before SgmlReader ever sees the text, so a BOM'd page must
    # not grow a synthetic wrapper root around its real <html>
    html_content = html_content.lstrip("\ufeff")

    idx = html_content.rfind("</html")
    if idx != -1:
        bracket = html_content.find(">", idx)
        if bracket != -1:
            html_content = html_content[: bracket + 1]

    try:
        nodes = _parse_nodes(html_content)
    except Exception:
        if _retrying:
            raise
        if stats is not None:
            stats["parse_retried"] = True
        return build_document(remove_script_tags(html_content), _retrying=True, stats=stats)

    if not nodes:
        return Document(None)

    elements = [n for n in nodes if n.is_element]
    if len(elements) == 1 and elements[0].tag == "html" and all(
        not n.is_text for n in nodes
    ):
        return Document(elements[0])

    root = Node("html")
    for node in nodes:
        node.parent = root
        root.children.append(node)
    return Document(root)


def parse_fragment(html_content: str):
    """Parse a markup fragment into top-level nodes (SetInnerHtml's re-parse,
    DomExtensions.cs:238-263 routes through SgmlDomBuilder)."""
    doc = build_document(html_content)
    if doc.root is None:
        return []
    if doc.root.parent is None and doc.root.tag == "html":
        nodes = doc.root.children[:]
        for n in nodes:
            n.parent = None
        return nodes
    return []


# --------------------------------------------------------------------------
# Serialization (XNode.ToString(SaveOptions.DisableFormatting) semantics)
# --------------------------------------------------------------------------

_TEXT_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}
_ATTR_ESCAPES = {
    "&": "&amp;",
    "<": "&lt;",
    '"': "&quot;",
    "\n": "&#xA;",
    "\t": "&#x9;",
    "\r": "&#xD;",
}


def _escape_text(s: str) -> str:
    if "&" in s or "<" in s or ">" in s:
        s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return s


def _escape_attr(s: str) -> str:
    for ch, rep in _ATTR_ESCAPES.items():
        if ch in s:
            s = s.replace(ch, rep)
    return s


def serialize_node(node, out: list | None = None) -> str:
    """Serialize one node (and subtree) to compact XHTML-ish markup."""
    parts = out if out is not None else []
    # iterative serializer: stack holds either nodes or closing strings
    stack = [node]
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            parts.append(item)
            continue
        if item.is_text:
            parts.append(_escape_text(item.value))
            continue
        if item.is_comment:
            parts.append(f"<!--{item.value}-->")
            continue
        attrs = "".join(
            f' {name}="{_escape_attr(value)}"' for name, value in item.attrs.items()
        )
        if item.children:
            parts.append(f"<{item.tag}{attrs}>")
            stack.append(f"</{item.tag}>")
            stack.extend(reversed(item.children))
        else:
            parts.append(f"<{item.tag}{attrs} />")
    if out is None:
        return "".join(parts)
    return ""


class _EndTag:
    __slots__ = ("tag",)

    def __init__(self, tag: str) -> None:
        self.tag = tag


def serialize_node_pretty(node, indent_chars: str = "  ", newline: str = "\r\n") -> str:
    """Indented serialization matching LINQ-to-XML's pretty printer
    (``XDocument.ToString(SaveOptions.None)``, the reference's PrettyPrint
    path, SgmlDomSerializer.cs:70).  Semantics of .NET's indenting
    XmlWriter: a newline+indent is written before a start tag, empty tag or
    comment unless the *current element scope* contains mixed content (text
    was written at this level) or the last write was text; writing text
    marks the scope mixed; the flag is saved/restored per element, so a
    pure-element child nested under a mixed parent is indented again.  The
    end tag of a non-empty element is indented unless its scope is mixed.
    Defaults mirror .NET on Windows: two-space indent, CRLF newlines."""
    parts: list[str] = []
    mixed = False
    mixed_stack: list[bool] = []
    level = 0
    last_was_text = False
    stack = [node]
    while stack:
        item = stack.pop()
        if isinstance(item, _EndTag):
            level -= 1
            if not mixed:
                parts.append(newline)
                parts.append(indent_chars * level)
            parts.append(f"</{item.tag}>")
            mixed = mixed_stack.pop()
            last_was_text = False
            continue
        if item.is_text:
            parts.append(_escape_text(item.value))
            mixed = True
            last_was_text = True
            continue
        if not mixed and parts and not last_was_text:
            parts.append(newline)
            parts.append(indent_chars * level)
        if item.is_comment:
            parts.append(f"<!--{item.value}-->")
            last_was_text = False
            continue
        attrs = "".join(
            f' {name}="{_escape_attr(value)}"' for name, value in item.attrs.items()
        )
        if item.children:
            parts.append(f"<{item.tag}{attrs}>")
            stack.append(_EndTag(item.tag))
            stack.extend(reversed(item.children))
            mixed_stack.append(mixed)
            mixed = False
            level += 1
        else:
            parts.append(f"<{item.tag}{attrs} />")
        last_was_text = False
    return "".join(parts)


def inner_html(element: Node) -> str:
    """Children serialized and concatenated (DomExtensions.GetInnerHtml,
    DomExtensions.cs:221-236)."""
    parts: list = []
    for child in element.children:
        serialize_node(child, parts)
    return "".join(parts)


def set_inner_html(element: Node, html: str) -> None:
    """Replace children by re-parsing markup (DomExtensions.SetInnerHtml,
    DomExtensions.cs:238-263).  Note XElement.RemoveAll also drops the
    element's ATTRIBUTES -- the reference relies on that, so we match it."""
    element.remove_all()
    for node in parse_fragment(html):
        node.parent = element
        element.children.append(node)
