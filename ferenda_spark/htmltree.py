"""Minimal, dependency-free HTML document tree.

Stands in for the reference's BeautifulSoup layer (this container has no
bs4/lxml). Reproduces the *semantics* the reference relies on:

- ``soup_from_basefile``: decode with declared encoding, errors='replace'
  (ref ferenda/documentrepository.py:1188-1207)
- ``parse_document_from_soup``: CSS-select the content root (default
  ``body``), error when it matches nothing, take the first match when
  several, then *remove* nodes matching filter selectors (default
  ``["script"]``) (ref ferenda/documentrepository.py:1251-1282)
- ``elements_from_soup``: drop ``script/style/font/map/center`` subtrees,
  comments, and unknown tags; keep a fixed attribute whitelist
  (ref ferenda/elements/html.py:23-71, tagmap :558-645)

The tree is etree-shaped (``text`` / ``tail`` per element) because the
reference's plaintext invariant is defined over an lxml.etree parse of the
rendered XHTML (ref ferenda/documentrepository.py:2131-2149) where a
child's trailing text belongs to the child node.
"""

from __future__ import annotations

from html.parser import HTMLParser

# Self-closing per HTML5 (public spec knowledge; bs4's lxml builder treats
# these identically, cf. the <br/> test ref test/testDocRepo.py:578-582).
VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Tags whose open implicitly closes a same-tag (or listed) predecessor —
# the small subset of lxml's error recovery our corpus can encounter.
_AUTOCLOSE = {
    "p": ("p",),
    "li": ("li",),
    "tr": ("tr", "td", "th"),
    "td": ("td", "th"),
    "th": ("td", "th"),
    "option": ("option",),
    "dt": ("dt", "dd"),
    "dd": ("dt", "dd"),
}

# All HTML4/HTML5 element names the reference's tagmap covers
# (ref ferenda/elements/html.py:558-645 builds one class per tag; unknown
# tags are warned about and dropped, :41-44).
KNOWN_TAGS = frozenset(
    """a abbr acronym address area article aside audio b base bdi bdo big
    blockquote body br button canvas caption cite code col colgroup data
    datalist dd del details dfn dialog dir div dl dt em embed fieldset
    figcaption figure footer form frame frameset h1 h2 h3 h4 h5 h6 head
    header hgroup hr html i iframe img input ins kbd keygen label legend li
    link main mark menu meta meter nav noframes noscript object ol optgroup
    option output p param picture pre progress q rp rt ruby s samp section
    select small source span strike strong sub summary sup table tbody td
    template textarea tfoot th thead time title tr track tt u ul var video
    wbr""".split()
)

REMOVE_TAGS = ("script", "style", "font", "map", "center")
KEEP_ATTRIBUTES = ("class", "id", "dir", "lang", "src", "href", "name", "alt")
# RDFa-carrying attributes preserved for the distillation stage (the
# reference gets its triples by re-parsing its own rendered RDFa,
# ref ferenda/decorators.py:209-235; our sources carry the RDFa inline).
RDFA_ATTRIBUTES = ("about", "property", "rel", "content", "datatype", "typeof", "xml:lang")


class Node:
    """One element: tag, attrs, text, list of child Nodes, tail."""

    __slots__ = ("tag", "attrs", "text", "children", "tail")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.text = ""
        self.children: list[Node] = []
        self.tail = ""

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def iter(self):
        yield self
        for child in self.children:
            yield from child.iter()

    def itertext(self):
        if self.text:
            yield self.text
        for child in self.children:
            yield from child.itertext()
            if child.tail:
                yield child.tail

    def find(self, tag: str):
        for node in self.iter():
            if node.tag == tag:
                return node
        return None

    def __repr__(self):  # pragma: no cover - debugging aid
        return "<%s %r children=%d>" % (self.tag, self.attrs, len(self.children))


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def _append_text(self, data: str):
        parent = self.stack[-1]
        if parent.children:
            parent.children[-1].tail += data
        else:
            parent.text += data

    def handle_starttag(self, tag, attrs):
        if tag in _AUTOCLOSE:
            closers = _AUTOCLOSE[tag]
            if len(self.stack) > 1 and self.stack[-1].tag in closers:
                self.stack.pop()
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored (lxml recovery behavior)

    def handle_data(self, data):
        self._append_text(data)

    # comments/PIs/doctype dropped, matching elements_from_soup
    # (ref ferenda/elements/html.py:59-61)


def parse_html(data, encoding: str = "utf-8") -> Node:
    """bytes|str → document Node. Decoding uses errors='replace' to match
    soup_from_basefile (ref ferenda/documentrepository.py:1205)."""
    if isinstance(data, (bytes, bytearray)):
        data = bytes(data).decode(encoding, errors="replace")
    builder = _TreeBuilder()
    builder.feed(data)
    builder.close()
    return builder.root


class SelectorError(Exception):
    """parse_content_selector matched nothing
    (ref ferenda/documentrepository.py:1272-1274)."""


def _match_simple(node: Node, sel: str) -> bool:
    # supports: tag, .class, #id, tag.class, tag#id
    tag = cls = ident = None
    rest = sel
    if "#" in rest:
        rest, _, ident = rest.partition("#")
    if "." in rest:
        rest, _, cls = rest.partition(".")
    tag = rest or None
    if tag and node.tag != tag:
        return False
    if ident is not None and node.get("id") != ident:
        return False
    if cls is not None and cls not in (node.get("class") or "").split():
        return False
    return True


def select(root: Node, selector: str) -> list[Node]:
    """Descendant-order matches for a simple selector (subset of
    soup.select — the reference only uses tag / .class / tag.class forms)."""
    out = []
    for node in root.iter():
        if node is root:
            continue
        if _match_simple(node, selector):
            out.append(node)
    return out


def _remove_nodes(root: Node, victims: set[int]):
    for node in root.iter():
        kept = []
        for i, child in enumerate(node.children):
            if id(child) in victims:
                # splice the child's tail into preceding content so
                # sibling text does not disappear (tag.extract() keeps
                # surrounding strings in bs4)
                if kept:
                    kept[-1].tail += child.tail
                else:
                    node.text += child.tail
            else:
                kept.append(child)
        node.children = kept


def select_content(root: Node, content_selector: str = "body",
                   filter_selectors: tuple[str, ...] = ("script",)) -> Node:
    """parse_document_from_soup semantics
    (ref ferenda/documentrepository.py:1251-1282): first match of the
    content selector wins; filter-selector matches are extracted."""
    matches = select(root, content_selector)
    if not matches:
        raise SelectorError(
            "parse_content_selector %r matches nothing" % content_selector)
    content = matches[0]
    for fsel in filter_selectors:
        victims = {id(n) for n in select(content, fsel)}
        if victims:
            _remove_nodes(content, victims)
    return content


def clean_tree(node: Node,
               remove_tags: tuple[str, ...] = REMOVE_TAGS,
               keep_attributes: tuple[str, ...] = KEEP_ATTRIBUTES + RDFA_ATTRIBUTES) -> Node | None:
    """elements_from_soup semantics (ref ferenda/elements/html.py:23-71):
    returns a cleaned copy, or None when this subtree is dropped.

    Whitespace-only text runs are preserved (they fold away under
    normalize_space) — the reference drops them during element-tree build
    but its XHTML serializer reintroduces inter-element whitespace before
    the plaintext pass reads the tree back.
    """
    if node.tag in remove_tags or node.tag not in KNOWN_TAGS:
        return None
    out = Node(node.tag, {k: v for k, v in node.attrs.items() if k in keep_attributes})
    out.text = node.text
    for child in node.children:
        kept = clean_tree(child, remove_tags, keep_attributes)
        if kept is None:
            # dropped subtree: keep its tail text attached to the left
            if out.children:
                out.children[-1].tail += child.tail
            else:
                out.text += child.tail
        else:
            out.children.append(kept)
    out.tail = node.tail
    return out
