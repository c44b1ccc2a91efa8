"""RFC-style plaintext document parsing → structure + triples.

Re-creates the reference's RFC repo parse semantics
(ref ferenda/sources/tech/rfc.py:134-640) on top of the fresh FSM engine:

- paragraph chunking = TextReader.readparagraph over UNIX linesep
  (ref ferenda/textreader.py:159-173): split on blank-line runs
- faux-bold preprocessing ``re.sub('.\\b','')``  (ref rfc.py:466-467)
- recognizers/transitions mirror rfc.py:140-428 exactly
- header metadata per parse_header (ref rfc.py:552-640): publisher via
  label lookup, Request for Comments → identifier, Category → subject,
  ISSN, Updates/Obsoletes, creators "X. Name", "<Month> <Year>" →
  dcterms:issued ^^xsd:gYearMonth, other right-column lines →
  rightsHolder
- citations: section/RFC grammar of make_citation_parser
  (ref rfc.py:430-452) emitting dcterms:references per containing part
- section triples per SectionalElement.as_xhtml + PreambleSection
  (ref ferenda/elements/elements.py:608-662, rfc.py:37-60): about =
  uri + "#S<ordinal>" / "#PS<n>", typeof bibo:DocumentPart,
  dcterms:title@doclang, bibo:chapter@doclang, dcterms:identifier
  "RFC <n>, section <ord>"@doclang, dcterms:isPartOf parent
"""

from __future__ import annotations

import re
from datetime import datetime

from .fsm import FSMParser, newstate
from .model import Triple
from .namespaces import NS, RDF_TYPE
from .textextract import normalize_space
from .uris import RepoConfig

DCTERMS = NS["dcterms"]
BIBO = NS["bibo"]
PROV = NS["prov"]
RFCNS = NS["rfc"]
XSD = NS["xsd"]

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"])}


# ---------------------------------------------------------------- tree --

class Part(list):
    """Generic structure node (stands in for ferenda.elements classes)."""

    kind = "body"

    def __init__(self, children=(), **props):
        super().__init__(children)
        self.__dict__.update(props)

    def __getattr__(self, name):
        return None


def _part(kind, children=(), **props):
    p = Part(children, **props)
    p.kind = kind
    return p


# ------------------------------------------------------------ chunking --

def chunk_paragraphs(text: str):
    """TextReader.readparagraph stream (ref ferenda/textreader.py:159-173):
    skip leading newlines, read up to the double-newline delimiter.
    Exactness note: a final chunk ending in a single newline KEEPS it
    (readchunk reads to EOF without trimming) — the FSM corpus golden
    nestedlist.xml encodes this."""
    pos, n = 0, len(text)
    while pos < n:
        while pos < n and text[pos] == "\n":
            pos += 1
        if pos >= n:
            break
        idx = text.find("\n\n", pos)
        if idx == -1:
            yield text[pos:]
            break
        yield text[pos:idx]
        pos = idx + 2


_BACKSPACE = re.compile(".\b")


def preprocess(text: str) -> str:
    """Strip backspace faux-bold (ref rfc.py:466-467)."""
    return _BACKSPACE.sub("", text)


# ---------------------------------------------------------- the parser --

_RE_SECTIONSTART = re.compile(r"^(\d[\.\d]*) +(.*[^\.])$").match


def _splitcolumns(chunk):
    """ref rfc.py:166-178."""
    linelens, leftlines, rightlines = [], [], []
    for line in chunk.split("\n"):
        linelens.append(len(line))
        if "   " in line:
            left, right = line.split("   ", 1)
        else:
            left, right = line, ""
        leftlines.append(left)
        rightlines.append(right)
    return leftlines, rightlines, linelens


def get_parser(basefile: str = "0") -> FSMParser:
    """The FSM instance (ref rfc.py:134-428)."""

    def is_rfcheader(parser, chunk=None, lenient=True):
        if chunk is None:
            chunk = parser.reader.peek()
        leftlines, rightlines, linelens = _splitcolumns(chunk)
        if len(linelens) < 2:
            return False
        targetlen = linelens[0]
        for idx, length in enumerate(linelens):
            if rightlines[idx] == "" and length > 40:
                return False
            elif rightlines[idx] != "" and length != targetlen and not lenient:
                return False
        return True

    def is_doctitle(parser, chunk=None):
        return True

    def is_pagebreak(parser, chunk=None):
        if chunk is None:
            chunk = parser.reader.peek()
        return "\f" in chunk

    def is_header(parser, chunk=None):
        if chunk is None:
            chunk = parser.reader.peek()
        stripchunk = chunk.strip()
        return ((stripchunk != "") and
                (len(stripchunk.split("\n")) == 1) and
                (not stripchunk.endswith(".")) and
                (not chunk.startswith(" ")))

    def analyze_sectionstart(parser, chunk=None):
        if chunk is None:
            chunk = parser.reader.peek()
        m = _RE_SECTIONSTART(chunk)
        if m:
            ordinal = m.group(1).rstrip(".")
            return (ordinal, m.group(2),
                    "RFC %s, section %s" % (basefile, ordinal))
        return (None, chunk, None)

    def _segments(parser, chunk=None):
        ordinal = analyze_sectionstart(parser, chunk)[0]
        return 0 if ordinal is None else len([x for x in ordinal.split(".") if x])

    def is_section(parser, chunk=None):
        return _segments(parser, chunk) == 1

    def is_subsection(parser, chunk=None):
        return _segments(parser, chunk) == 2

    def is_subsubsection(parser, chunk=None):
        return _segments(parser, chunk) == 3

    def is_preformatted(parser, chunk=None):
        if chunk is None:
            chunk = parser.reader.peek()
        stripped = "\n".join(x[3:] for x in chunk.split("\n"))
        stripped = stripped.replace(".  ", ". ")
        return "  " in stripped or "...." in stripped or ". . . " in stripped

    def is_paragraph(parser, chunk=None):
        return True

    def is_ul_listitem(parser, chunk=None):
        if chunk is None:
            chunk = parser.reader.peek()
        return chunk.strip().startswith("o  ")

    @newstate("body")
    def make_body(parser):
        return parser.make_children(_part("body"))

    @newstate("preamble-section")
    def make_preamble_section(parser):
        s = _part("preamblesection", title=parser.reader.next())
        return parser.make_children(s)

    @newstate("preamble-section")
    def make_abstract(parser):
        s = _part("preamblesection", title="(Abstract)")
        return parser.make_children(s)

    def skip_pagebreak(parser):
        chunk = parser.reader.next()
        lastline = chunk.split("\n")[-1]
        parts = re.split("  +", lastline)
        if len(parts) > 2:
            return _part("pagebreak", shorttitle=parts[1])
        return None

    def make_paragraph(parser):
        chunk = parser.reader.next()
        return _part("paragraph", [" ".join(chunk.split())])

    def make_preformatted(parser):
        chunk = parser.reader.next()
        return _part("preformatted", [chunk])

    def _make_sectionlike(parser, kind):
        ordinal, title, identifier = analyze_sectionstart(
            parser, parser.reader.next())
        s = _part(kind, ordinal=ordinal, title=title, identifier=identifier)
        return parser.make_children(s)

    @newstate("section")
    def make_section(parser):
        return _make_sectionlike(parser, "section")

    @newstate("subsection")
    def make_subsection(parser):
        return _make_sectionlike(parser, "section")

    @newstate("subsubsection")
    def make_subsubsection(parser):
        return _make_sectionlike(parser, "section")

    @newstate("ul-list")
    def make_unordered_list(parser):
        ol = _part("ul")
        ol.append(parser.make_child(make_listitem, "listitem"))
        return parser.make_children(ol)

    @newstate("listitem")
    def make_listitem(parser):
        chunk = parser.reader.next()
        rest = chunk[6:] if chunk.startswith("   o  ") else chunk
        li = _part("li", [rest])
        return parser.make_children(li)

    def make_rfcheader(parser):
        headerchunk = parser.reader.next()
        try:
            if is_rfcheader(parser, lenient=False):
                headerchunk += "\n" + parser.reader.next()
        except StopIteration:
            pass
        return _part("rfcheader", [headerchunk])

    def make_doctitle(parser):
        return _part("doctitle", [parser.reader.next()])

    p = FSMParser()
    p.set_recognizers(is_pagebreak, is_rfcheader, is_doctitle, is_section,
                      is_subsection, is_subsubsection, is_header,
                      is_ul_listitem, is_preformatted, is_paragraph)
    commonstates = ("section", "subsection", "subsubsection")
    p.set_transitions({
        ("body", is_rfcheader): (make_rfcheader, "doctitle"),
        ("doctitle", is_doctitle): (make_doctitle, "preamble"),
        ("preamble", is_header): (make_preamble_section, "preamble-section"),
        ("preamble", is_paragraph): (make_abstract, "preamble-section"),
        ("preamble-section", is_paragraph): (make_paragraph, None),
        ("preamble-section", is_header): (False, None),
        ("preamble-section", is_pagebreak): (skip_pagebreak, None),
        ("preamble-section", is_section): (False, "after-preamble"),
        ("after-preamble", is_section): (make_section, "section"),
        ("section", is_subsection): (make_subsection, "subsection"),
        ("section", is_section): (False, None),
        ("subsection", is_subsubsection): (make_subsubsection, "subsubsection"),
        ("subsection", is_subsection): (False, None),
        ("subsection", is_section): (False, None),
        ("subsubsection", is_subsubsection): (False, None),
        ("subsubsection", is_subsection): (False, None),
        ("subsubsection", is_section): (False, None),
        (commonstates, is_ul_listitem): (make_unordered_list, "ul-list"),
        ("ul-list", is_ul_listitem): (make_listitem, "listitem"),
        ("ul-list", is_paragraph): (False, None),
        ("listitem", is_paragraph): (False, None),
        (commonstates, is_preformatted): (make_preformatted, None),
        (commonstates, is_paragraph): (make_paragraph, None),
        (commonstates, is_pagebreak): (skip_pagebreak, None),
    })
    p.initial_state = "body"
    p.initial_constructor = make_body
    return p


# -------------------------------------------------------------- header --

def get_rfc_num(header: str) -> str | None:
    """ref rfc.py:537-550."""
    left = [x.split("   ", 1)[0].strip() for x in header.split("\n")]
    for line in left[1:]:
        if ": " not in line:
            continue
        key, val = (x.strip() for x in line.split(": ", 1))
        if key == "Request for Comments":
            return re.sub(r"\D", "", val)
    return None


def parse_header(header: str, uri: str, cfg: RepoConfig,
                 lookup) -> list[Triple]:
    """ref rfc.py:552-640. ``lookup(label, predicate)`` resolves a label to
    a resource URI against the broadcast commondata dictionary, raising
    KeyError on a miss (ref documentrepository.py:478-525)."""
    triples: list[Triple] = []
    lines = header.split("\n")
    left = [x.split("   ", 1)[0].strip() for x in lines]
    right = [x.split("   ", 1)[1].strip() for x in lines if "   " in x]

    publisher_label = left[0]
    try:
        triples.append(Triple.uri(uri, DCTERMS + "publisher",
                                  lookup(publisher_label, "foaf:name")))
    except KeyError:
        triples.append(Triple.literal(uri, DCTERMS + "publisher", publisher_label))

    for line in left[1:]:
        if line.strip() == "" or ": " not in line:
            continue
        key, value = (x.strip() for x in line.split(": ", 1))
        if key == "Request for Comments":
            value = re.sub(r"\D", "", value)
            if value:
                triples.append(Triple.literal(uri, DCTERMS + "identifier",
                                              "RFC %s" % value))
        elif key == "Category":
            try:
                triples.append(Triple.uri(uri, DCTERMS + "subject",
                                          lookup(value, "bibo:identifier")))
            except KeyError:
                triples.append(Triple.literal(uri, DCTERMS + "subject", value))
        elif key == "ISSN":
            triples.append(Triple.literal(uri, DCTERMS + "issn", value))
        elif key in ("Updates", "Obsoletes"):
            pred = {"Updates": RFCNS + "updates",
                    "Obsoletes": RFCNS + "obsoletes"}[key]
            for valuepart in value.split(", "):
                m = re.search(r"\d+", valuepart)
                if m:
                    triples.append(Triple.uri(
                        uri, pred, cfg.canonical_uri(m.group(0))))
        elif key == "BCP":
            triples.append(Triple.literal(uri, RFCNS + "bcpnumber", value))
            triples.append(Triple.uri(uri, RDF_TYPE, RFCNS + "BCP"))
        elif key == "STD":
            triples.append(Triple.literal(uri, RFCNS + "stdnumber", value))
            triples.append(Triple.uri(uri, RDF_TYPE, RFCNS + "FYI"))
        elif key == "FYI":
            triples.append(Triple.literal(uri, RFCNS + "fyinumber", value))
            triples.append(Triple.uri(uri, RDF_TYPE, RFCNS + "FYI"))
        # unknown keys: warned + skipped in the reference

    for line in right:
        if re.match(r"[A-Z]\. ", line):
            triples.append(Triple.literal(uri, DCTERMS + "creator", line))
        elif re.match(r"\w+ \d{4}$", line):
            month, year = line.split()
            if month in _MONTHS:
                triples.append(Triple.literal(
                    uri, DCTERMS + "issued",
                    "%04d-%02d" % (int(year), _MONTHS[month]),
                    datatype=XSD + "gYearMonth"))
            else:
                triples.append(Triple.literal(uri, DCTERMS + "rightsHolder", line))
        else:
            triples.append(Triple.literal(uri, DCTERMS + "rightsHolder", line))
    return triples


# ----------------------------------------------------------- citations --

# make_citation_parser grammars (ref rfc.py:430-452): ordered alternation —
# "section N of [RFC M]" beats "section N" beats "[RFC M]".
_CITATION = re.compile(
    r"(?i:section)\s+(?P<sec1>\d[\d.]*)\s+of\s+\[?RFC\s*(?P<rfc1>\d+)\]?"
    r"|(?i:section)\s+(?P<sec2>\d[\d.]*)"
    r"|\[?RFC\s*(?P<rfc2>\d+)\]?")


def find_citations(text: str, doc_uri: str, cfg: RepoConfig) -> list[str]:
    """Target URIs cited in ``text`` (ref rfc.py:430-452 rfc_uriformatter):
    RFC part → canonical uri of that RFC; section part → '#S<sec>';
    a section-only citation is doc-relative."""
    out = []
    for m in _CITATION.finditer(text):
        uri = ""
        rfc = m.group("rfc1") or m.group("rfc2")
        sec = m.group("sec1") or m.group("sec2")
        if rfc:
            uri += cfg.canonical_uri(rfc.lstrip("0"))
        else:
            uri += doc_uri
        if sec:
            uri += "#S" + sec.rstrip(".")
        out.append(uri)
    return out


# ------------------------------------------------------------ assembly --

class RFCDocument:
    def __init__(self, uri, lang, triples, sections, texts):
        self.uri = uri
        self.lang = lang
        self.triples = triples      # list[Triple]
        self.sections = sections    # list[dict] (uri, ordinal, title, parent)
        self.texts = texts          # list[(resource_uri, text)]


def _strings(part) -> list[str]:
    out = []
    for child in part:
        if isinstance(child, str):
            out.append(child)
        elif child.kind not in ("section",):
            out.extend(_strings(child))
    return out


def _cleanup_pagebreaks(part) -> str | None:
    """Remove pagebreak nodes, return first shorttitle in document order
    (ref rfc.py:520-535 cleanup_body)."""
    shorttitle = None
    kept = []
    for sub in part:
        if isinstance(sub, str):
            kept.append(sub)
            continue
        if sub.kind == "pagebreak":
            if shorttitle is None:
                shorttitle = sub.shorttitle
        else:
            short = _cleanup_pagebreaks(sub)
            if shorttitle is None:
                shorttitle = short
            kept.append(sub)
    part[:] = kept
    return shorttitle


def parse_rfc(text: str, basefile: str, cfg: RepoConfig,
              commondata: dict | None = None) -> RFCDocument:
    """Full parse of one RFC-style plaintext document
    (ref rfc.py:456-518 RFC.parse)."""
    lang = "en"
    if callable(commondata):
        def lookup(label, predicate):
            return commondata(label, predicate)
    else:
        table = commondata or {}

        def lookup(label, predicate):
            key = (predicate, label)
            if key in table:
                return table[key]
            if label in table:
                return table[label]
            raise KeyError(label)

    chunks = chunk_paragraphs(preprocess(text))
    body = get_parser(basefile).parse(chunks)

    header_part = body.pop(0)
    if header_part.kind != "rfcheader":
        raise ValueError("document does not start with an RFC header")
    header = header_part[0]
    title = " ".join(body.pop(0)[0].split())
    for part in list(body):
        if isinstance(part, Part) and part.kind == "preamblesection" \
                and part.title == "Table of Contents":
            body.remove(part)
            break

    realid = get_rfc_num(header) or basefile
    uri = cfg.canonical_uri(realid)

    triples = [
        Triple.literal(uri, PROV + "wasGeneratedBy", cfg.generator),
        Triple.literal(uri, DCTERMS + "title", title, lang),
    ]
    triples += parse_header(header, uri, cfg, lookup)

    if not any(t.predicate == RDF_TYPE for t in triples):
        triples.append(Triple.uri(uri, RDF_TYPE, RFCNS + "RFC"))
    if not any(t.predicate == DCTERMS + "identifier" for t in triples):
        triples.append(Triple.literal(uri, DCTERMS + "identifier",
                                      "RFC %s" % basefile))

    shorttitle = _cleanup_pagebreaks(body)
    if shorttitle and shorttitle != title:
        triples.append(Triple.literal(uri, BIBO + "shortTitle", shorttitle, lang))

    # structure triples + per-part citations + per-part text
    sections: list[dict] = []
    texts: list[tuple[str, str]] = []
    ps_counter = [0]

    def emit_part(part, parent_uri):
        if part.kind == "preamblesection":
            ps_counter[0] += 1
            part_uri = uri + "#PS" + str(ps_counter[0])
            triples.append(Triple.uri(part_uri, RDF_TYPE, BIBO + "DocumentPart"))
            triples.append(Triple.literal(part_uri, DCTERMS + "title",
                                          part.title, lang))
            sections.append({"uri": part_uri, "ordinal": None,
                             "title": part.title, "parent": None})
        elif part.kind == "section":
            part_uri = uri + "#S" + part.ordinal
            triples.append(Triple.uri(part_uri, RDF_TYPE, BIBO + "DocumentPart"))
            triples.append(Triple.literal(part_uri, DCTERMS + "title",
                                          part.title, lang))
            triples.append(Triple.literal(part_uri, BIBO + "chapter",
                                          part.ordinal, lang))
            triples.append(Triple.literal(part_uri, DCTERMS + "identifier",
                                          part.identifier, lang))
            triples.append(Triple.uri(part_uri, DCTERMS + "isPartOf", parent_uri))
            sections.append({"uri": part_uri, "ordinal": part.ordinal,
                             "title": part.title, "parent": parent_uri})
        else:
            return parent_uri
        content = _strings(part)
        for target in sorted({c for s in content
                              for c in find_citations(s, uri, cfg)}):
            triples.append(Triple.uri(part_uri, DCTERMS + "references", target))
        texts.append((part_uri, normalize_space(" ".join(content))))
        return part_uri

    def walk(parts, parent_uri):
        for part in parts:
            if isinstance(part, str):
                continue
            part_uri = emit_part(part, parent_uri)
            walk(part, part_uri)

    walk(body, uri)

    # graph-set semantics: drop exact duplicates
    seen, deduped = set(), []
    for t in triples:
        if t not in seen:
            seen.add(t)
            deduped.append(t)
    return RFCDocument(uri, lang, deduped, sections, texts)
