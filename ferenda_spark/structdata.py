"""Embedded structured-data extraction: JSON-LD + HTML microdata →
RDF triples.

This is the Web Data Commons pass over Common-Crawl-style pages — the
single largest real-world source of schema.org knowledge-graph triples
— re-expressed for this engine. The reference mines RDFa attributes
from its own rendered XHTML (ferenda/documentrepository.py:2182-2217
via rdflib's RDFa parser; our twin of that is
ferenda_spark/rdfa.py); raw web pages carry the same facts as
``<script type="application/ld+json">`` blocks and
itemscope/itemprop microdata, so this module lifts those two syntaxes
into the same (subject, predicate, object, objtype) triple shape the
rest of the pipeline consumes.

Pure single-document kernels (no Spark): the distributed operator
(:mod:`ferenda_spark.operators.structdata`) calls them from an
Arrow-batched ``mapInPandas`` stage, and the pytest goldens pin their
semantics case by case.

Supported subset, documented against the public specs:

JSON-LD (W3C JSON-LD 1.1, processing subset):
- every well-formed ``application/ld+json`` script block in document
  order; blocks that fail ``json.loads`` are skipped (real crawl data
  is full of them);
- top level may be a node object, an array of node objects, or a
  ``@graph`` wrapper (context honored);
- ``@context``: the schema.org IRI in any spelling
  (http/https, trailing slash or not) normalizes to the canonical
  ``http://schema.org/`` vocabulary (the Web Data Commons convention);
  a context map supports ``@vocab`` and prefix→IRI string entries;
  contexts in list form fold left; any other remote context is
  ignored (names then expand against whatever vocab/prefixes are in
  scope);
- term expansion: absolute IRIs pass through, ``prefix:rest`` expands
  when the prefix is declared, otherwise ``vocab + name`` when a
  vocabulary is in scope and the bare name when not;
- ``@id`` resolves against the page URL (RFC 3986 join — relative ids
  are common in the wild); nodes without ``@id`` get document-scoped
  blank-node labels ``_:b0, _:b1, …`` in first-encounter order;
- ``@type`` (string or list) → rdf:type triples with IRI objects;
- values: strings → literals; numbers/booleans → canonical lexical
  literals (``true``/``false``, integer digits, repr floats); ``null``
  skipped; arrays → one triple per element; ``@value`` wrappers →
  their literal; nested node objects recurse (the triple points at the
  child's subject). Typed/keyword-mapped contexts (``@type``:
  ``@id`` coercion etc.) are NOT interpreted — strings stay literals.

Microdata (W3C "Microdata to RDF", core algorithm):
- every ``itemscope`` element in document order is an item; subject =
  ``itemid`` resolved against the page URL, else a blank node labeled
  in first-reference order (shared counter with nothing else — labels
  are scoped per (page, syntax));
- ``itemtype`` (space-separated) → rdf:type per absolute IRI; the
  FIRST type's IRI up to its last ``/`` or ``#`` becomes the property
  vocabulary;
- ``itemprop`` names (space-separated, one triple each) expand:
  absolute IRIs pass through, else vocabulary + name, bare name when
  the item has no type;
- property values by element: nested ``itemscope`` → that item's
  subject (descent stops there — its own props are its own);
  ``meta`` → @content; ``a``/``area``/``link`` → @href resolved,
  object is an IRI; ``img``/``audio``/``video``/``embed``/``iframe``/
  ``source``/``track`` → @src resolved, IRI; ``object`` → @data
  resolved, IRI; ``time`` → @datetime else text; ``data``/``meter`` →
  @value else text; anything else → concatenated descendant text;
- ``itemref`` is not supported (skipped; it needs document-global id
  resolution that the wild rarely uses and nothing downstream needs).

Triple shape: ``(subject, predicate, object, objtype)`` with objtype ∈
{'uri', 'literal', 'bnode'}; blank-node labels appear in subject
position as-is (they are scoped by the page URL column the operator
adds, like N-Quads contexts).
"""

from __future__ import annotations

import json
import re
from urllib.parse import urljoin

from .namespaces import RDF_TYPE

_SCHEMA_ORG = re.compile(r"^https?://schema\.org/?$")
_ABSOLUTE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")

Triple = tuple  # (subject, predicate, object, objtype)


# --------------------------------------------------------------- JSON-LD

def _fold_context(ctx, vocab, prefixes):
    """One @context value → (vocab, prefixes), folding over lists."""
    if isinstance(ctx, list):
        for c in ctx:
            vocab, prefixes = _fold_context(c, vocab, prefixes)
        return vocab, prefixes
    if isinstance(ctx, str):
        if _SCHEMA_ORG.match(ctx):
            return "http://schema.org/", prefixes
        return vocab, prefixes          # unfetchable remote context
    if isinstance(ctx, dict):
        prefixes = dict(prefixes)
        for term, val in ctx.items():
            if term == "@vocab" and isinstance(val, str):
                vocab = ("http://schema.org/"
                         if _SCHEMA_ORG.match(val) else val)
            elif isinstance(val, str) and not term.startswith("@"):
                prefixes[term] = val
        return vocab, prefixes
    return vocab, prefixes


def _expand(name: str, vocab, prefixes) -> str:
    if _ABSOLUTE.match(name):
        return name
    if ":" in name:
        pfx, rest = name.split(":", 1)
        if pfx in prefixes:
            return prefixes[pfx] + rest
    return vocab + name if vocab else name


def _literal(value):
    """JSON scalar → lexical form, or None to skip."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, str):
        return value
    return None


def jsonld_triples(html, base_uri: str) -> list[Triple]:
    """All JSON-LD blocks in the page → triples (see module doc)."""
    from .htmltree import parse_html
    root = parse_html(html)
    out: list[Triple] = []
    counter = [0]

    def node_subject(node, vocab, prefixes):
        nid = node.get("@id")
        if isinstance(nid, str) and nid:
            return urljoin(base_uri, nid), "uri"
        label = "_:b%d" % counter[0]
        counter[0] += 1
        return label, "bnode"

    def walk(node, vocab, prefixes):
        """Emit one node object's triples; → (subject, subjtype)."""
        if "@context" in node:
            vocab, prefixes = _fold_context(node["@context"],
                                            vocab, prefixes)
        subj, stype = node_subject(node, vocab, prefixes)
        types = node.get("@type")
        if isinstance(types, str):
            types = [types]
        if isinstance(types, list):
            for t in types:
                if isinstance(t, str):
                    out.append((subj, RDF_TYPE,
                                _expand(t, vocab, prefixes), "uri"))
        for key, value in node.items():
            if key.startswith("@"):
                continue
            pred = _expand(key, vocab, prefixes)
            values = value if isinstance(value, list) else [value]
            for v in values:
                if isinstance(v, dict):
                    if "@value" in v:
                        lex = _literal(v["@value"])
                        if lex is not None:
                            out.append((subj, pred, lex, "literal"))
                    else:
                        child, ctype = walk(v, vocab, prefixes)
                        out.append((subj, pred, child, ctype))
                else:
                    lex = _literal(v)
                    if lex is not None:
                        out.append((subj, pred, lex, "literal"))
        return subj, stype

    for script in (n for n in root.iter() if n.tag == "script"):
        if (script.get("type") or "").strip() != "application/ld+json":
            continue
        try:
            data = json.loads("".join(script.itertext()))
        except ValueError:
            continue
        vocab, prefixes = None, {}
        if isinstance(data, dict) and "@context" in data:
            vocab, prefixes = _fold_context(data["@context"],
                                            vocab, prefixes)
        if isinstance(data, dict) and isinstance(data.get("@graph"),
                                                 list):
            nodes = data["@graph"]
        elif isinstance(data, list):
            nodes = data
        else:
            nodes = [data]
        for node in nodes:
            if isinstance(node, dict):
                walk(node, vocab, prefixes)
    return out


# -------------------------------------------------------------- microdata

_SRC_TAGS = frozenset(
    "img audio video embed iframe source track".split())


def _md_vocab(itemtype: str | None):
    if not itemtype:
        return None
    first = itemtype.split()[0] if itemtype.split() else ""
    if not _ABSOLUTE.match(first):
        return None
    cut = max(first.rfind("/"), first.rfind("#"))
    return first[:cut + 1] if cut > 0 else None


def microdata_triples(html, base_uri: str) -> list[Triple]:
    """All itemscope items in the page → triples (see module doc)."""
    from .htmltree import parse_html
    root = parse_html(html)
    out: list[Triple] = []
    counter = [0]
    labels: dict[int, str] = {}

    def subject_of(node):
        itemid = node.get("itemid")
        if itemid:
            return urljoin(base_uri, itemid), "uri"
        if id(node) not in labels:
            labels[id(node)] = "_:b%d" % counter[0]
            counter[0] += 1
        return labels[id(node)], "bnode"

    def prop_value(el):
        """→ (lexical value, objtype) for a non-itemscope prop node."""
        tag = el.tag
        if tag == "meta":
            return el.get("content") or "", "literal"
        if tag in ("a", "area", "link"):
            return urljoin(base_uri, el.get("href") or ""), "uri"
        if tag in _SRC_TAGS:
            return urljoin(base_uri, el.get("src") or ""), "uri"
        if tag == "object":
            return urljoin(base_uri, el.get("data") or ""), "uri"
        if tag == "time" and el.get("datetime") is not None:
            return el.get("datetime"), "literal"
        if tag in ("data", "meter") and el.get("value") is not None:
            return el.get("value"), "literal"
        return "".join(el.itertext()), "literal"

    def props_of(item):
        """itemprop-carrying descendants, descent stopping at nested
        itemscope nodes (which ARE values but own their subtrees)."""
        found = []

        def descend(el):
            for child in el.children:
                if child.get("itemprop") is not None:
                    found.append(child)
                if child.get("itemscope") is None:
                    descend(child)
        descend(item)
        return found

    items = [n for n in root.iter() if n.get("itemscope") is not None]
    for item in items:
        subj, _ = subject_of(item)
        vocab = _md_vocab(item.get("itemtype"))
        for t in (item.get("itemtype") or "").split():
            if _ABSOLUTE.match(t):
                out.append((subj, RDF_TYPE, t, "uri"))
        for el in props_of(item):
            if el.get("itemscope") is not None:
                value, vtype = subject_of(el)
            else:
                value, vtype = prop_value(el)
            for name in (el.get("itemprop") or "").split():
                pred = (name if _ABSOLUTE.match(name)
                        else (vocab + name if vocab else name))
                out.append((subj, pred, value, vtype))
    return out
