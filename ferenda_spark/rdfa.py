"""RDFa-subset distillation.

The reference derives each document's canonical triple set by serializing
the parsed document to XHTML+RDFa and re-parsing it with rdflib's RDFa
parser (ref ferenda/decorators.py:209-235, ferenda/documentrepository.py:
1387-1629). Our sources carry equivalent RDFa inline, and this module
extracts the same triple set directly — the subset of RDFa 1.1 the
reference's renderer actually emits:

- ``@about`` establishes the subject for the element and its descendants
- ``@typeof`` → rdf:type triples for the @about subject
- ``@property`` → literal triple; object is ``@content`` if present, else
  the element's text content; ``@datatype`` types it; language comes from
  the nearest ``@lang``/``@xml:lang`` ancestor (empty string suppresses)
- ``@rel`` + ``@href`` → URI-object triple
- CURIEs resolve against the fixed namespace dict
  (ref ferenda/util.py:78-93)
"""

from __future__ import annotations

from .htmltree import Node
from .model import Triple, resolve_uri
from .namespaces import NS, RDF_TYPE, expand_curie


def extract_rdfa(root: Node, doc_uri: str, default_lang: str = "") -> list[Triple]:
    triples: list[Triple] = []
    html = root.find("html") or root
    lang = html.get("xml:lang") or html.get("lang") or default_lang
    _walk(html, doc_uri, doc_uri, lang, triples)
    # de-duplicate preserving first occurrence (rdflib graphs are sets)
    seen: set[Triple] = set()
    out = []
    for t in triples:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def _node_lang(node: Node, inherited: str) -> str:
    lang = node.get("xml:lang")
    if lang is None:
        lang = node.get("lang")
    if lang is None:
        return inherited
    return lang  # explicit "" disables language tagging


def _text_content(node: Node) -> str:
    return "".join(node.itertext())


def _walk(node: Node, subject: str, doc_uri: str, lang: str, triples: list[Triple]):
    lang = _node_lang(node, lang)
    about = node.get("about")
    if about is not None:
        subject = resolve_uri(about, doc_uri)
    typeof = node.get("typeof")
    if typeof:
        for curie in typeof.split():
            triples.append(Triple.uri(subject, RDF_TYPE, expand_curie(curie)))
    rel = node.get("rel")
    href = node.get("href")
    if rel and href is not None:
        obj = resolve_uri(href, doc_uri)
        for curie in rel.split():
            triples.append(Triple.uri(subject, expand_curie(curie), obj))
    prop = node.get("property")
    if prop:
        datatype = node.get("datatype") or ""
        if node.get("content") is not None:
            value = node.get("content")
        else:
            value = _text_content(node)
        datatype_uri = expand_curie(datatype) if datatype else ""
        lit_lang = "" if datatype_uri else lang
        for curie in prop.split():
            triples.append(Triple.literal(
                subject, expand_curie(curie), value, lit_lang, datatype_uri))
    for child in node.children:
        _walk(child, subject, doc_uri, lang, triples)


__all__ = ["extract_rdfa", "NS"]
