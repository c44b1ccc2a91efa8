"""Heading-based structural segmentation for HTML docs (W3C-style).

The reference runs its FSM over flat sibling h1-h4 elements, rebuilding
logical nesting from ordinal depth (ref ferenda/sources/tech/w3c.py:84-207
analyze_sectionstart over element chunks), then decorates each Section
with uri = base + "#S" + ordinal and a mini-graph {rdf:type
bibo:DocumentPart, dcterms:title, bibo:chapter ordinal} with
dcterms:isPartOf implied by nesting (ref w3c.py:290-303,
ferenda/elements/elements.py:608-662).

Documents that already carry @about-addressed sub-resources (F2 family)
skip this pass — their structure is explicit RDFa.
"""

from __future__ import annotations

import re

from .htmltree import Node
from .model import Triple
from .namespaces import NS, RDF_TYPE
from .textextract import normalize_space

DCTERMS = NS["dcterms"]
BIBO = NS["bibo"]

_HEADINGS = {"h1", "h2", "h3", "h4"}
_RE_ORDINAL = re.compile(r"^(\d+(?:\.\d+)*)\.? +(.+?)\s*$")


def _heading_info(node: Node):
    if node.tag not in _HEADINGS:
        return None
    m = _RE_ORDINAL.match(normalize_space("".join(node.itertext())))
    if not m:
        return None
    ordinal = m.group(1)
    return ordinal, m.group(2), ordinal.count(".") + 1


def _block_text(node: Node) -> str:
    return "".join(node.itertext()) + " "


def segment_headings(body: Node, doc_uri: str, lang: str):
    """Returns (triples, texts, found) where texts is
    [(resource_uri, normalized_text)] for each section, and ``found``
    says whether any ordinal heading was seen."""
    triples: list[Triple] = []
    texts: list[tuple[str, str]] = []
    # stack of (depth, uri, [text_chunks])
    stack: list[tuple[int, str, list[str]]] = []
    doc_chunks: list[str] = [body.text or ""]
    found = False

    def close_to(depth: int):
        while stack and stack[-1][0] >= depth:
            _, uri, chunks = stack.pop()
            texts.append((uri, normalize_space("".join(chunks))))

    for child in body.children:
        info = _heading_info(child)
        if info:
            found = True
            ordinal, title, depth = info
            close_to(depth)
            parent_uri = stack[-1][1] if stack else doc_uri
            sec_uri = doc_uri + "#S" + ordinal
            triples.append(Triple.uri(sec_uri, RDF_TYPE, BIBO + "DocumentPart"))
            triples.append(Triple.literal(sec_uri, DCTERMS + "title", title, lang))
            triples.append(Triple.literal(sec_uri, BIBO + "chapter", ordinal, lang))
            triples.append(Triple.uri(sec_uri, DCTERMS + "isPartOf", parent_uri))
            stack.append((depth, sec_uri, []))
        else:
            chunk = _block_text(child) + (child.tail or "")
            if stack:
                stack[-1][2].append(chunk)
            else:
                doc_chunks.append(chunk)
    close_to(1)
    # section texts in document order (stack closing reverses siblings)
    order = {doc_uri + "#S" + t.object: None
             for t in triples if t.predicate == BIBO + "chapter"}
    texts.sort(key=lambda item: list(order).index(item[0]))
    return triples, texts, found, normalize_space("".join(doc_chunks))
