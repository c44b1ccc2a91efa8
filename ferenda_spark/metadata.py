"""Document-level metadata triples — parse_metadata_from_soup semantics.

ref ferenda/documentrepository.py:1209-1249:
- doc.lang = html/@xml:lang, else html/@lang, else repo default
- title = first <title> string (None when absent)
- emits rdf:type (repo rdf_type, default foaf:Document), dcterms:title
  with @lang when a title exists, dcterms:identifier = basefile (plain
  literal), prov:wasGeneratedBy = qualified class name

Minimal-graph contract: 3 triples for a title-less doc, 4 with title
(ref test/testDocRepo.py:505-568).
"""

from __future__ import annotations

from .htmltree import Node
from .model import Triple
from .namespaces import NS, RDF_TYPE
from .uris import RepoConfig

DCTERMS = NS["dcterms"]
PROV = NS["prov"]


def doc_lang(root: Node, default: str) -> str:
    html = root.find("html")
    if html is not None:
        lang = html.get("xml:lang") or html.get("lang")
        if lang:
            return lang
    return default


def doc_title(root: Node) -> str | None:
    title = root.find("title")
    if title is None:
        return None
    # bs4 .string: None unless the tag has exactly one string child
    if title.children:
        return None
    return title.text or None


def metadata_triples(root: Node, uri: str, basefile: str,
                     cfg: RepoConfig) -> tuple[str, str | None, list[Triple]]:
    """Returns (lang, title, triples)."""
    lang = doc_lang(root, cfg.lang)
    title = doc_title(root)
    triples = [Triple.uri(uri, RDF_TYPE, cfg.rdf_type)]
    if title:
        triples.append(Triple.literal(uri, DCTERMS + "title", title, lang))
    triples.append(Triple.literal(uri, DCTERMS + "identifier", basefile))
    triples.append(Triple.literal(uri, PROV + "wasGeneratedBy", cfg.generator))
    return lang, title, triples
