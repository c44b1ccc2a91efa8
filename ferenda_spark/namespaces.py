"""RDF namespace registry.

Mirrors the fixed prefix dict the reference binds on every document graph
(ref ferenda/util.py:78-93, ferenda/documentrepository.py:1363-1375), plus
the rfc ontology namespace used by its RFC repo
(ref ferenda/sources/tech/rfc.py).
"""

from __future__ import annotations

NS: dict[str, str] = {
    "dc": "http://purl.org/dc/elements/1.1/",
    "dcterms": "http://purl.org/dc/terms/",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xhv": "http://www.w3.org/1999/xhtml/vocab#",
    "prov": "http://www.w3.org/ns/prov#",
    "bibo": "http://purl.org/ontology/bibo/",
    "schema": "http://schema.org/",
    "olo": "http://purl.org/ontology/olo/core#",
    "rfc": "http://example.org/ontology/rfc/",
}

RDF_TYPE = NS["rdf"] + "type"
OWL_SAMEAS = NS["owl"] + "sameAs"
FOAF_DOCUMENT = NS["foaf"] + "Document"


def expand_curie(curie: str, extra: dict[str, str] | None = None) -> str:
    """Expand ``dcterms:title`` → full URI. Absolute URIs pass through.

    Used by the RDFa-subset extractor and triple constructors; mirrors
    rdflib qname resolution against the bound prefixes.
    """
    if ":" not in curie:
        return curie
    prefix, _, local = curie.partition(":")
    table = NS if extra is None else {**NS, **extra}
    if prefix in table:
        return table[prefix] + local
    return curie  # already absolute (http:, urn:, ...)


def qname(uri: str) -> str:
    """Compact a URI back to prefix:local when a registered prefix matches.

    Mirrors Graph.qname use in facet column naming
    (ref ferenda/facet.py:327-338, ferenda/documentrepository.py:2268).
    """
    best = None
    for prefix, ns in NS.items():
        if uri.startswith(ns) and (best is None or len(ns) > len(NS[best])):
            best = prefix
    if best is None:
        return uri
    return "%s:%s" % (best, uri[len(NS[best]):])
