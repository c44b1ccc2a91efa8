"""Core value types.

The reference keeps per-document metadata in an rdflib Graph
(ref ferenda/document.py:9-38); RDF literals do not fit a single Spark
type, so the engine's central table stores lexical form + objtype + lang +
datatype as companion columns (SURVEY.md §1.2).
"""

from __future__ import annotations

from typing import NamedTuple


class Triple(NamedTuple):
    subject: str
    predicate: str
    object: str
    objtype: str = "uri"  # 'uri' | 'literal'
    lang: str = ""
    datatype: str = ""

    @staticmethod
    def uri(s: str, p: str, o: str) -> "Triple":
        return Triple(s, p, o, "uri", "", "")

    @staticmethod
    def literal(s: str, p: str, o: str, lang: str = "", datatype: str = "") -> "Triple":
        return Triple(s, p, o, "literal", lang, datatype)

    def sortkey(self):
        return (self.subject, self.predicate, self.object, self.objtype,
                self.lang, self.datatype)


def resolve_uri(ref: str, base: str) -> str:
    """Resolve @about/@href refs against the document URI. Only the forms
    the corpus uses: absolute URIs pass through, '#frag' appends to base,
    other relative refs resolve against the base's directory."""
    if not ref:
        return base
    if "://" in ref or ref.startswith("urn:"):
        return ref
    if ref.startswith("#"):
        return base.split("#")[0] + ref
    # path-relative (rare in corpus); resolve against base directory
    stem = base.split("#")[0]
    return stem.rsplit("/", 1)[0] + "/" + ref
