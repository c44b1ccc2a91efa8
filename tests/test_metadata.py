"""Minimal-graph contract: 3 triples without title, 4 with
(ref test/testDocRepo.py:505-568; fixtures
test/files/base/downloaded/123/a-version{1,2}.htm)."""

from ferenda_spark.htmltree import parse_html
from ferenda_spark.metadata import metadata_triples
from ferenda_spark.namespaces import NS, RDF_TYPE
from ferenda_spark.uris import RepoConfig

V1 = b"""<html>
  <head>
    <!-- this version lacks a title and a lang attribute -->
  </head>
  <body>
    <p>This is a initial revision of a document.</p>
  </body>
</html>"""

V2 = b"""<html lang="en-GB">
  <head>
    <title>A document</title>
  </head>
  <body>
    <p>This is a updated revision of a document.</p>
    <p>It contains an extra paragraph and better metadata.</p>
  </body>
</html>"""

CFG = RepoConfig()
URI = CFG.canonical_uri("123/a")


def test_three_triples_without_title():
    lang, title, triples = metadata_triples(parse_html(V1), URI, "123/a", CFG)
    assert lang == "en"          # repo default fallback
    assert title is None
    assert len(triples) == 3
    preds = {t.predicate for t in triples}
    assert preds == {RDF_TYPE, NS["dcterms"] + "identifier",
                     NS["prov"] + "wasGeneratedBy"}
    ident = [t for t in triples if t.predicate == NS["dcterms"] + "identifier"][0]
    assert ident.object == "123/a" and ident.objtype == "literal"


def test_four_triples_with_title():
    lang, title, triples = metadata_triples(parse_html(V2), URI, "123/a", CFG)
    assert lang == "en-GB"
    assert title == "A document"
    assert len(triples) == 4
    t = [t for t in triples if t.predicate == NS["dcterms"] + "title"][0]
    assert t.object == "A document" and t.lang == "en-GB"


def test_ntriples_roundtrip():
    """to_ntriples → parse_turtle (nt is a turtle subset) preserves the
    graph, including escapes and datatypes/langs."""
    from ferenda_spark.model import Triple
    from ferenda_spark.rdfio import parse_turtle, to_ntriples
    triples = [
        Triple.uri("http://e.org/a", "http://e.org/p", "http://e.org/b"),
        Triple.literal("http://e.org/a", "http://e.org/t",
                       'quote " backslash \\ newline\ntab\t end'),
        Triple.literal("http://e.org/a", "http://e.org/l", "hej", lang="sv"),
        Triple.literal("http://e.org/a", "http://e.org/d", "2014-01-04",
                       datatype="http://www.w3.org/2001/XMLSchema#date"),
    ]
    nt = to_ntriples(triples)
    assert set(parse_turtle(nt)) == set(triples)
    # serialization is deterministic (sorted)
    assert nt == to_ntriples(list(reversed(triples)))
