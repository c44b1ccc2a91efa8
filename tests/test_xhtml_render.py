"""render_xhtml sink: the serialize → re-parse → same-graph invariant
(the reference's own completeness self-check for its parse sink,
ref ferenda/decorators.py:209-235, documentrepository.py:1387-1629)."""

import pytest

from ferenda_spark.extract import extract_document
from ferenda_spark.htmltree import parse_html
from ferenda_spark.model import Triple
from ferenda_spark.pages import COMMONDATA, page_row
from ferenda_spark.rdfa import extract_rdfa
from ferenda_spark.uris import RepoConfig
from ferenda_spark.xhtml import render_document

CFG = RepoConfig(alias="doc", url="http://example.org/")


def _roundtrip(uri, lang, title, triples, resources):
    rendered = render_document(uri, lang, title, triples, resources)
    return rendered, extract_rdfa(parse_html(rendered.encode("utf-8")), uri)


def test_roundtrip_whole_corpus_sample():
    """Every family of the synthetic corpus round-trips exactly: the
    re-extracted RDFa graph equals the document's triple set."""
    n = 120
    for i in range(n):
        row = page_row(i, n)
        d = extract_document(row["url"], row["html"], CFG, COMMONDATA)
        assert d["status"] == "ok"
        _, back = _roundtrip(d["uri"], d["lang"], d["title"],
                             d["triples"], d["resources"])
        assert set(back) == set(d["triples"]), row["url"]
        # per-document extraction is already deduplicated, so the
        # round trip must also preserve cardinality
        assert len(back) == len(d["triples"])


def test_roundtrip_hostile_literals():
    uri = "http://example.org/doc/x"
    triples = [
        Triple.uri(uri, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                   "http://purl.org/ontology/bibo/Standard"),
        Triple.literal(uri, "http://purl.org/dc/terms/title",
                       'He said "hi" & <waved>', "en"),
        # newlines/tabs survive because the consumer is html.parser,
        # which does not apply XML attribute-value normalization
        Triple.literal(uri, "http://purl.org/dc/terms/abstract",
                       "line1\nline2\ttabbed", ""),
        Triple.literal(uri, "http://purl.org/dc/terms/identifier",
                       "RFC 1234", "",
                       "http://www.w3.org/2001/XMLSchema#string"),
        Triple.literal(uri + "#S1", "http://purl.org/dc/terms/title",
                       "Händelser på väg — åäö", "sv"),
        Triple.uri(uri, "http://www.w3.org/2002/07/owl#sameAs",
                   "http://other.example/ns?q=1&r=2"),
        # predicate outside the namespace table → full-URI fallback
        Triple.uri(uri + "#S1", "http://unregistered.example/ont/ref",
                   "urn:ietf:rfc:1234"),
        Triple.literal(uri, "http://purl.org/dc/terms/description",
                       "", "en-GB"),
        Triple.literal(uri, "http://purl.org/dc/terms/subject",
                       "ends with space ", ""),
    ]
    resources = [(uri, "body text with <angle> & amp"),
                 (uri + "#S1", 'quote " inside')]
    rendered, back = _roundtrip(uri, "en", 'Ti<tle & "q"', triples,
                                resources)
    assert set(back) == set(triples)
    assert len(back) == len(triples)
    # the content really is in the document, escaped
    assert "body text with &lt;angle&gt; &amp; amp" in rendered


def test_lang_suppression_explicit_empty():
    """A lang-less literal under a lang-carrying document must NOT
    inherit the document language (xml:lang=\"\" disables RDFa
    inheritance — ref rdfa semantics, rdfa.py)."""
    uri = "http://example.org/doc/y"
    t = [Triple.literal(uri, "http://purl.org/dc/terms/identifier",
                        "Doc Y", "")]
    _, back = _roundtrip(uri, "sv", "t", t, [])
    assert back == t
    assert back[0].lang == ""


def test_spark_stage_roundtrip_equals_triples_table(spark):
    """Distributed render + re-extract reproduces triples_table
    row-for-row (the kg_xhtml_roundtrip driver query's check)."""
    from ferenda_spark.operators.extract import extract_stage, triples_table
    from ferenda_spark.operators.render import (render_xhtml_stage,
                                                roundtrip_triples)
    from ferenda_spark.pages import build_pages
    pages = build_pages(spark, 60, 4)
    extracted = extract_stage(pages, CFG, COMMONDATA).localCheckpoint()
    expected = sorted(map(tuple, triples_table(extracted, "kg").collect()))
    rendered = render_xhtml_stage(extracted)
    got = sorted(map(tuple, roundtrip_triples(rendered, "kg").collect()))
    assert got == expected
    # and the rendered column is real XHTML, one per document
    sample = rendered.limit(3).collect()
    assert len(sample) == 3
    for r in sample:
        assert r.xhtml.startswith('<?xml version="1.0"')
        assert 'about="%s"' % r.uri in r.xhtml


def test_nquads_lines_matches_single_node_serializer(spark):
    """Distributed N-Quads projection ≡ rdfio.to_ntriples on
    default-graph rows (escaping corners included), quad form for
    named graphs, and the output re-parses to the same triples."""
    from ferenda_spark.model import Triple
    from ferenda_spark.operators.render import nquads_lines
    from ferenda_spark.rdfio import parse_turtle, to_ntriples
    rows = [
        ("s1", "p", 'say "hi"\nback\\slash\ttab', "literal", "", "", ""),
        ("s1", "p", "plain", "literal", "en", "", ""),
        ("s1", "p", "2020", "literal", "",
         "http://www.w3.org/2001/XMLSchema#gYear", ""),
        ("s1", "p", "u1", "uri", "", "", ""),
        ("s2", "p", "in-graph", "literal", "", "", "g1"),
    ]
    df = spark.createDataFrame(
        rows, "subject string, predicate string, object string, "
              "objtype string, lang string, datatype string, "
              "context string")
    lines = sorted(r["line"] for r in nquads_lines(df).collect())
    # default-graph rows equal the single-node N-Triples serializer
    triples = [Triple(s, p, o, ot, lg, dt)
               for s, p, o, ot, lg, dt, cx in rows if not cx]
    expected_nt = sorted(
        line for line in to_ntriples(triples).splitlines())
    assert [ln for ln in lines if not ln.endswith("<g1> .")] \
        == expected_nt
    assert '<s2> <p> "in-graph" <g1> .' in lines
    # round-trip: the escaped literal survives parse
    parsed = parse_turtle("\n".join(
        ln for ln in lines if not ln.endswith("<g1> .")))
    objs = {t.object for t in parsed}
    assert 'say "hi"\nback\\slash\ttab' in objs
