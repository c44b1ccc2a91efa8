"""Coin URI-minting engine tests, mirroring the reference semantics
(ref ferenda/thirdparty/coin.py; config shape
ref ferenda/sources/legal/se/res/uri/swedishlegalsource.space.ttl)."""

import pytest

from ferenda_spark.coin import GraphIndex, URISpace
from ferenda_spark.model import Triple

SPACE_TTL = """
@prefix : <http://ex.org/space#> .
@prefix coin: <http://purl.org/court/def/2009/coin#> .
@prefix dcterms: <http://purl.org/dc/terms/> .
@prefix bibo: <http://purl.org/ontology/bibo/> .

: a coin:URISpace ;
    coin:base "http://ex.org" ;
    coin:fragmentSeparator "-" ;
    coin:slugTransform [ coin:apply coin:ToLowerCase ;
            coin:replace "é e" ;
            coin:spaceReplacement "_" ] ;
    coin:template
        [ coin:binding [ coin:property dcterms:identifier ] ;
            coin:uriTemplate "/doc/{identifier}" ],
        [ coin:binding [ coin:property dcterms:identifier ],
                [ coin:property dcterms:issued ] ;
            coin:uriTemplate "/doc/{identifier}/{issued}" ],
        [ coin:binding [ coin:property dcterms:publisher ;
                    coin:slugFrom :abbrSlug ;
                    coin:variable "pub" ],
                [ coin:property dcterms:identifier ] ;
            coin:priority 3 ;
            coin:uriTemplate "/doc/{pub}/{identifier}" ],
        [ coin:binding [ coin:property dcterms:type ;
                    coin:match "report" ;
                    coin:variable "t" ] ;
            coin:forType bibo:Report ;
            coin:priority 5 ;
            coin:uriTemplate "/report/{t}" ],
        [ coin:binding [ coin:property dcterms:title ] ;
            coin:forType bibo:DocumentPart ;
            coin:relToBase dcterms:isPartOf ;
            coin:fragmentTemplate "k_{title}" ] .

<http://other.org/p1> :abbrSlug "pub1" .
"""

DCT = "http://purl.org/dc/terms/"
BIBO = "http://purl.org/ontology/bibo/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture(scope="module")
def space():
    return URISpace.from_turtle(SPACE_TTL)


def _data(*triples):
    return GraphIndex(list(triples))


def test_template_ordering(space):
    """(priority, forType-specificity, #bindings) descending
    (ref coin.py:37-40)."""
    keys = [(t.priority, t.for_type is not None, len(t.bindings))
            for t in space.templates]
    assert keys == sorted(keys, reverse=True)


def test_simple_template_and_slug(space):
    d = _data(Triple.literal("s", DCT + "identifier", "Doc É 1"))
    assert space.coin_uri(d, "s") == "http://ex.org/doc/doc_e_1"


def test_specificity_more_bindings_win(space):
    """Same priority: the 2-binding template outranks the 1-binding."""
    d = _data(Triple.literal("s", DCT + "identifier", "x"),
              Triple.literal("s", DCT + "issued", "2014"))
    assert space.coin_uri(d, "s") == "http://ex.org/doc/x/2014"
    assert list(space.coin_uris(d, "s")) == [
        "http://ex.org/doc/x/2014", "http://ex.org/doc/x"]


def test_priority_beats_specificity(space):
    d = _data(Triple.literal("s", DCT + "identifier", "x"),
              Triple.literal("s", DCT + "issued", "2014"),
              Triple.uri("s", DCT + "publisher", "http://other.org/p1"))
    assert space.coin_uri(d, "s") == "http://ex.org/doc/pub1/x"


def test_slugfrom_space_graph_fallback(space):
    """The data graph has no :abbrSlug for the publisher; the slug
    database lives in the space graph (ref coin.py:222-229)."""
    d = _data(Triple.literal("s", DCT + "identifier", "x"),
              Triple.uri("s", DCT + "publisher", "http://other.org/p1"))
    assert space.coin_uri(d, "s") == "http://ex.org/doc/pub1/x"


def test_slugfrom_data_graph_priority(space):
    """A slug in the data graph wins over the space graph."""
    d = _data(Triple.literal("s", DCT + "identifier", "x"),
              Triple.uri("s", DCT + "publisher", "http://other.org/p1"),
              Triple.literal("http://other.org/p1",
                             "http://ex.org/space#abbrSlug", "localslug"))
    assert space.coin_uri(d, "s") == "http://ex.org/doc/localslug/x"


def test_slugfrom_missing_slug_fails_binding(space):
    d = _data(Triple.literal("s", DCT + "identifier", "x"),
              Triple.uri("s", DCT + "publisher", "http://other.org/p2"))
    assert space.coin_uri(d, "s") == "http://ex.org/doc/x"


def test_match_and_fortype_gating(space):
    yes = _data(Triple.uri("s", RDF_TYPE, BIBO + "Report"),
                Triple.literal("s", DCT + "type", "report"),
                Triple.literal("s", DCT + "identifier", "x"))
    assert space.coin_uri(yes, "s") == "http://ex.org/report/report"
    wrong_value = _data(Triple.uri("s", RDF_TYPE, BIBO + "Report"),
                        Triple.literal("s", DCT + "type", "memo"),
                        Triple.literal("s", DCT + "identifier", "x"))
    assert space.coin_uri(wrong_value, "s") == "http://ex.org/doc/x"
    wrong_type = _data(Triple.literal("s", DCT + "type", "report"),
                       Triple.literal("s", DCT + "identifier", "x"))
    assert space.coin_uri(wrong_type, "s") == "http://ex.org/doc/x"


def test_reltobase_recursion_and_fragment(space):
    """Part → parent (minted recursively) → doc; second-level fragment
    joins with the fragmentSeparator (ref coin.py:149-201)."""
    d = _data(Triple.literal("doc", DCT + "identifier", "d1"),
              Triple.uri("part", RDF_TYPE, BIBO + "DocumentPart"),
              Triple.literal("part", DCT + "title", "Kap 1"),
              Triple.uri("part", DCT + "isPartOf", "doc"),
              Triple.uri("sub", RDF_TYPE, BIBO + "DocumentPart"),
              Triple.literal("sub", DCT + "title", "Del 2"),
              Triple.uri("sub", DCT + "isPartOf", "part"))
    assert space.coin_uri(d, "part") == "http://ex.org/doc/d1#k_kap_1"
    assert space.coin_uri(d, "sub") == "http://ex.org/doc/d1#k_kap_1-k_del_2"


def test_reltobase_direct_base_inside_space(space):
    """A relToBase target already inside the URI space is used as-is
    (ref coin.py:185-188 guarded_base)."""
    d = _data(Triple.uri("part", RDF_TYPE, BIBO + "DocumentPart"),
              Triple.literal("part", DCT + "title", "T"),
              Triple.uri("part", DCT + "isPartOf", "http://ex.org/doc/z"))
    assert space.coin_uri(d, "part") == "http://ex.org/doc/z#k_t"


def test_unmintable_raises(space):
    d = _data(Triple.literal("s", DCT + "creator", "nobody"))
    with pytest.raises(ValueError):
        space.coin_uri(d, "s")


def test_reference_space_config_parses():
    """The engine loads the reference's real swedishlegalsource space
    config (structure parity; behavior spot-check on a doc shape from
    the slugs file)."""
    import os
    p = ("/root/reference/ferenda/sources/legal/se/res/uri/"
         "swedishlegalsource.space.ttl")
    if not os.path.exists(p):
        pytest.skip("reference tree not available")
    with open(p) as f:
        space = URISpace.from_turtle(f.read())
    assert space.base == "http://rinfo.lagrummet.se"
    assert len(space.templates) > 10
    RPUBL = "http://rinfo.lagrummet.se/ns/2008/11/rinfo/publ#"
    d = _data(Triple.uri("s", RPUBL + "utrSerie",
                         "http://rinfo.lagrummet.se/serie/utr/sou"),
              Triple.literal("s", RPUBL + "arsutgava", "1999"),
              Triple.literal("s", RPUBL + "lopnummer", "39"),
              Triple.literal("http://rinfo.lagrummet.se/serie/utr/sou",
                             "http://rinfo.lagrummet.se/sys/uri/space#"
                             "abbrSlug", "sou"))
    assert space.coin_uri(d, "s") == \
        "http://rinfo.lagrummet.se/publ/utr/sou/1999:39"


def test_distributed_minting_matches_single_node(spark):
    """groupBy(source_url).applyInPandas minting equals per-doc
    single-threaded minting over the synthetic corpus."""
    from ferenda_spark.extract import extract_document
    from ferenda_spark.operators.extract import extract_stage, triples_table
    from ferenda_spark.operators.minting import (default_space_ttl,
                                                 mint_rows, mint_uris)
    from ferenda_spark.pages import COMMONDATA, build_pages, page_row
    from ferenda_spark.uris import RepoConfig
    n = 30
    cfg = RepoConfig(alias="doc", url="http://example.org/")
    ttl = default_space_ttl()
    expected = []
    for i in range(n):
        page = page_row(i, n)
        d = extract_document(page["url"], page["html"], cfg,
                             dict(COMMONDATA))
        expected.extend((r["source_url"], r["subject"], r["minted"],
                         r["rank"])
                        for r in mint_rows(ttl, page["url"], d["triples"]))
    triples = triples_table(
        extract_stage(build_pages(spark, n, 4), cfg, COMMONDATA))
    got = [(r.source_url, r.subject, r.minted, r.rank)
           for r in mint_uris(triples, ttl).collect()]
    assert sorted(got) == sorted(expected)
    assert len(got) > n  # parts mint too


def test_sameas_alias_triples(spark):
    from ferenda_spark.operators.minting import (default_space_ttl,
                                                 mint_uris,
                                                 sameas_alias_triples)
    from ferenda_spark.operators.extract import extract_stage, triples_table
    from ferenda_spark.pages import COMMONDATA, build_pages
    from ferenda_spark.uris import RepoConfig
    cfg = RepoConfig(alias="doc", url="http://example.org/")
    triples = triples_table(
        extract_stage(build_pages(spark, 12, 4), cfg, COMMONDATA))
    minted = mint_uris(triples, default_space_ttl())
    alias = sameas_alias_triples(minted).collect()
    assert alias
    assert all(r.predicate.endswith("sameAs") and r.objtype == "uri"
               for r in alias)
    assert all(r.object.startswith("http://alt.example.org/") for r in alias)
