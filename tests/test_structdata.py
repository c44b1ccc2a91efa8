"""Semantics goldens for the JSON-LD / microdata extraction kernels
(ferenda_spark/structdata.py) and the distributed operator plumbing.

These pin the documented subset against hand-derived triples — the
driver query's oracle (kg_structured_data) is generative (it states
the expected triples by formula), so the spec corner cases live here.
"""

from ferenda_spark.namespaces import RDF_TYPE
from ferenda_spark.structdata import jsonld_triples, microdata_triples

BASE = "https://ex.org/page"


def _ld(block: str) -> str:
    return ('<html><head><script type="application/ld+json">%s'
            "</script></head><body/></html>" % block)


def test_jsonld_context_variants_normalize_to_canonical_vocab():
    for ctx in ('"https://schema.org"', '"http://schema.org/"',
                '{"@vocab": "https://schema.org/"}'):
        got = jsonld_triples(
            _ld('{"@context": %s, "name": "x"}' % ctx), BASE)
        assert got == [("_:b0", "http://schema.org/name", "x",
                        "literal")]


def test_jsonld_prefix_map_and_absolute_and_bare_names():
    block = ('{"@context": {"dc": "http://purl.org/dc/terms/"},'
             ' "dc:title": "t",'
             ' "http://x.org/p": "v",'
             ' "bare": "b"}')
    got = jsonld_triples(_ld(block), BASE)
    assert got == [
        ("_:b0", "http://purl.org/dc/terms/title", "t", "literal"),
        ("_:b0", "http://x.org/p", "v", "literal"),
        ("_:b0", "bare", "b", "literal"),          # no vocab in scope
    ]


def test_jsonld_graph_wrapper_and_relative_id_resolution():
    block = ('{"@context": "https://schema.org", "@graph": ['
             '{"@id": "/a", "name": "A"},'
             '{"@id": "https://other.org/b", "name": "B"}]}')
    got = jsonld_triples(_ld(block), BASE)
    assert got == [
        ("https://ex.org/a", "http://schema.org/name", "A", "literal"),
        ("https://other.org/b", "http://schema.org/name", "B",
         "literal"),
    ]


def test_jsonld_scalars_value_wrapper_and_null():
    block = ('{"@context": "https://schema.org", "a": true, "b": 2.5,'
             ' "c": null, "d": {"@value": 3}, "e": [1, "x"]}')
    got = jsonld_triples(_ld(block), BASE)
    assert got == [
        ("_:b0", "http://schema.org/a", "true", "literal"),
        ("_:b0", "http://schema.org/b", "2.5", "literal"),
        ("_:b0", "http://schema.org/d", "3", "literal"),
        ("_:b0", "http://schema.org/e", "1", "literal"),
        ("_:b0", "http://schema.org/e", "x", "literal"),
    ]


def test_jsonld_type_list_nested_nodes_and_bnode_order():
    block = ('{"@context": "https://schema.org",'
             ' "@type": ["Article", "http://x.org/T"],'
             ' "author": {"name": "n"},'
             ' "publisher": {"name": "p"}}')
    got = jsonld_triples(_ld(block), BASE)
    assert got == [
        ("_:b0", RDF_TYPE, "http://schema.org/Article", "uri"),
        ("_:b0", RDF_TYPE, "http://x.org/T", "uri"),
        ("_:b1", "http://schema.org/name", "n", "literal"),
        ("_:b0", "http://schema.org/author", "_:b1", "bnode"),
        ("_:b2", "http://schema.org/name", "p", "literal"),
        ("_:b0", "http://schema.org/publisher", "_:b2", "bnode"),
    ]


def test_jsonld_bad_json_skipped_good_blocks_still_parse():
    html = ('<html><head>'
            '<script type="application/ld+json">{nope</script>'
            '<script type="application/ld+json">'
            '{"@context": "https://schema.org", "name": "ok"}'
            '</script></head></html>')
    got = jsonld_triples(html, BASE)
    assert got == [("_:b0", "http://schema.org/name", "ok", "literal")]


def test_jsonld_non_ld_scripts_ignored():
    html = ('<html><head><script>var x = {"name": "no"};</script>'
            '</head></html>')
    assert jsonld_triples(html, BASE) == []


def test_microdata_bnode_item_and_text_value():
    html = ('<div itemscope><span itemprop="name">A <b>B</b> C'
            '</span></div>')
    got = microdata_triples(html, BASE)
    assert got == [("_:b0", "name", "A B C", "literal")]


def test_microdata_vocab_from_first_type_all_types_emitted():
    html = ('<div itemscope itemtype="https://schema.org/Book'
            ' http://x.org/T relative">'
            '<span itemprop="name">n</span></div>')
    got = microdata_triples(html, BASE)
    assert got == [
        ("_:b0", RDF_TYPE, "https://schema.org/Book", "uri"),
        ("_:b0", RDF_TYPE, "http://x.org/T", "uri"),  # relative skipped
        ("_:b0", "https://schema.org/name", "n", "literal"),
    ]


def test_microdata_nested_item_owns_its_props():
    html = ('<div itemscope itemtype="https://schema.org/Product"'
            ' itemid="/p">'
            '<div itemprop="brand" itemscope'
            ' itemtype="https://schema.org/Brand">'
            '<span itemprop="name">Inner</span></div>'
            '<span itemprop="name">Outer</span></div>')
    got = microdata_triples(html, BASE)
    assert got == [
        ("https://ex.org/p", RDF_TYPE, "https://schema.org/Product",
         "uri"),
        ("https://ex.org/p", "https://schema.org/brand", "_:b0",
         "bnode"),
        ("https://ex.org/p", "https://schema.org/name", "Outer",
         "literal"),
        ("_:b0", RDF_TYPE, "https://schema.org/Brand", "uri"),
        ("_:b0", "https://schema.org/name", "Inner", "literal"),
    ]


def test_microdata_value_extraction_table():
    html = ('<div itemscope itemtype="https://schema.org/Event">'
            '<meta itemprop="sku" content="S1">'
            '<a itemprop="url" href="/e">x</a>'
            '<img itemprop="image" src="/i.png">'
            '<time itemprop="startDate" datetime="2026-01-01">'
            'Jan 1</time>'
            '<data itemprop="code" value="42">forty-two</data>'
            '</div>')
    got = microdata_triples(html, BASE)
    V = "https://schema.org/"
    assert got == [
        ("_:b0", RDF_TYPE, V + "Event", "uri"),
        ("_:b0", V + "sku", "S1", "literal"),
        ("_:b0", V + "url", "https://ex.org/e", "uri"),
        ("_:b0", V + "image", "https://ex.org/i.png", "uri"),
        ("_:b0", V + "startDate", "2026-01-01", "literal"),
        ("_:b0", V + "code", "42", "literal"),
    ]


def test_microdata_multiple_itemprop_names_and_absolute_prop():
    html = ('<div itemscope itemtype="https://schema.org/Thing">'
            '<span itemprop="name http://x.org/alias">v</span></div>')
    got = microdata_triples(html, BASE)
    assert got == [
        ("_:b0", RDF_TYPE, "https://schema.org/Thing", "uri"),
        ("_:b0", "https://schema.org/name", "v", "literal"),
        ("_:b0", "http://x.org/alias", "v", "literal"),
    ]


def test_operator_plumbing_binary_html_and_scoping(spark):
    from ferenda_spark.operators.structdata import structured_triples
    html = ('<html><head><script type="application/ld+json">'
            '{"@context": "https://schema.org", "name": "ok"}'
            '</script></head><body>'
            '<div itemscope itemtype="https://schema.org/Thing">'
            '<span itemprop="name">t</span></div></body></html>')
    pages = spark.createDataFrame(
        [("https://a.example/1", bytearray(html.encode())),
         ("https://a.example/2", bytearray(html.encode()))],
        "url string, html binary")
    rows = sorted((r["source_url"], r["syntax"], r["subject"],
                   r["predicate"], r["object"], r["objtype"])
                  for r in structured_triples(pages).collect())
    # same bnode label per page — scoped by (source_url, syntax)
    assert rows == sorted(
        [(u, "jsonld", "_:b0", "http://schema.org/name", "ok",
          "literal") for u in ("https://a.example/1",
                               "https://a.example/2")] +
        [(u, "microdata", "_:b0", RDF_TYPE,
          "https://schema.org/Thing", "uri")
         for u in ("https://a.example/1", "https://a.example/2")] +
        [(u, "microdata", "_:b0", "https://schema.org/name", "t",
          "literal") for u in ("https://a.example/1",
                               "https://a.example/2")])
