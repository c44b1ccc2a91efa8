"""SPARQL-subset compiler: parser unit checks, Spark↔DuckDB
cross-compiler parity on a hand-built graph, and semantic goldens for
the constructs the reference's own queries use (OPTIONAL null rows,
FILTER IN, regex, DISTINCT, repeated-variable patterns)."""

import duckdb
import pandas as pd
import pytest

from ferenda_spark import sparql

DCT = "http://purl.org/dc/terms/"
FOAF = "http://xmlns.com/foaf/0.1/"
RDF_TYPE = sparql.RDF_TYPE

TRIPLES = [
    # (subject, predicate, object, objtype, lang)
    ("d1", RDF_TYPE, FOAF + "Document", "uri", ""),
    ("d1", DCT + "title", "Alpha report", "literal", "en"),
    ("d1", DCT + "identifier", "3", "literal", ""),
    ("d1", DCT + "publisher", "p1", "uri", ""),
    ("d2", RDF_TYPE, FOAF + "Document", "uri", ""),
    ("d2", DCT + "title", "Beta memo", "literal", "en"),
    ("d2", DCT + "identifier", "12", "literal", ""),
    ("d3", RDF_TYPE, FOAF + "Document", "uri", ""),
    ("d3", DCT + "title", "Gamma", "literal", "sv", ),
    ("d3", DCT + "identifier", "7", "literal", ""),
    ("d3", DCT + "publisher", "p2", "uri", ""),
    ("d3", DCT + "isPartOf", "d1", "uri", ""),
    ("p1", RDF_TYPE, FOAF + "Organization", "uri", ""),
    ("p1", DCT + "title", "Org One", "literal", "en"),
    ("p2", RDF_TYPE, FOAF + "Organization", "uri", ""),
    ("self", DCT + "references", "self", "uri", ""),
    # annotation-shaped extras: d4 is a sub-part of d3 (depth-2 chain
    # to d1), d9 is an untyped note citing d3
    ("d4", DCT + "isPartOf", "d3", "uri", ""),
    ("d9", DCT + "title", "Citing note", "literal", "en"),
    ("d9", DCT + "references", "d3", "uri", ""),
]

PREFIXES = """
PREFIX dct: <http://purl.org/dc/terms/>
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
"""


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    pdf = pd.DataFrame(TRIPLES, columns=[
        "subject", "predicate", "object", "objtype", "lang"])
    pdf["datatype"] = ""
    path = str(tmp_path_factory.mktemp("sparql") / "triples.parquet")
    pdf.to_parquet(path)
    return spark.createDataFrame(pdf), path


def run_both(graph, query_text):
    df, path = graph
    sdf = sparql.compile_spark(df, query_text).toPandas()
    sql = sparql.compile_sql("read_parquet('%s')" % path, query_text)
    odf = duckdb.sql(sql).df()
    norm = lambda d: (d[sorted(d.columns)].fillna("@null@")
                      .astype(str)
                      .sort_values(by=sorted(d.columns))
                      .reset_index(drop=True))
    pd.testing.assert_frame_equal(norm(sdf), norm(odf))
    return sdf


def test_parse_rejects_garbage():
    with pytest.raises(sparql.SparqlError):
        sparql.parse("DELETE WHERE { ?s ?p ?o }")
    with pytest.raises(sparql.SparqlError):
        sparql.parse("SELECT ?x WHERE { ?x dct:title ?t }")  # no prefix


def test_bgp_join_and_optional(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?uri ?title ?pub WHERE {
          ?uri a foaf:Document .
          ?uri dct:title ?title .
          OPTIONAL { ?uri dct:publisher ?pub }
        } ORDER BY ?uri
    """)
    assert list(out["uri"]) == ["d1", "d2", "d3"]
    # d2 has no publisher → OPTIONAL leaves a null, row survives
    assert out.set_index("uri")["pub"].isna()["d2"]
    assert out.set_index("uri")["pub"]["d1"] == "p1"


def test_optional_with_inner_join(graph):
    # two-pattern OPTIONAL: publisher AND its label — p2 has no title,
    # so d3's optional group fails as a whole (label NULL)
    out = run_both(graph, PREFIXES + """
        SELECT ?uri ?plabel WHERE {
          ?uri a foaf:Document .
          OPTIONAL { ?uri dct:publisher ?p . ?p dct:title ?plabel }
        } ORDER BY ?uri
    """)
    s = out.set_index("uri")["plabel"]
    assert s["d1"] == "Org One" and pd.isna(s["d3"]) and pd.isna(s["d2"])


def test_filter_numeric_and_bool(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?uri ?n WHERE {
          ?uri dct:identifier ?n .
          FILTER(?n >= 5 && !(?n > 10))
        }
    """)
    assert list(out["uri"]) == ["d3"]   # 7; "12" must compare as number


def test_filter_in_and_regex(graph):
    out = run_both(graph, PREFIXES + """
        SELECT DISTINCT ?uri WHERE {
          ?uri a ?t .
          FILTER(?t IN (foaf:Document, foaf:Organization))
          ?uri dct:title ?title .
          FILTER(regex(?title, "^(Alpha|Org)"))
        } ORDER BY ?uri
    """)
    assert list(out["uri"]) == ["d1", "p1"]


def test_literal_lang_and_limit(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?uri WHERE { ?uri dct:title "Gamma"@sv } LIMIT 1
    """)
    assert list(out["uri"]) == ["d3"]


def test_repeated_var_same_pattern(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?x WHERE { ?x dct:references ?x }
    """)
    assert list(out["x"]) == ["self"]


def test_star_and_uri_subject(graph):
    out = run_both(graph, PREFIXES + """
        SELECT * WHERE { <d3> dct:isPartOf ?parent .
                         ?parent dct:title ?ptitle }
    """)
    assert out.iloc[0]["parent"] == "d1"
    assert out.iloc[0]["ptitle"] == "Alpha report"


def test_union_branches(graph):
    out = run_both(graph, PREFIXES + """
        SELECT DISTINCT ?who ?title WHERE {
          ?who dct:title ?title .
          { ?who a foaf:Document } UNION { ?who a foaf:Organization }
        } ORDER BY ?who
    """)
    # d9 is typeless, so the union gate drops it; p2 has no title
    assert list(out["who"]) == ["d1", "d2", "d3", "p1"]


def test_path_star_and_plus(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?p WHERE { ?p dct:isPartOf* <d1> } ORDER BY ?p
    """)
    # zero-or-more: d1 itself, d3 (1 hop), d4 (2 hops via d3)
    assert list(out["p"]) == ["d1", "d3", "d4"]
    out = run_both(graph, PREFIXES + """
        SELECT ?p WHERE { ?p dct:isPartOf+ <d1> } ORDER BY ?p
    """)
    assert list(out["p"]) == ["d3", "d4"]


def test_construct_annotations_verbatim(graph, spark):
    """The reference's one SPARQL file (res/sparql/annotations.rq) runs
    verbatim through both backends, and the graph it constructs equals
    the dedicated annotation_graphs operator's output for the same
    document — two independent implementations, one result."""
    import os
    rq_path = "/root/reference/ferenda/res/sparql/annotations.rq"
    if not os.path.exists(rq_path):
        pytest.skip("reference fixture tree not present")
    q = open(rq_path).read() % {"uri": "d1"}
    out = run_both(graph, q)
    assert set(out.columns) == {"subject", "predicate", "object"}
    # d4 reaches d1 through d3; d9's triples enter via the
    # references-branch; the isReferencedBy edge is synthesized
    assert ("d3", DCT + "isReferencedBy", "d9") in \
        set(map(tuple, out.values))
    assert (out["subject"] == "d4").any()

    from ferenda_spark.operators.relate import annotation_graphs
    df, _ = graph
    docs = spark.createDataFrame([("d1",), ("d2",)], "uri string")
    op = (annotation_graphs(df, docs)
          .where("doc_uri = 'd1'")
          .select("subject", "predicate", "object")
          .distinct().toPandas())
    lhs = set(map(tuple, out.values))
    rhs = set(map(tuple, op.values))
    assert lhs == rhs, (sorted(lhs - rhs)[:5], sorted(rhs - lhs)[:5])


def test_aggregates_group_by(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?type (COUNT(?s) AS ?n) (MIN(?title) AS ?first)
        WHERE { ?s a ?type . ?s dct:title ?title }
        GROUP BY ?type ORDER BY ?type
    """)
    byt = out.set_index("type")
    assert byt.loc[FOAF + "Document", "n"] == 3
    assert byt.loc[FOAF + "Document", "first"] == "Alpha report"
    assert byt.loc[FOAF + "Organization", "n"] == 1   # p2 has no title


def test_aggregates_global_and_sum(graph):
    out = run_both(graph, PREFIXES + """
        SELECT (COUNT(*) AS ?rows) (SUM(?n) AS ?total)
               (COUNT(DISTINCT ?s) AS ?docs)
        WHERE { ?s dct:identifier ?n }
    """)
    assert out.iloc[0]["rows"] == 3
    assert float(out.iloc[0]["total"]) == 22.0   # 3 + 12 + 7
    assert out.iloc[0]["docs"] == 3


def test_aggregates_reject_ungrouped_var():
    with pytest.raises(sparql.SparqlError):
        sparql.parse(PREFIXES + """
            SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
        """)


def test_join_order_most_bound_first():
    q = sparql.parse(PREFIXES + """
        SELECT ?u ?t WHERE {
          ?u dct:title ?t .
          ?u a foaf:Document .
          ?u dct:publisher <p1> .
        }
    """)
    ordered = sparql._order_patterns(q.where.triples)
    # the fully-bound-but-for-?u pattern (2 consts) anchors the plan
    assert ordered[0].o == ("uri", "p1")


def test_ask(graph):
    out = run_both(graph, PREFIXES + """
        ASK { ?s dct:publisher <p1> }
    """)
    assert bool(out.iloc[0]["ask"]) is True
    out = run_both(graph, PREFIXES + """
        ASK WHERE { ?s dct:publisher <p99> }
    """)
    assert bool(out.iloc[0]["ask"]) is False
    with pytest.raises(sparql.SparqlError):
        sparql.parse("ASK { ?s ?p ?o } LIMIT 5")


def test_bind_concat(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?label WHERE {
          ?s a foaf:Document .
          ?s dct:title ?t .
          BIND(concat(?s, "=", ?t) AS ?label)
        } ORDER BY ?s
    """)
    assert list(out["label"]) == [
        "d1=Alpha report", "d2=Beta memo", "d3=Gamma"]
    # a BIND var participates in later FILTERs
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE {
          ?s dct:title ?t .
          BIND(concat(?t, "!") AS ?x)
          FILTER(?x = "Gamma!")
        }
    """)
    assert list(out["s"]) == ["d3"]
    with pytest.raises(sparql.SparqlError):
        sparql.compile_sql("triples", PREFIXES + """
            SELECT ?t WHERE { ?s dct:title ?t . BIND(?s AS ?t) }
        """)


def test_values_single_and_multi(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?t WHERE {
          ?s dct:title ?t .
          VALUES ?s { <d1> <d3> }
        } ORDER BY ?s
    """)
    assert list(out["s"]) == ["d1", "d3"]
    # two-var rows incl. UNDEF: (d1, *) matches any title for d1
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?t WHERE {
          ?s dct:title ?t .
          VALUES (?s ?t) { (<d1> UNDEF) (<d2> "Beta memo") (<d2> "nope") }
        } ORDER BY ?s
    """)
    assert list(map(tuple, out[["s", "t"]].values)) == [
        ("d1", "Alpha report"), ("d2", "Beta memo")]
    with pytest.raises(sparql.SparqlError):
        sparql.parse(PREFIXES + "SELECT ?s WHERE { VALUES ?s { } }")


def test_values_construct_and_bind_construct(graph):
    # VALUES restricting a CONSTRUCT; BIND flowing into the template
    out = run_both(graph, PREFIXES + """
        CONSTRUCT { ?s dct:alternative ?alt }
        WHERE {
          ?s dct:title ?t .
          VALUES ?s { <d1> <d2> }
          BIND(concat("alt:", ?t) AS ?alt)
        }
    """)
    got = set(map(tuple, out.values))
    assert got == {
        ("d1", DCT + "alternative", "alt:Alpha report"),
        ("d2", DCT + "alternative", "alt:Beta memo")}


RFC = "http://example.org/ontology/rfc/"

RFC_EXTRA = [
    # rfc-annotations.rq corpus: d10 updates d3, d11 obsoletes d3
    ("d10", RFC + "updates", "d3", "uri", ""),
    ("d10", DCT + "title", "Update doc", "literal", "en"),
    ("d11", RFC + "obsoletes", "d3", "uri", ""),
    # keyword_sfs.rq corpus: d4 tagged with subject kw1
    ("d4", DCT + "subject", "kw1", "uri", ""),
]


@pytest.fixture(scope="module")
def rfc_graph(spark, tmp_path_factory):
    pdf = pd.DataFrame(TRIPLES + RFC_EXTRA, columns=[
        "subject", "predicate", "object", "objtype", "lang"])
    pdf["datatype"] = ""
    # two named graphs: org resources vs everything else
    pdf["context"] = ["orgs" if s in ("p1", "p2") else "docs"
                      for s in pdf["subject"]]
    path = str(tmp_path_factory.mktemp("sparql_rfc") / "triples.parquet")
    pdf.to_parquet(path)
    return spark.createDataFrame(pdf), path


def test_rfc_annotations_verbatim(rfc_graph):
    """The reference's RFC annotation query
    (ferenda/sources/tech/res/sparql/rfc-annotations.rq) runs verbatim:
    ;-lists, BIND inside UNION, isUri, strstarts, IN over prefixed
    names, references+ property path."""
    import os
    rq = "/root/reference/ferenda/sources/tech/res/sparql/rfc-annotations.rq"
    if not os.path.exists(rq):
        pytest.skip("reference fixture tree not present")
    out = run_both(rfc_graph, open(rq).read() % {"uri": "d3"})
    got = set(map(tuple, out.values))
    # branch 1: d3's literal metadata only
    assert ("d3", DCT + "title", "Gamma") in got
    assert ("d3", DCT + "identifier", "7") in got
    assert ("d3", DCT + "publisher", "p2") not in got   # uri object
    # branch 2: the citing doc's triples + synthesized isReferencedBy
    assert ("d9", DCT + "title", "Citing note") in got
    assert ("d9", DCT + "references", "d3") in got      # strstarts pass
    assert ("d3", DCT + "isReferencedBy", "d9") in got
    # branch 3: updater/obsoleter metadata
    assert ("d10", DCT + "title", "Update doc") in got
    # branches 4/5: synthesized inverse edges
    assert ("d3", RFC + "isObsoletedBy", "d11") in got
    assert ("d3", RFC + "isUpdatedBy", "d10") in got
    # nothing about unrelated documents
    assert not any(s == "d1" for s, _, _ in got)


def test_semicolon_and_comma_lists(rfc_graph):
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?t ?n WHERE {
          ?s dct:title ?t ; dct:identifier ?n .
        } ORDER BY ?n
    """)
    assert list(out["t"]) == ["Beta memo", "Alpha report", "Gamma"]
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?s WHERE { ?s dct:title "Gamma", "Alpha report" . }
    """)
    assert len(out) == 0   # no subject carries both titles
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?s ?t WHERE { ?s dct:title ?t, ?t . } ORDER BY ?s
    """)
    assert len(out) == 6   # ?t,?t self-join is a no-op


def test_istype_filters(rfc_graph):
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?p ?o WHERE {
          <d3> ?p ?o . FILTER(isLiteral(?o))
        } ORDER BY ?p
    """)
    assert set(out["o"]) == {"Gamma", "7"}
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?o WHERE { <d3> ?p ?o . FILTER(!isLiteral(?o)) }
    """)
    assert set(out["o"]) >= {"p2", "d1"}
    with pytest.raises(sparql.SparqlError):
        sparql.compile_sql("triples", PREFIXES + """
            SELECT ?s WHERE { ?s dct:title ?t .
                              FILTER(isUri(?t) || bound(?t)) }
        """)


def test_strstarts(rfc_graph):
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?s ?t WHERE {
          ?s dct:title ?t . FILTER(strstarts(?t, "Alpha"))
        }
    """)
    assert list(out["s"]) == ["d1"]


def test_graph_clause(rfc_graph):
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?s ?t WHERE {
          GRAPH <orgs> { ?s dct:title ?t }
        }
    """)
    assert list(out["s"]) == ["p1"]
    out = run_both(rfc_graph, PREFIXES + """
        ASK { GRAPH <nope> { ?s ?p ?o } }
    """)
    assert bool(out.iloc[0]["ask"]) is False


def test_seeded_path_equals_closure(graph, monkeypatch):
    """Constant-endpoint property paths switch to a seeded frontier
    BFS above the edge threshold; forcing the switch must not change
    any result (including the zero-length "*" row and cycle
    exclusion — `self references self` must NOT yield (self,self)
    for references+)."""
    queries = [
        "SELECT ?p WHERE { ?p dct:isPartOf* <d1> } ORDER BY ?p",
        "SELECT ?p WHERE { ?p dct:isPartOf+ <d1> } ORDER BY ?p",
        "SELECT ?o WHERE { <d4> dct:isPartOf+ ?o } ORDER BY ?o",
        "SELECT ?o WHERE { <d4> dct:isPartOf* ?o } ORDER BY ?o",
        "SELECT ?x WHERE { ?x dct:references+ <self> }",
        # constant absent from the graph: "*" must NOT add (nope,nope)
        "SELECT ?p WHERE { ?p dct:isPartOf* <nope> }",
    ]
    base = [run_both(graph, PREFIXES + q) for q in queries]
    monkeypatch.setattr(sparql, "PATH_DRIVER_THRESHOLD", -1)
    for q, expect in zip(queries, base):
        got = run_both(graph, PREFIXES + q)
        pd.testing.assert_frame_equal(got, expect)


def test_bounded_path_quantifier(graph):
    # {,1}: zero hops (graph-term-gated) + one hop — NOT two
    out = run_both(graph, PREFIXES + """
        SELECT ?p WHERE { ?p dct:isPartOf{,1} <d1> } ORDER BY ?p
    """)
    assert list(out["p"]) == ["d1", "d3"]        # d4 is 2 hops away
    out = run_both(graph, PREFIXES + """
        SELECT ?p WHERE { ?p dct:isPartOf{1,2} <d1> } ORDER BY ?p
    """)
    assert list(out["p"]) == ["d3", "d4"]        # no zero-hop row
    with pytest.raises(sparql.SparqlError):
        sparql.parse(PREFIXES +
                     "SELECT ?p WHERE { ?p dct:isPartOf{2,1} <d1> }")


def test_every_reference_rq_compiles():
    """Every SPARQL file the reference ships — core, RFC, legal-SE,
    lagen.nu — parses and compiles through BOTH backends (the 'a
    reference user can run every query they run today' bar)."""
    import glob
    import os
    files = sorted(glob.glob("/root/reference/**/*.rq", recursive=True))
    if not files:
        pytest.skip("reference tree not present")
    subs = {"uri": "http://example.org/res/doc/1",
            "context": "http://example.org/ctx"}
    assert len(files) >= 18
    for f in files:
        text = open(f).read()
        try:
            text = text % subs
        except (KeyError, ValueError):
            pass
        sql = sparql.compile_sql("triples", text)   # must not raise
        assert "SELECT" in sql


def test_prop_annotations_verbatim(graph):
    """legal-SE prop-annotations.rq verbatim: bounded {,1} paths with
    two variable endpoints + multi-variable strstarts."""
    import os
    rq = ("/root/reference/ferenda/sources/legal/se/res/sparql/"
          "prop-annotations.rq")
    if not os.path.exists(rq):
        pytest.skip("reference tree not present")
    out = run_both(graph, open(rq).read() % {"uri": "d1"})
    got = set(map(tuple, out.values))
    # d3 references d1 (isPartOf counts: "?references may be any
    # predicate"); d3's root within one hop sharing its prefix is d3
    assert ("d1", DCT + "isReferencedBy", "d3") in got
    assert ("d3", DCT + "title", "Gamma") in got


def test_keyword_queries_verbatim(rfc_graph):
    """lagen.nu keyword_sfs.rq verbatim: GRAPH wrapping a nested
    group, ;-lists, isPartOf* with two variables."""
    import os
    rq = "/root/reference/lagen/nu/res/sparql/keyword_sfs.rq"
    if not os.path.exists(rq):
        pytest.skip("reference tree not present")
    out = run_both(rfc_graph, open(rq).read()
                   % {"uri": "kw1", "context": "docs"})
    rows = set(map(tuple, out[["uri", "baseuri", "label"]].values))
    assert rows == {("d4", "d3", "Gamma"),
                    ("d4", "d1", "Alpha report")}


RPUBL = "http://rinfo.lagrummet.se/ns/2008/11/rinfo/publ#"
BIBO = "http://purl.org/ontology/bibo/"

DV_TRIPLES = [
    # court decision r1 cites statute d1; referat ref1 reports r1
    ("r1", RPUBL + "rattsfall", "d1", "uri", ""),
    ("ref1", RPUBL + "referatAvDomstolsavgorande", "r1", "uri", ""),
    ("ref1", RDF_TYPE, RPUBL + "Rattsfallsreferat", "uri", ""),
    ("ref1", DCT + "identifier", "NJA 2001 s. 3", "literal", ""),
    ("ref1", RPUBL + "referatrubrik", "Om d1", "literal", "sv"),
    # chapter c1 of proposition p1 references d1
    ("c1", DCT + "references", "d1", "uri", ""),
    ("c1", DCT + "isPartOf", "p1", "uri", ""),
    ("c1", BIBO + "chapter", "2", "literal", ""),
    ("p1", RDF_TYPE, RPUBL + "Proposition", "uri", ""),
    ("p1", DCT + "identifier", "Prop. 1997/98:44", "literal", ""),
    ("p1", DCT + "title", "Personuppgiftslag", "literal", "sv"),
]


def test_dv_annotations_verbatim(spark, tmp_path):
    """legal-SE dv-annotations.rq verbatim: 3-branch UNION over an
    rpubl-shaped graph (court decisions, referat, propositions)."""
    import os
    rq = ("/root/reference/ferenda/sources/legal/se/res/sparql/"
          "dv-annotations.rq")
    if not os.path.exists(rq):
        pytest.skip("reference tree not present")
    pdf = pd.DataFrame(DV_TRIPLES, columns=[
        "subject", "predicate", "object", "objtype", "lang"])
    pdf["datatype"] = ""
    path = str(tmp_path / "dv.parquet")
    pdf.to_parquet(path)
    g = (spark.createDataFrame(pdf), path)
    out = run_both(g, open(rq).read() % {"uri": "d1"})
    got = set(map(tuple, out.values))
    assert ("d1", DCT + "isReferencedBy", "ref1") in got
    assert ("ref1", DCT + "identifier", "NJA 2001 s. 3") in got
    assert ("ref1", RPUBL + "referatrubrik", "Om d1") in got
    # the forarbete branch: chapter c1 walks isPartOf* to p1
    assert ("d1", DCT + "isReferencedBy", "p1") in got
    assert ("p1", BIBO + "chapter", "2") in got
    assert ("p1", DCT + "title", "Personuppgiftslag") in got


def test_sfs_changes_verbatim(spark, tmp_path):
    """legal-SE sfs_changes.rq verbatim: ;-lists, OPTIONAL ;-list,
    var-predicate IN filter and STRSTARTS prefix gate."""
    import os
    rq = ("/root/reference/ferenda/sources/legal/se/res/sparql/"
          "sfs_changes.rq")
    if not os.path.exists(rq):
        pytest.skip("reference tree not present")
    rows = [
        ("ch1", RPUBL + "ersatter", "d1#p1", "uri", ""),
        ("ch1", DCT + "identifier", "SFS 1998:204", "literal", ""),
        ("ch1", RPUBL + "forarbete", "prop1", "uri", ""),
        ("prop1", RDF_TYPE, RPUBL + "Proposition", "uri", ""),
        ("prop1", DCT + "identifier", "Prop. 1997/98:44", "literal", ""),
        ("prop1", DCT + "title", "PUL", "literal", "sv"),
        # changetype outside the IN list → excluded
        ("ch2", RPUBL + "kommenterar", "d1#p2", "uri", ""),
        ("ch2", DCT + "identifier", "X", "literal", ""),
        ("ch2", RPUBL + "forarbete", "prop1", "uri", ""),
        # lagrum outside the uri prefix → excluded
        ("ch3", RPUBL + "upphaver", "other#p1", "uri", ""),
        ("ch3", DCT + "identifier", "Y", "literal", ""),
        ("ch3", RPUBL + "forarbete", "prop1", "uri", ""),
        # proposition without identifier/title → OPTIONAL leaves nulls
        ("ch4", RPUBL + "inforsI", "d1#p3", "uri", ""),
        ("ch4", DCT + "identifier", "SFS 1999:1", "literal", ""),
        ("ch4", RPUBL + "forarbete", "prop2", "uri", ""),
        ("prop2", RDF_TYPE, RPUBL + "Proposition", "uri", ""),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "subject", "predicate", "object", "objtype", "lang"])
    pdf["datatype"] = ""
    path = str(tmp_path / "sfs.parquet")
    pdf.to_parquet(path)
    g = (spark.createDataFrame(pdf), path)
    out = run_both(g, open(rq).read() % {"uri": "d1"})
    by = {r["change"]: r for _, r in out.iterrows()}
    assert set(by) == {"ch1", "ch4"}
    assert by["ch1"]["changetype"] == RPUBL + "ersatter"
    assert by["ch1"]["propid"] == "Prop. 1997/98:44"
    assert pd.isna(by["ch4"]["propid"])        # optional miss → null


def test_offset_pagination(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?n WHERE { ?s dct:identifier ?n }
        ORDER BY ?s LIMIT 2 OFFSET 1
    """)
    assert list(out["s"]) == ["d2", "d3"]
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?n WHERE { ?s dct:identifier ?n }
        ORDER BY ?s OFFSET 2
    """)
    assert list(out["s"]) == ["d3"]
    with pytest.raises(sparql.SparqlError):
        sparql.parse(PREFIXES +
                     "SELECT ?s WHERE { ?s dct:identifier ?n } OFFSET 1")


def test_filter_not_exists(graph):
    # documents with a title but NO publisher (the anti-join shape)
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE {
          ?s a foaf:Document .
          FILTER NOT EXISTS { ?s dct:publisher ?p }
        } ORDER BY ?s
    """)
    assert list(out["s"]) == ["d2"]
    # positive EXISTS with its own inner FILTER, parenthesized form
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE {
          ?s a foaf:Document .
          FILTER (EXISTS { ?s dct:publisher ?pub .
                           FILTER(?pub = <p1>) })
        }
    """)
    assert list(out["s"]) == ["d1"]
    # EXISTS sharing no variables: keeps all rows iff pattern matches
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE {
          ?s a foaf:Organization .
          FILTER NOT EXISTS { ?x dct:title "No such title" }
        } ORDER BY ?s
    """)
    assert list(out["s"]) == ["p1", "p2"]
    # FILTER EXISTS inside OPTIONAL (formerly a documented raise):
    # both publishers are typed Organization, so the optional keeps
    # its bindings for d1/d3 and stays null for d2
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?p WHERE {
          ?s a foaf:Document .
          OPTIONAL { ?s dct:publisher ?p .
                     FILTER EXISTS { ?p a foaf:Organization } }
        } ORDER BY ?s
    """)
    s = out.set_index("s")["p"]
    assert s["d1"] == "p1" and s["d3"] == "p2" and pd.isna(s["d2"])


def test_lang_filter(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?t WHERE {
          ?s dct:title ?t . FILTER(lang(?t) = "sv")
        }
    """)
    assert list(map(tuple, out.values)) == [("d3", "Gamma")]
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE {
          ?s dct:title ?t .
          FILTER("en" = lang(?t) && strstarts(?t, "Alpha"))
        }
    """)
    assert list(out["s"]) == ["d1"]
    with pytest.raises(sparql.SparqlError):
        sparql.compile_sql("t", PREFIXES + """
            SELECT ?s WHERE { ?s dct:title ?t .
                              FILTER(lang(?t) != "en") }
        """)


def test_all_reference_rq_run_cross_backend(spark, tmp_path):
    """Beyond compiling: every .rq file the reference ships RUNS
    end-to-end through both backends on one rich rpubl/dcterms fixture
    graph, and the backends agree row-for-row. Files with hand-built
    semantic goldens have their own tests; this sweep guarantees no
    shipped query hits an execution-time hole."""
    import glob
    import os
    files = sorted(glob.glob("/root/reference/**/*.rq", recursive=True))
    if not files:
        pytest.skip("reference tree not present")
    rows = (TRIPLES + RFC_EXTRA + DV_TRIPLES + [
        # extra shapes the legal queries touch
        ("d1", DCT + "description", "a statute about things",
         "literal", "sv"),
        ("fskr1", RPUBL + "bemyndigande", "d1#b1", "uri", ""),
        ("fskr1", DCT + "title", "Regulation One", "literal", "sv"),
        ("fskr1", DCT + "identifier", "FFS 2001:1", "literal", ""),
        ("r1", RPUBL + "lagrum", "d1#p1", "uri", ""),
        ("kw1", DCT + "description", "keyword description",
         "literal", "sv"),
        ("ref1", DCT + "subject", "kw1", "uri", ""),
        ("r9", RPUBL + "ersatter", "d1#p9", "uri", ""),
        ("r9", DCT + "identifier", "SFS 2002:9", "literal", ""),
        ("r9", RPUBL + "forarbete", "p1", "uri", ""),
    ])
    pdf = pd.DataFrame(rows, columns=[
        "subject", "predicate", "object", "objtype", "lang"])
    pdf["datatype"] = ""
    pdf["context"] = "ctx"
    path = str(tmp_path / "allrq.parquet")
    pdf.to_parquet(path)
    g = (spark.createDataFrame(pdf), path)
    subs = {"uri": "d1", "context": "ctx", "tempuri": "d1"}
    nonzero = 0
    for f in files:
        text = open(f).read()
        try:
            text = text % subs
        except (KeyError, ValueError):
            pass
        out = run_both(g, text)       # cross-backend parity per file
        nonzero += len(out) > 0
    # the fixture is rich enough that most queries return rows — a
    # sweep where everything is empty would prove nothing
    assert nonzero >= 10, nonzero


def test_review_fixes(graph):
    """Code-review regressions: {m,n} with m>=3 excludes shorter
    paths; numeric IN coerces like ECmp; SUM(DISTINCT) dedups;
    ASK {} is trivially true."""
    out = run_both(graph, PREFIXES + """
        SELECT ?p WHERE { ?p dct:isPartOf{3,5} <d1> }
    """)
    assert len(out) == 0            # longest chain is 2 hops
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE { ?s dct:identifier ?n . FILTER(?n IN (7, 12.0))
        } ORDER BY ?s
    """)
    assert list(out["s"]) == ["d2", "d3"]   # "12" matches 12.0 as number
    out = run_both(graph, PREFIXES + """
        SELECT (SUM(DISTINCT ?n) AS ?t) WHERE { ?x dct:identifier ?n .
          ?y dct:identifier ?n }
    """)
    assert float(out.iloc[0]["t"]) == 22.0  # 3+12+7, dup rows collapsed
    out = run_both(graph, "ASK {}")
    assert bool(out.iloc[0]["ask"]) is True


def test_minus(graph):
    """MINUS removes compatible solutions; with disjoint domains it
    removes nothing (the spec rule that distinguishes it from NOT
    EXISTS)."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE { ?s a foaf:Document .
          MINUS { ?s dct:publisher ?p } } ORDER BY ?s
    """)
    assert list(out["s"]) == ["d2"]
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE { ?s a foaf:Document .
          MINUS { ?x dct:nothere ?y } } ORDER BY ?s
    """)
    assert list(out["s"]) == ["d1", "d2", "d3"]   # disjoint → no-op


def test_nested_optional_and_bind_in_optional(graph):
    """OPTIONAL nested in OPTIONAL plus BIND inside OPTIONAL (both
    raised SparqlError before round 4)."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?lbl ?org WHERE { ?s a foaf:Document .
          OPTIONAL { ?s dct:publisher ?p . BIND(concat("pub:", ?p) AS ?lbl)
                     OPTIONAL { ?p dct:title ?org } }
        } ORDER BY ?s
    """)
    assert list(out["s"]) == ["d1", "d2", "d3"]
    assert list(out["lbl"].fillna("-")) == ["pub:p1", "-", "pub:p2"]
    assert list(out["org"].fillna("-")) == ["Org One", "-", "-"]


def test_inverse_path(graph):
    """^p swaps subject/object; ^p+ is the inverse closure."""
    out = run_both(graph, PREFIXES + """
        SELECT ?part WHERE { <d1> ^dct:isPartOf ?part } ORDER BY ?part
    """)
    assert list(out["part"]) == ["d3"]
    out = run_both(graph, PREFIXES + """
        SELECT ?part WHERE { <d1> ^dct:isPartOf+ ?part } ORDER BY ?part
    """)
    assert list(out["part"]) == ["d3", "d4"]
    # in a ;-list the inverse applies to its own predicate only
    out = run_both(graph, PREFIXES + """
        SELECT ?t ?part WHERE {
          <d1> dct:title ?t ; ^dct:isPartOf ?part } ORDER BY ?part
    """)
    assert list(out["t"]) == ["Alpha report"]
    assert list(out["part"]) == ["d3"]


def test_graph_scoped_property_path(rfc_graph):
    """ADVICE r3: GRAPH context must constrain property-path edge
    scans, not just plain scans. The isPartOf chain lives entirely in
    the 'docs' context, so scoping to 'orgs' must yield nothing."""
    docs = run_both(rfc_graph, PREFIXES + """
        SELECT ?p ?a WHERE { GRAPH <docs> { ?p dct:isPartOf+ ?a } }
        ORDER BY ?p ?a
    """)
    assert len(docs) == 3     # d3→d1, d4→d3, d4→d1
    orgs = run_both(rfc_graph, PREFIXES + """
        SELECT ?p ?a WHERE { GRAPH <orgs> { ?p dct:isPartOf+ ?a } }
    """)
    assert len(orgs) == 0
    # GRAPH-scoped * : reflexive set is the context's terms only
    star = run_both(rfc_graph, PREFIXES + """
        SELECT ?n WHERE { GRAPH <orgs> { ?n dct:isPartOf* ?n } }
        ORDER BY ?n
    """)
    # subjects + URI objects of the orgs context only ("Org One" is a
    # literal and is never a graph term)
    assert set(star["n"]) == {"p1", "p2", FOAF + "Organization"}


def test_group_concat_sample_having(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s (GROUP_CONCAT(?o; SEPARATOR="|") AS ?objs)
               (SAMPLE(?o) AS ?one) (COUNT(?o) AS ?n)
        WHERE { ?s ?p ?o . FILTER(isLiteral(?o)) }
        GROUP BY ?s HAVING (?n >= 2) ORDER BY ?s
    """)
    d1 = out[out["s"] == "d1"].iloc[0]
    assert d1["objs"] == "3|Alpha report"      # sorted concatenation
    assert d1["one"] == "3"                    # SAMPLE = deterministic MIN
    # d9 carries a single literal (its title) → dropped by HAVING
    assert set(out["s"]) == {"d1", "d2", "d3"}
    # default separator is a single space
    out = run_both(graph, PREFIXES + """
        SELECT (GROUP_CONCAT(?t) AS ?all) WHERE {
          ?s a foaf:Document . ?s dct:title ?t }
    """)
    assert out.iloc[0]["all"] == "Alpha report Beta memo Gamma"


def test_exists_without_pattern(graph):
    """A WHERE group with only FILTER [NOT] EXISTS evaluates against
    the single empty solution (crashed with AttributeError before
    round 4; ADVICE r3)."""
    out = run_both(graph, "ASK { FILTER EXISTS { ?s ?p ?o } }")
    assert bool(out.iloc[0]["ask"]) is True
    out = run_both(graph, PREFIXES +
                   "ASK { FILTER NOT EXISTS { ?s dct:nothere ?o } }")
    assert bool(out.iloc[0]["ask"]) is True
    out = run_both(graph, PREFIXES +
                   "ASK { FILTER EXISTS { ?s dct:nothere ?o } }")
    assert bool(out.iloc[0]["ask"]) is False


def test_having_rejects_loose_vars():
    with pytest.raises(sparql.SparqlError):
        sparql.parse("""SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
                        GROUP BY ?s HAVING (?o > 1)""")
    with pytest.raises(sparql.SparqlError):
        sparql.parse("SELECT ?s WHERE { ?s ?p ?o } HAVING (?s > 1)")


def test_path_alternation_and_negated_sets(graph):
    """(p1|p2) plain alternation, quantified alternation (closure over
    the union edge set), and negated property sets !p / !(p1|p2)."""
    out = run_both(graph, PREFIXES + """
        SELECT ?a WHERE { ?a (dct:isPartOf|dct:references)+ <d1> }
        ORDER BY ?a
    """)
    # d3→d1 (isPartOf), d4→d3→d1, d9 --references--> d3 → d1
    assert list(out["a"]) == ["d3", "d4", "d9"]
    out = run_both(graph, PREFIXES + """
        SELECT ?o WHERE { <d1> !(dct:title|dct:identifier) ?o }
        ORDER BY ?o
    """)
    assert list(out["o"]) == [FOAF + "Document", "p1"]
    out = run_both(graph, PREFIXES + """
        SELECT ?o WHERE { <d9> !dct:references ?o } ORDER BY ?o
    """)
    assert list(out["o"]) == ["Citing note"]
    # inverse alternation composes
    out = run_both(graph, PREFIXES + """
        SELECT ?a WHERE { <d3> ^(dct:isPartOf|dct:references) ?a }
        ORDER BY ?a
    """)
    assert list(out["a"]) == ["d4", "d9"]


def test_subquery(graph):
    """{ SELECT … } subqueries: aggregate subquery joined to the outer
    BGP on its projected variables; full compiler recursion inside."""
    out = run_both(graph, PREFIXES + """
        SELECT ?type ?n WHERE {
          { SELECT ?type (COUNT(?s) AS ?n) WHERE { ?s a ?type }
            GROUP BY ?type }
        } ORDER BY ?type
    """)
    assert dict(zip(out["type"], out["n"].astype(int))) == {
        FOAF + "Document": 3, FOAF + "Organization": 2}
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?title ?n WHERE {
          ?s dct:title ?title .
          { SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
            GROUP BY ?s HAVING (?n >= 4) }
        } ORDER BY ?s
    """)
    assert list(out["s"]) == ["d1", "d3"]      # 4- and 5-triple docs
    with pytest.raises(sparql.SparqlError):
        sparql.parse("SELECT ?s WHERE { { SELECT * WHERE { ?s ?p ?o } } }")


def test_string_functions(graph):
    """STRLEN/UCASE/LCASE/CONTAINS/SUBSTR/REPLACE in FILTER and BIND."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?u ?part WHERE {
          ?s dct:title ?t .
          FILTER(contains(?t, "a") && strlen(?t) >= 5)
          BIND(ucase(?t) AS ?u)
          BIND(substr(?t, 1, 3) AS ?part)
        } ORDER BY ?s
    """)
    assert list(out["s"]) == ["d1", "d2", "d3"]
    assert out.iloc[2]["u"] == "GAMMA" and out.iloc[2]["part"] == "Gam"
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?slug WHERE {
          ?s dct:title ?t . FILTER(strlen(?t) > 6)
          BIND(replace(lcase(?t), " ", "_") AS ?slug)
        } ORDER BY ?s
    """)
    assert list(out["slug"]) == ["alpha_report", "beta_memo",
                                 "citing_note", "org_one"]


def test_select_expressions(graph):
    """(expr AS ?alias) in the SELECT clause — plain and under GROUP
    BY (over group keys only)."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s (ucase(?t) AS ?u) (strlen(?t) AS ?len) WHERE {
          ?s a foaf:Document . ?s dct:title ?t
        } ORDER BY ?s
    """)
    assert list(out["u"]) == ["ALPHA REPORT", "BETA MEMO", "GAMMA"]
    assert [int(x) for x in out["len"]] == [12, 9, 5]
    out = run_both(graph, PREFIXES + """
        SELECT ?type (concat("type=", ?type) AS ?label)
               (COUNT(?s) AS ?n)
        WHERE { ?s a ?type } GROUP BY ?type ORDER BY ?type
    """)
    assert list(out["label"]) == ["type=" + FOAF + "Document",
                                  "type=" + FOAF + "Organization"]
    with pytest.raises(sparql.SparqlError):
        sparql.parse("""PREFIX dct: <http://purl.org/dc/terms/>
            SELECT ?t (ucase(?o) AS ?u) (COUNT(?s) AS ?n)
            WHERE { ?s ?t ?o } GROUP BY ?t""")


def test_sequence_path(graph):
    """p1/p2 desugars to the spec's fresh-variable chain: publisher
    then title, only chains where both hops bind survive."""
    out = run_both(graph, PREFIXES + """
        SELECT ?d ?pn WHERE { ?d dct:publisher/dct:title ?pn }
    """)
    assert out.values.tolist() == [["d1", "Org One"]]


def test_sequence_path_three_hops_and_star_projection(graph):
    """A 3-element chain composes, and SELECT * must NOT leak the
    internal __seq variables."""
    out = run_both(graph, PREFIXES + """
        SELECT * WHERE { ?x dct:isPartOf/dct:isPartOf/dct:title ?t }
    """)
    assert sorted(out.columns) == ["t", "x"]
    assert out.values.tolist() == [["d4", "Alpha report"]]


def test_sequence_path_inverse_element(graph):
    """^ binds tighter than /: ^dct:publisher/dct:title walks from the
    org back to its publishing document, then to that doc's title."""
    out = run_both(graph, PREFIXES + """
        SELECT ?p ?t WHERE { ?p ^dct:publisher/dct:title ?t }
    """)
    assert sorted(map(tuple, out.values.tolist())) == [
        ("p1", "Alpha report"), ("p2", "Gamma")]


def test_sequence_path_quantified_element(graph):
    """A quantified element inside a sequence: isPartOf+ closure, then
    one title hop off every reachable ancestor."""
    out = run_both(graph, PREFIXES + """
        SELECT ?x ?t WHERE { ?x dct:isPartOf+/dct:title ?t }
    """)
    assert sorted(map(tuple, out.values.tolist())) == [
        ("d3", "Alpha report"), ("d4", "Alpha report"), ("d4", "Gamma")]


def test_sequence_path_rejects_variable_element():
    with pytest.raises(sparql.SparqlError):
        sparql.parse(PREFIXES
                     + "SELECT ?x WHERE { ?x ?p/dct:title ?t }")


def test_arithmetic_filter_and_bind(graph):
    """Numeric arithmetic in FILTER and BIND: double coercion of
    string-typed objects, precedence, and parenthesized grouping."""
    out = run_both(graph, PREFIXES + """
        SELECT ?d ?next WHERE {
          ?d dct:identifier ?i .
          BIND(?i + 1 AS ?next)
          FILTER(?i * 2 > 10)
        } ORDER BY ?d
    """)
    assert out.values.tolist() == [["d2", 13.0], ["d3", 8.0]]
    out = run_both(graph, PREFIXES + """
        SELECT ?d WHERE {
          ?d dct:identifier ?i .
          FILTER((?i + 1) * 2 >= 16)
        } ORDER BY ?d
    """)
    assert out.values.tolist() == [["d2"], ["d3"]]


def test_arithmetic_null_semantics(graph):
    """Division by zero and arithmetic over non-numeric bindings are
    NULL (unbound) in both backends — the SPARQL type-error rule."""
    out = run_both(graph, PREFIXES + """
        SELECT ?d ?z ?bad WHERE {
          ?d dct:identifier ?i .
          BIND(?i / 0 AS ?z)
          BIND(?d - 1 AS ?bad)
        } ORDER BY ?d
    """)
    assert len(out) == 3
    assert out["z"].isna().all() and out["bad"].isna().all()


def test_group_concat_all_unbound_group_is_empty_string(graph):
    """GROUP_CONCAT over a group whose variable never binds is the
    empty string in BOTH backends (the SPARQL empty-sequence rule) —
    regression for the string_agg-NULL divergence the r4 gate caught."""
    out = run_both(graph, PREFIXES + """
        SELECT ?type (GROUP_CONCAT(?pub; SEPARATOR=",") AS ?pubs)
        WHERE { ?s a ?type . OPTIONAL { ?s dct:publisher ?pub } }
        GROUP BY ?type ORDER BY ?type
    """)
    by_type = out.set_index("type")["pubs"]
    assert by_type[FOAF + "Document"] == "p1,p2"
    assert by_type[FOAF + "Organization"] == ""


def test_describe_iri_and_var(graph):
    """DESCRIBE <iri> returns the resource's outgoing triples (the
    bnode-free concise bounded description); DESCRIBE ?v WHERE binds
    the described resources from the pattern; both desugar through
    CONSTRUCT so the SQL twin inherits them."""
    out = run_both(graph, "DESCRIBE <d1>")
    assert set(out["subject"]) == {"d1"}
    assert len(out) == 4
    out = run_both(graph, "DESCRIBE <d1> <p1>")
    assert set(out["subject"]) == {"d1", "p1"}
    assert len(out) == 6
    out = run_both(graph, PREFIXES + """
        DESCRIBE ?d WHERE { ?d dct:isPartOf <d1> }
    """)
    assert set(out["subject"]) == {"d3"}
    assert len(out) == 5


def test_describe_rejects_unsupported_forms():
    with pytest.raises(sparql.SparqlError):
        sparql.parse("DESCRIBE ?a ?b WHERE { ?a <p> ?b }")
    with pytest.raises(sparql.SparqlError):
        sparql.parse("DESCRIBE <u> WHERE { ?a <p> ?b }")
    with pytest.raises(sparql.SparqlError):
        sparql.parse("DESCRIBE ?a")


def test_string_function_extras(graph):
    """STRENDS / STRBEFORE / STRAFTER, incl. the spec's empty-needle
    rules (STRBEFORE(s,"")="" and STRAFTER(s,"")=s — position 1 in
    both engines) and the no-occurrence → "" rule."""
    out = run_both(graph, PREFIXES + """
        SELECT ?uri ?before ?after ?ends ?b0 ?a0 WHERE {
          ?uri a foaf:Document .
          ?uri dct:title ?t .
          BIND(strbefore(?t, " ") AS ?before)
          BIND(strafter(?t, " ") AS ?after)
          BIND(strends(?t, "memo") AS ?ends)
          BIND(strbefore(?t, "") AS ?b0)
          BIND(strafter(?t, "") AS ?a0)
        } ORDER BY ?uri
    """)
    s = out.set_index("uri")
    assert s["before"]["d1"] == "Alpha" and s["after"]["d1"] == "report"
    # "Gamma" has no space: both halves are "" (not the whole string)
    assert s["before"]["d3"] == "" and s["after"]["d3"] == ""
    assert bool(s["ends"]["d2"]) and not bool(s["ends"]["d1"])
    assert s["b0"]["d2"] == "" and s["a0"]["d2"] == "Beta memo"


def test_numeric_functions_and_if_coalesce(graph):
    """ABS/CEIL/FLOOR/ROUND (spec ROUND: ties toward +∞ — round(-0.5)
    is -0.0 ≡ 0), IF and COALESCE; CEIL/FLOOR unified to double."""
    out = run_both(graph, PREFIXES + """
        SELECT ?uri ?half ?c ?f ?r ?sz ?n2 WHERE {
          ?uri dct:identifier ?n .
          BIND(?n / 2 - 4 AS ?half)
          BIND(ceil(?half) AS ?c)
          BIND(floor(?half) AS ?f)
          BIND(round(?half) AS ?r)
          BIND(IF(?n > 5, "big", "small") AS ?sz)
          BIND(COALESCE(abs(?uri), ?n, "x") AS ?n2)
        } ORDER BY ?uri
    """)
    s = out.set_index("uri")
    # d1: n=3 → half=-2.5 → ceil -2, floor -3, round(-2.5)=-2 (+∞ tie)
    assert s["c"]["d1"] == -2.0 and s["f"]["d1"] == -3.0
    assert s["r"]["d1"] == -2.0
    # d2: n=12 → half=2.0; d3: n=7 → half=-0.5 → round is -0.0
    assert s["r"]["d2"] == 2.0 and abs(s["r"]["d3"]) == 0.0
    assert s["sz"]["d2"] == "big" and s["sz"]["d1"] == "small"
    # abs("d1") is NULL (non-numeric) → COALESCE falls through to ?n
    assert s["n2"]["d1"] == "3"


def test_abs_coerces_non_numeric_to_null(graph):
    """abs(?title) on a non-numeric binding is NULL (type-error-is-
    unbound), not an error — same TRY_CAST rule as arithmetic."""
    out = run_both(graph, PREFIXES + """
        SELECT ?uri ?a WHERE {
          ?uri dct:title ?t .
          BIND(abs(?t) AS ?a)
          FILTER(?uri = "d1")
        }
    """)
    assert len(out) == 1 and pd.isna(out["a"][0])


def test_nested_union_flattens_dnf(graph):
    """UNION inside a UNION alternative distributes at parse time:
    T·(A∪B) ∪ C flattens to three top-level alternatives (multiset-
    preserving), so both backends compile the same shape."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE {
          { ?s dct:title ?t .
            { ?s a foaf:Document } UNION { ?s a foaf:Organization } }
          UNION
          { ?s dct:isPartOf ?x }
        }
    """)
    assert sorted(out["s"]) == ["d1", "d2", "d3", "d3", "d4", "p1"]


def test_optional_inside_union_branch(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?pub WHERE {
          { ?s a foaf:Document . OPTIONAL { ?s dct:publisher ?pub } }
          UNION
          { ?s a foaf:Organization }
        } ORDER BY ?s
    """)
    s = out.set_index("s")["pub"]
    assert s["d1"] == "p1" and s["d3"] == "p2"
    assert pd.isna(s["d2"]) and pd.isna(s["p1"]) and pd.isna(s["p2"])


def test_minus_inside_optional(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?pub WHERE {
          ?s a foaf:Document .
          OPTIONAL { ?s dct:publisher ?pub
                     MINUS { ?s dct:isPartOf <d1> } }
        } ORDER BY ?s
    """)
    s = out.set_index("s")["pub"]
    # d3 isPartOf d1 → its publisher binding is MINUSed away inside
    # the OPTIONAL; the doc row itself survives with a null
    assert s["d1"] == "p1" and pd.isna(s["d3"]) and pd.isna(s["d2"])


def test_minus_with_union_body(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE {
          ?s a foaf:Document .
          MINUS { { ?s dct:publisher <p1> }
                  UNION { ?s dct:isPartOf <d1> } }
        }
    """)
    assert list(out["s"]) == ["d2"]


def test_not_exists_with_union_body(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE {
          ?s a foaf:Document .
          FILTER NOT EXISTS { { ?s dct:publisher <p1> }
                              UNION { ?s dct:isPartOf <d1> } }
        }
    """)
    assert list(out["s"]) == ["d2"]


def test_values_inside_union_branch_and_optional(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?t WHERE {
          ?s dct:title ?t .
          { ?s a foaf:Document . VALUES ?s { <d1> <d2> } }
          UNION
          { ?s a foaf:Organization }
        }
    """)
    assert sorted(out["s"]) == ["d1", "d2", "p1"]
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?pub WHERE {
          ?s a foaf:Document .
          OPTIONAL { ?s dct:publisher ?pub . VALUES ?pub { <p2> } }
        } ORDER BY ?s
    """)
    s = out.set_index("s")["pub"]
    assert pd.isna(s["d1"]) and s["d3"] == "p2"


def test_exists_inside_optional(graph):
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?pub WHERE {
          ?s a foaf:Document .
          OPTIONAL { ?s dct:publisher ?pub .
                     FILTER NOT EXISTS { ?pub dct:title ?pt } }
        } ORDER BY ?s
    """)
    s = out.set_index("s")["pub"]
    # p1 carries a title → d1's optional binding is filtered away
    assert pd.isna(s["d1"]) and s["d3"] == "p2"


def test_graph_rejects_nonsimple_body():
    with pytest.raises(sparql.SparqlError):
        sparql.parse("""
            SELECT ?s WHERE {
              GRAPH <g1> { ?s <p> ?o OPTIONAL { ?s <q> ?x } }
            }
        """)


def test_union_inside_optional(graph):
    """OPTIONAL over a UNION body: one left join against the aligned
    union of the alternatives (NOT one OPTIONAL per branch — left
    joins don't distribute over union)."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?label WHERE {
          ?s a foaf:Document .
          OPTIONAL { { ?s dct:title ?label }
                     UNION { ?s dct:identifier ?label } }
        } ORDER BY ?s ?label
    """)
    # every document has a title AND an identifier → two rows each
    assert list(out["s"]) == ["d1", "d1", "d2", "d2", "d3", "d3"]
    assert sorted(out[out["s"] == "d1"]["label"]) == ["3", "Alpha report"]
    # branches binding DIFFERENT non-shared vars NULL-pad each other
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?pub ?parent WHERE {
          ?s a foaf:Document .
          OPTIONAL { { ?s dct:publisher ?pub }
                     UNION { ?s dct:isPartOf ?parent } }
        } ORDER BY ?s
    """)
    d3 = out[out["s"] == "d3"]
    assert len(d3) == 2   # d3 has a publisher AND a parent
    assert set(d3["pub"].fillna("-")) == {"p2", "-"}
    d2 = out[out["s"] == "d2"]   # d2 has neither → one all-null row
    assert len(d2) == 1 and pd.isna(d2["pub"]).all()


def test_union_inside_optional_shared_var_rule():
    with pytest.raises(sparql.SparqlError):
        sparql.compile_sql("t", PREFIXES + """
            SELECT ?s ?p WHERE {
              ?s dct:title ?t .
              OPTIONAL { { ?s dct:publisher ?p }
                         UNION { ?x dct:publisher ?p } }
            }
        """)


def test_exists_with_union_body(graph):
    """Positive EXISTS over a UNION body: one semi-join against the
    aligned union (EXISTS(A∪B) = EXISTS A OR EXISTS B)."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE {
          ?s a foaf:Document .
          FILTER EXISTS { { ?s dct:publisher <p1> }
                          UNION { ?s dct:isPartOf <d1> } }
        } ORDER BY ?s
    """)
    # d1 via publisher, d3 via isPartOf; d2 neither
    assert list(out["s"]) == ["d1", "d3"]


def test_subquery_inside_optional_and_union(graph):
    """{ SELECT … } now legal in sub-groups: an aggregate subquery
    joined inside an OPTIONAL body and inside a UNION branch."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?n WHERE {
          ?s a foaf:Document .
          OPTIONAL {
            ?s dct:publisher ?pub .
            { SELECT ?pub (COUNT(?d) AS ?n)
              WHERE { ?d dct:publisher ?pub } GROUP BY ?pub }
          }
        } ORDER BY ?s
    """)
    s = out.set_index("s")["n"]
    # each publisher publishes exactly one doc in the fixture
    assert s["d1"] == 1 and s["d3"] == 1 and pd.isna(s["d2"])
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?t WHERE {
          ?s dct:title ?t .
          { { SELECT ?s WHERE { ?s dct:publisher <p1> } } }
          UNION
          { ?s a foaf:Organization }
        } ORDER BY ?s
    """)
    assert list(out["s"]) == ["d1", "p1"]


def test_construct_where_shorthand(graph):
    """CONSTRUCT WHERE { BGP }: pattern doubles as template; equals the
    explicit CONSTRUCT in both backends."""
    short = run_both(graph, PREFIXES + """
        CONSTRUCT WHERE { ?s a foaf:Document . ?s dct:title ?t }
    """)
    full = run_both(graph, PREFIXES + """
        CONSTRUCT { ?s a foaf:Document . ?s dct:title ?t }
        WHERE     { ?s a foaf:Document . ?s dct:title ?t }
    """)
    key = lambda d: sorted(map(tuple, d.values))
    assert key(short) == key(full)
    # type triples + title triples for d1/d2/d3
    assert len(short) == 6
    with pytest.raises(sparql.SparqlError):
        sparql.parse(PREFIXES +
                     "CONSTRUCT WHERE { ?s dct:isPartOf+ ?o }")
    with pytest.raises(sparql.SparqlError):
        sparql.parse(PREFIXES + """CONSTRUCT WHERE {
            ?s dct:title ?t OPTIONAL { ?s dct:publisher ?p } }""")


def test_postfix_values_clause(graph):
    """Trailing VALUES (SPARQL 1.1 ValuesClause) ≡ the inline form,
    applied before projection/aggregation, after LIMIT parses."""
    post = run_both(graph, PREFIXES + """
        SELECT ?s ?t WHERE { ?s dct:title ?t }
        ORDER BY ?s VALUES ?s { <d1> <d3> }
    """)
    assert list(post["s"]) == ["d1", "d3"]
    agg = run_both(graph, PREFIXES + """
        SELECT ?s (COUNT(?p) AS ?n) WHERE { ?s ?p ?o }
        GROUP BY ?s VALUES ?s { <d1> }
    """)
    assert list(agg["s"]) == ["d1"] and list(agg["n"]) == [4]


def test_not_in_filter(graph):
    """?x NOT IN (…) ≡ !(?x IN (…)) under the subset's NULL rules:
    matches drop, non-matches survive, and a mixed numeric/string
    list applies the same TRY_CAST coercion as IN."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?n WHERE {
          ?s a foaf:Document .
          ?s dct:identifier ?n .
          FILTER(?n NOT IN (7, "12"))
        } ORDER BY ?s
    """)
    # d3 has identifier 7 (numeric match), d2 has "12" (string match)
    assert list(out["s"]) == ["d1"] and list(out["n"]) == ["3"]
    with pytest.raises(sparql.SparqlError):
        sparql.parse(PREFIXES + """
            SELECT ?s WHERE { ?s dct:identifier ?n .
                              FILTER((?n + 1) NOT IN (7)) }""")


def test_is_numeric_and_same_term(graph):
    """isNumeric = survives-TRY_CAST in both engines; sameTerm is
    lexical identity with NO numeric coercion (where = would coerce
    "07"=7 true numerically, sameTerm("07","7") stays false)."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?numt ?numid ?samet ?eqn WHERE {
          ?s a foaf:Document .
          ?s dct:title ?t .
          ?s dct:identifier ?n .
          BIND(isNumeric(?t) AS ?numt)
          BIND(isNumeric(?n) AS ?numid)
          BIND(sameTerm(?n, "7") AS ?samet)
          BIND(?n = 7 AS ?eqn)
        } ORDER BY ?s
    """)
    s = out.set_index("s")
    assert not any(out["numt"].astype(bool))          # titles: not numeric
    assert all(out["numid"].astype(bool))             # identifiers: numeric
    assert bool(s["samet"]["d3"]) and not bool(s["samet"]["d2"])
    assert bool(s["eqn"]["d3"]) and not bool(s["eqn"]["d1"])


def test_hash_functions(graph):
    """MD5/SHA256 print lowercase hex over the UTF-8 lexical form —
    pinned to the RFC 1321 / FIPS 180-4 test-vector values for "Gamma"
    so both engines (and the spec) are anchored to the same bytes."""
    import hashlib
    out = run_both(graph, PREFIXES + """
        SELECT ?s ?m ?h WHERE {
          ?s dct:title ?t .
          BIND(md5(?t) AS ?m)
          BIND(sha256(?t) AS ?h)
          FILTER(?s = "d3")
        }
    """)
    assert out["m"][0] == hashlib.md5(b"Gamma").hexdigest()
    assert out["h"][0] == hashlib.sha256(b"Gamma").hexdigest()


@pytest.fixture(scope="module")
def typed_graph(spark, tmp_path_factory):
    """Graph with datatyped literals, an en-US subtag and an untagged
    plain literal — the corners langMatches/datatype() distinguish."""
    XSD = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        ("x1", DCT + "date", "2020-01-01", "literal", "", XSD + "date"),
        ("x1", DCT + "title", "Hello", "literal", "en-US", ""),
        ("x1", DCT + "note", "plain", "literal", "", ""),
        ("x1", DCT + "publisher", "p1", "uri", "", ""),
        ("x2", DCT + "date", "5", "literal", "", XSD + "integer"),
        ("x2", DCT + "title", "Hej", "literal", "sv", ""),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "subject", "predicate", "object", "objtype", "lang", "datatype"])
    path = str(tmp_path_factory.mktemp("sparqlt") / "triples.parquet")
    pdf.to_parquet(path)
    return spark.createDataFrame(pdf), path


def test_langmatches(graph, typed_graph):
    """RFC 4647 basic filtering: "*" = any non-empty tag; a range
    matches case-insensitively when equal or extended by a - subtag
    ("en" matches both en and en-US, never sv); pushed into the scan
    in both backends."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE { ?s dct:title ?t .
                          FILTER(langMatches(lang(?t), "*")) }
        ORDER BY ?s
    """)
    assert list(out["s"]) == ["d1", "d2", "d3", "d9", "p1"]
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE { ?s dct:title ?t .
                          FILTER(langMatches(lang(?t), "EN")) }
        ORDER BY ?s
    """)
    assert list(out["s"]) == ["d1", "d2", "d9", "p1"]   # d3 is @sv
    out = run_both(typed_graph, PREFIXES + """
        SELECT ?s WHERE { ?s dct:title ?t .
                          FILTER(langMatches(lang(?t), "en")) }
    """)
    assert list(out["s"]) == ["x1"]                     # en-US extends en
    with pytest.raises(sparql.SparqlError):
        sparql.parse(PREFIXES + """
            SELECT ?s WHERE { ?s dct:title ?t .
                              FILTER(langMatches(?t, "en")) }""")


def test_lang_empty_tag(graph):
    """lang(?v) = "" selects untagged literals per spec (the table
    stores absent tags as NULL or '')."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE { ?s dct:identifier ?n . FILTER(lang(?n) = "") }
        ORDER BY ?s
    """)
    assert list(out["s"]) == ["d1", "d2", "d3"]
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE { ?s dct:title ?t . FILTER(lang(?t) = "") }
    """)
    assert len(out) == 0                  # every title carries a tag


def test_datatype_filter(typed_graph):
    """datatype(?v) = <uri>: stored datatype URIs match directly;
    simple literals are xsd:string, tagged ones rdf:langString (spec
    mappings onto the table's NULL/'' encodings); a URI object never
    matches (datatype() is an error there → row dropped)."""
    q = PREFIXES + """
        SELECT ?s WHERE { ?s dct:date ?d .
          FILTER(datatype(?d) = <http://www.w3.org/2001/XMLSchema#date>)
        }"""
    assert list(run_both(typed_graph, q)["s"]) == ["x1"]
    q = PREFIXES + """
        SELECT ?s WHERE { ?s dct:note ?n .
          FILTER(datatype(?n) = <http://www.w3.org/2001/XMLSchema#string>)
        }"""
    assert list(run_both(typed_graph, q)["s"]) == ["x1"]
    q = PREFIXES + """
        SELECT ?s WHERE { ?s dct:title ?t .
          FILTER(datatype(?t) =
                 <http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>)
        } ORDER BY ?s"""
    assert list(run_both(typed_graph, q)["s"]) == ["x1", "x2"]
    q = PREFIXES + """
        SELECT ?s WHERE { ?s dct:publisher ?p .
          FILTER(datatype(?p) = <http://www.w3.org/2001/XMLSchema#string>)
        }"""
    assert len(run_both(typed_graph, q)) == 0


# --- GRAPH ?var ------------------------------------------------------


def test_graph_variable_binds_context(rfc_graph):
    """GRAPH ?g binds the context column; titles live in both named
    graphs of the rfc corpus (orgs: p1; docs: d1/d2/d3/d9/d10)."""
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?g ?s WHERE { GRAPH ?g { ?s dct:title ?t } }
    """)
    got = set(map(tuple, out.values))
    assert ("orgs", "p1") in got
    assert ("docs", "d1") in got and ("docs", "d10") in got
    assert not any(g == "orgs" and s.startswith("d") for g, s in got)


def test_graph_variable_same_graph_join(rfc_graph):
    """Two patterns under one GRAPH ?g must co-locate in the SAME
    graph: publisher p2 and its type live in different contexts, so
    the join yields only pairs whose both triples share a context."""
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?g ?s ?o WHERE {
          GRAPH ?g { ?s dct:publisher ?o . ?o a foaf:Organization }
        }
    """)
    # publisher triples are in 'docs' (subject d1/d3), Organization
    # types in 'orgs' — no shared context, so the result is empty
    assert len(out) == 0
    out2 = run_both(rfc_graph, PREFIXES + """
        SELECT ?g ?s ?t WHERE {
          GRAPH ?g { ?s dct:title ?t . ?s dct:identifier ?i }
        }
    """)
    got = {(r[0], r[1]) for r in out2.values}
    assert ("docs", "d1") in got and ("docs", "d3") in got


def test_graph_variable_excludes_default_graph(spark, tmp_path):
    """The spec quantifies GRAPH ?g over NAMED graphs only — rows with
    a NULL/'' context (the default graph) must not bind ?g."""
    pdf = pd.DataFrame(
        [("a", DCT + "title", "In named", "literal", "", "", "g1"),
         ("b", DCT + "title", "In default", "literal", "", "", ""),
         ("c", DCT + "title", "No ctx", "literal", "", "", None)],
        columns=["subject", "predicate", "object", "objtype", "lang",
                 "datatype", "context"])
    path = str(tmp_path / "t.parquet")
    pdf.to_parquet(path)
    out = run_both((spark.createDataFrame(pdf), path), PREFIXES + """
        SELECT ?g ?s WHERE { GRAPH ?g { ?s dct:title ?t } }
    """)
    assert set(map(tuple, out.values)) == {("g1", "a")}
    # ...while the default (un-scoped) pattern still sees everything
    out_all = run_both((spark.createDataFrame(pdf), path), PREFIXES + """
        SELECT ?s WHERE { ?s dct:title ?t }
    """)
    assert len(out_all) == 3


def test_graph_variable_property_paths(rfc_graph):
    """Property paths under GRAPH ?var compile to a per-named-graph
    closure (grouped on the context) in both backends; filtering the
    grouped result to one graph equals the explicit GRAPH <uri> form;
    GRAPH ?g and GRAPH <uri> compose in one query."""
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?g ?a ?b WHERE { GRAPH ?g { ?a dct:isPartOf+ ?b } }
    """)
    assert len(out) > 0
    assert all(r[0] == "docs" for r in out.values)   # edges live there
    grouped = {tuple(r[1:]) for r in out.values if r[0] == "docs"}
    explicit = run_both(rfc_graph, PREFIXES + """
        SELECT ?a ?b WHERE { GRAPH <docs> { ?a dct:isPartOf+ ?b } }
    """)
    assert grouped == set(map(tuple, explicit.values))
    # star under ?g: reflexive rows are per-graph terms, so org
    # resources appear with g = orgs even with no isPartOf edge there
    star = run_both(rfc_graph, PREFIXES + """
        SELECT ?g ?a WHERE { GRAPH ?g { ?a dct:isPartOf* ?a } }
    """)
    gs = {tuple(r) for r in star.values}
    assert ("orgs", "p1") in gs and ("docs", "d1") in gs
    # composes with a constant context + a plain grouped scan
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?g ?s WHERE {
          GRAPH ?g { ?s dct:identifier ?i }
          GRAPH <orgs> { ?p dct:title ?pt }
        }
    """)
    assert all(r[0] == "docs" for r in out.values) and len(out) > 0


def test_graph_variable_bounded_path_and_join(rfc_graph):
    """Bounded quantifiers group per graph too, and the path scan's
    ?g joins plain scans under the same GRAPH ?g (same-graph
    co-location)."""
    run_both(rfc_graph, PREFIXES + """
        SELECT ?g ?a ?b WHERE { GRAPH ?g { ?a dct:isPartOf{0,2} ?b } }
    """)
    out = run_both(rfc_graph, PREFIXES + """
        SELECT ?g ?a ?t WHERE {
          GRAPH ?g { ?a dct:isPartOf+ ?b . ?a dct:title ?t } }
    """)
    assert len(out) > 0 and all(r[0] == "docs" for r in out.values)


def test_negated_property_set_quantified(graph):
    """!(p1|p2)+ closes over the COMPLEMENT edge set in both
    backends; with isPartOf excluded, the chain d4→d3→d1 disappears
    and only non-isPartOf uri edges (and their compositions) remain."""
    out = run_both(graph, PREFIXES + """
        SELECT ?a ?b WHERE { ?a !(dct:isPartOf)+ ?b }
    """)
    pairs = set(map(tuple, out.values))
    assert ("d4", "d3") not in pairs and ("d4", "d1") not in pairs
    assert ("d1", "p1") in pairs                # publisher edge kept
    # complement of everything = empty closure
    all_preds = ("dct:title|dct:identifier|dct:publisher|"
                 "dct:isPartOf|dct:references|dct:isReferencedBy|"
                 "rdf:type|foaf:name")
    out2 = run_both(graph, PREFIXES +
                    "PREFIX rdf: "
                    "<http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"
                    "SELECT ?a ?b WHERE { ?a !(%s){1,2} ?b }"
                    % all_preds)
    assert len(out2) == 0


def test_single_quoted_strings(graph):
    """SPARQL string literals may be single-quoted (spec grammar);
    the tokenizer normalizes them, so filters, GROUP_CONCAT
    separators and VALUES behave exactly like the double-quoted
    form."""
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE { ?s dct:title 'Gamma' }
    """)
    assert [r[0] for r in out.values] == ["d3"]
    out = run_both(graph, PREFIXES + """
        SELECT (GROUP_CONCAT(?i; SEPARATOR=',') AS ?ids) WHERE {
          ?s dct:identifier ?i }
    """)
    assert out.values[0][0] == "12,3,7"   # sorted-order concat
    out = run_both(graph, PREFIXES + """
        SELECT ?s WHERE {
          ?s dct:title ?t FILTER (?t = 'Gamma' || ?t = "Beta memo") }
    """)
    assert sorted(r[0] for r in out.values) == ["d2", "d3"]


def test_datetime_accessors_and_iri(graph):
    # fixed-width lexical accessors: engine-identical substring
    # arithmetic, anchored-shape guard, error-is-unbound on non-dates
    out = run_both(graph, PREFIXES + """
        SELECT ?uri ?y ?mo ?d ?h ?mi ?s ?z ?zn ?hd ?bad ?i WHERE {
          ?uri a foaf:Document .
          BIND("2024-03-15T10:30:05.25+05:30" AS ?dt)
          BIND(YEAR(?dt) AS ?y)     BIND(MONTH(?dt) AS ?mo)
          BIND(DAY(?dt) AS ?d)      BIND(HOURS(?dt) AS ?h)
          BIND(MINUTES(?dt) AS ?mi) BIND(SECONDS(?dt) AS ?s)
          BIND(TZ(?dt) AS ?z)
          BIND(TZ("2024-03-15T10:30:05") AS ?zn)
          BIND(HOURS("2024-03-15") AS ?hd)
          BIND(YEAR("99-badness") AS ?bad)
          BIND(IRI(?uri) AS ?i)
        } ORDER BY ?uri
    """)
    r = out.iloc[0]
    assert (int(r["y"]), int(r["mo"]), int(r["d"])) == (2024, 3, 15)
    assert (int(r["h"]), int(r["mi"])) == (10, 30)
    assert float(r["s"]) == 5.25
    assert r["z"] == "+05:30"
    assert r["zn"] == ""          # no zone → empty string, per spec
    assert pd.isna(r["hd"])       # date-only literal: no time part
    assert pd.isna(r["bad"])      # malformed: type error → unbound
    assert r["i"] == r["uri"]     # IRI() is identity on the device
