"""Faceting / TOC / stats read path over the KG triple table."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark import pages as P
from ferenda_spark.namespaces import NS
from ferenda_spark.operators.extract import extract_stage, triples_table
from ferenda_spark.operators.facets import (facet_stats, faceted_data,
                                            qname_col, toc_pageset)
from ferenda_spark.uris import RepoConfig

CFG = RepoConfig(alias="doc", url="http://example.org/")


@pytest.fixture(scope="module")
def triples(spark):
    pages = P.build_pages(spark, 60, 4)
    return triples_table(extract_stage(pages, CFG, P.COMMONDATA)).cache()


def test_qname_col():
    assert qname_col(NS["dcterms"] + "title") == "dcterms_title"
    assert qname_col(NS["rdf"] + "type") == "rdf_type"
    assert qname_col("http://unknown.example/x/leaf") == "leaf"


def test_faceted_data_pivot(spark, triples):
    rows = {r["uri"]: r for r in faceted_data(triples).collect()}
    # doc 2 (family f2) carries title/identifier/issued/publisher
    r = rows["http://example.org/res/doc/2"]
    assert r["dcterms_title"] == "Example document 2"
    # doc 2 has TWO identifier triples (default basefile '2' + RDFa
    # 'DOC(2)'); the pivot picks the deterministic min (ref behavior is
    # first-of-multiple, documentrepository.py:2107-2114)
    assert r["dcterms_identifier"] == "2"
    assert r["dcterms_publisher"].startswith("http://example.org/ext/")
    assert r["rdf_type"].endswith("Standard")
    # one row per subject, no duplicates
    uris = [x["uri"] for x in rows.values()]
    assert len(uris) == len(set(uris))


def test_toc_pageset_groups(spark, triples):
    toc = toc_pageset(faceted_data(triples), value_col="dcterms_title")
    rows = {r["firstletter"]: r for r in toc.collect()}
    assert rows  # at least one letter group
    for letter, r in rows.items():
        assert len(letter) == 1
        assert r["n_docs"] >= 1
        labels = [m["label"] for m in r["members"] if m is not None]
        assert labels == sorted(labels)
        assert all(lbl.lower().startswith(letter) for lbl in labels)


def test_facet_stats_counts(spark, triples):
    stats = {(r["dimension"], r["value"]): r["n"]
             for r in facet_stats(triples).collect()}
    type_counts = {v: n for (d, v), n in stats.items()
                   if d == NS["rdf"] + "type"}
    # every extracted doc has an rdf:type; subjects counted distinct
    n_docs = (triples.where(F.col("predicate") == NS["rdf"] + "type")
              .select("subject").distinct().count())
    assert sum(type_counts.values()) >= n_docs


def test_facet_query_sql_runs_on_spark(spark, triples):
    """The generated facet_query SQL (the reference's generated-SPARQL
    analog) runs unchanged on Spark SQL and equals the DataFrame op."""
    from ferenda_spark.operators.facets import facet_query
    triples.createOrReplaceTempView("triples_v")
    btype = "http://purl.org/ontology/bibo/Standard"
    sql = facet_query(rdf_type=btype, table="triples_v")
    via_sql = {r["uri"]: r.asDict()
               for r in spark.sql(sql).collect()}
    via_df = {r["uri"]: r.asDict()
              for r in faceted_data(triples, rdf_type=btype).collect()}
    assert via_sql == via_df
    assert all(v["rdf_type"] is not None for v in via_df.values())
