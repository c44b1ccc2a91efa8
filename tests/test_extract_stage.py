"""End-to-end extraction stage over the synthetic pages corpus."""

import pytest

from ferenda_spark import pages as P
from ferenda_spark.extract import extract_document
from ferenda_spark.namespaces import NS, OWL_SAMEAS, RDF_TYPE
from ferenda_spark.uris import RepoConfig

CFG = RepoConfig(alias="doc", url="http://example.org/")


def test_f2_doc_pure():
    row = P.page_row(2, 100)  # family f2
    d = extract_document(row["url"], row["html"], CFG, P.COMMONDATA)
    assert d["status"] == "ok"
    assert d["uri"] == "http://example.org/res/doc/2"
    preds = {t.predicate for t in d["triples"]}
    assert NS["dcterms"] + "publisher" in preds
    assert NS["dcterms"] + "issued" in preds
    assert NS["dcterms"] + "isPartOf" in preds
    # sections are @about resources with their own text
    uris = [u for u, _ in d["resources"]]
    assert d["uri"] in uris and d["uri"] + "#S1" in uris
    # doc-level text excludes section text
    sec_text = dict(d["resources"])[d["uri"] + "#S1"]
    assert sec_text and sec_text not in d["text"]


def test_f2_sameas_chain():
    row = P.page_row(11, 100)  # 11 % 10 == 1 → sameAs link to doc 10
    d = extract_document(row["url"], row["html"], CFG, P.COMMONDATA)
    sameas = [t for t in d["triples"] if t.predicate == OWL_SAMEAS]
    assert sameas and sameas[0].object == "http://example.org/res/doc/10"


def test_f3_rfc_doc_pure():
    n = 100
    i = 5  # family f3
    row = P.page_row(i, n)
    d = extract_document(row["url"], row["html"], CFG, P.COMMONDATA)
    assert d["status"] == "ok"
    triples = d["triples"]
    preds = {t.predicate for t in triples}
    assert NS["dcterms"] + "identifier" in preds
    assert NS["bibo"] + "chapter" in preds
    # publisher resolved against commondata (exact or difflib >= 0.8)
    pub = [t for t in triples if t.predicate == NS["dcterms"] + "publisher"]
    assert pub and pub[0].objtype == "uri"
    # citation to doc (i*7+3) % n = 38
    refs = {t.object for t in triples
            if t.predicate == NS["dcterms"] + "references"}
    assert any("res/doc/38" in r for r in refs)


def test_f7_heading_segmentation():
    row = P.page_row(8, 100)  # family f7
    d = extract_document(row["url"], row["html"], CFG, P.COMMONDATA)
    uris = [u for u, _ in d["resources"]]
    assert d["uri"] + "#S1" in uris and d["uri"] + "#S1.1" in uris
    chap = {t.object for t in d["triples"]
            if t.predicate == NS["bibo"] + "chapter"}
    assert "1" in chap and "1.1" in chap
    # script + toc content filtered
    assert "ignore_me" not in d["text"]
    assert "navigation junk" in d["text"]  # toc not filtered by default cfg


def test_stage_on_spark(spark):
    from ferenda_spark.operators.extract import (documents_table,
                                                 extract_stage,
                                                 resources_table,
                                                 triples_table)
    pages = P.build_pages(spark, 60, partitions=4)
    extracted = extract_stage(pages, CFG, P.COMMONDATA).cache()
    docs = documents_table(extracted)
    assert docs.count() == 60
    assert docs.filter("status = 'ok'").count() == 60
    triples = triples_table(extracted, context="http://example.org/dataset/doc")
    assert triples.count() > 60 * 3
    res = resources_table(extracted)
    assert res.count() >= 60
    # determinism: regenerating gives identical triple set
    extracted2 = extract_stage(P.build_pages(spark, 60, partitions=7),
                               CFG, P.COMMONDATA)
    t1 = {tuple(r) for r in triples.drop("context").collect()}
    t2 = {tuple(r) for r in triples_table(extracted2).drop("context").collect()}
    assert t1 == t2
