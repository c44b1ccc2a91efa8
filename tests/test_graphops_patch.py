"""Citation-graph analytics, natural sort, and pre-parse patching."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.natsort import numcmp_key, ordinal_sortkey, split_numalpha
from ferenda_spark.patch import apply_unified_diff, maybe_rot13, patch_text


def test_split_numalpha_reference_parity():
    assert split_numalpha("10 a §") == ["", 10, " a §"]
    assert sorted(["2", "10", "1"], key=numcmp_key) == ["1", "2", "10"]
    assert sorted(["1.9", "1.10", "1.2"], key=numcmp_key) == \
        ["1.2", "1.9", "1.10"]


def test_ordinal_sortkey_native(spark):
    df = spark.createDataFrame([("1.10",), ("1.9",), ("2",), ("1.2.3",)],
                               ["ordinal"])
    got = [r["ordinal"] for r in
           df.orderBy(ordinal_sortkey(F.col("ordinal"))).collect()]
    assert got == ["1.2.3", "1.9", "1.10", "2"]


DIFF = """--- a
+++ b
@@ -1,3 +1,3 @@
 line one
-line two
+line TWO
 line three
"""


def test_apply_unified_diff():
    assert apply_unified_diff("line one\nline two\nline three", DIFF) == \
        "line one\nline TWO\nline three"
    with pytest.raises(ValueError):
        apply_unified_diff("other\ncontent\nhere", DIFF)


def test_rot13_and_patch_text():
    import codecs
    rot = "ROT13:" + codecs.encode(DIFF, "rot13")
    assert maybe_rot13(rot) == DIFF
    text, desc = patch_text("u1", "line one\nline two\nline three",
                            {"u1": (DIFF, "fix casing")})
    assert text.split("\n")[1] == "line TWO"
    assert desc == "fix casing"
    same, none = patch_text("u2", "x", {"u1": (DIFF, "d")})
    assert same == "x" and none is None


def test_patched_extraction(spark):
    """A broadcast patch changes the parsed output for exactly its url."""
    from ferenda_spark import pages as P
    from ferenda_spark.operators.extract import (documents_table,
                                                 extract_stage)
    from ferenda_spark.uris import RepoConfig
    cfg = RepoConfig(alias="doc", url="http://example.org/")
    pages = P.build_pages(spark, 12, 2)
    row = P.page_row(1, 12)  # f2 family html
    old = row["html"].decode()
    target = next(ln for ln in old.split("\n")
                  if "Example document 1" in ln)
    diff = ("--- a\n+++ b\n@@ -%d,1 +%d,1 @@\n-%s\n+%s\n"
            % (old.split("\n").index(target) + 1,
               old.split("\n").index(target) + 1,
               target, target.replace("Example document 1", "PATCHED TITLE")))
    patches = {row["url"]: (diff, "retitle")}
    docs = {r["url"]: r for r in
            documents_table(extract_stage(pages, cfg, P.COMMONDATA,
                                          patches=patches)).collect()}
    assert docs[row["url"]]["title"] == "PATCHED TITLE"
    assert docs[P.page_row(2, 12)["url"]]["title"] != "PATCHED TITLE"


def test_citation_graph_pagerank(spark):
    from ferenda_spark.operators.graphops import (citation_edges, degrees,
                                                  pagerank)
    triples = spark.createDataFrame(
        [(s, "http://purl.org/dc/terms/references", o, "uri")
         for s, o in [("a", "b"), ("c", "b"), ("d", "b"), ("b", "e"),
                      ("e", "a")]],
        ["subject", "predicate", "object", "objtype"])
    edges = citation_edges(triples)
    deg = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in degrees(edges).collect()}
    assert deg["b"] == (1, 3)
    assert deg["a"] == (1, 1)
    ranks = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    # b has fan-in 3 → highest rank; sink-free cycle keeps mass finite
    assert max(ranks, key=ranks.get) == "b"
    assert all(v > 0 for v in ranks.values())


def test_hits(spark):
    from ferenda_spark.operators.graphops import citation_edges, hits
    triples = spark.createDataFrame(
        [(s, "http://purl.org/dc/terms/references", o, "uri")
         for s, o in [("h1", "a1"), ("h1", "a2"), ("h1", "a3"),
                      ("h2", "a1"), ("h2", "a2"), ("x", "a3")]],
        ["subject", "predicate", "object", "objtype"])
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(citation_edges(triples)).collect()}
    # h1 links to every authority → top hub; a1/a2 cited by both strong
    # hubs → top authorities
    assert max(got, key=lambda n: got[n][0]) == "h1"
    assert max(got, key=lambda n: got[n][1]) in ("a1", "a2")
    assert got["a1"][1] == got["a2"][1]


def test_keyword_hubs(spark):
    from ferenda_spark.operators.graphops import keyword_hubs
    triples = spark.createDataFrame(
        [("d1", "http://purl.org/dc/terms/subject", "Spark [x]", "literal"),
         ("d2", "http://purl.org/dc/terms/subject", "Spark x", "literal"),
         ("d3", "http://purl.org/dc/terms/subject", "Graphs", "literal")],
        ["subject", "predicate", "object", "objtype"])
    hubs = {r["term"]: r for r in keyword_hubs(triples).collect()}
    # sanitize drops []{}|#<>& → both docs land on 'Spark x'
    assert hubs["Spark x"]["n_docs"] == 2
    assert hubs["Graphs"]["docs"] == ["d3"]


def test_void_stats_hand_values(spark, tmp_path):
    """VoID partitions over a 5-triple graph with hand-counted
    numbers + DuckDB twin parity."""
    import duckdb
    from ferenda_spark.namespaces import RDF_TYPE
    from ferenda_spark.operators.graphops import void_stats, sql_void_stats
    EX = "http://example.org/"
    data = [
        (EX + "a", RDF_TYPE, EX + "Doc", "uri"),
        (EX + "b", RDF_TYPE, EX + "Doc", "uri"),
        (EX + "a", EX + "title", "A", "literal"),
        (EX + "a", EX + "ref", EX + "b", "uri"),
        (EX + "x", EX + "title", "X", "literal"),  # untyped subject
    ]
    df = spark.createDataFrame(
        data, "subject string, predicate string, object string, "
              "objtype string")
    rows = {(r.partition, r.key): (r.n_triples, r.n_subjects,
                                   r.n_objects)
            for r in void_stats(df).collect()}
    assert rows[("dataset", None)] == (5, 3, 4)
    assert rows[("property", RDF_TYPE)] == (2, 2, 1)
    assert rows[("property", EX + "title")] == (2, 2, 2)
    assert rows[("class", EX + "Doc")] == (4, 2, 3)  # a:3 + b:1 triples
    p = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(p)
    oracle = {(r[0], r[1]): tuple(r[2:]) for r in duckdb.sql(
        sql_void_stats("read_parquet('%s/*.parquet')" % p)).fetchall()}
    assert oracle == rows
