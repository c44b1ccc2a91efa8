"""Annotation-graph assembly + dependency-driven staleness
(≙ res/sparql/annotations.rq and the dependency-file regeneration
gate, ref documentrepository.py:2392-2405)."""

from pyspark.sql import functions as F

DCT = "http://purl.org/dc/terms/"
COLS = ("subject string, predicate string, object string, objtype string, "
        "lang string, datatype string, source_url string, context string")


def _triples(spark):
    rows = [
        # doc A with part A#1 (and sub-part A#1.1)
        ("A", DCT + "title", "Doc A", "literal", "", "", "a.html", ""),
        ("A#1", DCT + "isPartOf", "A", "uri", "", "", "a.html", ""),
        ("A#1", DCT + "title", "Part 1", "literal", "", "", "a.html", ""),
        ("A#1.1", DCT + "isPartOf", "A#1", "uri", "", "", "a.html", ""),
        # doc B references A's part
        ("B", DCT + "title", "Doc B", "literal", "", "", "b.html", ""),
        ("B", DCT + "references", "A#1", "uri", "", "", "b.html", ""),
        # doc C references nothing, referenced by nothing
        ("C", DCT + "title", "Doc C", "literal", "", "", "c.html", ""),
    ]
    return spark.createDataFrame(rows, COLS)


def _docs(spark):
    return spark.createDataFrame(
        [("a.html", "A"), ("b.html", "B"), ("c.html", "C")], "url string, uri string")


def test_annotation_graph_contents(spark):
    from ferenda_spark.operators.relate import annotation_graphs
    out = annotation_graphs(_triples(spark), _docs(spark))
    a = {(r.subject, r.predicate, r.object)
         for r in out.where(F.col("doc_uri") == "A").collect()}
    # (a) all triples of A and its closed part set
    assert ("A", DCT + "title", "Doc A") in a
    assert ("A#1", DCT + "title", "Part 1") in a
    assert ("A#1.1", DCT + "isPartOf", "A#1") in a
    # (b) the synthesized inbound-reference link + the referencing
    # doc's own triples
    assert ("A#1", DCT + "isReferencedBy", "B") in a
    assert ("B", DCT + "title", "Doc B") in a
    assert ("B", DCT + "references", "A#1") in a
    # nothing about C leaks into A's graph
    assert not any(s == "C" for s, _p, _o in a)
    # C's graph is just C's own triples
    c = {(r.subject, r.predicate, r.object)
         for r in out.where(F.col("doc_uri") == "C").collect()}
    assert c == {("C", DCT + "title", "Doc C")}
    # B's graph: B's triples only (nothing is part of B, nothing
    # references B)
    b = {(r.subject, r.predicate, r.object)
         for r in out.where(F.col("doc_uri") == "B").collect()}
    assert b == {("B", DCT + "title", "Doc B"),
                 ("B", DCT + "references", "A#1")}


def test_stale_after_marks_exactly_dependents(spark):
    from ferenda_spark.operators.relate import deps_table, stale_after
    from ferenda_spark.uris import RepoConfig
    cfg = RepoConfig(alias="doc", url="http://example.org/")
    u = "http://example.org/res/doc/%s"
    rows = [
        # B's graph references A's resource; C's references B's
        (u % "b", DCT + "references", u % "a", "uri", "", "",
         "http://example.org/doc/b.html", ""),
        (u % "c", DCT + "references", u % "b", "uri", "", "",
         "http://example.org/doc/c.html", ""),
    ]
    triples = spark.createDataFrame(rows, COLS)
    docs = spark.createDataFrame(
        [("http://example.org/doc/%s.html" % x, u % x) for x in "abc"],
        "url string, uri string")
    deps = deps_table(triples, docs, cfg)
    # b changed → b itself stale + a (whose annotations embed b's refs);
    # NOT c (one-level, ref documentrepository.py:2392-2405)
    got = [r.url for r in
           stale_after(deps, ["http://example.org/doc/b.html"]).collect()]
    assert got == ["http://example.org/doc/a.html",
                   "http://example.org/doc/b.html"]
    # c changed → c itself + b (c references b); a untouched
    got = [r.url for r in
           stale_after(deps, ["http://example.org/doc/c.html"]).collect()]
    assert got == ["http://example.org/doc/b.html",
                   "http://example.org/doc/c.html"]
    # a changed (references nothing) → only itself
    got = [r.url for r in
           stale_after(deps, ["http://example.org/doc/a.html"]).collect()]
    assert got == ["http://example.org/doc/a.html"]


def test_blocked_pairs_semantics(spark):
    from ferenda_spark.operators.linking import blocked_pairs
    df = spark.createDataFrame(
        [("u1", "Annual Report 2021"),
         ("u2", "Annual Report 2022"),     # dist 1, same block
         ("u3", "Annual Review 2021"),     # dist 3 > max -> out
         ("u4", "Different length title"),  # other block
         ("u5", "Annual Report 20XX"),     # dist 2 to u1/u2
         ("u6", None), ("u7", "")],        # never pair
        "url string, title string")
    got = {(r["a"], r["b"]): r["dist"]
           for r in blocked_pairs(df, max_dist=2).collect()}
    assert got == {("u1", "u2"): 1, ("u1", "u5"): 2, ("u2", "u5"): 2}
    # non-ASCII projects to '?' so both engines agree; é≠e is dist 1
    # (the accent sits past the 16-char block prefix — a difference
    # inside the prefix would put the rows in different blocks)
    acc = spark.createDataFrame(
        [("a1", "Quarterly Report Café 9"),
         ("a2", "Quarterly Report Cafe 9")],
        "url string, title string")
    g2 = {(r["a"], r["b"]): r["dist"]
          for r in blocked_pairs(acc, max_dist=2).collect()}
    assert g2 == {("a1", "a2"): 1}
