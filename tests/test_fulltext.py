"""BM25 fulltext search: scan vs inverted-index parity, stopword
behavior, and title-field boost (ref ferenda/fulltextindex.py:391-616
ranks with BM25F; ref facet.py:450 title boost=4)."""

import pytest


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # uri, url, text — doc2 is stuffed with the stopword "the";
        # doc3 mentions the rare term "zebra" once in a short text
        ("u1", "d1", "the quick brown fox jumps over the lazy dog"),
        ("u2", "d2", "the the the the the the the the the the the fence"),
        ("u3", "d3", "a zebra grazes"),
        ("u4", "d4", "nothing relevant here at all whatsoever today"),
        ("u5", "d5", "the crossing near the zoo is busy"),
    ]
    res = spark.createDataFrame(rows, "resource_uri string, url string,"
                                      " text string")
    docs = spark.createDataFrame(
        [("d1", "fox story"), ("d2", "filler"), ("d3", "zebra tales"),
         ("d4", "misc"), ("d5", "crossings")],
        "url string, title string")
    return res, docs


def test_scan_vs_indexed_identical(spark, corpus):
    """The inverted-index path must reproduce the scan path exactly —
    same scores, same order — on a stopword-heavy query."""
    from ferenda_spark.operators.fulltext import (build_posting_index,
                                                  fulltext_search,
                                                  fulltext_search_indexed)
    res, docs = corpus
    terms = ["the", "zebra"]
    scan = fulltext_search(res, terms, k=10, docs=docs)
    postings, doclens = build_posting_index(res, docs=docs)
    idx = fulltext_search_indexed(postings, doclens, terms, k=10,
                                  resources=res)
    assert [tuple(r) for r in scan.collect()] == \
           [tuple(r) for r in idx.collect()]


def test_bm25_downweights_stopwords(spark, corpus):
    """With BM25 idf, a short doc hitting the rare term must outrank
    the stopword-stuffed doc — TF-only scoring would invert this."""
    from ferenda_spark.operators.fulltext import fulltext_search
    res, _docs = corpus
    out = fulltext_search(res, ["the", "zebra"], k=10)
    order = [r.resource_uri for r in out.collect()]
    # u2 has 11× "the" (df 3/5); u3 has 1× "zebra" (df 1/5). TF-only
    # scoring would put u2 first by a mile; BM25 idf + tf saturation
    # must rank the rare-term doc above the stopword-stuffed one.
    assert order.index("u3") < order.index("u2"), order


def test_title_boost_lifts_title_match(spark, corpus):
    from ferenda_spark.operators.fulltext import fulltext_search
    res, docs = corpus
    plain = {r.resource_uri: r.score
             for r in fulltext_search(res, ["zebra"], k=10).collect()}
    boosted = {r.resource_uri: r.score
               for r in fulltext_search(res, ["zebra"], k=10,
                                        docs=docs).collect()}
    # u3's doc title is "zebra tales" → boosted tf lifts its score
    assert boosted["u3"] > plain["u3"]


def test_indexed_prunes_to_query_terms(spark, corpus):
    """The matched-postings subtree must filter on the term column
    (the semi-join that becomes a partition prune when the posting
    table is bucketed by term at scale)."""
    from ferenda_spark.operators.fulltext import (build_posting_index,
                                                  fulltext_search_indexed)
    res, docs = corpus
    postings, doclens = build_posting_index(res, docs=docs)
    plan = fulltext_search_indexed(
        postings, doclens, ["zebra"], k=5,
        checkpoint=False)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "zebra" in plan  # term literal pushed into the plan


def test_merge_posting_index_equals_rebuild(spark):
    """Incremental maintenance ≡ full rebuild: replace-by-uri for
    changed resources, append for new, drop for removed."""
    from ferenda_spark.operators.fulltext import (build_posting_index,
                                                  merge_posting_index)
    cols = "resource_uri string, url string, text string"
    base = spark.createDataFrame([
        ("r1", "u1", "alpha beta beta"),
        ("r2", "u2", "gamma alpha"),
        ("r3", "u3", "delta"),
    ], cols)
    # r2 changes, r4 is new, r3 is removed
    changed = spark.createDataFrame(
        [("r2", "u2", "gamma gamma epsilon"),
         ("r4", "u4", "alpha zeta")], cols)
    removed = spark.createDataFrame([("r3",)], "resource_uri string")
    p0, d0 = build_posting_index(base)
    p1, d1 = merge_posting_index(p0, d0, changed, removed_uris=removed)
    final = spark.createDataFrame([
        ("r1", "u1", "alpha beta beta"),
        ("r2", "u2", "gamma gamma epsilon"),
        ("r4", "u4", "alpha zeta"),
    ], cols)
    pf, df_ = build_posting_index(final)
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(p1) == key(pf)
    assert key(d1) == key(df_)


def test_rrf_fuse_golden(spark):
    from ferenda_spark.operators.fulltext import rrf_fuse
    s1 = spark.createDataFrame([("d1", 9.0), ("d2", 5.0), ("d3", 1.0)],
                               "doc string, score double")
    s2 = spark.createDataFrame([("d2", 0.9), ("d4", 0.5)],
                               "node string, rank double")
    got = {r["id"]: (r["rrf"], r["n_lists"]) for r in
           rrf_fuse([(s1, "doc", "score"), (s2, "node", "rank")],
                    k=60).collect()}
    assert got["d2"] == (round(1 / 62 + 1 / 61, 6), 2)   # both lists
    assert got["d1"] == (round(1 / 61, 6), 1)
    assert got["d4"] == (round(1 / 62, 6), 1)   # rank 2 in its list
    # tie on score breaks on id: equal scores rank in id order
    t = spark.createDataFrame([("b", 1.0), ("a", 1.0)],
                              "doc string, score double")
    gt = {r["id"]: r["rrf"] for r in
          rrf_fuse([(t, "doc", "score")], k=60).collect()}
    assert gt["a"] == round(1 / 61, 6) and gt["b"] == round(1 / 62, 6)
