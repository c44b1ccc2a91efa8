"""Fulltext search read path over the resources table, BM25-ranked.

The reference indexes per-resource plaintext into Whoosh/ElasticSearch
and serves ranked term queries (ref ferenda/fulltextindex.py:1-120,
391-616, wsgiapp /search); both backends rank with BM25(F) and boost
the title field (ref ferenda/facet.py:450 Text(boost=4)). Two
execution shapes over the same scoring:

- :func:`fulltext_search` — scan-search: tokenize + score every
  resource row, top-k via TakeOrderedAndProject. Correct and
  shuffle-free, but every query reads the whole corpus — the batch
  analytics shape, not an index.
- :func:`build_posting_index` + :func:`fulltext_search_indexed` — the
  100-TB read path: an inverted posting table (term, resource_uri, tf)
  built once (explode → groupBy, the ES bulk-index analog, ref
  fulltextindex.py:452-491 update/commit), searched by semi-joining
  the query terms — the scan is pruned to the terms' postings
  (partition/bucket by term at scale) instead of the full corpus.

Scoring (identical in both shapes, and SQL-expressible so the driver
queries carry hard DuckDB oracles):

- tokenize = lowercase split on non-word runs, empties dropped;
- per-field tf with title weighted ``title_boost``× (BM25F simplified
  to a field-weighted tf, shared body-length normalization);
- idf = ln(1 + (N − df + 0.5)/(df + 0.5))  (Lucene/ES BM25),
  df counted on the boosted tf (body OR title hit);
- score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl)),
  k1=1.2, b=0.75 (ES defaults), summed in query-term order.

All corpus statistics (N, avgdl, df per term) are exact integer
aggregates, so Spark and DuckDB derive bit-identical doubles; float
literals are interpolated with repr() so both engines parse the same
values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\W+"),
                    lambda t: t != F.lit(""))


def _tf(text: Column, term: str) -> Column:
    return F.size(F.filter(_tokens(text), lambda t: t == F.lit(term.lower())))


def _bm25_score(tfs: list[Column], dfs: list[Column], n: Column,
                avgdl: Column, dl: Column, k1: float, b: float) -> Column:
    """Σ per-term BM25 contributions in term order (fixed fold order →
    reproducible across engines)."""
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl / avgdl))
    score = None
    for tf, df in zip(tfs, dfs):
        idf = F.log(F.lit(1.0) +
                    (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        c = idf * ((tf * F.lit(k1 + 1.0)) / (tf + norm))
        score = c if score is None else score + c
    return F.round(score, 6)


def fulltext_search(resources: DataFrame, terms: list[str], k: int = 20,
                    text_col: str = "text",
                    id_col: str = "resource_uri",
                    docs: DataFrame | None = None,
                    title_boost: int = 4,
                    k1: float = K1, b: float = B) -> DataFrame:
    """→ (resource_uri, score, snippet) top-k rows by BM25, tiebreak on
    resource_uri. With ``docs`` (url, title), title term hits weigh
    ``title_boost``× in tf (broadcast join — document metadata is
    narrow)."""
    src = resources
    title = None
    if docs is not None:
        src = src.join(F.broadcast(docs.select("url", "title")), "url",
                       "left")
        title = F.coalesce(F.col("title"), F.lit(""))
    tf_cols, sel = [], []
    for i, term in enumerate(terms):
        tf = _tf(F.col(text_col), term)
        if title is not None:
            tf = tf + F.lit(title_boost) * _tf(title, term)
        sel.append(tf.cast("double").alias(f"_tf{i}"))
        tf_cols.append(f"_tf{i}")
    scored = src.select(F.col(id_col).alias("resource_uri"),
                        F.col(text_col).alias("_text"),
                        F.size(_tokens(F.col(text_col))).cast("double")
                        .alias("_dl"), *sel)
    stats = scored.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[F.sum(F.when(F.col(c) > 0, 1).otherwise(0)).cast("double")
          .alias(c + "_df") for c in tf_cols])
    score = _bm25_score([F.col(c) for c in tf_cols],
                        [F.col(c + "_df") for c in tf_cols],
                        F.col("_n"), F.col("_avgdl"), F.col("_dl"), k1, b)
    return (scored.crossJoin(F.broadcast(stats))
            .select("resource_uri", score.alias("score"),
                    F.substring(F.col("_text"), 1, 80).alias("snippet"))
            .where(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("resource_uri"))
            .limit(k))


# ------------------------------------------------- posting-table path

def build_posting_index(resources: DataFrame,
                        docs: DataFrame | None = None,
                        text_col: str = "text",
                        id_col: str = "resource_uri",
                        title_boost: int = 4
                        ) -> tuple[DataFrame, DataFrame]:
    """→ (postings, doclens): the inverted index.

    postings (term, resource_uri, tf) — tf is the field-weighted
    BM25F tf (body + title_boost·title); one row per (resource, term)
    with tf > 0, so df(term) = its posting count. doclens
    (resource_uri, dl) covers every resource (the corpus stats N and
    avgdl come from it).

    Scale notes: one explode + one groupBy per field — the classic
    distributed index build; write the postings table partitioned/
    bucketed by term so a query's semi-join prunes to its terms'
    buckets. Rebuild is incremental by construction (re-run over
    changed urls, MERGE by (term, resource_uri))."""
    body = (resources
            .select(F.col(id_col).alias("resource_uri"),
                    F.explode(_tokens(F.col(text_col))).alias("term"))
            .groupBy("resource_uri", "term")
            .agg(F.count(F.lit(1)).alias("tf_body")))
    doclens = resources.select(
        F.col(id_col).alias("resource_uri"),
        F.size(_tokens(F.col(text_col))).cast("double").alias("dl"))
    if docs is None:
        postings = body.select("term", "resource_uri",
                               F.col("tf_body").cast("double").alias("tf"))
        return postings, doclens
    title_tf = (docs
                .select("url", F.explode(_tokens(
                    F.coalesce(F.col("title"), F.lit("")))).alias("term"))
                .groupBy("url", "term")
                .agg(F.count(F.lit(1)).alias("tf_title")))
    res_urls = resources.select(F.col(id_col).alias("resource_uri"), "url")
    title_part = (res_urls.join(F.broadcast(title_tf), "url")
                  .select("resource_uri", "term", "tf_title"))
    postings = (body.join(title_part, ["resource_uri", "term"], "full")
                .select("term", "resource_uri",
                        (F.coalesce(F.col("tf_body"), F.lit(0)) +
                         F.lit(title_boost) *
                         F.coalesce(F.col("tf_title"), F.lit(0)))
                        .cast("double").alias("tf")))
    return postings, doclens


def fulltext_search_indexed(postings: DataFrame, doclens: DataFrame,
                            terms: list[str], k: int = 20,
                            resources: DataFrame | None = None,
                            text_col: str = "text",
                            id_col: str = "resource_uri",
                            k1: float = K1, b: float = B,
                            checkpoint: bool = True) -> DataFrame:
    """Indexed BM25 search: prune the posting table to the query terms
    (a semi-join — with the postings bucketed by term, a metadata-level
    partition prune), pivot per-term tfs per resource, score with the
    same fold as :func:`fulltext_search` — scores are identical to the
    scan path by construction. ``resources`` re-attaches the snippet
    text for the top-k only."""
    lterms = [t.lower() for t in terms]
    matched = postings.where(F.col("term").isin(lterms))
    stats = doclens.agg(F.count(F.lit(1)).cast("double").alias("_n"),
                        F.avg("dl").alias("_avgdl"))
    # pivot the (few) query terms into fixed-order columns so the score
    # fold order matches the scan path exactly; localCheckpoint because
    # the pruned pivot feeds BOTH the df aggregate and the score join —
    # without it each consumer re-runs the posting build (measured:
    # the whole explode+join subtree appeared twice in the plan)
    per_res = matched.groupBy("resource_uri").agg(
        *[F.coalesce(F.sum(F.when(F.col("term") == t, F.col("tf"))),
                     F.lit(0.0)).alias(f"_tf{i}")
          for i, t in enumerate(lterms)])
    if checkpoint:  # checkpoint=False keeps the logical plan inspectable
        per_res = per_res.localCheckpoint(eager=True)
    # per-term df from the pivot (a posting exists iff tf > 0, and a
    # resource absent from per_res has tf = 0 for every query term)
    df_row = per_res.agg(
        *[F.sum(F.when(F.col(f"_tf{i}") > 0, 1).otherwise(0))
          .cast("double").alias(f"_df{i}") for i in range(len(lterms))])
    score = _bm25_score([F.col(f"_tf{i}") for i in range(len(lterms))],
                        [F.col(f"_df{i}") for i in range(len(lterms))],
                        F.col("_n"), F.col("_avgdl"), F.col("dl"), k1, b)
    out = (per_res
           .join(doclens, "resource_uri")
           .crossJoin(F.broadcast(stats))
           .crossJoin(F.broadcast(df_row))
           .select("resource_uri", score.alias("score"))
           .where(F.col("score") > 0)
           .orderBy(F.desc("score"), F.asc("resource_uri"))
           .limit(k))
    if resources is None:
        return out
    snip = resources.select(F.col(id_col).alias("resource_uri"),
                            F.substring(F.col(text_col), 1, 80)
                            .alias("snippet"))
    return (out.join(snip, "resource_uri", "left")
            .select("resource_uri", "score", "snippet")
            .orderBy(F.desc("score"), F.asc("resource_uri")))


# ------------------------------------------------------------- oracle

def _sql_tokens(col: str) -> str:
    return ("list_filter(regexp_split_to_array(lower(%s), '\\W+'), "
            "t -> t <> '')" % col)


def _sql_tf(col: str, term: str) -> str:
    return "len(list_filter(%s, t -> t = '%s'))" % (_sql_tokens(col),
                                                    term.lower())


def oracle_sql_fulltext(resources_table: str, terms: list[str],
                        k: int = 20, docs_table: str | None = None,
                        title_boost: int = 4,
                        k1: float = K1, b: float = B) -> str:
    """BM25 oracle — mirrors the Spark fold op-for-op; serves both the
    scan and the indexed query (their scores are identical by
    construction)."""
    tf_exprs = []
    for term in terms:
        tf = _sql_tf("r.text", term)
        if docs_table is not None:
            tf = "(%s + %d * %s)" % (tf, title_boost,
                                     _sql_tf("coalesce(d.title, '')", term))
        tf_exprs.append(tf)
    join = ("LEFT JOIN %s d ON d.url = r.url" % docs_table
            if docs_table else "")
    tf_cols = ",\n             ".join(
        "%s::DOUBLE AS tf%d" % (e, i) for i, e in enumerate(tf_exprs))
    df_cols = ",\n             ".join(
        "sum(CASE WHEN tf%d > 0 THEN 1 ELSE 0 END)::DOUBLE AS df%d"
        % (i, i) for i in range(len(terms)))
    contribs = " + ".join(
        "(ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        " * ((tf{i} * {k1p1}) / (tf{i} + {k1} * ({omb} + {b}"
        " * (dl / avgdl)))))".format(
            i=i, k1p1=repr(k1 + 1.0), k1=repr(k1), omb=repr(1.0 - b),
            b=repr(b))
        for i in range(len(terms)))
    return f"""
    WITH src AS (
      SELECT r.resource_uri, r.text,
             len({_sql_tokens('r.text')})::DOUBLE AS dl,
             {tf_cols}
      FROM {resources_table} r {join}
    ), stats AS (
      SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl,
             {df_cols}
      FROM src
    )
    SELECT resource_uri, score, snippet FROM (
      SELECT resource_uri, round({contribs}, 6) AS score,
             substr(text, 1, 80) AS snippet
      FROM src CROSS JOIN stats)
    WHERE score > 0
    ORDER BY score DESC, resource_uri ASC
    LIMIT {k}
    """


def merge_posting_index(postings: DataFrame, doclens: DataFrame,
                        res_delta: DataFrame,
                        docs_delta: DataFrame | None = None,
                        removed_uris: DataFrame | None = None,
                        text_col: str = "text",
                        id_col: str = "resource_uri",
                        title_boost: int = 4
                        ) -> tuple[DataFrame, DataFrame]:
    """Incremental index maintenance → (postings, doclens): changed
    resources' postings are replaced, removed resources' dropped, new
    ones appended — the ES update/delete-then-commit analog (ref
    ferenda/fulltextindex.py:452-539) as set operations, so the
    incremental index is IDENTICAL to a full rebuild (asserted by
    tests and the kg_search_delta driver query, which shares the full
    rebuild's oracle).

    Scale notes: the crawl-batch-sized delta/removal uri sets
    broadcast into two anti-joins against the corpus-sized tables
    (which therefore never shuffle); only the delta runs the explode +
    groupBy build. Production layout note: with postings partitioned
    by term, the anti-join rewrites only data files whose terms occur
    in the delta — Iceberg MERGE handles that file pruning.
    """
    new_p, new_d = build_posting_index(res_delta, docs_delta,
                                       text_col, id_col, title_boost)
    gone = res_delta.select(F.col(id_col).alias("resource_uri"))
    if removed_uris is not None:
        gone = gone.unionByName(
            removed_uris.select(F.col(id_col).alias("resource_uri")))
    gone = gone.distinct()
    merged_p = (postings.join(F.broadcast(gone), "resource_uri",
                              "left_anti")
                .select("term", "resource_uri", "tf")
                .unionByName(new_p))
    merged_d = (doclens.join(F.broadcast(gone), "resource_uri",
                             "left_anti")
                .unionByName(new_d))
    return merged_p, merged_d


def rrf_fuse(rankings: list[tuple[DataFrame, str, str]],
             k: int = 60, round_to: int = 6) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of candidate
    lists: each input (df, id_col, score_col) is ranked by
    (score desc, id asc — total, engine-agnostic) and every id gets
    Σ 1/(k + rankᵣ) over the lists it appears in, plus ``n_lists``.
    THE standard way to merge BM25 with a graph signal (pagerank)
    without score calibration.

    Contract: inputs are per-query CANDIDATE lists (top-k search
    results, top-k authority lists) — bounded by construction — so
    the global row_number window here is bounded too; fusing a
    corpus-sized ranking is a contract violation, cap it upstream.
    RRF over two lists sums two IEEE doubles — addition of two terms
    is commutative, so the result is fold-order-free.
    """
    from pyspark.sql import Window
    parts = []
    for df, id_col, score_col in rankings:
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        parts.append(df.select(F.col(id_col).alias("id"),
                               F.row_number().over(w).alias("rnk")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy("id")
            .agg(F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("rnk"))),
                         round_to).alias("rrf"),
                 F.count(F.lit(1)).alias("n_lists")))
