"""Fulltext search read path over the resources table.

The reference indexes per-resource plaintext into Whoosh/ElasticSearch
and serves ranked term queries (ref ferenda/fulltextindex.py:1-120,
wsgiapp /search). The engine's fulltext "index" IS the resources table
(url, resource_uri, text) — partitioned columnar text — and a ranked
term query is a scan + score + top-k:

- tokenize = lowercase split on non-word runs (the indexing analyzer);
- score = Σ per-query-term term frequency, with an optional boost for
  matches in the document title (≙ the reference's per-field boosts,
  fulltextindex.py Text(boost=4) on title);
- top-k by (score desc, resource_uri) via TakeOrderedAndProject — no
  full sort at scale.

Native column expressions only (codegen); the same arithmetic is
SQL-expressible, so the driver query carries a hard DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tf(text: Column, term: str) -> Column:
    tokens = F.split(F.lower(text), r"\W+")
    return F.size(F.filter(tokens, lambda t: t == F.lit(term.lower())))


def fulltext_search(resources: DataFrame, terms: list[str], k: int = 20,
                    text_col: str = "text",
                    id_col: str = "resource_uri",
                    docs: DataFrame | None = None,
                    title_boost: int = 4) -> DataFrame:
    """→ (resource_uri, score, snippet) top-k rows by summed term
    frequency, deterministic tiebreak on resource_uri.

    With ``docs`` (url, title), title matches score ``title_boost``×
    — the reference indexes the title field with boost=4
    (ref ferenda/facet.py:450 fulltextindex.Text(boost=4)); the title
    joins in broadcast (documents metadata is narrow)."""
    src = resources
    title = None
    if docs is not None:
        src = src.join(F.broadcast(docs.select("url", "title")), "url",
                       "left")
        title = F.coalesce(F.col("title"), F.lit(""))
    score = None
    for term in terms:
        tf = _tf(F.col(text_col), term)
        if title is not None:
            tf = tf + F.lit(title_boost) * _tf(title, term)
        score = tf if score is None else score + tf
    return (src
            .select(F.col(id_col).alias("resource_uri"),
                    score.cast("long").alias("score"),
                    F.substring(F.col(text_col), 1, 80).alias("snippet"))
            .where(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("resource_uri"))
            .limit(k))


def oracle_sql_fulltext(resources_table: str, terms: list[str],
                        k: int = 20, docs_table: str | None = None,
                        title_boost: int = 4) -> str:
    def tf_expr(col):
        return " + ".join(
            "len(list_filter(regexp_split_to_array(lower(%s), '\\W+'), "
            "t -> t = '%s'))" % (col, term.lower())
            for term in terms)

    if docs_table is None:
        src = f"SELECT resource_uri, text, ({tf_expr('text')})::BIGINT " \
              f"AS score FROM {resources_table}"
    else:
        src = f"""
          SELECT r.resource_uri, r.text,
                 ({tf_expr('r.text')}
                  + {title_boost} *
                    ({tf_expr("coalesce(d.title, '')")}))::BIGINT AS score
          FROM {resources_table} r
          LEFT JOIN {docs_table} d ON d.url = r.url"""
    return f"""
    SELECT resource_uri, score, snippet FROM (
      SELECT resource_uri, score, substr(text, 1, 80) AS snippet
      FROM ({src}))
    WHERE score > 0
    ORDER BY score DESC, resource_uri ASC
    LIMIT {k}
    """
