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
                    id_col: str = "resource_uri") -> DataFrame:
    """→ (resource_uri, score, snippet) top-k rows by summed term
    frequency, deterministic tiebreak on resource_uri."""
    score = None
    for term in terms:
        tf = _tf(F.col(text_col), term)
        score = tf if score is None else score + tf
    return (resources
            .select(F.col(id_col).alias("resource_uri"),
                    score.cast("long").alias("score"),
                    F.substring(F.col(text_col), 1, 80).alias("snippet"))
            .where(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("resource_uri"))
            .limit(k))


def oracle_sql_fulltext(resources_table: str, terms: list[str],
                        k: int = 20) -> str:
    tf = " + ".join(
        "len(list_filter(regexp_split_to_array(lower(text), '\\W+'), "
        "t -> t = '%s'))" % term.lower()
        for term in terms)
    return f"""
    SELECT resource_uri, score, snippet FROM (
      SELECT resource_uri, ({tf})::BIGINT AS score,
             substr(text, 1, 80) AS snippet
      FROM {resources_table})
    WHERE score > 0
    ORDER BY score DESC, resource_uri ASC
    LIMIT {k}
    """
