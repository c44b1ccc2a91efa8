"""News/feeds read path, Spark-native.

The reference derives Atom feeds from document entries decorated with
faceted data (ref ferenda/documentrepository.py:3065-3298:
news_facet_entries / news_feedsets / news_select_for_feeds; the Atom
serialization itself is presentation and out of scope per SURVEY §3).
Set-at-a-time:

- :func:`news_facet_entries` — inner join of the faceted table with
  the entries table through the (url, uri) document mapping; rows
  without an entry drop, mirroring the reference's skip-on-mismatch
  (ref :3110-3117)
- :func:`news_feedsets` — one row per feed over the feed-enabled
  facets (distinct selector values, slug = term/urlfragment.lower(),
  title from the facet pagetitle) plus the built-in All/main feed
  (ref :3157-3222)
- :func:`news_select_for_feeds` — per-feed entry lists keyed by the
  facet *identificator*, ordered by the facet key (uri tiebreak added
  for determinism; the reference relies on stable sort over input
  order), plus the main feed ordered by updated desc
  (ref :3240-3294, news_entrysort_key :3229-3238)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .facetlib import Facet, _selector_col, _with_labels


def feed_facets(facets: list[Facet]) -> list[Facet]:
    """The feed-enabled subset — rdf:type and dcterms:publisher in the
    default set (ref facet.py:440-448, 480-490 use_for_feed)."""
    feed_preds = {"http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                  "http://purl.org/dc/terms/publisher",
                  "http://schema.org/free"}
    return [f for f in facets if f.predicate in feed_preds]


def news_facet_entries(faceted: DataFrame, docs: DataFrame,
                       entries: DataFrame) -> DataFrame:
    """faceted × docs(url, uri) × entries(url, title, updated,
    published) → decorated rows."""
    d = docs.select("url", "uri")
    e = entries.withColumnRenamed("title", "entry_title")
    return faceted.join(d, "uri").join(e, "url")


def news_feedsets(news_entries: DataFrame, facets: list[Facet],
                  labels: DataFrame | None = None,
                  main_label: str = "All documents") -> DataFrame:
    """→ (feedset_label, binding, value, slug, title): one row per
    feed + the All/main feed (binding/value NULL)."""
    src = _with_labels(news_entries, facets, labels)
    spark = news_entries.sparkSession
    parts = []
    for f in feed_facets(facets):
        if f.column not in src.columns:
            continue
        col = F.col(f.column)
        lab = F.col(f.column + "__label") \
            if (f.column + "__label") in src.columns else None
        sel = _selector_col(f.selector, col, lab)
        ident = _selector_col(f.identificator, col, lab)
        title_tpl = f.pagetitle % {"term": f.term, "selected": "\x00"}
        parts.append(
            src.where(col.isNotNull())
               .select(F.lit(f.label % {"term": f.term})
                        .alias("feedset_label"),
                       F.lit(f.column).alias("binding"),
                       sel.alias("value"), ident.alias("urlfragment"))
               .where(F.col("value").isNotNull())
               .groupBy("feedset_label", "binding", "value")
               .agg(F.min("urlfragment").alias("urlfragment"))
               .select("feedset_label", "binding", "value",
                       F.concat(F.lit(f.term + "/"),
                                F.lower("urlfragment")).alias("slug"),
                       F.replace(F.lit(title_tpl), F.lit("\x00"),
                                 F.col("value")).alias("title")))
    main = spark.createDataFrame(
        [("All", None, None, "main", main_label)],
        "feedset_label string, binding string, value string, "
        "slug string, title string")
    out = None
    for p in parts:
        out = p if out is None else out.unionByName(p)
    out = main if out is None else out.unionByName(main)
    return out.orderBy("feedset_label", "binding", "value")


def news_select_for_feeds(news_entries: DataFrame, facets: list[Facet],
                          labels: DataFrame | None = None,
                          sortkey: str = "updated") -> DataFrame:
    """→ (binding, value, pos, uri, entry_title, updated): per-feed
    ordered entries; the main feed (binding/value NULL) carries every
    entry ordered by ``sortkey`` descending."""
    src = _with_labels(news_entries, facets, labels)
    out_cols = ["binding", "value", "pos", "uri", "entry_title", "updated"]
    parts = []
    for f in feed_facets(facets):
        if f.column not in src.columns:
            continue
        col = F.col(f.column)
        lab = F.col(f.column + "__label") \
            if (f.column + "__label") in src.columns else None
        ident = _selector_col(f.identificator, col, lab)
        key = _selector_col(f.key, col, lab)
        w = (Window.partitionBy("binding", "value")
             .orderBy(F.desc("_key") if f.key_descending
                      else F.asc("_key"), F.asc("uri")))
        parts.append(
            src.where(col.isNotNull())
               .select(F.lit(f.column).alias("binding"),
                       ident.alias("value"), key.alias("_key"),
                       "uri", "entry_title", "updated")
               .where(F.col("value").isNotNull())
               .withColumn("pos", F.row_number().over(w))
               .select(*out_cols))
    main = (src.select(F.lit(None).cast("string").alias("binding"),
                       F.lit(None).cast("string").alias("value"),
                       "uri", "entry_title", "updated")
            .withColumn("pos", F.row_number().over(
                Window.partitionBy(F.lit(1))
                .orderBy(F.desc(sortkey), F.asc("uri"))))
            .select(*out_cols))
    out = None
    for p in parts:
        out = p if out is None else out.unionByName(p)
    out = main if out is None else out.unionByName(main)
    return out.orderBy("binding", "value", "pos")
