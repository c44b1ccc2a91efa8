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
    from .facetlib import melt_facets
    feed = [f for f in feed_facets(facets)
            if f.column in news_entries.columns]
    src = _with_labels(news_entries, facets, labels)
    spark = news_entries.sparkSession

    def fields(f, col, lab):
        return [_selector_col(f.selector, col, lab).alias("value"),
                _selector_col(f.identificator, col, lab)
                .alias("urlfragment"),
                F.lit(f.label % {"term": f.term}).alias("feedset_label"),
                F.lit(f.term + "/").alias("slug_prefix"),
                F.lit(f.pagetitle % {"term": f.term, "selected": "\x00"})
                .alias("title_tpl")]

    melted = melt_facets(src, feed, fields)
    # one feed per distinct selector value; the feed's VALUE is the
    # identificator urlfragment (ref :3206-3215 Feed(value=urlfragment))
    # while the title renders the selector value
    grouped = (melted
               .groupBy("feedset_label", "binding", "value", "slug_prefix",
                        "title_tpl")
               .agg(F.min("urlfragment").alias("urlfragment"))
               .select("feedset_label", "binding",
                       F.replace(F.col("title_tpl"), F.lit("\x00"),
                                 F.col("value")).alias("title"),
                       F.col("urlfragment").alias("value"),
                       F.concat("slug_prefix",
                                F.lower("urlfragment")).alias("slug"))
               .select("feedset_label", "binding", "value", "slug",
                       "title"))
    main = spark.createDataFrame(
        [("All", None, None, "main", main_label)],
        "feedset_label string, binding string, value string, "
        "slug string, title string")
    return (grouped.unionByName(main)
            .orderBy("feedset_label", "binding", "value"))


def atom_feeds(feed_entries: DataFrame, feedsets: DataFrame,
               base_url: str = "http://example.org/",
               archivesize: int = 100) -> DataFrame:
    """→ (slug, title, n_entries, atom_xml): one Atom 1.0 document per
    feed (≙ news_write_atom, ref documentrepository.py:3445-3540; the
    reference's archive splitting maps to ``archivesize`` truncation —
    entry lists per feed are bounded, never corpus-scale).

    The per-feed entry list is assembled with a bounded collect_list
    (positions ≤ archivesize) and serialized in a native-free pandas
    UDF; output is a flat string column — feeds are data here, the
    file/HTTP layer is the caller's sink."""
    import pandas as pd
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType)
    ranked = (feed_entries
              .where(F.col("pos") <= archivesize)
              .groupBy("binding", "value")
              .agg(F.count(F.lit(1)).alias("n_entries"),
                   F.sort_array(F.collect_list(F.struct(
                       "pos", "uri", "entry_title", "updated")))
                   .alias("entries")))
    joined = (feedsets.join(ranked,
                            (feedsets.binding.eqNullSafe(ranked.binding) &
                             feedsets.value.eqNullSafe(ranked.value)),
                            "left")
              .select(feedsets.slug, feedsets.title,
                      F.coalesce("n_entries", F.lit(0)).alias("n_entries"),
                      "entries"))
    schema = StructType([
        StructField("slug", StringType()),
        StructField("title", StringType()),
        StructField("n_entries", IntegerType()),
        StructField("atom_xml", StringType()),
    ])

    def render(batches):
        import xml.etree.ElementTree as ET
        for pdf in batches:
            rows = []
            for slug, title, n, entries in zip(pdf["slug"], pdf["title"],
                                               pdf["n_entries"],
                                               pdf["entries"]):
                feed = ET.Element("feed",
                                  xmlns="http://www.w3.org/2005/Atom")
                ET.SubElement(feed, "id").text = \
                    "%sfeed/%s.atom" % (base_url, slug)
                ET.SubElement(feed, "title").text = title
                entries = entries if entries is not None else []
                upd = max((e["updated"] for e in entries), default="")
                ET.SubElement(feed, "updated").text = upd
                for e in entries:
                    el = ET.SubElement(feed, "entry")
                    ET.SubElement(el, "id").text = e["uri"]
                    ET.SubElement(el, "title").text = e["entry_title"]
                    ET.SubElement(el, "updated").text = e["updated"]
                    ET.SubElement(el, "link", href=e["uri"])
                rows.append({"slug": slug, "title": title,
                             "n_entries": int(n),
                             "atom_xml": ET.tostring(
                                 feed, encoding="unicode")})
            yield pd.DataFrame(rows, columns=schema.fieldNames())

    return joined.mapInPandas(render, schema)


def news_select_for_feeds(news_entries: DataFrame, facets: list[Facet],
                          labels: DataFrame | None = None,
                          sortkey: str = "updated") -> DataFrame:
    """→ (binding, value, pos, uri, entry_title, updated): per-feed
    ordered entries; the main feed (binding/value NULL) carries every
    entry ordered by ``sortkey`` descending."""
    from .facetlib import melt_facets
    feed = [f for f in feed_facets(facets)
            if f.column in news_entries.columns]
    src = _with_labels(news_entries, facets, labels)
    out_cols = ["binding", "value", "pos", "uri", "entry_title", "updated"]

    def fields(f, col, lab):
        return [_selector_col(f.identificator, col, lab).alias("value"),
                _selector_col(f.key, col, lab).cast("string")
                .alias("_key")]

    out = None
    for descending in sorted({f.key_descending for f in feed}):
        group = [f for f in feed if f.key_descending is descending]
        melted = melt_facets(src, group, fields)
        w = (Window.partitionBy("binding", "value")
             .orderBy(F.desc("_key") if descending else F.asc("_key"),
                      F.asc("uri")))
        part = (melted.withColumn("pos", F.row_number().over(w))
                .select(*out_cols))
        out = part if out is None else out.unionByName(part)
    main = (src.select(F.lit(None).cast("string").alias("binding"),
                       F.lit(None).cast("string").alias("value"),
                       "uri", "entry_title", "updated")
            .withColumn("pos", F.row_number().over(
                Window.partitionBy(F.lit(1))
                .orderBy(F.desc(sortkey), F.asc("uri"))))
            .select(*out_cols))
    out = main if out is None else out.unionByName(main)
    return out.orderBy("binding", "value", "pos")
