"""Distributed entity linking: label mentions → canonical resource URIs.

The reference resolves labels one at a time with ``lookup_resource``
(exact dict hit, else difflib.get_close_matches cutoff 0.8 — ref
ferenda/documentrepository.py:478-525). The distributed form keeps
exact difflib scoring parity while avoiding an all-pairs comparison:

1. exact matches via broadcast hash join on the label (covers the
   overwhelming majority at corpus scale);
2. misses generate candidates by 3-gram overlap against the broadcast
   dictionary (an LSH-lite: mentions sharing zero trigrams with a
   candidate can never reach ratio ≥ 0.8 for realistic label lengths);
3. candidates are scored in an Arrow-batched pandas UDF running the
   *actual* difflib staged ratios (ferenda_spark.linking.close_enough),
   keeping the best candidate per mention by (ratio, label) — identical
   pick to get_close_matches' sort.

The dictionary is assumed small relative to the corpus (authority
tables are); it is broadcast, so the only shuffle is the final
groupBy(mention) if candidates exploded — bounded by candidates/label.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, StringType, StructField,
                               StructType)

SCORE_SCHEMA = StructType([
    StructField("label", StringType()),
    StructField("matched_label", StringType()),
    StructField("uri", StringType()),
    StructField("ratio", DoubleType()),
])




def link_labels(mentions: DataFrame, dictionary: DataFrame,
                cutoff: float = 0.8,
                label_col: str = "label") -> DataFrame:
    """mentions(label, …) × dictionary(label, uri) →
    (label, matched_label, uri, method) with method ∈ {exact, fuzzy};
    unresolvable labels are dropped (the reference raises KeyError —
    at set level that is a filter, counted upstream via lineage).
    """
    spark = mentions.sparkSession
    m = mentions.select(F.col(label_col).alias("label")).distinct()
    d = dictionary.select(F.col("label").alias("dict_label"), "uri")

    exact = (m.join(F.broadcast(d), m.label == d.dict_label)
             .select("label", F.col("dict_label").alias("matched_label"),
                     "uri", F.lit("exact").alias("method")))

    missing = m.join(F.broadcast(d), m.label == d.dict_label, "left_anti")

    dict_rows = [(r["dict_label"], r["uri"]) for r in d.collect()]
    bc = spark.sparkContext.broadcast(dict_rows)

    def score(batches):
        from ferenda_spark.linking import TrigramIndex
        # inverted index built once per task from the broadcast rows:
        # each miss probes only entries sharing ≥1 trigram (sublinear in
        # dictionary size), and tie-breaking matches get_close_matches
        # exactly — (ratio, label) descending
        index = TrigramIndex(bc.value)
        for pdf in batches:
            rows = []
            for label in pdf["label"]:
                best = index.best_fuzzy(label, cutoff)
                if best:
                    rows.append({"label": label, "matched_label": best[0],
                                 "uri": best[1], "ratio": best[2]})
            yield pd.DataFrame(rows, columns=SCORE_SCHEMA.fieldNames())

    fuzzy = (missing.mapInPandas(score, SCORE_SCHEMA)
             .select("label", "matched_label", "uri",
                     F.lit("fuzzy").alias("method")))
    return exact.unionByName(fuzzy)


def link_triples(triples: DataFrame, dictionary: DataFrame,
                 predicates: list[str], cutoff: float = 0.8) -> DataFrame:
    """Rewrite literal objects of the given predicates to resource URIs
    through :func:`link_labels` (the relate-stage application: publisher
    and category literals → authority URIs)."""
    target = triples.where((F.col("predicate").isin(predicates)) &
                           (F.col("objtype") == "literal"))
    links = link_labels(target.select(F.col("object").alias("label")),
                        dictionary, cutoff)
    return (target.join(links, target.object == links.label)
            .select("subject", "predicate",
                    F.col("uri").alias("object"),
                    F.lit("uri").alias("objtype"),
                    F.lit("").alias("lang"), F.lit("").alias("datatype"),
                    "source_url", "method"))


def blocked_pairs(df: DataFrame, id_col: str = "url",
                  text_col: str = "title", max_dist: int = 2,
                  block_len: int = 16) -> DataFrame:
    """→ (a, b, dist): standard-blocking entity-resolution candidate
    pairs — rows whose normalized keys share a block (first
    ``block_len`` chars + exact length) and sit within Levenshtein
    ``max_dist``; ``a < b`` on the id. The classic cheap ER pass
    before an expensive scorer.

    Engine note: Spark's levenshtein counts CODEPOINTS, DuckDB's
    counts bytes — they diverge on non-ASCII. The distance here runs
    over the ASCII PROJECTION (every non-ASCII char → '?', lowercased,
    trimmed) so both engines see 1-byte chars and agree exactly; for
    blocking that projection is the usual accent-insensitive key
    anyway. NULL/empty keys never pair.

    Scale notes: one self equi-join on the (prefix, length) block key
    — quadratic only within a block, the knob being ``block_len``;
    the distance is evaluated JVM-side (codegen) on the joined pairs
    only. Adversarial single-hot-block data wants a longer prefix or
    an upstream length-band split, the standard blocking trade.
    """
    norm = F.lower(F.trim(F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")),
        r"[^\x20-\x7e]", "?")))
    keyed = (df.select(F.col(id_col).alias("_id"), norm.alias("_k"))
             .where(F.col("_k") != "")
             .withColumn("_blk", F.concat_ws(
                 "|", F.substring(F.col("_k"), 1, block_len),
                 F.length(F.col("_k")).cast("string")))
             .distinct())
    l = keyed.select(F.col("_blk"), F.col("_id").alias("a"),
                     F.col("_k").alias("_ka"))
    r = keyed.select(F.col("_blk"), F.col("_id").alias("b"),
                     F.col("_k").alias("_kb"))
    return (l.join(r, "_blk")
            .where(F.col("a") < F.col("b"))
            .withColumn("dist", F.levenshtein("_ka", "_kb"))
            .where(F.col("dist") <= max_dist)
            .select("a", "b", F.col("dist").cast("long").alias("dist")))


def sql_blocked_pairs(table_sql: str, id_col: str = "url",
                      text_col: str = "title", max_dist: int = 2,
                      block_len: int = 16) -> str:
    """DuckDB twin of :func:`blocked_pairs` (the ASCII projection
    makes byte-Levenshtein ≡ codepoint-Levenshtein)."""
    return f"""
    WITH keyed AS (
      SELECT DISTINCT {id_col} AS id,
             lower(trim(regexp_replace(coalesce({text_col}, ''),
                                       '[^\\x20-\\x7e]', '?', 'g')))
               AS k
      FROM {table_sql}),
    blk AS (
      SELECT id, k,
             substr(k, 1, {block_len}) || '|' || length(k)::VARCHAR
               AS b
      FROM keyed WHERE k <> '')
    SELECT l.id AS a, r.id AS b,
           levenshtein(l.k, r.k)::BIGINT AS dist
    FROM blk l JOIN blk r ON l.b = r.b AND l.id < r.id
    WHERE levenshtein(l.k, r.k) <= {max_dist}
    ORDER BY a, b
    """
