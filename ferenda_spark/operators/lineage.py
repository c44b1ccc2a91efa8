"""Lineage, incremental skip, and resumable runs.

The reference records per-document per-stage status/duration in
DocumentEntry JSON sidecars and skips fresh documents via file-mtime
checks (ref ferenda/documententry.py:27-165, ferenda/documentstore.py:
367-437, ferenda/decorators.py:83-129). The distributed analog:

- ``entries`` table: (url, stage, status, error, content_hash, run_id)
- :func:`needed`: anti-join of pages against successful entries on
  (url, sha2(html)) — only new or changed rows flow (the conditional-GET
  / download_is_different analog, ref documentrepository.py:1028-1033)
- :func:`merge_triples`: partition-idempotent overwrite — re-running a
  partition replaces that partition's triples (the context CLEAR +
  reload analog, ref documentrepository.py:1658-1739)
- :func:`stage_counters`: per-stage success/fail counts ≙ statusreport
  (ref ferenda/devel.py:1314-1430)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 64  # url-hash buckets; the write/overwrite unit


def with_content_hash(pages: DataFrame) -> DataFrame:
    return pages.withColumn("content_hash", F.sha2(F.col("html"), 256))


def entries_from_extracted(extracted: DataFrame, pages: DataFrame,
                           stage: str, run_id: str) -> DataFrame:
    hashed = with_content_hash(pages).select("url", "content_hash")
    return (extracted.select("url", "status", "error")
            .join(hashed, "url")
            .select("url",
                    F.lit(stage).alias("stage"),
                    "status", "error", "content_hash",
                    F.lit(run_id).alias("run_id")))


def needed(pages: DataFrame, entries: DataFrame | None,
           stage: str = "parse") -> DataFrame:
    """Rows of pages that are new or changed since the last successful
    run of ``stage``."""
    hashed = with_content_hash(pages)
    if entries is None:
        return hashed
    done = (entries
            .where((F.col("stage") == stage) & (F.col("status") == "ok"))
            .select("url", "content_hash")
            .distinct())
    return hashed.join(done, ["url", "content_hash"], "left_anti")


def stage_counters(entries: DataFrame) -> DataFrame:
    return (entries.groupBy("stage", "status")
            .agg(F.countDistinct("url").alias("n_urls"))
            .orderBy("stage", "status"))


def bucket_of(col):
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def write_triples(triples: DataFrame, path: str):
    """Initial write: bucketed by source_url hash so a later partial
    re-run only rewrites affected buckets."""
    (triples.withColumn("bucket", bucket_of(F.col("source_url")))
     .repartition("bucket")
     .sortWithinPartitions("subject", "predicate")
     .write.partitionBy("bucket").mode("overwrite").parquet(path))


def merge_triples(spark: SparkSession, new_triples: DataFrame, path: str):
    """Idempotent per-url replace: buckets containing changed urls are
    rewritten with old-minus-changed ∪ new (Iceberg MERGE analog);
    dynamic partition overwrite leaves other buckets untouched."""
    if not os.path.exists(path):
        write_triples(new_triples, path)
        return
    new_b = new_triples.withColumn("bucket", bucket_of(F.col("source_url")))
    changed_urls = new_b.select("source_url", "bucket").distinct()
    buckets = [r["bucket"] for r in changed_urls.select("bucket").distinct().collect()]
    if not buckets:
        return
    existing = (spark.read.parquet(path)
                .where(F.col("bucket").isin(buckets))
                .join(changed_urls.select("source_url").distinct(),
                      "source_url", "left_anti"))
    # materialize before overwriting the path we just read
    # (Iceberg MERGE INTO replaces this read-union-rewrite in production)
    merged = existing.unionByName(new_b).localCheckpoint(eager=True)
    (merged.repartition("bucket")
     .sortWithinPartitions("subject", "predicate")
     .write.partitionBy("bucket")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(path))
