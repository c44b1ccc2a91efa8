"""Streaming / incremental ingestion of the pages table.

The reference is a batch system whose incrementality is file-mtime
checks + conditional GET (ref ferenda/documentstore.py:367-437,
ferenda/documentrepository.py:923-1033). The faithful distributed
analog is incremental batch (anti-join against lineage, SURVEY.md
§2.8); this module additionally provides the Structured-Streaming form
for continuously-landing crawls:

- :func:`stream_extract`: ``readStream`` over a pages directory →
  extraction stage → ``writeStream`` with ``Trigger.AvailableNow`` and
  checkpointing. Restart-safe: the checkpoint records consumed files,
  so a killed run resumes without reprocessing (the per-partition
  checkpoint requirement in BASELINE.json, streaming flavor).
- :func:`incremental_extract`: plain-batch watermark variant — process
  only rows with ``warc_ts`` above the stored high-watermark, the
  ``recordlastdownload`` analog (ref ferenda/decorators.py:68-80).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import EXTRACT_SCHEMA, extract_stage
from ..uris import RepoConfig

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def stream_extract(spark: SparkSession, pages_dir: str, out_dir: str,
                   checkpoint_dir: str, cfg: RepoConfig | None = None,
                   commondata: dict | None = None):
    """Run the extraction stage as an AvailableNow stream over a
    parquet pages directory; returns the finished StreamingQuery.

    Each micro-batch applies the same Arrow UDF as the batch path —
    streaming and batch share one operator implementation.
    """
    pages = (spark.readStream.schema(PAGES_SCHEMA)
             .option("maxFilesPerTrigger", 8)
             .parquet(pages_dir))
    extracted = extract_stage(pages, cfg, commondata)
    q = (extracted.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def read_watermark(spark: SparkSession, wm_path: str):
    if not os.path.exists(wm_path):
        return None
    rows = spark.read.parquet(wm_path).agg(F.max("watermark")).collect()
    return rows[0][0] if rows else None


def write_watermark(spark: SparkSession, pages: DataFrame, wm_path: str):
    (pages.agg(F.max("warc_ts").alias("watermark"))
     .write.mode("append").parquet(wm_path))


def incremental_extract(spark: SparkSession, pages: DataFrame,
                        wm_path: str, cfg: RepoConfig | None = None,
                        commondata: dict | None = None) -> DataFrame:
    """Extraction over only the rows newer than the stored watermark;
    call :func:`write_watermark` after a successful downstream commit."""
    wm = read_watermark(spark, wm_path)
    fresh = pages if wm is None else pages.where(F.col("warc_ts") > wm)
    return extract_stage(fresh, cfg, commondata)


WARC_BLOB_SCHEMA = "blob_id long, warc binary"


def stream_warc_ingest(spark: SparkSession, blobs_dir: str,
                       out_dir: str, checkpoint_dir: str):
    """Continuously-landing WARC segments → the records table: an
    AvailableNow stream over a parquet blob directory, each micro-batch
    running the SAME warc_records operator as the batch path (one
    shared implementation, the stream_extract pattern). Restart-safe:
    the checkpoint records consumed files, so a killed ingest resumes
    without reparsing — and because (blob_id, offset) is a stable
    record address, replays of an uncommitted batch overwrite
    byte-identical rows rather than drifting.

    This is the crawl-lake front door at 100 TB: segments land in
    object storage, the stream turns each into record rows with
    per-file (≙ per-partition) checkpoint lineage, downstream
    extraction/dedup read the records table incrementally.
    """
    from ..operators.warc import warc_records
    blobs = (spark.readStream.schema(WARC_BLOB_SCHEMA)
             .option("maxFilesPerTrigger", 8)
             .parquet(blobs_dir))
    q = (warc_records(blobs).writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
