"""Distributed WARC ingestion: raw crawl-segment blobs → records.

The step upstream of the pages table (BASELINE input_hint: ``(url,
warc_ts, html, …)``): Common Crawl's unit of storage is the WARC
segment, so a 100 TB ingest is a table of segment blobs that must
become typed page rows. Kernels in :mod:`ferenda_spark.warcrec`.

Scale notes: ONE Arrow-batched ``mapInPandas`` stage — per-blob work,
no shuffle; the fan-out (one blob row → many record rows) happens
inside the Arrow batch, so Spark sees a narrow streaming stage it can
pipeline into the downstream extraction. Blob sizing is the input
table's concern (CC segments are ~1 GB; ``maxPartitionBytes`` splits
the *file* scan, and one blob column value is one record group —
at real scale the blobs are chunked per record-batch by the lake
writer, which is exactly the shape this operator consumes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graphops import host_col
from .util import ensure_parallelism

_SCHEMA = ("blob_id long, offset long, rec_type string, url string, "
           "warc_date string, warc_content_type string, "
           "http_status int, mime string, payload binary")


def warc_records(blobs: DataFrame, blob_col: str = "warc",
                 id_col: str = "blob_id") -> DataFrame:
    """(blob_id, warc bytes) → one row per WARC record: (blob_id,
    offset, rec_type, url, warc_date, warc_content_type, http_status,
    mime, payload). ``(blob_id, offset)`` is the record's stable
    address — the CDX-index coordinate for resumable re-reads.
    Malformed records are skipped (kernel resyncs at the next magic).
    """
    from ..warcrec import parse_warc

    def run(batches):
        import pandas as pd
        cols = ("blob_id", "offset", "rec_type", "url", "warc_date",
                "warc_content_type", "http_status", "mime", "payload")
        for pdf in batches:
            rows = {c: [] for c in cols}
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                for rec in parse_warc(bytes(blob)):
                    rows["blob_id"].append(bid)
                    for k, v in rec.items():
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return (ensure_parallelism(blobs.select(id_col, blob_col))
            .mapInPandas(run, _SCHEMA))


# scheme://authority prefix (shared with crawl._PATH_STRIP); what
# remains is the path+query the SURT key carries after the ')'
_PATH_STRIP = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*"


def surt_col(url) -> F.Column:
    """URL column → SURT key (Sort-friendly URI Reordering Transform,
    the Common-Crawl/pywb CDX index key): reversed comma-joined host
    labels + ')' + lower-cased path-and-query, scheme dropped, host
    normalized by the engine's shared host rule (lowercase, ``www.``
    strip, port-free). 'https://WWW.Site.Example/A?b=1' →
    'example,site)/a?b=1'. Reversing the host makes one domain's pages
    one contiguous key range — the property that lets a range-sorted
    index answer both exact-URL and whole-domain lookups with one
    binary search."""
    rest = F.lower(F.regexp_replace(url, _PATH_STRIP, ""))
    return F.concat(
        F.array_join(F.reverse(F.split(host_col(url), r"\.")), ","),
        F.lit(")"),
        F.when(rest == "", F.lit("/")).otherwise(rest))


def cdx_index(records: DataFrame) -> DataFrame:
    """warc_records output → the CDX(J)-shaped lookup index:
    (surt, warc_date, url, mime, http_status, blob_id, offset),
    globally ordered by (surt, warc_date) — the Common-Crawl index
    artifact that makes a 100 TB WARC lake random-accessible.

    Scale notes: one narrow codegen projection + ONE range exchange
    (the global sort) — Spark samples the surt distribution and
    range-partitions, so each output partition is a contiguous,
    internally-sorted key range exactly like a CDX shard file; domain
    skew lands on the sampler, which AQE-era range partitioning
    handles by splitting dense ranges.
    """
    return (records
            .where(F.col("url").isNotNull())
            .select(surt_col(F.col("url")).alias("surt"),
                    "warc_date", "url", "mime", "http_status",
                    "blob_id", "offset")
            .orderBy("surt", "warc_date"))


def latest_captures(index: DataFrame, k: int = 1) -> DataFrame:
    """CDX rows → the newest ``k`` captures per SURT key (the
     'latest capture' view CC-index serves; also the retention policy
    a compaction pass applies to a growing WARC lake): one window
    rank per surt, newest warc_date first, ties broken by (blob_id,
    offset) so re-runs pick the same rows.

    Scale notes: one hash exchange on surt + WindowGroupLimit — Spark
    pushes the rank filter into the window operator, so only k rows
    per key survive the sort buffer; no global sort, no driver state.
    """
    from pyspark.sql import Window
    w = (Window.partitionBy("surt")
         .orderBy(F.desc("warc_date"), F.desc("blob_id"),
                  F.desc("offset")))
    return (index.withColumn("capture_rank", F.row_number().over(w))
            .where(F.col("capture_rank") <= k))


def revisit_stats(records: DataFrame) -> DataFrame:
    """Response records → per-URL capture history stats: (url,
    n_captures, n_revisits, n_versions) where a *revisit* is a capture
    whose payload digest equals the previous capture's (the WARC
    'revisit' record a deduplicating crawler writes instead of storing
    the body again — ISO 28500 §6.7.2 motivation) and n_versions
    counts distinct digests. The change-rate signal crawl schedulers
    feed back into refresh frequency.

    Scale notes: digest = md5(payload) computed in the scan projection
    (codegen, the text never shuffles — only the 32-hex digest does);
    ONE hash exchange on url for the lag window, then the rollup
    reuses the same partitioning (no second exchange).
    """
    from pyspark.sql import Window
    w = (Window.partitionBy("url")
         .orderBy("warc_date", "blob_id", "offset"))
    d = (records
         .where(F.col("rec_type") == "response")
         .select("url", "warc_date", "blob_id", "offset",
                 F.md5(F.col("payload")).alias("digest")))
    flagged = d.withColumn(
        "is_revisit",
        F.col("digest") == F.lag("digest").over(w))
    return (flagged.groupBy("url")
            .agg(F.count(F.lit(1)).alias("n_captures"),
                 F.sum(F.when(F.col("is_revisit"), 1).otherwise(0))
                 .alias("n_revisits"),
                 F.countDistinct("digest").alias("n_versions")))
