"""Event-time windowed aggregation and gap-based sessionization.

The reference has no event-time semantics (SURVEY.md §2.8: batch with
file-mtime incrementality), but a crawl/clickstream lake at 10^12 rows
needs them: tumbling-window rollups for the API-statistics read path
(the ``/api/`` statistics analog, ref ferenda/wsgiapp.py:352-506, keyed
by time instead of facet) and session reconstruction for per-visitor
analytics.

Scale shape:

- :func:`windowed_event_counts` is one shuffle on the (coarse) window
  bucket + group key with map-side partial aggregation — the canonical
  Spark rollup; AQE coalesces the post-shuffle partitions. No UDFs.
- :func:`sessionize` is one shuffle on ``user_id`` (the session
  partition key); both window functions (``lag`` gap flag, running
  ``sum`` session counter) and the final per-session aggregate reuse
  that single hash partitioning, so the whole thing is scan → one
  Exchange → two window passes + partial agg. At 100 TB the user_id
  key space is uniform (no hub skew by construction of visitor IDs);
  a hot-key visitor would be handled by the salted_agg primitive
  (operators/util.py).
- :func:`stream_windowed_counts` is the Structured-Streaming form of
  the same rollup: ``readStream`` + ``withWatermark`` + ``window``
  aggregation under ``Trigger.AvailableNow``.  The watermark bounds
  state (windows older than max_event_time − delay are finalized and
  evicted) and drops too-late rows — the knob a continuously-landing
  crawl needs so state does not grow with corpus age.

Batch and streaming share the same windowing expression, so the batch
query *is* the oracle for the streaming one (tests/test_event_windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def windowed_event_counts(events: DataFrame,
                          window: str = "1 day") -> DataFrame:
    """Tumbling event-time window rollup per event_type.

    Output: (window_start string, event_type, n_events, sum_value) —
    window_start is formatted to a timezone-free string so the result
    is stable across session-timezone settings.
    """
    w = F.window(F.col("ts"), window)
    return (events
            .groupBy(w.alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                     .alias("window_start"),
                    "event_type", "n_events", "sum_value")
            .orderBy("window_start", "event_type"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based session reconstruction per user.

    A new session starts when the gap to the previous event of the same
    user is >= ``gap_minutes`` (matching Spark's ``session_window``
    merge rule: an event within the gap extends the session).  Output
    one row per session: (user_id, session_seq, session_start string,
    n_events, duration_us).

    Deterministic formulation (lag gap flag → running sum) rather than
    ``F.session_window`` so the DuckDB oracle can express the identical
    computation; the physical plan is the same single Exchange on
    user_id either way.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Exact integer microseconds for the gap test — second-granularity
    # casts floor away sub-second gaps and mis-flag boundary events.
    # TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) has no direct long
    # cast; go via TIMESTAMP (session tz is UTC, session.py) first.
    gap_us = gap_minutes * 60 * 1_000_000
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = events.withColumn(
        "new_session",
        F.when(epoch - F.lag(epoch).over(by_user) >= gap_us,
               1).otherwise(0))
    with_id = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)))
    return (with_id
            .groupBy("user_id", "session_seq")
            .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"),
                 F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("session_seq").cast("long").alias("session_seq"),
                    F.date_format("t0", "yyyy-MM-dd HH:mm:ss")
                     .alias("session_start"),
                    "n_events",
                    (F.unix_micros(F.col("t1").cast("timestamp"))
                     - F.unix_micros(F.col("t0").cast("timestamp")))
                     .alias("duration_us"))
            .orderBy("user_id", "session_seq"))


def stream_windowed_counts(spark: SparkSession, events_dir: str,
                           checkpoint_dir: str, window: str = "1 day",
                           watermark_delay: str = "1 day",
                           table: str = "stream_windows",
                           append_path: str | None = None) -> DataFrame:
    """Run the tumbling rollup as an AvailableNow stream with a
    watermark; returns the (batch-readable) result DataFrame.

    Two sink modes:

    - default (``append_path=None``): **complete** mode into a memory
      sink — the full current rollup, equal to the batch query on the
      same input (the plumbing-parity path).
    - ``append_path`` set: **append** mode into parquet — only windows
      the watermark has finalized are emitted, and rows arriving more
      than ``watermark_delay`` behind the observed max event time are
      DROPPED from their window. ``maxFilesPerTrigger=1`` gives one
      micro-batch per input file so the watermark actually advances
      between batches (demonstrated in tests/test_event_windows.py).
    """
    events = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(events_dir))
    agg = (events
           .withWatermark("ts", watermark_delay)
           .groupBy(F.window(F.col("ts"), window).alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"))
           .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                   "event_type", "n_events", "sum_value"))
    if append_path is not None:
        q = (agg.writeStream
             .format("parquet")
             .option("path", append_path)
             .outputMode("append")
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return spark.read.parquet(append_path)
    q = (agg.writeStream
         .format("memory")
         .queryName(table)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table)
