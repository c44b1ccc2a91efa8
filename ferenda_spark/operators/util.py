"""Small shared operator utilities."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame


def iter_checkpoint(df: DataFrame, round_no: int,
                    disk_every: int = 3) -> DataFrame:
    """Lineage control for iterative DataFrame loops.

    Measured on this Spark build (pyspark 4.1.2): a chain of
    ``localCheckpoint(eager=True)`` calls stops truncating lineage
    after ~7 rounds and per-round cost turns geometric (BENCH.md round
    1). A *disk* checkpoint resets lineage for real, so iterative
    operators alternate: localCheckpoint most rounds (cheap), disk
    checkpoint every ``disk_every``-th round (bounded lineage forever).
    In production the disk checkpoint is an HDFS/S3 write — the same
    round-trip Pregel-style systems do.
    """
    if round_no % disk_every == disk_every - 1:
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            sc.setCheckpointDir(
                os.path.join(tempfile.gettempdir(),
                             "ferenda_spark_ckpt_%d" % os.getpid()))
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def salted_agg(df: DataFrame, key_cols: list[str], aggs: dict,
               salt: int = 16) -> DataFrame:
    """Two-stage aggregation with an explicit salt on the group key —
    the classic hot-key defuse when one key (e.g. the corpus's hot
    host) dominates: stage 1 partially aggregates (key, salt) so the
    hot key's rows spread over ``salt`` reducers, stage 2 combines the
    partials per key.

    ``aggs``: {out_col: (in_col, "sum"|"count"|"min"|"max")}. Spark's
    own map-side partial aggregation covers this for built-in aggs —
    salted_agg exists for the cases it cannot: high-cardinality
    intermediate state (e.g. collect-style aggregation downstream) or
    explicit control when AQE skew handling is unavailable. Counts and
    sums compose exactly (sum of partials); min/max likewise.
    """
    from pyspark.sql import functions as F
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() +
                                           F.monotonically_increasing_id(),
                                           F.lit(salt)))
    stage1_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            stage1_aggs.append(F.count(F.lit(1)).alias("_p_" + out))
        else:
            stage1_aggs.append(getattr(F, fn)(col).alias("_p_" + out))
    partial = salted.groupBy(*key_cols, "_salt").agg(*stage1_aggs)
    stage2_aggs = []
    for out, (_col, fn) in aggs.items():
        combine = "sum" if fn in ("count", "sum") else fn
        stage2_aggs.append(getattr(F, combine)("_p_" + out).alias(out))
    return partial.groupBy(*key_cols).agg(*stage2_aggs)


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the session's
    default parallelism.

    Compute-super-linear operators (Arrow UDF stages, cross joins,
    signature stages) inherit the scan's partitioning; a small parquet
    table arrives as one file → one task → zero parallelism no matter
    how many cores exist. The round-robin shuffle of a few thousand
    rows is noise next to the per-row compute it unlocks. At real scale
    the scan already has ≥ cores partitions and this is a no-op.
    """
    if df.isStreaming:
        # partition count is per-micro-batch for streams (and .rdd is
        # illegal on them); maxFilesPerTrigger governs parallelism there
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
