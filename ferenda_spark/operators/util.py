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
