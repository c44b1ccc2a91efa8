"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
