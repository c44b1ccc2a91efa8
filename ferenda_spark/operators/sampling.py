"""Deterministic stratified sampling — per-stratum quota selection for
corpus re-balancing (e.g. capping the dominant language before
training). A training-data pipeline staple the reference never needed
(its corpora are curated); expressed entirely in native window
expressions so the selection is reproducible bit-for-bit across
engines and runs.

Selection rule: within each stratum, rank rows by
``md5(id || ':' || seed)`` (a uniform, engine-agnostic pseudo-random
order — both Spark and DuckDB emit the same lowercase hex) and keep
``ceil(fraction · stratum_size)`` rows. No RNG state, no sampling
variance between runs: the same (ids, seed) always select the same
rows, which is what lineage-auditable pipelines want.

Scale shape: one shuffle on the stratum key for the two window
functions; rank + count compute in a single window pass. Strata are
usually few and large — if one stratum dominates (web text is mostly
English), the shuffle is skewed by construction, so at scale swap the
global rank for a two-phase top-k (per-partition rank → threshold
refine) or let AQE split the hot partition; the selection rule itself
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(df: DataFrame, strata_col: str, fraction: float,
                      id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """→ input rows plus (stratum_size, sample_rank), filtered to the
    per-stratum quota ceil(fraction · stratum_size)."""
    key = F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                            F.lit(str(seed))))
    w = Window.partitionBy(strata_col)
    ranked = df.select(
        "*",
        F.count(F.lit(1)).over(w).alias("stratum_size"),
        F.row_number().over(w.orderBy(key, F.col(id_col)))
        .alias("sample_rank"))
    quota = F.ceil(F.lit(float(fraction)) * F.col("stratum_size"))
    return ranked.where(F.col("sample_rank") <= quota)


def oracle_sql_stratified(table: str, strata_col: str, fraction: float,
                          columns: list[str], id_col: str = "doc_id",
                          seed: int = 0) -> str:
    cols = ", ".join(columns)
    return f"""
    SELECT {cols}, stratum_size, sample_rank FROM (
      SELECT {cols},
             count(*) OVER (PARTITION BY {strata_col}) AS stratum_size,
             row_number() OVER (
               PARTITION BY {strata_col}
               ORDER BY md5({id_col}::VARCHAR || ':' || '{seed}'),
                        {id_col}) AS sample_rank
      FROM {table})
    WHERE sample_rank <= ceil({fraction!r} * stratum_size)
    """


def resample_mixture(df: DataFrame, strata_col: str,
                     weights: dict[str, float], total: int,
                     id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Deterministic mixture resampling — select a corpus with target
    domain proportions (the static-mixture re-weighting step of
    training-data pipelines: Pile/Llama-style domain weights).

    Per stratum: quota = floor(weight · total), capped at the stratum
    size; rows chosen by the same md5 hash-rank rule as
    :func:`stratified_sample`, so the selection is bit-reproducible.
    Strata absent from ``weights`` are dropped (weight 0).

    Scale shape: the weights table is a handful of rows — broadcast
    hash join, no extra shuffle beyond the one stratum-key window pass.
    If realized sizes must match quotas exactly even when a stratum is
    undersized, renormalize weights upstream; this operator reports
    the shortfall instead (quota vs stratum_size are both emitted).
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())],
        f"{strata_col} string, weight double")
    key = F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                            F.lit(str(seed))))
    w = Window.partitionBy(strata_col)
    ranked = df.select(
        "*",
        F.count(F.lit(1)).over(w).alias("stratum_size"),
        F.row_number().over(w.orderBy(key, F.col(id_col)))
        .alias("sample_rank"))
    quota = F.least(F.floor(F.col("weight") * F.lit(int(total))),
                    F.col("stratum_size"))
    return (ranked.join(F.broadcast(wdf), strata_col)
            .where(F.col("sample_rank") <= quota)
            .withColumn("quota", quota)
            .drop("weight"))


def oracle_sql_mixture(table: str, strata_col: str,
                       weights: dict[str, float], total: int,
                       columns: list[str], id_col: str = "doc_id",
                       seed: int = 0) -> str:
    cols = ", ".join(columns)
    vals = ", ".join("('%s', %r)" % (k.replace("'", "''"), float(v))
                     for k, v in sorted(weights.items()))
    return f"""
    WITH w({strata_col}, weight) AS (VALUES {vals}),
    ranked AS (
      SELECT {cols},
             count(*) OVER (PARTITION BY {strata_col}) AS stratum_size,
             row_number() OVER (
               PARTITION BY {strata_col}
               ORDER BY md5({id_col}::VARCHAR || ':' || '{seed}'),
                        {id_col}) AS sample_rank
      FROM {table})
    SELECT {cols}, stratum_size, sample_rank,
           least(floor(w.weight * {int(total)})::bigint,
                 stratum_size) AS quota
    FROM ranked JOIN w USING ({strata_col})
    WHERE sample_rank <= least(floor(w.weight * {int(total)})::bigint,
                               stratum_size)
    """
