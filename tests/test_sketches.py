"""Deterministic HyperLogLog: accuracy, branch coverage, parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.sketches import hll_distinct, sql_hll_distinct


def test_hll_accuracy_and_determinism(spark):
    # 8000 distinct values, p=12 → raw-estimate branch; classic HLL
    # standard error is 1.04/sqrt(4096) ≈ 1.6% — assert within 5%
    df = spark.range(8000).select(
        F.lit("k").alias("key"),
        F.concat(F.lit("value-"), F.col("id")).alias("v"))
    row = hll_distinct(df, ["key"], "v", p=12).collect()[0]
    assert abs(row["est_distinct"] - 8000) / 8000 < 0.05
    # duplicates change nothing: the sketch sees sets, not bags
    dup = df.unionByName(df)
    row2 = hll_distinct(dup, ["key"], "v", p=12).collect()[0]
    assert row2["est_distinct"] == row["est_distinct"]
    # repartitioning changes nothing (integer register sums)
    row3 = hll_distinct(df.repartition(17), ["key"], "v",
                        p=12).collect()[0]
    assert row3["est_distinct"] == row["est_distinct"]


def test_hll_small_range_branch(spark):
    # 20 distinct at p=12: linear counting fires and is near-exact
    df = spark.range(20).select(
        F.lit("k").alias("key"),
        F.col("id").cast("string").alias("v"))
    row = hll_distinct(df, ["key"], "v", p=12).collect()[0]
    assert abs(row["est_distinct"] - 20) <= 1
    assert row["n_registers"] <= 20


def test_hll_duckdb_parity(spark, tmp_path):
    # the sketch itself must agree bit-for-bit with the SQL twin on
    # BOTH branches (p=6: 300 distinct → raw; 10 distinct → linear)
    df = spark.range(310).select(
        F.when(F.col("id") < 300, F.lit("big")).otherwise(F.lit("small"))
         .alias("key"),
        F.when(F.col("id") < 300, F.concat(F.lit("x"), F.col("id")))
         .otherwise(F.concat(F.lit("y"), F.col("id") % 10)).alias("v"))
    p = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(p)
    got = {(r["key"]): (r["est_distinct"], r["n_registers"])
           for r in hll_distinct(df, ["key"], "v", p=6).collect()}
    oracle = {r[0]: (r[1], r[2]) for r in duckdb.sql(
        sql_hll_distinct("read_parquet('%s/*.parquet')" % p,
                         ["key"], "v", p=6)).fetchall()}
    assert got == oracle
    # and the two keys exercised different branches
    assert got["big"][1] > 40      # most of 64 registers hit
    assert got["small"][1] <= 10
