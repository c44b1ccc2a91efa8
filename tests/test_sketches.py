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


def test_cms_bounds_and_parity(spark, tmp_path):
    from ferenda_spark.operators.sketches import (cms_counters,
                                                  cms_estimate,
                                                  sql_cms_estimate)
    # skewed corpus: value v_k appears (k+1)*10 times, 200 values
    df = spark.range(200).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") + 1) * 10, F.explode(
            F.sequence(F.lit(1), (F.col("id") + 1) * 10)))
    rows = df.select("v")
    counters = cms_counters(rows, "v", d=4, w=2048)
    cand = spark.createDataFrame(
        [("v199",), ("v0",), ("nope",)], "value string")
    got = {r["value"]: r["est"] for r in
           cms_estimate(counters, cand, d=4, w=2048).collect()}
    # CMS never underestimates; with 2048 buckets vs 201k items the
    # overestimate is bounded in practice — assert the exact-count
    # floor and a loose ceiling
    assert got["v199"] >= 2000 and got["v199"] <= 2000 + 2500
    assert got["v0"] >= 10 and got["v0"] <= 10 + 2500
    assert got["nope"] <= 2500          # absent: pure collision mass
    # twin parity, bit for bit
    p = str(tmp_path / "t.parquet")
    rows.write.mode("overwrite").parquet(p)
    import duckdb
    oracle = dict(duckdb.sql(sql_cms_estimate(
        "(SELECT v FROM read_parquet('%s/*.parquet'))" % p, "v",
        "SELECT * FROM (VALUES ('v199'), ('v0'), ('nope')) x(value)"
    )).fetchall())
    assert oracle == got


def test_bloom_membership_and_parity(spark, tmp_path):
    from ferenda_spark.operators.sketches import (bloom_contains,
                                                  bloom_words,
                                                  sql_bloom_contains)
    # 500 inserted values; probe 20 present + 20 absent
    df = spark.range(500).select(
        F.concat(F.lit("u"), F.col("id")).alias("v"))
    words = bloom_words(df, "v", m_bits=1 << 16, k=4)
    cand = spark.createDataFrame(
        [("u%d" % i,) for i in range(0, 500, 25)] +
        [("miss-%d" % i,) for i in range(20)], "value string")
    got = {r["value"]: r["present"] for r in
           bloom_contains(words, cand, m_bits=1 << 16, k=4).collect()}
    # NO false negatives, ever — the Bloom contract
    for i in range(0, 500, 25):
        assert got["u%d" % i] is True
    # 2^16 bits / 500*4 set bits → fp rate ~ (2000/65536)^4 ≈ 1e-6:
    # all 20 absent probes must read absent
    for i in range(20):
        assert got["miss-%d" % i] is False
    # repartitioning changes nothing (bit_or is order-free)
    words2 = bloom_words(df.repartition(13), "v", m_bits=1 << 16, k=4)
    got2 = {r["value"]: r["present"] for r in
            bloom_contains(words2, cand, m_bits=1 << 16,
                           k=4).collect()}
    assert got2 == got
    # twin parity, lane for lane
    p = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(p)
    import duckdb
    oracle = dict(duckdb.sql(sql_bloom_contains(
        "(SELECT v FROM read_parquet('%s/*.parquet'))" % p, "v",
        "SELECT * FROM (VALUES %s) x(value)" % ", ".join(
            "('%s')" % c for c in got))).fetchall())
    assert oracle == got


def test_bloom_saturated_filter(spark):
    from ferenda_spark.operators.sketches import (bloom_contains,
                                                  bloom_words)
    # tiny filter (64 bits) + 1000 values → every lane saturates and
    # EVERY probe reads present: the documented false-positive mode,
    # never a crash or a false negative
    df = spark.range(1000).select(
        F.concat(F.lit("u"), F.col("id")).alias("v"))
    words = bloom_words(df, "v", m_bits=64, k=4)
    cand = spark.createDataFrame([("u1",), ("absent",)], "value string")
    got = {r["value"]: r["present"] for r in
           bloom_contains(words, cand, m_bits=64, k=4).collect()}
    assert got == {"u1": True, "absent": True}


def test_hll_union_merge_exactness(spark):
    from ferenda_spark.operators.sketches import (hll_estimate,
                                                  hll_registers,
                                                  hll_union)
    # the union of the register tables must BIT-equal the register
    # table of the concatenated corpus — the mergeable-sketch law
    a = spark.range(300).select(
        F.lit("k").alias("k"), F.concat(F.lit("u"), F.col("id")).alias("v"))
    b = spark.range(200, 500).select(
        F.lit("k").alias("k"), F.concat(F.lit("u"), F.col("id")).alias("v"))
    ra = hll_registers(a, ["k"], "v", p=6)
    rb = hll_registers(b, ["k"], "v", p=6)
    merged = hll_union(ra, rb, ["k"])
    whole = hll_registers(a.unionByName(b), ["k"], "v", p=6)
    sym = merged.exceptAll(whole).union(whole.exceptAll(merged))
    assert sym.count() == 0
    # inclusion–exclusion overlap estimate lands near truth (|A∩B| =
    # 100 of 500 total; p=6 standard error ~13% per estimate)
    ea = hll_estimate(ra, ["k"], p=6).collect()[0]["est_distinct"]
    eb = hll_estimate(rb, ["k"], p=6).collect()[0]["est_distinct"]
    eu = hll_estimate(merged, ["k"], p=6).collect()[0]["est_distinct"]
    inter = ea + eb - eu
    assert 20 <= inter <= 220
