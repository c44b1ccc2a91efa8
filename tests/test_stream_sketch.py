"""Streaming HLL census: cross-batch register state must be
bit-identical to the batch sketch over the same rows, and the shared
estimate read-out must agree with hll_distinct."""

import time

import pytest
from pyspark.sql import functions as F


def test_stream_hll_census_equals_batch(spark, tmp_path):
    from ferenda_spark.operators.sketches import (hll_distinct,
                                                  hll_estimate,
                                                  hll_registers)
    from ferenda_spark.streaming.sketchstate import stream_hll_census

    src = tmp_path / "src"
    src.mkdir()
    schema = "host string, url string"

    def batch_rows(lo, hi):
        return [("h%d" % (i % 3), "u%d" % (i % 170)) for i in range(lo, hi)]

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / name))
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    write_batch("b1", batch_rows(0, 200))
    write_batch("b2", batch_rows(150, 420))   # overlap re-lands keys

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    out = stream_hll_census(stream, "host", "url", p=6)
    q = (out.writeStream.format("memory").queryName("hll_census")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    # update mode re-emits each key's merged registers per batch; the
    # final state is the elementwise max across emissions (max IS the
    # merge, so folding the emissions reproduces the last one)
    got = (spark.sql("SELECT * FROM hll_census")
           .groupBy("host", "_idx").agg(F.max("_r").alias("_r")))

    whole = spark.createDataFrame(batch_rows(0, 200) +
                                  batch_rows(150, 420), schema)
    want = hll_registers(whole, ["host"], "url", p=6)
    sym = (got.exceptAll(want)).union(want.exceptAll(got))
    assert sym.count() == 0     # register-for-register identical

    est_stream = {r["host"]: (r["est_distinct"], r["n_registers"])
                  for r in hll_estimate(got, ["host"], p=6).collect()}
    est_batch = {r["host"]: (r["est_distinct"], r["n_registers"])
                 for r in hll_distinct(whole, ["host"], "url",
                                       p=6).collect()}
    assert est_stream == est_batch


def test_stream_cms_and_bloom_equal_batch(spark, tmp_path):
    """cms_counters and bloom_words are pure groupBy aggregates over
    monotone merges (+ and |), so the BATCH operators run unchanged
    on a readStream input in update mode — the streaming state is the
    counter/lane table itself. Final state (max over update-mode
    emissions — both values are monotone nondecreasing) must equal
    the batch sketch over the same rows."""
    import time
    from ferenda_spark.operators.sketches import bloom_words, cms_counters

    src = tmp_path / "src"
    src.mkdir()
    schema = "v string"

    def rows(lo, hi):
        return [("w%d" % (i % 97),) for i in range(lo, hi)]

    def write_batch(name, r):
        spark.createDataFrame(r, schema).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / name))
        time.sleep(1.1)

    write_batch("b1", rows(0, 150))
    write_batch("b2", rows(100, 300))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))

    for name, op, keys in (
            ("cms_stream", lambda d: cms_counters(d, "v", d=2, w=64),
             ["row_i", "bucket"]),
            ("bloom_stream", lambda d: bloom_words(d, "v",
                                                   m_bits=256, k=2),
             ["word_idx"])):
        q = (op(stream).writeStream.format("memory").queryName(name)
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / ("c" + name)))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        val = [c for c in spark.table(name).columns if c not in keys][0]
        got = (spark.table(name).groupBy(*keys)
               .agg(F.max(val).alias(val)))
        whole = spark.createDataFrame(rows(0, 150) + rows(100, 300),
                                      schema)
        want = op(whole)
        sym = got.exceptAll(want).union(want.exceptAll(got))
        assert sym.count() == 0, name
