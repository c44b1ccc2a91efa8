"""SparkSession builder with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "ferenda_spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") \
        or "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (SparkSession.builder
               .appName(app)
               .master(master)
               # AQE: runtime coalesce, skew-join splitting — the engine's
               # answer to hot-host / hub-entity skew at scale
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.adaptive.skewJoin.enabled", "true")
               .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
               # Arrow batches feed the extraction UDF; bound batch size so
               # large html blobs don't blow executor memory
               .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
               # this build ships arrow.pyspark.enabled=false: toPandas /
               # createDataFrame(pandas) pickle ROW-BY-ROW without it
               # (measured 6.5 s vs 0.5 s for a 375k-row mapping frame —
               # the driver-side CC hand-off in canonicalize runs both)
               .config("spark.sql.execution.arrow.pyspark.enabled", "true")
               .config("spark.sql.session.timeZone", "UTC")
               .config("spark.driver.memory",
                       os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
               .config("spark.ui.enabled", "false"))
    if shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
