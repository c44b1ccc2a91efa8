"""Cost-model evidence for incremental_components (incremental entity
resolution): at two sameAs-graph sizes, compare

  full_s   — distributed alternating-star CC over the whole edge set
             (what a no-incremental pipeline re-runs per crawl batch;
             the driver union-find shortcut is disabled so the full
             leg measures the distributed algorithm the 100 TB case
             runs), timed to action;
  delta_s  — incremental_components over a FIXED 10k-edge crawl batch
             against the MATERIALIZED assignment table (written
             untimed — in production it already sits in the lake),
             timed to action.

The claim under test: the incremental path's only corpus-sized term is
a shuffle-free scan of the assignments table (probe side of two
broadcast joins), so it grows far slower than corpus size, while the
full CC re-run grows with corpus × rounds. Output: one JSON line
{"metric": "cc_delta_cost", ...} consumed by BENCH.md.

Usage: python scripts/bench_cc_delta.py [N_NODES_LOW] [N_NODES_HIGH]
(defaults 1_000_000 / 4_000_000 nodes; ~0.95 edges per node).
"""
import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ferenda_spark.graph.components import (  # noqa: E402
    connected_components, incremental_components)


def synth_edges(spark, n_nodes):
    """Star components of 20 nodes each plus a chain edge every 200
    nodes linking ten stars into one 200-node component — bounded
    components with internal structure, like per-document alias stars
    chained by shared resources."""
    base = spark.range(n_nodes)
    node = F.format_string("http://e.org/r/%09d", F.col("id"))
    leader = F.format_string("http://e.org/r/%09d",
                             F.col("id") - F.col("id") % 20)
    star = (base.where(F.col("id") % 20 != 0)
            .select(node.alias("src"), leader.alias("dst")))
    chain = (base.where((F.col("id") % 20 == 0) &
                        (F.col("id") % 200 != 0))
             .select(node.alias("src"),
                     F.format_string(
                         "http://e.org/r/%09d",
                         F.col("id") - F.col("id") % 200).alias("dst")))
    return star.union(chain)


def synth_batch(spark, n_nodes, batch_edges):
    """A crawl batch: half the edges attach NEW nodes to existing
    component leaders (spread by a prime stride), half bridge pairs of
    existing components — merges, relabels and new nodes all occur."""
    b = spark.range(batch_edges)
    new_node = F.format_string("http://e.org/new/%09d", F.col("id"))
    target = F.format_string(
        "http://e.org/r/%09d",
        (F.col("id") * 7919) % F.lit(n_nodes) -
        ((F.col("id") * 7919) % F.lit(n_nodes)) % 20)
    other = F.format_string(
        "http://e.org/r/%09d",
        (F.col("id") * 104729) % F.lit(n_nodes) -
        ((F.col("id") * 104729) % F.lit(n_nodes)) % 20)
    attach = (b.where(F.col("id") % 2 == 0)
              .select(new_node.alias("src"), target.alias("dst")))
    bridge = (b.where(F.col("id") % 2 == 1)
              .select(target.alias("src"), other.alias("dst"))
              .where(F.col("src") != F.col("dst")))
    return attach.union(bridge)


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    batch_edges = 10_000
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.adaptive.enabled", "true")
             .appName("bench_cc_delta").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="cc_delta_bench_")
    result = {"metric": "cc_delta_cost", "unit": "sec",
              "batch_edges": batch_edges, "levels": []}
    try:
        # untimed warmup (JIT + shuffle machinery)
        connected_components(synth_edges(spark, 50_000),
                             driver_threshold=0).count()
        for n in (n_low, n_high):
            edir = "%s/e_%d" % (tmp, n)
            adir = "%s/a_%d" % (tmp, n)
            synth_edges(spark, n).write.mode("overwrite").parquet(edir)
            edges = spark.read.parquet(edir)

            # min of two repeats per leg (shared-box variance; the min
            # is the uncontended cost — same protocol as the RDFS leg)
            full_s, comp_rows = None, 0
            for _ in range(2):
                t0 = time.monotonic()
                comp_rows = connected_components(
                    edges, driver_threshold=0).count()
                full_s = min(full_s or 9e9, time.monotonic() - t0)

            (connected_components(edges, driver_threshold=0)
             .write.mode("overwrite").parquet(adir))
            assignments = spark.read.parquet(adir)
            batch = synth_batch(spark, n, batch_edges)

            delta_s, out_rows = None, 0
            for _ in range(2):
                t0 = time.monotonic()
                out_rows = incremental_components(assignments,
                                                  batch).count()
                delta_s = min(delta_s or 9e9, time.monotonic() - t0)
            result["levels"].append({
                "nodes": n, "assignment_rows": comp_rows,
                "full_s": round(full_s, 2),
                "updated_rows": out_rows, "delta_s": round(delta_s, 2),
                "speedup_vs_full": round(full_s / delta_s, 1)})
        lo, hi = result["levels"]
        result["corpus_growth"] = round(hi["nodes"] / lo["nodes"], 2)
        result["full_growth"] = round(hi["full_s"] / lo["full_s"], 2)
        result["delta_growth"] = round(hi["delta_s"] / lo["delta_s"], 2)
        print(json.dumps(result))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
