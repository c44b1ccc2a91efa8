"""Similarity search over embedding columns: brute-force cosine top-k
(the correctness baseline) and LSH-bucketed approximate NN (the scale
path).

Scale design:
- brute-force is O(Q·N) — correct and shuffle-light (broadcast the
  query side when small), but not viable at 10^12 rows.
- ``ann_lsh_topk`` buckets both sides with random-hyperplane signatures
  (seeded, computed with native expressions from xxhash64-derived
  pseudo-random planes), probes only matching buckets (+ optional
  multi-probe on 1-bit flips), then does exact cosine inside buckets.
  The join key is the signature → uniform, no skew; recall is tunable
  via bits/tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_sim


def brute_force_topk(items: DataFrame, queries: DataFrame, k: int = 5,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.
    → (query_id, neighbor_id, rank), rank 1..k by (sim desc, id asc);
    self-matches excluded. The float sim itself is intentionally NOT in
    the output: ranks are stable across engines, last-ulp floats need
    not be."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_v"))
    it = items.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("n_v"))
    sims = (F.broadcast(q).crossJoin(it)
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id",
                    cosine_sim(F.col("q_v"), F.col("n_v")).alias("sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               F.asc("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank")
            .orderBy("query_id", "rank"))


def _hyperplane_sig(vec_col, bits: int, dim: int, seed: int):
    """Signature bit b = sign(dot(v, plane_b)); plane components are
    deterministic pseudo-randoms in [-1,1) derived from xxhash64(seed,
    b, i) — computable identically on any executor, nothing shipped."""
    def plane_component(b, i):
        h = F.xxhash64(F.lit(seed), b, i)
        return (F.pmod(h, F.lit(2_000_000)).cast("double") /
                F.lit(1_000_000.0)) - F.lit(1.0)

    def bit(b):
        dot = F.aggregate(
            F.sequence(F.lit(0), F.lit(dim - 1)), F.lit(0.0),
            lambda acc, i: acc + F.element_at(vec_col, (i + 1).cast("int"))
                                  .cast("double") * plane_component(F.lit(b), i))
        return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))

    sig = F.lit(0)
    for b in range(bits):
        sig = sig * 2 + bit(b)
    return sig


def ann_lsh_topk(items: DataFrame, queries: DataFrame, k: int = 5,
                 bits: int = 8, dim: int = 64, seed: int = 7,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join + exact cosine
    inside buckets, multi-probing all 1-bit-flip neighbor buckets for
    recall. → (query_id, neighbor_id, rank)."""
    it = (items.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("n_v"))
          .withColumn("sig", _hyperplane_sig(F.col("n_v"), bits, dim, seed)))
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("q_v"))
         .withColumn("sig0", _hyperplane_sig(F.col("q_v"), bits, dim, seed)))
    # multi-probe: own bucket + every 1-bit flip
    probes = F.array(*([F.col("sig0")] +
                       [F.col("sig0").bitwiseXOR(F.lit(1 << b))
                        for b in range(bits)]))
    qp = q.select("query_id", "q_v", F.explode(probes).alias("sig"))
    sims = (qp.join(it, "sig")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id",
                    cosine_sim(F.col("q_v"), F.col("n_v")).alias("sim"))
            .dropDuplicates(["query_id", "neighbor_id"]))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               F.asc("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank")
            .orderBy("query_id", "rank"))


def oracle_sql_brute_force_topk(table: str = "embeddings", k: int = 5,
                                n_queries: int | None = None) -> str:
    from .dedup import sql_cosine
    cos = sql_cosine("a.embedding", "b.embedding")
    qfilter = f"WHERE a.vec_id < {n_queries}" if n_queries else ""
    return f"""
    WITH sims AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {cos} AS sim
      FROM {table} a JOIN {table} b ON a.vec_id <> b.vec_id
      {qfilter}
    ), ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
    ORDER BY query_id, rank
    """
