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
from .util import ensure_parallelism


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
    it = ensure_parallelism(items).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_v"))
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


def _hyperplanes(bits: int, n_tables: int, dim: int, seed: int):
    """Seeded hyperplane tensor shared by the distributed stage and the
    single-threaded oracle twin (annoracle.py)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    return rng.uniform(-1.0, 1.0, size=(n_tables, dim, bits))


def _fold_matmul(V, M):
    """V(n×d) · M(d×k) accumulated one dimension at a time.

    Equivalent to ``V @ M`` but the per-element summation order is a
    fixed left fold over d, independent of batch size and BLAS blocking
    — so a single-threaded rerun of the same kernel (the oracle twin)
    is bit-identical to the distributed Arrow stages regardless of how
    rows were batched. d is small (embedding dim), so the loop costs
    nothing next to the shuffle it feeds."""
    import numpy as np
    acc = np.zeros((V.shape[0], M.shape[1]))
    for d in range(V.shape[1]):
        acc += V[:, d:d + 1] * M[d]
    return acc


def _sig_table_stage(df: DataFrame, idc: str, vec_col: str, bits: int,
                     n_tables: int, dim: int, seed: int) -> DataFrame:
    """(id, tbl, sig) — one row per (vector, table); random-hyperplane
    signatures computed per Arrow batch with numpy (a native expression
    tree at bits×tables×dim terms would blow codegen limits; see
    dedup.py for the same tradeoff)."""
    import pandas as pd
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)
    schema = StructType([
        StructField("id", LongType()),
        StructField("tbl", IntegerType()),
        StructField("sig", LongType()),
    ])
    weights = [1 << (bits - 1 - b) for b in range(bits)]

    def run(batches):
        import numpy as np
        planes = _hyperplanes(bits, n_tables, dim, seed)
        w = np.array(weights, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[idc].to_numpy()
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            rows = []
            for t in range(n_tables):
                sigs = (_fold_matmul(V, planes[t]) >= 0).astype(np.int64) @ w
                rows.append(pd.DataFrame({"id": ids, "tbl": t,
                                          "sig": sigs}))
            yield pd.concat(rows, ignore_index=True)[schema.fieldNames()]

    return ensure_parallelism(df.select(F.col(idc).alias(idc), vec_col)) \
        .mapInPandas(run, schema)


def ann_lsh_topk(items: DataFrame, queries: DataFrame, k: int = 5,
                 bits: int = 6, n_tables: int = 8, dim: int = 64,
                 seed: int = 7, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: ``n_tables`` independent random-hyperplane
    hash tables (the standard recall lever — P(hit) = 1-(1-p)^L),
    1-bit multi-probe per table, exact cosine inside buckets.
    → (query_id, neighbor_id, rank).

    Scale notes: candidate volume per query ≈ L·(1+bits)·n/2^bits —
    tune bits up as n grows to keep buckets bounded; the bucket join
    key (table, sig) is uniform, so no skew."""
    it = _sig_table_stage(
        items.select(F.col(id_col).alias("neighbor_id"), vec_col),
        "neighbor_id", vec_col, bits, n_tables, dim, seed) \
        .withColumnRenamed("id", "neighbor_id")
    q0 = _sig_table_stage(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        "query_id", vec_col, bits, n_tables, dim, seed) \
        .withColumnRenamed("id", "query_id")
    # multi-probe: own bucket + every 1-bit flip, per table
    probes = F.array(*([F.col("sig")] +
                       [F.col("sig").bitwiseXOR(F.lit(1 << b))
                        for b in range(bits)]))
    qp = (q0.select("query_id", "tbl", F.explode(probes).alias("sig")))
    cand = (qp.join(it, ["tbl", "sig"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct())
    # vectors re-attached to candidates only; query side broadcasts
    sims = (cand
            .join(F.broadcast(queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("q_v"))), "query_id")
            .join(items.select(F.col(id_col).alias("neighbor_id"),
                               F.col(vec_col).alias("n_v")), "neighbor_id")
            .select("query_id", "neighbor_id",
                    cosine_sim(F.col("q_v"), F.col("n_v")).alias("sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               F.asc("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank")
            .orderBy("query_id", "rank"))


def _kmeans_centroids(V, k: int, iters: int = 10, seed: int = 11):
    """Seeded Lloyd's k-means over unit-normalized vectors (numpy, on
    the driver over a bounded sample — the IVF 'train' step)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    C = V[rng.choice(len(V), size=min(k, len(V)), replace=False)]
    for _ in range(iters):
        assign = (V @ C.T).argmax(axis=1)
        for j in range(len(C)):
            members = V[assign == j]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[j] = m / n
    return C


def _ivf_assign_stage(df: DataFrame, idc: str, vec_col: str, C,
                      nprobe: int = 1) -> DataFrame:
    """(id, cluster): nearest (or nprobe nearest) centroid per vector
    by cosine — one numpy matmul per Arrow batch."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType
    schema = StructType([StructField("id", LongType()),
                         StructField("cluster", IntegerType())])

    def run(batches):
        import numpy as np
        Cl = np.asarray(C)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[idc].to_numpy()
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                               1e-12)
            S = _fold_matmul(V, Cl.T)
            if nprobe == 1:
                yield pd.DataFrame({"id": ids, "cluster":
                                    S.argmax(axis=1).astype("int32")})
            else:
                top = np.argsort(-S, axis=1)[:, :nprobe]
                yield pd.DataFrame(
                    {"id": np.repeat(ids, top.shape[1]),
                     "cluster": top.ravel().astype("int32")})

    return ensure_parallelism(df.select(F.col(idc).alias(idc), vec_col)) \
        .mapInPandas(run, schema)


def train_sample_matrix(items: DataFrame, n: int,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id"):
    """IVF train sample as a numpy matrix: the ``n`` rows with the
    smallest (crc32(id), id) — a seeded hash-random sample, so it is
    unbiased w.r.t. partition/ingest order (a plain ``limit(n)`` takes
    the FIRST partitions and biases centroids on time-ordered data) and
    fully deterministic across engines (Spark's crc32 == zlib.crc32, so
    the single-threaded oracle twin reproduces the same matrix
    byte-for-byte)."""
    import numpy as np
    pdf = (items
           .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
           .withColumn("_h", F.crc32(F.col("id").cast("string")
                                     .cast("binary")))
           .orderBy("_h", "id").limit(n)
           .toPandas()
           .sort_values(["_h", "id"], kind="mergesort"))
    return np.stack(pdf["v"].to_numpy()).astype(np.float64)


def ann_ivf_topk(items: DataFrame, queries: DataFrame, k: int = 5,
                 n_clusters: int = 16, nprobe: int = 4,
                 train_sample: int = 20_000, seed: int = 11,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """IVF-bucketed approximate top-k: k-means centroids trained on a
    bounded driver sample, items assigned to their nearest cell,
    queries probe their ``nprobe`` nearest cells, exact cosine inside
    the probed cells. → (query_id, neighbor_id, rank).

    Scale notes: train is O(sample·k·d) on the driver (bounded; at
    10^12 rows you train on a sample regardless of engine); assignment
    is a shuffle-free Arrow stage; the probe join key is the cluster id
    — cell sizes are data-dependent (unlike the hyperplane-LSH variant,
    whose keys are uniform), so n_clusters must scale with n to bound
    cells, and AQE skew-join splitting covers residual imbalance.
    Recall lever: nprobe (P(neighbor in probed cells) grows with it).
    """
    V = train_sample_matrix(items, train_sample, vec_col, id_col)
    C = _kmeans_centroids(V, n_clusters, seed=seed)
    it = _ivf_assign_stage(
        items.select(F.col(id_col).alias("neighbor_id"), vec_col),
        "neighbor_id", vec_col, C, nprobe=1) \
        .withColumnRenamed("id", "neighbor_id")
    qp = _ivf_assign_stage(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        "query_id", vec_col, C, nprobe=nprobe) \
        .withColumnRenamed("id", "query_id")
    cand = (qp.join(it, "cluster")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct())
    sims = (cand
            .join(F.broadcast(queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("q_v"))), "query_id")
            .join(items.select(F.col(id_col).alias("neighbor_id"),
                               F.col(vec_col).alias("n_v")), "neighbor_id")
            .select("query_id", "neighbor_id",
                    cosine_sim(F.col("q_v"), F.col("n_v")).alias("sim")))
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


def kmeans_clusters(items: DataFrame, n_clusters: int = 16,
                    iters: int = 10, train_sample: int = 20_000,
                    seed: int = 11, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Corpus clustering: assign every vector to its nearest seeded
    k-means centroid → (vec_id, cluster, sim). The domain-balancing /
    data-mixing step of a training pipeline (cluster the corpus, then
    sample per cluster), and the same train/assign kernels the IVF ANN
    index uses — so the single-threaded oracle twin
    (:mod:`ferenda_spark.annoracle`) is bit-exact by the same
    fold-order argument.

    Scale notes: training is driver-side over a bounded hash-random
    sample (:func:`train_sample_matrix` — unbiased w.r.t. partition
    order); assignment is one shuffle-free Arrow stage with a
    broadcast centroid matrix (k·d doubles — KBs), so the whole
    operator is a single narrow pass over the corpus.
    """
    import pandas as pd
    from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                                   StructField, StructType)
    M = train_sample_matrix(items, train_sample, vec_col, id_col)
    C = _kmeans_centroids(M, n_clusters, iters=iters, seed=seed)
    schema = StructType([StructField("vec_id", LongType()),
                         StructField("cluster", IntegerType()),
                         StructField("sim", DoubleType())])

    def run(batches):
        import numpy as np
        Cl = np.asarray(C)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy().astype("int64")
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                               1e-12)
            S = _fold_matmul(V, Cl.T)
            best = S.argmax(axis=1)
            yield pd.DataFrame(
                {"vec_id": ids, "cluster": best.astype("int32"),
                 "sim": S[np.arange(len(best)), best]})

    return (ensure_parallelism(items.select(F.col(id_col), vec_col))
            .mapInPandas(run, schema)
            .orderBy("vec_id"))


# ------------------------------------------------------ product quant
#
# The memory-bound end of the ANN spectrum (Jégou/Douze/Schmid TPAMI
# 2011): corpus vectors compress to m_sub byte-ish codes (here
# m_sub·log2(k_codes) bits), queries score the WHOLE corpus through
# per-subspace lookup tables (ADC) — no candidate generation at all,
# which is the right trade when the corpus must stay resident (a
# reranking tier, a dedup sweep) and 64·8 bytes/vector won't fit.


def _pq_train(V, m_sub: int, k_codes: int, iters: int = 10,
              seed: int = 11):
    """Per-subspace Lloyd's over the (normalized) sample →
    (m_sub, k_codes, d_sub) codebook tensor. Assignment uses
    argmax(v·c − |c|²/2) — the Euclidean argmin rewritten so encode,
    ADC and the single-threaded twin share ONE fold-ordered kernel
    (ties → lowest code index, numpy argmax order)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    d_sub = V.shape[1] // m_sub
    books = []
    for j in range(m_sub):
        S = V[:, j * d_sub:(j + 1) * d_sub]
        C = S[rng.choice(len(S), size=min(k_codes, len(S)),
                         replace=False)].copy()
        for _ in range(iters):
            scores = _fold_matmul(S, C.T) - 0.5 * (C * C).sum(axis=1)
            assign = scores.argmax(axis=1)
            for c in range(len(C)):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C)
    return np.stack(books)


def _pq_encode_stage(df: DataFrame, idc: str, vec_col: str, books
                     ) -> DataFrame:
    """(id, codes int[]): nearest sub-centroid per subspace — one
    shuffle-free Arrow pass, codebooks broadcast by closure."""
    import pandas as pd
    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StructField, StructType)
    schema = StructType([StructField("id", LongType()),
                         StructField("codes",
                                     ArrayType(IntegerType()))])
    m_sub, _, d_sub = books.shape

    def run(batches):
        import numpy as np
        B = np.asarray(books)
        half = [0.5 * (B[j] * B[j]).sum(axis=1) for j in range(m_sub)]
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[idc].to_numpy().astype("int64")
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                               1e-12)
            codes = np.stack(
                [(_fold_matmul(V[:, j * d_sub:(j + 1) * d_sub],
                               B[j].T) - half[j]).argmax(axis=1)
                 for j in range(m_sub)], axis=1).astype("int32")
            yield pd.DataFrame({"id": ids, "codes": list(codes)})

    return ensure_parallelism(df.select(F.col(idc), vec_col)) \
        .mapInPandas(run, schema)


def ann_pq_topk(items: DataFrame, queries: DataFrame, k: int = 5,
                m_sub: int = 32, k_codes: int = 16,
                train_sample: int = 20_000, seed: int = 11,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """PQ/ADC approximate top-k → (query_id, neighbor_id, rank):
    corpus vectors quantized to ``m_sub`` sub-codes (defaults: 32
    subspaces of 2 dims × 16 codes = 128 bits/vector — recall 0.61@5
    measured on the near-random-within-cluster driver embeddings;
    real text embeddings with correlated dims compress much harder),
    each query builds
    one (m_sub × k_codes) inner-product lookup table and scores every
    corpus code by m_sub table gathers — asymmetric distance (query
    exact, corpus quantized), cosine via unit-normalizing both sides.

    Scale notes: the scored relation is the CODE table (m_sub ints
    per vector — 32× smaller than the vectors at d=64), scanned once
    for ALL queries; queries broadcast; per-batch per-query top-k
    pre-prunes before the one k·|queries|-row global ranking window,
    and batch boundaries cannot change the result (global top-k ≡
    top-k of per-batch top-k unions; total (−score, id) order).
    Recall levers: k_codes (cell resolution) and m_sub (independent
    subspaces); ``tests/test_similarity_stateful.py`` pins measured
    recall vs brute force."""
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)
    import numpy as np
    V = train_sample_matrix(items, train_sample, vec_col, id_col)
    books = _pq_train(V, m_sub, k_codes, seed=seed)
    codes = _pq_encode_stage(
        items.select(F.col(id_col).alias("neighbor_id"), vec_col),
        "neighbor_id", vec_col, books)
    qpdf = (queries.select(F.col(id_col).alias("query_id"), vec_col)
            .toPandas().sort_values("query_id"))
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qids = qpdf["query_id"].to_numpy().astype("int64")
    d_sub = books.shape[2]
    # per-query per-subspace LUT: q_sub · C_sub^T (fold-ordered)
    LUT = np.stack([_fold_matmul(Q[:, j * d_sub:(j + 1) * d_sub],
                                 books[j].T)
                    for j in range(books.shape[0])], axis=1)
    schema = StructType([StructField("query_id", LongType()),
                         StructField("neighbor_id", LongType()),
                         StructField("sim", DoubleType())])

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy().astype("int64")
            C = np.stack(pdf["codes"].to_numpy()).astype("int64")
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                acc = np.zeros(len(ids))
                for j in range(LUT.shape[1]):
                    acc += LUT[qi, j][C[:, j]]
                mask = ids != qids[qi]
                cand_ids, cand_s = ids[mask], acc[mask]
                take = min(k, len(cand_ids))
                if not take:
                    continue
                # the batch-local prune must use the SAME total order
                # as the global window ((−sim, id)): score-only
                # argpartition could drop the tie-break winner at the
                # k boundary and make output depend on batching
                part = np.lexsort((cand_ids, -cand_s))[:take]
                out_q.append(np.full(take, qids[qi]))
                out_n.append(cand_ids[part])
                out_s.append(cand_s[part])
            if out_q:
                yield pd.DataFrame({
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "sim": np.concatenate(out_s)})

    sims = codes.mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               F.asc("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank")
            .orderBy("query_id", "rank"))
