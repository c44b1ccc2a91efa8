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

from .textops import words_col, _sql_words


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


def _hashed_grams(df: DataFrame, text_col: str,
                  n_buckets: int, id_cols: list[str]) -> DataFrame:
    """→ one row per (id_cols…, bucket) occurrence of a hashed
    unigram/bigram feature. Bucket = first 8 md5 hex chars of the gram
    string, mod ``n_buckets`` (words never contain whitespace, so the
    single-space bigram separator is collision-free)."""
    base = df.select(*id_cols, words_col(F.col(text_col)).alias("ws"))
    uni = base.select(*id_cols, F.explode("ws").alias("g"))
    pairs = F.when(
        F.size("ws") >= 2,
        F.zip_with(F.slice("ws", 1, F.size("ws") - 1),
                   F.slice(F.col("ws"), F.lit(2), F.size("ws") - 1),
                   lambda a, b: F.concat_ws(" ", a, b)))
    bi = base.select(*id_cols, F.explode(pairs).alias("g"))
    return uni.unionByName(bi).select(
        *id_cols,
        (F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("bigint")
         % n_buckets).alias("bucket"))


def dsir_resample(corpus: DataFrame, target: DataFrame, k: int,
                  n_buckets: int = 4096, id_col: str = "doc_id",
                  text_col: str = "text", seed: int = 0) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): select
    ``k`` documents from ``corpus`` distributed like ``target``.

    Features are hashed word uni+bigrams in an ``n_buckets``-bucket
    space; bag-of-buckets models with +1 smoothing are fit on the
    target corpus (p) and the raw corpus itself (q); each document
    scores log w = Σ_f c(f)·[ln p̂(f) − ln q̂(f)] over its feature
    multiset. Sampling without replacement ∝ w is the Gumbel top-k
    trick with a deterministic per-document Gumbel
    g = −ln(−ln(u)), u = (md5(id:seed)[:13 hex] + 0.5) / 2⁵²,
    so the same (ids, seed) always select the same k rows — both
    engines emit bit-identical md5 hex and the key is rounded to 6 dp
    before ranking (doc_id breaks residual ties).

    → (doc_id, n_feats, log_w, skey, rank) for the k selected rows,
    rank 1 = largest key.

    Scale shape: both models are integer count-aggregations that
    partial-aggregate map-side into at most ``n_buckets`` rows, then
    broadcast onto the per-document feature counts (the only corpus-
    sized shuffle is the (doc, bucket) groupBy, keys uniform by
    construction of the hash). The totals enter the plan as broadcast
    one-row aggregates, not driver collects. The final top-k is
    orderBy().limit(k) — Spark plans TakeOrderedAndProject (per-
    partition heaps, no full sort); the rank window runs over the k
    survivors only, so keep k ≪ corpus (it is the sample size).
    """
    tgt_cnt = (_hashed_grams(target, text_col, n_buckets, [])
               .groupBy("bucket").agg(F.count(F.lit(1)).alias("tc")))
    raw_cnt = (_hashed_grams(corpus, text_col, n_buckets, [])
               .groupBy("bucket").agg(F.count(F.lit(1)).alias("rc")))
    tot = (tgt_cnt.agg(F.sum("tc").alias("tt"))
           .crossJoin(raw_cnt.agg(F.sum("rc").alias("rt"))))

    doc_feat = (_hashed_grams(corpus, text_col, n_buckets, [id_col])
                .groupBy(id_col, "bucket")
                .agg(F.count(F.lit(1)).alias("c")))
    term = (F.col("c").cast("double") *
            (F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double")
                   / (F.col("tt") + n_buckets).cast("double"))
             - F.log((F.coalesce(F.col("rc"), F.lit(0)) + 1)
                     .cast("double")
                     / (F.col("rt") + n_buckets).cast("double"))))
    scored = (doc_feat
              .join(F.broadcast(tgt_cnt), "bucket", "left")
              .join(F.broadcast(raw_cnt), "bucket", "left")
              .crossJoin(F.broadcast(tot))
              .groupBy(id_col)
              .agg(F.sum(F.col("c")).alias("n_feats"),
                   F.round(F.sum(term), 6).alias("log_w")))
    u = ((F.conv(F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                              F.lit(str(seed)))), 1, 13), 16, 10)
          .cast("double") + 0.5) / F.lit(float(2 ** 52)))
    gumbel = -F.log(-F.log(u))
    keyed = (corpus.select(F.col(id_col))
             .join(scored, id_col, "left")
             .select(id_col,
                     F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
                     F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
                     F.round(F.coalesce("log_w", F.lit(0.0)) + gumbel, 6)
                     .alias("skey")))
    top = (keyed.orderBy(F.col("skey").desc(), F.col(id_col))
           .limit(int(k)))
    return top.select(
        "*",
        F.row_number().over(
            Window.orderBy(F.col("skey").desc(), F.col(id_col)))
        .alias("rank"))


def oracle_sql_dsir(table: str, target_table: str, k: int,
                    n_buckets: int = 4096, id_col: str = "doc_id",
                    seed: int = 0) -> str:
    """DuckDB twin of :func:`dsir_resample` — identical word split,
    hash buckets, +1-smoothing arithmetic in the same
    integer-then-double order, 6-dp rounding before ranking."""
    words = ("CASE WHEN trim(coalesce(text, ''))='' THEN []::varchar[] "
             "ELSE %s END" % _sql_words())
    gram_rows = f"""(
      SELECT {{ids}} unnest(words) AS g FROM {{src}}
      UNION ALL
      SELECT {{ids}} unnest([words[i] || ' ' || words[i+1]
                             for i in range(1, len(words))]) AS g
      FROM {{src}} WHERE len(words) >= 2
    )"""
    bucket = (f"(('0x' || substr(md5(g), 1, 8))::BIGINT % {n_buckets})")
    return f"""
    WITH tbase AS (SELECT {words} AS words FROM {target_table}),
    rbase AS (SELECT {id_col}, {words} AS words FROM {table}),
    tcnt AS (
      SELECT {bucket} AS bucket, count(*)::BIGINT AS tc
      FROM {gram_rows.format(ids="", src="tbase")} GROUP BY 1
    ),
    rcnt AS (
      SELECT {bucket} AS bucket, count(*)::BIGINT AS rc
      FROM {gram_rows.format(ids="", src="rbase")} GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT sum(tc)::BIGINT FROM tcnt) AS tt,
             (SELECT sum(rc)::BIGINT FROM rcnt) AS rt
    ),
    docfeat AS (
      SELECT {id_col}, {bucket} AS bucket, count(*)::BIGINT AS c
      FROM {gram_rows.format(ids=id_col + ",", src="rbase")}
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT {id_col}, sum(c)::BIGINT AS n_feats,
             round(sum(c::DOUBLE *
               (ln((coalesce(tc, 0) + 1)::DOUBLE /
                   (tt + {n_buckets})::DOUBLE)
              - ln((coalesce(rc, 0) + 1)::DOUBLE /
                   (rt + {n_buckets})::DOUBLE))), 6) AS log_w
      FROM docfeat LEFT JOIN tcnt USING (bucket)
      LEFT JOIN rcnt USING (bucket) CROSS JOIN tot
      GROUP BY {id_col}
    ),
    keyed AS (
      SELECT b.{id_col},
             coalesce(n_feats, 0) AS n_feats,
             coalesce(log_w, 0.0) AS log_w,
             round(coalesce(log_w, 0.0)
               - ln(-ln((('0x' || substr(
                     md5(b.{id_col}::VARCHAR || ':' || '{seed}'),
                     1, 13))::BIGINT::DOUBLE + 0.5) / {float(2 ** 52)!r}))
               , 6) AS skey
      FROM (SELECT {id_col} FROM {table}) b
      LEFT JOIN scored USING ({id_col})
    )
    SELECT *, row_number() OVER (ORDER BY skey DESC, {id_col}) AS rank
    FROM keyed ORDER BY skey DESC, {id_col} LIMIT {int(k)}
    """


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


def curriculum_order(df: DataFrame, score_col: str = "n_chars",
                     n_buckets: int = 4, id_col: str = "doc_id"
                     ) -> DataFrame:
    """Curriculum ordering → (id, bucket, seq, mixed_pos): documents
    assigned to ``n_buckets`` difficulty bands by EXACT score
    quantiles (the length/perplexity curriculum of training
    pipelines), with ``seq`` the easy-first position within a band
    and ``mixed_pos`` the band-interleaved position ((seq−1)·B +
    bucket) — one number stream gives easy→hard order (sort by
    bucket, seq) and difficulty-mixed batches (sort by mixed_pos)
    without re-shuffling the corpus.

    Scale notes: NO global sort anywhere — the classic ntile()
    curriculum is a single-partition window at corpus scale. Band
    boundaries are exact interpolated percentiles (the same
    percentile ≡ quantile_cont device length_quantiles spiked), a
    B-row broadcast; band assignment is a codegen CASE; the only
    windows are per-band row_numbers over the B-way exchange. Bands
    are quantile-balanced rather than exactly-equal-sized (ntile's
    ±1 guarantee is what costs the global sort).
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    aggs = [F.round(F.percentile(F.col("_s"), F.lit(q)), 6)
            .alias("_q%d" % i) for i, q in enumerate(qs)]
    bounds = df.select(F.col(score_col).cast("double").alias("_s")) \
               .agg(*aggs)
    scored = df.select(F.col(id_col),
                       F.col(score_col).cast("double").alias("_s")) \
               .crossJoin(F.broadcast(bounds))
    bucket = sum((F.col("_s") > F.col("_q%d" % i)).cast("int")
                 for i in range(len(qs))) + F.lit(1)
    w = Window.partitionBy("bucket").orderBy("_s", id_col)
    return (scored.withColumn("bucket", bucket)
            .withColumn("seq", F.row_number().over(w))
            .select(id_col, "bucket", "seq",
                    ((F.col("seq") - 1) * n_buckets + F.col("bucket"))
                    .alias("mixed_pos"))
            .orderBy("bucket", "seq"))


def oracle_sql_curriculum(table: str = "documents",
                          score_col: str = "n_chars",
                          n_buckets: int = 4,
                          id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`curriculum_order` — identical quantile
    boundaries (quantile_cont ≡ percentile), band CASE, and per-band
    (score, id) windows."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    qaggs = ", ".join(
        f"round(quantile_cont(CAST({score_col} AS DOUBLE), {q}), 6)"
        f" AS q{i}" for i, q in enumerate(qs))
    bucket = " + ".join(
        f"(CASE WHEN s > q{i} THEN 1 ELSE 0 END)"
        for i in range(len(qs)))
    return f"""
    WITH bounds AS (SELECT {qaggs} FROM {table}),
    scored AS (
      SELECT {id_col}, CAST({score_col} AS DOUBLE) AS s, bounds.*
      FROM {table} CROSS JOIN bounds),
    banded AS (
      SELECT {id_col}, ({bucket}) + 1 AS bucket, s FROM scored)
    SELECT {id_col}, bucket,
           row_number() OVER (PARTITION BY bucket
                              ORDER BY s, {id_col}) AS seq,
           (row_number() OVER (PARTITION BY bucket
                               ORDER BY s, {id_col}) - 1)
             * {n_buckets} + bucket AS mixed_pos
    FROM banded
    ORDER BY bucket, seq
    """
