"""Sequence packing: greedy assignment of documents into fixed
token-budget bins — the batch-construction step of an LLM training
pipeline (documents → context-window-sized training sequences).

Semantics (the standard greedy first-fit-in-order packer): within a
shard, documents are visited in ascending ``doc_id`` order; a document
joins the current bin unless the bin is non-empty and adding it would
exceed ``budget`` tokens, in which case it starts the next bin. A
single document longer than the budget therefore gets a bin of its own
(downstream truncation is the trainer's call, not the packer's).

Scale shape: packing is carry-dependent (bin state threads through the
scan), so it cannot be a window function — but it is embarrassingly
parallel ACROSS shards. The operator shuffles once on the shard key
and packs each shard independently in an Arrow-batched
``applyInPandas`` (a linear pass over a numpy column). Shard count is
the parallelism knob: at 10^12 documents, tens of thousands of shards
→ uniform linear tasks, no skew (shard = doc_id mod n_shards is
round-robin by construction). Token counts are whitespace-word counts
(``textops.words_col`` semantics) so the whole operator is
deterministic and carries a hard DuckDB oracle (a recursive CTE that
replays the same greedy fold per shard).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StructField,
                               StructType)

from .textops import WS_SPLIT

PACK_SCHEMA = StructType([
    StructField("shard", LongType()),
    StructField("bin_id", LongType()),
    StructField("pos_in_bin", IntegerType()),
    StructField("doc_id", LongType()),
    StructField("n_tokens", LongType()),
])


def pack_sequences(df: DataFrame, budget: int = 2048, n_shards: int = 32,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """→ (shard, bin_id, pos_in_bin, doc_id, n_tokens)."""
    from .textops import words_col

    toks = df.select(
        (F.col(id_col) % F.lit(n_shards)).cast("long").alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(words_col(F.col(text_col))).cast("long").alias("n_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_ids, positions = [], []
        bin_id, fill, pos = 0, 0, 0
        for tok in pdf["n_tokens"]:
            if pos > 0 and fill + tok > budget:
                bin_id += 1
                fill, pos = 0, 0
            fill += tok
            bin_ids.append(bin_id)
            positions.append(pos)
            pos += 1
        return pd.DataFrame({
            "shard": pdf["shard"], "bin_id": bin_ids,
            "pos_in_bin": positions, "doc_id": pdf["doc_id"],
            "n_tokens": pdf["n_tokens"]})

    return toks.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)


def pack_sequences_single(rows, budget: int = 2048,
                          n_shards: int = 32) -> list[tuple]:
    """Single-threaded reference fold over (doc_id, n_tokens) pairs —
    the parity twin for tests."""
    shards: dict[int, list[tuple[int, int]]] = {}
    for doc_id, tok in rows:
        shards.setdefault(doc_id % n_shards, []).append((doc_id, tok))
    out = []
    for shard in sorted(shards):
        bin_id, fill, pos = 0, 0, 0
        for doc_id, tok in sorted(shards[shard]):
            if pos > 0 and fill + tok > budget:
                bin_id += 1
                fill, pos = 0, 0
            fill += tok
            out.append((shard, bin_id, pos, doc_id, tok))
            pos += 1
    return out


def oracle_sql_pack(documents_table: str = "documents",
                    budget: int = 2048, n_shards: int = 32,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """DuckDB oracle: replay the greedy fold with a recursive CTE
    (one iteration advances every shard by one document)."""
    return f"""
    WITH RECURSIVE toks AS (
      SELECT ({id_col} % {n_shards})::BIGINT AS shard,
             {id_col}::BIGINT AS doc_id,
             len(list_filter(regexp_split_to_array(trim({text_col}),
                 '{WS_SPLIT}'), w -> w <> ''))::BIGINT AS n_tokens,
             row_number() OVER (PARTITION BY {id_col} % {n_shards}
                                ORDER BY {id_col}) AS rn
      FROM {documents_table}
    ), packed AS (
      SELECT shard, doc_id, n_tokens, rn,
             0::BIGINT AS bin_id, n_tokens AS fill, 0 AS pos_in_bin
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.shard, t.doc_id, t.n_tokens, t.rn,
             CASE WHEN p.fill + t.n_tokens > {budget}
                  THEN p.bin_id + 1 ELSE p.bin_id END,
             CASE WHEN p.fill + t.n_tokens > {budget}
                  THEN t.n_tokens ELSE p.fill + t.n_tokens END,
             CASE WHEN p.fill + t.n_tokens > {budget}
                  THEN 0 ELSE p.pos_in_bin + 1 END
      FROM packed p
      JOIN toks t ON t.shard = p.shard AND t.rn = p.rn + 1
    )
    SELECT shard, bin_id, pos_in_bin, doc_id, n_tokens FROM packed
    """


def chunk_documents(docs: DataFrame, size: int = 128, stride: int = 96,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """→ (id, chunk_id, start_word, n_words, chunk_text): fixed
    context-window splitting with overlap — the step between raw
    documents and trainer sequences when documents exceed the model's
    window (stride < size ⇒ consecutive chunks share size−stride
    words, the standard sliding-window setting). Chunk starts are
    0, stride, 2·stride, …; the last chunk may be short; empty/NULL
    texts emit nothing.

    Scale notes: pure codegen — the word array is built once per row,
    the chunk count is arithmetic, the explode fans each document into
    its chunks and ``slice``/``array_join`` rebuild the windows. No
    shuffle at all: chunking is embarrassingly row-parallel, and the
    output order is (id, chunk_id)-keyed for the downstream packer.
    """
    if not (0 < stride <= size):
        raise ValueError("need 0 < stride <= size")
    from .textops import words_col
    w = words_col(F.col(text_col))
    n = F.size(w)
    # number of starts: 1 + ceil(max(0, n - size) / stride)
    n_chunks = (F.lit(1) +
                F.floor((F.greatest(n - size, F.lit(0)) +
                         F.lit(stride - 1)) / F.lit(stride))
                .cast("int"))
    out = (docs.select(F.col(id_col), w.alias("_w"), n.alias("_n"),
                       n_chunks.alias("_c"))
           .where(F.col("_n") > 0)
           .select(id_col, "_w", "_n",
                   F.explode(F.sequence(F.lit(0), F.col("_c") - 1))
                   .alias("chunk_id")))
    start = F.col("chunk_id") * stride
    return (out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_word"),
        F.least(F.lit(size), F.col("_n") - start).cast("long")
         .alias("n_words"),
        F.array_join(F.slice(F.col("_w"), start + 1, size), " ")
         .alias("chunk_text")))


def oracle_sql_chunk_documents(size: int = 128, stride: int = 96,
                               table: str = "documents",
                               id_col: str = "doc_id",
                               text_col: str = "text") -> str:
    """DuckDB twin of :func:`chunk_documents`: the same shared-class
    whitespace split, start arithmetic and list slicing."""
    return f"""
    WITH w AS (
      SELECT {id_col},
             CASE WHEN trim(coalesce({text_col}, '')) = ''
                  THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(
                         trim(coalesce({text_col}, '')), '{WS_SPLIT}')
             END AS words
      FROM {table}),
    c AS (
      SELECT {id_col}, words, len(words) AS n,
             1 + (greatest(n - {size}, 0) + {stride - 1}) // {stride}
               AS n_chunks
      FROM w WHERE len(words) > 0),
    x AS (
      SELECT {id_col}, words, n, unnest(range(0, n_chunks)) AS chunk_id
      FROM c)
    SELECT {id_col}, chunk_id::BIGINT AS chunk_id,
           (chunk_id * {stride})::BIGINT AS start_word,
           least({size}, n - chunk_id * {stride})::BIGINT AS n_words,
           array_to_string(
             words[(chunk_id * {stride} + 1):(chunk_id * {stride} + {size})],
             ' ') AS chunk_text
    FROM x
    ORDER BY {id_col}, chunk_id
    """
