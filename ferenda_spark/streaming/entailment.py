"""Continuous RDFS entailment maintenance over a streaming triple feed.

The reference leaves entailment to the triplestore's reasoner at query
time (ref ferenda/triplestore.py:56-104); the batch analog here is
operators/inference.rdfs_materialize. This module closes the loop for
continuously-landing triples: each micro-batch Δ appends exactly
``entail(T ∪ Δ) − entail(T)`` to the entailed table via
:func:`~ferenda_spark.operators.inference.rdfs_materialize_delta`, so
downstream readers always see a fully-entailed parquet table without
ever re-running the corpus-sized materialization.

Failure semantics (why this sink is safe under Structured Streaming's
at-least-once foreachBatch contract): the delta operator's terminal
anti-join makes the append IDEMPOTENT — a replayed micro-batch
re-derives rows that are now already in the table and the anti-join
drops them, so duplicates cannot appear; a crash mid-append followed by
replay appends only the rows the crash lost. Convergence to the full
recompute is asserted in tests/test_inference.py (including a
whole-stream replay with a fresh checkpoint).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..operators.inference import rdfs_materialize_delta

TRIPLE_SCHEMA = ("subject string, predicate string, object string, "
                 "objtype string")


def stream_entailment(spark: SparkSession, triples_dir: str,
                      entailed_dir: str, checkpoint_dir: str,
                      ontology: list[tuple[str, str, str]],
                      max_files_per_trigger: int = 8):
    """AvailableNow stream over a parquet triples directory that
    maintains ``entailed_dir`` incrementally; returns the finished
    StreamingQuery. Bootstrap is the degenerate delta: against an
    empty table, ``rdfs_materialize_delta(∅, Δ) ≡ entail(Δ)``."""

    def apply_batch(batch_df, _batch_id):
        if os.path.isdir(entailed_dir) and any(
                f.endswith(".parquet") for f in os.listdir(entailed_dir)):
            entailed = spark.read.parquet(entailed_dir)
        else:
            entailed = spark.createDataFrame([], TRIPLE_SCHEMA)
        new = rdfs_materialize_delta(entailed, batch_df, ontology)
        # materialize + truncate lineage BEFORE the append: the write
        # lands in the same directory the plan reads, so the rows must
        # be pinned first (also guarantees the anti-join saw the
        # pre-append table even under lazy re-evaluation)
        new.localCheckpoint(eager=True).write.mode("append") \
            .parquet(entailed_dir)

    q = (spark.readStream.schema(TRIPLE_SCHEMA)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(triples_dir)
         .writeStream
         .foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
