"""Continuous identity maintenance over a streaming owl:sameAs feed.

The reference resolves identity per-document at relate time (ref
lagen/nu/sameas.py:15-75) — there is no global, continuously-updated
identity table. The batch analog here is
graph/components.connected_components; this module closes the loop for
continuously-landing alias edges: each micro-batch folds into the
(node, component) assignments table via
:func:`~ferenda_spark.graph.components.incremental_components`
(contracted-graph CC — batch-sized work, the corpus-sized table only
ever probes broadcast joins), so downstream canonicalization always
reads a complete identity mapping without ever re-running corpus CC.

Failure semantics under Structured Streaming's at-least-once
foreachBatch contract: the update is IDEMPOTENT — replaying a batch
whose edges are already reflected contracts every edge to a self-loop
(both endpoints carry the same component id), the contracted graph is
empty, and the table is rewritten unchanged. Bootstrap is the
degenerate update: against an empty table,
``incremental_components(∅, Δ) ≡ connected_components(Δ)``.
Convergence to the full recompute and replay no-op are asserted in
tests/test_graph.py.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..graph.components import incremental_components

EDGE_SCHEMA = "src string, dst string"
ASSIGN_SCHEMA = "node string, component string"


def stream_identity(spark: SparkSession, edges_dir: str,
                    assignments_dir: str, checkpoint_dir: str,
                    max_files_per_trigger: int = 8):
    """AvailableNow stream over a parquet sameAs-edge directory that
    maintains ``assignments_dir`` incrementally; returns the finished
    StreamingQuery."""

    def apply_batch(batch_df, _batch_id):
        if os.path.isdir(assignments_dir) and any(
                f.endswith(".parquet")
                for f in os.listdir(assignments_dir)):
            assignments = spark.read.parquet(assignments_dir)
        else:
            assignments = spark.createDataFrame([], ASSIGN_SCHEMA)
        updated = incremental_components(assignments, batch_df)
        # pin the result BEFORE the overwrite: the write replaces the
        # directory the plan reads from
        (updated.localCheckpoint(eager=True)
         .write.mode("overwrite").parquet(assignments_dir))

    q = (spark.readStream.schema(EDGE_SCHEMA)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(edges_dir)
         .writeStream
         .foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
