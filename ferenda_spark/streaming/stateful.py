"""Custom stateful streaming operators (applyInPandasWithState).

The reference's incrementality is per-document file-state checks; the
streaming-native analog needs cross-micro-batch state. This module
implements the one stateful primitive a continuously-landing crawl
needs: **first-seen wins** deduplication keyed on a column — a page
URL (or content hash) that already flowed through the stream in ANY
earlier micro-batch is suppressed, so downstream extraction work is
bounded by the new-key delta exactly like the batch path's
``needed()`` anti-join (operators/lineage.py), but without re-reading
the lineage table per batch.

State per key is a single marker row (GroupState), so state size is
O(distinct keys) — at web scale this is what watermarked
``dropDuplicates`` does inside Spark; the applyInPandasWithState form
is the extension point for richer per-key state (e.g. content-hash
history for download_is_different semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_first_seen(stream: DataFrame, key_col: str = "url",
                      payload_cols: tuple[str, ...] = ("warc_ts",)
                      ) -> DataFrame:
    """→ rows whose ``key_col`` has not been seen in any earlier
    micro-batch (first occurrence within a batch wins, ordered by the
    first payload column for determinism)."""
    import pandas as pd
    from pyspark.sql.types import (BooleanType, StringType, StructField,
                                   StructType)

    out_schema = StructType(
        [StructField(key_col, StringType())] +
        [StructField(c, stream.schema[c].dataType) for c in payload_cols])
    state_schema = StructType([StructField("seen", BooleanType())])

    def dedup(key, pdfs, state: GroupState):
        if state.exists:
            return iter(())
        batches = [pdf for pdf in pdfs if len(pdf)]
        state.update((True,))
        if not batches:
            return iter(())
        rows = pd.concat(batches).sort_values(
            list(payload_cols[:1]) or [key_col])
        return iter([rows.iloc[[0]][[key_col, *payload_cols]]])

    return (stream
            .select(key_col, *payload_cols)
            .groupBy(key_col)
            .applyInPandasWithState(dedup, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))
