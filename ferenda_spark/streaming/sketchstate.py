"""Continuously-maintained HLL census over a stream
(applyInPandasWithState).

The batch census (operators/sketches.hll_distinct) answers "how many
distinct URLs per host" with one scan; a continuously-landing crawl
wants the same census WITHOUT rescanning history per batch. HLL makes
that free: the register table is the whole state, and merging a new
micro-batch is elementwise max — so per-key state is exactly m = 2^p
small ints, bounded forever, and the stream's answer after any prefix
of batches is BIT-IDENTICAL to the batch sketch over the same rows
(tests/test_stream_sketch.py asserts register-for-register equality).

The python-side register arithmetic mirrors the JVM expression device
exactly (md5 hex → 15-hex 60-bit int, idx = h mod m, ρ from bit
length) — integer ops only, so there is no float to drift. Estimates
are NOT computed here: the stream emits registers, and the shared
:func:`~ferenda_spark.operators.sketches.hll_estimate` reads them
out, batch and stream through the same arithmetic.

Scale notes: state is m ints per key (p=12 → 4 KiB); each micro-batch
shuffles once on the key (the groupBy), rows reduced map-side by
Arrow batching. This is the applyInPandasWithState extension point
the CMS/Bloom sketches would use identically (their merges are + and
|, also associative)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

from ..operators.sketches import HLL_HASH_BITS


def _py_register(value: str, p: int) -> tuple[int, int]:
    """(idx, rho) for one value — the python twin of the JVM
    md5/conv/pmod/bin expression chain in hll_registers."""
    width = HLL_HASH_BITS - p
    h = int(hashlib.md5(value.encode()).hexdigest()[:15], 16)
    w = h >> p
    rho = (width + 1) if w == 0 else width - w.bit_length() + 1
    return h % (1 << p), rho


def stream_hll_census(stream: DataFrame, key_col: str = "host",
                      value_col: str = "url", p: int = 12) -> DataFrame:
    """→ streaming (key, _idx, _r) register rows, "update" mode: after
    each micro-batch, every key that saw data re-emits its non-empty
    registers (the merged state). Feed the latest emission per key
    into :func:`~ferenda_spark.operators.sketches.hll_estimate`."""
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)
    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StringType, StructField, StructType)
    m = 1 << p
    out_schema = StructType([StructField(key_col, StringType()),
                             StructField("_idx", LongType()),
                             StructField("_r", LongType())])
    state_schema = StructType(
        [StructField("regs", ArrayType(IntegerType()))])

    def census(key, pdfs, state: GroupState):
        regs = list(state.get[0]) if state.exists else [0] * m
        for pdf in pdfs:
            for v in pdf[value_col].dropna():
                idx, rho = _py_register(str(v), p)
                if rho > regs[idx]:
                    regs[idx] = rho
        state.update((regs,))
        nz = [(key[0], i, r) for i, r in enumerate(regs) if r > 0]
        return iter([pd.DataFrame(nz, columns=[key_col, "_idx", "_r"])])

    return (stream.select(key_col, value_col)
            .groupBy(key_col)
            .applyInPandasWithState(census, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))
