"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are
STUBS — :func:`register_decoder` lets production swap in a real decoder
(Pillow/torchaudio/ffmpeg) without touching the Spark plumbing, and the
default is a deterministic fake so the schema/partitioning/batch-shape
path is fully testable. This mirrors how the reference gates optional
native tools (pdftohtml/tesseract/antiword subprocesses,
ref ferenda/pdfreader.py:79-127, ferenda/wordreader.py:23-60): the
framework plumbing is real, the codec is an exchangeable edge.

Scale notes: blobs never leave executors; Arrow batch size is bounded
by bytes not rows (see batch_rows guidance below); feature outputs are
narrow typed columns so downstream scans prune the blob away.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, IntegerType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("mime", StringType()),
    StructField("width", IntegerType()),      # decoded metadata
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("feature", ArrayType(FloatType())),  # embedding-shaped
    StructField("status", StringType()),
    StructField("error", StringType()),
])

_DECODERS: dict[str, object] = {}


def register_decoder(kind: str, fn) -> None:
    """fn(payload: bytes) -> dict(width, height, n_frames, feature)."""
    _DECODERS[kind] = fn


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: metadata and an 8-dim feature
    derived from the blob digest. Replace via register_decoder; raise
    NotImplementedError here if strict mode is wanted."""
    d = hashlib.sha256(bytes(payload)).digest()
    return {
        "width": 16 + d[0] % 64,
        "height": 16 + d[1] % 64,
        "n_frames": 1 + d[2] % 4,
        "feature": [round(b / 255.0, 6) for b in d[:8]],
    }


def decode_media(df: DataFrame, blob_col: str = "payload",
                 id_col: str = "media_id", kind_col: str = "kind",
                 mime_col: str = "mime") -> DataFrame:
    """binary blobs → typed metadata + feature vector via mapInPandas.

    Input: (media_id, kind, mime, payload binary). Per-batch Python,
    never per-row-at-driver; errors are captured per row (status/error
    columns), matching the extract stage's error discipline.
    """
    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, mime, payload in zip(
                    pdf[id_col], pdf[kind_col], pdf[mime_col], pdf[blob_col]):
                fn = _DECODERS.get(kind, _fake_decode)
                try:
                    meta = fn(payload)
                    rows.append({"media_id": mid, "kind": kind, "mime": mime,
                                 "status": "ok", "error": None, **meta})
                except Exception as exc:  # per-row capture: a corrupt
                    # blob/codec error must not kill the task; decoders
                    # signal "no codec" with NotImplementedError
                    status = ("unsupported"
                              if isinstance(exc, NotImplementedError)
                              else "error")
                    rows.append({"media_id": mid, "kind": kind, "mime": mime,
                                 "width": None, "height": None,
                                 "n_frames": None, "feature": None,
                                 "status": status, "error": str(exc)})
            yield pd.DataFrame(rows, columns=MEDIA_SCHEMA.fieldNames())

    from .util import ensure_parallelism
    return ensure_parallelism(df.select(id_col, kind_col, mime_col,
                                        blob_col)) \
        .mapInPandas(run, MEDIA_SCHEMA)


def synthetic_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (binary payloads) for testing the
    plumbing at any scale — generated distributed, like pages.py."""
    kinds = F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                 F.lit("video")),
                         (F.col("id") % 3 + 1).cast("int"))
    mimes = F.element_at(F.array(F.lit("image/png"), F.lit("audio/wav"),
                                 F.lit("video/mp4")),
                         (F.col("id") % 3 + 1).cast("int"))
    return (spark.range(0, n, 1, partitions)
            .select(F.concat(F.lit("m"), F.col("id")).alias("media_id"),
                    kinds.alias("kind"), mimes.alias("mime"),
                    F.sha2(F.col("id").cast("string"), 256)
                     .cast("binary").alias("payload")))
