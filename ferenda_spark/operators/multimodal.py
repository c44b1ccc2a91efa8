"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The built-in decoders parse real container headers in pure Python —
PNG signature + IHDR (width/height, CRC-checked) and WAV RIFF/fmt/data
(sample rate, channels, frame count) — so the metadata path is a real
decode with a hard oracle, not a stub. What stays an exchangeable edge
is pixel/sample decoding and feature extraction: the container has no
image/audio codecs, so :func:`register_decoder` swaps in a production
decoder (Pillow/torchaudio/ffmpeg) per kind, and the built-in video
path deliberately reports ``unsupported``. This mirrors how the
reference gates optional native tools (pdftohtml/tesseract/antiword
subprocesses, ref ferenda/pdfreader.py:79-127,
ferenda/wordreader.py:23-60): the framework plumbing is first-class,
the heavy codec is pluggable.

Metadata column semantics per kind:
- image: width/height in pixels (IHDR), n_frames = 1
- audio: width = sample rate (Hz), height = channels,
  n_frames = PCM frame count (data bytes / block align)
- video: no built-in codec → status 'unsupported'

Scale notes: blobs never leave executors; Arrow batch size is bounded
by bytes not rows; outputs are narrow typed columns so downstream
scans prune the blob away.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               StringType, StructField, StructType)

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

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_NO_VIDEO_CODEC = ("no codec registered for kind=video "
                   "(register_decoder extension point)")


def decode_png_header(payload: bytes) -> dict:
    """Parse PNG signature + IHDR: → width, height, n_frames=1. The
    IHDR CRC is verified, so a corrupt header surfaces as a per-row
    error instead of silent garbage."""
    p = bytes(payload)
    if p[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    (length,) = struct.unpack(">I", p[8:12])
    if p[12:16] != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not IHDR")
    data = p[16:16 + 13]
    (crc,) = struct.unpack(">I", p[29:33])
    if zlib.crc32(p[12:16] + data) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    width, height = struct.unpack(">II", data[:8])
    return {"width": int(width), "height": int(height), "n_frames": 1,
            "feature": None}


def decode_wav_header(payload: bytes) -> dict:
    """Parse WAV RIFF/fmt/data chunks: → width = sample rate,
    height = channels, n_frames = PCM frames (data size / block
    align)."""
    p = bytes(payload)
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, rate, channels, block_align, data_size = 12, None, None, None, None
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        (size,) = struct.unpack("<I", p[pos + 4:pos + 8])
        if cid == b"fmt ":
            fmt = p[pos + 8:pos + 8 + size]
            channels, rate = struct.unpack("<HI", fmt[2:8])
            (block_align,) = struct.unpack("<H", fmt[12:14])
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if rate is None or data_size is None or not block_align:
        raise ValueError("WAV missing fmt/data chunk")
    return {"width": int(rate), "height": int(channels),
            "n_frames": int(data_size // block_align), "feature": None}


def _no_video_codec(payload: bytes) -> dict:
    raise NotImplementedError(_NO_VIDEO_CODEC)


_DECODERS: dict[str, object] = {"image": decode_png_header,
                                "audio": decode_wav_header,
                                "video": _no_video_codec}


def register_decoder(kind: str, fn) -> None:
    """fn(payload: bytes) -> dict(width, height, n_frames, feature).
    Overrides the built-in header parsers with a full codec
    (pixels/samples/features) without touching the Spark plumbing."""
    _DECODERS[kind] = fn


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in full decoder (metadata + 8-dim feature
    from the blob digest) — the register_decoder example used by tests
    to exercise the feature path without real codecs."""
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
    decoders = dict(_DECODERS)  # snapshot → serialized to executors

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, mime, payload in zip(
                    pdf[id_col], pdf[kind_col], pdf[mime_col], pdf[blob_col]):
                fn = decoders.get(kind, _fake_decode)
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


# ------------------------------------------------- synthetic corpus

def make_png(width: int, height: int) -> bytes:
    """A real, minimal RGB PNG (valid IHDR/IDAT/IEND with CRCs)."""
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data +
                struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * (3 * width)) * height
    return (_PNG_SIG + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))


def make_wav(sample_rate: int, channels: int, n_frames: int,
             bits: int = 16) -> bytes:
    """A real 16-bit PCM WAV with ``n_frames`` zero frames."""
    block_align = channels * bits // 8
    data = b"\x00" * (n_frames * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) +
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(data)) + data)


def synthetic_payload(i: int) -> tuple[str, str, bytes]:
    """Deterministic (kind, mime, payload) per id — the generative
    formulas the DuckDB oracle recomputes (kgoracle-style): parsing
    bugs in the decoders surface as metadata mismatches."""
    if i % 3 == 0:
        return ("image", "image/png",
                make_png(1 + (7 * i) % 64, 1 + (13 * i) % 64))
    if i % 3 == 1:
        return ("audio", "audio/wav",
                make_wav(8000 + (i % 8) * 1000, 1 + i % 2,
                         100 + (17 * i) % 900))
    return ("video", "video/mp4",
            b"\x00\x00\x00\x18ftypmp42" + hashlib.sha256(
                str(i).encode()).digest())


def synthetic_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic media table with REAL container bytes (PNG/WAV)
    for testing the decode path at any scale — generated distributed,
    like pages.py."""
    schema = StructType([StructField("media_id", StringType()),
                         StructField("kind", StringType()),
                         StructField("mime", StringType()),
                         StructField("payload", BinaryType())])

    def run(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                kind, mime, payload = synthetic_payload(int(i))
                rows.append({"media_id": "m%d" % i, "kind": kind,
                             "mime": mime, "payload": payload})
            yield pd.DataFrame(rows, columns=schema.fieldNames())

    return spark.range(0, n, 1, partitions).mapInPandas(run, schema)


def oracle_sql_media_decode(n: int) -> str:
    """Recompute the synthetic corpus's expected metadata from the
    generative formulas — a hard oracle for the header decoders (the
    Spark side parses actual bytes; divergence = a parsing bug)."""
    return f"""
    SELECT 'm' || i AS media_id,
           CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CASE i % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           (CASE i % 3 WHEN 0 THEN 1 + (7 * i) % 64
                 WHEN 1 THEN 8000 + (i % 8) * 1000 END)::INT AS width,
           (CASE i % 3 WHEN 0 THEN 1 + (13 * i) % 64
                 WHEN 1 THEN 1 + i % 2 END)::INT AS height,
           (CASE i % 3 WHEN 0 THEN 1
                 WHEN 1 THEN 100 + (17 * i) % 900 END)::INT AS n_frames,
           CAST(NULL AS VARCHAR) AS feature,
           CASE WHEN i % 3 = 2 THEN 'unsupported' ELSE 'ok' END AS status,
           CASE WHEN i % 3 = 2 THEN '{_NO_VIDEO_CODEC}' END AS error
    FROM (SELECT range::BIGINT AS i FROM range(0, {n}))
    ORDER BY media_id
    """
