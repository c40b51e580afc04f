"""Multimodal column plumbing (SURVEY.md §2.11 — north-star extension).

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs. The Spark-side machinery — schemas, Arrow-batched mapInPandas
decode, partition sizing — is real and tested; the codec step is a
deterministic stub (this container has no image/audio libraries), marked
loudly so a deployment swaps in Pillow/torchaudio/PyAV inside
``_decode_stub`` without touching the dataflow.

Scale notes: media rows are large (MBs) — the loader repartitions by
bytes (``maxRecordsPerBatch`` keeps Arrow batches bounded), and decode
runs one Arrow batch at a time so executor memory stays flat. Feature
vectors come back as compact arrays; the heavy binary column is dropped
before any shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_stub(blob: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """STUB CODEC — deterministic fake feature extraction.

    Real deployments replace this body with Pillow (image decode +
    resize), torchaudio (resample + mel), or PyAV (frame sampling).
    The fake hashes byte windows into a fixed-size float vector so
    results are deterministic and shape-correct for downstream ANN.
    """
    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array(
        [c.mean() / 255.0 if c.size else 0.0 for c in chunks],
        dtype=np.float32,
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Decode/feature-extract media rows via Arrow-batched mapInPandas.

    The binary column never survives past this operator — only the
    compact feature vector is returned, so downstream shuffles move
    KBs, not MBs, per row."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(blob, kind, dim).tolist()
                for blob, kind in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def media_from_files(spark: SparkSession, root: str, kind: str) -> DataFrame:
    """Build a media table from a directory of binary files: binaryFile
    scan → MEDIA_SCHEMA rows with unknown metadata (filled by decode)."""
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    return files.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def synthetic_media(spark: SparkSession, n: int = 8) -> DataFrame:
    """Deterministic fake media table for tests (documents→bytes)."""
    rows = [
        (
            i,
            ["image", "audio", "video"][i % 3],
            bytes((i * 37 + j) % 256 for j in range(64 + i)),
            {"width": 8, "height": 8, "n_frames": None, "sample_rate": None},
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def _resize_stub(blob: bytes, width: int, height: int) -> bytes:
    """STUB CODEC — deterministic fake resize. A real deployment does
    Pillow ``Image.open(io.BytesIO(blob)).resize((w, h))`` here. The
    fake tiles/truncates the byte stream to exactly w*h bytes so output
    size is shape-correct for downstream batch-memory accounting."""
    target = width * height
    if not blob:
        return bytes(target)
    reps = -(-target // len(blob))
    return (blob * reps)[:target]


def resize_media(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize images via Arrow-batched mapInPandas: binary in → binary
    out with updated meta. Non-image rows pass through untouched. The
    per-batch loop keeps peak executor memory at one Arrow batch of
    media bytes (bound with spark.sql.execution.arrow.maxRecordsPerBatch
    when rows are MB-scale)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_blobs, metas = [], []
            for blob, kind, meta in zip(
                pdf["content"], pdf["kind"], pdf["meta"]
            ):
                if kind == "image":
                    out_blobs.append(_resize_stub(blob, width, height))
                    metas.append(
                        {
                            "width": width,
                            "height": height,
                            "n_frames": meta["n_frames"],
                            "sample_rate": meta["sample_rate"],
                        }
                    )
                else:
                    out_blobs.append(blob)
                    metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out_blobs,
                    "meta": metas,
                }
            )

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, every_n: int = 4, frame_bytes: int = 16
) -> DataFrame:
    """Frame sampling for video rows: one input row fans out to
    ``ceil(n_frames / every_n)`` frame rows (a flat-map, so mapInPandas
    not a scalar UDF). The decode is stubbed — a real deployment uses
    PyAV to seek + decode keyframes; the fake slices the byte stream
    into fixed-width pseudo-frames. Exploding *before* any shuffle
    keeps each output row small instead of moving whole videos."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, kind, blob in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video" or not blob:
                    continue
                n_frames = max(len(blob) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(
                        blob[fi * frame_bytes:(fi + 1) * frame_bytes]
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(_sample, FRAME_SCHEMA)


# --- REAL header probing (no codec libraries needed) ----------------------

PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("detected", T.StringType()),  # png | wav | unknown
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def parse_media_header(blob: bytes) -> dict:
    """REAL container-header parsing with the stdlib only — unlike the
    feature/resize codecs (stubbed: pixel decode genuinely needs
    Pillow/PyAV), format detection and dimension/sample-rate extraction
    are pure byte arithmetic per the PNG and RIFF/WAVE specs:

      * PNG:  8-byte magic, then the IHDR chunk — width/height are
        big-endian u32 at offsets 16/20.
      * WAV:  'RIFF' … 'WAVE' + 'fmt ' chunk — sample rate is a
        little-endian u32 at offset 24.
    """
    import struct

    if blob[:8] == _PNG_MAGIC and blob[12:16] == b"IHDR" and len(blob) >= 24:
        w, h = struct.unpack(">II", blob[16:24])
        return {"detected": "png", "width": w, "height": h,
                "sample_rate": None}
    if (
        blob[:4] == b"RIFF"
        and blob[8:12] == b"WAVE"
        and blob[12:16] == b"fmt "
        and len(blob) >= 28
    ):
        (sr,) = struct.unpack("<I", blob[24:28])
        return {"detected": "wav", "width": None, "height": None,
                "sample_rate": sr}
    return {"detected": "unknown", "width": None, "height": None,
            "sample_rate": None}


def probe_metadata(media: DataFrame) -> DataFrame:
    """Fill typed metadata from REAL container headers via Arrow-batched
    mapInPandas; the binary column is dropped from the output, so only
    compact metadata rows reach any downstream shuffle."""

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_media_header(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "detected": [r["detected"] for r in rows],
                    "width": [r["width"] for r in rows],
                    "height": [r["height"] for r in rows],
                    "sample_rate": [r["sample_rate"] for r in rows],
                    "n_bytes": [len(b) for b in pdf["content"]],
                }
            )

    return media.mapInPandas(_probe, PROBE_SCHEMA)


def make_png_bytes(width: int, height: int) -> bytes:
    """Minimal spec-correct PNG prefix (magic + IHDR); enough container
    for header probing — pixel data would need a real encoder."""
    import struct

    ihdr = struct.pack(">II", width, height) + b"\x08\x06\x00\x00\x00"
    return (
        _PNG_MAGIC
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"  # CRC not validated by the probe
    )


def make_wav_bytes(sample_rate: int, channels: int = 1) -> bytes:
    """Minimal spec-correct RIFF/WAVE header with an empty data chunk."""
    import struct

    fmt = struct.pack(
        "<IHHIIHH",
        16, 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    return (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + fmt
        + b"data" + struct.pack("<I", 0)
    )


def synthetic_probe_media(spark: SparkSession, n: int = 12) -> DataFrame:
    """Media table of REAL PNG/WAV containers (header-only payloads)
    with id-derived dimensions, so probe results are checkable by
    construction."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            blob = make_png_bytes(16 + i, 9 + i)
            kind = "image"
        else:
            blob = make_wav_bytes(8000 + 100 * i)
            kind = "audio"
        rows.append(
            (i, kind, blob,
             {"width": None, "height": None, "n_frames": None,
              "sample_rate": None})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
