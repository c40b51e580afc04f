"""Multimodal column plumbing (SURVEY.md §2.11 — north-star extension).

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs. The Spark-side machinery — schemas, Arrow-batched mapInPandas
decode, partition sizing — is real and tested. The IMAGE pixel path is
a real stdlib PNG codec (``encode_png``/``decode_png``: zlib inflate,
all five scanline filters; feeds ``image_stats`` and the oracled
``q_media_features``). The AUDIO sample path is a real stdlib RIFF/WAVE
PCM16 codec (``encode_wav``/``decode_wav``: chunk walk, channel
de-interleave; feeds ``audio_stats`` and the oracled
``q_audio_features``). The VIDEO frame path is a real stdlib RIFF-AVI
uncompressed-BI_RGB codec (``encode_avi``/``decode_avi``: recursive
chunk walk, bottom-up BGR DIB frames; feeds ``video_stats``,
``sample_frames``, and the oracled ``q_video_features``). The
``_decode_stub`` fallback remains only for container-less payloads and
compressed codecs (PyAV/torchaudio territory), marked loudly so a
deployment swaps the real library in without touching the dataflow.

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
    """STUB CODEC — deterministic fake feature extraction, now only the
    fallback for compressed-media SAMPLES: H.264 pixel decode
    (CABAC/CAVLC + transforms — stream/SPS METADATA extracts for real
    via operators/h264.py since r9), MP3 PCM (sync-frame METADATA
    extracts for real via operators/mp3.py since r9; samples need
    huffman+IMDCT) and MP4 sample data (container METADATA — boxes,
    duration, geometry, codec fourccs — extracts for real via
    operators/mp4.py since r11), plus container-less test blobs.  PNG pixels, JPEG (baseline,
    4:2:0/4:2:2 subsampled AND progressive as of r8), PCM-WAV samples
    and uncompressed AVI frames all decode for real (``decode_png`` /
    ``jpeg.decode_jpeg`` / ``decode_wav`` / ``decode_avi``); see
    ``_decode_features``.  The fake hashes byte windows into a
    fixed-size float vector so results are deterministic and
    shape-correct for downstream ANN.
    """
    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array(
        [c.mean() / 255.0 if c.size else 0.0 for c in chunks],
        dtype=np.float32,
    )


def _decode_features(blob: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """Feature-vector dispatch: REAL decode when the payload is a
    container we have a spec-correct codec for, stub otherwise.

      * audio + RIFF/WAVE → decode_wav: normalized samples (s/32768)
        bucketed into ``dim`` window means — real PCM energy profile.
      * image + PNG       → decode_png: normalized pixels bucketed into
        ``dim`` window means — real luminance profile.
      * image + JPEG      → decode_jpeg (baseline sequential, r7):
        same normalized-pixel profile from the DCT-decoded planes.
      * video + RIFF/AVI  → decode_avi: normalized frame pixels in
        temporal order bucketed into ``dim`` window means.
      * anything else     → _decode_stub (MP3 /
        H.264 need PyAV/torchaudio; raw test blobs have no container).
    """
    try:
        if kind == "audio" and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            samples, _ = decode_wav(blob)
            flat = samples.astype(np.float64).ravel() / 32768.0
        elif kind == "image" and blob[:8] == _PNG_MAGIC:
            flat = decode_png(blob).astype(np.float64).ravel() / 255.0
        elif kind == "image" and blob[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            flat = decode_jpeg(blob).astype(np.float64).ravel() / 255.0
        elif kind in ("image", "video") and blob[:6] in (
            b"GIF87a", b"GIF89a"
        ):
            from .gif import decode_gif

            frames = decode_gif(blob)
            src = frames[0] if kind == "image" else frames
            flat = src.astype(np.float64).ravel() / 255.0
        elif kind == "video" and blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
            frames, _ = decode_avi(blob)
            flat = frames.astype(np.float64).ravel() / 255.0
        else:
            return _decode_stub(blob, kind, dim)
    except ValueError:
        return _decode_stub(blob, kind, dim)
    if flat.size == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(flat, dim)
    return np.array(
        [c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Decode/feature-extract media rows via Arrow-batched mapInPandas.

    The binary column never survives past this operator — only the
    compact feature vector is returned, so downstream shuffles move
    KBs, not MBs, per row."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_features(bytes(blob), kind, dim).tolist()
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


def _resize_stub(
    blob: bytes, width: int, height: int, n_frames: int | None = None
) -> bytes:
    """STUB CODEC — deterministic fake resize for non-PNG image blobs
    (JPEG etc. need a real compressed codec; a deployment plugs Pillow
    in here). The fake tiles/truncates the byte stream to exactly w*h
    bytes — times ``n_frames`` for video payloads, so a stubbed video
    row stays internally consistent with the n_frames its meta reports
    (frames implied by byte count == frames in meta) for downstream
    batch-memory accounting."""
    target = width * height * (n_frames if n_frames else 1)
    if not blob:
        return bytes(target)
    reps = -(-target // len(blob))
    return (blob * reps)[:target]


def _resize_png_nn(blob: bytes, width: int, height: int) -> bytes:
    """REAL resize for PNG payloads: stdlib decode → nearest-neighbor
    resample (src index = floor(dst*src_dim/dst_dim) — pure integer
    mapping, so results are bit-deterministic and oracle-computable in
    closed form) → stdlib re-encode.  Numpy fancy-indexing does the
    resample; no Python-per-pixel loop."""
    arr = decode_png(blob)
    h, w = arr.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return encode_png(np.ascontiguousarray(arr[ys][:, xs]))


def _resize_jpeg_nn(blob: bytes, width: int, height: int) -> bytes:
    """REAL resize for baseline-JPEG payloads (r7): stdlib decode →
    the same integer nearest-neighbor mapping as the PNG path →
    flat-quant re-encode (re-encoding at flat quant keeps the resample
    deterministic; a deployment tuning for size swaps in std tables)."""
    from .jpeg import decode_jpeg, encode_jpeg

    arr = decode_jpeg(blob)
    h, w = arr.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return encode_jpeg(np.ascontiguousarray(arr[ys][:, xs]), quant="flat")


def _resize_gif_nn(blob: bytes, width: int, height: int) -> bytes:
    """REAL resize for GIF payloads (r8): stdlib decode (all frames
    composited) → the same integer nearest-neighbor mapping → lossless
    re-encode; animations keep their frame count."""
    from .gif import decode_gif, encode_gif

    frames = decode_gif(blob)
    h, w = frames.shape[1:3]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    resized = np.ascontiguousarray(frames[:, ys][:, :, xs])
    return encode_gif(resized if len(resized) > 1 else resized[0])


def _resize_avi_nn(blob: bytes, width: int, height: int) -> bytes:
    """REAL resize for uncompressed RIFF-AVI payloads: same integer
    nearest-neighbor mapping as the PNG path, applied per frame via
    one fancy-index over the (n, h, w, 3) array; fps preserved."""
    frames, fps = decode_avi(blob)
    h, w = frames.shape[1:3]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return encode_avi(np.ascontiguousarray(frames[:, ys][:, :, xs]), fps=fps)


def resize_media(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize images and videos via Arrow-batched mapInPandas: binary
    in → binary out with updated meta. PNG payloads and uncompressed
    RIFF-AVI payloads take REAL paths (stdlib decode → integer
    nearest-neighbor → re-encode; AVI resamples every frame with one
    fancy-index, fps preserved); other blobs fall back to the labeled
    stub. Audio rows pass through untouched (resize has no meaning —
    resampling is a different operator). The per-batch loop keeps peak
    executor memory at one Arrow batch of media bytes (bound with
    spark.sql.execution.arrow.maxRecordsPerBatch when rows are
    MB-scale)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_blobs, metas = [], []
            for blob, kind, meta in zip(
                pdf["content"], pdf["kind"], pdf["meta"]
            ):
                if kind in ("image", "video"):
                    # NULL content must stay null-tolerant (the stub
                    # emits a zero blob), not crash on bytes(None)
                    b = b"" if blob is None else bytes(blob)
                    if kind == "image" and b[:8] == _PNG_MAGIC:
                        out = _resize_png_nn(b, width, height)
                    elif kind == "image" and b[:2] == b"\xff\xd8":
                        out = _resize_jpeg_nn(b, width, height)
                    elif b[:6] in (b"GIF87a", b"GIF89a"):
                        out = _resize_gif_nn(b, width, height)
                    elif (
                        kind == "video"
                        and b[:4] == b"RIFF"
                        and b[8:12] == b"AVI "
                    ):
                        out = _resize_avi_nn(b, width, height)
                    else:
                        out = _resize_stub(
                            b,
                            width,
                            height,
                            meta["n_frames"] if kind == "video" else None,
                        )
                    out_blobs.append(out)
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
    not a scalar UDF). Uncompressed RIFF-AVI payloads decode for REAL
    (every ``every_n``-th frame's raw RGB bytes via ``decode_avi``);
    container-less payloads fall back to the byte-slice stub (a real
    deployment swaps PyAV in there for compressed codecs). Exploding
    *before* any shuffle keeps each output row small instead of moving
    whole videos."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, kind, blob in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video" or not blob:
                    continue
                blob = bytes(blob)
                if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
                    arr, _fps = decode_avi(blob)
                    for fi in range(0, arr.shape[0], every_n):
                        ids.append(mid)
                        idxs.append(fi)
                        frames.append(arr[fi].tobytes())
                else:
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
        T.StructField("detected", T.StringType()),  # png | wav | avi | unknown
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
      * AVI:  'RIFF' … 'AVI ' + LIST hdrl whose first chunk is 'avih'
        (both spec-mandated) — width/height are little-endian u32 at
        avih offsets 32/36 (file offsets 64/68).
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
    if (
        blob[:4] == b"RIFF"
        and blob[8:12] == b"AVI "
        and blob[12:16] == b"LIST"
        and blob[20:24] == b"hdrl"
        and blob[24:28] == b"avih"
        and len(blob) >= 72
    ):
        w, h = struct.unpack("<II", blob[64:72])
        return {"detected": "avi", "width": w, "height": h,
                "sample_rate": None}
    if blob[:2] == b"\xff\xd8":
        from .jpeg import parse_jpeg_header

        hdr = parse_jpeg_header(blob)
        if hdr is not None:
            h, w, _ = hdr
            return {"detected": "jpeg", "width": w, "height": h,
                    "sample_rate": None}
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import parse_gif_header

        hdr = parse_gif_header(blob)
        if hdr is not None:
            h, w, _ = hdr
            return {"detected": "gif", "width": w, "height": h,
                    "sample_rate": None}
    if blob[:2] == b"BM" and len(blob) >= 26:
        w, h_signed = struct.unpack("<ii", blob[18:26])
        return {"detected": "bmp", "width": w, "height": abs(h_signed),
                "sample_rate": None}
    if blob[:4] == b"fLaC" and len(blob) >= 21:
        # STREAMINFO (r14): magic(4) + block header(4), then the
        # 20-bit sample rate at body offset 10 → file offset 18
        sr = int.from_bytes(blob[18:21], "big") >> 4
        return {"detected": "flac", "width": None, "height": None,
                "sample_rate": sr}
    if blob[4:8] == b"ftyp" or blob[4:8] == b"moov":
        # ISO-BMFF (r11): real box walk via operators/mp4.py
        from .mp4 import parse_mp4

        meta = parse_mp4(blob)
        if meta["valid"]:
            return {"detected": "mp4",
                    "width": meta["width"] or None,
                    "height": meta["height"] or None,
                    "sample_rate": None}
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


# --- REAL stdlib PNG pixel codec ------------------------------------------
#
# Pixel decode does NOT need an image library for PNG: IDAT is
# zlib-compressed scanlines, each prefixed by a filter-type byte
# (0 none, 1 sub, 2 up, 3 average, 4 paeth).  The encoder/decoder pair
# below implements the spec for 8-bit RGB/RGBA, non-interlaced — enough
# to make the image path of the multimodal pipeline execute real
# byte-level decoding end-to-end (the audio/video codecs stay stubbed:
# those genuinely need torchaudio/PyAV).


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(line))
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return bytes(out)


def _unfilter_line(
    ftype: int, cur: bytearray, prev: bytes, bpp: int
) -> None:
    """Reverse one scanline's filter in place (recon per PNG §9)."""
    n = len(cur)
    if ftype == 0:
        return
    if ftype == 1:
        for i in range(bpp, n):
            cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
    elif ftype == 2:
        for i in range(n):
            cur[i] = (cur[i] + prev[i]) & 0xFF
    elif ftype == 3:
        for i in range(n):
            a = cur[i - bpp] if i >= bpp else 0
            cur[i] = (cur[i] + (a + prev[i]) // 2) & 0xFF
    elif ftype == 4:
        for i in range(n):
            a = cur[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            cur[i] = (cur[i] + _paeth(a, prev[i], c)) & 0xFF
    else:
        raise ValueError(f"bad PNG filter type {ftype}")


def encode_png(arr: np.ndarray, filter_cycle: tuple = (0, 1, 2, 3, 4)) -> bytes:
    """Spec-correct PNG encoder (stdlib zlib/struct only) for uint8
    (h, w, 3|4) arrays.  ``filter_cycle`` picks the per-row filter type
    round-robin, so a fixture image exercises every unfilter path —
    the decoder can't pass by handling filter 0 alone."""
    import struct
    import zlib

    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_png expects uint8 (h, w, 3|4)")
    h, w, ch = arr.shape
    color = 2 if ch == 3 else 6
    raw = bytearray()
    prev = bytes(w * ch)
    for r in range(h):
        line = arr[r].tobytes()
        f = filter_cycle[r % len(filter_cycle)]
        raw.append(f)
        raw += _filter_line(f, line, prev, ch)
        prev = line

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# PNG §4.5.2 channel counts per color type (0 gray, 2 RGB, 3 palette
# index, 4 gray+alpha, 6 RGBA) and §4.5.1 legal bit depths
_PNG_RAW_CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}
# Adam7 pass origins/strides (x0, y0, dx, dy), PNG §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_consume_pass(
    raw: bytes, off: int, pw: int, ph: int, depth: int, ch_raw: int
) -> tuple[np.ndarray, int]:
    """Unfilter + bit-unpack one (sub-)image of ``ph`` scanlines from
    the decompressed stream at ``off`` → ((ph, pw, ch_raw) uint16
    values in native range, new offset)."""
    stride = (pw * depth * ch_raw + 7) // 8
    bpp = max(1, depth * ch_raw // 8)
    need = ph * (stride + 1)
    if off + need > len(raw):
        raise ValueError("PNG scanline payload has wrong length")
    lines = np.empty((ph, stride), dtype=np.uint8)
    prev = bytes(stride)
    for r in range(ph):
        base = off + r * (stride + 1)
        cur = bytearray(raw[base + 1 : base + 1 + stride])
        _unfilter_line(raw[base], cur, prev, bpp)
        prev = bytes(cur)
        lines[r] = np.frombuffer(prev, dtype=np.uint8)
    if depth == 8:
        vals = lines.reshape(ph, -1)[:, : pw * ch_raw].astype(np.uint16)
    elif depth == 16:
        vals = (
            lines.reshape(ph, -1)
            .view(">u2")[:, : pw * ch_raw]
            .astype(np.uint16)
        )
    else:  # 1 / 2 / 4 — big-endian bit packing within each byte
        bits = np.unpackbits(lines, axis=1)
        per = bits[:, : pw * ch_raw * depth].reshape(
            ph, pw * ch_raw, depth
        )
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        vals = (per * weights).sum(axis=2).astype(np.uint16)
    return vals.reshape(ph, pw, ch_raw), off + need


def decode_png(blob: bytes) -> np.ndarray:
    """Spec-correct PNG decoder (stdlib zlib/struct only): chunk walk →
    IDAT concat → zlib inflate → per-scanline unfilter → uint8
    (h, w, channels).  Full PNG 1.2 coverage (r14): all five color
    types at their legal bit depths (grayscale 1/2/4/8/16, truecolor
    8/16, palette 1/2/4/8 with tRNS alpha, gray+alpha, RGBA) and
    Adam7 INTERLACE — each pass is its own filtered sub-image placed
    back by strided assignment.  16-bit samples scale to 8 (>>8),
    sub-byte grays scale by 255/(2^d−1), palette indices expand
    through PLTE; output is always uint8 with 3 or 4 channels so
    every downstream consumer (image_stats, resize, dhash) sees one
    shape."""
    import struct
    import zlib

    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    plte, trns = None, None
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"PLTE":
            plte = data
        elif tag == b"tRNS":
            trns = data
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if color not in _PNG_RAW_CH or depth not in _PNG_DEPTHS[color] \
            or comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace})"
        )
    ch_raw = _PNG_RAW_CH[color]
    raw = zlib.decompress(bytes(idat))
    native = np.zeros((h, w, ch_raw), dtype=np.uint16)
    if interlace == 0:
        vals, off = _png_consume_pass(raw, 0, w, h, depth, ch_raw)
        if off != len(raw):
            raise ValueError("PNG scanline payload has wrong length")
        native = vals
    else:
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            vals, off = _png_consume_pass(raw, off, pw, ph, depth,
                                          ch_raw)
            native[y0::dy, x0::dx] = vals
        if off != len(raw):
            raise ValueError("PNG scanline payload has wrong length")

    if color == 3:  # palette expansion
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        idx = native[:, :, 0]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb

    # scale native samples to 8-bit
    if depth == 16:
        eight = (native >> 8).astype(np.uint8)
    elif depth == 8:
        eight = native.astype(np.uint8)
    else:
        maxv = (1 << depth) - 1
        eight = (native * 255 // maxv).astype(np.uint8)
    if color == 0:  # gray → 3 channels
        return np.repeat(eight, 3, axis=2)
    if color == 4:  # gray+alpha → RGBA
        g = np.repeat(eight[:, :, :1], 3, axis=2)
        return np.dstack([g, eight[:, :, 1]])
    return eight  # 2 (RGB) / 6 (RGBA) pass through


def _encode_png_raw(
    native: np.ndarray,
    depth: int,
    color: int,
    interlace: int = 0,
    plte: bytes | None = None,
    trns: bytes | None = None,
) -> bytes:
    """Fixture-grade PNG writer for ANY legal (color, depth) combo —
    filter-0 scanlines only, optional Adam7 emission.  ``native`` is
    (h, w, ch_raw) ints in the depth's native range.  Exists so the
    q_png_formats fixtures cover the decoder's full envelope; the
    production encoder (encode_png) stays the filtered 8-bit one."""
    import struct
    import zlib

    h, w, ch_raw = native.shape

    def pack_rows(sub: np.ndarray) -> bytes:
        ph, pw, _ = sub.shape
        out = bytearray()
        for r in range(ph):
            vals = sub[r].ravel()
            out.append(0)  # filter type none
            if depth == 8:
                out += bytes(int(v) for v in vals)
            elif depth == 16:
                for v in vals:
                    out += struct.pack(">H", int(v))
            else:
                per = 8 // depth
                for i in range(0, len(vals), per):
                    byte = 0
                    for j, v in enumerate(vals[i : i + per]):
                        byte |= int(v) << (8 - depth * (j + 1))
                    out.append(byte)
        return bytes(out)

    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = native[y0::dy, x0::dx]
            if sub.size:
                raw += pack_rows(sub)
        raw = bytes(raw)
    else:
        raw = pack_rows(native)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    out = bytearray(_PNG_MAGIC)
    out += chunk(b"IHDR", struct.pack(
        ">IIBBBBB", w, h, depth, color, 0, 0, interlace))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    if trns is not None:
        out += chunk(b"tRNS", trns)
    out += chunk(b"IDAT", zlib.compress(raw))
    out += chunk(b"IEND", b"")
    return bytes(out)


def fullspec_png_media(spark: SparkSession) -> DataFrame:
    """Media table covering the decoder's full PNG envelope with
    closed-form pixels (the q_png_formats oracle recomputes every
    channel mean from these formulas in SQL):

      0  gray  d1  9×5   v=(x+y)%2            px=v·255
      1  gray  d2  8×6   v=(x+2y)%4           px=v·85
      2  gray  d4  7×5   v=(x+2y)%16          px=v·17
      3  gray  d16 6×4   raw=(4097(13x+7y))%65536   px=raw>>8
      4  pal   d4  8×4 (+tRNS)  idx=(x+3y)%16, pal[j]=(37j,59j,83j)%256
      5  GA    d8  6×6   g=(13x+7y)%256, a=(x·y)%256 (alpha ignored)
      6  RGB   d16 5×4   raw_c=(4097(17x+29y+11c))%65536  px=raw>>8
      7  RGB   d8 10×9 ADAM7-INTERLACED  px_c=(17x+29y+11c)%256
      8  pal   d2  8×2 (no tRNS)  idx=(x+y)%4
    """
    rows = []

    def gray(mid, w, h, depth, fn):
        nat = np.array(
            [[[fn(x, y)] for x in range(w)] for y in range(h)]
        )
        rows.append((mid, bytearray(_encode_png_raw(nat, depth, 0))))

    gray(0, 9, 5, 1, lambda x, y: (x + y) % 2)
    gray(1, 8, 6, 2, lambda x, y: (x + 2 * y) % 4)
    gray(2, 7, 5, 4, lambda x, y: (x + 2 * y) % 16)
    gray(3, 6, 4, 16, lambda x, y: (4097 * (13 * x + 7 * y)) % 65536)

    pal = bytes(
        b for j in range(16)
        for b in ((37 * j) % 256, (59 * j) % 256, (83 * j) % 256)
    )
    idx4 = np.array(
        [[[(x + 3 * y) % 16] for x in range(8)] for y in range(4)]
    )
    rows.append((4, bytearray(_encode_png_raw(
        idx4, 4, 3, plte=pal,
        trns=bytes((255 - 16 * j) % 256 for j in range(16))))))

    ga = np.array(
        [[[(13 * x + 7 * y) % 256, (x * y) % 256]
          for x in range(6)] for y in range(6)]
    )
    rows.append((5, bytearray(_encode_png_raw(ga, 8, 4))))

    rgb16 = np.array(
        [[[(4097 * (17 * x + 29 * y + 11 * c)) % 65536
           for c in range(3)] for x in range(5)] for y in range(4)]
    )
    rows.append((6, bytearray(_encode_png_raw(rgb16, 16, 2))))

    rgb8 = np.array(
        [[[(17 * x + 29 * y + 11 * c) % 256
           for c in range(3)] for x in range(10)] for y in range(9)]
    )
    rows.append((7, bytearray(_encode_png_raw(rgb8, 8, 2,
                                              interlace=1))))

    idx2 = np.array(
        [[[(x + y) % 4] for x in range(8)] for y in range(2)]
    )
    rows.append((8, bytearray(_encode_png_raw(idx2, 2, 3,
                                              plte=pal[:12]))))

    return spark.createDataFrame(
        rows, "media_id long, content binary"
    )


def _round_half_up(x: float, digits: int) -> float:
    """Round half AWAY from zero, matching DuckDB's round() (the oracle
    engine) rather than Python round()'s banker's rounding — a mean
    landing exactly on a half-boundary at the target precision would
    otherwise hash-mismatch."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def _decode_image_any(blob: bytes) -> np.ndarray:
    """Container dispatch for still images: PNG via decode_png, JPEG
    (baseline/subsampled/progressive) via decode_jpeg, GIF via
    decode_gif (first frame — animation goes through the video path).
    Grayscale JPEG planes broadcast to 3 channels so downstream
    channel-mean consumers see one shape."""
    if blob[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        arr = decode_jpeg(blob)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        return arr
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(blob)[0]
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        arr = decode_tiff(blob)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        return arr
    return decode_png(blob)


def image_stats(media: DataFrame, round_digits: int = 6) -> DataFrame:
    """REAL pixel-level feature extraction for PNG and baseline-JPEG
    rows: decode via the stdlib codecs inside Arrow-batched
    mapInPandas, emit per-image dimensions + normalized channel means.
    The binary column is dropped in the output — only compact stats
    reach any shuffle."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                # corrupt-payload tolerance (the image analogue of
                # PERMISSIVE JSONL): a truncated or malformed container
                # in a 100 TB scrape must yield a null-stats row the
                # pipeline can count and filter, never kill the job
                try:
                    arr = (
                        _decode_image_any(bytes(blob)).astype(np.float64)
                        / 255.0
                    )
                except Exception:
                    # broad on purpose: truncated segments raise
                    # struct.error, stripped DHTs KeyError, torn PNG
                    # IDATs zlib.error — all must become a null-stats
                    # row, not a job failure
                    recs.append((mid, None, None, None, None, None))
                    continue
                h, w = arr.shape[:2]
                means = arr.reshape(-1, arr.shape[2]).mean(axis=0)
                recs.append(
                    (
                        mid, w, h,
                        _round_half_up(float(means[0]), round_digits),
                        _round_half_up(float(means[1]), round_digits),
                        _round_half_up(float(means[2]), round_digits),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return media.mapInPandas(_stats, IMAGE_STATS_SCHEMA)


def gradient_png_media(spark: SparkSession, n: int = 8) -> DataFrame:
    """Media table of REAL decodable PNGs with closed-form pixel values:
    image i is (3+i) rows × (4+i) cols with R=x, G=y, B=x+y (all < 256,
    so channel means are (w-1)/2, (h-1)/2, (w+h-2)/2 by construction —
    what the q_media_features oracle pins).  Rows are encoded with the
    full filter cycle, so decoding exercises sub/up/average/paeth."""
    rows = []
    for i in range(n):
        w, h = 4 + i, 3 + i
        x = np.arange(w, dtype=np.uint8)[None, :, None]
        y = np.arange(h, dtype=np.uint8)[:, None, None]
        arr = np.concatenate(
            [
                np.broadcast_to(x, (h, w, 1)),
                np.broadcast_to(y, (h, w, 1)),
                (x + y).astype(np.uint8),
            ],
            axis=2,
        )
        rows.append(
            (
                i, "image", encode_png(np.ascontiguousarray(arr)),
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def tile_jpeg_media(
    spark: SparkSession, n: int = 6, n_420: int = 0, n_prog: int = 0
) -> DataFrame:
    """Media table of REAL baseline JPEGs with closed-form pixel values:
    image i is (2 + i%3) x (1 + i%2) constant 8x8 tiles, tile (bx, by)
    holding value (17*bx + 29*by + 11*i) % 256, encoded grayscale with
    FLAT quantization tables — a constant block's DCT is DC-only and
    integer, so encode→decode is BIT-EXACT (see operators/jpeg.py) and
    the channel means are the tile-value average by construction, which
    is what the q_jpeg_features oracle pins.  Every second image also
    carries restart markers so the decoder's DRI/RSTn predictor-reset
    path runs inside the oracle-checked query, not just in pytest.

    ``n_420`` appends that many COLOR 4:2:0 chroma-subsampled fixtures
    (media_id n..n+n_420-1; r8 — the dominant wild-JPEG layout): image
    j is (1 + j%3) x (1 + j%2) constant 16x16 tiles with R=G=B =
    (13*bx + 31*by + 7*j) % 256.  Gray RGB maps to YCbCr (v, 128, 128)
    exactly and a 16x16 tile is constant over every subsampled chroma
    block, so the 4:2:0 encode→decode roundtrip is bit-exact in RGB
    too — closed-form channel means survive subsampling.

    ``n_prog`` appends that many PROGRESSIVE (SOF2) grayscale fixtures
    (media_id n+n_420.. ; r8): image p is (1 + p%2) x (2 - p%2)
    constant 8x8 tiles with value (19*bx + 23*by + 5*p) % 256 —
    spectral-selection scans carry the same coefficients as baseline,
    so the constant-tile bit-exactness argument holds unchanged and
    the closed-form means pin the multi-scan coefficient
    accumulation."""
    from .jpeg import encode_jpeg

    rows = []
    for i in range(n):
        bw, bh = 2 + i % 3, 1 + i % 2
        tiles = (
            17 * np.arange(bw)[None, :] + 29 * np.arange(bh)[:, None]
            + 11 * i
        ) % 256
        img = np.kron(tiles, np.ones((8, 8))).astype(np.uint8)
        blob = encode_jpeg(
            img, quant="flat", restart_interval=2 if i % 2 else 0
        )
        rows.append(
            (
                i, "image", blob,
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        )
    for j in range(n_420):
        bw, bh = 1 + j % 3, 1 + j % 2
        tiles = (
            13 * np.arange(bw)[None, :] + 31 * np.arange(bh)[:, None]
            + 7 * j
        ) % 256
        img = np.kron(
            tiles[..., None], np.ones((16, 16, 3))
        ).astype(np.uint8)
        blob = encode_jpeg(
            img, quant="flat", subsample="420",
            restart_interval=2 if j % 2 else 0,
        )
        rows.append(
            (
                n + j, "image", blob,
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        )
    for p in range(n_prog):
        bw, bh = 1 + p % 2, 2 - p % 2
        tiles = (
            19 * np.arange(bw)[None, :] + 23 * np.arange(bh)[:, None]
            + 5 * p
        ) % 256
        img = np.kron(tiles, np.ones((8, 8))).astype(np.uint8)
        blob = encode_jpeg(img, quant="flat", progressive=True)
        rows.append(
            (
                n + n_420 + p, "image", blob,
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def tile_gif_media(
    spark: SparkSession, n: int = 5, n_anim: int = 0
) -> DataFrame:
    """Media table of REAL GIFs with closed-form pixel values (GIF is
    LOSSLESS, so unlike JPEG no DCT argument is needed — any <=256-
    color image round-trips byte-exact): still i is (1 + i%3) x
    (2 - i%2) constant 8x8 tiles with R=G=B = (11*bx + 17*by + 13*i)
    % 256, every second one INTERLACED (the four-pass row order must
    decode identically); animated clip j (media_id n..) has 2 + j
    frames of one (2 x 1)-tile image whose value shifts by 31 per
    frame — per-frame means are closed-form for video_stats."""
    from .gif import encode_gif

    rows = []
    for i in range(n):
        bw, bh = 1 + i % 3, 2 - i % 2
        tiles = (
            11 * np.arange(bw)[None, :] + 17 * np.arange(bh)[:, None]
            + 13 * i
        ) % 256
        img = np.kron(
            tiles[..., None], np.ones((8, 8, 3))
        ).astype(np.uint8)
        blob = encode_gif(img, interlace=bool(i % 2))
        rows.append(
            (
                i, "image", blob,
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        )
    for j in range(n_anim):
        frames = []
        for f in range(2 + j):
            tiles = (
                np.array([[7 * j], [19 + 7 * j]]) + 31 * f
            ) % 256
            frames.append(
                np.kron(
                    tiles[..., None], np.ones((8, 8, 3))
                ).astype(np.uint8)
            )
        blob = encode_gif(np.stack(frames), delay_cs=5)
        rows.append(
            (
                n + j, "video", blob,
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --- REAL stdlib BMP (Windows DIB) codec -----------------------------------
#
# BMP is the AVI frame payload with a file header in front: the same
# 24-bit BI_RGB bottom-up BGR rows with 4-byte stride that decode_avi
# already walks.  Lossless, so fixtures pin byte-exact round-trips.


def encode_bmp(img: np.ndarray) -> bytes:
    """Spec-correct BMP encoder (stdlib struct only) for (h, w, 3)
    uint8 RGB arrays: BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER +
    bottom-up BGR rows padded to 4-byte stride (BI_RGB, 24-bit)."""
    import struct

    h, w, _ = img.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = b""
    for r in range(h - 1, -1, -1):  # bottom-up
        bgr = img[r, :, ::-1].tobytes()
        rows += bgr + b"\x00" * (stride - len(bgr))
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + stride * h, 0, 0, off)
    return hdr + info + rows


def decode_bmp(blob: bytes) -> np.ndarray:
    """Spec-correct BMP decoder (stdlib struct only): BI_RGB 24-bit
    only (raises loudly otherwise), honours the pixel-data offset,
    bottom-up AND top-down (negative height) row orders, 4-byte
    stride.  Returns (h, w, 3) uint8 RGB."""
    import struct

    if blob[:2] != b"BM" or len(blob) < 54:
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack("<I", blob[10:14])
    hdr_size, w, h_signed = struct.unpack("<Iii", blob[14:26])
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs not supported")
    bits, comp = struct.unpack("<HI", blob[28:34])
    if comp != 0 or bits != 24:
        raise ValueError(
            f"unsupported BMP (compression={comp}, bits={bits}); "
            "decoder handles BI_RGB 24-bit only"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    stride = ((w * 3 + 3) // 4) * 4
    raw = blob[off:off + stride * h]
    if len(raw) != stride * h:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    bgr = (rows if top_down else rows[::-1])[:, : w * 3].reshape(h, w, 3)
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def gradient_tiff_media(spark: SparkSession, n: int = 8) -> DataFrame:
    """Media table of REAL baseline TIFFs with closed-form pixel
    values (TIFF is LOSSLESS — exact round-trip, exact oracle).
    Image i is (3+i) rows x (4+i) cols.  Even i: RGB with R=x, G=y,
    B=x+y (means (w-1)/2, (h-1)/2, (w+h-2)/2 over 255 — the
    gradient_png_media construction).  Odd i: grayscale
    v = (3x + 7y + 11i) % 256, every second odd image stored
    WhiteIsZero (photometric 0 — a decoder ignoring the inversion
    hash-mismatches).  The encoding matrix sweeps what the decoder
    must handle: PackBits vs none, big vs little endian, 2-row
    strips vs single-strip."""
    from .tiff import encode_tiff

    rows = []
    for i in range(n):
        w, h = 4 + i, 3 + i
        if i % 2 == 0:
            x = np.arange(w, dtype=np.uint8)[None, :, None]
            y = np.arange(h, dtype=np.uint8)[:, None, None]
            arr = np.concatenate(
                [
                    np.broadcast_to(x, (h, w, 1)),
                    np.broadcast_to(y, (h, w, 1)),
                    (x + y).astype(np.uint8),
                ],
                axis=2,
            )
            pm = None
        else:
            xx = np.arange(w, dtype=np.int64)[None, :]
            yy = np.arange(h, dtype=np.int64)[:, None]
            arr = ((3 * xx + 7 * yy + 11 * i) % 256).astype(np.uint8)
            pm = 0 if i % 4 == 3 else 1
        blob = encode_tiff(
            np.ascontiguousarray(arr),
            compression="packbits" if i % 4 < 2 else "none",
            big_endian=(i % 3 == 0),
            rows_per_strip=2 if i % 2 == 0 else None,
            photometric=pm,
        )
        rows.append(
            (
                i, "image", blob,
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def tile_bmp_media(spark: SparkSession, n: int = 6) -> DataFrame:
    """Media table of REAL BMPs with closed-form pixel values (BMP is
    LOSSLESS — byte-exact round-trip, no DCT argument): image i is
    (1 + i%3) x (2 - i%2) constant 8x8 tiles with R=G=B =
    (7*bx + 23*by + 29*i) % 256; every second one is written TOP-DOWN
    (negative height) so both row orders decode identically."""
    rows = []
    for i in range(n):
        bw, bh = 1 + i % 3, 2 - i % 2
        tiles = (
            7 * np.arange(bw)[None, :] + 23 * np.arange(bh)[:, None]
            + 29 * i
        ) % 256
        img = np.kron(
            tiles[..., None], np.ones((8, 8, 3))
        ).astype(np.uint8)
        blob = encode_bmp(img)
        if i % 2:  # rewrite as top-down: negate height, reorder rows
            import struct

            stride = ((img.shape[1] * 3 + 3) // 4) * 4
            h = img.shape[0]
            off = 54
            body = blob[off:]
            flipped = b"".join(
                body[(h - 1 - r) * stride:(h - r) * stride]
                for r in range(h)
            )
            blob = (
                blob[:22]
                + struct.pack("<i", -h)
                + blob[26:off]
                + flipped
            )
        rows.append(
            (
                i, "image", blob,
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --- REAL stdlib RIFF/WAVE PCM16 codec ------------------------------------
#
# Audio decode does NOT need torchaudio for PCM WAV: the container is a
# RIFF chunk walk and the payload is interleaved little-endian int16.
# The encoder/decoder pair below implements the spec for PCM16 (any
# channel count / sample rate), raising loudly on compressed formats —
# with this, the only remaining stub codec is video (PyAV territory).


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Spec-correct RIFF/WAVE PCM16 encoder (stdlib struct only) for
    int16 (n_samples, n_channels) arrays.  Channels are interleaved
    little-endian per the spec; a decorative LIST/INFO chunk is placed
    before ``data`` so a decoder can't pass by assuming ``data``
    directly follows ``fmt `` — it must genuinely walk chunks."""
    import struct

    if samples.dtype != np.int16 or samples.ndim != 2:
        raise ValueError("encode_wav expects int16 (n_samples, n_channels)")
    n, ch = samples.shape
    payload = samples.astype("<i2").tobytes()  # row-major == interleaved
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate,
        sample_rate * ch * 2, ch * 2, 16,
    )
    info = b"INFOISFT" + struct.pack("<I", 6) + b"artis\x00"
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    if len(payload) % 2:  # chunks are word-aligned per RIFF
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_g711(
    codes: np.ndarray, sample_rate: int, law: str
) -> bytes:
    """RIFF/WAVE container around RAW G.711 codes (uint8
    (n_samples, n_channels) interleaved) — format tag 6 (A-law) or 7
    (µ-law), 8 bits per sample.  The fixture stores the code bytes
    directly, so decode output is exactly the expansion table at
    those codes (what the closed-form oracle pins)."""
    import struct

    if codes.dtype != np.uint8 or codes.ndim != 2:
        raise ValueError(
            "encode_wav_g711 expects uint8 (n_samples, n_channels)"
        )
    tag = {"alaw": 6, "mulaw": 7}[law]
    n, ch = codes.shape
    payload = codes.tobytes()
    fmt = struct.pack(
        "<HHIIHH", tag, ch, sample_rate,
        sample_rate * ch, ch, 8,
    )
    info = b"INFOISFT" + struct.pack("<I", 6) + b"artis\x00"
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    if len(payload) % 2:
        chunks += b"\x00"
    return (
        b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
        + chunks
    )


def g711_wav_media(spark: SparkSession, n: int = 6) -> DataFrame:
    """Media table of REAL G.711 telephony clips with closed-form
    code bytes: clip i is µ-law for even i, A-law for odd, 1+(i%2)
    channels, 64+8i samples at 8000 Hz, code byte
    c[t, ch] = (37*t + 11*i + 5*ch) % 256.  Decoded samples are
    exactly the expansion table at those codes — the q_audio_g711
    oracle replays the ITU decode arithmetic in SQL."""
    rows = []
    for i in range(n):
        n_samp = 64 + 8 * i
        ch = 1 + (i % 2)
        t = np.arange(n_samp, dtype=np.int64)[:, None]
        c = np.arange(ch, dtype=np.int64)[None, :]
        codes = ((37 * t + 11 * i + 5 * c) % 256).astype(np.uint8)
        rows.append(
            (
                i, "audio",
                encode_wav_g711(
                    codes, 8000, "mulaw" if i % 2 == 0 else "alaw"
                ),
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Spec-correct RIFF/WAVE PCM16 decoder (stdlib struct only): chunk
    walk → fmt parse → de-interleave ``data`` into int16
    (n_samples, n_channels); returns (samples, sample_rate).  Raises
    loudly on compressed/float formats rather than guessing."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        (length,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + length + (length % 2)  # word alignment
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_fmt, ch, sr, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt == 1 and bits == 16:
        flat = np.frombuffer(data, dtype="<i2")
    elif audio_fmt in (6, 7) and bits == 8:
        # G.711 A-law (6) / µ-law (7) — the telephony/voice formats
        # (r14): one table lookup per byte, ITU-T G.711 reference
        # expansion (the audioop-compatible 16-bit scaling)
        table = (
            _ALAW_TABLE if audio_fmt == 6 else _MULAW_TABLE
        )
        flat = table[np.frombuffer(data, dtype=np.uint8)]
    elif audio_fmt == 0x11 and bits == 4:
        # IMA/DVI ADPCM (r14): 4-bit nibbles, per-block state — the
        # classic 4:1 voice compression (dictation, game audio, VoIP
        # archives).  block_align comes from the fmt chunk.
        (block_align,) = struct.unpack("<H", fmt[12:14])
        return _decode_ima_adpcm(data, ch, block_align), sr
    else:
        raise ValueError(
            f"unsupported WAVE (format={audio_fmt}, bits={bits}); "
            "decoder handles PCM16, 8-bit G.711 A-law/µ-law, and "
            "4-bit IMA ADPCM"
        )
    n = flat.size // ch
    return flat[: n * ch].reshape(n, ch), sr


def _build_g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """256-entry expansion tables from the ITU-T G.711 reference
    decode arithmetic (CCITT ulaw2lin/alaw2lin, 16-bit scaling):
    µ-law: u = ~b; t = ((u & 0xF) << 3) + 0x84, shifted by the
    segment; sign bit (on the complemented byte) negates via
    0x84 - t.  A-law: a = b ^ 0x55; t = (a & 0xF) << 4 plus the
    segment offset/shift; sign bit set means POSITIVE."""
    mu = np.empty(256, dtype=np.int16)
    al = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        mu[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        al[b] = t if (a & 0x80) else -t
    return al, mu


_ALAW_TABLE, _MULAW_TABLE = _build_g711_tables()

# --- IMA/DVI ADPCM (r14) ----------------------------------------------------
# Step-size and index-adjust tables from the public IMA ADPCM
# reference algorithm (IMA Digital Audio Focus and Technical Working
# Groups, "Recommended Practices for Enhancing Digital Audio
# Compatibility", rev 3.00 — the same tables every RIFF fmt-0x11
# implementation shares).

_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int64)

_IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int64
)


def _decode_ima_adpcm(
    data: bytes, ch: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM → int16 (n_samples, n_channels).

    RIFF fmt-0x11 block layout: per channel a 4-byte header (int16
    initial predictor — emitted as sample 0 — uint8 step index,
    reserved), then 4-byte chunks round-robined across channels, each
    holding 8 nibbles (low nibble first).  The nibble recurrence is
    sequential WITHIN a channel, but blocks and channels are
    independent — so the loop below runs once per nibble POSITION,
    vectorized across every (block, channel) pair: O(samples/block)
    numpy steps, not O(samples) Python steps."""
    ba = int(block_align)
    if ba < 4 * ch or (ba - 4 * ch) % (4 * ch):
        raise ValueError(f"bad IMA ADPCM block_align {ba} for {ch}ch")
    n_blocks = len(data) // ba
    if n_blocks == 0:
        return np.zeros((0, ch), dtype=np.int16)
    raw = np.frombuffer(
        data[: n_blocks * ba], dtype=np.uint8
    ).reshape(n_blocks, ba)
    hdr = raw[:, : 4 * ch].reshape(n_blocks, ch, 4)
    pred = (
        hdr[:, :, 0].astype(np.int64)
        | (hdr[:, :, 1].astype(np.int8).astype(np.int64) << 8)
    )
    index = np.clip(hdr[:, :, 2].astype(np.int64), 0, 88)
    n_groups = (ba - 4 * ch) // (4 * ch)
    body = raw[:, 4 * ch:].reshape(n_blocks, n_groups, ch, 4)
    nibbles = np.empty((n_blocks, n_groups, ch, 8), dtype=np.int64)
    nibbles[..., 0::2] = body & 0x0F
    nibbles[..., 1::2] = body >> 4
    # → (n_blocks, ch, samples-after-header)
    nibbles = nibbles.transpose(0, 2, 1, 3).reshape(
        n_blocks, ch, n_groups * 8
    )
    spb = n_groups * 8 + 1
    out = np.empty((n_blocks, spb, ch), dtype=np.int16)
    out[:, 0, :] = pred.astype(np.int16)
    for t in range(n_groups * 8):
        code = nibbles[:, :, t]
        step = _IMA_STEP_TABLE[index]
        diff = step >> 3
        diff = diff + np.where(code & 1, step >> 2, 0)
        diff = diff + np.where(code & 2, step >> 1, 0)
        diff = diff + np.where(code & 4, step, 0)
        pred = np.clip(
            np.where(code & 8, pred - diff, pred + diff),
            -32768, 32767,
        )
        index = np.clip(index + _IMA_INDEX_TABLE[code], 0, 88)
        out[:, t + 1, :] = pred.astype(np.int16)
    return out.reshape(n_blocks * spb, ch)


def encode_wav_ima_raw(
    nibbles: np.ndarray,
    predictors: np.ndarray,
    indices: np.ndarray,
    sample_rate: int,
) -> bytes:
    """RIFF/WAVE fmt-0x11 container around RAW IMA nibble codes for
    ONE block — the fixture writer (codes chosen deterministically,
    decode output closed-form replayable).  ``nibbles`` is
    (n_channels, 8*k) uint8 in 0..15; ``predictors``/``indices`` are
    per-channel initial state."""
    import struct

    ch, n_nib = nibbles.shape
    if n_nib % 8:
        raise ValueError("IMA nibble count must be a multiple of 8")
    block = bytearray()
    for c in range(ch):
        block += struct.pack(
            "<hBB", int(predictors[c]), int(indices[c]), 0
        )
    for g in range(n_nib // 8):
        for c in range(ch):
            grp = nibbles[c, 8 * g : 8 * g + 8]
            for k in range(4):
                block.append(
                    int(grp[2 * k]) | (int(grp[2 * k + 1]) << 4)
                )
    block_align = len(block)
    spb = n_nib + 1
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, ch, sample_rate,
        sample_rate * block_align // spb, block_align, 4, 2, spb,
    )
    data = bytes(block)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def ima_wav_media(spark: SparkSession, n: int = 6) -> DataFrame:
    """Media table of REAL IMA-ADPCM clips with deterministic codes:
    clip i has 1 + (i % 2) channels, 8*(2+i) nibbles per channel
    (so 17+8i samples), initial predictor 1000*i - 3000 + 500*c,
    initial index (7*i + 11*c) % 89, and nibble t =
    (13*t + 7*i + 3*c) % 16 — the q_audio_adpcm oracle replays the
    reference recurrence over exactly these codes."""
    rows = []
    for i in range(n):
        ch = 1 + (i % 2)
        n_nib = 8 * (2 + i)
        nibbles = np.array(
            [[(13 * t + 7 * i + 3 * c) % 16 for t in range(n_nib)]
             for c in range(ch)],
            dtype=np.uint8,
        )
        preds = np.array(
            [1000 * i - 3000 + 500 * c for c in range(ch)]
        )
        idxs = np.array([(7 * i + 11 * c) % 89 for c in range(ch)])
        rows.append(
            (i, bytearray(
                encode_wav_ima_raw(nibbles, preds, idxs, 8000)
            ))
        )
    return spark.createDataFrame(
        rows, "media_id long, content binary"
    )


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("channel", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("rms_amp", T.DoubleType()),
        T.StructField("peak_amp", T.LongType()),
    ]
)


def _decode_audio_any(blob: bytes):
    """Container dispatch for audio: FLAC via the RFC 9639 codec
    (r14, operators/flac.py — MD5-verified lossless decode), anything
    RIFF/WAVE via decode_wav (PCM16, G.711, IMA ADPCM)."""
    if blob[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(blob)
    return decode_wav(blob)


def ramp_flac_media(spark: SparkSession, n: int = 8) -> DataFrame:
    """FLAC twin of ramp_wav_media: clip i carries the SAME closed-form
    samples (s[t] = t + 100*channel, 64+8i samples, 8000+500i Hz,
    1 + (i%2) channels) LOSSLESSLY compressed — stereo clips use
    mid/side decorrelation, block_size 64 forces multi-frame streams,
    and STREAMINFO carries the real MD5 the decoder must reproduce."""
    from .flac import encode_flac

    rows = []
    for i in range(n):
        sr = 8000 + 500 * i
        n_samp = 64 + 8 * i
        ch = 1 + (i % 2)
        samples = np.array(
            [[t + 100 * c for c in range(ch)] for t in range(n_samp)],
            dtype=np.int16,
        )
        rows.append(
            (i, bytearray(
                encode_flac(samples, sr, block_size=64,
                            mid_side=(ch == 2))
            ))
        )
    return spark.createDataFrame(
        rows, "media_id long, content binary"
    )


def audio_stats(media: DataFrame, round_digits: int = 6) -> DataFrame:
    """REAL sample-level feature extraction for PCM-WAV rows: decode via
    the stdlib codec inside Arrow-batched mapInPandas, emit one row per
    (media_id, channel) with duration and per-channel mean/RMS/peak
    amplitude.  The binary column is dropped in the output — only
    compact stats reach any shuffle (same contract as image_stats)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                samples, sr = _decode_audio_any(bytes(blob))
                n, ch = samples.shape
                s = samples.astype(np.float64)
                for c in range(ch):
                    col = s[:, c]
                    recs.append(
                        (
                            mid, c, sr, n,
                            _round_half_up(n / sr, round_digits),
                            _round_half_up(float(col.mean()), round_digits),
                            _round_half_up(
                                float(np.sqrt(np.mean(col * col))),
                                round_digits,
                            ),
                            int(np.abs(col).max()) if n else 0,
                        )
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "channel", "sample_rate", "n_samples",
                    "duration_s", "mean_amp", "rms_amp", "peak_amp",
                ],
            )

    return media.mapInPandas(_stats, AUDIO_STATS_SCHEMA)


def ramp_wav_media(spark: SparkSession, n: int = 8) -> DataFrame:
    """Media table of REAL decodable PCM16 WAVs with closed-form sample
    values: clip i has sample_rate 8000+500i, 64+8i samples, and
    1 + (i % 2) channels whose samples are s[t] = t + 100*channel.
    Closed forms (what the q_audio_features oracle pins, a = 100*ch):
    mean = (n-1)/2 + a, peak = n-1+a, and the mean square is the exact
    integer (n(n-1)(2n-1)/6 + a*n*(n-1) + n*a²)/n — both engines do the
    same single correctly-rounded division, so rms matches to the bit.
    Half the clips are stereo, so a decoder that mis-interleaves
    channels (or drops the LIST chunk walk) breaks the hash match."""
    rows = []
    for i in range(n):
        sr = 8000 + 500 * i
        n_samp = 64 + 8 * i
        ch = 1 + (i % 2)
        t = np.arange(n_samp, dtype=np.int16)[:, None]
        offs = (100 * np.arange(ch, dtype=np.int16))[None, :]
        samples = (t + offs).astype(np.int16)
        rows.append(
            (
                i, "audio", encode_wav(samples, sr),
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": sr},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --- REAL stdlib RIFF-AVI uncompressed-video codec ------------------------
#
# Video decode does NOT need PyAV for uncompressed AVI: the container is
# the same RIFF chunk walk as WAVE ('hdrl' metadata LIST + 'movi' frame
# LIST), and BI_RGB 24-bit frames are plain DIB bitmaps — bottom-up row
# order, BGR channel order, rows padded to 4-byte boundaries.  The
# encoder/decoder pair below implements that spec; compressed fourccs
# raise loudly (THOSE genuinely need PyAV).  With this, every media
# kind has a real byte-level decode path and ``_decode_stub`` is only
# the fallback for container-less or compressed payloads.


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Spec-correct RIFF-AVI encoder (stdlib struct only) for uint8
    (n_frames, h, w, 3) RGB arrays as uncompressed BI_RGB video: each
    frame is a '00db' DIB chunk — BOTTOM-UP rows, BGR order, rows
    padded to 4 bytes — inside the 'movi' LIST, with 'avih'/'strh'/
    'strf' metadata carrying dims, frame count, and fps (rate/scale)."""
    import struct

    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_avi expects uint8 (n_frames, h, w, 3)")
    n, h, w, _ = frames.shape
    stride = ((w * 3 + 3) // 4) * 4
    frame_chunks = b""
    for f in range(n):
        rows = b""
        for r in range(h - 1, -1, -1):  # bottom-up
            bgr = frames[f, r, :, ::-1].tobytes()  # BGR
            rows += bgr + b"\x00" * (stride - len(bgr))
        frame_chunks += b"00db" + struct.pack("<I", len(rows)) + rows

    def chunk(tag: bytes, data: bytes) -> bytes:
        return tag + struct.pack("<I", len(data)) + data

    def lst(kind: bytes, data: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(data)) + kind + data

    avih = struct.pack(
        "<14I",
        1_000_000 // fps, 0, 0, 0, n, 0, 1, stride * h, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
        stride * h, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", frame_chunks)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(blob: bytes) -> tuple[np.ndarray, int]:
    """Spec-correct RIFF-AVI decoder (stdlib struct only): chunk walk
    (recursing into LISTs) → avih/strh/strf parse → '00db' DIB frames
    de-padded, row-flipped, BGR→RGB; returns (frames (n, h, w, 3)
    uint8, fps).  Raises loudly on compressed streams (BI_RGB only)."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    meta: dict = {}
    frames_raw: list[bytes] = []

    def walk(buf: bytes) -> None:
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos:pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body = buf[pos + 8:pos + 8 + length]
            if tag == b"LIST":
                walk(body[4:])  # skip the list-kind fourcc
            elif tag == b"avih":
                vals = struct.unpack("<14I", body[:56])
                meta["w"], meta["h"] = vals[8], vals[9]
            elif tag == b"strh":
                t, handler = struct.unpack("<4s4s", body[:8])
                if t == b"vids":
                    scale, rate = struct.unpack("<II", body[20:28])
                    meta["fps"] = rate // max(scale, 1)
            elif tag == b"strf":
                comp = struct.unpack("<I", body[16:20])[0]
                bits = struct.unpack("<H", body[14:16])[0]
                if comp != 0 or bits != 24:
                    raise ValueError(
                        f"unsupported AVI (compression={comp}, "
                        f"bits={bits}); decoder handles BI_RGB 24-bit only"
                    )
            elif tag == b"00db":
                frames_raw.append(body)
            pos += 8 + length + (length % 2)  # word alignment

    walk(blob[12:])
    if "w" not in meta or not frames_raw:
        raise ValueError("AVI missing avih header or frame chunks")
    w, h = meta["w"], meta["h"]
    stride = ((w * 3 + 3) // 4) * 4
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) != stride * h:
            raise ValueError("AVI frame chunk has wrong length")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
        bgr = rows[::-1, : w * 3].reshape(h, w, 3)  # un-flip bottom-up
        out[i] = bgr[:, :, ::-1]  # BGR -> RGB
    return out, meta.get("fps", 0)


VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def video_stats(
    media: DataFrame, every_n: int = 1, round_digits: int = 6
) -> DataFrame:
    """REAL frame-level feature extraction for uncompressed-AVI rows:
    decode via the stdlib codec inside Arrow-batched mapInPandas, emit
    one row per sampled frame (every ``every_n``-th) with normalized
    channel means — the video analogue of image_stats.  The binary
    column is dropped in the output; exploding frames to compact stat
    rows BEFORE any shuffle is the same move sample_frames makes."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if blob[:6] in (b"GIF87a", b"GIF89a"):  # animated GIF
                    from .gif import decode_gif

                    frames = decode_gif(blob)
                else:
                    frames, _ = decode_avi(blob)
                n, h, w, _c = frames.shape
                for fi in range(0, n, every_n):
                    # exact integer channel sums, then ONE division by
                    # (n_px * 255): a single correctly-rounded f64 op,
                    # so the value is bit-identical to the oracle's
                    # closed-form single division
                    sums = (
                        frames[fi].astype(np.int64).reshape(-1, 3).sum(0)
                    )
                    means = sums.astype(np.float64) / (h * w * 255.0)
                    recs.append(
                        (
                            mid, fi, w, h,
                            _round_half_up(float(means[0]), round_digits),
                            _round_half_up(float(means[1]), round_digits),
                            _round_half_up(float(means[2]), round_digits),
                        )
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return media.mapInPandas(_stats, VIDEO_STATS_SCHEMA)


def gradient_avi_media(spark: SparkSession, n: int = 6) -> DataFrame:
    """Media table of REAL decodable AVIs with closed-form pixel values:
    clip i is 2+i frames of (3+i) rows × (4+i) cols with R=x, G=y,
    B=x+y+f (all < 256), so frame f's channel means are (w-1)/2,
    (h-1)/2, (w+h-2)/2 + f by construction — what the q_video_features
    oracle pins.  Odd widths force non-zero row padding, so a decoder
    that ignores the 4-byte stride or the bottom-up/BGR conventions
    breaks the hash match."""
    rows = []
    for i in range(n):
        w, h, nf = 4 + i, 3 + i, 2 + i
        x = np.arange(w, dtype=np.uint16)[None, :, None]
        y = np.arange(h, dtype=np.uint16)[:, None, None]
        frames = np.stack(
            [
                np.concatenate(
                    [
                        np.broadcast_to(x, (h, w, 1)),
                        np.broadcast_to(y, (h, w, 1)),
                        x + y + f,
                    ],
                    axis=2,
                ).astype(np.uint8)
                for f in range(nf)
            ]
        )
        rows.append(
            (
                i, "video", encode_avi(frames, fps=10),
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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


# ---------------------------------------------------------------------------
# Perceptual image dedup: dHash (difference hash) over the REAL decode
# path, banded for linear-blocking candidate generation — the image
# analogue of the text MinHash/SimHash near-dup family.
# ---------------------------------------------------------------------------

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash_lo", T.LongType()),
        T.StructField("dhash_hi", T.LongType()),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """64-bit dHash per image: decode (stdlib codecs), integer
    nearest-neighbor downsample to 9x8, integer grayscale
    (r+g+b)//3, bit (x,y) = gray[y][x+1] > gray[y][x].  Emitted as two
    32-bit halves (rows 0-3 -> dhash_lo, rows 4-7 -> dhash_hi) so both
    engines stay in non-negative BIGINT territory — no sign-bit games.

    dHash is brightness-shift invariant (a constant offset cancels in
    every adjacent-pixel comparison), which is exactly the perceptual
    property that catches re-encoded / re-exposed copies exact-byte
    dedup misses.  Corrupt payloads yield a null-hash row, never a job
    failure.  Binary never reaches a shuffle — only (id, 2 ints) do."""

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    arr = _decode_image_any(bytes(blob)).astype(np.int64)
                except Exception:
                    recs.append((mid, None, None))
                    continue
                h, w = arr.shape[:2]
                ys = (np.arange(8, dtype=np.int64) * h) // 8
                xs = (np.arange(9, dtype=np.int64) * w) // 9
                gray = arr[ys][:, xs, :3].sum(axis=2) // 3
                bits = (gray[:, 1:] > gray[:, :-1]).astype(np.int64)
                lo = hi = 0
                for y in range(4):
                    for x in range(8):
                        lo |= int(bits[y, x]) << (y * 8 + x)
                for y in range(4, 8):
                    for x in range(8):
                        hi |= int(bits[y, x]) << ((y - 4) * 8 + x)
                recs.append((mid, lo, hi))
            yield pd.DataFrame(
                recs, columns=["media_id", "dhash_lo", "dhash_hi"]
            )

    return media.mapInPandas(_sig, DHASH_SCHEMA)


def dhash_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidate pairs from dHash signatures via 4x16-bit
    banding (pigeonhole: any pair within ``max_hamming`` <= 3 bit flips
    shares at least one intact band) — linear blocking, never an
    all-pairs image join.  Returns (media_id_a, media_id_b, hamming)."""
    bands = sig.select(
        "media_id",
        "dhash_lo",
        "dhash_hi",
        F.posexplode(
            F.array(
                F.col("dhash_lo").bitwiseAND(F.lit(0xFFFF)),
                F.shiftright("dhash_lo", 16).bitwiseAND(F.lit(0xFFFF)),
                F.col("dhash_hi").bitwiseAND(F.lit(0xFFFF)),
                F.shiftright("dhash_hi", 16).bitwiseAND(F.lit(0xFFFF)),
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(
        F.col("a.dhash_lo").bitwiseXOR(F.col("b.dhash_lo"))
    ) + F.bit_count(F.col("a.dhash_hi").bitwiseXOR(F.col("b.dhash_hi")))
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
            ham.cast("bigint").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dhash_png_media(
    spark: SparkSession, families: int = 4, variants: int = 3
) -> DataFrame:
    """Fixture families of REAL 9x8 PNGs with closed-form dHash: family
    f's base pattern is p(x,y) = 60 + 20*((x*7 + y*11 + f*13) % 5 < 2)
    (R=G=B=p so integer grayscale == p; multipliers chosen so every
    family pair is >=25 hamming apart — measured, not hoped); variant v adds a +4v global
    brightness shift (dHash-invariant by construction) and variant 2
    additionally bumps ONLY cell (1 + (f==2), 2) by +30 — a low-valued
    cell in every family (the mod-5 pattern has no cell low in all
    four, hence the family-dependent x), flipping 1-2 of the
    comparisons that touch it: a genuine near-duplicate, hamming<=2.
    media_id = f*variants + v."""
    rows = []
    for f in range(families):
        for v in range(variants):
            arr = np.zeros((8, 9, 3), dtype=np.uint8)
            for y in range(8):
                for x in range(9):
                    p = 60 + 20 * ((x * 7 + y * 11 + f * 13) % 5 < 2) + 4 * v
                    if v == 2 and x == 1 + (f == 2) and y == 2:
                        p += 30
                    arr[y, x, :] = p
            rows.append(
                (
                    f * variants + v,
                    "image",
                    encode_png(np.ascontiguousarray(arr)),
                    {"width": None, "height": None, "n_frames": None,
                     "sample_rate": None},
                )
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
