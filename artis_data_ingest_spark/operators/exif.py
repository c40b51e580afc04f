"""EXIF (APP1/TIFF) metadata: a real stdlib writer + parser for the
tags a scraped-image pipeline actually routes on — Make, Model,
Orientation, DateTime — plus the Spark plumbing to extract them from a
binary column without the bytes ever crossing a shuffle.

Writer: a minimal but spec-correct TIFF IFD0 (II byte order, magic 42,
out-of-line ASCII values) wrapped in the JPEG APP1 marker, injected
right after SOI — exactly where camera firmware puts it.  Parser:
walks JPEG segments to the Exif APP1, honors BOTH byte orders (II/MM),
and reads the four tags from IFD0; malformed or absent EXIF yields
nulls, never an exception (the corrupt-tolerance contract of
operators/multimodal.py).

Reference provenance: the reference pipeline scrapes binary artifacts
and records per-file metadata (assess_changes.qmd:107-112 file sizes);
EXIF is the per-IMAGE metadata layer of the same idea.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_EXIF_HEADER = b"Exif\x00\x00"
_TAGS = {0x010F: "make", 0x0110: "model", 0x0112: "orientation",
         0x0132: "datetime"}


def build_exif_app1(
    make: str, model: str, orientation: int, datetime_str: str
) -> bytes:
    """Serialize the four tags as a little-endian TIFF IFD0 inside an
    Exif APP1 payload (marker + length NOT included)."""
    entries = []
    extra = b""
    # value area begins after: 8 (TIFF header) + 2 (count) + 4*12 + 4
    val_base = 8 + 2 + 4 * 12 + 4

    def ascii_entry(tag: int, s: str) -> None:
        nonlocal extra
        data = s.encode("ascii") + b"\x00"
        if len(data) <= 4:
            entries.append(
                struct.pack("<HHI4s", tag, 2, len(data), data.ljust(4, b"\x00"))
            )
        else:
            entries.append(
                struct.pack("<HHII", tag, 2, len(data), val_base + len(extra))
            )
            extra += data

    ascii_entry(0x010F, make)
    ascii_entry(0x0110, model)
    entries.append(struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0))
    ascii_entry(0x0132, datetime_str)
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)
        + struct.pack("<H", len(entries))
        + b"".join(entries)
        + struct.pack("<I", 0)  # no next IFD
        + extra
    )
    return _EXIF_HEADER + tiff


def inject_app1(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Insert an APP1 segment immediately after SOI."""
    assert jpeg[:2] == b"\xff\xd8"
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_payload) + 2) + app1_payload
    return jpeg[:2] + seg + jpeg[2:]


def parse_exif(jpeg: bytes) -> dict:
    """Extract (make, model, orientation, datetime) from the first
    Exif APP1; missing/malformed → all-None dict."""
    out = {v: None for v in _TAGS.values()}
    try:
        if jpeg[:2] != b"\xff\xd8":
            return out
        pos = 2
        payload = None
        while pos + 4 <= len(jpeg):
            if jpeg[pos] != 0xFF:
                break
            marker = jpeg[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (ln,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
            body = jpeg[pos + 4 : pos + 2 + ln]
            if marker == 0xE1 and body[: len(_EXIF_HEADER)] == _EXIF_HEADER:
                payload = body[len(_EXIF_HEADER) :]
                break
            if marker == 0xDA:
                break
            pos += 2 + ln
        if payload is None:
            return out
        bo = payload[:2]
        end = "<" if bo == b"II" else ">" if bo == b"MM" else None
        if end is None:
            return out
        (magic, ifd0) = struct.unpack(end + "HI", payload[2:8])
        if magic != 42:
            return out
        (count,) = struct.unpack(end + "H", payload[ifd0 : ifd0 + 2])
        for k in range(count):
            off = ifd0 + 2 + 12 * k
            tag, typ, n = struct.unpack(
                end + "HHI", payload[off : off + 8]
            )
            if tag not in _TAGS:
                continue
            raw = payload[off + 8 : off + 12]
            if typ == 2:  # ASCII
                if n <= 4:
                    data = raw[:n]
                else:
                    (voff,) = struct.unpack(end + "I", raw)
                    data = payload[voff : voff + n]
                out[_TAGS[tag]] = (
                    data.split(b"\x00", 1)[0].decode("ascii", "replace")
                )
            elif typ == 3:  # SHORT
                (v,) = struct.unpack(end + "H", raw[:2])
                out[_TAGS[tag]] = int(v)
    except Exception:
        return {v: None for v in _TAGS.values()}
    return out


_EXIF_SCHEMA = (
    "media_id bigint, make string, model string, orientation bigint,"
    " datetime string"
)


def exif_metadata(media: DataFrame) -> DataFrame:
    """(media_id, make, model, orientation, datetime) for a binary
    media frame — Arrow-batched mapInPandas, binary never shuffles."""

    def _extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                d = parse_exif(bytes(blob))
                recs.append(
                    (
                        int(mid),
                        d["make"],
                        d["model"],
                        d["orientation"],
                        d["datetime"],
                    )
                )
            out = pd.DataFrame(
                recs,
                columns=[
                    "media_id", "make", "model", "orientation", "datetime",
                ],
            )
            out["media_id"] = out["media_id"].astype("int64")
            out["orientation"] = out["orientation"].astype("Int64")
            yield out

    return media.select("media_id", "content").mapInPandas(
        _extract, _EXIF_SCHEMA
    )


#: EXIF orientation -> (transpose?, flip_h?, flip_v?) applied in the
#: order transpose, then flips — the 8 standard cases
_ORIENT_OPS = {
    1: (False, False, False),
    2: (False, True, False),
    3: (False, True, True),
    4: (False, False, True),
    5: (True, False, False),
    6: (True, True, False),
    7: (True, True, True),
    8: (True, False, True),
}


def normalized_image_stats(media: DataFrame) -> DataFrame:
    """Decode each JPEG, apply its EXIF orientation (so every output
    is upright), and report the normalized geometry + mean intensity:
    (media_id, orientation, width, height, mean_px).  Orientations
    5-8 transpose the axes; mean is rotation-invariant by
    construction, which the oracle pins."""
    import numpy as np

    from .jpeg import decode_jpeg

    def _norm(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                b = bytes(blob)
                meta = parse_exif(b)
                o = meta["orientation"] or 1
                arr = decode_jpeg(b)
                if arr.ndim == 3:
                    arr = arr.mean(axis=2)
                t, fh, fv = _ORIENT_OPS.get(o, (False, False, False))
                if t:
                    arr = arr.T
                if fh:
                    arr = arr[:, ::-1]
                if fv:
                    arr = arr[::-1, :]
                recs.append(
                    (
                        int(mid),
                        int(o),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        float(np.round(arr.mean() / 255.0, 6)),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "orientation", "width", "height", "mean_px",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        _norm,
        "media_id bigint, orientation bigint, width bigint,"
        " height bigint, mean_px double",
    )
