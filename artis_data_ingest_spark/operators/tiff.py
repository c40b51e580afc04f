"""Baseline TIFF codec (TIFF 6.0, Adobe 1992): a real stdlib
encoder + decoder for the uncompressed and PackBits revisions —
the scanned-document / legacy-scraped-asset payload class
(reference scope: the ingest pipeline's scraped XLSX/PDF assets,
assess_changes.qmd:1-40, extended to the image formats a
multimodal curation stack meets; r14, VERDICT r13 task 7).

Decoder: both byte orders (``II``/``MM``), IFD0 walk with inline
and offset-addressed values, multi-strip reassembly via
StripOffsets/StripByteCounts/RowsPerStrip, Compression 1 (none)
and 32773 (PackBits, TIFF §9), PhotometricInterpretation 0
(WhiteIsZero — inverted), 1 (BlackIsZero) and 2 (RGB), 8 bits per
sample.  EXIF already walks TIFF IFDs for metadata
(operators/exif.py); this module decodes the pixels.  Malformed
input raises ValueError — the shared ``image_stats`` dispatch
(operators/multimodal.py) converts that to a null-stats row, the
100 TB corrupt-tolerance contract.

Encoder: minimal but spec-correct — ascending tag order, inline
values left-justified per byte order, external value areas for
multi-SHORT BitsPerSample and strip tables, top-down strips.
Used by the closed-form fixtures ``q_tiff_features`` pins.

Like the PNG/JPEG/GIF/BMP codecs here, pure stdlib + numpy —
the Pillow swap path is the same mapInPandas plumbing
(operators/jpeg.py:35-39)."""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_COMP_NONE = 1
_COMP_PACKBITS = 32773


def packbits_encode(data: bytes) -> bytes:
    """TIFF §9 PackBits: runs of 2-128 identical bytes become
    (257-n, byte); literal spans of 1-128 become (n-1, bytes).
    Runs of two are only folded when not adjacent to literals
    (the spec's recommendation; any spec-valid stream decodes)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append((257 - run) & 0xFF)
            out.append(data[i])
            i = j
            continue
        # literal span: until the next run of >=3 (2-runs inside a
        # literal cost the same either way; 3+ always wins as a run)
        k = i + 1
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out.extend(data[i:k])
        i = k
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Inverse of :func:`packbits_encode`; tolerant of the no-op
    header (-128) and stops at ``expected`` output bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h == 128:  # -128: no-op
            continue
        if h < 128:  # literal of h+1 bytes
            if i + h + 1 > n:
                raise ValueError("PackBits literal overruns strip")
            out.extend(data[i:i + h + 1])
            i += h + 1
        else:  # run of 257-h copies of the next byte
            if i >= n:
                raise ValueError("PackBits run header at strip end")
            out.extend(bytes([data[i]]) * (257 - h))
            i += 1
    if len(out) < expected:
        raise ValueError(
            f"PackBits strip short: {len(out)} < {expected}"
        )
    return bytes(out[:expected])


def _pack_ifd(
    entries: list[tuple[int, int, list[int]]],
    ifd_offset: int,
    endian: str,
) -> tuple[bytes, bytes]:
    """Serialize IFD entries (tag, type, values); values too large
    for the inline 4 bytes go to an external area appended after the
    IFD.  Returns (ifd bytes, external value area bytes)."""
    fmt = {3: "H", 4: "I"}
    ext = bytearray()
    ext_base = ifd_offset + 2 + 12 * len(entries) + 4
    body = bytearray(struct.pack(endian + "H", len(entries)))
    for tag, typ, values in sorted(entries):
        size = _TYPE_SIZES[typ] * len(values)
        packed = b"".join(
            struct.pack(endian + fmt[typ], v) for v in values
        )
        body += struct.pack(endian + "HHI", tag, typ, len(values))
        if size <= 4:
            body += packed + b"\x00" * (4 - size)
        else:
            body += struct.pack(endian + "I", ext_base + len(ext))
            ext += packed
    body += struct.pack(endian + "I", 0)  # no next IFD
    return bytes(body), bytes(ext)


def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    photometric: int | None = None,
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array.
    ``photometric=0`` stores the grayscale INVERTED (WhiteIsZero);
    strips of ``rows_per_strip`` rows exercise multi-strip
    reassembly in the decoder."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        spp = 1
        photometric = 1 if photometric is None else photometric
        if photometric == 0:
            arr = (255 - arr.astype(np.int32)).astype(np.uint8)
        elif photometric != 1:
            raise ValueError("grayscale photometric must be 0 or 1")
    elif arr.ndim == 3 and arr.shape[2] == 3:
        spp = 3
        photometric = 2
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    rps = rows_per_strip or h
    comp = {"none": _COMP_NONE, "packbits": _COMP_PACKBITS}[
        compression
    ]
    raw = arr.tobytes()
    row_bytes = w * spp
    strips = []
    for y0 in range(0, h, rps):
        chunk = raw[y0 * row_bytes:min(y0 + rps, h) * row_bytes]
        strips.append(
            packbits_encode(chunk)
            if comp == _COMP_PACKBITS else chunk
        )
    endian = ">" if big_endian else "<"
    header = (b"MM" if big_endian else b"II") + struct.pack(
        endian + "HI", 42, 8
    )
    entries = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [comp]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
        (278, 4, [rps]),
        (279, 4, [len(s) for s in strips]),
        (273, 4, [0] * len(strips)),  # patched below
    ]
    ifd, ext = _pack_ifd(entries, 8, endian)
    data_base = 8 + len(ifd) + len(ext)
    offsets, pos = [], data_base
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    entries[-1] = (273, 4, offsets)
    ifd, ext = _pack_ifd(entries, 8, endian)
    return header + ifd + ext + b"".join(strips)


def _read_values(blob, endian, typ, count, inline, inline_off):
    fmt = {3: "H", 4: "I"}.get(typ)
    if fmt is None:
        raise ValueError(f"unsupported TIFF value type {typ}")
    size = _TYPE_SIZES[typ] * count
    if size <= 4:
        src, off = inline, 0
    else:
        (off,) = struct.unpack_from(endian + "I", inline, 0)
        src = blob
    return [
        struct.unpack_from(
            endian + fmt, src, off + i * _TYPE_SIZES[typ]
        )[0]
        for i in range(count)
    ]


def decode_tiff(blob: bytes) -> np.ndarray:
    """Decode a baseline TIFF to (h, w) grayscale or (h, w, 3) RGB
    uint8.  Raises ValueError on anything malformed or beyond the
    baseline (bit depths != 8, unknown compression, tiled files)."""
    if len(blob) < 8:
        raise ValueError("truncated TIFF header")
    if blob[:2] == b"II":
        endian = "<"
    elif blob[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(endian + "HI", blob, 2)
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    if ifd_off + 2 > len(blob):
        raise ValueError("IFD offset out of range")
    (n_entries,) = struct.unpack_from(endian + "H", blob, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(blob):
            raise ValueError("IFD entry out of range")
        tag, typ, count = struct.unpack_from(
            endian + "HHI", blob, base
        )
        try:
            tags[tag] = _read_values(
                blob, endian, typ, count, blob[base + 8:base + 12],
                base + 8,
            )
        except (struct.error, ValueError):
            if tag in (256, 257, 259, 273, 279):
                raise ValueError(f"malformed required tag {tag}")
            continue  # optional tag with exotic type: ignore
    try:
        w, h = tags[256][0], tags[257][0]
        offsets, counts = tags[273], tags[279]
    except KeyError as e:
        raise ValueError(f"missing required TIFF tag: {e}") from None
    comp = tags.get(259, [_COMP_NONE])[0]
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * spp)
    rps = tags.get(278, [h])[0] or h
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise ValueError(
            f"beyond baseline: bits={bits} samples={spp}"
        )
    if comp not in (_COMP_NONE, _COMP_PACKBITS):
        raise ValueError(f"unsupported compression {comp}")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts mismatch")
    row_bytes = w * spp
    out = bytearray()
    for k, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(blob):
            raise ValueError(f"strip {k} out of range")
        rows = min(rps, h - k * rps)
        if rows <= 0:
            raise ValueError("more strips than image rows")
        chunk = blob[off:off + cnt]
        if comp == _COMP_PACKBITS:
            chunk = packbits_decode(chunk, rows * row_bytes)
        elif len(chunk) < rows * row_bytes:
            raise ValueError(f"strip {k} short")
        out += chunk[:rows * row_bytes]
    if len(out) != h * row_bytes:
        raise ValueError("strip data does not cover the image")
    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    arr = (
        arr.reshape(h, w) if spp == 1 else arr.reshape(h, w, 3)
    )
    if photometric == 0:
        if spp != 1:
            raise ValueError("WhiteIsZero is a grayscale photometric")
        arr = (255 - arr.astype(np.int32)).astype(np.uint8)
    elif photometric not in (1, 2):
        raise ValueError(f"unsupported photometric {photometric}")
    return arr


__all__ = [
    "decode_tiff",
    "encode_tiff",
    "packbits_decode",
    "packbits_encode",
]
