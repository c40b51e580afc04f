"""GIF87a/89a codec (stdlib only — SURVEY.md §2.11 multimodal, r8).

GIFs are the third most common image payload in web scrapes (after
JPEG/PNG) and the usual carrier of short animations, so the honest
multimodal path should decode them.  Unlike JPEG, GIF is LOSSLESS
(palette-indexed LZW), which makes fixtures trivial to pin: any image
with <= 256 distinct colors round-trips byte-exact.

Implemented per the public GIF89a specification:
  * encode — global color table built from the frames' distinct
    colors (<= 256 required; fixture mode), one image descriptor per
    frame, LZW with dynamic code sizes + clear codes, Netscape loop +
    Graphic Control Extension (delay) for animations,
  * decode — logical screen descriptor, global AND local color
    tables, interlaced row order (the four-pass scheme), GCE
    transparency (transparent pixels keep the previous frame's
    composite — disposal "draw over"), disposal method 2 (restore
    background); disposal 3 (restore previous) raises rather than
    guessing.

Scale story: identical to the other codecs — decode runs inside
Arrow-batched ``mapInPandas`` (`multimodal.image_stats` /
``video_stats`` dispatch on the magic bytes), binary never crosses a
shuffle.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits clear code first, grows code size up to
    12 bits, re-emits clear when the table fills."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []

    def reset():
        return {bytes([i]): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, code_size = reset()
    out_bits.append((clear, code_size))
    buf = b""
    for sym in indices.astype(np.uint8).tobytes():
        cand = buf + bytes([sym])
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], code_size))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code > (1 << 12):
            out_bits.append((clear, code_size))
            table, next_code, code_size = reset()
        buf = bytes([sym])
    if buf:
        out_bits.append((table[buf], code_size))
    out_bits.append((end, code_size))
    # pack LSB-first
    acc = nbits = 0
    data = bytearray()
    for code, size in out_bits:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    # sub-block framing
    out = bytearray([min_code_size])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            end + 1,
            min_code_size + 1,
        )

    table, next_code, code_size = reset()
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < n_expected:
        while nbits < code_size:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table, next_code, code_size = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + entry[:1]
            next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("invalid GIF LZW code")
        if prev is not None and next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.array(order)] = rows
    return out


def encode_gif(
    frames: np.ndarray,
    delay_cs: int = 4,
    interlace: bool = False,
    loop: bool = True,
) -> bytes:
    """Encode uint8 ``(h, w, 3)`` or ``(n, h, w, 3)`` RGB frames as
    GIF89a.  All frames together must use <= 256 distinct colors (the
    format's palette limit — fixture images are built that way);
    lossless by construction."""
    if frames.dtype != np.uint8:
        raise ValueError("encode_gif expects uint8 frames")
    if frames.ndim == 3:
        frames = frames[None, ...]
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_gif expects (n, h, w, 3)")
    n, h, w, _ = frames.shape
    colors = np.unique(frames.reshape(-1, 3), axis=0)
    if len(colors) > 256:
        raise ValueError("GIF encode needs <= 256 distinct colors")
    # palette size = power of two >= len(colors), min 2
    bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += pal.tobytes()
    if n > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, bits)
    for f in range(n):
        if n > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs)
            out += b"\x00\x00"  # no transparency
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00])
        idx = np.array(
            [lut[tuple(px)] for px in frames[f].reshape(-1, 3)],
            dtype=np.uint8,
        ).reshape(h, w)
        if interlace:
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, h, step))
            idx = idx[np.array(order)]
        out += _lzw_encode(idx.ravel(), min_code)
    out += b"\x3b"
    return bytes(out)


def decode_gif(blob: bytes) -> np.ndarray:
    """Decode a GIF to uint8 ``(n, h, w, 3)`` composited RGB frames
    (see module docstring for the supported disposal/transparency
    subset)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", blob[6:10])
    flags, bg = blob[10], blob[11]
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(blob[pos:pos + 3 * size], dtype=np.uint8)
        gct = gct.reshape(size, 3).copy()
        pos += 3 * size
    frames: list[np.ndarray] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    transparent: int | None = None
    disposal = 0
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = blob[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                blk = blob[pos + 1:pos + 1 + blob[pos]]
                disposal = (blk[0] >> 2) & 0x7
                if disposal == 3:
                    raise ValueError(
                        "GIF disposal 'restore previous' unsupported"
                    )
                transparent = blk[3] if blk[0] & 0x01 else None
            while blob[pos]:  # skip data sub-blocks
                pos += 1 + blob[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            fx, fy, fw, fh = struct.unpack("<HHHH", blob[pos + 1:pos + 9])
            iflags = blob[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:  # local color table
                size = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    blob[pos:pos + 3 * size], dtype=np.uint8
                ).reshape(size, 3).copy()
                pos += 3 * size
            if pal is None:
                raise ValueError("GIF frame without any color table")
            min_code = blob[pos]
            pos += 1
            data = bytearray()
            while blob[pos]:
                ln = blob[pos]
                data += blob[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, fw * fh).reshape(
                fh, fw
            )
            if iflags & 0x40:
                idx = _deinterlace(idx)
            region = canvas[fy:fy + fh, fx:fx + fw]
            rgb = pal[np.clip(idx, 0, len(pal) - 1)]
            if transparent is not None:
                mask = (idx != transparent)[..., None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            if disposal == 2:  # restore to background
                bgc = pal[bg] if bg < len(pal) else 0
                canvas[fy:fy + fh, fx:fx + fw] = bgc
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames)


def parse_gif_header(blob: bytes) -> tuple[int, int, int] | None:
    """(height, width, n_frames) or None — the cheap probe.  Frame
    count walks block lengths only (no LZW work)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        w, h = struct.unpack("<HH", blob[6:10])
        flags = blob[10]
        pos = 13
        if flags & 0x80:
            pos += 3 * (2 << (flags & 0x07))
        n = 0
        while pos < len(blob):
            b0 = blob[pos]
            if b0 == 0x3B:
                break
            if b0 == 0x21:
                pos += 2
                while blob[pos]:
                    pos += 1 + blob[pos]
                pos += 1
            elif b0 == 0x2C:
                iflags = blob[pos + 9]
                pos += 10
                if iflags & 0x80:
                    pos += 3 * (2 << (iflags & 0x07))
                pos += 1  # min code size
                while blob[pos]:
                    pos += 1 + blob[pos]
                pos += 1
                n += 1
            else:
                return None
        return h, w, n
    except (IndexError, struct.error):
        return None
