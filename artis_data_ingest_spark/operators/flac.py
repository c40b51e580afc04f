"""FLAC lossless-audio codec — pure stdlib + numpy, from RFC 9639.

FLAC is the dominant lossless interchange for archived speech/music
corpora (LibriVox, podcast archives, call-center retention systems).
No audio library ships in this image, so the format is implemented
from the public spec (RFC 9639, formerly the xiph.org format doc):

  * STREAMINFO metadata block: block-size/rate/channel/bps ranges,
    total samples, MD5 of the UNENCODED samples — which the decoder
    recomputes and verifies, so a decode that produces even one wrong
    sample in a million fails loudly, not statistically.
  * Frames: 14-bit sync, blocking strategy, coded block size/rate,
    channel assignment (independent, left/side, right/side,
    mid/side — the side channel carries one extra bit), UTF-8-style
    coded frame number, CRC-8-protected header.
  * Subframes: CONSTANT, VERBATIM, FIXED (orders 0–4, the standard
    difference predictors), LPC (quantized coefficients + shift),
    optional wasted-bits shift.
  * Residuals: Rice partitions (4- and 5-bit parameter methods,
    escape code → raw n-bit verbatim residuals).

The ENCODER here is fixture-grade (CONSTANT / VERBATIM / FIXED
subframes, one Rice partition, independent or mid/side stereo) — it
exists so tests and the q_flac_audio oracle own closed-form inputs;
the DECODER covers the full subframe/residual/stereo surface above.
decode(encode(x)) == x exactly (lossless), and the STREAMINFO MD5
check rides along on every decode.

Spark integration: FLAC blobs flow through the same Arrow-batched
``audio_stats`` path as WAV (magic-byte dispatch ``fLaC``); the file
stays the parallelism unit, binary never shuffles.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class FlacError(ValueError):
    """Malformed FLAC payload or unsupported layout."""


# --------------------------------------------------------------------------
# bit-level IO (MSB-first, per the spec)
# --------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        out = 0
        pos, data = self.pos, self.data
        end = pos + n
        if end > len(data) * 8:
            raise FlacError("truncated FLAC bitstream")
        while n:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        # spec: a run of 0 bits terminated by a 1 bit encodes the run
        # length
        count = 0
        while self.read(1) == 0:
            count += 1
        return count

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    # CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    # CRC-16, polynomial 0x8005, init 0
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _coded_number_write(w: _BitWriter, n: int) -> None:
    """UTF-8-style frame number (spec §9.1.5) — fixture encoder only
    emits small frame indexes, so 1–2 byte forms suffice."""
    if n < 0x80:
        w.write(n, 8)
    elif n < 0x800:
        w.write(0xC0 | (n >> 6), 8)
        w.write(0x80 | (n & 0x3F), 8)
    else:
        raise FlacError("fixture encoder caps frame numbers at 2047")


def _coded_number_read(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow == 0 or n_follow > 6:
        raise FlacError("bad coded frame number")
    val = first & (mask - 1)
    for _ in range(n_follow):
        b = r.read(8)
        if b >> 6 != 0b10:
            raise FlacError("bad coded-number continuation")
        val = (val << 6) | (b & 0x3F)
    return val


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def _decode_residual(r: _BitReader, block_size: int, order: int):
    method = r.read(2)
    if method > 1:
        raise FlacError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise FlacError("partition count does not divide block size")
    out: list[int] = []
    for p in range(n_parts):
        n = block_size // n_parts - (order if p == 0 else 0)
        if n < 0:
            raise FlacError("predictor order exceeds first partition")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out.extend(
                r.read_signed(raw) if raw else 0 for _ in range(n)
            )
        else:
            for _ in range(n):
                q = r.read_unary()
                low = r.read(param) if param else 0
                zz = (q << param) | low
                out.append((zz >> 1) ^ -(zz & 1))
    return out


def _decode_subframe(r: _BitReader, block_size: int, bps: int):
    if r.read(1):
        raise FlacError("subframe padding bit set")
    sftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if sftype == 0:  # CONSTANT
        v = r.read_signed(eff)
        samples = [v] * block_size
    elif sftype == 1:  # VERBATIM
        samples = [r.read_signed(eff) for _ in range(block_size)]
    elif 8 <= sftype <= 12:  # FIXED
        order = sftype - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        coefs = _FIXED_COEFS[order]
        samples = list(warm)
        for e in resid:
            pred = sum(c * samples[-i - 1]
                       for i, c in enumerate(coefs))
            samples.append(e + pred)
    elif sftype >= 32:  # LPC
        order = sftype - 31
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise FlacError("invalid LPC precision code")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        samples = list(warm)
        for e in resid:
            acc = sum(c * samples[-i - 1]
                      for i, c in enumerate(coefs))
            samples.append(e + (acc >> shift))
    else:
        raise FlacError(f"reserved subframe type {sftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(blob: bytes) -> tuple[np.ndarray, int]:
    """→ (int32 samples (n, channels), sample_rate).  Verifies the
    STREAMINFO MD5 over the decoded samples — a single wrong sample
    anywhere fails the whole decode."""
    if blob[:4] != b"fLaC":
        raise FlacError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(blob):
            raise FlacError("truncated metadata")
        hdr = blob[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        size = int.from_bytes(blob[pos + 1 : pos + 4], "big")
        body = blob[pos + 4 : pos + 4 + size]
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise FlacError("missing STREAMINFO")
    sample_rate = int.from_bytes(streaminfo[10:13], "big") >> 4
    channels = ((streaminfo[12] >> 1) & 0x07) + 1
    bps = (((streaminfo[12] & 1) << 4) | (streaminfo[13] >> 4)) + 1
    total = (
        (streaminfo[13] & 0x0F) << 32
    ) | int.from_bytes(streaminfo[14:18], "big")
    want_md5 = streaminfo[18:34]

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(blob):
        frame_start = pos
        r = _BitReader(blob, pos * 8)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise FlacError("lost frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)  # reserved
        _coded_number_read(r)
        if bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        elif bs_code in _BLOCK_SIZE_CODES:
            block_size = _BLOCK_SIZE_CODES[bs_code]
        else:
            raise FlacError(f"reserved block-size code {bs_code}")
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code != 0 and sr_code not in _SAMPLE_RATE_CODES:
            raise FlacError(f"invalid sample-rate code {sr_code}")
        fbps = bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if fbps is None:
            raise FlacError(f"reserved bps code {bps_code}")
        r.align()
        hdr_end = r.pos // 8
        if _crc8(blob[frame_start:hdr_end]) != blob[hdr_end]:
            raise FlacError("frame-header CRC-8 mismatch")
        r.pos = (hdr_end + 1) * 8

        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise FlacError("frame/STREAMINFO channel mismatch")
            subs = [
                _decode_subframe(r, block_size, fbps)
                for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise FlacError("stereo decorrelation on non-stereo")
            extra_first = 1 if ch_code == 9 else 0
            a = _decode_subframe(r, block_size, fbps + extra_first)
            b = _decode_subframe(
                r, block_size, fbps + (0 if ch_code == 9 else 1)
            )
            if ch_code == 8:  # left/side
                left, side = a, b
                right = [l - s for l, s in zip(left, side)]
                subs = [left, right]
            elif ch_code == 9:  # right/side (side first per spec)
                side, right = a, b
                subs = [[s + rt for s, rt in zip(side, right)], right]
            else:  # mid/side
                mid, side = a, b
                subs = [[], []]
                for m, s in zip(mid, side):
                    lr_sum = (m << 1) | (s & 1)
                    subs[0].append((lr_sum + s) >> 1)
                    subs[1].append((lr_sum - s) >> 1)
        else:
            raise FlacError(f"reserved channel code {ch_code}")
        r.align()
        body_end = r.pos // 8
        crc = int.from_bytes(blob[body_end : body_end + 2], "big")
        if _crc16(blob[frame_start:body_end]) != crc:
            raise FlacError("frame CRC-16 mismatch")
        pos = body_end + 2
        for c in range(channels):
            chans[c].extend(subs[c])

    n = min(len(c) for c in chans) if chans else 0
    if total and n > total:
        n = total  # final block may pad beyond total samples
    out = np.empty((n, channels), dtype=np.int32)
    for c in range(channels):
        out[:, c] = chans[c][:n]

    if want_md5 != b"\x00" * 16:
        width = bps // 8
        h = hashlib.md5()
        interleaved = out.astype("<i4").tobytes()
        if width == 4:
            h.update(interleaved)
        else:
            arr = np.frombuffer(interleaved, dtype=np.uint8)
            arr = arr.reshape(-1, 4)[:, :width]
            h.update(arr.tobytes())
        if h.digest() != want_md5:
            raise FlacError("STREAMINFO MD5 mismatch — decode is wrong")
    return out, sample_rate


# --------------------------------------------------------------------------
# fixture-grade encoder
# --------------------------------------------------------------------------


def _best_fixed_order(x: list[int]) -> int:
    best, best_cost = 0, None
    cur = x
    for order in range(3):
        cost = sum(abs(v) for v in cur[order and 1 :])
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
        cur = [b - a for a, b in zip(cur, cur[1:])]
    return best


def _encode_residual(w: _BitWriter, resid: list[int]) -> None:
    # one partition, 4-bit method; parameter chosen from the mean
    # magnitude (any parameter is spec-legal — decoders must not care)
    if resid:
        mean = sum(abs(v) for v in resid) / len(resid)
        param = max(0, min(14, int(mean).bit_length()))
    else:
        param = 0
    w.write(0, 2)  # method 0
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    for v in resid:
        zz = (v << 1) ^ (v >> 63) if v < 0 else v << 1
        w.write_unary(zz >> param)
        if param:
            w.write(zz & ((1 << param) - 1), param)


def _encode_subframe(
    w: _BitWriter, samples: list[int], bps: int, force: str | None
) -> None:
    w.write(0, 1)  # padding
    kind = force
    if kind is None:
        if all(s == samples[0] for s in samples):
            kind = "constant"
        else:
            kind = f"fixed{_best_fixed_order(samples)}"
    if kind == "constant":
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write(samples[0] & ((1 << bps) - 1), bps)
    elif kind == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for s in samples:
            w.write(s & ((1 << bps) - 1), bps)
    elif kind.startswith("fixed"):
        order = int(kind[5:])
        w.write(8 + order, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s & ((1 << bps) - 1), bps)
        coefs = _FIXED_COEFS[order]
        resid = [
            samples[i] - sum(
                c * samples[i - j - 1] for j, c in enumerate(coefs)
            )
            for i in range(order, len(samples))
        ]
        _encode_residual(w, resid)
    else:
        raise FlacError(f"encoder does not emit {kind!r}")


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    block_size: int = 512,
    mid_side: bool = False,
    force_subframe: str | None = None,
) -> bytes:
    """Fixture-grade FLAC encoder: int16 (n, channels) → container
    with STREAMINFO (incl. real MD5) and FIXED/CONSTANT/VERBATIM
    subframes; optional mid/side stereo decorrelation."""
    if samples.dtype != np.int16 or samples.ndim != 2:
        raise FlacError("encode_flac expects int16 (n, channels)")
    n, channels = samples.shape
    bps = 16

    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += (0).to_bytes(3, "big") * 2  # min/max frame size unknown
    si += bytes([
        (sample_rate >> 12) & 0xFF,
        (sample_rate >> 4) & 0xFF,
        ((sample_rate & 0xF) << 4)
        | ((channels - 1) << 1)
        | ((bps - 1) >> 4),
        (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
    ])
    si += (n & 0xFFFFFFFF).to_bytes(4, "big")
    si += md5
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)

    for fi in range(0, (n + block_size - 1) // block_size):
        chunk = samples[fi * block_size : (fi + 1) * block_size]
        bs = len(chunk)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # block size: 16-bit at end of header
        w.write(0, 4)  # sample rate: from STREAMINFO
        if mid_side:
            if channels != 2:
                raise FlacError("mid/side needs stereo")
            w.write(10, 4)
        else:
            w.write(channels - 1, 4)
        w.write(4, 3)  # 16 bps
        w.write(0, 1)
        _coded_number_write(w, fi)
        w.write(bs - 1, 16)
        w.align()
        head = w.bytes()
        w2 = _BitWriter()
        if mid_side:
            left = chunk[:, 0].astype(np.int64)
            right = chunk[:, 1].astype(np.int64)
            mid = (left + right) >> 1
            side = left - right
            _encode_subframe(w2, [int(v) for v in mid], 16,
                             force_subframe)
            _encode_subframe(w2, [int(v) for v in side], 17,
                             force_subframe)
        else:
            for c in range(channels):
                _encode_subframe(
                    w2, [int(v) for v in chunk[:, c]], 16,
                    force_subframe,
                )
        w2.align()
        frame = head + bytes([_crc8(head)]) + w2.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)
