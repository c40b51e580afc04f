"""FLAC codec tests (operators/flac.py).

The roundtrip pins cover what the fixture encoder emits; the LPC and
escape-residual decodes are HAND-ASSEMBLED bitstreams (via the
module's bit writer but with layouts written straight from RFC 9639),
because the encoder never produces them — the decoder cannot pass
those by self-consistency.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from artis_data_ingest_spark.operators.flac import (
    FlacError,
    _BitWriter,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def test_roundtrip_matrix():
    rng = np.random.default_rng(11)
    for ch in (1, 2):
        x = (rng.integers(-3000, 3000, size=(700, ch))
             + np.arange(700)[:, None] * 5).astype(np.int16)
        for ms in ([False] if ch == 1 else [False, True]):
            y, sr = decode_flac(
                encode_flac(x, 22050, block_size=256, mid_side=ms)
            )
            assert sr == 22050 and (y == x).all()


@pytest.mark.parametrize("kind", ["constant", "verbatim", "fixed0",
                                  "fixed1", "fixed2"])
def test_roundtrip_forced_subframes(kind):
    x = (np.arange(400, dtype=np.int16) % 97 - 48).reshape(-1, 1)
    if kind == "constant":
        x = np.full((400, 1), 77, dtype=np.int16)
    y, _ = decode_flac(encode_flac(x, 8000, force_subframe=kind))
    assert (y == x).all()


def test_compresses_ramps():
    x = (np.arange(4000) % 1000).astype(np.int16).reshape(-1, 1)
    blob = encode_flac(x, 16000)
    assert len(blob) < x.nbytes // 2  # fixed predictors earn their keep


def _container(samples: np.ndarray, sr: int, frame: bytes) -> bytes:
    """Wrap one hand-built frame with a real STREAMINFO."""
    n, channels = samples.shape
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    si = bytearray()
    si += struct.pack(">HH", n, n)
    si += (0).to_bytes(3, "big") * 2
    si += bytes([
        (sr >> 12) & 0xFF, (sr >> 4) & 0xFF,
        ((sr & 0xF) << 4) | ((channels - 1) << 1) | (15 >> 4),
        ((15 & 0xF) << 4) | 0,
    ])
    si += n.to_bytes(4, "big")
    si += md5
    return (b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big")
            + bytes(si) + frame)


def _frame_head(bs: int, channels: int) -> bytes:
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)   # 16-bit block size at end
    w.write(0, 4)   # rate from STREAMINFO
    w.write(channels - 1, 4)
    w.write(4, 3)   # 16 bps
    w.write(0, 1)
    w.write(0, 8)   # frame number 0
    w.write(bs - 1, 16)
    w.align()
    head = w.bytes()
    return head + bytes([_crc8(head)])


def test_lpc_subframe_decodes():
    """order-2 LPC, coefs [3, -1], shift 1: x[t] = e[t] +
    ((3·x[t−1] − x[t−2]) >> 1) — assembled bit-by-bit from the spec."""
    warm = [100, 130]
    resid = [5, -3, 0, 7, -9, 2]
    coefs = [3, -1]
    shift = 1
    x = list(warm)
    for e in resid:
        x.append(e + ((coefs[0] * x[-1] + coefs[1] * x[-2]) >> shift))
    samples = np.array(x, dtype=np.int16).reshape(-1, 1)
    bs = len(x)

    w = _BitWriter()
    w.write(0, 1)
    w.write(32 + (2 - 1), 6)  # LPC order 2
    w.write(0, 1)             # no wasted bits
    for v in warm:
        w.write(v & 0xFFFF, 16)
    w.write(5 - 1, 4)         # precision 5 bits
    w.write(shift & 0x1F, 5)
    for c in coefs:
        w.write(c & 0x1F, 5)
    w.write(0, 2)             # residual method 0
    w.write(0, 4)             # partition order 0
    w.write(4, 4)             # rice parameter 4
    for e in resid:
        zz = (e << 1) ^ (e >> 63) if e < 0 else e << 1
        w.write(1, (zz >> 4) + 1)
        w.write(zz & 0xF, 4)
    w.align()
    body = w.bytes()
    frame = _frame_head(bs, 1) + body
    frame += _crc16(frame).to_bytes(2, "big")
    y, sr = decode_flac(_container(samples, 8000, frame))
    assert sr == 8000
    assert (y[:, 0] == np.array(x)).all()


def test_escape_coded_residual_and_5bit_method():
    """method-1 (5-bit parameters) with the escape code: residuals
    stored as raw 12-bit signed — never emitted by our encoder."""
    warm = [7]
    resid = [1000, -2000, 1500, -1, 0, 123, -456]
    x = list(warm)
    for e in resid:
        x.append(e + x[-1])   # FIXED order 1
    samples = np.array(x, dtype=np.int16).reshape(-1, 1)
    bs = len(x)

    w = _BitWriter()
    w.write(0, 1)
    w.write(8 + 1, 6)         # FIXED order 1
    w.write(0, 1)
    w.write(warm[0] & 0xFFFF, 16)
    w.write(1, 2)             # residual method 1 (5-bit params)
    w.write(0, 4)             # partition order 0
    w.write(31, 5)            # escape
    w.write(12, 5)            # 12-bit raw residuals
    for e in resid:
        w.write(e & 0xFFF, 12)
    w.align()
    body = w.bytes()
    frame = _frame_head(bs, 1) + body
    frame += _crc16(frame).to_bytes(2, "big")
    y, _ = decode_flac(_container(samples, 8000, frame))
    assert (y[:, 0] == np.array(x)).all()


def test_crc16_corruption_detected():
    x = np.arange(200, dtype=np.int16).reshape(-1, 1)
    blob = bytearray(encode_flac(x, 8000))
    blob[-40] ^= 0x40  # flip a bit inside the last frame body
    # depending on where the flip lands, the decoder reports a CRC
    # mismatch, lost sync (shifted residuals), or a truncated stream —
    # the contract is LOUD failure, never silently wrong samples
    with pytest.raises(FlacError):
        decode_flac(bytes(blob))
    # flip the stored CRC-16 itself: body parses, checksum must catch
    blob2 = bytearray(encode_flac(x, 8000))
    blob2[-1] ^= 0xFF
    with pytest.raises(FlacError, match="CRC"):
        decode_flac(bytes(blob2))


def test_streaminfo_md5_mismatch_detected():
    x = np.arange(200, dtype=np.int16).reshape(-1, 1)
    blob = bytearray(encode_flac(x, 8000))
    # corrupt a byte of the stored MD5 (bytes 4+4+18 .. +34 of
    # STREAMINFO) — frames stay valid, so only the MD5 gate can catch
    blob[4 + 4 + 18] ^= 0xFF
    with pytest.raises(FlacError, match="MD5"):
        decode_flac(bytes(blob))


def test_not_flac_raises():
    with pytest.raises(FlacError, match="not a FLAC"):
        decode_flac(b"RIFF....WAVE")


def test_audio_stats_dispatches_flac(spark):
    from artis_data_ingest_spark.operators.multimodal import (
        audio_stats,
        ramp_flac_media,
        ramp_wav_media,
    )

    flac = audio_stats(
        ramp_flac_media(spark, n=4).select("media_id", "content")
    ).collect()
    wav = audio_stats(
        ramp_wav_media(spark, n=4).select("media_id", "content")
    ).collect()
    # identical closed-form content → identical stats, format-blind
    key = lambda r: (r["media_id"], r["channel"])  # noqa: E731
    assert sorted(map(tuple, flac), key=lambda t: t[:2]) == \
        sorted(map(tuple, wav), key=lambda t: t[:2])


def test_media_probe_detects_flac():
    from artis_data_ingest_spark.operators.multimodal import (
        parse_media_header,
    )

    blob = encode_flac(
        np.arange(100, dtype=np.int16).reshape(-1, 1), 44100
    )
    meta = parse_media_header(blob)
    assert meta["detected"] == "flac"
    assert meta["sample_rate"] == 44100
