"""Multimodal plumbing tests: schema, Arrow batching, deterministic stub
features (SURVEY.md §2.11)."""

from __future__ import annotations

from artis_data_ingest_spark.operators.multimodal import (
    extract_features,
    synthetic_media,
)


def test_feature_extraction_shapes(spark):
    media = synthetic_media(spark, n=9)
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 9
    for r in feats:
        assert len(r.feature) == 16
        assert all(0.0 <= x <= 1.0 for x in r.feature)
        assert r.n_bytes >= 64


def test_feature_extraction_deterministic(spark):
    a = extract_features(synthetic_media(spark, n=5)).collect()
    b = extract_features(synthetic_media(spark, n=5)).collect()
    fa = {r.media_id: r.feature for r in a}
    fb = {r.media_id: r.feature for r in b}
    assert fa == fb


def test_binary_column_dropped_from_features(spark):
    feats = extract_features(synthetic_media(spark, n=3))
    assert "content" not in feats.columns


def test_resize_media_targets_visual_kinds_only(spark):
    from artis_data_ingest_spark.operators.multimodal import resize_media

    media = synthetic_media(spark, n=9)
    out = {r.media_id: r for r in resize_media(media, 8, 8).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        if r.kind in ("image", "video"):
            # synthetic blobs are container-less → labeled stub path
            assert len(r.content) == 64
            assert r.meta.width == 8 and r.meta.height == 8
        else:  # audio passes through untouched (resampling ≠ resize)
            assert bytes(r.content) == bytes(src[mid].content)


def test_sample_frames_fanout(spark):
    from artis_data_ingest_spark.operators.multimodal import sample_frames

    media = synthetic_media(spark, n=9)  # kinds cycle image/audio/video
    frames = sample_frames(media, every_n=2, frame_bytes=16).collect()
    vids = {r.media_id for r in media.collect() if r.kind == "video"}
    assert {r.media_id for r in frames} == vids
    # every sampled index is a multiple of the stride; frames are small
    for r in frames:
        assert r.frame_idx % 2 == 0
        assert len(r.frame) <= 16
    # fan-out: more frame rows than video rows
    assert len(frames) > len(vids)


def test_header_probe_real_containers(spark):
    from artis_data_ingest_spark.operators.multimodal import (
        make_png_bytes,
        make_wav_bytes,
        parse_media_header,
        probe_metadata,
        synthetic_probe_media,
    )

    # direct byte-level checks
    png = parse_media_header(make_png_bytes(640, 480))
    assert png == {
        "detected": "png", "width": 640, "height": 480, "sample_rate": None,
    }
    wav = parse_media_header(make_wav_bytes(44100, channels=2))
    assert wav["detected"] == "wav" and wav["sample_rate"] == 44100
    assert parse_media_header(b"garbage")["detected"] == "unknown"
    # truncated containers must not crash
    assert parse_media_header(make_png_bytes(1, 1)[:10])["detected"] == "unknown"

    # through the Arrow-batched pipeline
    out = {
        r.media_id: r
        for r in probe_metadata(synthetic_probe_media(spark, n=6)).collect()
    }
    assert out[0].detected == "png" and out[0].width == 16
    assert out[1].detected == "wav" and out[1].sample_rate == 8100
    assert out[0].n_bytes > 0


# --- real PNG codec (encode/decode round-trip, per-filter coverage) -------


def _random_rgb(h, w, ch, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


def test_png_roundtrip_each_filter_type():
    """Every PNG filter (0 none, 1 sub, 2 up, 3 average, 4 paeth) must
    survive encode→decode bit-exactly on its own — a decoder handling
    only filter 0 fails four of these."""
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    arr = _random_rgb(11, 7, 3, seed=42)
    for f in (0, 1, 2, 3, 4):
        blob = encode_png(arr, filter_cycle=(f,))
        out = decode_png(blob)
        assert out.shape == arr.shape, f"filter {f}"
        assert np.array_equal(out, arr), f"filter {f}"


def test_png_roundtrip_mixed_cycle_rgb_and_rgba():
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    for ch in (3, 4):
        arr = _random_rgb(13, 9, ch, seed=ch)
        out = decode_png(encode_png(arr))  # default cycles all 5 filters
        assert np.array_equal(out, arr)


def test_png_decode_is_spec_correct_gradient():
    """Closed-form pixels: image with R=x, G=y, B=x+y decodes to exactly
    those values (pins scanline order and channel order, not just
    round-trip self-consistency)."""
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    h, w = 5, 6
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
    out = decode_png(encode_png(np.ascontiguousarray(arr)))
    assert out[2, 3, 0] == 3 and out[2, 3, 1] == 2 and out[2, 3, 2] == 5
    assert np.array_equal(out, arr)


def test_png_codec_rejects_unsupported_forms():
    import numpy as np
    import pytest

    from artis_data_ingest_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="expects uint8"):
        encode_png(np.zeros((4, 4, 3), dtype=np.float64))
    with pytest.raises(ValueError, match="expects uint8"):
        encode_png(np.zeros((4, 4, 2), dtype=np.uint8))  # 2 channels
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"RIFF....WAVE")
    # grayscale (color type 0) is declared unsupported → loud error
    import struct
    import zlib

    from artis_data_ingest_spark.operators.multimodal import _PNG_MAGIC

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    # grayscale decodes since r14 — replicated to 3 channels
    gray_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 1, 2, 0, 3, 4])  # 2 rows: filter byte + 2 px
    gray = (
        _PNG_MAGIC
        + chunk(b"IHDR", gray_ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    g = decode_png(gray)
    assert g.shape == (2, 2, 3) and tuple(g[1, 1]) == (4, 4, 4)
    # spec-ILLEGAL combos still refuse: 16-bit palette, interlace 2
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    bad = (
        _PNG_MAGIC
        + chunk(b"IHDR", bad_ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bad)
    bad2_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 2)
    bad2 = (
        _PNG_MAGIC
        + chunk(b"IHDR", bad2_ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bad2)


def test_image_stats_matches_closed_form(spark):
    """q_media_features' building block: decode real PNGs through
    Arrow-batched mapInPandas and verify channel means against the
    closed-form values the oracle pins."""
    from artis_data_ingest_spark.operators.multimodal import (
        gradient_png_media,
        image_stats,
    )

    media = gradient_png_media(spark, n=6)
    out = {r.media_id: r for r in image_stats(
        media.select("media_id", "content")
    ).collect()}
    assert set(out) == set(range(6))
    for i, r in out.items():
        w, h = 4 + i, 3 + i
        assert (r.width, r.height) == (w, h)
        assert r.mean_r == round((w - 1) / 510.0, 6)
        assert r.mean_g == round((h - 1) / 510.0, 6)
        assert r.mean_b == round((w + h - 2) / 510.0, 6)


# --- real WAV codec (encode/decode round-trip, chunk walk, channels) ------


def test_wav_roundtrip_mono_and_stereo():
    """Random int16 samples (negatives included) must survive
    encode→decode bit-exactly for 1, 2, and 4 channels — a decoder
    that mis-interleaves or assumes unsigned fails these."""
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    for ch in (1, 2, 4):
        arr = rng.integers(-32768, 32768, size=(101, ch)).astype(np.int16)
        out, sr = decode_wav(encode_wav(arr, 22050))
        assert sr == 22050
        assert out.shape == arr.shape
        assert np.array_equal(out, arr)


def test_wav_decode_walks_chunks_and_word_aligns():
    """The encoder places a LIST chunk before data and pads odd-length
    payloads; decode must skip both correctly (odd payload: mono with an
    odd sample count is still even bytes, so force oddness via a
    hand-built extra chunk of odd length)."""
    import struct

    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    arr = np.arange(-5, 5, dtype=np.int16).reshape(-1, 1)
    blob = encode_wav(arr, 8000)
    assert b"LIST" in blob  # the walk is genuinely exercised
    # graft an odd-length junk chunk right after WAVE: decode must skip
    # its pad byte to find fmt/data
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"
    patched = blob[:12] + junk + blob[12:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8
    ) + patched[8:]
    out, sr = decode_wav(patched)
    assert sr == 8000
    assert np.array_equal(out, arr)


def test_wav_codec_rejects_unsupported_forms():
    import struct

    import numpy as np
    import pytest

    from artis_data_ingest_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    with pytest.raises(ValueError, match="expects int16"):
        encode_wav(np.zeros((4, 1), dtype=np.float32), 8000)
    with pytest.raises(ValueError, match="expects int16"):
        encode_wav(np.zeros(4, dtype=np.int16), 8000)  # 1-D
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"\x89PNG\r\n\x1a\n")
    # IEEE-float WAVE (format 3) is declared unsupported → loud error
    arr = np.zeros((4, 1), dtype=np.int16)
    blob = bytearray(encode_wav(arr, 8000))
    fmt_at = blob.index(b"fmt ") + 8
    blob[fmt_at:fmt_at + 2] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="unsupported WAVE"):
        decode_wav(bytes(blob))


def test_audio_stats_matches_closed_form(spark):
    """q_audio_features' building block: decode real PCM16 WAVs through
    Arrow-batched mapInPandas and verify per-channel stats against the
    closed-form values the oracle pins."""
    import math

    from artis_data_ingest_spark.operators.multimodal import (
        audio_stats,
        ramp_wav_media,
    )

    media = ramp_wav_media(spark, n=6)
    rows = audio_stats(media.select("media_id", "content")).collect()
    out = {(r.media_id, r.channel): r for r in rows}
    # mono clips have 1 row, stereo 2
    assert len(rows) == sum(1 + (i % 2) for i in range(6))
    for (i, c), r in out.items():
        n, sr, a = 64 + 8 * i, 8000 + 500 * i, 100 * c
        assert (r.sample_rate, r.n_samples) == (sr, n)
        assert r.duration_s == round(n / sr, 6)
        assert r.mean_amp == round((n - 1) / 2 + a, 6)
        msq = (n * (n - 1) * (2 * n - 1) // 6 + a * n * (n - 1) + n * a * a) / n
        assert r.rms_amp == round(math.sqrt(msq), 6)
        assert r.peak_amp == n - 1 + a


def test_extract_features_uses_real_audio_decode(spark):
    """A WAV media row's feature vector must come from decoded samples,
    not the byte-hash stub: constant-amplitude PCM yields a constant
    normalized feature vector, while the stub (hashing container bytes)
    cannot — headers and payload differ."""
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_wav,
        extract_features,
    )

    amp = 16384  # → 0.5 normalized
    arr = np.full((256, 1), amp, dtype=np.int16)
    media = spark.createDataFrame(
        [(0, "audio", encode_wav(arr, 8000),
          {"width": None, "height": None, "n_frames": None,
           "sample_rate": 8000})],
        MEDIA_SCHEMA,
    )
    (row,) = extract_features(media, dim=8).collect()
    assert all(abs(x - 0.5) < 1e-6 for x in row.feature)


# --- real AVI codec (round-trip, padding/bottom-up/BGR, frame sampling) ---


def test_avi_roundtrip_including_padded_strides():
    """Random RGB frames must survive encode→decode bit-exactly for
    widths whose 3-byte rows need 0-3 bytes of DIB padding — a decoder
    ignoring the 4-byte stride fails three of these."""
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(11)
    for w in (4, 5, 6, 7):
        arr = rng.integers(0, 256, size=(3, 5, w, 3), dtype=np.uint8)
        out, fps = decode_avi(encode_avi(arr, fps=12))
        assert fps == 12
        assert out.shape == arr.shape, f"w={w}"
        assert np.array_equal(out, arr), f"w={w}"


def test_avi_decode_is_spec_correct_gradient():
    """Closed-form pixels pin the bottom-up row order and BGR channel
    order (not just round-trip self-consistency): frame f with R=x,
    G=y, B=x+y+f decodes to exactly those values at every pixel."""
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    h, w, nf = 4, 5, 3
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
    out, _ = decode_avi(encode_avi(frames))
    assert out[1, 2, 3, 0] == 3 and out[1, 2, 3, 1] == 2
    assert out[2, 2, 3, 2] == 3 + 2 + 2
    assert np.array_equal(out, frames)


def test_avi_codec_rejects_unsupported_forms():
    import struct

    import numpy as np
    import pytest

    from artis_data_ingest_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    with pytest.raises(ValueError, match="expects uint8"):
        encode_avi(np.zeros((2, 4, 4, 4), dtype=np.uint8))  # RGBA
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    # compressed fourcc (biCompression != 0) → loud error
    arr = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    blob = bytearray(encode_avi(arr))
    strf_at = blob.index(b"strf") + 8 + 16  # biCompression offset
    blob[strf_at:strf_at + 4] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError, match="unsupported AVI"):
        decode_avi(bytes(blob))


def test_sample_frames_decodes_real_avi(spark):
    """sample_frames on an AVI payload must emit the ACTUAL decoded RGB
    bytes of every sampled frame, not byte slices of the container."""
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_avi,
        sample_frames,
    )

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(6, 3, 4, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(7, "video", encode_avi(frames),
          {"width": None, "height": None, "n_frames": None,
           "sample_rate": None})],
        MEDIA_SCHEMA,
    )
    out = {r.frame_idx: bytes(r.frame)
           for r in sample_frames(media, every_n=2).collect()}
    assert set(out) == {0, 2, 4}
    for fi, raw in out.items():
        assert raw == frames[fi].tobytes()


def test_video_stats_matches_closed_form(spark):
    """q_video_features' building block: decode real AVIs through
    Arrow-batched mapInPandas and verify per-frame channel means
    against the closed-form values the oracle pins."""
    from artis_data_ingest_spark.operators.multimodal import (
        gradient_avi_media,
        video_stats,
    )

    media = gradient_avi_media(spark, n=4)
    rows = video_stats(media.select("media_id", "content")).collect()
    out = {(r.media_id, r.frame_idx): r for r in rows}
    assert len(rows) == sum(2 + i for i in range(4))
    for (i, f), r in out.items():
        w, h = 4 + i, 3 + i
        assert (r.width, r.height) == (w, h)
        assert r.mean_r == round((w - 1) / 510.0, 6)
        assert r.mean_g == round((h - 1) / 510.0, 6)
        assert r.mean_b == round((w + h - 2 + 2 * f) / 510.0, 6)


def test_media_probe_detects_avi(spark):
    from artis_data_ingest_spark.operators.multimodal import (
        encode_avi,
        parse_media_header,
    )
    import numpy as np

    blob = encode_avi(np.zeros((2, 9, 16, 3), dtype=np.uint8), fps=10)
    got = parse_media_header(blob)
    assert got == {
        "detected": "avi", "width": 16, "height": 9, "sample_rate": None,
    }


def test_resize_png_nn_matches_numpy_reference():
    """The real PNG resize path: decode → integer nearest-neighbor →
    re-encode must reproduce numpy fancy-indexing exactly, and an
    identity resize must be lossless."""
    from artis_data_ingest_spark.operators.multimodal import (
        _resize_png_nn,
        decode_png,
        encode_png,
    )
    import numpy as np

    rng_free = (np.arange(7 * 9 * 3, dtype=np.uint8).reshape(9, 7, 3) * 31) % 251
    blob = encode_png(np.ascontiguousarray(rng_free))
    for W, H in [(3, 4), (7, 9), (14, 2), (1, 1)]:
        out = decode_png(_resize_png_nn(blob, W, H))
        ys = (np.arange(H) * 9) // H
        xs = (np.arange(W) * 7) // W
        assert np.array_equal(out, rng_free[ys][:, xs]), (W, H)
    # identity: indices are 0..n-1, so the round trip is lossless
    assert np.array_equal(decode_png(_resize_png_nn(blob, 7, 9)), rng_free)


def test_resize_media_uses_real_path_for_png(spark):
    """resize_media over gradient PNGs must emit REAL re-encoded PNGs
    (decodable, exact nearest-neighbor pixels), not stub bytes."""
    from artis_data_ingest_spark.operators.multimodal import (
        decode_png,
        gradient_png_media,
        resize_media,
    )
    import numpy as np

    media = gradient_png_media(spark, n=3)
    rows = resize_media(media, width=6, height=5).collect()
    assert len(rows) == 3
    for r in rows:
        i = r.media_id
        w, h = 4 + i, 3 + i
        arr = decode_png(bytes(r.content))
        assert arr.shape == (5, 6, 3)
        xs = (np.arange(6) * w) // 6
        ys = (np.arange(5) * h) // 5
        assert np.array_equal(arr[:, :, 0], np.broadcast_to(xs, (5, 6)))
        assert np.array_equal(arr[:, :, 1], np.broadcast_to(ys[:, None], (5, 6)))
        assert r.meta["width"] == 6 and r.meta["height"] == 5


def test_resize_media_tolerates_null_content(spark):
    """A NULL image blob must flow through the stub path as a
    zero blob, not crash the Arrow batch on bytes(None)."""
    from artis_data_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    media = spark.createDataFrame(
        [
            (
                0, "image", None,
                {"width": None, "height": None, "n_frames": None,
                 "sample_rate": None},
            )
        ],
        MEDIA_SCHEMA,
    )
    rows = resize_media(media, width=4, height=3).collect()
    assert len(rows) == 1
    assert bytes(rows[0].content) == bytes(12)


def test_resize_media_real_avi_path(spark):
    """Video resize must decode real AVI frames, nearest-neighbor
    resample EVERY frame, and re-encode losslessly — pinned against
    numpy fancy-indexing on the gradient fixtures (frame f of video i
    has R=x, G=y, B=x+y+f)."""
    from artis_data_ingest_spark.operators.multimodal import (
        decode_avi,
        gradient_avi_media,
        resize_media,
    )
    import numpy as np

    media = gradient_avi_media(spark, n=3)
    rows = resize_media(media, width=6, height=5).collect()
    assert len(rows) == 3
    for r in rows:
        i = r.media_id
        w, h = 4 + i, 3 + i
        frames, fps = decode_avi(bytes(r.content))
        assert frames.shape[1:3] == (5, 6)
        assert frames.shape[0] == 2 + i  # frame count preserved
        xs = (np.arange(6) * w) // 6
        ys = (np.arange(5) * h) // 5
        for f in range(frames.shape[0]):
            assert np.array_equal(
                frames[f, :, :, 0], np.broadcast_to(xs, (5, 6))
            )
            assert np.array_equal(
                frames[f, :, :, 1],
                np.broadcast_to(ys[:, None], (5, 6)),
            )
            assert np.array_equal(
                frames[f, :, :, 2], xs[None, :] + ys[:, None] + f
            )
        assert r.meta["width"] == 6 and r.meta["height"] == 5


def test_resize_stub_video_is_frame_aware(spark):
    """A 'video' row with a non-AVI payload falls to the stub, which
    must emit n_frames*w*h bytes so the blob stays consistent with the
    n_frames its meta carries forward (ADVICE r6)."""
    from artis_data_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    media = spark.createDataFrame(
        [
            (
                0, "video", b"\x00\x01\x02not-an-avi",
                {"width": None, "height": None, "n_frames": 3,
                 "sample_rate": None},
            )
        ],
        MEDIA_SCHEMA,
    )
    rows = resize_media(media, width=4, height=3).collect()
    assert len(rows) == 1
    assert len(bytes(rows[0].content)) == 3 * 4 * 3
    assert rows[0].meta["n_frames"] == 3


# --- real baseline JPEG codec (r7) -----------------------------------------


def test_jpeg_flat_constant_tiles_bit_exact():
    """The exactness contract the q_jpeg_features oracle rests on:
    constant 8x8 tiles + flat quantization survive encode->decode
    bit-for-bit (DC-only integer blocks)."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    tiles = (np.arange(12).reshape(3, 4) * 37 + 5) % 256
    img = np.kron(tiles, np.ones((8, 8))).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quant="flat")), img)


def test_jpeg_flat_random_gray_near_exact_and_crops():
    """Arbitrary content with flat tables round-trips within 1 LSB (the
    float DCT/IDCT rounding); non-multiple-of-8 dimensions must be
    edge-padded on encode and cropped on decode."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant="flat"))
    assert out.shape == (13, 21)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_color_roundtrip_within_transform_rounding():
    """YCbCr 4:4:4 color: flat-quant error is bounded by the RGB<->YCbCr
    double rounding (a few LSB), never channel swaps or plane offsets."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant="flat"))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4


def test_jpeg_std_tables_smooth_content():
    """Annex K example tables (real lossy mode) must stay close on
    smooth content — a zigzag or dequant indexing bug explodes this."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    x = np.linspace(0, 255, 64)[None, :]
    y = np.linspace(0, 255, 48)[:, None]
    img = ((x + y) / 2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant="std"))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 8


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn: encoder emits restart markers, decoder must re-sync to
    the byte boundary and reset DC predictors — results identical to
    the unrestarted stream."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quant="flat"))
    blob = encode_jpeg(img, quant="flat", restart_interval=3)
    assert b"\xff\xdd" in blob  # DRI present
    assert np.array_equal(decode_jpeg(blob), plain)


def test_jpeg_rejects_unsupported_forms():
    import numpy as np
    import pytest

    from artis_data_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG....")
    with pytest.raises(ValueError, match="expects uint8"):
        encode_jpeg(np.zeros((8, 8), dtype=np.float64))
    # arithmetic coding (SOF9) must raise loudly, not decode garbage
    # (progressive SOF2 decodes for real as of r8)
    blob = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 1] = 0xC9
    with pytest.raises(ValueError, match="unsupported JPEG coding"):
        decode_jpeg(bytes(blob))
    # invalid sampling factors (hi=0) must raise, not divide by zero
    blob = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 11] = 0x01  # component 1 sampling 0x1
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsample="411")


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 (r8): constant 16x16 RGB tiles survive encode->decode
    bit-identically to the 4:4:4 path (chroma constant over every
    subsampled block; nearest-neighbor upsample restores the grid),
    with and without restart markers; 4:2:2 likewise on 16x8 tiles;
    std-quant 4:2:0 on smooth content stays within DCT rounding."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    tiles = rng.integers(0, 256, (2, 3, 3))
    img = np.kron(tiles, np.ones((16, 16, 1))).astype(np.uint8)
    d444 = decode_jpeg(encode_jpeg(img, quant="flat"))
    d420 = decode_jpeg(encode_jpeg(img, quant="flat", subsample="420"))
    d420r = decode_jpeg(
        encode_jpeg(img, quant="flat", subsample="420", restart_interval=2)
    )
    assert np.array_equal(d420, d444)
    assert np.array_equal(d420r, d444)
    # gray RGB (R=G=B) tiles: YCbCr is (v,128,128) exactly -> the
    # 4:2:0 roundtrip is bit-exact in RGB (the q_jpeg_features oracle)
    gtiles = rng.integers(0, 256, (2, 2))
    gimg = np.kron(
        gtiles[..., None], np.ones((16, 16, 3))
    ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(gimg, quant="flat", subsample="420")),
        gimg,
    )
    # 4:2:2 on 16x8 tiles
    img22 = np.kron(tiles, np.ones((8, 16, 1))).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img22, quant="flat", subsample="422")),
        decode_jpeg(encode_jpeg(img22, quant="flat")),
    )
    # odd (non-MCU-multiple) dims decode to the right crop
    odd = np.kron(
        rng.integers(0, 256, (2, 2, 3)), np.ones((9, 11, 1))
    ).astype(np.uint8)
    assert decode_jpeg(
        encode_jpeg(odd, quant="flat", subsample="420")
    ).shape == odd.shape
    # std tables + smooth gradient: lossy but close
    x = np.arange(32)[None, :, None]
    y = np.arange(32)[:, None, None]
    smooth = np.repeat(
        np.clip(100 + x * 2 + y, 0, 255).astype(np.uint8), 3, axis=2
    )
    d = decode_jpeg(
        encode_jpeg(smooth, quant="std", subsample="420")
    ).astype(int)
    assert np.abs(d - smooth.astype(int)).max() <= 8


def test_jpeg_header_probe_and_stats_dispatch(spark):
    """parse_media_header detects JPEG dims; image_stats dispatches on
    magic bytes so one operator serves PNG and JPEG rows."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import encode_jpeg
    from artis_data_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_stats,
        parse_media_header,
    )

    img = np.full((16, 24), 100, dtype=np.uint8)
    blob = encode_jpeg(img, quant="flat")
    hdr = parse_media_header(blob)
    assert hdr == {
        "detected": "jpeg", "width": 24, "height": 16, "sample_rate": None,
    }
    media = spark.createDataFrame(
        [(0, "image", blob,
          {"width": None, "height": None, "n_frames": None,
           "sample_rate": None})],
        MEDIA_SCHEMA,
    )
    r = image_stats(media.select("media_id", "content")).collect()[0]
    assert (r.width, r.height) == (24, 16)
    assert r.mean_r == r.mean_g == r.mean_b == round(100 / 255.0, 6)


def test_resize_media_real_jpeg_path(spark):
    """JPEG rows route through the real decode->NN-resample->re-encode
    chain in resize_media (not the byte-tiling stub): a constant-tile
    source stays exactly constant through resample + flat re-encode."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from artis_data_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    img = np.full((16, 16), 77, dtype=np.uint8)
    media = spark.createDataFrame(
        [(0, "image", encode_jpeg(img, quant="flat"),
          {"width": None, "height": None, "n_frames": None,
           "sample_rate": None})],
        MEDIA_SCHEMA,
    )
    r = resize_media(media, width=6, height=5).collect()[0]
    out = decode_jpeg(bytes(r.content))
    assert out.shape == (5, 6)
    assert np.all(out == 77)
    assert r.meta["width"] == 6 and r.meta["height"] == 5


def test_image_stats_tolerates_corrupt_payloads(spark):
    """A truncated/garbage image blob must surface as a null-stats row
    (the PERMISSIVE-JSONL analogue for media), not kill the job; clean
    rows in the same batch still decode."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import encode_jpeg
    from artis_data_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_stats,
    )

    good = encode_jpeg(np.full((8, 8), 10, dtype=np.uint8), quant="flat")
    meta = {"width": None, "height": None, "n_frames": None,
            "sample_rate": None}
    media = spark.createDataFrame(
        [
            (0, "image", good, meta),
            (1, "image", good[: len(good) // 2], meta),  # truncated JPEG
            (2, "image", b"\x89PNG\r\n\x1a\nGARBAGE", meta),  # torn PNG
            (3, "image", good, meta),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in image_stats(
        media.select("media_id", "content")
    ).collect()}
    assert rows[0].width == 8 and rows[0].mean_r == round(10 / 255.0, 6)
    assert rows[3].mean_r == rows[0].mean_r
    for bad in (1, 2):
        assert rows[bad].width is None and rows[bad].mean_r is None


def test_image_stats_tolerates_adversarial_corruptions(spark):
    """The specific corruption classes that raise NON-ValueError
    exceptions from the codecs (struct.error on a segment truncated
    mid-length, KeyError on a stripped DHT, zlib.error on a torn PNG
    IDAT, unknown SOS component id) must all surface as null-stats
    rows — the except clause is deliberately broad."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import encode_jpeg
    from artis_data_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        image_stats,
    )

    good = encode_jpeg(np.full((8, 8), 10, dtype=np.uint8), quant="flat")

    # (a) truncated mid-segment: cut 1 byte into a marker's length field
    dht_at = good.find(b"\xff\xc4")
    assert dht_at > 0
    trunc_mid_segment = good[: dht_at + 3]

    # (b) stripped DHT: splice every DHT segment out of the stream
    no_dht = bytearray()
    i = 0
    while i < len(good):
        if good[i] == 0xFF and i + 1 < len(good) and good[i + 1] == 0xC4:
            seg_len = int.from_bytes(good[i + 2 : i + 4], "big")
            i += 2 + seg_len
        else:
            no_dht.append(good[i])
            i += 1
    no_dht = bytes(no_dht)

    # (c) unknown SOS component id: patch the id byte inside SOS
    sos_at = good.find(b"\xff\xda")
    bad_comp = bytearray(good)
    bad_comp[sos_at + 5] = 0x7F  # component id that no SOF declared
    bad_comp = bytes(bad_comp)

    # (d) torn PNG IDAT: valid signature/IHDR, garbage zlib stream
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    png = encode_png(arr)
    idat_at = png.find(b"IDAT")
    torn_png = bytearray(png)
    for j in range(idat_at + 4, min(idat_at + 12, len(torn_png))):
        torn_png[j] ^= 0xA5
    torn_png = bytes(torn_png)

    meta = {"width": None, "height": None, "n_frames": None,
            "sample_rate": None}
    media = spark.createDataFrame(
        [
            (0, "image", good, meta),
            (1, "image", trunc_mid_segment, meta),
            (2, "image", no_dht, meta),
            (3, "image", bad_comp, meta),
            (4, "image", torn_png, meta),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in image_stats(
        media.select("media_id", "content")
    ).collect()}
    assert rows[0].width == 8 and rows[0].mean_r == round(10 / 255.0, 6)
    for bad in (1, 2, 3, 4):
        assert rows[bad].width is None and rows[bad].mean_r is None


def test_jpeg_bitreader_accumulator_stays_bounded():
    """Consumed bits must be dropped from the accumulator so decode is
    linear in entropy-stream length (a multi-MB scraped JPEG would be
    O(n^2) otherwise): after any number of reads, _acc holds at most
    _nbits bits."""
    from artis_data_ingest_spark.operators.jpeg import _BitReader

    br = _BitReader(bytes(range(1, 250)) * 64, 0)
    for i in range(40_000):
        br.bits(3)
        assert br._acc.bit_length() <= br._nbits


def test_jpeg_progressive_roundtrip_and_baseline_parity():
    """Progressive (SOF2, spectral-selection scans): decode must equal
    the baseline decode of the same image for every layout — the two
    codings carry identical coefficients."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    g = np.kron(rng.integers(0, 256, (2, 4)), np.ones((8, 8))).astype(
        np.uint8
    )
    pb = encode_jpeg(g, quant="flat", progressive=True)
    assert b"\xff\xc2" in pb and pb.count(b"\xff\xda") == 2
    assert np.array_equal(decode_jpeg(pb), g)

    t3 = rng.integers(0, 256, (3, 2, 3))
    img = np.kron(t3, np.ones((8, 8, 1))).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, quant="flat", progressive=True)),
        decode_jpeg(encode_jpeg(img, quant="flat")),
    )
    x = np.arange(24)[None, :, None]
    y = np.arange(24)[:, None, None]
    smooth = np.repeat(
        np.clip(90 + 3 * x + 2 * y, 0, 255).astype(np.uint8), 3, axis=2
    )
    assert np.array_equal(
        decode_jpeg(encode_jpeg(smooth, quant="std", progressive=True)),
        decode_jpeg(encode_jpeg(smooth, quant="std")),
    )
    img420 = np.kron(
        rng.integers(0, 256, (2, 2, 3)), np.ones((16, 16, 1))
    ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(
            encode_jpeg(
                img420, quant="flat", subsample="420", progressive=True
            )
        ),
        decode_jpeg(encode_jpeg(img420, quant="flat", subsample="420")),
    )
    odd = np.kron(
        rng.integers(0, 256, (2, 3, 3)), np.ones((9, 11, 1))
    ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(odd, quant="flat", progressive=True)),
        decode_jpeg(encode_jpeg(odd, quant="flat")),
    )
    with __import__("pytest").raises(ValueError, match="restart"):
        encode_jpeg(g, progressive=True, restart_interval=2)


def test_jpeg_progressive_successive_approximation_decode():
    """Wild progressive files use successive approximation; our
    encoder is SS-only, so the SA path is pinned by a HAND-BUILT
    4-scan stream (DC first Al=1 → AC first Al=1 → DC refine → AC
    refine with a newly-significant coefficient and a correction
    bit).  Expected pixels computed from the target coefficients by
    the same IDCT the decoder uses."""
    import struct

    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        AC_LUMA_SPEC,
        DC_LUMA_SPEC,
        ZIGZAG,
        _BitWriter,
        _huff_codes,
        _M,
        decode_jpeg,
    )

    dc = _huff_codes(DC_LUMA_SPEC)
    ac = _huff_codes(AC_LUMA_SPEC)

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # flat quant
    out += seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    bits, vals = DC_LUMA_SPEC
    out += seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    bits, vals = AC_LUMA_SPEC
    out += seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))

    def scan(ss, se, ah, al, write):
        bw = _BitWriter()
        write(bw)
        bw.flush()
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])) + bytes(
            bw.out
        )

    # target zigzag coefficients: DC=5, AC1=3, AC2=-1
    def dc_first(bw):  # diff = 5 >> 1 = 2 -> cat 2, bits '10'
        ln, code = dc[2]
        bw.write(code, ln)
        bw.write(2, 2)

    def ac_first(bw):  # AC1 at level 1: (r=0,s=1) val 1; AC2 truncates to 0; EOB
        ln, code = ac[0x01]
        bw.write(code, ln)
        bw.write(1, 1)
        ln, code = ac[0x00]
        bw.write(code, ln)

    def dc_refine(bw):  # bit0 of DC=5 -> 1
        bw.write(1, 1)

    def ac_refine(bw):
        # newly-significant AC2=-1: rs=(0,1), sign bit 0 (negative);
        # walking to it crosses AC1 (nonzero history) -> correction
        # bit 1 (|3| bit0); then EOB0 ends the band
        ln, code = ac[0x01]
        bw.write(code, ln)
        bw.write(0, 1)  # sign -> -1
        bw.write(1, 1)  # correction bit for AC1: 2 -> 3
        ln, code = ac[0x00]
        bw.write(code, ln)

    out += scan(0, 0, 0, 1, dc_first)
    out += scan(1, 63, 0, 1, ac_first)
    out += scan(0, 0, 1, 0, dc_refine)
    out += scan(1, 63, 1, 0, ac_refine)
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    nat = np.zeros(64, dtype=np.int64)
    nat[ZIGZAG[[0, 1, 2]]] = [5, 3, -1]
    want = np.clip(
        np.rint(_M.T @ nat.reshape(8, 8).astype(np.float64) @ _M + 128.0),
        0, 255,
    ).astype(np.uint8)
    assert np.array_equal(got, want)


def test_jpeg_progressive_eobn_run_decode():
    """EOBn runs (r>0) span blocks: a 16x8 grayscale progressive
    stream whose AC scan codes one coefficient in block 0 then ends
    BOTH blocks with a single EOB2 (eobrun covers block 0's tail and
    all of block 1).  Wild progressive encoders emit EOBn constantly;
    our own encoder is EOB0-only, so this path needs a hand-built
    stream."""
    import struct

    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        AC_LUMA_SPEC,
        DC_LUMA_SPEC,
        ZIGZAG,
        _BitWriter,
        _huff_codes,
        _M,
        decode_jpeg,
    )

    dc = _huff_codes(DC_LUMA_SPEC)
    # custom AC table including the EOB2 symbol 0x10 (Annex K tables
    # carry no EOBn>1 symbols — progressive files ship custom DHTs)
    ac_bits = [0] * 16
    ac_vals = [0x00, 0x01, 0x10]
    ac_bits[1] = 1  # 0x00 at 2 bits? -> lengths: give all three 2-3 bits
    ac_bits = [0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_spec = (ac_bits, ac_vals)
    ac = _huff_codes(ac_spec)

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += seg(0xC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    bits, vals = DC_LUMA_SPEC
    out += seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))

    # DC scan: block0 DC=4 (diff 4), block1 DC=4 (diff 0), Al=0
    bw = _BitWriter()
    ln, code = dc[3]
    bw.write(code, ln)
    bw.write(4, 3)  # diff +4
    ln, code = dc[0]
    bw.write(code, ln)  # diff 0
    bw.flush()
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + bytes(bw.out)

    # AC scan Ss=1..63 Al=0: block0: AC1=1 then EOB2 ends blocks 0+1
    bw = _BitWriter()
    ln, code = ac[0x01]
    bw.write(code, ln)
    bw.write(1, 1)  # value +1
    ln, code = ac[0x10]  # EOBn with r=1
    bw.write(code, ln)
    bw.write(0, 1)  # eobrun = (1<<1)-1 + 0 = 1 extra block
    bw.flush()
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + bytes(bw.out)
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    nat0 = np.zeros(64, dtype=np.int64)
    nat0[ZIGZAG[[0, 1]]] = [4, 1]
    nat1 = np.zeros(64, dtype=np.int64)
    nat1[ZIGZAG[0]] = 4
    def blk(nat):
        return np.clip(
            np.rint(
                _M.T @ nat.reshape(8, 8).astype(np.float64) @ _M + 128.0
            ),
            0, 255,
        ).astype(np.uint8)
    want = np.hstack([blk(nat0), blk(nat1)])
    assert got.shape == (8, 16)
    assert np.array_equal(got, want)


def test_gif_roundtrip_paths():
    """GIF codec: lossless roundtrip for plain, interlaced, 256-color
    (LZW table growth + clear codes) and animated forms; header probe;
    unsupported forms raise."""
    import numpy as np
    import pytest

    from artis_data_ingest_spark.operators.gif import (
        decode_gif,
        encode_gif,
        parse_gif_header,
    )

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    img = pal[rng.integers(0, 8, (13, 17))]
    assert np.array_equal(decode_gif(encode_gif(img))[0], img)
    assert np.array_equal(
        decode_gif(encode_gif(img, interlace=True))[0], img
    )
    assert parse_gif_header(encode_gif(img)) == (13, 17, 1)

    frames = pal[rng.integers(0, 8, (4, 9, 11))]
    blob = encode_gif(frames, delay_cs=10)
    assert np.array_equal(decode_gif(blob), frames)
    assert parse_gif_header(blob) == (9, 11, 4)

    big_pal = np.array(
        [[i, (i * 7) % 256, (i * 13) % 256] for i in range(256)],
        dtype=np.uint8,
    )
    big = big_pal[rng.integers(0, 256, (64, 64))]
    assert np.array_equal(decode_gif(encode_gif(big))[0], big)

    with pytest.raises(ValueError, match="256 distinct"):
        too_many = np.arange(18 * 16 * 3, dtype=np.uint8).reshape(18, 16, 3)
        too_many[..., 0] = np.arange(18, dtype=np.uint8)[:, None]
        encode_gif(too_many)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG....")
    assert parse_gif_header(b"junk") is None


def test_gif_transparency_composites_over_previous_frame():
    """GCE transparency: a transparent pixel keeps the previous
    composite — hand-built 2-frame stream where frame 2 overwrites
    only one half."""
    import struct

    import numpy as np

    from artis_data_ingest_spark.operators.gif import (
        _lzw_encode,
        decode_gif,
    )

    # palette: 0=red 1=blue 2=green; screen 2x2
    pal = b"\xff\x00\x00" + b"\x00\x00\xff" + b"\x00\xff\x00" + b"\x00\x00\x00"
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 2, 2)
    out += bytes([0x80 | (1 << 4) | 1, 0, 0])  # GCT, 4 entries
    out += pal
    # frame 1: all red (index 0)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
    out += _lzw_encode(np.zeros(4, dtype=np.uint8), 2)
    # frame 2: GCE transparency on index 3; pixels [3,3,1,1] ->
    # top row stays red, bottom row becomes blue
    out += b"\x21\xf9\x04\x01\x05\x00\x03\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
    out += _lzw_encode(np.array([3, 3, 1, 1], dtype=np.uint8), 2)
    out += b"\x3b"

    frames = decode_gif(bytes(out))
    assert frames.shape == (2, 2, 2, 3)
    assert np.array_equal(frames[0].reshape(-1, 3)[0], [255, 0, 0])
    assert np.array_equal(frames[1][0, 0], [255, 0, 0])  # kept
    assert np.array_equal(frames[1][1, 1], [0, 0, 255])  # overwritten


def test_resize_media_real_gif_paths(spark):
    """GIF resize goes through the real codec for stills AND
    animations (frame count preserved, lossless re-encode)."""
    import numpy as np

    from artis_data_ingest_spark.operators.gif import (
        decode_gif,
        encode_gif,
    )
    from artis_data_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    rng = np.random.default_rng(3)
    still = pal[rng.integers(0, 2, (16, 16))]
    anim = pal[rng.integers(0, 2, (3, 16, 16))]
    meta = {"width": None, "height": None, "n_frames": None,
            "sample_rate": None}
    media = spark.createDataFrame(
        [
            (0, "image", encode_gif(still), meta),
            (1, "video", encode_gif(anim), meta),
        ],
        MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in resize_media(media, 8, 8).collect()}
    s8 = decode_gif(bytes(out[0].content))
    assert s8.shape == (1, 8, 8, 3)
    ys = (np.arange(8) * 16) // 8
    assert np.array_equal(s8[0], still[ys][:, ys])
    a8 = decode_gif(bytes(out[1].content))
    assert a8.shape == (3, 8, 8, 3)
    assert np.array_equal(a8, anim[:, ys][:, :, ys])


def test_bmp_roundtrip_and_topdown():
    """BMP encode/decode is byte-exact (lossless), the top-down
    (negative-height) variant decodes to the same pixels, and corrupt
    payloads raise ValueError instead of garbage."""
    import struct

    import numpy as np
    import pytest

    from artis_data_ingest_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        parse_media_header,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # odd width: stride pad
    blob = encode_bmp(img)
    assert np.array_equal(decode_bmp(blob), img)
    hdr = parse_media_header(blob)
    assert hdr == {"detected": "bmp", "width": 7, "height": 5,
                   "sample_rate": None}
    # top-down rewrite: negate height, reorder rows -> same pixels
    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    body = blob[54:]
    flipped = b"".join(
        body[(h - 1 - r) * stride:(h - r) * stride] for r in range(h)
    )
    td = blob[:22] + struct.pack("<i", -h) + blob[26:54] + flipped
    assert np.array_equal(decode_bmp(td), img)
    assert parse_media_header(td)["height"] == 5
    with pytest.raises(ValueError):
        decode_bmp(blob[:40])  # truncated header
    with pytest.raises(ValueError):
        decode_bmp(blob[:60])  # truncated pixel data


def test_bmp_image_stats_tolerates_corrupt_payload(spark):
    """A torn BMP yields a null-stats row through image_stats, never a
    job failure (the corrupt-payload contract shared by all codecs)."""
    from artis_data_ingest_spark.operators.multimodal import (
        image_stats,
        tile_bmp_media,
    )

    media = tile_bmp_media(spark, n=2).select("media_id", "content")
    broken = spark.createDataFrame(
        [(99, bytearray(b"BM" + b"\x00" * 30))],
        "media_id bigint, content binary",
    )
    out = {r["media_id"]: r for r in image_stats(media.union(broken)).collect()}
    assert out[99]["width"] is None and out[99]["mean_r"] is None
    assert out[0]["width"] == 8


def test_tiff_roundtrip_matrix():
    """TIFF encode/decode is byte-exact across the full encoding
    matrix (r14): gray/RGB x none/PackBits x II/MM x single/multi
    strip x BlackIsZero/WhiteIsZero; PackBits round-trips arbitrary
    and low-entropy byte streams; corrupt payloads raise ValueError
    instead of decoding garbage."""
    import numpy as np
    import pytest

    from artis_data_ingest_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
        packbits_decode,
        packbits_encode,
    )

    rng = np.random.default_rng(7)
    for gray in (True, False):
        for comp in ("none", "packbits"):
            for be in (False, True):
                for rps in (None, 2):
                    shape = (5, 7) if gray else (5, 7, 3)
                    img = rng.integers(0, 256, shape, dtype=np.uint8)
                    blob = encode_tiff(
                        img, compression=comp, big_endian=be,
                        rows_per_strip=rps,
                    )
                    assert np.array_equal(decode_tiff(blob), img)
    # WhiteIsZero stores inverted, decodes back to the original
    img = rng.integers(0, 256, (4, 6), dtype=np.uint8)
    blob = encode_tiff(img, photometric=0, compression="packbits")
    assert np.array_equal(decode_tiff(blob), img)
    # the stored strip really is inverted (a decoder ignoring
    # photometric 0 would return 255-img)
    plain = encode_tiff(img, photometric=1)
    assert decode_tiff(plain).tobytes() == img.tobytes()
    # PackBits stream edge cases
    for data in (b"", b"a", b"a" * 300, bytes(range(256)) * 2,
                 b"aabbbccccddddd" * 40):
        assert packbits_decode(
            packbits_encode(data), len(data)
        ) == data
    for bad in (
        b"",
        b"II",
        b"II*\x00\x00\x00",
        encode_tiff(np.zeros((4, 4), np.uint8))[:20],
        encode_tiff(np.zeros((4, 4), np.uint8))[:-5],
    ):
        with pytest.raises(ValueError):
            decode_tiff(bad)


def test_tiff_image_stats_tolerates_corrupt_payload(spark):
    """A torn TIFF yields a null-stats row through image_stats, never
    a job failure (the corrupt-payload contract shared by all
    codecs); intact fixtures decode through the same magic-byte
    dispatch."""
    from artis_data_ingest_spark.operators.multimodal import (
        gradient_tiff_media,
        image_stats,
    )

    media = gradient_tiff_media(spark, n=2).select(
        "media_id", "content"
    )
    broken = spark.createDataFrame(
        [(99, bytearray(b"II\x2a\x00" + b"\x08" + b"\x00" * 9))],
        "media_id bigint, content binary",
    )
    out = {
        r["media_id"]: r
        for r in image_stats(media.union(broken)).collect()
    }
    assert out[99]["width"] is None and out[99]["mean_r"] is None
    assert out[0]["width"] == 4 and out[0]["height"] == 3
    assert out[1]["width"] == 5


def test_g711_tables_and_wav_decode():
    """r14 G.711: the expansion tables bit-match CPython's audioop
    reference (when present — removed in 3.13, hence the guard), the
    format-6/7 WAV path decodes raw codes to exactly the table
    values with correct channel de-interleave, and unsupported
    formats still refuse."""
    import numpy as np
    import pytest

    from artis_data_ingest_spark.operators.multimodal import (
        _ALAW_TABLE,
        _MULAW_TABLE,
        decode_wav,
        encode_wav_g711,
    )

    try:
        import audioop  # stdlib until 3.12; the independent referee
    except ImportError:
        audioop = None
    if audioop is not None:
        b = bytes(range(256))
        assert np.array_equal(
            np.frombuffer(audioop.ulaw2lin(b, 2), dtype="<i2"),
            _MULAW_TABLE,
        )
        assert np.array_equal(
            np.frombuffer(audioop.alaw2lin(b, 2), dtype="<i2"),
            _ALAW_TABLE,
        )
    # spot-pin the sign conventions independently of audioop:
    # mu-law 0xFF and 0x7F are the two zero codes; A-law sign bit
    # (after the 0x55 toggle) set means POSITIVE
    assert _MULAW_TABLE[0xFF] == 0 and _MULAW_TABLE[0x7F] == 0
    assert _MULAW_TABLE[0x80] == 32124 and _MULAW_TABLE[0x00] == -32124
    assert _ALAW_TABLE[0xD5] == 8 and _ALAW_TABLE[0x55] == -8
    assert _ALAW_TABLE[0xAA] == 32256 and _ALAW_TABLE[0x2A] == -32256

    codes = np.arange(64, dtype=np.uint8).reshape(32, 2)
    for law, table in (("mulaw", _MULAW_TABLE), ("alaw", _ALAW_TABLE)):
        samples, sr = decode_wav(encode_wav_g711(codes, 8000, law))
        assert sr == 8000 and samples.shape == (32, 2)
        assert np.array_equal(samples, table[codes])
    # unsupported still refuses loudly
    import struct

    blob = encode_wav_g711(codes, 8000, "alaw")
    bad = blob.replace(
        struct.pack("<HH", 6, 2), struct.pack("<HH", 17, 2), 1
    )
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_image_dhash_invariance_and_pairs(spark):
    """dHash must be invariant to the global brightness shift between
    variants (hamming 0), tolerant of the single-cell bump on variant
    2 (hamming <= 2), and families must never pair (>= 25 bits
    apart).  Exactly the 12 within-family pairs survive banding."""
    from artis_data_ingest_spark.operators.multimodal import (
        dhash_pairs,
        dhash_png_media,
        image_dhash,
    )

    media = dhash_png_media(spark)
    sig = {
        r["media_id"]: (r["dhash_lo"], r["dhash_hi"])
        for r in image_dhash(media.select("media_id", "content")).collect()
    }
    assert len(sig) == 12 and all(v[0] is not None for v in sig.values())
    for f in range(4):
        base, shift, bump = sig[f * 3], sig[f * 3 + 1], sig[f * 3 + 2]
        assert base == shift  # brightness shift cancels exactly
        ham = bin(base[0] ^ bump[0]).count("1") + bin(
            base[1] ^ bump[1]
        ).count("1")
        assert 1 <= ham <= 2
    pairs = dhash_pairs(
        image_dhash(media.select("media_id", "content"))
    ).collect()
    got = {(r["media_id_a"], r["media_id_b"]) for r in pairs}
    want = {
        (f * 3 + i, f * 3 + j)
        for f in range(4)
        for i in range(3)
        for j in range(i + 1, 3)
    }
    assert got == want


def test_image_dhash_corrupt_payload_null_row(spark):
    """A torn payload must yield a null-hash row, not kill the job."""
    from artis_data_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        dhash_png_media,
        image_dhash,
    )

    media = dhash_png_media(spark, families=1, variants=1).unionByName(
        spark.createDataFrame(
            [(99, "image", b"\x89PNG\r\n\x1a\ntorn", {
                "width": None, "height": None, "n_frames": None,
                "sample_rate": None})],
            MEDIA_SCHEMA,
        )
    )
    rows = {r["media_id"]: r for r in
            image_dhash(media.select("media_id", "content")).collect()}
    assert rows[99]["dhash_lo"] is None
    assert rows[0]["dhash_lo"] is not None


def test_exif_roundtrip_both_byte_orders_and_corruption():
    import struct

    import numpy as np

    from artis_data_ingest_spark.operators.exif import (
        build_exif_app1,
        inject_app1,
        parse_exif,
    )
    from artis_data_ingest_spark.operators.jpeg import encode_jpeg

    base = encode_jpeg(np.full((8, 8), 100, np.uint8), quant="flat")
    app1 = build_exif_app1("NIKON", "D850-Professional", 6,
                           "2023:07:04 08:30:00")
    tagged = inject_app1(base, app1)
    got = parse_exif(tagged)
    assert got == {
        "make": "NIKON",
        "model": "D850-Professional",
        "orientation": 6,
        "datetime": "2023:07:04 08:30:00",
    }
    # MM (big-endian) variant parses too: rewrite header+IFD by hand
    mm_tiff = (
        b"MM" + struct.pack(">HI", 42, 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHIHH", 0x0112, 3, 1, 8, 0)
        + struct.pack(">I", 0)
    )
    mm = inject_app1(base, b"Exif\x00\x00" + mm_tiff)
    assert parse_exif(mm)["orientation"] == 8
    # no EXIF -> nulls; truncated APP1 -> nulls, never raises
    assert parse_exif(base)["make"] is None
    assert parse_exif(tagged[: len(tagged) // 2])["make"] in ("NIKON", None)
    broken = tagged[:8] + b"\x00" * 4 + tagged[12:]
    assert isinstance(parse_exif(broken), dict)


def test_parse_mp3_walks_frames_and_accounts_junk():
    from artis_data_ingest_spark.operators.mp3 import (
        BITRATE_V1L3,
        parse_mp3,
    )

    def frame(bidx=9, sridx=0, pad=0):
        kbps = BITRATE_V1L3[bidx]
        sr = [44100, 48000, 32000][sridx]
        fsize = 144000 * kbps // sr + pad
        return bytes([0xFF, 0xFB, (bidx << 4) | (sridx << 2) | (pad << 1), 0]) + bytes(
            (k * 3) % 251 for k in range(fsize - 4)
        )

    # plain CBR
    m = parse_mp3(frame() * 10)
    assert m["valid"] and m["n_frames"] == 10 and not m["vbr"]
    assert m["sample_rate"] == 44100 and m["n_junk_bytes"] == 0
    assert m["duration_us"] == 10 * 1152 * 1_000_000 // 44100
    # VBR + padding bit changes the frame size, not the fields
    m = parse_mp3(frame(5) + frame(9, pad=1) + frame(12))
    assert m["n_frames"] == 3 and m["vbr"]
    assert m["sum_bitrate_kbps"] == (
        BITRATE_V1L3[5] + BITRATE_V1L3[9] + BITRATE_V1L3[12]
    )
    # ID3v2 skip (syncsafe size)
    tag = b"ID3\x03\x00\x00\x00\x00\x01\x05" + b"\x21" * 133  # 1<<7|5 = 133
    m = parse_mp3(tag + frame() * 2)
    assert m["has_id3v2"] and m["n_frames"] == 2 and m["n_junk_bytes"] == 0
    # mid-stream garbage resyncs; bytes counted
    m = parse_mp3(frame() + b"\x21" * 9 + frame())
    assert m["n_frames"] == 2 and m["n_junk_bytes"] == 9
    # truncated trailing frame is junk, not a frame
    whole = frame() * 3
    m = parse_mp3(whole[:-17])
    assert m["n_frames"] == 2
    assert m["n_junk_bytes"] == len(frame()) - 17
    # no frames at all / empty
    assert parse_mp3(b"\x21" * 40) == {
        "valid": False, "n_frames": 0, "sample_rate": 0, "vbr": False,
        "sum_bitrate_kbps": 0, "duration_us": 0, "has_id3v2": False,
        "n_junk_bytes": 40,
    }
    assert parse_mp3(b"")["valid"] is False
    # non-MPEG1 / non-LayerIII headers are junk, not frames
    bad = bytearray(frame())
    bad[1] = 0xF3  # MPEG-2 bit pattern
    m = parse_mp3(bytes(bad))
    assert m["n_frames"] == 0 and m["n_junk_bytes"] == len(bad)


def test_h264_sps_parse_roundtrips_and_rejects_unsupported():
    from artis_data_ingest_spark.operators.h264 import (
        _unescape_rbsp,
        encode_sps,
        parse_h264_annexb,
        parse_sps,
    )

    for prof in (66, 100):
        for wm, hu, crop in [
            (2, 1, (0, 0, 0, 0)),
            (5, 4, (1, 2, 0, 1)),
            (120, 68, (0, 4, 0, 2)),
        ]:
            sps = encode_sps(prof, 31, wm, hu, crop)
            m = parse_sps(_unescape_rbsp(sps[1:]))
            assert m["profile_idc"] == prof
            assert m["width"] == wm * 16 - 2 * (crop[0] + crop[1])
            assert m["height"] == hu * 16 - 2 * (crop[2] + crop[3])
    # escape path: level 0 + sps_id 127 produces a literal 00 00 01
    sps = encode_sps(66, 0, 4, 3, sps_id=127)
    assert b"\x00\x00\x03" in sps
    m = parse_sps(_unescape_rbsp(sps[1:]))
    assert (m["width"], m["height"]) == (64, 48)
    # NAL walk: 3- and 4-byte start codes, junk prefix, counts
    blob = (
        b"\x55" * 4
        + b"\x00\x00\x00\x01" + encode_sps(66, 10, 2, 1)
        + b"\x00\x00\x01" + b"\x68AA"
        + b"\x00\x00\x01" + b"\x65" + b"B" * 5
        + b"\x00\x00\x01" + b"\x61" + b"C" * 4
        + b"\x00\x00\x01" + b"\x66" + b"D" * 2
    )
    m = parse_h264_annexb(blob)
    assert m["valid"]
    assert (m["n_sps"], m["n_pps"], m["n_idr"], m["n_slices"], m["n_sei"]) \
        == (1, 1, 1, 1, 1)
    # no start code at all -> invalid, zeroed geometry
    m = parse_h264_annexb(b"\x41" * 50)
    assert not m["valid"] and m["n_nals"] == 0 and m["width"] == 0
    # truncated / empty
    assert not parse_h264_annexb(b"")["valid"]
    assert not parse_h264_annexb(b"\x00\x00\x01")["valid"]


def test_mp4_box_walk_edges():
    """operators/mp4.py: 64-bit largesize, size-0 to-end, unknown-box
    counting, overrun-marks-truncated, garbage rejection, and both
    mvhd/tkhd version layouts."""
    from artis_data_ingest_spark.operators.mp4 import (
        _box,
        _mvhd,
        _tkhd,
        _trak,
        parse_mp4,
    )

    # size-0 final box extends to end of file
    moov = _box(b"moov", _mvhd(0, 1000, 5000)
                + _trak(0, 1, b"avc1", 640, 480))
    tail = (0).to_bytes(4, "big") + b"mdat" + bytes(32)
    m = parse_mp4(moov + tail)
    assert m["valid"] and not m["truncated"]
    assert m["timescale"] == 1000 and m["duration_us"] == 5_000_000
    assert m["width"] == 640 and m["height"] == 480
    assert m["codecs"] == "avc1" and m["n_tracks"] == 1

    # version-1 (64-bit) layouts parse identically
    moov1 = _box(b"moov", _mvhd(1, 90000, 90000 * 7)
                 + _trak(1, 1, b"hvc1", 1920, 1080))
    m1 = parse_mp4(moov1)
    assert m1["duration_us"] == 7_000_000 and m1["width"] == 1920
    assert m1["codecs"] == "hvc1"

    # largesize mdat + unknown box counted, not fatal
    blob = _box(b"junQ", bytes(10)) + moov + _box(b"mdat", bytes(8),
                                                  large=True)
    m2 = parse_mp4(blob)
    assert m2["n_unknown"] == 1 and not m2["truncated"]

    # declared size overruns the file: truncated, prior metadata kept
    over = moov + (1000).to_bytes(4, "big") + b"mdat" + bytes(4)
    m3 = parse_mp4(over)
    assert m3["truncated"] and m3["timescale"] == 1000

    # garbage: invalid
    g = parse_mp4(bytes(range(48)))
    assert not g["valid"] and g["n_boxes"] == 0

    # empty
    assert not parse_mp4(b"")["valid"]


def test_media_probe_detects_mp4():
    from artis_data_ingest_spark.operators.mp4 import _box, _mvhd, _trak
    from artis_data_ingest_spark.operators.multimodal import (
        parse_media_header,
    )

    ftyp = _box(b"ftyp", b"isom" + bytes(4) + b"isommp42")
    moov = _box(b"moov", _mvhd(0, 600, 600)
                + _trak(0, 1, b"avc1", 320, 240))
    got = parse_media_header(ftyp + moov)
    assert got["detected"] == "mp4"
    assert got["width"] == 320 and got["height"] == 240
    # garbage with ftyp-like offset but no valid boxes stays unknown
    assert parse_media_header(b"\xff\xff\xff\xffftypXXXX")["detected"] \
        == "unknown"


def test_mp4_tracks_per_trak_rows():
    from artis_data_ingest_spark.operators.mp4 import (
        _box,
        _mvhd,
        _trak,
        parse_mp4_tracks,
    )

    moov = _box(
        b"moov",
        _mvhd(0, 600, 1200)
        + _trak(0, 7, b"avc1", 640, 360)
        + _trak(1, 9, b"mp4a", 0, 0),
    )
    zeros = {"n_samples": 0, "n_chunks": 0, "duration_us": 0,
             "total_bytes": 0, "bitrate_bps": 0}
    rows = parse_mp4_tracks(moov + _box(b"mdat", bytes(8)))
    assert rows == [
        {"track_id": 7, "handler": "vide", "codec": "avc1",
         "width": 640, "height": 360, **zeros},
        {"track_id": 9, "handler": "soun", "codec": "mp4a",
         "width": 0, "height": 0, **zeros},
    ]
    assert parse_mp4_tracks(bytes(range(48))) == []


def test_mp4_sample_tables_exact():
    """r12: stts/stsz/stco under stbl — n_samples, exact duration from
    the stts runs over the mdhd MEDIA timescale, total bytes from both
    stsz forms, chunk count, and integer-exact bitrate."""
    from artis_data_ingest_spark.operators.mp4 import (
        _box,
        _mvhd,
        _trak,
        parse_mp4,
        parse_mp4_tracks,
    )

    # fixed-sample_size stsz; media timescale 48000 (≠ movie 600)
    s = {"mts": 48000, "stts": [(10, 4800), (5, 9600)],
         "stsz": (1200, 15), "chunks": 4}
    moov = _box(b"moov", _mvhd(0, 600, 600)
                + _trak(0, 1, b"avc1", 320, 240, samples=s))
    r = parse_mp4_tracks(moov)[0]
    ticks = 10 * 4800 + 5 * 9600  # 96000 → 2 s of media time
    assert r["n_samples"] == 15 and r["n_chunks"] == 4
    assert r["duration_us"] == ticks * 1_000_000 // 48000 == 2_000_000
    assert r["total_bytes"] == 1200 * 15
    assert r["bitrate_bps"] == 1200 * 15 * 8 * 1_000_000 // 2_000_000

    # per-sample-table stsz
    s2 = {"mts": 1000, "stts": [(3, 500)],
          "stsz": (0, 3, [100, 200, 300]), "chunks": 1}
    moov2 = _box(b"moov", _mvhd(0, 600, 600)
                 + _trak(0, 2, b"mp4a", 0, 0, samples=s2))
    r2 = parse_mp4_tracks(moov2)[0]
    assert r2["total_bytes"] == 600 and r2["duration_us"] == 1_500_000
    assert r2["bitrate_bps"] == 600 * 8 * 1_000_000 // 1_500_000

    # the sample-table boxes are known to the clip-level walk too
    m = parse_mp4(moov)
    assert m["n_unknown"] == 0


def test_mp4_depth_cap_no_recursion_error():
    """r12 ADVICE fix: ~1000 nested container boxes (8 bytes each) must
    degrade to truncated/empty, not RecursionError inside mapInPandas."""
    from artis_data_ingest_spark.operators.mp4 import (
        parse_mp4,
        parse_mp4_tracks,
    )

    deep = b""
    for _ in range(1000):
        deep = (8 + len(deep)).to_bytes(4, "big") + b"moov" + deep
    m = parse_mp4(deep)
    assert m["truncated"] and m["valid"]  # boxes before the cap count
    assert parse_mp4_tracks(deep) == []


# --- IMA ADPCM (r14) --------------------------------------------------------

_IMA_STEP = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_IDX = [-1, -1, -1, -1, 2, 4, 6, 8] * 2


def _ima_mirror(nibs, pred, idx):
    """Scalar spec replay, independent of the numpy decoder."""
    out = [pred]
    for n in nibs:
        step = _IMA_STEP[idx]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _IMA_IDX[n]))
        out.append(pred)
    return out


def test_ima_adpcm_matches_scalar_mirror_mono_and_stereo():
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ima_raw,
    )

    rng_codes = [(13 * t + 5) % 16 for t in range(48)]
    for ch in (1, 2):
        nibs = np.array(
            [[(c + 3 * k) % 16 for c in rng_codes] for k in range(ch)],
            dtype=np.uint8,
        )
        preds = np.array([-2000 + 700 * k for k in range(ch)])
        idxs = np.array([(11 * k + 5) % 89 for k in range(ch)])
        samples, sr = decode_wav(
            encode_wav_ima_raw(nibs, preds, idxs, 16000)
        )
        assert sr == 16000
        assert samples.shape == (49, ch)
        for k in range(ch):
            assert list(samples[:, k]) == _ima_mirror(
                list(nibs[k]), int(preds[k]), int(idxs[k])
            )


def test_ima_adpcm_clamps_predictor_and_index():
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ima_raw,
    )

    # code 7 (+max diff, index +8) from a high start must clamp at
    # 32767 and index at 88; code 15 symmetric at -32768
    up = np.full((1, 16), 7, dtype=np.uint8)
    s, _ = decode_wav(encode_wav_ima_raw(
        up, np.array([30000]), np.array([80]), 8000))
    assert s[:, 0].max() == 32767
    down = np.full((1, 16), 15, dtype=np.uint8)
    s2, _ = decode_wav(encode_wav_ima_raw(
        down, np.array([-30000]), np.array([80]), 8000))
    assert s2[:, 0].min() == -32768
    # mirror agrees on both edges
    assert list(s[:, 0]) == _ima_mirror([7] * 16, 30000, 80)
    assert list(s2[:, 0]) == _ima_mirror([15] * 16, -30000, 80)


def test_ima_adpcm_multiblock_resets_state_per_block():
    import struct

    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ima_raw,
    )

    # two identical blocks → decoded halves identical (state is
    # per-block, carried in each header)
    nibs = np.array([[(t * 7) % 16 for t in range(8)]], dtype=np.uint8)
    one = encode_wav_ima_raw(nibs, np.array([1234]), np.array([40]),
                             8000)
    # splice the single data block twice into one WAV
    hdr_end = one.index(b"data") + 8
    block = one[hdr_end:]
    two = bytearray(one[:hdr_end] + block + block)
    two[hdr_end - 4:hdr_end] = struct.pack("<I", 2 * len(block))
    two[4:8] = struct.pack("<I", len(two) - 8)
    samples, _ = decode_wav(bytes(two))
    assert samples.shape == (18, 1)
    assert list(samples[:9, 0]) == list(samples[9:, 0])


def test_ima_adpcm_bad_block_align_raises():
    import pytest

    from artis_data_ingest_spark.operators.multimodal import (
        _decode_ima_adpcm,
    )

    with pytest.raises(ValueError, match="block_align"):
        _decode_ima_adpcm(b"\x00" * 64, 2, 10)


# --- full-spec PNG decode (r14) ----------------------------------------------


def _png_chunks(w, h, depth, color, interlace, idat, extra=()):
    """Hand-assemble a PNG from raw chunk parts — independent of
    encode_png, so the decoder is tested against the spec, not
    against its own encoder."""
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color,
                                      0, 0, interlace))
    for tag, data in extra:
        out += chunk(tag, data)
    out += chunk(b"IDAT", zlib.compress(idat))
    out += chunk(b"IEND", b"")
    return out


def _pack_scanline(vals, depth):
    """Filter-0 scanline from a flat list of native-range samples."""
    import struct

    if depth == 8:
        return b"\x00" + bytes(vals)
    if depth == 16:
        return b"\x00" + b"".join(struct.pack(">H", v) for v in vals)
    per = 8 // depth
    out = bytearray(b"\x00")
    for i in range(0, len(vals), per):
        byte = 0
        group = vals[i:i + per]
        for j, v in enumerate(group):
            byte |= v << (8 - depth * (j + 1))
        out.append(byte)
    return bytes(out)


def test_png_grayscale_depths_scale_to_8bit():
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import decode_png

    for depth in (1, 2, 4, 8, 16):
        maxv = (1 << depth) - 1
        vals = [0, maxv, maxv // 2, 1 % (maxv + 1)]
        idat = _pack_scanline(vals, depth) * 2  # 2 identical rows
        img = decode_png(_png_chunks(4, 2, depth, 0, 0, idat))
        assert img.shape == (2, 4, 3) and img.dtype == np.uint8
        exp0 = 0
        exp1 = 255 if depth != 16 else maxv >> 8
        assert img[0, 0, 0] == exp0 and img[0, 1, 0] == exp1
        # gray replicates across channels
        assert (img[:, :, 0] == img[:, :, 1]).all()
        if depth < 16:
            assert img[0, 2, 0] == (maxv // 2) * 255 // maxv


def test_png_palette_with_trns_alpha():
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import decode_png

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    trns = bytes([255, 128, 0])  # entry 3 defaults to 255
    for depth in (1, 2, 4, 8):
        n_idx = min(4, 1 << depth)
        vals = list(range(n_idx))
        idat = _pack_scanline(vals, depth)
        img = decode_png(_png_chunks(
            n_idx, 1, depth, 3, 0, idat,
            extra=[(b"PLTE", plte), (b"tRNS", trns)]))
        assert img.shape == (1, n_idx, 4)
        assert tuple(img[0, 0]) == (255, 0, 0, 255)
        if n_idx > 1:
            assert tuple(img[0, 1]) == (0, 255, 0, 128)
        if n_idx > 3:
            assert tuple(img[0, 3]) == (7, 8, 9, 255)
    del np


def test_png_palette_without_trns_is_rgb():
    from artis_data_ingest_spark.operators.multimodal import decode_png

    plte = bytes([10, 20, 30, 40, 50, 60])
    img = decode_png(_png_chunks(
        2, 1, 8, 3, 0, _pack_scanline([1, 0], 8),
        extra=[(b"PLTE", plte)]))
    assert img.shape == (1, 2, 3)
    assert tuple(img[0, 0]) == (40, 50, 60)
    assert tuple(img[0, 1]) == (10, 20, 30)


def test_png_gray_alpha_and_rgb16():
    from artis_data_ingest_spark.operators.multimodal import decode_png

    # gray+alpha 8-bit: (g, a) pairs
    img = decode_png(_png_chunks(
        2, 1, 8, 4, 0, _pack_scanline([100, 200, 50, 25], 8)))
    assert img.shape == (1, 2, 4)
    assert tuple(img[0, 0]) == (100, 100, 100, 200)
    assert tuple(img[0, 1]) == (50, 50, 50, 25)
    # RGB 16-bit scales high byte
    img2 = decode_png(_png_chunks(
        1, 1, 16, 2, 0,
        _pack_scanline([0xFF00, 0x8001, 0x00FF], 16)))
    assert tuple(img2[0, 0]) == (0xFF, 0x80, 0x00)


def test_png_adam7_interlace_roundtrip():
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import decode_png

    # reference image, then emit the 7 passes per the spec table
    h, w = 9, 10
    ref = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    idat = bytearray()
    for x0, y0, dx, dy in passes:
        sub = ref[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            idat += _pack_scanline(list(row.ravel()), 8)
    img = decode_png(_png_chunks(w, h, 8, 2, 1, bytes(idat)))
    assert (img == ref).all()


def test_png_adam7_interlaced_grayscale_1bit():
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import decode_png

    h, w = 5, 7
    ref = (np.arange(h * w).reshape(h, w) % 2).astype(np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    idat = bytearray()
    for x0, y0, dx, dy in passes:
        sub = ref[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            idat += _pack_scanline(list(row), 1)
    img = decode_png(_png_chunks(w, h, 1, 0, 1, bytes(idat)))
    assert (img[:, :, 0] == ref * 255).all()
    assert (img[:, :, 1] == img[:, :, 0]).all()


def test_png_truncated_pass_raises():
    import pytest

    from artis_data_ingest_spark.operators.multimodal import decode_png

    with pytest.raises(ValueError, match="wrong length"):
        decode_png(_png_chunks(4, 2, 8, 0, 0,
                               _pack_scanline([1, 2, 3, 4], 8)))


def test_png_palette_index_out_of_range_raises():
    import pytest

    from artis_data_ingest_spark.operators.multimodal import decode_png

    with pytest.raises(ValueError, match="palette"):
        decode_png(_png_chunks(
            1, 1, 8, 3, 0, _pack_scanline([5], 8),
            extra=[(b"PLTE", bytes([1, 2, 3]))]))


# --- OGG metadata (r14) -------------------------------------------------------


def test_ogg_vorbis_and_opus_parse():
    from artis_data_ingest_spark.operators.ogg import (
        make_opus_ogg,
        make_vorbis_ogg,
        parse_ogg,
    )

    v = parse_ogg(make_vorbis_ogg(7, 2, 44100, 441000))
    assert v["codec"] == "vorbis" and v["valid"]
    assert v["channels"] == 2 and v["sample_rate"] == 44100
    assert v["duration_s"] == 10.0 and v["n_pages"] == 3

    o = parse_ogg(make_opus_ogg(9, 1, 16000, 312, 48000 * 3 + 312))
    assert o["codec"] == "opus" and o["valid"]
    assert o["channels"] == 1 and o["sample_rate"] == 16000
    assert o["duration_s"] == 3.0  # 48 kHz clock minus pre-skip


def test_ogg_truncation_and_garbage():
    from artis_data_ingest_spark.operators.ogg import (
        make_vorbis_ogg,
        parse_ogg,
    )

    blob = make_vorbis_ogg(7, 2, 44100, 441000)
    cut = parse_ogg(blob[: len(blob) - 10])
    assert cut["truncated"] and cut["valid"]  # BOS parsed before cut
    assert not parse_ogg(b"not an ogg at all")["valid"]
    # continued-packet lacing (255-boundary) still walks
    big = make_vorbis_ogg(7, 1, 8000, 8000)
    assert parse_ogg(big)["valid"]


def test_ogg_multiplexed_streams_counted():
    from artis_data_ingest_spark.operators.ogg import (
        _page,
        parse_ogg,
    )
    import struct

    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([1])
        + struct.pack("<I", 8000) + struct.pack("<iii", -1, 8000, -1)
        + b"\xb8\x01"
    )
    blob = (
        _page(1, 0, 0, ident, bos=True)
        + _page(2, 0, 0, b"\x00" * 10, bos=True)
        + _page(1, 1, 4000, b"\x00" * 5, eos=True)
        + _page(2, 1, 999, b"\x00" * 5, eos=True)
    )
    m = parse_ogg(blob)
    assert m["n_streams"] == 2
    # duration follows the FIRST BOS stream's granule, not stream 2's
    assert m["duration_s"] == 0.5


# --- ID3v2 tag extraction (r14) ----------------------------------------------


def test_id3_version_encoding_matrix():
    from artis_data_ingest_spark.operators.mp3 import (
        parse_id3v2,
        write_id3v2,
    )

    fields = {"title": "Träck ø", "artist": "A", "album": "B",
              "year": "1999", "track": "7"}
    for major in (2, 3, 4):
        for enc in (0, 1, 2, 3):
            if enc == 0 and "ø" in fields["title"]:
                pass  # ø is in latin-1 — still exercises the path
            tag = write_id3v2(major, fields, encoding=enc)
            m = parse_id3v2(tag + b"\xff\xfb after")
            assert m["valid"] and m["version"] == f"2.{major}"
            assert m["title"] == "Träck ø"
            assert m["year"] == "1999" and m["track"] == "7"
            assert m["n_frames"] == 5


def test_id3_v24_syncsafe_frame_sizes():
    """A >127-byte frame distinguishes syncsafe (2.4) from plain
    (2.3) frame sizes — the classic interop bug."""
    from artis_data_ingest_spark.operators.mp3 import (
        parse_id3v2,
        write_id3v2,
    )

    long_title = "x" * 200
    for major in (3, 4):
        tag = write_id3v2(major, {"title": long_title,
                                  "artist": "a"}, encoding=3)
        m = parse_id3v2(tag)
        assert m["title"] == long_title and m["artist"] == "a"
        assert m["n_frames"] == 2


def test_id3_garbage_and_truncation_tolerated():
    from artis_data_ingest_spark.operators.mp3 import (
        parse_id3v2,
        write_id3v2,
    )

    assert parse_id3v2(b"")["valid"] is False
    assert parse_id3v2(b"ID3")["valid"] is False
    tag = write_id3v2(3, {"title": "whole", "artist": "tail"})
    cut = parse_id3v2(tag[: len(tag) - 4])  # truncated last frame
    assert cut["valid"] and cut["title"] == "whole"
    assert cut["artist"] is None  # partial frame never half-parses
