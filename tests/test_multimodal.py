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


def test_resize_media_updates_images_only(spark):
    from artis_data_ingest_spark.operators.multimodal import resize_media

    media = synthetic_media(spark, n=9)
    out = {r.media_id: r for r in resize_media(media, 8, 8).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        if r.kind == "image":
            assert len(r.content) == 64
            assert r.meta.width == 8 and r.meta.height == 8
        else:
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

    gray_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 1, 2, 0, 3, 4])  # 2 rows: filter byte + 2 px
    gray = (
        _PNG_MAGIC
        + chunk(b"IHDR", gray_ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(gray)


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
