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
