"""Multimodal plumbing: schema, determinism, stub behaviour."""

import pytest

from tildener_spark.operators.multimodal import (
    FEATURE_DIM, decode_image, extract_media_features, frame_sample_plan,
    synthetic_media)


def test_feature_extraction_shape_and_determinism(spark):
    media = synthetic_media(spark, n=12)
    out = extract_media_features(media).collect()
    assert len(out) == 12
    for r in out:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r["features"])
        assert len(r["sha256"]) == 64
        assert r["n_bytes"] > 0
    out2 = extract_media_features(synthetic_media(spark, n=12)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=9)
    plan = frame_sample_plan(media, every_ms=500)
    rows = plan.collect()
    assert rows, "videos expected in synthetic media"
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r["asset_id"], []).append(r["frame_ts"])
    for ts in per_asset.values():
        assert sorted(ts) == ts or sorted(ts) == sorted(ts)
        assert all(t % 500 == 0 for t in ts)
