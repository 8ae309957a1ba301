"""Multimodal plumbing: schema, determinism, stub behaviour."""

import numpy as np
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


def test_declared_stubs_raise():
    """Formats needing external codecs stay declared stubs; unknown
    bytes are a ValueError, not a silent fake."""
    from tildener_spark.operators.multimodal import (
        decode_audio, decode_video)
    # hierarchical JPEG (SOF5+) is the remaining declared image
    # stub — every non-hierarchical mode (baseline/progressive x
    # Huffman/arithmetic, plus lossless SOF3) decodes for real
    sof5 = (b"\xff\xd8\xff\xc5\x00\x0b\x08\x00\x02\x00\x02\x01"
            b"\x11\x00")
    with pytest.raises(NotImplementedError):
        decode_image(sof5)
    # FLAC (round 4) and Ogg Vorbis (round 5, functions/vorbis.py)
    # decode for real — MP3 is the remaining declared audio stub,
    # and a truncated Ogg is a parse error, not a stub
    with pytest.raises(ValueError):
        decode_audio(b"OggS....")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04...")
    with pytest.raises(ValueError):
        decode_audio(b"fLaC")  # truncated FLAC -> parse error
    # MP4 demuxes for real since round 4 (functions/mp4.py) — the
    # declared video stubs are predictive codecs and WebM/MKV
    from tildener_spark.functions import mp4 as mp4mod
    payload = mp4mod.encode_mp4_mjpeg(
        np.zeros((1, 16, 16, 3), dtype=np.uint8), fps=10.0)
    at = payload.index(b"jpeg", payload.index(b"stsd"))
    with pytest.raises(NotImplementedError):
        decode_video(payload[:at] + b"avc1" + payload[at + 4:])
    with pytest.raises(NotImplementedError):
        decode_video(b"\x1a\x45\xdf\xa3" + b"\x00" * 16)  # WebM/MKV
    with pytest.raises(ValueError):
        decode_video(b"\x00\x00\x00\x18ftypmp42")  # truncated MP4
    with pytest.raises(ValueError):
        decode_image(b"not an image")
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG")  # bad signature tail -> not a PNG
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0\x00\x02")  # truncated JPEG


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


def test_resize_images_geometry_and_determinism(spark):
    from tildener_spark.operators.multimodal import (
        resize_images, synthetic_media)
    media = synthetic_media(spark, 30)
    out = {r["asset_id"]: r for r in resize_images(media, 128).collect()}
    assert len(out) == 10  # only the image rows
    for r in out.values():
        assert max(r["new_width"], r["new_height"]) <= 128
        # aspect preserved within rounding
        if r["orig_width"] and r["new_width"] != r["orig_width"]:
            ar0 = r["orig_width"] / r["orig_height"]
            ar1 = r["new_width"] / r["new_height"]
            assert abs(ar0 - ar1) / ar0 < 0.1
        assert len(r["payload"]) == 32  # deterministic fake digest
    out2 = {r["asset_id"]: r for r in resize_images(media, 128).collect()}
    assert all(bytes(out[k]["payload"]) == bytes(out2[k]["payload"])
               for k in out)


def test_audio_windows_plan(spark):
    from tildener_spark.operators.multimodal import (
        audio_windows_plan, synthetic_media)
    media = synthetic_media(spark, 30)
    rows = audio_windows_plan(media, window_ms=2000, hop_ms=1000).collect()
    assert rows
    by_asset = {}
    for r in rows:
        assert r["win_end"] - r["win_start"] == 2000
        by_asset.setdefault(r["asset_id"], []).append(r["win_start"])
    for starts in by_asset.values():
        starts = sorted(starts)
        assert starts[0] == 0
        assert all(b - a == 1000 for a, b in zip(starts, starts[1:]))


def test_decode_media_summary_matches_committed_expected(spark):
    """q83's contract: the Arrow-batched decode of the committed
    asset table reproduces the committed expected summary exactly —
    every real codec path (PNG, all six JPEG modes + hierarchical,
    five WAV families, FLAC, MJPEG-AVI/MP4, MS-RLE) in one pass."""
    import os

    from tildener_spark.operators.multimodal import (
        decode_media_summary)
    fix = os.path.join(os.path.dirname(__file__), "fixtures", "media")
    media = spark.read.parquet(
        os.path.join(fix, "media_assets.parquet"))
    got = {r["asset_id"]: tuple(r)
           for r in decode_media_summary(media).collect()}
    want = {r["asset_id"]: tuple(r) for r in spark.read.parquet(
        os.path.join(fix, "media_expected.parquet")).collect()}
    assert got == want
    codecs_seen = {t[1] for t in got.values()}
    assert {"png", "jpeg_sof0", "jpeg_sof2", "jpeg_sof3",
            "jpeg_sof9", "jpeg_sof10", "jpeg_hier", "wav_pcm",
            "wav_mulaw", "wav_alaw", "wav_ima_adpcm", "wav_ms_adpcm",
            "flac", "ogg_vorbis", "avi_mjpeg", "avi_msrle",
            "mp4_mjpeg"} <= codecs_seen


def test_huffman_progressive_encode_rejected():
    import numpy as np
    import pytest

    from tildener_spark.functions.jpeg import encode_jpeg
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="progressive"):
        encode_jpeg(img, progressive=True)
