"""MJPEG-AVI video codec (functions/avi.py).

The container layer is plain RIFF framing (round-trip tested, like
WAV); the per-frame pixel path is the JPEG codec, which carries its
own independent javax.imageio conformance suite (tests/test_jpeg.py)
— so a lossy-tolerance round trip here pins exactly the container +
frame-ordering logic this module adds."""

import numpy as np
import pytest

from tildener_spark.functions.avi import (
    decode_avi_mjpeg, encode_avi_mjpeg)


def _clip(n=6, h=24, w=32, seed=5):
    rng = np.random.default_rng(seed)
    base = np.add.outer(np.linspace(0, 180, h), np.linspace(0, 60, w))
    return np.stack([
        np.clip(base[:, :, None] + 10 * i + rng.normal(0, 3, (h, w, 3)),
                0, 255) for i in range(n)]).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255 ** 2 / mse)


def test_roundtrip_frames_order_and_fps():
    clip = _clip()
    dec, fps = decode_avi_mjpeg(encode_avi_mjpeg(clip, fps=12.5))
    assert fps == 12.5
    assert len(dec) == len(clip)
    for i, (a, b) in enumerate(zip(clip, dec)):
        assert b.shape == a.shape
        assert _psnr(a, b) > 30, i
    # frame ORDER: each frame is 10 gray levels brighter than the
    # last, so a shuffled movi would show as non-monotone means
    means = [f.mean() for f in dec]
    assert means == sorted(means)


def test_single_frame_and_odd_dims():
    clip = _clip(n=1, h=9, w=17)
    dec, fps = decode_avi_mjpeg(encode_avi_mjpeg(clip, fps=1.0))
    assert len(dec) == 1 and dec[0].shape == (9, 17, 3)


def test_reject_garbage_and_foreign_codecs():
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")  # not AVI
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"plainly not a container")
    # a non-MJPG vids stream must be a declared stub, not garbage out
    enc = bytearray(encode_avi_mjpeg(_clip(n=2), fps=5.0))
    pos = bytes(enc).find(b"vids") + 4
    enc[pos:pos + 4] = b"H264"
    with pytest.raises(NotImplementedError):
        decode_avi_mjpeg(bytes(enc))


def test_multimodal_video_real_path(spark):
    """synthetic_media rotates real MJPEG-AVI / real MJPEG-MP4 /
    predictive-codec MP4 (declared stub); the real feature path must
    decode both real containers and the avc1 rows must keep raising
    the declared stub."""
    from tildener_spark.operators.multimodal import (
        decode_video, extract_media_features, synthetic_media)
    media = synthetic_media(spark, n=18).filter("media_type = 'video'")
    rows = media.collect()
    avis = [r for r in rows if bytes(r["payload"])[:4] == b"RIFF"]
    mp4s = [r for r in rows if bytes(r["payload"])[4:8] == b"ftyp"
            and b"avc1" not in bytes(r["payload"])]
    stub = [r for r in rows if b"avc1" in bytes(r["payload"])]
    assert len(avis) == len(mp4s) == len(stub) == 2
    for r in avis + mp4s:
        frames, fps = decode_video(bytes(r["payload"]))
        assert abs(fps - 8.0) < 0.05 and len(frames) == 4
    with pytest.raises(NotImplementedError):
        decode_video(bytes(stub[0]["payload"]))
    media_real = media.filter(
        "substring(payload, 1, 4) = cast('RIFF' as binary)"
        " or (substring(payload, 5, 4) = cast('ftyp' as binary)"
        "     and not contains(payload, cast('avc1' as binary)))")
    out = extract_media_features(media_real, fake_decode=False).collect()
    assert len(out) == len(avis) + len(mp4s)
    for r in out:
        # video feature layout: not image, not audio, fps slot set
        assert r["features"][0] == 0.0 and r["features"][1] == 0.0
        assert r["features"][2] == pytest.approx(8.0 / 60.0, abs=1e-3)
