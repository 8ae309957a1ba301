"""Pure-stdlib PNG/WAV codecs (functions/codecs.py) and the real
(non-fake) multimodal decode paths built on them."""

import struct
import zlib

import numpy as np
import pytest

from tildener_spark.functions.codecs import (
    PNG_SIG, decode_png, decode_wav, encode_png, encode_wav)
from tildener_spark.operators.multimodal import (
    decode_audio, decode_image, extract_media_features, resize_images,
    synthetic_media)


def _rng():
    return np.random.default_rng(1234)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = _rng().integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _hand_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Independent test-side PNG writer applying the SPEC's filter
    transforms per scanline — exercises decoder filter paths the
    library encoder (always filter 0) never emits."""
    h, w, c = img.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(w * c):
            a = int(line[x - c]) if x >= c else 0      # left (recon)
            b = int(prev[x])                           # up
            cc = int(prev[x - c]) if x >= c else 0     # up-left
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - a
            elif f == 2:
                v = line[x] - b
            elif f == 3:
                v = line[x] - (a + b) // 2
            else:  # paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else cc)
                v = line[x] - pred
            raw.append(v & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c],
                       0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_scanline_filters(filters):
    img = _rng().integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(_hand_png(img, filters)), img)


def test_png_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 128]],
                       dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    png = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", palette.tobytes())
           + _chunk(b"IDAT", zlib.compress(raw))
           + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), palette[idx])


def test_png_rejects_corruption():
    img = _rng().integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_png(img))
    payload[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError):
        decode_png(bytes(payload))


def test_wav_roundtrip_and_8bit():
    samples = (_rng().integers(-32768, 32768, size=(500, 2))
               .astype(np.int16))
    frames, rate = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000
    assert np.array_equal(frames, samples)
    # mono 1-D input
    mono = samples[:, 0]
    frames, _ = decode_wav(encode_wav(mono, 8000))
    assert np.array_equal(frames[:, 0], mono)
    # 8-bit PCM decode (hand-built: unsigned, rescaled to int16)
    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) % 2 else b""))
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    frames, rate = decode_wav(wav)
    assert rate == 8000
    assert frames[:, 0].tolist() == [(-128) << 8, 0, 127 << 8]


def test_real_feature_extraction(spark):
    """Non-fake decode over the synthetic table's real PNG/WAV
    payloads: features reflect actual content."""
    media = synthetic_media(spark, n=12).filter("media_type != 'video'")
    rows = {r["asset_id"]: r for r in
            extract_media_features(media, fake_decode=False).collect()}
    assert len(rows) == 8
    meta = {r["asset_id"]: r for r in media.collect()}
    for aid, r in rows.items():
        f = r["features"]
        assert all(0.0 <= v <= 1.0 for v in f)
        if r["media_type"] == "image":
            assert f[0] == 1.0 and f[1] == 0.0
            assert abs(f[2] - min(meta[aid]["width"] / 4096, 1)) < 1e-6
            assert abs(f[3] - min(meta[aid]["height"] / 4096, 1)) < 1e-6
            assert f[4] == pytest.approx(3 / 4)  # RGB
        else:
            assert f[0] == 0.0 and f[1] == 1.0
            assert f[5] > 0.0  # sine rms
            assert f[8] > 0.0  # zero-crossing rate


def test_real_resize_roundtrip(spark):
    media = synthetic_media(spark, n=9)
    out = resize_images(media, max_side=96, fake_decode=False).collect()
    assert len(out) == 3
    for r in out:
        assert max(r["new_width"], r["new_height"]) <= 96
        img = decode_image(bytes(r["payload"]))
        assert img.shape == (r["new_height"], r["new_width"], 3)
        # resized content comes from the original image (spot check:
        # corner pixel equals the original's corner pixel under
        # nearest-neighbor with index 0 -> 0)
        orig = decode_image(bytes(
            media.filter(media.asset_id == r["asset_id"])
            .collect()[0]["payload"]))
        assert np.array_equal(img[0, 0], orig[0, 0])


def test_metadata_matches_real_payload(spark):
    """synthetic_media's width/height/duration columns describe the
    REAL payload, not fiction."""
    for r in synthetic_media(spark, n=6).collect():
        if r["media_type"] == "image":
            img = decode_image(bytes(r["payload"]))
            assert img.shape == (r["height"], r["width"], 3)
        elif r["media_type"] == "audio":
            frames, rate = decode_audio(bytes(r["payload"]))
            assert len(frames) == rate * r["duration_ms"] // 1000
