"""Pure-numpy FLAC codec (functions/flac.py).

Evidence model (no independent FLAC implementation exists in this
container — stated in the module docstring): FLAC is LOSSLESS, so
every round-trip must be bit-exact (quantization cannot mask a
coding bug); the STREAMINFO MD5 binds decoded samples to the raw
pre-encode samples through an independent hash the decoder verifies;
and the CRC layer is pinned against published check values so the
framing matches the spec rather than merely itself.  The encoder's
``force`` knob makes every decoder path reachable: constant,
verbatim, fixed and LPC subframes, 4- and 5-bit Rice, escape
partitions, and all three stereo decorrelation modes.
"""

import numpy as np
import pytest

from tildener_spark.functions.flac import (
    crc8, crc16, decode_flac, encode_flac)


def _tone(n=9000, seed=3, amp=6000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * 440 * t / 8000)
            + rng.normal(0, 120, n)).astype(np.int16)


def test_crc_check_values():
    """Published check values: CRC-8 poly 0x07 ('SMBUS') = 0xF4,
    CRC-16 poly 0x8005 init 0 ('BUYPASS') = 0xFEE8 over
    b'123456789' — pins the framing layer to the spec."""
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize("force", [
    None, "lpc", "verbatim", "rice2", "escape"])
def test_mono_roundtrip_every_subframe_type(force):
    x = _tone()
    dec, rate = decode_flac(encode_flac(x, 8000, force=force))
    assert rate == 8000
    assert dec.shape == (len(x), 1)
    assert (dec[:, 0] == x).all()


@pytest.mark.parametrize("mode", [
    "independent", "left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_roundtrip(mode):
    x = _tone()
    stereo = np.stack([x, (x * 0.7).astype(np.int16)], axis=1)
    dec, _ = decode_flac(encode_flac(stereo, 44100, stereo_mode=mode))
    assert (dec == stereo).all()


def test_constant_and_edge_sizes():
    const = np.full(5000, -123, np.int16)
    enc = encode_flac(const, 8000)
    assert len(enc) < 100  # constant subframes: ~2 bytes per frame
    dec, _ = decode_flac(enc)
    assert (dec[:, 0] == const).all()
    for n in (1, 2, 5, 191, 192, 193, 4096, 4097):
        x = _tone(n=n, seed=n)
        dec, _ = decode_flac(encode_flac(x, 8000, block_size=192))
        assert (dec[:, 0] == x).all(), n


def test_lpc_actually_compresses():
    """The Levinson-Durbin path must beat fixed prediction on a tonal
    signal — evidence the predictor math is right, not just lossless."""
    x = _tone()
    assert len(encode_flac(x, 8000, force="lpc")) < \
        len(encode_flac(x, 8000))
    assert len(encode_flac(x, 8000)) < \
        len(encode_flac(x, 8000, force="verbatim"))


def test_md5_signature_detects_corruption():
    x = _tone(n=5000)
    enc = bytearray(encode_flac(x, 8000))
    dec, _ = decode_flac(bytes(enc))  # sanity: verifies clean
    # flip one bit inside the last frame's payload (past CRC-covered
    # header would be caught anyway; MD5 is the end-to-end net)
    with pytest.raises(ValueError):
        bad = bytearray(enc)
        bad[len(bad) // 2] ^= 0x01
        decode_flac(bytes(bad))


def test_reject_garbage():
    with pytest.raises(ValueError):
        decode_flac(b"not flac")
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")  # truncated metadata
    x = _tone(n=1000)
    enc = bytearray(encode_flac(x, 8000))
    enc[5] ^= 0xFF  # corrupt STREAMINFO length
    with pytest.raises(ValueError):
        decode_flac(bytes(enc))


def test_multimodal_audio_path_covers_flac(spark):
    """synthetic_media alternates FLAC/WAV payloads; the real feature
    path must decode both and produce the audio-flagged features."""
    from tildener_spark.operators.multimodal import (
        extract_media_features, synthetic_media)
    media = synthetic_media(spark, n=18).filter("media_type = 'audio'")
    out = extract_media_features(media, fake_decode=False).collect()
    assert len(out) == 6
    for r in out:
        assert r["features"][1] == 1.0  # is_audio flag from real path


def test_flac_and_wav_agree_on_same_pcm(spark):
    """The same PCM through WAV and FLAC payloads must produce
    IDENTICAL content features — the codecs are interchangeable
    containers, not different signals."""
    from tildener_spark.functions.codecs import encode_wav
    from tildener_spark.operators.multimodal import _real_features
    x = _tone(n=8000)
    f_wav = _real_features(encode_wav(x, 8000), "audio")
    f_flac = _real_features(encode_flac(x, 8000), "audio")
    assert f_wav == f_flac
