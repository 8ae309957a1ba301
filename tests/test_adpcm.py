"""IMA / MS ADPCM: spec-reference differential + round-trip bounds.

The reference decoders below are written straight from the published
pseudocode (IMA rev 3.00 / Microsoft WAVE docs) as naive per-sample
loops, independently of the production module's structure — the same
cross-implementation pattern used for jaro_winkler.  Random
bitstreams (every nibble value exercised) must decode identically.
"""

import numpy as np
import pytest

from tildener_spark.functions import adpcm, codecs


# ------------------------------------------------- spec reference IMA

def _ref_ima(nibbles, pred, idx):
    out = []
    for m in nibbles:
        step = int(adpcm.IMA_STEP_TABLE[idx])
        # multiply-form of the same spec reconstruction
        diff = (step >> 3) + (m & 1) * (step >> 2) \
            + ((m >> 1) & 1) * (step >> 1) + ((m >> 2) & 1) * step
        pred = pred - diff if m & 8 else pred + diff
        pred = min(32767, max(-32768, pred))
        idx = min(88, max(0, idx + int(adpcm.IMA_INDEX_TABLE[m])))
        out.append(pred)
    return out


def test_ima_tables():
    assert len(adpcm.IMA_STEP_TABLE) == 89
    assert adpcm.IMA_STEP_TABLE[0] == 7
    assert adpcm.IMA_STEP_TABLE[88] == 32767
    assert np.all(np.diff(adpcm.IMA_STEP_TABLE) > 0)
    assert list(adpcm.IMA_INDEX_TABLE[:8]) == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_ima_differential_random_bitstreams():
    rng = np.random.default_rng(3)
    for trial in range(20):
        pred = int(rng.integers(-32768, 32768))
        idx = int(rng.integers(0, 89))
        nibbles = rng.integers(0, 16, 256).astype(np.uint8)
        ref = _ref_ima(nibbles, pred, idx)
        got = adpcm._ima_decode_nibbles(nibbles, pred, idx)
        assert list(got) == ref


def test_ima_block_roundtrip_mono_stereo():
    rng = np.random.default_rng(11)
    t = np.arange(505)
    mono = (7000 * np.sin(t / 9) + rng.normal(0, 200, 505)).astype(np.int16)
    blk = adpcm.encode_ima_block(mono)
    dec = adpcm.decode_ima_block(blk, 1)
    assert dec.shape == (505, 1)
    assert int(dec[0, 0]) == int(mono[0])  # header predictor = frame 0
    err = np.abs(dec[:, 0].astype(int) - mono.astype(int))
    assert err.mean() < 200
    stereo = np.stack([mono, np.roll(mono, 5)], axis=1).astype(np.int16)
    blk2 = adpcm.encode_ima_block(stereo)
    dec2 = adpcm.decode_ima_block(blk2, 2)
    assert dec2.shape == (505, 2)
    assert np.array_equal(dec2[0], stereo[0])


# -------------------------------------------------- spec reference MS

def _ref_ms(nibbles, pidx, delta, s1, s2):
    c1, c2 = int(adpcm.MS_COEFFS[pidx, 0]), int(adpcm.MS_COEFFS[pidx, 1])
    out = []
    for m in nibbles:
        pred = (s1 * c1 + s2 * c2) >> 8
        signed = m - 16 if m & 8 else m
        sample = min(32767, max(-32768, pred + signed * delta))
        s2, s1 = s1, sample
        delta = max(16, (int(adpcm.MS_ADAPT[m]) * delta) >> 8)
        out.append(sample)
    return out


def test_ms_tables():
    assert adpcm.MS_COEFFS.shape == (7, 2)
    assert list(adpcm.MS_COEFFS[0]) == [256, 0]
    assert list(adpcm.MS_COEFFS[1]) == [512, -256]
    assert list(adpcm.MS_ADAPT[:4]) == [230] * 4
    assert int(adpcm.MS_ADAPT[8]) == 768


def test_ms_differential_random_bitstreams():
    rng = np.random.default_rng(5)
    import struct
    for trial in range(20):
        pidx = int(rng.integers(0, 7))
        delta = int(rng.integers(16, 4000))
        s1 = int(rng.integers(-32768, 32768))
        s2 = int(rng.integers(-32768, 32768))
        nibbles = rng.integers(0, 16, 200).astype(np.uint8)
        ref = _ref_ms(list(map(int, nibbles)), pidx, delta, s1, s2)
        data = ((nibbles[0::2] << 4) | nibbles[1::2]).astype(np.uint8)
        blk = (bytes([pidx]) + struct.pack("<hhh", delta, s1, s2)
               + data.tobytes())
        dec = adpcm.decode_ms_block(blk, 1)
        assert list(dec[:, 0]) == [s2, s1] + ref


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_adpcm_roundtrips(channels):
    rng = np.random.default_rng(19)
    t = np.arange(3000)
    sig = (8000 * np.sin(t / 21) + rng.normal(0, 250, 3000)).astype(np.int16)
    src = sig if channels == 1 else np.stack(
        [sig, np.roll(sig, 7)], axis=1).astype(np.int16)
    for enc_fn in (codecs.encode_wav_ima, codecs.encode_wav_ms_adpcm):
        wav = enc_fn(src, 16000)
        dec, rate = codecs.decode_wav(wav)
        assert rate == 16000
        s2 = src if src.ndim == 2 else src[:, None]
        n = s2.shape[0]
        noise = (dec[:n].astype(float) - s2) ** 2
        snr = 10 * np.log10((s2.astype(float) ** 2).mean() / noise.mean())
        assert snr > 25, f"{enc_fn.__name__} snr={snr:.1f}"
        # compression actually happened (~4 bits/sample vs 16)
        assert len(wav) < s2.size * 2 * 0.30


def test_multimodal_decode_audio_accepts_adpcm():
    from tildener_spark.operators import multimodal
    sig = (6000 * np.sin(np.arange(2000) / 15)).astype(np.int16)
    for wav in (codecs.encode_wav_ima(sig, 8000),
                codecs.encode_wav_ms_adpcm(sig, 8000),
                codecs.encode_wav_g711(sig, 8000, "ulaw"),
                codecs.encode_wav_g711(sig, 8000, "alaw")):
        frames, rate = multimodal.decode_audio(wav)
        assert rate == 8000 and frames.shape[0] >= 2000
