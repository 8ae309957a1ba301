"""G.711 mu-law / A-law: duality, golden values, JVM conformance.

The strongest evidence here is the javax.sound.sampled comparison:
the JDK ships its own ULAW/ALAW converters (an independent
implementation lineage), reachable through the Spark driver's py4j
gateway — decode must match it bit-exactly on all 256 codes.
"""

import struct

import numpy as np
import pytest

from tildener_spark.functions import codecs, g711

ALL_CODES = np.arange(256, dtype=np.uint8)


def test_ulaw_duality_all_codes():
    pcm = g711.decode_ulaw(ALL_CODES)
    back = g711.encode_ulaw(pcm)
    # mu-law has two zero codes (0x7F "positive zero" and 0xFF);
    # canonical encoders emit 0xFF for 0 — the single allowed alias.
    assert int(pcm[0x7F]) == 0 and int(pcm[0xFF]) == 0
    assert int(back[0x7F]) == 0xFF
    mask = ALL_CODES != 0x7F
    assert np.array_equal(back[mask], ALL_CODES[mask])


def test_alaw_duality_all_codes():
    pcm = g711.decode_alaw(ALL_CODES)
    assert np.array_equal(g711.encode_alaw(pcm), ALL_CODES)


def test_golden_extremes():
    # G.711 table endpoints: mu-law max |x| = 32124, A-law 32256
    assert int(g711.decode_ulaw(np.array([0x80], np.uint8))[0]) == 32124
    assert int(g711.decode_ulaw(np.array([0x00], np.uint8))[0]) == -32124
    assert int(g711.decode_alaw(np.array([0xAA], np.uint8))[0]) == 32256
    assert int(g711.decode_alaw(np.array([0x2A], np.uint8))[0]) == -32256
    # canonical zero / smallest codes
    assert int(g711.decode_alaw(np.array([0xD5], np.uint8))[0]) == 8
    assert int(g711.decode_alaw(np.array([0x55], np.uint8))[0]) == -8


def test_quantization_error_bounds():
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, 20000).astype(np.int16)
    # top mu-law segment step is 1024 => |err| <= 512 + clip margin 643
    err_u = np.abs(g711.decode_ulaw(g711.encode_ulaw(x)).astype(int) - x)
    assert err_u.max() <= 643
    err_a = np.abs(g711.decode_alaw(g711.encode_alaw(x)).astype(int) - x)
    assert err_a.max() <= 512


def _g711_wav(codes: bytes, tag: int) -> bytes:
    fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(codes)) + codes)
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("law,tag", [("ulaw", 7), ("alaw", 6)])
def test_jvm_conformance(spark, law, tag):
    """Decode of every code must equal javax.sound.sampled's output."""
    jvm = spark._jvm
    codes = bytes(range(256))
    bis = jvm.java.io.ByteArrayInputStream(bytearray(_g711_wav(codes, tag)))
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(bis)
    base = ais.getFormat()
    enc = jvm.javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
    target = jvm.javax.sound.sampled.AudioFormat(
        enc, base.getSampleRate(), 16, base.getChannels(),
        base.getChannels() * 2, base.getSampleRate(), False)
    conv = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        target, ais)
    jpcm = np.frombuffer(bytes(conv.readAllBytes()), dtype="<i2")
    dec = g711.decode_ulaw if law == "ulaw" else g711.decode_alaw
    assert np.array_equal(jpcm, dec(np.frombuffer(codes, np.uint8)))


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_wav_container_roundtrip(law):
    t = np.arange(4000)
    sig = (9000 * np.sin(t / 17)).astype(np.int16)
    wav = codecs.encode_wav_g711(sig, 8000, law)
    dec, rate = codecs.decode_wav(wav)
    assert rate == 8000 and dec.shape == (4000, 1)
    snr = 10 * np.log10((sig.astype(float) ** 2).mean()
                        / ((dec[:, 0].astype(float) - sig) ** 2).mean())
    assert snr > 30  # G.711 delivers ~35+ dB on band-limited input
