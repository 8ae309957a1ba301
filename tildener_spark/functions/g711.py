"""ITU-T G.711 companded audio (mu-law / A-law), pure numpy.

G.711 is the telephony codec family: 8-bit logarithmic companding of
16-bit linear PCM.  WAV carries it as format tags 7 (mu-law) and 6
(A-law).  Both directions are implemented vectorized over numpy
arrays — decode is a pure table-free bit computation, encode is the
segment search from the CCITT reference algorithm.

Correctness evidence (tests/test_g711.py):
  * encode(decode(code)) == code for every one of the 256 codes in
    both laws (codec duality — the companding map is a bijection on
    code space);
  * decode conformance against the JVM's ``javax.sound.sampled``
    ULAW/ALAW converters (an independent implementation lineage,
    reachable through the Spark driver's py4j gateway);
  * golden values from the G.711 tables (mu-law max magnitude 32124,
    A-law max 32256, zero codes 0xFF/0xD5).

This is deliberately NOT a decode of the reference repo — TildeNER
has no audio path; G.711 is part of the beyond-reference multimodal
surface (SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------- mu-law

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def decode_ulaw(codes: np.ndarray) -> np.ndarray:
    """8-bit mu-law codes -> 16-bit linear PCM (max |x| = 32124)."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32)
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def encode_ulaw(samples: np.ndarray) -> np.ndarray:
    """16-bit linear PCM -> 8-bit mu-law codes (CCITT segment search)."""
    s = np.asarray(samples, dtype=np.int16).astype(np.int32)
    sign = (s < 0).astype(np.int32)
    mag = np.minimum(np.where(sign, -s, s), _ULAW_CLIP) + _ULAW_BIAS
    # highest set bit of mag (mag >= 0x85 so bit length >= 8)
    _, e = np.frexp(mag.astype(np.float64))
    exp = e.astype(np.int32) - 8  # segment 0..7
    mant = (mag >> (exp + 3)) & 0x0F
    return (~((sign << 7) | (exp << 4) | mant) & 0xFF).astype(np.uint8)


# -------------------------------------------------------------- A-law

def decode_alaw(codes: np.ndarray) -> np.ndarray:
    """8-bit A-law codes -> 16-bit linear PCM (max |x| = 32256).

    Per G.711 even bits are inverted on the wire (XOR 0x55); after
    unmasking, a SET sign bit means positive."""
    a = np.asarray(codes, dtype=np.uint8).astype(np.int32) ^ 0x55
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0,
                   (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


def encode_alaw(samples: np.ndarray) -> np.ndarray:
    """16-bit linear PCM -> 8-bit A-law codes."""
    s = np.asarray(samples, dtype=np.int16).astype(np.int32)
    pos = s >= 0
    mag = np.where(pos, s, -s - 1) >> 3  # 13-bit magnitude domain
    # segment = position of the highest set bit above the first 5
    seg = np.zeros_like(mag)
    nz = mag > 0x1F
    _, e = np.frexp(np.where(nz, mag, 1).astype(np.float64))
    seg = np.where(nz, np.minimum(e.astype(np.int32) - 5, 7), 0)
    mant = np.where(seg < 2, (mag >> 1) & 0x0F, (mag >> seg) & 0x0F)
    aval = (seg << 4) | mant
    return ((aval ^ np.where(pos, 0xD5, 0x55)) & 0xFF).astype(np.uint8)
