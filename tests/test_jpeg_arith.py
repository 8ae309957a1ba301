"""Arithmetic-coded JPEG (SOF9): coefficient parity vs the
javax.imageio-anchored Huffman path.

Evidence chain (qmcoder.py docstring): no independent SOF9 codec
exists in-container, so the conformance anchor is TRANSITIVE — the
Huffman decode path is bit-anchored against javax.imageio
(tests/test_jpeg.py), and these tests pin the arithmetic path to
byte-identical decodes of the same quantized coefficients across
subsampling/restart/size matrices.  A shared-table bug cannot hide
in the round trip AND reproduce the Huffman path's pixels unless it
is value-neutral end to end.
"""

import numpy as np
import pytest

from tildener_spark.functions.jpeg import decode_jpeg, encode_jpeg

RNG = np.random.default_rng(7)


def _cases():
    ramp = (np.add.outer(np.arange(24), np.arange(40)) * 3
            % 256).astype(np.uint8)
    noise = RNG.integers(0, 256, (33, 17), dtype=np.uint8)
    rgb = RNG.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    flat = np.full((16, 16), 128, dtype=np.uint8)
    for img in (ramp, noise, rgb, flat):
        subs = ["444"] if img.ndim == 2 else ["444", "420"]
        for sub in subs:
            for ri in (0, 3):
                yield img, sub, ri


def test_arith_equals_huffman_decode():
    for img, sub, ri in _cases():
        hb = encode_jpeg(img, quality=85, subsampling=sub,
                         restart_interval=ri)
        ab = encode_jpeg(img, quality=85, subsampling=sub,
                         restart_interval=ri, arithmetic=True)
        assert ab[:2] == b"\xff\xd8"
        assert b"\xff\xc9" in ab[:200]          # SOF9 frame
        assert b"\xff\xcc" in ab[:200]          # DAC present
        dh, da = decode_jpeg(hb), decode_jpeg(ab)
        assert np.array_equal(dh, da), (img.shape, sub, ri)


def test_arith_compresses_better_on_real_content():
    # adaptive coding must beat the fixed Huffman tables on the
    # structured image by a wide margin (sanity that the estimator
    # adapts rather than merely round-tripping)
    img = (np.add.outer(np.arange(64), np.arange(64)) * 2
           % 256).astype(np.uint8)
    hb = encode_jpeg(img, quality=85)
    ab = encode_jpeg(img, quality=85, arithmetic=True)
    assert len(ab) < 0.75 * len(hb)


def test_truncated_arith_scan_degrades_not_crashes():
    # arithmetic truncation is UNDETECTABLE from the bits (the
    # decoder 1-fills past the end and keeps producing symbols —
    # same as libjpeg, which warns and returns a partial image), so
    # the contract is shape-correct garbage, not an exception
    img = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    ab = encode_jpeg(img, quality=85, arithmetic=True)
    out = decode_jpeg(ab[:len(ab) // 2])
    assert out.shape == (32, 32) and out.dtype == np.uint8
    assert not np.array_equal(out, decode_jpeg(ab))


def test_progressive_arith_equals_huffman_decode():
    # SOF10: spectral selection + successive approximation under the
    # QM coder — every G.2 path (DC first/refine, banded AC first,
    # AC refine with kex-gated EOB) must reproduce the Huffman
    # path's pixels exactly
    for img, sub, _ri in _cases():
        hb = encode_jpeg(img, quality=85, subsampling=sub)
        pb = encode_jpeg(img, quality=85, subsampling=sub,
                         arithmetic=True, progressive=True)
        assert b"\xff\xca" in pb[:200]         # SOF10 frame
        assert np.array_equal(decode_jpeg(hb), decode_jpeg(pb)), \
            (img.shape, sub)


def test_hierarchical_sof_still_declared():
    sof5 = (b"\xff\xd8\xff\xc5\x00\x0b\x08\x00\x02\x00\x02\x01"
            b"\x11\x00")
    with pytest.raises(NotImplementedError):
        decode_jpeg(sof5)
