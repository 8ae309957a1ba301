"""Lossless JPEG (SOF3, T.81 Annex H).

Losslessness IS the conformance anchor here: encode->decode must
reproduce the input BIT-EXACTLY for every predictor — any defect in
the DPCM prediction, category coding, or bit packing breaks exact
identity on random inputs (no tolerance to hide behind, unlike the
DCT modes).  javax.imageio does not read SOF3, so no independent
decode exists in-container; stated per the qmcoder.py evidence-level
convention.
"""

import numpy as np
import pytest

from tildener_spark.functions.jpeg import decode_jpeg, encode_jpeg

RNG = np.random.default_rng(11)


def test_exact_roundtrip_all_predictors():
    imgs = [
        RNG.integers(0, 256, (23, 31), dtype=np.uint8),
        RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8),
        (np.add.outer(np.arange(20), np.arange(20)) * 7
         % 256).astype(np.uint8),
        np.zeros((9, 9), dtype=np.uint8),
        np.full((8, 3), 255, dtype=np.uint8),
        RNG.integers(0, 256, (1, 1), dtype=np.uint8),
    ]
    for img in imgs:
        for pred in range(1, 8):
            b = encode_jpeg(img, lossless=pred)
            assert b[:4] == b"\xff\xd8\xff\xc3"
            assert np.array_equal(decode_jpeg(b), img), (img.shape,
                                                         pred)


def test_restart_intervals_reset_prediction():
    img = RNG.integers(0, 256, (11, 13), dtype=np.uint8)
    for ri in (1, 5, 64):
        b = encode_jpeg(img, lossless=4, restart_interval=ri)
        assert np.array_equal(decode_jpeg(b), img), ri


def test_lossless_vs_lossy_divergence():
    # the DCT path quantizes; lossless must not — on noise the two
    # outputs differ while lossless stays exact
    img = RNG.integers(0, 256, (24, 24), dtype=np.uint8)
    lossy = decode_jpeg(encode_jpeg(img, quality=85))
    exact = decode_jpeg(encode_jpeg(img, lossless=1))
    assert np.array_equal(exact, img)
    assert not np.array_equal(lossy, img)


def test_bad_predictor_rejected():
    img = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg(img, lossless=8)
