"""Hierarchical lossless JPEG (T.81 Annex J over Annex H):
DHP + reduced SOF3 base + EXP/SOF7 differential frames
(functions/jpeg.py).  Losslessness at every stage makes the round
trip the conformance check, exactly like the flat SOF3 suite."""

import numpy as np
import pytest

from tildener_spark.functions.jpeg import (
    _hier_expand, decode_jpeg, encode_jpeg)


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("shape", [
    (16, 16), (17, 23), (1, 1), (1, 9), (9, 1), (64, 48, 3),
])
@pytest.mark.parametrize("levels", [2, 3])
def test_roundtrip_bit_exact(shape, levels):
    img = _img(shape)
    enc = encode_jpeg(img, lossless=1, hierarchical=levels)
    assert np.array_equal(decode_jpeg(enc), img)


@pytest.mark.parametrize("predictor", range(1, 8))
def test_all_predictors_roundtrip(predictor):
    img = _img((21, 19), seed=predictor)
    enc = encode_jpeg(img, lossless=predictor, hierarchical=2)
    assert np.array_equal(decode_jpeg(enc), img)


def test_marker_grammar():
    enc = encode_jpeg(_img((32, 32)), lossless=1, hierarchical=3)

    def count(marker):
        n, i = 0, 2
        pat = bytes([0xFF, marker])
        while True:
            i = enc.find(pat, i)
            if i < 0:
                return n
            n, i = n + 1, i + 2

    assert count(0xDE) == 1                 # one DHP
    assert count(0xC3) == 1                 # one base frame
    assert count(0xC7) == 2                 # levels-1 differentials
    assert count(0xDF) == 2                 # one EXP per differential
    # DHP precedes the base frame precedes the differentials
    assert enc.find(b"\xff\xde") < enc.find(b"\xff\xc3") \
        < enc.find(b"\xff\xc7")


def test_smooth_image_compresses_in_differentials():
    # a smooth gradient: the expanded reference predicts well, so the
    # hierarchical stream should not blow up vs the flat lossless one
    y, x = np.mgrid[0:64, 0:64]
    img = ((y + x) * 2 % 256).astype(np.uint8)
    flat = encode_jpeg(img, lossless=1)
    hier = encode_jpeg(img, lossless=1, hierarchical=2)
    assert np.array_equal(decode_jpeg(hier), img)
    assert len(hier) < 2 * len(flat)


def test_extremes_roundtrip():
    for img in (np.zeros((13, 13), np.uint8),
                np.full((13, 13), 255, np.uint8)):
        enc = encode_jpeg(img, lossless=1, hierarchical=2)
        assert np.array_equal(decode_jpeg(enc), img)


def test_expand_filter_spec_values():
    # J.1.1.2: even positions copy, odd = rounded mean, edge
    # replicated
    p = np.array([[0, 10], [20, 30]], dtype=np.int32)
    e = _hier_expand(p, 1, 1)
    assert e.shape == (4, 4)
    assert e[0, 0] == 0 and e[0, 2] == 10
    assert e[0, 1] == (0 + 10 + 1) >> 1
    assert e[1, 0] == (0 + 20 + 1) >> 1
    assert e[0, 3] == 10 and e[3, 0] == 20   # edge replication
    assert e[2, 2] == 30


def test_hierarchical_needs_two_levels():
    with pytest.raises(ValueError, match="2 levels"):
        encode_jpeg(_img((8, 8)), lossless=1, hierarchical=1)


def test_flat_lossless_unaffected():
    img = _img((24, 24, 3), seed=9)
    enc = encode_jpeg(img, lossless=4)
    assert np.array_equal(decode_jpeg(enc), img)
    assert b"\xff\xde" not in enc and b"\xff\xc7" not in enc
