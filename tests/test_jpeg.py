"""Pure-numpy baseline JPEG codec (functions/jpeg.py).

Conformance strategy: the Spark JVM ships javax.imageio — an
INDEPENDENT JPEG implementation (libjpeg lineage) available in this
container — so the decoder is tested against a second codec on
(a) public fixtures from CPython's and IPython's own test suites,
(b) bitstreams produced by our encoder, and (c) foreign bitstreams
produced by javax.imageio's encoder.  Tolerances follow T.81 Annex A
(the IDCT is implementation-defined within small error) plus the
upsampling filter difference; the grayscale fixture must be
bit-exact (its only block is DC-less, so no IDCT variance exists).
"""

import glob
import os

import numpy as np
import pytest

from tildener_spark.functions.jpeg import decode_jpeg, encode_jpeg

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
# provenance (public test data, copied verbatim):
#   gray_2x2.jpg     <- IPython/core/tests/2x2.jpg
#   python_16x16.jpg <- CPython Lib/test/test_email/data/python.jpg


def _grad(h, w, seed=7, noise=4.0):
    rng = np.random.default_rng(seed)
    base = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 55, w))
    img = base[:, :, None] + rng.normal(0, noise, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255 ** 2 / mse)


def _imageio_decode(spark, data: bytes) -> np.ndarray:
    """Reference decode via the JVM's javax.imageio.  Grayscale uses
    the raw raster: BufferedImage.getRGB would apply a linear-gray ->
    sRGB colorspace remap (128 -> 188) that is a color-management
    choice, not JPEG decoding."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(data))
    assert img is not None, "javax.imageio could not parse the JPEG"
    w, h = img.getWidth(), img.getHeight()
    arr = gw.new_array(gw.jvm.int, w * h)
    if img.getRaster().getNumBands() == 1:
        img.getRaster().getPixels(0, 0, w, h, arr)
        return np.array(list(arr), dtype=np.uint8).reshape(h, w)
    img.getRGB(0, 0, w, h, arr, 0, w)
    px = np.array(list(arr), dtype=np.int64).reshape(h, w)
    return np.stack(
        [(px >> 16) & 255, (px >> 8) & 255, px & 255],
        axis=-1).astype(np.uint8)


def test_gray_fixture_bit_exact_vs_imageio(spark):
    data = open(os.path.join(FIXDIR, "gray_2x2.jpg"), "rb").read()
    mine = decode_jpeg(data)
    assert mine.shape == (2, 2)
    # the scan is literally one DC=0 + EOB block -> uniform 128
    assert (mine == 128).all()
    ref = _imageio_decode(spark, data)
    assert (mine == ref).all()


def test_color_420_fixture_vs_imageio(spark):
    """16x16 4:2:0 fixture: agreement within the integer-IDCT +
    upsampling tolerance of two independent implementations."""
    data = open(os.path.join(FIXDIR, "python_16x16.jpg"), "rb").read()
    mine = decode_jpeg(data)
    assert mine.shape == (16, 16, 3)
    ref = _imageio_decode(spark, data)
    diff = np.abs(ref.astype(int) - mine.astype(int))
    assert diff.max() <= 8 and diff.mean() < 1.0


def test_imageio_decodes_our_bitstreams(spark):
    """Foreign-decoder conformance of the ENCODER: javax.imageio must
    read our bitstreams (custom Huffman tables, 444/420, restarts)
    and agree with our own decode almost exactly."""
    img = _grad(37, 53)
    for kw in ({}, {"subsampling": "420"}, {"restart_interval": 2},
               {"subsampling": "420", "restart_interval": 3}):
        enc = encode_jpeg(img, quality=95, **kw)
        mine = decode_jpeg(enc)
        ref = _imageio_decode(spark, enc)
        diff = np.abs(ref.astype(int) - mine.astype(int))
        assert diff.max() <= 4, kw


def test_decode_foreign_imageio_bitstream(spark):
    """Conformance of the DECODER on a bitstream we did not produce:
    encode via javax.imageio, decode with both, compare."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    src = _grad(24, 40, seed=11, noise=6.0)
    bi = jvm.java.awt.image.BufferedImage(40, 24, 5)  # TYPE_3BYTE_BGR
    arr = gw.new_array(gw.jvm.int, 40 * 24)
    packed = ((src[:, :, 0].astype(np.int64) << 16)
              | (src[:, :, 1].astype(np.int64) << 8)
              | src[:, :, 2].astype(np.int64)).flatten().tolist()
    for i, v in enumerate(packed):
        arr[i] = int(v)
    bi.setRGB(0, 0, 40, 24, arr, 0, 40)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    foreign = bytes(baos.toByteArray())
    mine = decode_jpeg(foreign)
    ref = _imageio_decode(spark, foreign)
    diff = np.abs(ref.astype(int) - mine.astype(int))
    assert diff.max() <= 4 and diff.mean() < 0.5
    assert _psnr(src, mine) > 30


def test_roundtrip_psnr_and_quality_monotone():
    img = _grad(37, 53)
    gray = img[:, :, 0]
    assert _psnr(gray, decode_jpeg(encode_jpeg(gray))) > 40
    assert _psnr(img, decode_jpeg(encode_jpeg(img))) > 35
    assert _psnr(img, decode_jpeg(
        encode_jpeg(img, subsampling="420"))) > 33
    p30 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=30)))
    p75 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=75)))
    p98 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=98)))
    assert p30 < p75 < p98
    assert p98 > 48


def test_roundtrip_odd_sizes_and_restarts():
    """Edge blocks (non-multiple-of-8/16 dims) and DRI segmentation
    must not shift geometry or corrupt the tail MCUs."""
    for h, w in ((1, 1), (8, 8), (9, 17), (16, 16), (23, 31)):
        img = _grad(h, w, seed=h * 100 + w)
        for kw in ({}, {"subsampling": "420"}, {"restart_interval": 1}):
            dec = decode_jpeg(encode_jpeg(img, quality=92, **kw))
            assert dec.shape == (h, w, 3), (h, w, kw)
            assert _psnr(img, dec) > 28, (h, w, kw)


def test_restart_resets_dc_prediction():
    """A gradient whose DC ramps monotonically: if RSTn did not reset
    the DC predictors the right half of the image would shift."""
    img = _grad(16, 64, noise=0.0)
    a = decode_jpeg(encode_jpeg(img, quality=95))
    b = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=2))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 2


def test_declared_unsupported_modes():
    # hierarchical/differential modes remain the declared stubs —
    # every non-hierarchical mode (SOF0/1/2/3/9/10) decodes for real
    sof5 = (b"\xff\xd8\xff\xc5\x00\x0b\x08\x00\x02\x00\x02\x01"
            b"\x11\x00")
    with pytest.raises(NotImplementedError):
        decode_jpeg(sof5)
    # arithmetic frames with no scan are parse errors, like SOF2
    for m in (b"\xc9", b"\xca"):
        hdr = (b"\xff\xd8\xff" + m
               + b"\x00\x0b\x08\x00\x02\x00\x02\x01\x11\x00")
        with pytest.raises(ValueError):
            decode_jpeg(hdr)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xda\x00\x04\x00\x00")  # no frame
    # truncated progressive header (frame but no scan) is a parse
    # error, not a stub: SOF2 decodes for real since round 4
    sof2 = (b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x02\x00\x02\x01"
            b"\x11\x00")
    with pytest.raises(ValueError):
        decode_jpeg(sof2)


def _jvm_encode(spark, src: np.ndarray, progressive: bool) -> bytes:
    """Encode via javax.imageio, optionally with libjpeg's default
    progressive script (spectral selection + successive approximation
    + EOB runs — every Annex-G decode branch)."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    gray = src.ndim == 2
    h, w = src.shape[:2]
    bi = jvm.java.awt.image.BufferedImage(w, h, 10 if gray else 5)
    arr = gw.new_array(gw.jvm.int, w * h)
    if gray:
        for i, v in enumerate(src.astype(np.int64).flatten().tolist()):
            arr[i] = int(v)
        bi.getRaster().setPixels(0, 0, w, h, arr)
    else:
        packed = ((src[:, :, 0].astype(np.int64) << 16)
                  | (src[:, :, 1].astype(np.int64) << 8)
                  | src[:, :, 2].astype(np.int64)).flatten().tolist()
        for i, v in enumerate(packed):
            arr[i] = int(v)
        bi.setRGB(0, 0, w, h, arr, 0, w)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "jpg").next()
    param = writer.getDefaultWriteParam()
    if progressive:
        param.setProgressiveMode(
            jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None),
                 param)
    ios.flush()
    return bytes(baos.toByteArray())


def test_progressive_decode_vs_imageio(spark):
    """SOF2 conformance: javax.imageio's progressive bitstreams
    (libjpeg default script: spectral selection, successive
    approximation, EOB runs, 4:2:0) decoded by us vs by it."""
    src = _grad(41, 57, seed=13, noise=6.0)
    enc = _jvm_encode(spark, src, progressive=True)
    assert b"\xff\xc2" in enc[:200]  # really SOF2
    mine = decode_jpeg(enc)
    ref = _imageio_decode(spark, enc)
    diff = np.abs(ref.astype(int) - mine.astype(int))
    assert diff.max() <= 4 and diff.mean() < 0.5
    assert _psnr(src, mine) > 30


def test_progressive_gray_and_large(spark):
    gray = _grad(23, 31, seed=3)[:, :, 0].copy()
    enc = _jvm_encode(spark, gray, progressive=True)
    mine = decode_jpeg(enc)
    ref = _imageio_decode(spark, enc)
    assert np.abs(ref.astype(int) - mine.astype(int)).max() <= 2
    # larger, noisier image: long EOB runs span many blocks.  The
    # imageio tolerance is the same integer-IDCT band the sequential
    # path shows on this content (measured: identical diff stats);
    # the EXACT check is test_progressive_equals_sequential_content.
    big = _grad(128, 160, seed=29, noise=25.0)
    enc = _jvm_encode(spark, big, progressive=True)
    assert b"\xff\xc2" in enc[:300]
    mine = decode_jpeg(enc)
    ref = _imageio_decode(spark, enc)
    diff = np.abs(ref.astype(int) - mine.astype(int))
    assert diff.max() <= 8 and diff.mean() < 0.5


def test_progressive_equals_sequential_content(spark):
    """libjpeg quantizes IDENTICAL coefficients in sequential and
    progressive mode — the mode changes only the entropy-coding
    order — so our decodes of the two encodes must be BIT-IDENTICAL.
    This pins the whole Annex-G machinery (spectral bands, successive
    approximation, EOB runs) exactly, with no IDCT tolerance."""
    for h, w, noise, seed in ((32, 48, 4.0, 21), (128, 160, 25.0, 29)):
        src = _grad(h, w, seed=seed, noise=noise)
        seq = decode_jpeg(_jvm_encode(spark, src, progressive=False))
        prog = decode_jpeg(_jvm_encode(spark, src, progressive=True))
        assert (seq == prog).all(), (h, w)


def test_decode_is_deterministic():
    data = open(os.path.join(FIXDIR, "python_16x16.jpg"), "rb").read()
    a, b = decode_jpeg(data), decode_jpeg(data)
    assert (a == b).all()


def test_multimodal_real_path_covers_jpeg(spark):
    """synthetic_media alternates PNG/JPEG image payloads; the real
    (non-fake) feature path must decode both."""
    from tildener_spark.operators.multimodal import (
        extract_media_features, synthetic_media)
    media = synthetic_media(spark, n=18).filter("media_type = 'image'")
    out = extract_media_features(media, fake_decode=False).collect()
    assert len(out) == 6
    for r in out:
        assert r["features"][0] == 1.0  # is_image flag from real path
