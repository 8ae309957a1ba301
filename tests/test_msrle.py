"""MS-RLE (BI_RLE8) inter-frame video: exact round trips + spec
bitstreams.

RLE8 is lossless on palette indices, so encoder->decoder bit identity
is the conformance check (the lossless-JPEG pattern); the delta-size
assertion proves frames actually reference the previous frame rather
than re-coding everything.
"""

import numpy as np
import pytest

from tildener_spark.functions import avi, msrle


def _sprite_video(n=8, h=40, w=60, seed=9):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    frames = np.zeros((n, h, w), dtype=np.uint8)
    frames[0] = rng.integers(0, 40, (h, w))
    for i in range(1, n):
        frames[i] = frames[i - 1]
        frames[i, 3 * i:3 * i + 6, 5 * i:5 * i + 6] = 200 + i
    return frames, pal


def test_bit_exact_roundtrip_and_delta_compression():
    frames, _ = _sprite_video()
    streams = msrle.encode_rle8_video(frames)
    dec = msrle.decode_rle8_video(streams, 60, 40)
    for i, f in enumerate(frames):
        assert np.array_equal(dec[i], f), f"frame {i}"
    # inter-frame coding: delta frames carry only the changed sprite
    key = len(streams[0])
    assert all(len(s) < key // 4 for s in streams[1:])


def test_identical_frame_is_rows_of_eol():
    frame = np.arange(64, dtype=np.uint8).reshape(8, 8)
    stream = msrle.encode_rle8_frame(frame, frame.copy())
    # 8 EOLs + EOB, nothing else
    assert stream == b"\x00\x00" * 8 + b"\x00\x01"


def test_handwritten_spec_bitstream():
    canvas = np.zeros((4, 8), dtype=np.uint8)
    bs = bytes([3, 7,              # run: 3 px of index 7
                0, 3, 1, 2, 3, 0,  # absolute: 3 literals, word-padded
                0, 0,              # end of line
                0, 2, 2, 1,        # delta: right 2, up 1
                2, 9,              # run: 2 px of 9
                0, 1])             # end of bitmap
    out = msrle.decode_rle8_frame(bs, canvas)
    exp = np.zeros((4, 8), dtype=np.uint8)
    exp[0, :3] = 7
    exp[0, 3:6] = [1, 2, 3]
    exp[2, 2:4] = 9
    assert np.array_equal(out, exp)


def test_previous_content_shows_through_skips():
    prev = np.full((3, 4), 5, dtype=np.uint8)
    # delta frame writing only (0,0): everything else keeps 5
    bs = bytes([1, 9, 0, 1])
    out = msrle.decode_rle8_frame(bs, prev.copy())
    assert out[0, 0] == 9
    assert (out.sum() - 9) == 5 * 11


def test_avi_container_roundtrip_rgb():
    frames, pal = _sprite_video(n=5)
    payload = avi.encode_avi_msrle(frames, pal, fps=15.0)
    rgb, fps = avi.decode_avi(payload)
    assert abs(fps - 15.0) < 0.01 and len(rgb) == 5
    for i, f in enumerate(frames):
        assert np.array_equal(rgb[i], pal[f])


def test_multimodal_routes_msrle_avi():
    from tildener_spark.operators import multimodal
    frames, pal = _sprite_video(n=3)
    payload = avi.encode_avi_msrle(frames, pal, fps=10.0)
    rgb, fps = multimodal.decode_video(payload)
    assert len(rgb) == 3 and rgb[0].shape == (40, 60, 3)


def test_unknown_avi_codec_still_declared():
    frames, pal = _sprite_video(n=2)
    payload = avi.encode_avi_msrle(frames, pal, fps=10.0)
    bad = payload.replace(b"MRLE", b"H264", 1)
    # strf still says BI_RLE8 -> flip it too so the dispatch misses
    import struct
    strf_at = bad.index(b"strf")
    comp_at = strf_at + 8 + 16
    bad = bad[:comp_at] + struct.pack("<I", 0x34363248) + bad[comp_at + 4:]
    with pytest.raises(NotImplementedError, match="external decoder"):
        avi.decode_avi(bad)
