"""ISO-BMFF (MP4) MJPEG demux: round trip + sample-table checks.

Mux -> demux -> per-frame pixel identity with a direct JPEG decode of
the same source proves the stsc/stsz/stco walk addresses exactly the
bytes the muxer wrote; box-level tests pin largesize and co64
handling and the declared predictive-codec stub.
"""

import struct

import numpy as np
import pytest

from tildener_spark.functions import mp4
from tildener_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _frames(n=6, h=48, w=64):
    out = np.zeros((n, h, w, 3), dtype=np.uint8)
    y, x = np.mgrid[0:h, 0:w]
    for i in range(n):
        out[i, :, :, 0] = (x * 2 + i * 10) % 256
        out[i, :, :, 1] = (y * 3 + i * 5) % 256
        out[i, :, :, 2] = (x + y + i * 20) % 256
    return out


def test_roundtrip_pixel_identity():
    frames = _frames()
    payload = mp4.encode_mp4_mjpeg(frames, fps=12.0, quality=92)
    dec, fps = mp4.decode_mp4_mjpeg(payload)
    assert len(dec) == 6
    assert abs(fps - 12.0) < 0.05
    for i in range(6):
        direct = decode_jpeg(
            encode_jpeg(frames[i], quality=92, subsampling="420"))
        assert np.array_equal(dec[i], direct)


def test_predictive_codec_is_declared_stub():
    payload = mp4.encode_mp4_mjpeg(_frames(2), fps=10.0)
    stsd_at = payload.index(b"stsd")
    entry_at = payload.index(b"jpeg", stsd_at)
    for codec in (b"avc1", b"hvc1", b"vp09", b"av01", b"mp4v"):
        bad = (payload[:entry_at] + codec + payload[entry_at + 4:])
        with pytest.raises(NotImplementedError, match="inter-frame"):
            mp4.decode_mp4_mjpeg(bad)


def test_unknown_codec_is_value_error():
    payload = mp4.encode_mp4_mjpeg(_frames(2), fps=10.0)
    stsd_at = payload.index(b"stsd")
    entry_at = payload.index(b"jpeg", stsd_at)
    bad = payload[:entry_at] + b"zzzz" + payload[entry_at + 4:]
    with pytest.raises(ValueError, match="sample entry"):
        mp4.decode_mp4_mjpeg(bad)


def test_largesize_and_co64_paths():
    """Rewrite mdat as a 64-bit-largesize box and stco as co64; the
    demux must land on the same samples."""
    frames = _frames(3)
    payload = mp4.encode_mp4_mjpeg(frames, fps=8.0)
    base, _ = mp4.decode_mp4_mjpeg(payload)

    # split at mdat: [ftyp][mdat][moov]
    (ftyp_size,) = struct.unpack(">I", payload[:4])
    (mdat_size,) = struct.unpack(
        ">I", payload[ftyp_size:ftyp_size + 4])
    ftyp = payload[:ftyp_size]
    mdat_body = payload[ftyp_size + 8:ftyp_size + mdat_size]
    moov = payload[ftyp_size + mdat_size:]
    big_mdat = (struct.pack(">I", 1) + b"mdat"
                + struct.pack(">Q", 16 + len(mdat_body)) + mdat_body)
    # samples shift by the 8 extra header bytes -> patch stco to co64
    stco_at = moov.index(b"stco") - 4
    (stco_size,) = struct.unpack(">I", moov[stco_at:stco_at + 4])
    vf, n, off = struct.unpack(
        ">III", moov[stco_at + 8:stco_at + 20])
    assert n == 1
    co64 = (struct.pack(">I", 24) + b"co64" + struct.pack(">I", vf)
            + struct.pack(">IQ", 1, off + 8))
    patched_moov = moov[:stco_at] + co64 + moov[stco_at + stco_size:]
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov each grow by 4)
    grown = co64_growth = len(co64) - stco_size
    for fourcc in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        at = patched_moov.index(fourcc) - 4
        (sz,) = struct.unpack(">I", patched_moov[at:at + 4])
        patched_moov = (patched_moov[:at]
                        + struct.pack(">I", sz + grown)
                        + patched_moov[at + 4:])
    rebuilt = ftyp + big_mdat + patched_moov
    dec, fps = mp4.decode_mp4_mjpeg(rebuilt)
    assert len(dec) == len(base)
    for a, b in zip(dec, base):
        assert np.array_equal(a, b)
    assert co64_growth == 4


def test_multimodal_routes_mp4():
    from tildener_spark.operators import multimodal
    payload = mp4.encode_mp4_mjpeg(_frames(2), fps=10.0)
    frames, fps = multimodal.decode_video(payload)
    assert len(frames) == 2 and frames[0].shape == (48, 64, 3)
    with pytest.raises(NotImplementedError, match="WebM"):
        multimodal.decode_video(b"\x1a\x45\xdf\xa3" + b"\x00" * 32)
