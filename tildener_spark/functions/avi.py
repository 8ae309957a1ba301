"""MJPEG-in-AVI video codec (pure Python/numpy).

Gives ``decode_video`` (operators/multimodal.py) a real path: AVI is
plain RIFF chunk framing (the same container discipline as WAV,
functions/codecs.py) and Motion-JPEG frames are ordinary baseline
JPEGs, decoded by the conformance-tested pure-numpy T.81 codec
(functions/jpeg.py, cross-checked against javax.imageio).  Inter-
frame-compressed video (H.264/VP9/AV1...) remains the declared stub —
those are genuinely different decoding pipelines.

Format notes (public AVI/RIFF spec, 'AVI RIFF File Reference'):
RIFF('AVI ') holds LIST('hdrl') with the main header ``avih`` and one
LIST('strl') per stream (``strh`` + ``strf``), then LIST('movi')
whose '##dc'/'##db' chunks carry one JPEG per frame; the optional
idx1 index is ignored on read (we scan 'movi' linearly — at pipeline
scale the payload is already in memory as one Arrow cell).
"""

from __future__ import annotations

import struct

import numpy as np

from tildener_spark.functions.jpeg import decode_jpeg, encode_jpeg

AVI_SIG = b"RIFF"


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size); chunks are word-aligned."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    """AVI bytes -> (list of (H, W, 3) uint8 frames, fps).

    Two stream codecs decode for real: MJPG (per-frame T.81 JPEG)
    and MS-RLE / BI_RLE8 (functions/msrle.py — true inter-frame
    delta coding).  Anything else raises the declared
    NotImplementedError."""
    from tildener_spark.functions import msrle

    data = bytes(payload or b"")
    if data[:4] != AVI_SIG or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    us_per_frame = 0
    rate = scale = 0
    compression = b""
    bi_compression = -1
    width = height = 0
    palette = None
    raw_frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal us_per_frame, rate, scale, compression, palette
        nonlocal bi_compression, width, height
        for cid, body, size in _chunks(data, pos, end):
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the list type tag
            elif cid == b"avih":
                (us_per_frame,) = struct.unpack(
                    "<I", data[body:body + 4])
            elif cid == b"strh":
                if data[body:body + 4] == b"vids":
                    compression = data[body + 4:body + 8]
                    scale, rate = struct.unpack(
                        "<II", data[body + 20:body + 28])
            elif cid == b"strf" and size >= 40 and bi_compression < 0:
                _sz, w_, h_ = struct.unpack("<Iii", data[body:body + 12])
                bits, comp = struct.unpack(
                    "<HI", data[body + 14:body + 20])
                bi_compression = comp
                width, height = w_, abs(h_)
                if bits == 8 and size >= 40 + 256 * 4:
                    pal = np.frombuffer(
                        data[body + 40:body + 40 + 1024],
                        dtype=np.uint8).reshape(256, 4)
                    palette = pal[:, [2, 1, 0]].copy()  # BGRX -> RGB
            elif cid[2:4] in (b"dc", b"db") and size > 0:
                raw_frames.append(data[body:body + size])

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    if rate and scale:
        fps = rate / scale
    elif us_per_frame:
        fps = 1e6 / us_per_frame
    else:
        raise ValueError("AVI missing frame timing")
    if compression in (b"MJPG", b"mjpg") or (
            compression == b"\x00" * 4 and bi_compression != 1):
        frames = [decode_jpeg(f) for f in raw_frames]
        frames = [f if f.ndim == 3
                  else np.repeat(f[:, :, None], 3, axis=2)
                  for f in frames]
        return frames, fps
    if compression in (b"MRLE", b"mrle") or bi_compression == 1:
        if palette is None:
            raise ValueError("RLE8 AVI missing 8-bit palette")
        idx_frames = msrle.decode_rle8_video(raw_frames, width, height)
        return [palette[f] for f in idx_frames], fps
    raise NotImplementedError(
        f"AVI codec {compression!r} needs an external decoder; "
        "MJPG and MS-RLE (BI_RLE8) are supported")


def decode_avi_mjpeg(payload: bytes) -> tuple[list[np.ndarray], float]:
    """Back-compat alias — see :func:`decode_avi`."""
    return decode_avi(payload)


def encode_avi_msrle(index_frames: np.ndarray, palette: np.ndarray,
                     fps: float = 10.0) -> bytes:
    """(n, H, W) uint8 palette indices + (256, 3) RGB palette ->
    MS-RLE (BI_RLE8) AVI with a keyframe + true delta frames."""
    from tildener_spark.functions import msrle

    arr = np.asarray(index_frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError("encode_avi_msrle wants (n, H, W) uint8")
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.shape != (256, 3):
        raise ValueError("palette must be (256, 3) uint8 RGB")
    n, h, w = arr.shape
    streams = msrle.encode_rle8_video(arr)
    scale, rate = 1000, int(round(fps * 1000))
    max_size = max(map(len, streams))

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I", int(1e6 * scale / rate), max_size * int(fps) + 1,
        0, 0x10, n, 0, 1, max_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MRLE"
            + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0, scale, rate,
                          0, n, max_size, 10000, 0, 0, 0, w, h))
    bgrx = np.zeros((256, 4), dtype=np.uint8)
    bgrx[:, :3] = pal[:, [2, 1, 0]]  # RGB -> BGRX quads
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1,  # BI_RLE8
                       max_size, 0, 0, 256, 256) + bgrx.tobytes()
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", s) for s in streams))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi_mjpeg(frames: np.ndarray, fps: float = 10.0,
                     quality: int = 90) -> bytes:
    """(n, H, W, 3) uint8 -> MJPEG AVI bytes."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError("encode_avi_mjpeg wants (n, H, W, 3) uint8")
    n, h, w, _ = arr.shape
    jpegs = [encode_jpeg(f, quality=quality, subsampling="420")
             for f in arr]
    scale, rate = 1000, int(round(fps * 1000))

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(1e6 * scale / rate), max(map(len, jpegs)) * int(fps) + 1,
        0, 0x10, n, 0, 1, max(map(len, jpegs)), w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0, scale, rate,
                          0, n, max(map(len, jpegs)), 10000, 0,
                          0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
