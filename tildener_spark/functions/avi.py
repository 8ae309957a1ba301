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


def decode_avi_mjpeg(payload: bytes) -> tuple[list[np.ndarray], float]:
    """AVI bytes -> (list of (H, W, 3) uint8 frames, fps).

    Only the MJPG/'raw JPEG frames' codec is supported; any other
    stream compression raises the declared NotImplementedError."""
    data = bytes(payload or b"")
    if data[:4] != AVI_SIG or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    us_per_frame = 0
    rate = scale = 0
    compression = b""
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal us_per_frame, rate, scale, compression
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
            elif cid[2:4] in (b"dc", b"db") and size > 0:
                if compression not in (b"MJPG", b"mjpg", b"\x00" * 4):
                    raise NotImplementedError(
                        f"AVI codec {compression!r} needs an external "
                        "decoder; only MJPG is supported")
                frames.append(decode_jpeg(data[body:body + size]))

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    if rate and scale:
        fps = rate / scale
    elif us_per_frame:
        fps = 1e6 / us_per_frame
    else:
        raise ValueError("AVI missing frame timing")
    frames = [f if f.ndim == 3 else np.repeat(f[:, :, None], 3, axis=2)
              for f in frames]
    return frames, fps


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
