"""ISO base-media (MP4/MOV) container demux for MJPEG video tracks.

The MP4 container (ISO/IEC 14496-12 "ISO base media file format") is
a tree of big-endian boxes; the per-sample byte ranges live in the
sample tables under ``moov/trak/mdia/minf/stbl``:

  stsd  sample description (codec fourcc + VisualSampleEntry)
  stts  decoding deltas (frame timing)
  stsz  per-sample sizes
  stsc  sample->chunk mapping (first_chunk, samples_per_chunk)
  stco/co64  chunk file offsets

This module implements the container demux faithfully (including
64-bit largesize boxes, co64, and multi-run stsc walks) and decodes
tracks whose sample entry is ``jpeg`` / ``mjpa`` — Motion-JPEG, where
every sample is a self-contained T.81 bitstream handled by the
conformance-tested pure-numpy codec (functions/jpeg.py).  Tracks in
predictive codecs (``avc1``/``hvc1``/``vp09``/``av01``/``mp4v``)
raise the declared ``NotImplementedError`` — inter-frame motion
compensation genuinely needs an external decoder.

The muxer emits a minimal-but-valid progressive-download layout
(ftyp, mdat, moov) used by the round-trip tests: mux -> demux ->
per-frame pixel identity with direct JPEG decode proves the sample
tables address exactly the bytes the muxer wrote.

Beyond-reference multimodal surface (SURVEY.md §2.10).
"""

from __future__ import annotations

import struct

import numpy as np

from tildener_spark.functions.jpeg import decode_jpeg, encode_jpeg

MJPEG_ENTRIES = (b"jpeg", b"mjpa", b"mjpb", b"JPEG")
PREDICTIVE_ENTRIES = (b"avc1", b"avc3", b"hvc1", b"hev1", b"vp08",
                      b"vp09", b"av01", b"mp4v", b"s263")


def _boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) at one nesting level."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        fourcc = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed ISO-BMFF box")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, path: list[bytes]):
    """All (body_start, body_end) of boxes matching a fourcc path."""
    head, rest = path[0], path[1:]
    out = []
    for fourcc, body, bend in _boxes(data, pos, end):
        if fourcc != head:
            continue
        if not rest:
            out.append((body, bend))
        else:
            out.extend(_find(data, body, bend, rest))
    return out


def _parse_stbl(data: bytes, pos: int, end: int) -> dict:
    tbl: dict = {}
    for fourcc, body, bend in _boxes(data, pos, end):
        p = body + 4  # skip version/flags of the full box
        if fourcc == b"stsd":
            (n,) = struct.unpack(">I", data[p:p + 4])
            (esize,) = struct.unpack(">I", data[p + 4:p + 8])
            entry = data[p + 8:p + 12]
            tbl["codec"] = entry
            if n >= 1 and esize >= 36:
                tbl["width"], tbl["height"] = struct.unpack(
                    ">HH", data[p + 4 + 32:p + 4 + 36])
        elif fourcc == b"stts":
            (n,) = struct.unpack(">I", data[p:p + 4])
            runs = [struct.unpack(">II", data[p + 4 + 8 * i:p + 12 + 8 * i])
                    for i in range(n)]
            tbl["stts"] = runs
        elif fourcc == b"stsz":
            uniform, n = struct.unpack(">II", data[p:p + 8])
            if uniform:
                tbl["sizes"] = [uniform] * n
            else:
                tbl["sizes"] = list(np.frombuffer(
                    data[p + 8:p + 8 + 4 * n], dtype=">u4"))
        elif fourcc == b"stsc":
            (n,) = struct.unpack(">I", data[p:p + 4])
            tbl["stsc"] = [struct.unpack(
                ">III", data[p + 4 + 12 * i:p + 16 + 12 * i])
                for i in range(n)]
        elif fourcc == b"stco":
            (n,) = struct.unpack(">I", data[p:p + 4])
            tbl["chunks"] = list(np.frombuffer(
                data[p + 4:p + 4 + 4 * n], dtype=">u4"))
        elif fourcc == b"co64":
            (n,) = struct.unpack(">I", data[p:p + 4])
            tbl["chunks"] = list(np.frombuffer(
                data[p + 4:p + 4 + 8 * n], dtype=">u8"))
    return tbl


def _sample_ranges(tbl: dict) -> list[tuple[int, int]]:
    """stsc/stsz/stco walk -> [(offset, size)] in decode order."""
    sizes = tbl["sizes"]
    chunks = tbl["chunks"]
    stsc = tbl["stsc"]
    ranges: list[tuple[int, int]] = []
    si = 0
    for ri, (first, per_chunk, _desc) in enumerate(stsc):
        last = (stsc[ri + 1][0] - 1) if ri + 1 < len(stsc) else len(chunks)
        for ci in range(first - 1, last):
            off = int(chunks[ci])
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return ranges
                ranges.append((off, int(sizes[si])))
                off += int(sizes[si])
                si += 1
    return ranges


def decode_mp4_mjpeg(payload: bytes) -> tuple[list[np.ndarray], float]:
    """MP4/MOV bytes -> (list of (H, W, 3) uint8 frames, fps)."""
    data = bytes(payload or b"")
    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    for moov_s, moov_e in _find(data, 0, len(data), [b"moov"]):
        for trak_s, trak_e in _find(data, moov_s, moov_e, [b"trak"]):
            mdia = _find(data, trak_s, trak_e, [b"mdia"])
            if not mdia:
                continue
            mdia_s, mdia_e = mdia[0]
            hdlr = _find(data, mdia_s, mdia_e, [b"hdlr"])
            if not hdlr or data[hdlr[0][0] + 8:hdlr[0][0] + 12] != b"vide":
                continue
            mdhd_s, _ = _find(data, mdia_s, mdia_e, [b"mdhd"])[0]
            version = data[mdhd_s]
            if version == 1:
                (timescale,) = struct.unpack(
                    ">I", data[mdhd_s + 20:mdhd_s + 24])
            else:
                (timescale,) = struct.unpack(
                    ">I", data[mdhd_s + 12:mdhd_s + 16])
            stbl_s, stbl_e = _find(data, mdia_s, mdia_e,
                                   [b"minf", b"stbl"])[0]
            tbl = _parse_stbl(data, stbl_s, stbl_e)
            codec = tbl.get("codec", b"????")
            if codec in PREDICTIVE_ENTRIES:
                raise NotImplementedError(
                    f"MP4 video codec {codec.decode('latin1')!r} uses "
                    "inter-frame prediction and needs an external "
                    "decoder; only MJPEG (jpeg/mjpa) tracks decode here")
            if codec not in MJPEG_ENTRIES:
                raise ValueError(f"unsupported MP4 sample entry {codec!r}")
            frames = []
            for off, size in _sample_ranges(tbl):
                img = decode_jpeg(data[off:off + size])
                frames.append(img if img.ndim == 3
                              else np.repeat(img[:, :, None], 3, axis=2))
            runs = tbl.get("stts") or [(len(frames), timescale)]
            total = sum(c for c, _ in runs)
            ticks = sum(c * d for c, d in runs)
            fps = timescale * total / ticks if ticks else 0.0
            return frames, fps
    raise ValueError("MP4 has no video track")


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(fourcc, struct.pack(">I", version << 24) + body)


def encode_mp4_mjpeg(frames: np.ndarray, fps: float = 10.0,
                     quality: int = 90) -> bytes:
    """(n, H, W, 3) uint8 -> MP4 bytes with one MJPEG video track."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError("encode_mp4_mjpeg wants (n, H, W, 3) uint8")
    n, h, w, _ = arr.shape
    jpegs = [encode_jpeg(f, quality=quality, subsampling="420")
             for f in arr]
    timescale = 12800
    delta = int(round(timescale / fps))
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso2")
    mdat = _box(b"mdat", b"".join(jpegs))
    data_start = len(ftyp) + 8  # samples start inside mdat

    entry = (struct.pack(">I", 86) + b"jpeg"  # VisualSampleEntry
             + b"\x00" * 6 + struct.pack(">H", 1)
             + b"\x00" * 16
             + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x480000, 0x480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1)
             + b"\x00" * 32
             + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(j)) for j in jpegs))
    stco = _full(b"stco", struct.pack(">II", 1, data_start))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _full(b"dref", struct.pack(">I", 1)
                 + struct.pack(">I", 12) + b"url "
                 + struct.pack(">I", 1))
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), 0)
    vmhd = vmhd[:8] + struct.pack(">I", 1) + vmhd[12:]  # flags=1 per spec
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"MJPEG\x00")
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale,
                                      duration, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                         0, 0, 0x40000000)
    tkhd = _full(b"tkhd", struct.pack(">IIIII", 0, 0, 1, 0, duration)
                 + b"\x00" * 12 + matrix
                 + struct.pack(">II", w << 16, h << 16), 0)
    tkhd = tkhd[:8] + struct.pack(">I", 7) + tkhd[12:]  # enabled flags
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">IH", 0x10000, 0x100) + b"\x00" * 10
                 + matrix + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
