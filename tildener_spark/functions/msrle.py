"""Microsoft RLE8 (BI_RLE8) video frames — real inter-frame coding.

MS-RLE is the classic Video-for-Windows codec (biCompression=1 in
BITMAPINFOHEADER, documented in the public Windows GDI/VfW format
references).  Its escape codes make it a true INTER-FRAME codec:

  N C (N>0)    run: N pixels of palette index C
  00 00        end of line — remaining pixels of the row keep the
               PREVIOUS frame's content
  00 01        end of bitmap — everything not yet written keeps the
               previous frame's content
  00 02 dx dy  delta: skip dx right / dy up without writing (again
               exposing the previous frame)
  00 N (N>=3)  absolute: N literal indices follow, word-padded

so a frame's bitstream only needs to carry what CHANGED — which is
the property separating video codecs from per-frame image codecs.
Rows run bottom-up, as in any DIB.

The decoder maintains the persistent canvas across frames; the
encoder emits a full keyframe for frame 0 and genuine delta frames
(EOL row skips + delta-escape pixel skips) afterwards.  Round trips
are bit-exact on the palette indices — the conformance style used
for lossless JPEG — and the tests also decode hand-written
spec-example bitstreams byte by byte.

Beyond-reference multimodal surface (SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np


def decode_rle8_frame(data: bytes, canvas: np.ndarray) -> np.ndarray:
    """Apply one BI_RLE8 frame to ``canvas`` ((H, W) uint8 palette
    indices, bottom-up row order maintained by the caller as row 0 =
    bottom).  Returns the mutated canvas."""
    h, w = canvas.shape
    x = y = 0  # y counts bottom-up rows
    i = 0
    n = len(data)
    while i + 1 < n:
        b0, b1 = data[i], data[i + 1]
        i += 2
        if b0 > 0:  # encoded run
            end = min(x + b0, w)
            if y < h:
                canvas[y, x:end] = b1
            x = end
        elif b1 == 0:  # end of line
            x = 0
            y += 1
        elif b1 == 1:  # end of bitmap
            break
        elif b1 == 2:  # delta skip
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode
            count = b1
            end = min(x + count, w)
            if y < h:
                run = np.frombuffer(data[i:i + count], dtype=np.uint8)
                canvas[y, x:end] = run[: end - x]
            x = end
            i += count + (count & 1)  # word-aligned
    return canvas


def _emit_runs(row: np.ndarray, x0: int, x1: int) -> bytes:
    """RLE-encode row[x0:x1] as encoded runs (no escapes)."""
    out = bytearray()
    x = x0
    while x < x1:
        c = row[x]
        run = 1
        while x + run < x1 and row[x + run] == c and run < 255:
            run += 1
        out += bytes([run, int(c)])
        x += run
    return bytes(out)


def encode_rle8_frame(frame: np.ndarray,
                      prev: np.ndarray | None) -> bytes:
    """(H, W) uint8 indices -> one BI_RLE8 frame bitstream.

    ``prev=None`` emits a keyframe (every pixel written);  otherwise a
    delta frame: unchanged rows become bare EOLs, unchanged pixel
    spans inside changed rows become delta escapes."""
    h, w = frame.shape
    out = bytearray()
    for y in range(h):  # bottom-up row order is the caller's layout
        row = frame[y]
        if prev is not None and np.array_equal(row, prev[y]):
            out += b"\x00\x00"  # EOL: keep previous content
            continue
        if prev is None:
            out += _emit_runs(row, 0, w)
        else:
            changed = row != prev[y]
            x = 0
            while x < w:
                if not changed[x]:
                    # skip unchanged span via delta escapes
                    nxt = x
                    while nxt < w and not changed[nxt]:
                        nxt += 1
                    if nxt >= w:
                        break  # EOL below keeps the tail
                    skip = nxt - x
                    while skip > 0:
                        step = min(skip, 255)
                        out += bytes([0, 2, step, 0])
                        skip -= step
                    x = nxt
                else:
                    nxt = x
                    while nxt < w and changed[nxt]:
                        nxt += 1
                    out += _emit_runs(row, x, nxt)
                    x = nxt
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def decode_rle8_video(frames_data: list[bytes], width: int,
                      height: int) -> list[np.ndarray]:
    """Bitstream list -> list of (H, W) uint8 index frames
    (top-down row order)."""
    canvas = np.zeros((height, width), dtype=np.uint8)  # bottom-up
    out = []
    for data in frames_data:
        canvas = decode_rle8_frame(data, canvas)
        out.append(canvas[::-1].copy())  # flip to top-down
    return out


def encode_rle8_video(frames: np.ndarray) -> list[bytes]:
    """(n, H, W) uint8 index frames (top-down) -> bitstream list."""
    arr = np.asarray(frames, dtype=np.uint8)
    prev = None
    out = []
    for f in arr:
        bu = f[::-1]  # to bottom-up
        out.append(encode_rle8_frame(bu, prev))
        prev = bu.copy()
    return out
