"""ADPCM compressed audio (IMA/DVI tag 0x11, Microsoft tag 0x02).

Both are the classic 4-bit adaptive-differential PCM families carried
in WAV containers: each fixed-size block re-seeds the predictor from
an in-band header, so blocks decode independently — which is exactly
what makes the format parallelizable in Spark (one Arrow batch can
hold many blocks; no cross-block state).

Algorithms follow the public specifications:
  * IMA ADPCM — IMA "Recommended Practices for Enhancing Digital
    Audio Compatibility" rev 3.00 (1992): 89-entry step-size table,
    16-entry index-adjust table, 4-byte per-channel block header
    (predictor:int16, step_index:uint8, reserved), nibbles
    low-then-high, stereo interleaved in 4-byte groups per channel.
  * MS ADPCM — Microsoft WAVE format documentation: 7 fixed
    coefficient pairs, per-block header (predictor index, initial
    delta, two seed samples), adaptive delta via the 16-entry
    adaptation table, nibbles high-then-low.

Correctness evidence (tests/test_adpcm.py): a deliberately naive
per-sample scalar reference decoder written straight from the spec
text is compared against the production decoder on random bitstreams
(cross-implementation differential, the same pattern used for
jaro_winkler); encoder output decodes back within the quantizer's
error bound and the encoder→decoder→encoder loop is a fixpoint.

Beyond-reference multimodal surface (SURVEY.md §2.10); TildeNER has
no audio path.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------- IMA tables

IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], dtype=np.int32)

IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int32)


def _ima_decode_nibbles(nibbles: np.ndarray, predictor: int,
                        index: int) -> np.ndarray:
    """Decode a 1-D uint8 nibble stream for one channel of one block."""
    out = np.empty(len(nibbles), dtype=np.int16)
    pred = int(predictor)
    idx = int(index)
    step_t = IMA_STEP_TABLE
    idx_t = IMA_INDEX_TABLE
    for i, nib in enumerate(nibbles):
        nib = int(nib)
        step = int(step_t[idx])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            pred -= diff
        else:
            pred += diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(idx_t[nib])))
        out[i] = pred
    return out


def decode_ima_block(block: bytes, channels: int) -> np.ndarray:
    """One IMA-ADPCM WAV block -> (n_frames, channels) int16.

    Layout per the IMA/Microsoft WAV mapping: ``channels`` 4-byte
    headers (predictor int16 LE, step index uint8, reserved byte),
    then data in 4-byte groups round-robin across channels; each data
    byte holds two samples, LOW nibble first."""
    heads = []
    for c in range(channels):
        pred, idx, _res = struct.unpack_from("<hBB", block, c * 4)
        heads.append((pred, min(88, max(0, idx))))
    data = np.frombuffer(block, dtype=np.uint8)[channels * 4:]
    # low nibble first, then high
    nibbles = np.empty(len(data) * 2, dtype=np.uint8)
    nibbles[0::2] = data & 0x0F
    nibbles[1::2] = data >> 4
    if channels == 1:
        decoded = _ima_decode_nibbles(nibbles, *heads[0])
        # header predictor is emitted as frame 0 per the IMA mapping
        return np.concatenate(
            [[np.int16(heads[0][0])], decoded]).reshape(-1, 1)
    # stereo+: 4-byte (8-nibble) groups alternate channels
    groups = nibbles.reshape(-1, 8)
    frames_per_ch = []
    for c in range(channels):
        ch_nib = groups[c::channels].reshape(-1)
        frames_per_ch.append(_ima_decode_nibbles(ch_nib, *heads[c]))
    first = np.array([h[0] for h in heads], dtype=np.int16)
    body = np.stack(frames_per_ch, axis=1)
    return np.concatenate([first[None, :], body], axis=0)


def encode_ima_block(frames: np.ndarray, index: int = 0) -> bytes:
    """(n_frames, channels) int16 -> one IMA-ADPCM block.

    Frame 0 seeds the header predictor verbatim (so it decodes back
    exactly); remaining frames quantize through the standard step
    loop. ``n_frames - 1`` must be a multiple of 8 per channel."""
    frames = np.asarray(frames, dtype=np.int16)
    if frames.ndim == 1:
        frames = frames[:, None]
    channels = frames.shape[1]
    heads = b""
    nib_streams = []
    for c in range(channels):
        pred = int(frames[0, c])
        idx = int(index)
        heads += struct.pack("<hBB", pred, idx, 0)
        nibs = []
        for s in frames[1:, c].astype(np.int32):
            step = int(IMA_STEP_TABLE[idx])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # reconstruct exactly as the decoder will
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            pred = pred - d if nib & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(IMA_INDEX_TABLE[nib])))
            nibs.append(nib)
        nib_streams.append(np.array(nibs, dtype=np.uint8))
    if channels == 1:
        nibbles = nib_streams[0]
    else:
        groups = [s.reshape(-1, 8) for s in nib_streams]
        inter = np.empty((groups[0].shape[0] * channels, 8), dtype=np.uint8)
        for c in range(channels):
            inter[c::channels] = groups[c]
        nibbles = inter.reshape(-1)
    data = (nibbles[0::2] | (nibbles[1::2] << 4)).astype(np.uint8)
    return heads + data.tobytes()


# ----------------------------------------------------------- MS ADPCM

MS_COEFFS = np.array([[256, 0], [512, -256], [0, 0], [192, 64],
                      [240, 0], [460, -208], [392, -232]],
                     dtype=np.int32)

MS_ADAPT = np.array([230, 230, 230, 230, 307, 409, 512, 614,
                     768, 614, 512, 409, 307, 230, 230, 230],
                    dtype=np.int32)


def decode_ms_block(block: bytes, channels: int) -> np.ndarray:
    """One MS-ADPCM WAV block -> (n_frames, channels) int16.

    Header per channel (channel-interleaved fields): predictor index
    uint8, then initial delta int16, then sample1 int16, sample2
    int16. Nibbles are HIGH-first and alternate channels."""
    off = 0
    pidx = [block[off + c] for c in range(channels)]
    off += channels
    delta = list(struct.unpack_from("<" + "h" * channels, block, off))
    off += 2 * channels
    s1 = list(struct.unpack_from("<" + "h" * channels, block, off))
    off += 2 * channels
    s2 = list(struct.unpack_from("<" + "h" * channels, block, off))
    off += 2 * channels
    data = np.frombuffer(block, dtype=np.uint8)[off:]
    nibbles = np.empty(len(data) * 2, dtype=np.uint8)
    nibbles[0::2] = data >> 4  # high nibble first
    nibbles[1::2] = data & 0x0F
    n_out = len(nibbles) // channels
    out = np.empty((n_out + 2, channels), dtype=np.int16)
    for c in range(channels):
        out[0, c] = s2[c]
        out[1, c] = s1[c]
    cur1 = list(s1)
    cur2 = list(s2)
    d = list(delta)
    for i, nib in enumerate(nibbles):
        c = i % channels
        coef1, coef2 = int(MS_COEFFS[pidx[c], 0]), int(MS_COEFFS[pidx[c], 1])
        pred = (cur1[c] * coef1 + cur2[c] * coef2) >> 8
        signed = int(nib) - 16 if nib & 8 else int(nib)
        sample = pred + signed * d[c]
        sample = max(-32768, min(32767, sample))
        cur2[c] = cur1[c]
        cur1[c] = sample
        d[c] = max(16, (int(MS_ADAPT[nib]) * d[c]) >> 8)
        out[2 + i // channels, c] = sample
    return out


def encode_ms_block(frames: np.ndarray, predictor: int = 0,
                    delta: int = 16) -> bytes:
    """(n_frames, channels) int16 -> one MS-ADPCM block (fixed
    predictor choice; frames[0]/frames[1] seed the header exactly)."""
    frames = np.asarray(frames, dtype=np.int16)
    if frames.ndim == 1:
        frames = frames[:, None]
    channels = frames.shape[1]
    coef1, coef2 = int(MS_COEFFS[predictor, 0]), int(MS_COEFFS[predictor, 1])
    head = bytes([predictor] * channels)
    head += struct.pack("<" + "h" * channels, *([delta] * channels))
    head += struct.pack("<" + "h" * channels,
                        *[int(frames[1, c]) for c in range(channels)])
    head += struct.pack("<" + "h" * channels,
                        *[int(frames[0, c]) for c in range(channels)])
    cur1 = [int(frames[1, c]) for c in range(channels)]
    cur2 = [int(frames[0, c]) for c in range(channels)]
    d = [delta] * channels
    nibs = []
    for i in range(2, frames.shape[0]):
        for c in range(channels):
            pred = (cur1[c] * coef1 + cur2[c] * coef2) >> 8
            err = int(frames[i, c]) - pred
            q = int(np.clip(round(err / d[c]), -8, 7))
            nib = q & 0x0F
            sample = max(-32768, min(32767, pred + q * d[c]))
            cur2[c] = cur1[c]
            cur1[c] = sample
            d[c] = max(16, (int(MS_ADAPT[nib]) * d[c]) >> 8)
            nibs.append(nib)
    if len(nibs) % 2:
        nibs.append(0)
    arr = np.array(nibs, dtype=np.uint8)
    data = ((arr[0::2] << 4) | arr[1::2]).astype(np.uint8)
    return head + data.tobytes()
