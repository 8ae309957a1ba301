"""Pure-Python/numpy FLAC codec (RFC 9639 / xiph FLAC format).

Turns the 'compressed audio' declared stub (operators/multimodal.py)
into a real decode path: FLAC needs no external codec — the stream is
CRC-framed Rice-coded linear prediction, all expressible with stdlib
ints + numpy.

Decoder coverage: STREAMINFO + skipped metadata blocks; fixed- and
variable-blocksize frames; all block-size/sample-rate/sample-size
codes; 1-8 independent channels plus the three stereo decorrelation
modes (left/side, right/side, mid/side); constant, verbatim, fixed
(orders 0-4) and LPC (orders 1-32) subframes; wasted bits; both Rice
methods (4- and 5-bit parameters) with escape partitions; CRC-8 and
CRC-16 verification and the STREAMINFO MD5 signature check.

The encoder emits every construct the decoder must parse (parameter
``force``: constant/verbatim/fixed/LPC subframes, the stereo modes,
Rice escapes), which is what makes the round-trip tests meaningful.

Conformance evidence (tests/test_flac.py), honestly stated: no
independent FLAC implementation exists in this container (no libFLAC/
ffmpeg; javax.sound has no FLAC reader), so unlike the JPEG codec
(functions/jpeg.py, cross-checked against javax.imageio) the evidence
is internal: (a) FLAC is LOSSLESS, so decode(encode(x)) == x bit-for-
bit for every path — a coding bug cannot hide behind quantization;
(b) the STREAMINFO MD5 is computed from the raw input samples at
encode time and re-verified against the DECODED samples, binding the
two sides through an independent hash; (c) CRC-8 (poly 0x07) and
CRC-16 (poly 0x8005) are pinned against published check values, so
the framing layer matches the spec, not merely itself.

Scale note: like JPEG, decoding is sequential per payload but
embarrassingly parallel across payloads via the mapInPandas batch
shape in operators/multimodal.py.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_SIG = b"fLaC"

# ---------------------------------------------------------------- CRC

def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    tbl = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl.append(r & mask)
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)      # CRC-8/SMBUS, init 0
_CRC16_TBL = _crc_table(0x8005, 16)  # CRC-16/BUYPASS, init 0


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TBL[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TBL[(r >> 8) ^ b]
    return r


# ---------------------------------------------------------- bit I/O

class _Bits:
    """MSB-first reader over bytes."""

    __slots__ = ("d", "pos")  # pos in bits

    def __init__(self, d: bytes, pos_bytes: int = 0):
        self.d = d
        self.pos = pos_bytes * 8

    def read(self, n: int) -> int:
        d, p = self.d, self.pos
        end = p + n
        if end > len(d) * 8:
            raise ValueError("FLAC bitstream truncated")
        v = int.from_bytes(d[p // 8:(end + 7) // 8], "big")
        v >>= (-end) % 8
        self.pos = end
        return v & ((1 << n) - 1)

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count 0-bits up to the terminating 1-bit (RFC 9639 §9.1)."""
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitW:
    """MSB-first writer."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q > 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _utf8_coded(n: int) -> bytes:
    """FLAC's extended UTF-8 coding of frame/sample numbers."""
    if n < 0x80:
        return bytes([n])
    out, nbytes = [], 0
    lim, mark = 0x800, 0xC0
    while n >= lim and nbytes < 5:
        lim <<= 5
        mark = (mark >> 1) | 0x80
        nbytes += 1
    body = []
    for _ in range(nbytes + 1):
        body.append(0x80 | (n & 0x3F))
        n >>= 6
    out = [mark | n] + body[::-1]
    return bytes(out)


def _read_utf8_coded(r: _Bits) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    m = b0
    while m & 0x40:
        nbytes += 1
        m <<= 1
    v = b0 & (0x3F >> nbytes)
    for _ in range(nbytes):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8-coded number in FLAC frame")
        v = (v << 6) | (b & 0x3F)
    return v


# block size code -> size (None: coded in header tail)
_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
          6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
          11: 96000}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


# ------------------------------------------------------------- decode

def _read_residual(r: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    plen = 4 if method == 0 else 5
    esc = (1 << plen) - 1
    part_order = r.read(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("FLAC partition does not divide block")
    out = np.empty(blocksize - order, dtype=np.int64)
    k = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = r.read(plen)
        if param == esc:  # raw escape
            bits = r.read(5)
            for i in range(n):
                out[k + i] = r.sread(bits) if bits else 0
        else:
            for i in range(n):
                q = r.unary()
                u = (q << param) | r.read(param) if param else q
                out[k + i] = (u >> 1) ^ -(u & 1)  # unfold zigzag
        k += n
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _predict(warm: np.ndarray, res: np.ndarray, coefs: list[int],
             shift: int) -> np.ndarray:
    order = len(coefs)
    n = order + len(res)
    s = np.empty(n, dtype=np.int64)
    s[:order] = warm
    c = coefs
    for i in range(order, n):
        acc = 0
        for j in range(order):
            acc += c[j] * s[i - 1 - j]
        s[i] = res[i - order] + (acc >> shift)
    return s


def _read_subframe(r: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    bps -= wasted
    if t == 0:  # constant
        v = r.sread(bps)
        out = np.full(blocksize, v, dtype=np.int64)
    elif t == 1:  # verbatim
        out = np.fromiter((r.sread(bps) for _ in range(blocksize)),
                          dtype=np.int64, count=blocksize)
    elif 8 <= t <= 12:  # fixed, order t-8
        order = t - 8
        warm = np.fromiter((r.sread(bps) for _ in range(order)),
                           dtype=np.int64, count=order)
        res = _read_residual(r, blocksize, order)
        out = _predict(warm, res, _FIXED_COEFS[order], 0)
    elif t >= 32:  # LPC, order t-31
        order = t - 31
        warm = np.fromiter((r.sread(bps) for _ in range(order)),
                           dtype=np.int64, count=order)
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = r.sread(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [r.sread(prec) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        out = _predict(warm, res, coefs, shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    return out << wasted if wasted else out


def decode_flac(payload: bytes,
                verify_md5: bool = True) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n_frames, channels) int array, sample_rate).

    dtype is int16 for bps <= 16, else int32."""
    data = bytes(payload or b"")
    if data[:4] != FLAC_SIG:
        raise ValueError("not a FLAC stream (bad signature)")
    pos = 4
    info = None
    while True:  # metadata blocks
        hdr = data[pos:pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated FLAC metadata")
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        body = data[pos + 4:pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            r = _Bits(body)
            r.read(16), r.read(16), r.read(24), r.read(24)
            rate = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = body[18:34]
            info = (rate, nch, bps, total, md5)
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, nch, bps, total, md5 = info
    chans: list[np.ndarray] = [np.empty(0, np.int64)] * 0
    frames = []
    n_done = 0
    while pos < len(data) and (total == 0 or n_done < total):
        hdr_start = pos
        r = _Bits(data, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        if r.read(1):
            raise ValueError("bad FLAC frame reserved bit")
        r.read(1)  # blocking strategy (number parsing is uniform)
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("bad FLAC frame reserved bit 2")
        _num = _read_utf8_coded(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE[bs_code]
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        fbps = _SAMPLE_SIZE.get(ss_code, bps)
        hdr_bytes = data[hdr_start:(r.pos + 7) // 8]
        if crc8(hdr_bytes) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("FLAC channel count mismatch")
            subs = [_read_subframe(r, blocksize, fbps)
                    for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation needs 2 ch")
            b0 = fbps + (1 if ch_code == 9 else 0)
            b1 = fbps + (1 if ch_code in (8, 10) else 0)
            s0 = _read_subframe(r, blocksize, b0)
            s1 = _read_subframe(r, blocksize, b1)
            if ch_code == 8:  # left/side
                subs = [s0, s0 - s1]
            elif ch_code == 9:  # right/side
                subs = [s1 + s0, s1]
            else:  # mid/side
                m = (s0 << 1) | (s1 & 1)
                subs = [(m + s1) >> 1, (m - s1) >> 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        r.align()
        frame_bytes = data[hdr_start:r.pos // 8]
        if crc16(frame_bytes) != r.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        frames.append(np.stack(subs, axis=1))
        n_done += blocksize
        pos = r.pos // 8
    out = (np.concatenate(frames, axis=0) if frames
           else np.empty((0, nch), np.int64))
    if total:
        out = out[:total]
    dt = np.int16 if bps <= 16 else np.int32
    out = out.astype(dt)
    if verify_md5 and md5 != b"\x00" * 16:
        width = (bps + 7) // 8
        raw = _pack_le(out, width, bps)
        if hashlib.md5(raw).digest() != md5:
            raise ValueError("FLAC MD5 signature mismatch")
    return out, rate


def _pack_le(samples: np.ndarray, width: int, bps: int) -> bytes:
    """Interleaved little-endian packing used by the MD5 signature."""
    flat = samples.astype(np.int64).reshape(-1)
    b = np.empty((len(flat), width), dtype=np.uint8)
    for i in range(width):
        b[:, i] = (flat >> (8 * i)) & 0xFF
    return b.tobytes()


# ------------------------------------------------------------- encode

def _rice_encode(w: _BitW, res: np.ndarray, plen: int,
                 force_escape: bool = False) -> None:
    """One partition (order 0) with a mean-magnitude Rice parameter,
    or a raw escape partition when forced (tests the escape path)."""
    esc = (1 << plen) - 1
    if force_escape:
        w.write(esc, plen)
        bits = max(1, int(np.abs(res).max()).bit_length() + 1) \
            if len(res) else 1
        w.write(min(bits, 31), 5)
        for v in res:
            w.write(int(v) & ((1 << min(bits, 31)) - 1), min(bits, 31))
        return
    r64 = res.astype(np.int64)
    # zigzag fold: 2v for v >= 0, -2v-1 for v < 0
    u = np.where(r64 >= 0, r64 << 1, ((-r64) << 1) - 1)
    mean = float(u.mean()) if len(u) else 0.0
    param = 0
    while (1 << (param + 1)) < mean + 1 and param < esc - 1:
        param += 1
    w.write(param, plen)
    for v in u:
        v = int(v)
        w.unary(v >> param)
        if param:
            w.write(v & ((1 << param) - 1), param)


def _lpc_coefs(x: np.ndarray, order: int, prec: int = 12):
    """Levinson-Durbin + coefficient quantization -> (coefs, shift)."""
    xf = x.astype(np.float64)
    n = len(xf)
    ac = np.array([np.dot(xf[:n - k], xf[k:]) for k in range(order + 1)])
    if ac[0] == 0:
        return [0] * order, 0
    err = ac[0]
    a = np.zeros(order + 1)
    for i in range(1, order + 1):
        acc = ac[i] - np.dot(a[1:i], ac[1:i][::-1])
        k = acc / err if err else 0.0
        a[1:i] = a[1:i] - k * a[1:i][::-1]
        a[i] = k
        err *= (1 - k * k)
        if err <= 0:
            break
    lpc = a[1:order + 1]
    cmax = np.abs(lpc).max() or 1.0
    shift = prec - 1 - int(np.ceil(np.log2(cmax + 1e-9))) - 1
    shift = max(0, min(15, shift))
    q = np.clip(np.round(lpc * (1 << shift)),
                -(1 << (prec - 1)), (1 << (prec - 1)) - 1).astype(int)
    return list(q), shift


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _write_subframe(w: _BitW, s: np.ndarray, bps: int,
                    force: str | None) -> None:
    s64 = s.astype(np.int64)
    if force == "verbatim":
        w.write(0, 1), w.write(1, 6), w.write(0, 1)
        for v in s64:
            w.write(int(v) & ((1 << bps) - 1), bps)
        return
    if (force == "constant" or
            (force is None and len(s64) and (s64 == s64[0]).all())):
        if not (s64 == s64[0]).all():
            raise ValueError("constant subframe forced on varying data")
        w.write(0, 1), w.write(0, 6), w.write(0, 1)
        w.write(int(s64[0]) & ((1 << bps) - 1), bps)
        return
    if force == "lpc" and len(s64) > 16:
        order = min(8, len(s64) - 1)
        coefs, shift = _lpc_coefs(s64, order)
        w.write(0, 1), w.write(32 + order - 1, 6), w.write(0, 1)
        for v in s64[:order]:
            w.write(int(v) & ((1 << bps) - 1), bps)
        prec = 12
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(int(c) & ((1 << prec) - 1), prec)
        pred = np.empty(len(s64) - order, dtype=np.int64)
        for i in range(order, len(s64)):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(s64[i - 1 - j])
            pred[i - order] = int(s64[i]) - (acc >> shift)
        w.write(0, 2)   # rice method 0 (4-bit params)
        w.write(0, 4)   # partition order 0
        _rice_encode(w, pred, 4)
        return
    # fixed predictor: pick the order with the smallest |residual| sum
    best, border = None, 0
    for order in range(0, min(4, len(s64) - 1) + 1):
        res = _fixed_residual(s64, order)
        cost = np.abs(res).sum()
        if best is None or cost < best:
            best, border = cost, order
    res = _fixed_residual(s64, border)
    w.write(0, 1), w.write(8 + border, 6), w.write(0, 1)
    for v in s64[:border]:
        w.write(int(v) & ((1 << bps) - 1), bps)
    method = 1 if force == "rice2" else 0
    w.write(method, 2)
    w.write(0, 4)  # partition order 0
    _rice_encode(w, res, 4 if method == 0 else 5,
                 force_escape=(force == "escape"))


def encode_flac(samples: np.ndarray, rate: int,
                block_size: int = 4096,
                stereo_mode: str = "independent",
                force: str | None = None) -> bytes:
    """(n,) or (n, channels) int16 -> FLAC bytes (lossless).

    ``stereo_mode``: independent | left_side | right_side | mid_side
    (2-channel input only).  ``force`` pins the subframe construct
    for tests: constant | verbatim | lpc | rice2 | escape | None
    (None = constant where possible, else best fixed predictor)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape
    if nch > 8:
        raise ValueError("FLAC supports at most 8 channels")
    if stereo_mode != "independent" and nch != 2:
        raise ValueError("stereo decorrelation needs 2 channels")
    bps = 16
    md5 = hashlib.md5(_pack_le(s, 2, bps)).digest()
    out = bytearray(FLAC_SIG)
    si = _BitW()
    si.write(block_size, 16), si.write(block_size, 16)
    si.write(0, 24), si.write(0, 24)
    si.write(rate, 20), si.write(nch - 1, 3), si.write(bps - 1, 5)
    si.write(n, 36)
    body = bytes(si.out) + md5
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    for f, start in enumerate(range(0, max(n, 1), block_size)):
        blk = s[start:start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 1)   # reserved
        w.write(0, 1)   # fixed blocksize strategy
        w.write(7, 4)   # block size: 16-bit-1 follows (always exact)
        w.write(0, 4)   # sample rate: from STREAMINFO
        if stereo_mode == "independent":
            w.write(nch - 1, 4)
        else:
            w.write({"left_side": 8, "right_side": 9,
                     "mid_side": 10}[stereo_mode], 4)
        w.write(4, 3)   # 16 bps
        w.write(0, 1)   # reserved
        for b in _utf8_coded(f):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.align()
        hdr = bytes(w.out)
        w.write(crc8(hdr), 8)
        if stereo_mode == "independent":
            for c in range(nch):
                _write_subframe(w, blk[:, c], bps, force)
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            if stereo_mode == "left_side":
                _write_subframe(w, left, bps, force)
                _write_subframe(w, side, bps + 1, force)
            elif stereo_mode == "right_side":
                _write_subframe(w, side, bps + 1, force)
                _write_subframe(w, right, bps, force)
            else:
                mid = (left + right) >> 1
                _write_subframe(w, mid, bps, force)
                _write_subframe(w, side, bps + 1, force)
        w.align()
        frame = bytes(w.out)
        w.write(crc16(frame), 16)
        out += bytes(w.out)
    return bytes(out)
