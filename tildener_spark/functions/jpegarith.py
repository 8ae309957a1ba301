"""JPEG arithmetic-coding statistics model (ITU-T T.81 Annex F).

The conditioning layer between the QM coder (functions/qmcoder.py)
and the DCT coefficient stream, for extended sequential arithmetic
JPEG (SOF9).  Context layout follows T.81 Tables F.4/F.5 (the same
layout every conforming implementation uses):

DC (49 states per conditioning table): five 4-state banks selected
by classifying the PREVIOUS diff (zero / small± / large± against the
DAC L/U bounds) at offsets 0/4/8/12/16 — within a bank: S0 (diff
nonzero?), SS (sign), SP/SN (magnitude > 1, by sign); magnitude
category chain X1..X15 at 20..34; magnitude bits use one state per
category at X+14.

AC (245 states per table): per coefficient index k, a 3-state group
at 3(k-1): SE (end-of-block), S0 (coefficient nonzero?), SP
(magnitude > 1 — ALSO serves as X1); the X2.. category chains sit at
189 (k <= Kx, the DAC low band) or 217 (high band); signs use the
coder's fixed equiprobable state.

Restart intervals reset the coder, every statistics bin, and the DC
predictors/contexts (T.81 F.1.4.4).
"""

from __future__ import annotations

from tildener_spark.functions.qmcoder import (
    Decoder, Encoder, State, fixed_state)

# DAC defaults (T.81 F.1.4.4.1.2 / F.1.4.4.2.1)
DC_L_DEFAULT = 0
DC_U_DEFAULT = 1
AC_KX_DEFAULT = 5


class ArithStats:
    """All adaptive contexts for one scan (per conditioning table)."""

    def __init__(self) -> None:
        self.dc: dict[int, list[State]] = {}
        self.ac: dict[int, list[State]] = {}
        self.dc_context: dict[int, int] = {}
        self.fixed = fixed_state()

    def dc_bank(self, tbl: int) -> list[State]:
        if tbl not in self.dc:
            self.dc[tbl] = [State() for _ in range(49)]
        return self.dc[tbl]

    def ac_bank(self, tbl: int) -> list[State]:
        if tbl not in self.ac:
            self.ac[tbl] = [State() for _ in range(245)]
        return self.ac[tbl]


def _classify(m: int, sign: int, low: int, up: int) -> int:
    """Next block's DC context bank from this diff's magnitude
    category leading bit ``m`` (F.1.4.4.1.2)."""
    if m < ((1 << low) >> 1):
        return 0
    if m > ((1 << up) >> 1):
        return 12 + sign * 4
    return 4 + sign * 4


def decode_dc_diff(dec: Decoder, stats: ArithStats, tbl: int,
                   ci: int, low: int, up: int) -> int:
    st = stats.dc_bank(tbl)
    base = stats.dc_context.get(ci, 0)
    if dec.decode(st[base]) == 0:
        stats.dc_context[ci] = 0
        return 0
    sign = dec.decode(st[base + 1])
    m = dec.decode(st[base + 2 + sign])
    xi = 20
    if m:
        m = 1
        while dec.decode(st[xi]):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            xi += 1
    stats.dc_context[ci] = _classify(m, sign, low, up)
    v = m
    mst = st[xi + 14]
    while m > 1:
        m >>= 1
        if dec.decode(mst):
            v |= m
    v += 1
    return -v if sign else v


def encode_dc_diff(enc: Encoder, stats: ArithStats, tbl: int,
                   ci: int, diff: int, low: int, up: int) -> None:
    st = stats.dc_bank(tbl)
    base = stats.dc_context.get(ci, 0)
    if diff == 0:
        enc.encode(0, st[base])
        stats.dc_context[ci] = 0
        return
    enc.encode(1, st[base])
    sign = 1 if diff < 0 else 0
    enc.encode(sign, st[base + 1])
    sz = (-diff if sign else diff) - 1
    xi = 20
    if sz == 0:
        enc.encode(0, st[base + 2 + sign])
        m = 0
    else:
        enc.encode(1, st[base + 2 + sign])
        m = 1
        while (m << 1) <= sz:
            enc.encode(1, st[xi])
            m <<= 1
            xi += 1
        enc.encode(0, st[xi])
    stats.dc_context[ci] = _classify(m, sign, low, up)
    mst = st[xi + 14]
    bit = m >> 1
    while bit:
        enc.encode(1 if sz & bit else 0, mst)
        bit >>= 1


def decode_ac_block(dec: Decoder, stats: ArithStats, tbl: int,
                    blk, kx: int) -> None:
    """Fill blk[1..63] (zigzag order) in place."""
    st = stats.ac_bank(tbl)
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st[base]):
            return                    # EOB
        while dec.decode(st[base + 1]) == 0:
            k += 1
            base += 3
            if k > 63:
                raise ValueError("arith AC run past block end")
        sign = dec.decode(stats.fixed)
        m = dec.decode(st[base + 2])
        if m and dec.decode(st[base + 2]):   # X1 shares the SP state
            m = 2
            xi = 189 if k <= kx else 217
            while dec.decode(st[xi]):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arith AC magnitude overflow")
                xi += 1
            mst = st[xi + 14]
        else:
            mst = st[base + 2]        # unused when m <= 1
        v = m
        while m > 1:
            m >>= 1
            if dec.decode(mst):
                v |= m
        v += 1
        blk[k] = -v if sign else v
        k += 1


def encode_ac_block(enc: Encoder, stats: ArithStats, tbl: int,
                    blk, kx: int) -> None:
    st = stats.ac_bank(tbl)
    nz = [k for k in range(1, 64) if blk[k]]
    k = 1
    for p in nz:
        enc.encode(0, st[3 * (k - 1)])            # not EOB yet
        for j in range(k, p):
            enc.encode(0, st[3 * (j - 1) + 1])    # zero run
        base = 3 * (p - 1)
        enc.encode(1, st[base + 1])
        v = int(blk[p])
        sign = 1 if v < 0 else 0
        enc.encode(sign, stats.fixed)
        sz = (-v if sign else v) - 1
        if sz == 0:
            enc.encode(0, st[base + 2])
            m = 0
            mst = st[base + 2]
        elif sz == 1:
            enc.encode(1, st[base + 2])
            enc.encode(0, st[base + 2])
            m = 1
            mst = st[base + 2]
        else:
            enc.encode(1, st[base + 2])
            enc.encode(1, st[base + 2])
            m = 2
            xi = 189 if p <= kx else 217
            while (m << 1) <= sz:
                enc.encode(1, st[xi])
                m <<= 1
                xi += 1
            enc.encode(0, st[xi])
            mst = st[xi + 14]
        bit = m >> 1
        while bit:
            enc.encode(1 if sz & bit else 0, mst)
            bit >>= 1
        k = p + 1
    if k <= 63:
        enc.encode(1, st[3 * (k - 1)])            # EOB
