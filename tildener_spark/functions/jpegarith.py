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
                    blk, kx: int, ss: int = 1, se: int = 63,
                    al: int = 0) -> None:
    """Fill blk[ss..se] (zigzag order) in place; values scaled by
    ``<< al`` (progressive AC first scan; sequential = 1..63/0)."""
    st = stats.ac_bank(tbl)
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st[base]):
            return                    # EOB
        while dec.decode(st[base + 1]) == 0:
            k += 1
            base += 3
            if k > se:
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
        blk[k] = (-v if sign else v) << al
        k += 1


def encode_ac_block(enc: Encoder, stats: ArithStats, tbl: int,
                    blk, kx: int, ss: int = 1, se: int = 63,
                    al: int = 0) -> None:
    """Dual of decode_ac_block: codes blk[ss..se] >> al (progressive
    AC first scan semantics; sequential = 1..63/0)."""
    st = stats.ac_bank(tbl)
    nz = [k for k in range(ss, se + 1)
          if (blk[k] >> al if blk[k] >= 0 else -((-blk[k]) >> al))]
    k = ss
    for p in nz:
        enc.encode(0, st[3 * (k - 1)])            # not EOB yet
        for j in range(k, p):
            enc.encode(0, st[3 * (j - 1) + 1])    # zero run
        base = 3 * (p - 1)
        enc.encode(1, st[base + 1])
        v = int(blk[p])
        sign = 1 if v < 0 else 0
        enc.encode(sign, stats.fixed)
        sz = ((-v if sign else v) >> al) - 1
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
    if k <= se:
        enc.encode(1, st[3 * (k - 1)])            # EOB


# ------------------------------------------------ progressive (G.2)

def decode_dc_refine(dec: Decoder, stats: ArithStats, blk,
                     al: int) -> None:
    """DC successive-approximation refinement: one equiprobable bit
    per block (T.81 G.2.2 — the fixed state, no adaptation)."""
    if dec.decode(stats.fixed):
        blk[0] = int(blk[0]) | (1 << al)


def encode_dc_refine(enc: Encoder, stats: ArithStats, blk,
                     al: int) -> None:
    enc.encode((int(blk[0]) >> al) & 1, stats.fixed)


def _hist(v: int, al: int) -> int:
    """Coefficient value as already established by PREVIOUS scans
    (successive approximation: bits above al), sign preserved."""
    return -((-v) >> (al + 1) << (al + 1)) if v < 0 else         (v >> (al + 1) << (al + 1))


def decode_ac_refine(dec: Decoder, stats: ArithStats, tbl: int,
                     blk, ss: int, se: int, al: int) -> None:
    """AC successive-approximation refinement (T.81 G.2.3): per
    coefficient — correction bit for history-nonzero positions (SP
    state as context), newly-nonzero via S0 + fixed-state sign; the
    EOB decision (SE) is consulted only past ``kex``, the last
    history-nonzero index."""
    st = stats.ac_bank(tbl)
    p1 = 1 << al
    kex = se
    while kex >= ss and blk[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and dec.decode(st[base]):
            return                    # EOB
        while True:
            if blk[k]:
                if dec.decode(st[base + 2]):
                    blk[k] = (int(blk[k]) - p1 if blk[k] < 0
                              else int(blk[k]) + p1)
                break
            if dec.decode(st[base + 1]):
                blk[k] = -p1 if dec.decode(stats.fixed) else p1
                break
            k += 1
            base += 3
            if k > se:
                raise ValueError("arith AC refine past block end")
        k += 1


def encode_ac_refine(enc: Encoder, stats: ArithStats, tbl: int,
                     blk, ss: int, se: int, al: int) -> None:
    """Dual of decode_ac_refine, driven from the FINAL coefficients
    (history = bits above al, current bit = bit al)."""
    st = stats.ac_bank(tbl)
    kex = se                          # last history-nonzero index
    while kex >= ss and _hist(int(blk[kex]), al) == 0:
        kex -= 1
    ke = se                           # last index with any bit <= al+
    while ke >= ss and (abs(int(blk[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.encode(0, st[base])   # not EOB yet
        while True:
            v = int(blk[k])
            h = _hist(v, al)
            if h:
                enc.encode((abs(v) >> al) & 1, st[base + 2])
                break
            if (abs(v) >> al) & 1:
                enc.encode(1, st[base + 1])
                enc.encode(1 if v < 0 else 0, stats.fixed)
                break
            enc.encode(0, st[base + 1])
            k += 1
            base += 3
        k += 1
    if ke < se:
        nxt = max(ke + 1, ss)
        if nxt > kex:
            enc.encode(1, st[3 * (nxt - 1)])      # EOB
