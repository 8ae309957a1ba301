"""QM arithmetic coder (ITU-T T.81 Annex D / T.82 Annex E shape).

The adaptive binary arithmetic coder JPEG's SOF9/SOF10 modes use:
one shared state-transition table (the standard 113-entry Qe table,
plus the non-adaptive index 113 JPEG uses for AC signs), conditional
MPS/LPS exchange, byte-oriented renormalization with 0xFF bit
stuffing (after an 0xFF byte the next byte carries 7 payload bits so
carries cannot propagate into emitted bytes, and any 0xFF followed by
a byte > 0x8F terminates the entropy segment — that is how JPEG
markers stay parseable inside arithmetic scans).

Evidence level (stated plainly — see tests/test_qmcoder.py and
tests/test_jpeg_arith.py): no independent arithmetic-JPEG codec
exists in this container (javax.imageio neither reads nor writes
SOF9), so unlike the Huffman paths this coder cannot be
cross-conformance-tested against a foreign implementation.  What IS
verified: (a) encoder/decoder duality fuzzed over random
symbol/context streams including renorm, carry, stuffing, and
marker-termination edges; (b) the full JPEG integration decodes to
COEFFICIENT-IDENTICAL output vs the independently
javax.imageio-anchored Huffman path on the same inputs; (c) the Qe
table's structural invariants (chain reachability, switch flags only
at MPS-flip states, Qe monotonicity along NMPS chains).

Interval convention (T.81 decoder flowcharts D.15-D.19): the LPS
subinterval sits at the BOTTOM [0, Qe) and the MPS at the top, with
conditional exchange when the MPS subinterval A-Qe drops below Qe;
registers initialize A=0x8000 on both sides, decoder via
C=(B0<<16); BYTEIN; C<<=7.
"""

from __future__ import annotations

# The standard JPEG/JBIG probability-estimation table (T.81 Table
# D.3): (Qe, NMPS, NLPS, SWITCH).  Index 113 is JPEG's fixed
# (non-adaptive) equiprobable state used for AC coefficient signs.
QE_TABLE: list[tuple[int, int, int, int]] = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    # index 113: JPEG's fixed equiprobable state (never adapts)
    (0x5A1D, 113, 113, 0),
]


class State:
    """One adaptive context: estimation index + current MPS sense."""

    __slots__ = ("index", "mps")

    def __init__(self) -> None:
        self.index = 0
        self.mps = 0


def fixed_state() -> State:
    """JPEG's non-adaptive equiprobable context (AC signs)."""
    s = State()
    s.index = 113
    return s


class Encoder:
    """QM encoder writing a JPEG-style entropy segment.

    The interval arithmetic runs over an UNBOUNDED C (python int):
    the byte stream is produced in one packing pass at flush() — an
    exact construction of the bit tape the Decoder consumes (carry
    resolution is then plain integer addition, and 0xFF bit stuffing
    is decided byte-by-byte on the final value).  Alignment contract
    with the Decoder: both start A=0x8000, so the code value is the
    fraction c / 2^(15+S) after S renorm shifts, and the decoder's
    initial window holds tape bits [0..14] (B0<<16 then BYTEIN then
    C<<=7).  O(S²/word) worst case on the big shifts — fine for the
    block sizes JPEG scans hand this coder."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.shifts = 0

    def encode(self, d: int, s: State) -> None:
        qe, nmps, nlps, switch = QE_TABLE[s.index]
        self.a -= qe
        if d == s.mps:
            if self.a & 0x8000:
                self.c += qe          # fast path: MPS on top interval
                return
            if self.a < qe:
                self.a = qe           # conditional exchange: bottom
            else:
                self.c += qe
            s.index = nmps
        else:
            if self.a < qe:
                self.c += qe          # conditional exchange: top
            else:
                self.a = qe           # LPS bottom interval
            if switch:
                s.mps ^= 1
            s.index = nlps
        while not (self.a & 0x8000):
            self.a <<= 1
            self.c <<= 1
            self.shifts += 1

    def flush(self) -> bytes:
        # CLEARBITS: steer to the value in [C, C+A) with the most
        # trailing zero bits, then pack the tape MSB-first with the
        # 0xFF bit-stuffing rule the decoder's BYTEIN expects
        t = (self.c + self.a - 1) >> 16 << 16
        c = t + 0x8000 if t < self.c else t
        nbits = self.shifts + 15
        out = bytearray()
        pos = nbits - 1               # index of next tape bit
        while pos >= 0:
            width = 7 if (out and out[-1] == 0xFF) else 8
            if pos + 1 >= width:
                b = (c >> (pos + 1 - width)) & ((1 << width) - 1)
            else:                     # final partial byte, zero-pad
                b = (c << (width - 1 - pos)) & ((1 << width) - 1)
            out.append(b)             # stuffed MSB is the implicit 0
            pos -= width
        # a trailing 0xFF is all 1-bits == exactly what the decoder
        # feeds past the end, so dropping it loses nothing and keeps
        # the byte stream unambiguous against following markers
        # (0xFF + RSTn/EOI must parse as the marker)
        while out and out[-1] == 0xFF:
            out.pop()
        return bytes(out)


class Decoder:
    """QM decoder over a JPEG-style entropy segment; feeds 1-bits
    past the end / a marker (T.81 BYTEIN marker rule)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self.last = b0
        self.ct = 0
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        d, bp = self.data, self.bp
        if self.last == 0xFF:
            nxt = d[bp + 1] if bp + 1 < len(d) else 0xFF
            if nxt > 0x8F:
                self.c += 0xFF00      # marker/end: feed 1-bits
                self.ct = 8
                return
            self.bp = bp + 1
            self.last = nxt
            self.c += nxt << 9
            self.ct = 7
            return
        if bp + 1 < len(d):
            self.bp = bp + 1
            self.last = d[self.bp]
            self.c += self.last << 8
        else:
            self.last = 0xFF
            self.c += 0xFF00
        self.ct = 8

    def decode(self, s: State) -> int:
        qe, nmps, nlps, switch = QE_TABLE[s.index]
        self.a -= qe
        chigh = (self.c >> 16) & 0xFFFF
        if chigh < qe:
            # bottom interval
            if self.a < qe:           # exchanged: bottom is MPS
                d = s.mps
                s.index = nmps
            else:
                d = s.mps ^ 1
                if switch:
                    s.mps ^= 1
                s.index = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return s.mps          # fast path, no renorm
            if self.a < qe:           # exchanged: top is LPS
                d = s.mps ^ 1
                if switch:
                    s.mps ^= 1
                s.index = nlps
            else:
                d = s.mps
                s.index = nmps
        while True:
            self.a <<= 1
            if self.ct == 0:
                self._bytein()
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d
