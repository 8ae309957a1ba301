"""Ogg Vorbis codec (functions/ogg.py, functions/vorbis.py).

No reference Vorbis decoder exists in this container, so conformance
leans on the contracts that do not need one: the spec's worked
codeword-assignment example, exact round-trip sample accounting via
Ogg granules, SNR through the full lossy loop, page-CRC integrity,
packet spanning, and decode of hand-built general-form setup
structures (ordered codebooks, VQ lookup type 2) the constrained
encoder never emits.
"""

import numpy as np
import pytest

from tildener_spark.functions.ogg import (
    crc32_ogg, ogg_packets, ogg_pages_encode)
from tildener_spark.functions.vorbis import (
    Codebook, _BitReader, _BitWriter, _read_codebook,
    assign_codewords, decode_vorbis, encode_vorbis, float32_pack,
    float32_unpack, ilog)


def _tone(total, rate, freqs_amps, channels=1, phase=0.0):
    t = np.arange(total, dtype=np.float64)
    x = sum(a * np.sin(2 * np.pi * f * t / rate + phase)
            for f, a in freqs_amps)
    if channels == 2:
        x = np.stack([x, np.roll(x, 37)], axis=1)
    else:
        x = x[:, None]
    return x.astype(np.int16)


def _snr(ref, got):
    err = got.astype(np.float64) - ref.astype(np.float64)
    return 10 * np.log10(
        (ref.astype(np.float64) ** 2).mean()
        / max((err ** 2).mean(), 1e-12))


# ------------------------------------------------------------- Ogg

def test_ogg_packet_roundtrip_and_page_spanning():
    # 70 KB packet -> >255 lacing segments -> spans continued pages
    big = bytes((i * 7 + 3) % 256 for i in range(70000))
    small = b"hello"
    exact255 = bytes(255)            # 0-terminated lacing edge
    stream = ogg_pages_encode(
        [(small, 1), (big, 2), (exact255, 3), (b"", 4)])
    got = ogg_packets(stream)
    assert [p for p, _ in got] == [small, big, exact255, b""]
    assert [g for _, g in got] == [1, 2, 3, 4]


def test_ogg_crc_rejects_corruption():
    stream = bytearray(ogg_pages_encode([(b"payload", 0)]))
    stream[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        ogg_packets(bytes(stream))
    with pytest.raises(ValueError, match="capture"):
        ogg_packets(b"NotO" + bytes(30))


def test_ogg_crc_is_direct_unreflected():
    # independent property: CRC of the zeroed-CRC page must match the
    # stored field on a stream we produce
    stream = ogg_pages_encode([(b"x" * 300, 9)])
    page = stream
    crc_stored = int.from_bytes(page[22:26], "little")
    zeroed = page[:22] + b"\x00" * 4 + page[26:]
    assert crc32_ogg(zeroed) == crc_stored


# -------------------------------------------------------- codebooks

def test_spec_worked_codeword_example():
    """Vorbis I spec section 3.2.1 worked example: lengths
    [2,4,4,4,4,2,3,3] must assign exactly these codewords."""
    codes = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert codes == {0: (2, 0b00), 1: (4, 0b0100), 2: (4, 0b0101),
                     3: (4, 0b0110), 4: (4, 0b0111), 5: (2, 0b10),
                     6: (3, 0b110), 7: (3, 0b111)}


def test_overspecified_tree_rejected():
    with pytest.raises(ValueError, match="overspecified"):
        assign_codewords([1, 1, 1])


def test_codeword_encode_decode_inverse():
    cb = Codebook(1, [2, 4, 4, 4, 4, 2, 3, 3])
    w = _BitWriter()
    seq = [0, 5, 7, 1, 6, 3, 2, 4, 0]
    for e in seq:
        cb.write_entry(w, e)
    r = _BitReader(w.bytes())
    assert [cb.decode_scalar(r) for _ in seq] == seq


def test_ordered_codebook_parse():
    """The general decoder handles the ORDERED length format our
    encoder never writes: 8 entries, lengths 2,2,3,3,4,4,4,4 (a
    complete Kraft-exact tree)."""
    w = _BitWriter()
    w.write(0x564342, 24)
    w.write(1, 16)          # dim
    w.write(8, 24)          # entries
    w.write(1, 1)           # ordered
    w.write(2 - 1, 5)       # initial length 2
    w.write(2, ilog(8))     # 2 entries of len 2
    w.write(2, ilog(6))     # 2 entries of len 3
    w.write(4, ilog(4))     # 4 entries of len 4
    w.write(0, 4)           # lookup 0
    cb = _read_codebook(_BitReader(w.bytes()))
    assert [cb.lengths[i] for i in range(8)] == [2, 2, 3, 3, 4, 4,
                                                 4, 4]
    # complete tree: all 8 codewords distinct and prefix-free
    assert len({cb.codes[i] for i in range(8)}) == 8


def test_vq_lookup_type2_parse_and_decode():
    """Explicit (type 2) VQ table: entry e yields multiplicands
    [e*dim .. e*dim+dim) -- hand-build the bitstream and decode."""
    w = _BitWriter()
    w.write(0x564342, 24)
    w.write(2, 16)          # dim 2
    w.write(4, 24)          # entries
    w.write(0, 1)           # not ordered
    w.write(0, 1)           # not sparse
    for _ in range(4):
        w.write(2 - 1, 5)   # all lengths 2 (complete tree)
    w.write(2, 4)           # lookup type 2
    w.write(float32_pack(0.0), 32)
    w.write(float32_pack(0.5), 32)
    w.write(3 - 1, 4)       # 3 value bits
    w.write(0, 1)           # no sequence_p
    for m in [0, 1, 2, 3, 4, 5, 6, 7]:
        w.write(m, 3)
    cb = _read_codebook(_BitReader(w.bytes()))
    w2 = _BitWriter()
    cb.write_entry(w2, 3)
    vec = cb.decode_vector(_BitReader(w2.bytes()))
    assert vec == [0.5 * 6, 0.5 * 7]


def test_float32_pack_unpack_roundtrip():
    for v in (0.0, 1.0, -7.0, 0.0625, -0.4375, 3.5, 1024.0):
        assert float32_unpack(float32_pack(v)) == v


# ------------------------------------------------------ full codec

def test_roundtrip_mono_snr_and_exact_length():
    rate = 8000
    x = _tone(rate, rate, [(440, 9000), (1230, 4000)])
    enc = encode_vorbis(x, rate)
    dec, r2 = decode_vorbis(enc)
    assert r2 == rate
    assert dec.shape == x.shape
    assert _snr(x, dec) > 30


def test_roundtrip_stereo_snr():
    rate = 16000
    x = _tone(6000, rate, [(300, 8000), (2100, 3000)], channels=2)
    enc = encode_vorbis(x, rate)
    dec, r2 = decode_vorbis(enc)
    assert r2 == rate and dec.shape == x.shape
    assert _snr(x, dec) > 30


def test_roundtrip_unaligned_length():
    # total not a multiple of the 256-sample hop: granule must trim
    rate = 8000
    x = _tone(1000, rate, [(500, 6000)])
    dec, _ = decode_vorbis(encode_vorbis(x, rate))
    assert dec.shape == (1000, 1)


def test_encode_deterministic():
    x = _tone(2048, 8000, [(700, 5000)])
    assert encode_vorbis(x, 8000) == encode_vorbis(x, 8000)


def test_silence_roundtrip():
    x = np.zeros(700, dtype=np.int16)
    dec, _ = decode_vorbis(encode_vorbis(x, 8000))
    assert dec.shape == (700, 1)
    assert np.abs(dec).max() == 0


def test_decode_audio_routes_ogg():
    from tildener_spark.operators.multimodal import decode_audio
    x = _tone(900, 8000, [(650, 7000)])
    frames, rate = decode_audio(encode_vorbis(x, 8000))
    assert rate == 8000 and frames.shape == (900, 1)
    assert _snr(x, frames) > 30


def test_truncated_stream_rejected():
    enc = encode_vorbis(_tone(600, 8000, [(500, 5000)]), 8000)
    with pytest.raises(ValueError):
        decode_vorbis(enc[: len(enc) // 2 + 3])


def test_inverse_coupling_square_polar():
    """The magnitude/angle inversion on all four sign quadrants (the
    constrained encoder emits no coupling, so the decoder's path is
    pinned synthetically against the spec's 4.3.5 case table)."""
    from tildener_spark.functions.vorbis import inverse_couple
    assert inverse_couple(3, 1) == (3, 2)
    assert inverse_couple(3, -1) == (2, 3)
    assert inverse_couple(-3, 1) == (-3, -2)
    assert inverse_couple(-3, -1) == (-2, -3)
    assert inverse_couple(0, 2) == (0, 2)
    assert inverse_couple(2, 0) == (2, 2)


def test_residue_format0_and_format1_layouts():
    """Hand-drive _decode_residue for both body formats: format 0
    adds VQ vectors with stride partition_size/dim, format 1 adds
    them contiguously — same book, same bits, different layout."""
    from tildener_spark.functions.vorbis import (
        Residue, _decode_residue)
    # dim-2 VQ book, entries 4, values [0,1,2,3] -> vec (m0, m1)
    book = Codebook(2, [2] * 4, 1, minimum=0.0, delta=1.0,
                    sequence_p=0, multiplicands=[0, 1])
    classbook = Codebook(1, [1, 1], 0)   # 2 entries: classes 0/1
    w = _BitWriter()
    classbook.write_entry(w, 1)          # partition 0 -> class 1
    book.write_entry(w, 3)               # vec (1, 1)
    book.write_entry(w, 1)               # vec (1, 0)
    data = w.bytes()

    for rtype, expect in [
        # stride = 4/2 = 2: e3 -> v[0]+=1, v[2]+=1; e1 -> v[1]+=1,
        # v[3]+=0
        (0, [1.0, 1.0, 1.0, 0.0]),
        # contiguous: e3 -> v[0]+=1, v[1]+=1; e1 -> v[2]+=1, v[3]+=0
        (1, [1.0, 1.0, 1.0, 0.0]),
    ]:
        res = Residue(rtype, 0, 4, 4, 2, 0, [0, 1],
                      [[-1] * 8, [1] + [-1] * 7])
        books = [classbook, book]
        v = [[0.0, 0.0, 0.0, 0.0]]
        _decode_residue(_BitReader(data), res, books, v, [True])
        assert v[0] == expect, (rtype, v[0])
    # distinguish the layouts with asymmetric vectors: entry 2 is
    # (0, 1): format 0 puts the 1 at stride offset, format 1 next
    w2 = _BitWriter()
    classbook.write_entry(w2, 1)
    book.write_entry(w2, 2)              # vec (0, 1)
    book.write_entry(w2, 0)              # vec (0, 0)
    res0 = Residue(0, 0, 4, 4, 2, 0, [0, 1],
                   [[-1] * 8, [1] + [-1] * 7])
    v0 = [[0.0] * 4]
    _decode_residue(_BitReader(w2.bytes()), res0, [classbook, book],
                    v0, [True])
    assert v0[0] == [0.0, 0.0, 1.0, 0.0]
    res1 = Residue(1, 0, 4, 4, 2, 0, [0, 1],
                   [[-1] * 8, [1] + [-1] * 7])
    v1 = [[0.0] * 4]
    _decode_residue(_BitReader(w2.bytes()), res1, [classbook, book],
                    v1, [True])
    assert v1[0] == [0.0, 1.0, 0.0, 0.0]


def test_floor1_partitioned_curve_with_class_books():
    """A floor1 config WITH partitions (class books + neighbor
    prediction + step2 flags) — hand-built packet, then the curve
    must pass through the posted points on the dB ladder."""
    from tildener_spark.functions.vorbis import (
        _decode_floor1_packet, Floor1, INVERSE_DB_TABLE)
    # one partition, class 0: dim 2, no subclass bits, book 0 for
    # both values; X points 16 and 48 inside rangebits=6
    fl = Floor1(1, [0], [2], [0], [-1], [[0]], 1, 6, [0, 64, 16, 48])
    vbook = Codebook(1, [3] * 8, 0)      # scalar 0..7
    w = _BitWriter()
    w.write(1, 1)                        # nonzero
    w.write(10, 8)                       # y0
    w.write(10, 8)                       # y1
    vbook.write_entry(w, 0)              # point at X=16: val 0 ->
    vbook.write_entry(w, 0)              # predicted; X=48 likewise
    curve = _decode_floor1_packet(_BitReader(w.bytes()), fl,
                                  [vbook], 64)
    assert len(curve) == 64
    # val=0 everywhere -> flat line at y=10 across the whole range
    assert all(c == INVERSE_DB_TABLE[10] for c in curve)

    # now post a real value at X=16: val=4 -> final = pred + 2
    w = _BitWriter()
    w.write(1, 1)
    w.write(10, 8)
    w.write(10, 8)
    vbook.write_entry(w, 4)
    vbook.write_entry(w, 0)
    curve = _decode_floor1_packet(_BitReader(w.bytes()), fl,
                                  [vbook], 64)
    assert curve[16] == INVERSE_DB_TABLE[12]
    assert curve[0] == INVERSE_DB_TABLE[10]
    # linear (integer-rendered) ramp between the posted points
    assert curve[8] == INVERSE_DB_TABLE[11]


def test_floor1_unused_channel_flag():
    from tildener_spark.functions.vorbis import (
        _decode_floor1_packet, Floor1)
    fl = Floor1(0, [], [], [], [], [], 1, 6, [0, 64])
    w = _BitWriter()
    w.write(0, 1)
    assert _decode_floor1_packet(_BitReader(w.bytes()), fl, [],
                                 32) is None
