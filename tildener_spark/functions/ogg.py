"""Ogg bitstream framing (RFC 3533), pure stdlib.

The transport layer under Vorbis audio: logical streams are split
into packets, packets into 255-byte lacing segments, segments into
CRC-protected pages.  This module implements both directions —
:func:`ogg_packets` (parse + CRC verify + continued-packet
reassembly) and :func:`ogg_pages_encode` (segment + page + CRC) —
so :mod:`tildener_spark.functions.vorbis` can round-trip real Ogg
files.

The page CRC is the direct (non-reflected) CRC-32 with polynomial
0x04C11DB7, initial value 0 and no final XOR, computed over the page
with the CRC field zeroed — Ogg's one deviation from the common
zlib CRC-32 (which reflects and inverts).
"""

from __future__ import annotations

import struct

__all__ = ["OGG_SIG", "crc32_ogg", "ogg_packets",
           "ogg_pages_encode"]

OGG_SIG = b"OggS"

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 \
            else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def crc32_ogg(data: bytes, crc: int = 0) -> int:
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[
            ((crc >> 24) & 0xFF) ^ b]
    return crc


def ogg_packets(data: bytes) -> list[tuple[bytes, int]]:
    """Parse a physical Ogg stream into (packet bytes, granule of
    the page the packet ENDS on) — the granule a decoder needs for
    sample-count truncation.  Verifies every page CRC and the
    continuation flags; raises ValueError on corruption."""
    packets: list[tuple[bytes, int]] = []
    partial = b""
    pos = 0
    expect_cont = False
    while pos < len(data):
        if data[pos:pos + 4] != OGG_SIG:
            raise ValueError(f"bad Ogg capture pattern at {pos}")
        if len(data) < pos + 27:
            raise ValueError("truncated Ogg page header")
        (version, htype, granule, _serial, _seq, crc, nsegs) = \
            struct.unpack("<BBqIIIB", data[pos + 4:pos + 27])
        if version != 0:
            raise ValueError(f"unsupported Ogg version {version}")
        lacing = data[pos + 27:pos + 27 + nsegs]
        body_at = pos + 27 + nsegs
        body_len = sum(lacing)
        page = data[pos:body_at + body_len]
        if len(page) != 27 + nsegs + body_len:
            raise ValueError("truncated Ogg page body")
        zeroed = page[:22] + b"\x00\x00\x00\x00" + page[26:]
        if crc32_ogg(zeroed) != crc:
            raise ValueError(f"Ogg page CRC mismatch at {pos}")
        continued = bool(htype & 0x01)
        if continued != expect_cont:
            raise ValueError("Ogg continuation flag inconsistent")
        at = body_at
        for i, seg in enumerate(lacing):
            partial += data[at:at + seg]
            at += seg
            if seg < 255:
                packets.append((partial, granule))
                partial = b""
        expect_cont = len(lacing) > 0 and lacing[-1] == 255
        pos = body_at + body_len
    if partial:
        raise ValueError("Ogg stream ends mid-packet")
    return packets


def _lacing(packet_len: int) -> list[int]:
    full, rest = divmod(packet_len, 255)
    return [255] * full + [rest]  # rest==0 terminates exactly


def ogg_pages_encode(packets: list[tuple[bytes, int]],
                     serial: int = 0x74696c64) -> bytes:
    """Pack (packet, granule) pairs into a physical stream: one page
    per packet by default, splitting any packet whose lacing exceeds
    255 segments across continued pages (the spanning path real
    muxers exercise; granule of a spanning packet's non-final pages
    is -1 per RFC 3533)."""
    out = bytearray()
    seq = 0
    for pi, (packet, granule) in enumerate(packets):
        lacing = _lacing(len(packet))
        offset = 0
        first_chunk = True
        while lacing:
            chunk, lacing = lacing[:255], lacing[255:]
            body_len = sum(chunk)
            body = packet[offset:offset + body_len]
            offset += body_len
            htype = 0
            if not first_chunk:
                htype |= 0x01  # continuation
            if pi == 0:
                htype |= 0x02  # beginning of stream
            if pi == len(packets) - 1 and not lacing:
                htype |= 0x04  # end of stream
            g = granule if not lacing else -1
            header = OGG_SIG + struct.pack(
                "<BBqIIIB", 0, htype, g, serial, seq, 0,
                len(chunk)) + bytes(chunk)
            page = bytes(header) + body
            crc = crc32_ogg(page)
            page = page[:22] + struct.pack("<I", crc) + page[26:]
            out += page
            seq += 1
            first_chunk = False
    return bytes(out)
