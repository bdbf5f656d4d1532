"""Reference DEFLATE decoder (RFC 1951) implemented from the spec, used
as an INDEPENDENT cross-check of the zlib-consuming decode paths (PNG
IDAT, ZIP members): stored blocks, fixed-Huffman blocks, and
dynamic-Huffman blocks with the code-length code permutation and the
16/17/18 repeat codes. Product code keeps stdlib zlib (C-speed, honest);
this test proves the engine's DEFLATE understanding doesn't lean on it —
a spec-level decode of real zlib output must agree byte-for-byte."""

from __future__ import annotations

import zlib

LENGTH_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
               35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
LENGTH_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
                3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0]
DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
             257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
             8193, 12289, 16385, 24577]
DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
              7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
CLC_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]


class _Bits:
    """LSB-first bit reader (DEFLATE packs bits little-endian, the
    OPPOSITE of JPEG/GIF-style MSB-first entropy streams)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos]
            v |= ((byte >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _huff_from_lengths(lengths: list[int]) -> dict[tuple[int, int], int]:
    """RFC 1951 §3.2.2 canonical code construction from code lengths."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    table: dict[tuple[int, int], int] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
    return table


def _decode_sym(b: _Bits, table: dict[tuple[int, int], int]) -> int:
    # Huffman codes are packed MSB-first within the LSB-first stream
    code = 0
    for ln in range(1, 16):
        code = (code << 1) | b.read(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def inflate(data: bytes) -> bytes:
    """From-spec RFC 1951 inflate: stored / fixed / dynamic blocks."""
    b = _Bits(data)
    out = bytearray()
    while True:
        final = b.read(1)
        btype = b.read(2)
        if btype == 0:  # stored
            b.align()
            ln = b.read(16)
            nlen = b.read(16)
            if ln ^ nlen != 0xFFFF:
                raise ValueError("stored block LEN/NLEN mismatch")
            out += b.data[b.pos : b.pos + ln]
            b.pos += ln
        else:
            if btype == 1:  # fixed tables (§3.2.6)
                lit_lengths = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
                dist_lengths = [5] * 30
            elif btype == 2:  # dynamic tables (§3.2.7)
                hlit = b.read(5) + 257
                hdist = b.read(5) + 1
                hclen = b.read(4) + 4
                clc_lengths = [0] * 19
                for i in range(hclen):
                    clc_lengths[CLC_ORDER[i]] = b.read(3)
                clc = _huff_from_lengths(clc_lengths)
                lengths: list[int] = []
                while len(lengths) < hlit + hdist:
                    sym = _decode_sym(b, clc)
                    if sym < 16:
                        lengths.append(sym)
                    elif sym == 16:
                        lengths += [lengths[-1]] * (3 + b.read(2))
                    elif sym == 17:
                        lengths += [0] * (3 + b.read(3))
                    else:
                        lengths += [0] * (11 + b.read(7))
                lit_lengths = lengths[:hlit]
                dist_lengths = lengths[hlit:]
            else:
                raise ValueError("reserved block type 3")
            lit = _huff_from_lengths(lit_lengths)
            dist = _huff_from_lengths(dist_lengths)
            while True:
                sym = _decode_sym(b, lit)
                if sym == 256:
                    break
                if sym < 256:
                    out.append(sym)
                    continue
                li = sym - 257
                length = LENGTH_BASE[li] + b.read(LENGTH_EXTRA[li])
                dsym = _decode_sym(b, dist)
                distance = DIST_BASE[dsym] + b.read(DIST_EXTRA[dsym])
                for _ in range(length):  # byte-at-a-time: overlap-legal
                    out.append(out[-distance])
        if final:
            return bytes(out)


def test_inflate_agrees_with_zlib_on_random_and_repetitive_data():
    import random

    rnd = random.Random(11)
    cases = [
        b"",
        b"a",
        b"hello hello hello hello",  # back-references
        bytes(rnd.randrange(256) for _ in range(5000)),  # incompressible
        (b"abcdef" * 2000),  # long matches, dynamic tables
        bytes(3000),  # runs of zeros (17/18 repeat codes)
    ]
    for raw in cases:
        for level in (1, 6, 9):
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            stream = co.compress(raw) + co.flush()
            assert inflate(stream) == raw
    # level 0 emits STORED blocks — that path too
    co = zlib.compressobj(0, zlib.DEFLATED, -15)
    stream = co.compress(cases[4]) + co.flush()
    assert inflate(stream) == cases[4]


def test_inflate_decodes_the_engines_real_payloads():
    """Cross-check the two product DEFLATE consumers: a synth PNG's IDAT
    (zlib-wrapped: 2-byte header + deflate + adler32) must inflate to
    the same filtered stream zlib yields, and a ZIP member's raw-deflate
    payload must inflate to the original text."""
    import struct

    from python_multiproc_bigdata_spark.operators.archives import pack_zip
    from python_multiproc_bigdata_spark.operators.multimodal import synth_png

    png = synth_png(7)
    pos = 8
    idat = b""
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    assert inflate(idat[2:]) == zlib.decompress(idat)

    text = b"the quick brown fox " * 40
    blob = pack_zip([("doc_00000009.txt", text, 8)])
    (csize,) = struct.unpack("<I", blob[18:22])
    payload = blob[30 + 16 : 30 + 16 + csize]
    assert inflate(payload) == text
