"""Baseline JPEG (ITU-T T.81 / JFIF) codec — the LAST image format to
graduate from the honest codec stub (operators/multimodal.py:decode_media
kept JPEG behind NotImplementedError through r8 because neither the
stdlib nor this container ships a JPEG codec). r9 implements the
baseline sequential DCT process from the public spec, pure
numpy + stdlib, no PIL:

  encoder  : level shift → 8×8 FDCT (orthonormal DCT-II matrix, the
             spec's 1/4·C(u)C(v) scaling) → quantization → zigzag →
             DC-predicted category coding + AC run/size Huffman coding
             (Annex K typical tables, written into DHT so the decoder
             proves it reads tables from the FILE, not from constants)
             → byte stuffing (0xFF → 0xFF 0x00) → JFIF marker framing,
             optional DRI/RSTn restart intervals.
  decoder  : marker walk (APPn/COM skip, DQT/DHT/SOF0/DRI/SOS parse) →
             canonical Huffman table reconstruction from BITS/HUFFVAL →
             entropy decode with EXTEND sign recovery, ZRL/EOB, byte
             un-stuffing, restart-marker resync → dequantize → inverse
             zigzag → IDCT → +128 level shift, clamp. Grayscale and
             3-component 4:4:4 (H=V=1) are supported; subsampled chroma
             (4:2:0/4:2:2) raises with an honest message — upsampling
             filters are out of scope for the parity corpus.

The synthetic corpus uses the EXACT-ROUNDTRIP construction: every 8×8
block is constant, so the FDCT concentrates all energy in the DC
coefficient, 8·(v−128); v is chosen even, making the DC an exact
multiple of the Annex-K DC quantization step (16), so quantize →
dequantize → IDCT reproduces v bit-exactly and a DuckDB SQL oracle can
replay the decoded pixel sums with plain integer arithmetic
(registry/multimodal.py:SQL_DECODE_JPEG). Lossy-path generality is
covered separately by tolerance round-trips on random images and a
hand-packed entropy bitstream in tests/test_multimodal_jpeg.py, so an
encoder/decoder-symmetric bug cannot hide behind the exact corpus.

Reference parity note: the reference pipelines treat media files as
opaque payloads walked from disk (v1 taxonomy walker,
v2/core/extractors files.py) — real decode is a beyond-reference
capability for the multimodal training-data surface (SURVEY §2 /
brief), same family as the PNG/GIF/BMP/AVI/TIFF decoders.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from python_multiproc_bigdata_spark.operators.transforms import fan_out_scan

# ---------------------------------------------------------------------------
# Tables from the public spec (ITU-T T.81 Annex K — "typical" tables).
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# (BITS[1..16], HUFFVAL) — Annex K.3.3.1 luminance DC
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))

# Annex K.3.3.2 luminance AC
AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)


def _zigzag() -> list[tuple[int, int]]:
    """Zigzag scan order (T.81 Figure 5): anti-diagonal s runs bottom-up
    when s is even, top-down when s is odd."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        ys = list(range(max(0, s - 7), min(8, s + 1)))
        for y in reversed(ys) if s % 2 == 0 else ys:
            order.append((y, s - y))
    return order


ZIGZAG = _zigzag()  # index k -> (row, col)
ZIG_ROWS = np.array([y for y, _ in ZIGZAG])
ZIG_COLS = np.array([x for _, x in ZIGZAG])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: (C @ B @ C.T) matches the
    spec's FDCT scaling exactly (constant block v → DC = 8·v)."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c[0, :] = 1.0
    scale = np.full((8, 1), np.sqrt(2.0 / 8.0))
    scale[0, 0] = np.sqrt(1.0 / 8.0)
    return c * scale


DCT_M = _dct_matrix()


def canonical_codes(bits: tuple[int, ...], vals: tuple[int, ...]):
    """Canonical Huffman code assignment from the DHT (BITS, HUFFVAL)
    representation (T.81 Annex C): returns {symbol: (code, length)}."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def decode_lut(bits: tuple[int, ...], vals: tuple[int, ...]):
    """Inverse canonical table for the decoder: {(length, code): symbol}."""
    return {(ln, code): sym for sym, (code, ln) in canonical_codes(bits, vals).items()}


class BitWriter:
    """MSB-first bit packer with the entropy-segment byte stuffing rule
    (a data byte of 0xFF is followed by 0x00 — T.81 §B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        """Pad the current byte with 1-bits (the spec's fill bits)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


class BitReader:
    """MSB-first bit reader over an entropy-coded segment: un-stuffs
    0xFF 0x00, stops at any real marker, and hands RSTn resync to the
    caller (restart() must be called exactly at a restart boundary)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None  # first non-RST marker seen

    def _next_byte(self) -> int | None:
        while True:
            if self.pos >= len(self.buf):
                return None
            b = self.buf[self.pos]
            if b != 0xFF:
                self.pos += 1
                return b
            nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else None
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            # a real marker terminates the segment
            self.marker = nxt
            return None

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self._next_byte()
            if b is None:
                raise ValueError("entropy segment exhausted mid-symbol")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, expected: int) -> None:
        """Consume the RSTn marker at a restart boundary and byte-align."""
        self.nbits = 0
        if self.pos + 1 >= len(self.buf) or self.buf[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        n = self.buf[self.pos + 1]
        if not (0xD0 <= n <= 0xD7) or (n - 0xD0) != expected % 8:
            raise ValueError(f"bad restart marker 0x{n:02x} (expected RST{expected % 8})")
        self.pos += 2
        self.marker = None


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 Figure F.12): map a t-bit magnitude to its signed
    value (leading 0 bit ⇒ negative, stored in ones' complement)."""
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    """SSSS magnitude category: smallest t with |v| < 2^t."""
    return int(abs(v)).bit_length()


def _huff_decode(r: BitReader, lut) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code (no symbol within 16 bits)")


# ---------------------------------------------------------------------------
# Encoder (baseline sequential, H=V=1).
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF BT.601 full-range conversion, rounded to uint8 planes."""
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(img: np.ndarray) -> np.ndarray:
    y = img[..., 0].astype(np.float64)
    cb = img[..., 1].astype(np.float64) - 128.0
    cr = img[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _encode_block(
    w: BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    pred: int,
    dc_codes,
    ac_codes,
) -> int:
    """FDCT + quantize + entropy-code one 8×8 block; returns the new DC
    predictor. `block` is uint8 spatial domain."""
    shifted = block.astype(np.float64) - 128.0
    coef = DCT_M @ shifted @ DCT_M.T
    q = np.round(coef / quant).astype(np.int64)
    zz = q[ZIG_ROWS, ZIG_COLS]

    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)

    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_codes[(run << 4) | t]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def _dht_segment(tc: int, th: int, bits: tuple[int, ...], vals: tuple[int, ...]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tq: int, quant: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(quant[y, x]) for y, x in ZIGZAG)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


_SUBSAMPLE_HV = {
    # luma (H, V); chroma is always (1, 1)
    "4:4:4": (1, 1),
    "4:2:2": (2, 1),
    "4:2:0": (2, 2),
}


def _box_downsample(p: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Mean-of-box chroma downsampling (the conventional encoder
    filter): pad to factor multiples by edge replication, then average
    each fv×fh cell and round half-up like every other sample in the
    pipeline."""
    if fh == 1 and fv == 1:
        return p
    h, w0 = p.shape
    p = np.pad(p, ((0, (-h) % fv), (0, (-w0) % fh)), mode="edge")
    acc = p.astype(np.float64).reshape(p.shape[0] // fv, fv, p.shape[1] // fh, fh)
    return np.clip(np.floor(acc.mean(axis=(1, 3)) + 0.5), 0, 255).astype(np.uint8)


def encode_jpeg(
    img: np.ndarray,
    restart_interval: int = 0,
    subsample: str = "4:4:4",
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG. `subsample` picks the color layout: 4:4:4
    (every component H=V=1), 4:2:2 (luma H=2 — chroma halved
    horizontally), or 4:2:0 (luma H=V=2 — chroma halved both ways, the
    dominant real-world layout). Grayscale ignores `subsample`.
    Dimensions are padded to MCU multiples by edge replication; the SOF
    records the true dimensions. Annex K tables; the luminance Huffman
    pair serves all components (legal — components just reference
    table 0). Interleaved MCUs per T.81 A.2.3: each MCU carries
    Hi×Vi data units per component in raster order."""
    gray = img.ndim == 2
    h, w0 = img.shape[:2]
    if subsample not in _SUBSAMPLE_HV:
        raise ValueError(f"unsupported subsampling {subsample!r}")
    yh, yv = (1, 1) if gray else _SUBSAMPLE_HV[subsample]
    ncomp = 1 if gray else 3
    hvs = [(yh, yv)] + [(1, 1)] * (ncomp - 1)
    quants = [QUANT_LUMA] + [QUANT_CHROMA] * (ncomp - 1)
    qids = [0] + [1] * (ncomp - 1)

    if gray:
        full = [img]
    else:
        ycc = _rgb_to_ycbcr(img)
        full = [ycc[..., 0]] + [
            _box_downsample(ycc[..., i], yh, yv) for i in (1, 2)
        ]
    # pad every plane to its own MCU-multiple block grid
    mcu_w, mcu_h = 8 * yh, 8 * yv
    mcux = (w0 + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h
    planes = []
    for p, (ch, cv) in zip(full, hvs):
        th, tw = mcuy * 8 * cv, mcux * 8 * ch
        planes.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    dc_codes = canonical_codes(DC_BITS, DC_VALS)
    ac_codes = canonical_codes(AC_BITS, AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, QUANT_LUMA)
    if not gray:
        out += _dqt_segment(1, QUANT_CHROMA)
    sof = struct.pack(">BHHB", 8, h, w0, ncomp)
    for ci in range(ncomp):
        ch, cv = hvs[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, qids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, DC_BITS, DC_VALS)
    out += _dht_segment(1, 0, AC_BITS, AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    wtr = BitWriter()
    preds = [0] * ncomp
    rst = 0
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.align()
                out += wtr.out
                wtr = BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                ch, cv = hvs[ci]
                for bv in range(cv):
                    for bh_ in range(ch):
                        by = my * cv + bv
                        bx = mx * ch + bh_
                        blk = planes[ci][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ]
                        preds[ci] = _encode_block(
                            wtr, blk, quants[ci], preds[ci], dc_codes, ac_codes
                        )
            mcu += 1
    wtr.align()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (baseline sequential, H=V=1; restart intervals honored).
# ---------------------------------------------------------------------------


def jpeg_component_planes(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode a baseline JFIF JPEG to (width, height, [component
    planes]): each plane upsampled to full resolution and cropped to
    (h, w) — YCbCr order for 3-component streams, [Y] for grayscale.
    Handles arbitrary integer sampling factors (4:4:4, 4:2:2, 4:2:0,
    and any other Hi,Vi ≤ 4 whose ratios divide the maxima) per T.81
    A.2.3 interleaved MCUs; chroma upsampling is pixel replication
    (box) — the exact inverse of the conventional mean-of-box encoder
    filter wherever chroma is locally constant."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG (magic {payload[:2]!r})")
    pos = 2
    n = len(payload)
    quant_tables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode lut
    sof = None
    restart_interval = 0

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for k in range(64):
                    tbl[ZIGZAG[k]] = body[i + 1 + k]
                quant_tables[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = tuple(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = tuple(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = decode_lut(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w0, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(f"sampling factors {ch}x{cv} out of range")
                comps.append((cid, ch, cv, tq))
            sof = (h, w0, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF marker 0xff{marker:02x}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if sof is None:
                raise ValueError("SOS before SOF")
            h, w0, comps = sof
            ns = body[0]
            if ns != len(comps):
                raise ValueError("non-interleaved multi-scan not supported")
            scan = []  # (comp_index, dc_lut, ac_lut, quant)
            for si in range(ns):
                cs, tables = body[1 + 2 * si], body[2 + 2 * si]
                td, ta = tables >> 4, tables & 0x0F
                idx = next(
                    i for i, (cid, _, _, _) in enumerate(comps) if cid == cs
                )
                scan.append(
                    (idx, huff[(0, td)], huff[(1, ta)], quant_tables[comps[idx][3]])
                )
            hmax = max(ch for _, ch, _, _ in comps)
            vmax = max(cv for _, _, cv, _ in comps)
            for _, ch, cv, _ in comps:
                if hmax % ch or vmax % cv:
                    raise ValueError(
                        f"fractional sampling ratio {ch}x{cv} vs {hmax}x{vmax}"
                    )
            mcux = (w0 + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            planes = [
                np.zeros((mcuy * 8 * cv, mcux * 8 * ch), dtype=np.uint8)
                for _, ch, cv, _ in comps
            ]
            rdr = BitReader(payload, pos)
            preds = [0] * len(comps)
            rst = 0
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        rdr.restart(rst)
                        rst += 1
                        preds = [0] * len(comps)
                    for idx, dc_lut, ac_lut, quant in scan:
                        _, ch, cv, _ = comps[idx]
                        for bv in range(cv):
                            for bh_ in range(ch):
                                zz = np.zeros(64, dtype=np.int64)
                                t = _huff_decode(rdr, dc_lut)
                                diff = _extend(rdr.receive(t), t)
                                preds[idx] += diff
                                zz[0] = preds[idx]
                                k = 1
                                while k < 64:
                                    sym = _huff_decode(rdr, ac_lut)
                                    if sym == 0x00:  # EOB
                                        break
                                    if sym == 0xF0:  # ZRL
                                        k += 16
                                        continue
                                    k += sym >> 4
                                    t = sym & 0x0F
                                    if k > 63:
                                        raise ValueError("AC run past block end")
                                    zz[k] = _extend(rdr.receive(t), t)
                                    k += 1
                                coef = np.zeros((8, 8), dtype=np.float64)
                                coef[ZIG_ROWS, ZIG_COLS] = (
                                    zz * quant[ZIG_ROWS, ZIG_COLS]
                                )
                                spatial = DCT_M.T @ coef @ DCT_M + 128.0
                                by = my * cv + bv
                                bx = mx * ch + bh_
                                planes[idx][
                                    by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                                ] = np.clip(np.round(spatial), 0, 255).astype(
                                    np.uint8
                                )
                    mcu += 1
            out_planes = []
            for (ci, ch, cv, _), p in zip(comps, planes):
                if ch < hmax or cv < vmax:
                    p = np.repeat(
                        np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1
                    )
                out_planes.append(p[:h, :w0])
            return w0, h, out_planes
        # APPn / COM / anything else: skipped via seg_len
    raise ValueError("no SOS segment found")


def jpeg_raster(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline JFIF JPEG to (width, height, raster): raster is
    (h, w) uint8 for grayscale, (h, w, 3) uint8 RGB for color (4:4:4,
    4:2:2, or 4:2:0 — see jpeg_component_planes)."""
    w0, h, planes = jpeg_component_planes(payload)
    if len(planes) == 1:
        return w0, h, planes[0]
    return w0, h, _ycbcr_to_rgb(np.stack(planes, axis=-1))


# ---------------------------------------------------------------------------
# Synthetic corpus (exact-roundtrip construction) + Spark plumbing.
# ---------------------------------------------------------------------------


def synth_jpeg(doc_id: int) -> bytes:
    """Deterministic grayscale baseline JPEG for a doc. Every 8×8 block
    b (raster order) is the constant v(b) = 2·((doc_id·7 + b·9) % 96)
    + 32 — EVEN, so the DC coefficient 8·(v−128) is an exact multiple
    of the Annex-K DC step (16) and the lossy pipeline round-trips
    bit-exactly (AC coefficients are identically 0 for constant
    blocks). wb = 1 + doc_id%3 blocks across, hb = 1 + doc_id%2 down;
    docs with doc_id%3 == 0 carry a DRI of 1 MCU (doc_id%3 == 0 forces
    wb = 1, so a longer interval would never fire — interval 1 makes
    every odd multiple of 3, which has hb = 2, actually emit an RST0),
    so DRI parsing, RSTn emission, predictor reset, and decoder resync
    are all exercised across the corpus every run. The SQL oracle
    replays v(b) directly (registry/multimodal.py:SQL_DECODE_JPEG)."""
    wb = 1 + doc_id % 3
    hb = 1 + doc_id % 2
    img = np.zeros((hb * 8, wb * 8), dtype=np.uint8)
    for b in range(wb * hb):
        v = 2 * ((doc_id * 7 + b * 9) % 96) + 32
        by, bx = divmod(b, wb)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    return encode_jpeg(img, restart_interval=1 if doc_id % 3 == 0 else 0)


def synth_jpeg_sub(doc_id: int) -> bytes:
    """Deterministic COLOR baseline JPEG with chroma subsampling —
    4:2:0 for even doc_ids, 4:2:2 for odd — built for EXACT roundtrip
    of the luma stats: every pixel has r=g=b=v(b) with the same
    per-block constant v as synth_jpeg, so the Y plane is bit-identical
    to the grayscale synth (even values → DC multiples of the Annex-K
    step) and Cb=Cr are the constant 128 (BT.601 of r=g=b is exactly
    (v,128,128); a constant plane survives mean-of-box downsampling,
    zero-coefficient quantization, and replication upsampling
    unchanged). decode_jpeg's stats read the luma plane, so the SAME
    arithmetic oracle as the 4:4:4 corpus (SQL_DECODE_JPEG) checks the
    whole subsampled pipeline end-to-end. DRI=1 for doc_id%3==0 puts
    RSTn resync on the checked path via the 4:2:2 two-MCU docs
    (doc_id ≡ 3 mod 6)."""
    wb = 1 + doc_id % 3
    hb = 1 + doc_id % 2
    img = np.zeros((hb * 8, wb * 8, 3), dtype=np.uint8)
    for b in range(wb * hb):
        v = 2 * ((doc_id * 7 + b * 9) % 96) + 32
        by, bx = divmod(b, wb)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = v
    mode = "4:2:0" if doc_id % 2 == 0 else "4:2:2"
    return encode_jpeg(
        img, restart_interval=1 if doc_id % 3 == 0 else 0, subsample=mode
    )


def attach_jpeg_sub(df: DataFrame) -> DataFrame:
    """Synthesize the SUBSAMPLED color JPEG payload column (doc_id →
    media) in Arrow batches — attach_jpeg's 4:2:0/4:2:2 sibling."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [synth_jpeg_sub(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return fan_out_scan(df.select("doc_id"), "doc_id").mapInPandas(batches, schema)


def decode_jpeg(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """Full decode → integer stats (width, height, n_blocks, n_pixels,
    sum_y, min_y, max_y) — integer sums for bit-exact engine parity.
    sum/min/max are over the LUMA plane taken BEFORE any YCbCr→RGB
    conversion (ADVICE r9: the old form read channel 0 of the converted
    raster, which is RED for color images)."""
    w, h, planes = jpeg_component_planes(payload)
    px = planes[0]
    return (
        w,
        h,
        ((w + 7) // 8) * ((h + 7) // 8),
        w * h,
        int(px.sum(dtype=np.int64)),
        int(px.min()),
        int(px.max()),
    )


JPEG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_blocks", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_y", T.LongType()),
        T.StructField("min_y", T.LongType()),
        T.StructField("max_y", T.LongType()),
    ]
)


def attach_jpeg(df: DataFrame) -> DataFrame:
    """Synthesize the binary JPEG payload column (doc_id → media) in
    Arrow batches — attach_png's sibling fixture stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [synth_jpeg(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return fan_out_scan(df.select("doc_id"), "doc_id").mapInPandas(batches, schema)


def decode_jpeg_features(df: DataFrame) -> DataFrame:
    """Decode a binary JPEG column via mapInPandas (Arrow batches): 1
    blob in → 1 row of integer image stats out, map-only, zero shuffle
    — the 100 TB shape shared by every decoder in this family."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_jpeg(bytes(p)) for p in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_blocks": [d[2] for d in decoded],
                    "n_pixels": [d[3] for d in decoded],
                    "sum_y": [d[4] for d in decoded],
                    "min_y": [d[5] for d in decoded],
                    "max_y": [d[6] for d in decoded],
                }
            )

    return df.mapInPandas(batches, JPEG_SCHEMA)
