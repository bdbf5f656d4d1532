"""Baseline JPEG codec tests (operators/jpeg.py, r9) — the first LOSSY
codec in the multimodal family, so the test strategy has three prongs:

1. HAND-PACKED bitstreams: the entire file (markers, DQT, DHT, SOS,
   entropy bits) is assembled with struct/bit arithmetic in the test,
   and expected pixels are derived either by pure integer arithmetic
   (DC-only block) or an independent double-loop cosine IDCT — so an
   encoder/decoder-symmetric bug cannot hide.
2. EXACT roundtrips on the constant-block synth corpus (the property
   the SQL oracle relies on), across all dims/DRI variants.
3. TOLERANCE roundtrips on random gray/color images — the general
   lossy path (nonzero AC, ZRL runs, byte stuffing) stays within
   quantization-error bounds and never crashes.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from python_multiproc_bigdata_spark.operators.jpeg import (
    AC_BITS,
    AC_VALS,
    DC_BITS,
    DC_VALS,
    ZIGZAG,
    attach_jpeg,
    canonical_codes,
    decode_jpeg,
    decode_jpeg_features,
    encode_jpeg,
    jpeg_raster,
    synth_jpeg,
)


def test_zigzag_and_canonical_codes_match_spec():
    # T.81 Figure 5's opening diagonal runs, pinned literally
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0),
    ]
    assert len(set(ZIGZAG)) == 64 and ZIGZAG[63] == (7, 7)
    # Annex K canonical assignments (independently derivable from the
    # BITS counts): DC category 0 is the single 2-bit code 00; category
    # 3 is 100 (third of five 3-bit codes); AC EOB (0x00) is 1010, the
    # FIRST 4-bit code; ZRL (0xF0) must exist and be ≤ 16 bits.
    dc = canonical_codes(DC_BITS, DC_VALS)
    ac = canonical_codes(AC_BITS, AC_VALS)
    assert dc[0] == (0b00, 2)
    assert dc[3] == (0b100, 3)
    assert ac[0x00] == (0b1010, 4)
    assert ac[0x01] == (0b00, 2) and ac[0x02] == (0b01, 2)
    assert ac[0xF0][1] <= 16 and len(ac) == 162


def _hand_jpeg(entropy: bytes, quant_val: int = 16) -> bytes:
    """Assemble a complete single-block grayscale JPEG entirely by hand
    (no module helpers): flat quant table, Annex K Huffman tables,
    8×8 SOF0, caller-supplied entropy bytes."""
    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes([quant_val] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht_dc)) + dht_dc
    dht_ac = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht_ac)) + dht_ac
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_packed_dc_only_block():
    """Bits packed by hand: DC cat-3 code 100, magnitude 101 (diff=+5),
    EOB 1010 → bytes 0x96 0xBF (1-padded). Dequantized DC = 5·16 = 80,
    IDCT of a DC-only block is the constant 80/8 = 10, +128 → every
    pixel 138 — derived with integer arithmetic, no DCT involved."""
    payload = _hand_jpeg(bytes([0b10010110, 0b10111111]))
    w, h, px = jpeg_raster(payload)
    assert (w, h) == (8, 8)
    assert px.shape == (8, 8) and np.all(px == 138)


def test_hand_packed_block_with_ac_coefficient():
    """DC diff +5 (100·101), then AC run=0/size=2 symbol 0x02 (code 01)
    with magnitude 10 (value +2) at zigzag index 1 = (0,1), EOB →
    bits 100 101 01 10 1010 → bytes 0x95 0xAB. Expected raster from an
    INDEPENDENT double-loop cosine IDCT written here in the test."""
    payload = _hand_jpeg(bytes([0b10010101, 0b10101011]))
    w, h, px = jpeg_raster(payload)

    coef = np.zeros((8, 8))
    coef[0, 0] = 5 * 16
    coef[0, 1] = 2 * 16

    def c(k):
        return math.sqrt(1.0 / 8.0) if k == 0 else math.sqrt(2.0 / 8.0)

    exp = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c(u) * c(v) * coef[u, v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            exp[y, x] = min(255, max(0, round(s + 128)))
    assert np.array_equal(px, exp.astype(np.uint8))


def test_malformed_payloads_rejected():
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_raster(b"\x89PNG\r\n\x1a\n")
    # progressive DCT (SOF2) is not baseline
    good = bytearray(_hand_jpeg(bytes([0x96, 0xBF])))
    sof_at = good.find(b"\xff\xc0")
    good[sof_at + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_raster(bytes(good))
    # zero sampling factor is structurally invalid
    sub = bytearray(_hand_jpeg(bytes([0x96, 0xBF])))
    sof_at = sub.find(b"\xff\xc0")
    sub[sof_at + 4 + 6 + 1] = 0x02  # component H=0
    with pytest.raises(ValueError, match="out of range"):
        jpeg_raster(bytes(sub))
    # a grayscale stream re-marked H=V=2 claims 4 data units per MCU
    # the entropy segment does not contain — must fail loudly, not
    # return garbage (r10: subsampling is now SUPPORTED, so the failure
    # moved from the SOF gate to the entropy walk)
    sub = bytearray(_hand_jpeg(bytes([0x96, 0xBF])))
    sof_at = sub.find(b"\xff\xc0")
    sub[sof_at + 4 + 6 + 1] = 0x22  # component H=V=2
    with pytest.raises(ValueError, match="exhausted|sync|run past"):
        jpeg_raster(bytes(sub))
    # truncated entropy segment
    trunc = _hand_jpeg(b"")[:-2]  # no entropy bits, EOI stripped
    with pytest.raises(ValueError):
        jpeg_raster(trunc)


def test_synth_exact_roundtrip_full_cycle():
    """decode(synth_jpeg(d)) must equal the oracle arithmetic exactly
    for every (wb, hb, DRI) combination — the property SQL_DECODE_JPEG
    value-checks at corpus scale. d ∈ 0..35 covers the 6-dim × 3-DRI
    cycle several times over."""
    for d in range(36):
        wb, hb = 1 + d % 3, 1 + d % 2
        vs = [2 * ((d * 7 + b * 9) % 96) + 32 for b in range(wb * hb)]
        assert decode_jpeg(synth_jpeg(d)) == (
            wb * 8, hb * 8, wb * hb, wb * hb * 64,
            sum(64 * v for v in vs), min(vs), max(vs),
        )
    # a third of the corpus must actually contain restart markers
    assert any(
        bytes([0xFF, 0xD0 + k]) in synth_jpeg(3) for k in range(8)
    )


def test_lossy_roundtrip_tolerance_gray_color_odd_dims():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:24, 0:40]
    gray = np.clip(
        128 + 90 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
        + rng.normal(0, 6, (24, 40)),
        0, 255,
    ).astype(np.uint8)
    w, h, out = jpeg_raster(encode_jpeg(gray))
    assert (w, h) == (40, 24)
    err = np.abs(out.astype(int) - gray.astype(int))
    assert err.mean() < 8 and err.max() < 60

    # restart intervals must not change the decoded raster
    _, _, out_rst = jpeg_raster(encode_jpeg(gray, restart_interval=3))
    assert np.array_equal(out_rst, out)

    # non-multiple-of-8 dims (SOF true dims, edge-padded blocks)
    w, h, out_odd = jpeg_raster(encode_jpeg(gray[:21, :37]))
    assert (w, h) == (37, 21) and out_odd.shape == (21, 37)

    color = np.clip(
        np.stack(
            [128 + 80 * np.sin(xx / 6), 128 + 80 * np.cos(yy / 4),
             128 + 60 * np.sin((xx + yy) / 9)],
            axis=-1,
        )
        + rng.normal(0, 4, (24, 40, 3)),
        0, 255,
    ).astype(np.uint8)
    w, h, outc = jpeg_raster(encode_jpeg(color))
    assert outc.shape == (24, 40, 3)
    assert np.abs(outc.astype(int) - color.astype(int)).mean() < 12


def test_subsampled_constant_chroma_matches_444_exactly():
    """r10 chroma subsampling: for an image whose chroma is spatially
    CONSTANT (r=g=b → Cb=Cr=128 everywhere), the mean-of-box
    downsample and the replication upsample are both lossless, so the
    4:2:0 and 4:2:2 decodes must equal the 4:4:4 decode BIT-EXACTLY —
    any indexing slip in the MCU interleave or the upsample shows up
    as a hard mismatch, not a tolerance blur."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:24, 0:40]
    g = np.clip(
        128 + 70 * np.sin(xx / 5.0) * np.cos(yy / 7.0) + rng.normal(0, 5, (24, 40)),
        0, 255,
    ).astype(np.uint8)
    img = np.stack([g, g, g], axis=-1)
    _, _, base = jpeg_raster(encode_jpeg(img, subsample="4:4:4"))
    for mode in ("4:2:0", "4:2:2"):
        w, h, out = jpeg_raster(encode_jpeg(img, subsample=mode))
        assert (w, h) == (40, 24)
        assert np.array_equal(out, base), mode
    # odd (non-MCU-multiple) dims: SOF keeps true size, padding crops off
    for mode in ("4:2:0", "4:2:2"):
        w, h, out = jpeg_raster(encode_jpeg(img[:21, :37], subsample=mode))
        assert (w, h) == (37, 21) and out.shape == (21, 37, 3), mode


def test_subsampled_color_tolerance_and_dri():
    """Full-color 4:2:0/4:2:2: smooth chroma stays within quantization+
    subsampling tolerance of the source, restart intervals don't change
    the decode, and the luma stats (decode_jpeg) come from the Y plane
    — identical across subsampling modes for the same image (Y is
    never subsampled), which the old red-channel stats bug would fail
    for any colorful image."""
    yy, xx = np.mgrid[0:32, 0:48]
    color = np.clip(
        np.stack(
            [128 + 80 * np.sin(xx / 9), 128 + 80 * np.cos(yy / 8),
             128 + 60 * np.sin((xx + yy) / 13)],
            axis=-1,
        ),
        0, 255,
    ).astype(np.uint8)
    stats = {}
    for mode in ("4:4:4", "4:2:2", "4:2:0"):
        payload = encode_jpeg(color, subsample=mode)
        _, _, out = jpeg_raster(payload)
        err = np.abs(out.astype(int) - color.astype(int))
        assert err.mean() < 14, (mode, err.mean())
        _, _, out_rst = jpeg_raster(
            encode_jpeg(color, restart_interval=2, subsample=mode)
        )
        assert np.array_equal(out_rst, out), mode
        stats[mode] = decode_jpeg(payload)
    # width/height/n_pixels identical; sum_y within DCT rounding noise
    # across modes (subsampling touches only chroma)
    for mode in ("4:2:2", "4:2:0"):
        assert stats[mode][:2] == stats["4:4:4"][:2]
        assert stats[mode][3] == stats["4:4:4"][3]
        drift = abs(stats[mode][4] - stats["4:4:4"][4]) / stats["4:4:4"][4]
        assert drift < 0.01, (mode, drift)
    # luma stats really are luma: a pure-red image has RED mean 255 but
    # Y ≈ 76 — the r9 bug read channel 0 post-conversion and would
    # report ~255 here
    red = np.zeros((16, 16, 3), dtype=np.uint8)
    red[..., 0] = 255
    s = decode_jpeg(encode_jpeg(red))
    mean_y = s[4] / s[3]
    assert 70 <= mean_y <= 82, mean_y


def test_synth_sub_exact_roundtrip_and_modes():
    """The subsampled driver corpus (synth_jpeg_sub) must reproduce the
    grayscale synth's stats EXACTLY — the property the shared
    SQL_DECODE_JPEG oracle relies on — across all dims/DRI/mode
    combinations, and the streams must really carry the claimed
    sampling factors."""
    from python_multiproc_bigdata_spark.operators.jpeg import synth_jpeg_sub

    for d in range(36):
        payload = synth_jpeg_sub(d)
        sof_at = payload.find(b"\xff\xc0")
        hv_y = payload[sof_at + 4 + 6 + 1]
        assert hv_y == (0x22 if d % 2 == 0 else 0x21), d
        wb, hb = 1 + d % 3, 1 + d % 2
        vals = [2 * ((d * 7 + b * 9) % 96) + 32 for b in range(wb * hb)]
        got = decode_jpeg(payload)
        want = (
            wb * 8, hb * 8, wb * hb, wb * hb * 64,
            sum(64 * v for v in vals), min(vals), max(vals),
        )
        assert got == want, (d, got, want)
        # the decoded RGB raster is the gray image back (r=g=b=v)
        _, _, px = jpeg_raster(payload)
        assert px.shape == (hb * 8, wb * 8, 3)
        for b, v in enumerate(vals):
            by, bx = divmod(b, wb)
            blk = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (blk == v).all(), (d, b)


def test_byte_stuffing_occurs_and_decodes():
    """Random blocks eventually emit a 0xFF data byte; the stuffing rule
    (0xFF 0x00) must round-trip. Assert stuffing actually happened
    somewhere in the set, so the un-stuffing path is provably on the
    tested path, and every payload decodes."""
    stuffed = 0
    for s in range(30):
        img = np.random.default_rng(s).integers(0, 256, (16, 16), dtype=np.uint8)
        payload = encode_jpeg(img)
        entropy = payload[payload.find(b"\xff\xda") :]
        if b"\xff\x00" in entropy:
            stuffed += 1
        jpeg_raster(payload)
    assert stuffed > 0


def test_distributed_shape(spark):
    """Two map-only mapInPandas stages: synth attach, decode features —
    1 blob in → 1 stats row out, no shuffle (the 100 TB shape)."""
    df = spark.createDataFrame([(0,), (3,), (7,)], ["doc_id"])
    out = decode_jpeg_features(attach_jpeg(df))
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {r.doc_id: r for r in out.collect()}
    for d, r in rows.items():
        wb, hb = 1 + d % 3, 1 + d % 2
        vs = [2 * ((d * 7 + b * 9) % 96) + 32 for b in range(wb * hb)]
        assert (r.width, r.height, r.n_blocks) == (wb * 8, hb * 8, wb * hb)
        assert r.sum_y == sum(64 * v for v in vs)
        assert (r.min_y, r.max_y) == (min(vs), max(vs))
