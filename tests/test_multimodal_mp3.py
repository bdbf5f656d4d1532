"""MP3 frame-walker tests (operators/mp3.py, r9): hand-built payloads
with spec-derived header bytes (so a synth/walker-symmetric bug cannot
hide), synth↔walk parity against direct arithmetic, ID3v2 syncsafe
skipping, and loud rejection of malformed streams."""

from __future__ import annotations

import pytest

from python_multiproc_bigdata_spark.operators.mp3 import (
    BITRATE_KBPS,
    SAMPLE_RATES,
    attach_mp3,
    frame_length,
    mp3_frame_features,
    mp3_frames,
    mp3_stats,
    synth_mp3,
)


def test_hand_built_frames():
    """Header bytes written literally from the spec layout: 0xFF 0xFB =
    sync + MPEG-1 + Layer III + no-CRC; b2 = bitrate_idx<<4 |
    sr_idx<<2 | pad<<1. Frame 1: 128 kbps @44100 no pad → ⌊144·128000/
    44100⌋ = 417 bytes; frame 2: 32 kbps padded → 104 + 1 = 105."""
    f1 = bytes((0xFF, 0xFB, 0x90, 0x40)) + bytes(417 - 4)
    f2 = bytes((0xFF, 0xFB, 0x12, 0x40)) + bytes(105 - 4)
    tag_bytes, frames = mp3_frames(f1 + f2)
    assert tag_bytes == 0
    assert frames == [(128, 44100, 0, 417), (32, 44100, 1, 105)]


def test_id3v2_skip_and_syncsafe():
    body = bytes(range(100)) + bytes(100)  # includes 0x80+ bytes: fine in body
    tag = b"ID3" + bytes((3, 0, 0)) + bytes((0, 0, 200 >> 7, 200 & 0x7F)) + body[:200]
    frame = bytes((0xFF, 0xFB, 0x90, 0x40)) + bytes(413)
    tag_bytes, frames = mp3_frames(tag + frame)
    assert tag_bytes == 210 and len(frames) == 1
    # a high bit in the size field is NOT syncsafe — loud reject
    bad = bytearray(tag + frame)
    bad[6] = 0x80
    with pytest.raises(ValueError, match="syncsafe"):
        mp3_frames(bytes(bad))


def test_malformed_rejected():
    with pytest.raises(ValueError, match="lost frame sync"):
        mp3_frames(bytes((0xFE, 0, 0, 0)))
    # version bits 10 (MPEG-2) — honestly unsupported
    with pytest.raises(ValueError, match="unsupported MPEG"):
        mp3_frames(bytes((0xFF, 0xF3, 0x90, 0x40)) + bytes(413))
    with pytest.raises(ValueError, match="free/bad bitrate"):
        mp3_frames(bytes((0xFF, 0xFB, 0x00, 0x40)))
    with pytest.raises(ValueError, match="reserved sample-rate"):
        mp3_frames(bytes((0xFF, 0xFB, 0x9C, 0x40)))
    with pytest.raises(ValueError, match="runs past payload end"):
        mp3_frames(synth_mp3(1)[:-3])


def test_synth_walk_parity_full_cycle():
    """Every bitrate row, all three sample rates, both padding states,
    and all five tag sizes appear across d ∈ 0..59; stats must equal
    direct arithmetic (the property SQL_MP3_FRAME_WALK value-checks)."""
    seen_br: set[int] = set()
    for d in range(60):
        nf = 3 + d % 4
        sr = SAMPLE_RATES[d % 3]
        brs = [BITRATE_KBPS[1 + (d * 3 + f * 5) % 14] for f in range(nf)]
        pads = [(d + f) % 2 for f in range(nf)]
        seen_br.update(brs)
        assert mp3_stats(synth_mp3(d)) == (
            nf,
            sr,
            10 + (d % 5) * 7 if d % 2 == 0 else 0,
            sum(frame_length(b, sr, p) for b, p in zip(brs, pads)),
            1152 * nf,
            sum(brs),
            sum(pads),
        )
    assert seen_br == set(BITRATE_KBPS[1:])


def test_distributed_shape(spark):
    df = spark.createDataFrame([(0,), (5,), (11,)], ["doc_id"])
    out = mp3_frame_features(attach_mp3(df))
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[11].n_frames == 3 + 11 % 4
    assert rows[0].tag_bytes == 10 and rows[5].tag_bytes == 0
    assert rows[5].total_samples == 1152 * rows[5].n_frames


# ---- r11: Layer III side-info decode ----


def test_sideinfo_hand_built_block():
    """A side-info block written bit-by-bit from the spec layout (no
    shared packer, so a pack/parse-symmetric bug cannot hide):
    main_data_begin=5, scfsi=0b1010, granule0 normal window
    (p23=100, bv=288, gg=200, sfc=7, tables 1/2/3, r0=4, r1=5,
    pre=1, sfs=0, c1t=1), granule1 switched (bt=2, mixed=1,
    tables 30/31, subblock gains 1/2/3, pre=0, sfs=1, c1t=0)."""
    from python_multiproc_bigdata_spark.operators.mp3 import (
        frame_length,
        mp3_side_info,
    )

    bits = ""
    bits += format(5, "09b") + "00000" + "1010"
    # granule 0: normal
    bits += format(100, "012b") + format(288, "09b") + format(200, "08b")
    bits += format(7, "04b") + "0"
    bits += format(1, "05b") + format(2, "05b") + format(3, "05b")
    bits += format(4, "04b") + format(5, "03b") + "1" + "0" + "1"
    # granule 1: switched
    bits += format(101, "012b") + format(7, "09b") + format(9, "08b")
    bits += format(3, "04b") + "1"
    bits += "10" + "1" + format(30, "05b") + format(31, "05b")
    bits += format(1, "03b") + format(2, "03b") + format(3, "03b")
    bits += "0" + "1" + "0"
    assert len(bits) == 136
    si = int(bits, 2).to_bytes(17, "big")
    # mono header, 128 kbps @ 44100, no pad
    ln = frame_length(128, 44100, 0)
    payload = bytes((0xFF, 0xFB, 0x90, 0xC0)) + si + bytes([1] * (ln - 21))
    (fr,) = mp3_side_info(payload)
    assert fr["main_data_begin"] == 5 and fr["scfsi"] == 0b1010
    g0, g1 = fr["granules"]
    assert g0 == {
        "part2_3_length": 100, "big_values": 288, "global_gain": 200,
        "scalefac_compress": 7, "window_switching": 0,
        "table_select": [1, 2, 3], "region0_count": 4, "region1_count": 5,
        "preflag": 1, "scalefac_scale": 0, "count1table_select": 1,
    }
    assert g1 == {
        "part2_3_length": 101, "big_values": 7, "global_gain": 9,
        "scalefac_compress": 3, "window_switching": 1,
        "block_type": 2, "mixed_block": 1, "table_select": [30, 31],
        "subblock_gain": [1, 2, 3],
        "preflag": 0, "scalefac_scale": 1, "count1table_select": 0,
    }


def test_sideinfo_synth_parity_and_branch_coverage():
    """Pack→parse roundtrip equals the _si_fields arithmetic for 60
    docs, and BOTH window branches occur (the oracle's CASE guards are
    genuinely exercised)."""
    from python_multiproc_bigdata_spark.operators.mp3 import (
        _si_fields,
        mp3_side_info,
        synth_mp3_si,
    )

    saw_sw = saw_no = False
    for d in range(60):
        frames = mp3_side_info(synth_mp3_si(d))
        assert len(frames) == 2 + d % 3
        for f, fr in enumerate(frames):
            assert fr["main_data_begin"] == (d * 31 + f * 7) % 512
            assert fr["scfsi"] == (d + f) % 16
            for g, gr in enumerate(fr["granules"]):
                x = _si_fields(d, f, g)
                assert gr["part2_3_length"] == x["p23"]
                assert gr["big_values"] == x["bv"]
                assert gr["global_gain"] == x["gg"]
                assert gr["window_switching"] == x["wsf"]
                assert gr["table_select"] == x["ts"]
                if x["wsf"]:
                    saw_sw = True
                    assert gr["block_type"] == x["bt"]
                    assert gr["subblock_gain"] == x["sbg"]
                else:
                    saw_no = True
                    assert gr["region0_count"] == x["r0"]
                    assert gr["region1_count"] == x["r1"]
    assert saw_sw and saw_no


def test_sideinfo_malformed_rejected():
    import struct

    from python_multiproc_bigdata_spark.operators.mp3 import (
        mp3_side_info,
        synth_mp3_si,
    )

    good = bytearray(synth_mp3_si(4))  # doc 4: frame 0 granule 0 normal
    # stereo frames are a different (32-byte) side-info layout — reject
    stereo = bytearray(good)
    stereo[3] = 0x40
    with pytest.raises(ValueError, match="mono"):
        mp3_side_info(bytes(stereo))
    # big_values > 288: bits 18..26 of the side info (after 9+5+4 header
    # fields, the granule starts at bit 18+12=30 for bv) — force all 9
    # bv bits to 1 (511)
    bad = bytearray(good)
    # side info starts at byte 4; bv field spans bits 30..38 of it
    for bit in range(30, 39):
        bad[4 + (bit >> 3)] |= 0x80 >> (bit & 7)
    with pytest.raises(ValueError, match="big_values"):
        mp3_side_info(bytes(bad))
    struct  # silence linters; struct used by sibling tests


def test_sideinfo_distributed_shape(spark):
    from python_multiproc_bigdata_spark.operators.mp3 import (
        attach_mp3_si,
        mp3_sideinfo_features,
    )

    df = spark.createDataFrame([(0,), (7,), (13,)], ["doc_id"])
    out = mp3_sideinfo_features(attach_mp3_si(df))
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[13].n_frames == 2 + 13 % 3
    assert rows[0].n_switched + rows[0].sum_region0 >= 0  # schema smoke


# ---- r11: Layer III scalefactor decode (first main-data layer) ----


def test_scalefac_hand_built_long_granules():
    """Frame with both granules long, scfsi=0b1000 (group 0 copied):
    side info + main data written bit-by-bit from the spec layout (no
    shared packer). scalefac_compress=9 → slen (2,2): 21 bands × 2
    bits per granule, but granule 1 skips bands 0-5 (copied)."""
    from python_multiproc_bigdata_spark.operators.mp3 import (
        frame_length,
        mp3_scalefactors,
    )

    g0_sf = [(3 * b + 1) % 4 for b in range(21)]
    g1_sf = [(2 * b + 3) % 4 for b in range(21)]
    bits = format(0, "09b") + "00000" + "1000"  # mdb=0, scfsi group 0
    for g in (0, 1):
        n_sf_bits = 42 if g == 0 else 42 - 12  # granule 1: 6 bands copied
        part23 = n_sf_bits + 5  # 5 filler spectrum bits
        bits += format(part23, "012b") + format(10, "09b") + format(99, "08b")
        bits += format(9, "04b") + "0"  # sfc=9, no switching
        bits += format(7, "05b") * 3 + format(2, "04b") + format(1, "03b")
        bits += "0" + "0" + "0"
    si = int(bits, 2).to_bytes(17, "big")
    mbits = "".join(format(v, "02b") for v in g0_sf) + "11111"
    mbits += "".join(format(v, "02b") for v in g1_sf[6:]) + "10101"
    mbits += "0" * ((-len(mbits)) % 8)
    md = int(mbits, 2).to_bytes(len(mbits) // 8, "big")
    ln = frame_length(128, 44100, 0)
    payload = (
        bytes((0xFF, 0xFB, 0x90, 0xC0)) + si + md
        + bytes([1] * (ln - 4 - 17 - len(md)))
    )
    (fr,) = mp3_scalefactors(payload)
    assert fr["scfsi"] == 0b1000
    got0, got1 = fr["granules"]
    assert got0["long"] == {b: g0_sf[b] for b in range(21)}
    assert got0["part2_bits"] == 42
    # bands 0-5 copied FROM GRANULE 0; 6-20 read from the stream
    want1 = {b: g0_sf[b] for b in range(6)} | {b: g1_sf[b] for b in range(6, 21)}
    assert got1["long"] == want1
    assert got1["part2_bits"] == 30


def test_scalefac_synth_parity_and_layout_coverage():
    """Pack→parse roundtrip equals the documented arithmetic for 80
    docs and ALL THREE layouts (long / pure-short / mixed) plus real
    scfsi copies occur — the oracle's branches are exercised."""
    from python_multiproc_bigdata_spark.operators.mp3 import (
        SLEN,
        _sf_layout,
        _sf_value,
        mp3_scalefactors,
        mp3_side_info,
        synth_mp3_sf,
    )

    saw = {"long": 0, "short": 0, "mixed": 0, "copied": 0}
    for d in range(80):
        payload = synth_mp3_sf(d)
        si = mp3_side_info(payload)
        sf = mp3_scalefactors(payload)
        for f, (fsi, fsf) in enumerate(zip(si, sf)):
            for g, (gsi, gsf) in enumerate(zip(fsi["granules"], fsf["granules"])):
                wsf = gsi["window_switching"]
                bt = gsi.get("block_type", 0)
                mixed = gsi.get("mixed_block", 0)
                if not wsf or bt != 2:
                    saw["long"] += 1
                elif mixed:
                    saw["mixed"] += 1
                else:
                    saw["short"] += 1
                s1, s2 = SLEN[gsi["scalefac_compress"]]
                scfsi = fsf["scfsi"]
                for kind, band, which in _sf_layout(wsf, bt, mixed):
                    slen = s1 if which == 1 else s2
                    if kind == "s":
                        assert gsf["short"][(band // 4, band % 4)] == _sf_value(
                            d, f, g, band, slen
                        )
                        continue
                    grp = 0 if band < 6 else 1 if band < 11 else 2 if band < 16 else 3
                    if g == 1 and (scfsi >> (3 - grp)) & 1:
                        # copied band: granule 0's value with ITS slen
                        saw["copied"] += 1
                        s1g0, s2g0 = SLEN[(d + f) % 16]
                        slen0 = s1g0 if band < 11 else s2g0
                        assert gsf["long"][band] == _sf_value(d, f, 0, band, slen0)
                    else:
                        assert gsf["long"][band] == _sf_value(d, f, g, band, slen)
    assert all(v > 0 for v in saw.values()), saw


def test_scalefac_reservoir_and_underflow_rejected():
    from python_multiproc_bigdata_spark.operators.mp3 import (
        mp3_scalefactors,
        synth_mp3_sf,
    )

    good = bytearray(synth_mp3_sf(3))
    # force a nonzero main_data_begin (first 9 side-info bits)
    bad = bytearray(good)
    bad[4] |= 0x80
    with pytest.raises(ValueError, match="bit-reservoir"):
        mp3_scalefactors(bytes(bad))
    # force part2_3_length below the scalefactor bit count: zero the
    # 12-bit field at side-info bits 18..29
    bad2 = bytearray(good)
    for bit in range(18, 30):
        bad2[4 + (bit >> 3)] &= ~(0x80 >> (bit & 7)) & 0xFF
    with pytest.raises(ValueError, match="part2_3_length"):
        mp3_scalefactors(bytes(bad2))


def test_scalefac_distributed_shape(spark):
    from python_multiproc_bigdata_spark.operators.mp3 import (
        attach_mp3_sf,
        mp3_scalefactor_features,
    )

    df = spark.createDataFrame([(0,), (7,), (13,)], ["doc_id"])
    out = mp3_scalefactor_features(attach_mp3_sf(df))
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[13].n_frames == 2 + 13 % 3
    for r in rows.values():
        assert r.n_long_granules + r.n_short_granules + r.n_mixed_granules == 2 * r.n_frames
