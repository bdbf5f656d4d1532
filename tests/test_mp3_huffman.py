"""MP3 Layer III Huffman decode (r12): spec-table properties, a
hand-packed bit-level walk, synth/decode roundtrip against an
independent arithmetic replay, and the loud gates (unsupported tables,
part2_3 overrun)."""

from __future__ import annotations

import pytest

from python_multiproc_bigdata_spark.operators.mp3 import (
    COUNT1_TABLE_B,
    HUFF_TABLE_1,
    SFB_LONG_BOUNDS,
    SLEN,
    _BitReader,
    _COUNT1B_DEC,
    _HUFF1_DEC,
    _hf_dims,
    _hf_pair,
    _hf_quad,
    _hf_stats,
    _read_huffman,
    mp3_huffman,
    synth_mp3_hf,
)


def _codes(tab):
    return [format(c, f"0{h}b") for h, c in tab.values()]


@pytest.mark.parametrize("tab", [HUFF_TABLE_1, COUNT1_TABLE_B])
def test_tables_complete_prefix_codes(tab):
    """Both spec tables must be COMPLETE prefix codes: Kraft sum
    exactly 1 and no codeword a prefix of another — the property that
    makes the bit-serial walk unambiguous and exhaustive."""
    assert sum(2.0 ** -h for h, _ in tab.values()) == 1.0
    bits = _codes(tab)
    for a in bits:
        for b in bits:
            assert a == b or not b.startswith(a)


def test_table1_matches_spec_listing():
    """ISO 11172-3 Table B.7 table 1: hlen (1,3,2,3) over (x,y) in
    listing order 00,01,10,11 with hcod 1, 001, 01, 000."""
    assert HUFF_TABLE_1 == {
        (0, 0): (1, 0b1),
        (0, 1): (3, 0b001),
        (1, 0): (2, 0b01),
        (1, 1): (3, 0b000),
    }


def test_count1_b_is_fixed_4bit_complement():
    """count1 table B: every quadruple at 4 bits, hcod = 15 - n."""
    for n in range(16):
        quad = ((n >> 3) & 1, (n >> 2) & 1, (n >> 1) & 1, n & 1)
        assert COUNT1_TABLE_B[quad] == (4, 15 - n)


def test_sfb_bounds_sum_to_576():
    """Table B.8 long-block boundaries: 23 monotone edges 0..576 for
    each MPEG-1 sample rate (the granule is always 576 samples)."""
    for bounds in SFB_LONG_BOUNDS:
        assert len(bounds) == 23
        assert bounds[0] == 0 and bounds[-1] == 576
        assert all(a < b for a, b in zip(bounds, bounds[1:]))


def test_hand_packed_bitstream_walk():
    """Bit-level hand case: '1' -> (0,0); '01' + signs -> (1,0) with a
    negative x; '000' -> (1,1); then a count1 quad '1011' = 15-11 ->
    (1,0,1,1)... decoded exactly as packed, MSB-first."""
    # big-values: (0,0) '1', (1,0) '01' sign 1, (1,1) '000' signs 0,1
    # -> bits: 1 01 1 000 0 1  = 10110000 1 + pad
    r = _BitReader(bytes([0b10110000, 0b10000000]))
    assert _read_huffman(r, _HUFF1_DEC) == (0, 0)
    assert _read_huffman(r, _HUFF1_DEC) == (1, 0)
    assert r.get(1) == 1  # x negative
    assert _read_huffman(r, _HUFF1_DEC) == (1, 1)
    assert r.get(1) == 0 and r.get(1) == 1
    # count1 quad (1,0,1,1): n = 0b1011 = 11 -> hcod 4 at 4 bits
    r2 = _BitReader(bytes([(15 - 0b1011) << 4]))
    assert _read_huffman(r2, _COUNT1B_DEC) == (1, 0, 1, 1)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7, 11, 38, 97, 123])
def test_roundtrip_matches_independent_replay(doc_id):
    """Decode synth_mp3_hf's bitstream and compare every aggregate to
    an in-test replay of the published arithmetic (own region loop —
    shares only the spec constants)."""
    d = doc_id
    got = _hf_stats(synth_mp3_hf(d))
    hlen = {(0, 0): 1, (0, 1): 3, (1, 0): 2, (1, 1): 3}
    nf = 2 + d % 3
    bounds = SFB_LONG_BOUNDS[d % 3]
    sum_bv = r0p = r1p = r2p = sabs = nneg = quads = hbits = sfbits = 0
    chk = 0
    for f in range(nf):
        for g in (0, 1):
            dims = _hf_dims(d, f, g)
            s1, s2 = SLEN[dims["sfc"]]
            sfbits += s1 * 11 + s2 * 10
            b0 = min(dims["bv"], bounds[dims["r0"] + 1] // 2)
            b1 = min(dims["bv"], bounds[dims["r0"] + dims["r1"] + 2] // 2)
            sum_bv += dims["bv"]
            coeffs = []
            for i in range(dims["bv"]):
                reg = 0 if i < b0 else (1 if i < b1 else 2)
                if reg == 0:
                    r0p += 1
                elif reg == 1:
                    r1p += 1
                else:
                    r2p += 1
                if dims["ts"][reg] == 0:
                    continue
                x, y, sx, sy = _hf_pair(d, f, g, i)
                hbits += hlen[(x, y)] + (x != 0) + (y != 0)
                if x:
                    coeffs.append((2 * i, -x if sx else x))
                if y:
                    coeffs.append((2 * i + 1, -y if sy else y))
            sample = 2 * dims["bv"]
            for i in range(dims["nq"]):
                vals, signs = _hf_quad(d, f, g, i)
                hbits += 4 + sum(vals)
                for k, (v, s) in enumerate(zip(vals, signs)):
                    if v:
                        coeffs.append((sample + k, -v if s else v))
                sample += 4
            quads += dims["nq"]
            for idx, v in coeffs:
                sabs += abs(v)
                if v < 0:
                    nneg += 1
                chk = (chk + (idx + 1) * (v + 3)) % 1_000_003
    assert got == (
        nf, sum_bv, r0p, r1p, r2p, sabs, nneg, quads, hbits, sfbits, chk
    )


def _flip_side_info_bit(payload: bytes, bit_in_si: int) -> bytes:
    """Flip one bit inside the FIRST frame's 17-byte side info."""
    b = bytearray(payload)
    byte = 4 + bit_in_si // 8
    b[byte] ^= 0x80 >> (bit_in_si % 8)
    return bytes(b)


def test_loud_gate_unsupported_bigvalues_table():
    """Forcing a table_select outside {0,1} must raise, not decode
    garbage. Granule 0's table_select fields start at bit 18+12+9+8+4+1
    of the side info."""
    p = synth_mp3_hf(4)  # doc with nonzero big_values in region 0
    from python_multiproc_bigdata_spark.operators.mp3 import mp3_side_info

    si = mp3_side_info(p)[0]["granules"][0]
    assert si["big_values"] > 0
    # table_select[0] occupies bits [52, 57) of the side-info block;
    # flipping its bit 3 turns table 0<->2 or 1<->3: always unsupported
    bad = _flip_side_info_bit(p, 52 + 3)
    with pytest.raises(ValueError, match="unsupported|no Huffman codeword"):
        mp3_huffman(bad)


def test_loud_gate_count1_table_a():
    """count1table_select = 0 (table A) is outside the subset: raise."""
    p = synth_mp3_hf(1)
    # count1table_select is the last bit of granule 0's 59-bit block:
    # bits 18..77 -> bit 76
    bad = _flip_side_info_bit(p, 76)
    with pytest.raises(ValueError, match="count1 table A unsupported"):
        mp3_huffman(bad)


def test_loud_gate_part23_boundary():
    """Shrinking part2_3_length below the real bit count must raise
    (decode would overrun); the walk never lands silently."""
    p = synth_mp3_hf(2)
    # part2_3_length granule 0 = side-info bits [18, 30); flip its MSB
    # (value has bit 11 set or not — either way the boundary breaks)
    bad = _flip_side_info_bit(p, 18)
    with pytest.raises(ValueError):
        mp3_huffman(bad)
