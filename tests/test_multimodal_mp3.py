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
