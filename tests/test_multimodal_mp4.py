"""MP4 / ISO-BMFF box-walker tests (operators/mp4.py, r9): hand-built
boxes with spec-derived bytes, all three size encodings, version-0/1
headers, unknown-box skipping, strict boundary accounting, and the
distributed two-stage shape."""

from __future__ import annotations

import struct

import pytest

from python_multiproc_bigdata_spark.operators.mp4 import (
    attach_mp4,
    decode_mp4,
    decode_mp4_features,
    mp4_boxes,
    synth_mp4,
)


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def test_hand_built_minimal_file():
    """Assembled by hand with struct: version-0 mvhd (timescale 1000,
    duration 5000), one video track (id 7, width 320 in 16.16), an
    unknown `wxyz` box the walker must skip, and an mdat using the
    64-bit largesize encoding."""
    mvhd = _box(
        b"mvhd",
        bytes((0, 0, 0, 0)) + struct.pack(">IIII", 0, 0, 1000, 5000) + bytes(80),
    )
    tkhd = _box(
        b"tkhd",
        bytes((0, 0, 0, 7))
        + struct.pack(">IIIII", 0, 0, 7, 0, 5000)
        + bytes(52)
        + struct.pack(">II", 320 << 16, 240 << 16),
    )
    hdlr = _box(b"hdlr", bytes(4) + struct.pack(">I4s", 0, b"vide") + bytes(13))
    mdhd = _box(
        b"mdhd",
        bytes((0, 0, 0, 0)) + struct.pack(">IIII", 0, 0, 1000, 5000) + bytes(4),
    )
    mdia = _box(b"mdia", mdhd + hdlr)
    trak = _box(b"trak", tkhd + mdia)
    unknown = _box(b"wxyz", b"opaque-to-the-walker")
    moov = _box(b"moov", mvhd + trak)
    mdat_body = b"x" * 33
    mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 33) + mdat_body
    blob = _box(b"ftyp", b"isom" + bytes(4)) + unknown + moov + mdat

    n_boxes, ts, dur, tracks, mdat_bytes, large = mp4_boxes(blob)
    assert (ts, dur) == (1000, 5000)
    assert tracks == [(7, "vide", 320)]
    assert mdat_bytes == 33 and large
    assert n_boxes == 10  # ftyp wxyz moov mvhd trak tkhd mdia mdhd hdlr mdat
    assert decode_mp4(blob) == (10, 1, 1000, 5000, 33, 320, True)


def test_structural_violations_rejected():
    blob = bytearray(synth_mp4(2))
    struct.pack_into(">I", blob, 0, 10**6)  # ftyp overruns the file
    with pytest.raises(ValueError, match="overruns"):
        mp4_boxes(bytes(blob))
    with pytest.raises(ValueError):
        mp4_boxes(synth_mp4(1)[:-5])  # truncated tail
    with pytest.raises(ValueError, match="no mvhd"):
        mp4_boxes(_box(b"ftyp", b"isom" + bytes(4)))


def test_synth_walk_parity_all_encodings():
    """Every (version, largesize, to-EOF) combination appears across
    d ∈ 0..59 and the walk must match the arithmetic the SQL oracle
    replays."""
    saw_large = saw_eof = saw_v1 = False
    for d in range(60):
        nt = 1 + d % 2
        got = decode_mp4(synth_mp4(d))
        assert got == (
            5 + 5 * nt, nt, 600 * (1 + d % 3), 600 + d * 37,
            50 + d % 100, 16 * (1 + d % 4), d % 4 == 0,
        ), d
        saw_large |= d % 4 == 0
        saw_eof |= d % 4 != 0 and d % 5 == 0
        saw_v1 |= d % 3 == 0
    assert saw_large and saw_eof and saw_v1


def test_distributed_shape(spark):
    df = spark.createDataFrame([(0,), (3,), (5,)], ["doc_id"])
    out = decode_mp4_features(attach_mp4(df))
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].used_largesize and not rows[5].used_largesize
    assert rows[3].n_tracks == 2 and rows[3].video_width == 16 * (1 + 3 % 4)
