"""MP4 / ISO base-media (ISO/IEC 14496-12) box walker — the modern
video container, joining AVI as the second genuinely parsed video
format (codec payloads stay honestly stubbed; container structure is
public spec and is what an ingest pipeline must validate and measure).

Implemented from the spec with stdlib struct only:

  synth : ftyp + a `free` box (so unknown-box SKIPPING is always on the
          checked path — real files carry boxes a walker has never
          heard of) + moov{mvhd, per-track trak{tkhd, mdia{mdhd,
          hdlr}}} + mdat. A third of the corpus writes version-1
          (64-bit time) mvhd/mdhd headers, a quarter uses the
          largesize=1 64-bit box length on mdat, and a fifth uses
          size=0 (box extends to end of file) — all three size/version
          encodings the spec allows.
  walk  : iterative container descent with STRICT boundary accounting
          (children must exactly fill their container; any overrun
          raises), size==1 → 64-bit largesize, size==0 → to-EOF,
          version-dependent field widths in mvhd/mdhd/tkhd, handler
          type from hdlr, fixed-point 16.16 track dimensions.

Integer stats out; the DuckDB oracle replays the synth arithmetic
(registry/multimodal.py:SQL_MP4_BOXES) — a wrong size decode anywhere
shifts every downstream box and the walk fails or the stats move.

Reference parity note: the reference treats media as opaque files
(v1 taxonomy walker, v2/core/extractors/files.py); container
introspection is beyond-reference, sibling to the AVI/TIFF/JPEG/MP3
decoders.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CONTAINERS = {b"moov", b"trak", b"mdia"}


def _box(tag: bytes, body: bytes, large: bool = False, to_eof: bool = False) -> bytes:
    if to_eof:
        return struct.pack(">I", 0) + tag + body
    if large:
        return struct.pack(">I", 1) + tag + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(version: int, flags: int, body: bytes) -> bytes:
    return struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body


def synth_mp4(doc_id: int) -> bytes:
    """Deterministic ISO-BMFF file: timescale 600·(1+doc_id%3), movie
    duration 600 + doc_id·37 units, 1 + doc_id%2 tracks (track 1 video
    with 16.16 fixed-point width 16·(1+doc_id%4), track 2 audio), mdat
    payload 50 + doc_id%100 filler bytes. Encodings cycled across the
    corpus: version-1 (64-bit) time headers when doc_id%3==0, mdat
    largesize when doc_id%4==0, mdat size=0 (to end of file) when
    doc_id%5==0 (largesize wins the overlap), and a `free` box the
    walker must skip unparsed."""
    ts = 600 * (1 + doc_id % 3)
    dur = 600 + doc_id * 37
    v1 = doc_id % 3 == 0
    n_tracks = 1 + doc_id % 2
    width = 16 * (1 + doc_id % 4)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    free = _box(b"free", b"\x00" * (5 + doc_id % 7))

    if v1:
        mvhd_body = _full(1, 0, struct.pack(">QQIQ", 0, 0, ts, dur) + bytes(80))
    else:
        mvhd_body = _full(0, 0, struct.pack(">IIII", 0, 0, ts, dur) + bytes(80))
    mvhd = _box(b"mvhd", mvhd_body)

    traks = b""
    for t in range(n_tracks):
        handler = b"vide" if t == 0 else b"soun"
        if v1:
            tkhd_body = _full(
                1, 7, struct.pack(">QQIIQ", 0, 0, t + 1, 0, dur) + bytes(52)
                + struct.pack(">II", (width if t == 0 else 0) << 16, 9 << 16)
            )
        else:
            tkhd_body = _full(
                0, 7, struct.pack(">IIIII", 0, 0, t + 1, 0, dur) + bytes(52)
                + struct.pack(">II", (width if t == 0 else 0) << 16, 9 << 16)
            )
        if v1:
            mdhd_body = _full(1, 0, struct.pack(">QQIQ", 0, 0, ts, dur) + bytes(4))
        else:
            mdhd_body = _full(0, 0, struct.pack(">IIII", 0, 0, ts, dur) + bytes(4))
        hdlr_body = _full(0, 0, struct.pack(">I4s", 0, handler) + bytes(12) + b"\x00")
        mdia = _box(b"mdia", _box(b"mdhd", mdhd_body) + _box(b"hdlr", hdlr_body))
        traks += _box(b"trak", _box(b"tkhd", tkhd_body) + mdia)

    moov = _box(b"moov", mvhd + traks)
    payload = bytes((doc_id + i) % 251 for i in range(50 + doc_id % 100))
    mdat = _box(
        b"mdat", payload, large=doc_id % 4 == 0,
        to_eof=doc_id % 4 != 0 and doc_id % 5 == 0,
    )
    return ftyp + free + moov + mdat


def mp4_boxes(payload: bytes):
    """Walk an ISO-BMFF file: returns (n_boxes, movie_timescale,
    movie_duration, tracks, mdat_bytes, used_largesize). `tracks` is
    [(track_id, handler, width_int)] in file order. Strict boundary
    accounting: every box must end exactly within its container;
    size==1 reads the 64-bit largesize; size==0 extends to the
    container's end (legal only for the last box). Unknown leaf boxes
    are SKIPPED by size, as the spec requires of readers."""
    n_boxes = 0
    movie: dict = {"ts": None, "dur": None}
    tracks: list[tuple[int, str, int]] = []
    mdat_bytes = 0
    used_large = False
    pending_track: dict = {}

    def walk(lo: int, hi: int, depth: int) -> None:
        nonlocal n_boxes, mdat_bytes, used_large
        pos = lo
        while pos < hi:
            if pos + 8 > hi:
                raise ValueError(f"truncated box header at {pos}")
            (size,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            body_at = pos + 8
            if size == 1:
                (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
                body_at = pos + 16
                used_large = True
            elif size == 0:
                size = hi - pos  # to end of enclosing container
            end = pos + size
            if end > hi or end < body_at:
                raise ValueError(f"box {tag!r} at {pos} overruns its container")
            n_boxes += 1
            body = payload[body_at:end]
            if tag in CONTAINERS:
                if tag == b"trak":
                    pending_track.clear()
                walk(body_at, end, depth + 1)
                if tag == b"trak":
                    tracks.append(
                        (
                            pending_track.get("id", 0),
                            pending_track.get("handler", ""),
                            pending_track.get("width", 0),
                        )
                    )
            elif tag == b"mvhd":
                v = body[0]
                if v == 1:
                    _, _, ts, dur = struct.unpack(">QQIQ", body[4:32])
                else:
                    _, _, ts, dur = struct.unpack(">IIII", body[4:20])
                movie["ts"], movie["dur"] = ts, dur
            elif tag == b"tkhd":
                v = body[0]
                if v == 1:
                    tid = struct.unpack(">I", body[20:24])[0]
                    w = struct.unpack(">I", body[4 + 32 + 52 : 4 + 32 + 56])[0]
                else:
                    tid = struct.unpack(">I", body[12:16])[0]
                    w = struct.unpack(">I", body[4 + 20 + 52 : 4 + 20 + 56])[0]
                pending_track["id"] = tid
                pending_track["width"] = w >> 16  # 16.16 fixed point
            elif tag == b"hdlr":
                pending_track["handler"] = body[8:12].decode("ascii")
            elif tag == b"mdat":
                mdat_bytes += len(body)
            # mdhd/ftyp/free/unknown: skipped by size (spec behavior)
            pos = end
        if pos != hi:
            raise ValueError("container children do not fill it exactly")

    walk(0, len(payload), 0)
    if movie["ts"] is None:
        raise ValueError("no mvhd box found")
    return n_boxes, movie["ts"], movie["dur"], tracks, mdat_bytes, used_large


def decode_mp4(payload: bytes) -> tuple[int, int, int, int, int, int, bool]:
    """Walk → integer stats (n_boxes, n_tracks, timescale,
    duration_units, mdat_bytes, video_width, used_largesize)."""
    n_boxes, ts, dur, tracks, mdat_bytes, large = mp4_boxes(payload)
    vwidth = next((w for _tid, h, w in tracks if h == "vide"), 0)
    return n_boxes, len(tracks), ts, dur, mdat_bytes, vwidth, large


MP4_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_boxes", T.LongType()),
        T.StructField("n_tracks", T.LongType()),
        T.StructField("timescale", T.LongType()),
        T.StructField("duration_units", T.LongType()),
        T.StructField("mdat_bytes", T.LongType()),
        T.StructField("video_width", T.LongType()),
        T.StructField("used_largesize", T.BooleanType()),
    ]
)


def attach_mp4(df: DataFrame) -> DataFrame:
    """Synthesize the binary MP4 payload column (doc_id → media) in
    Arrow batches — attach_avi's ISO-BMFF sibling."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [synth_mp4(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return df.select("doc_id").mapInPandas(batches, schema)


def decode_mp4_features(df: DataFrame) -> DataFrame:
    """Walk a binary MP4 column via mapInPandas: 1 blob in → 1 row of
    integer container stats out, map-only, zero shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_mp4(bytes(p)) for p in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_boxes": [d[0] for d in decoded],
                    "n_tracks": [d[1] for d in decoded],
                    "timescale": [d[2] for d in decoded],
                    "duration_units": [d[3] for d in decoded],
                    "mdat_bytes": [d[4] for d in decoded],
                    "video_width": [d[5] for d in decoded],
                    "used_largesize": [d[6] for d in decoded],
                }
            )

    return df.mapInPandas(batches, MP4_SCHEMA)
