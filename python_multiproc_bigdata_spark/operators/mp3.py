"""MPEG-1 Audio Layer III (MP3) frame-structure parser — the honest
middle ground for the one audio format whose full decode is genuinely
library-bound: the psychoacoustic MDCT/synthesis-filterbank DECODE
stays behind the documented stub (operators/multimodal.py:decode_media),
but the FRAME STRUCTURE is public spec (ISO/IEC 11172-3) and is what a
production data pipeline actually needs to validate, measure, and
deduplicate audio blobs at ingest: sync-word walking, header field
decode against the bitrate/sample-rate tables, the Layer III frame
length formula 144·bitrate/sample_rate + padding, ID3v2 tag skipping
(syncsafe 7-bit size), and per-frame accounting (duration = 1152
samples per MPEG-1 Layer III frame).

All outputs are integers (frame counts, byte counts, sample counts,
bitrate sums), so a DuckDB oracle replays the synth corpus arithmetic
exactly (registry/multimodal.py:SQL_MP3_FRAME_WALK) — the same
exact-parity posture as the other seven real decode paths.

Reference parity note: the reference walks media files as opaque
payloads (v1 taxonomy walker, v2/core/extractors/files.py); frame-level
audio introspection is a beyond-reference capability of the multimodal
training-data surface, sibling to the PPM/WAV/AVI/TIFF/PNG/GIF/BMP/JPEG
decoders.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# MPEG-1 Layer III bitrate table, kbps, index 1..14 (0 = free, 15 = bad)
BITRATE_KBPS = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
# MPEG-1 sample-rate table, index 0..2 (3 = reserved)
SAMPLE_RATES = (44100, 48000, 32000)
SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """ISO 11172-3 Layer II/III frame size: ⌊144·bitrate/fs⌋ + padding."""
    return (144 * bitrate_kbps * 1000) // sample_rate + padding


def _syncsafe(n: int) -> bytes:
    """ID3v2 syncsafe size: 4 bytes of 7 bits each (MSB clear)."""
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _header(bitrate_idx: int, sr_idx: int, padding: int) -> bytes:
    """Pack one MPEG-1 Layer III header: sync 11×1, version 11 (MPEG-1),
    layer 01 (III), no-CRC 1, then bitrate/samplerate/padding, joint
    stereo, no flags, no emphasis."""
    b0 = 0xFF
    b1 = 0b11111011  # sync low 3 bits | version 11 | layer 01 | prot 1
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0b01000000  # joint stereo, mode-ext 0, no copyright/original, emph 0
    return bytes((b0, b1, b2, b3))


def synth_mp3(doc_id: int) -> bytes:
    """Deterministic MP3 payload for a doc: an ID3v2.3 tag on even docs
    (body size (doc_id%5)·7, so the syncsafe skip is exercised with
    varying sizes including 0), then n = 3 + doc_id%4 frames with
    bitrate index 1 + (doc_id·3 + f·5) % 14 (every table row appears
    across the corpus), sample rate index doc_id%3 (all three rates),
    padding (doc_id + f) % 2. Frame payload filler bytes are
    (doc_id + f) % 0xFE — never 0xFF, so no false sync can occur and
    the walker's advance-by-computed-length is what's under test."""
    out = bytearray()
    if doc_id % 2 == 0:
        body = (doc_id % 5) * 7
        out += b"ID3" + bytes((3, 0, 0)) + _syncsafe(body)
        out += bytes([(doc_id + i) % 0xFE for i in range(body)])
    n_frames = 3 + doc_id % 4
    sr_idx = doc_id % 3
    for f in range(n_frames):
        br_idx = 1 + (doc_id * 3 + f * 5) % 14
        pad = (doc_id + f) % 2
        ln = frame_length(BITRATE_KBPS[br_idx], SAMPLE_RATES[sr_idx], pad)
        out += _header(br_idx, sr_idx, pad)
        out += bytes([(doc_id + f) % 0xFE] * (ln - 4))
    return bytes(out)


def mp3_frames(payload: bytes) -> tuple[int, list[tuple[int, int, int, int]]]:
    """Walk an MP3 payload: skip a leading ID3v2 tag if present, then
    parse every frame header, validating sync/version/layer and table
    indices, advancing by the computed frame length. Returns
    (tag_bytes, frames) where each frame is (bitrate_kbps, sample_rate,
    padding, frame_bytes). Raises loudly on desync or reserved fields —
    a data-quality gate, not a lenient scanner."""
    pos = 0
    tag_bytes = 0
    n = len(payload)
    if payload[:3] == b"ID3":
        if n < 10:
            raise ValueError("truncated ID3v2 header")
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("non-syncsafe byte in ID3v2 size")
            size = (size << 7) | b
        tag_bytes = 10 + size
        pos = tag_bytes
    frames: list[tuple[int, int, int, int]] = []
    while pos < n:
        if pos + 4 > n:
            raise ValueError(f"truncated frame header at {pos}")
        b0, b1, b2, _b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at {pos}")
        version = (b1 >> 3) & 0x03
        layer = (b1 >> 1) & 0x03
        if version != 0b11 or layer != 0b01:
            raise ValueError(
                f"unsupported MPEG version/layer bits {version:02b}/{layer:02b} "
                "(MPEG-1 Layer III only)"
            )
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        pad = (b2 >> 1) & 0x01
        if br_idx in (0, 15):
            raise ValueError(f"free/bad bitrate index at {pos}")
        if sr_idx == 3:
            raise ValueError(f"reserved sample-rate index at {pos}")
        br = BITRATE_KBPS[br_idx]
        sr = SAMPLE_RATES[sr_idx]
        ln = frame_length(br, sr, pad)
        if pos + ln > n:
            raise ValueError(f"frame at {pos} runs past payload end")
        frames.append((br, sr, pad, ln))
        pos += ln
    return tag_bytes, frames


def mp3_stats(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
    """Frame walk → integer stats (n_frames, sample_rate, tag_bytes,
    audio_bytes, total_samples, sum_bitrate_kbps, n_padded)."""
    tag_bytes, frames = mp3_frames(payload)
    return (
        len(frames),
        frames[0][1] if frames else 0,
        tag_bytes,
        sum(f[3] for f in frames),
        SAMPLES_PER_FRAME * len(frames),
        sum(f[0] for f in frames),
        sum(f[2] for f in frames),
    )


MP3_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("tag_bytes", T.LongType()),
        T.StructField("audio_bytes", T.LongType()),
        T.StructField("total_samples", T.LongType()),
        T.StructField("sum_bitrate_kbps", T.LongType()),
        T.StructField("n_padded", T.LongType()),
    ]
)


def attach_mp3(df: DataFrame) -> DataFrame:
    """Synthesize the binary MP3 payload column (doc_id → media) in
    Arrow batches — attach_wav's sibling fixture stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [synth_mp3(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return df.select("doc_id").mapInPandas(batches, schema)


def mp3_frame_features(df: DataFrame) -> DataFrame:
    """Frame-walk a binary MP3 column via mapInPandas (Arrow batches):
    1 blob in → 1 integer-stats row out, map-only, zero shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [mp3_stats(bytes(p)) for p in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": [d[0] for d in decoded],
                    "sample_rate": [d[1] for d in decoded],
                    "tag_bytes": [d[2] for d in decoded],
                    "audio_bytes": [d[3] for d in decoded],
                    "total_samples": [d[4] for d in decoded],
                    "sum_bitrate_kbps": [d[5] for d in decoded],
                    "n_padded": [d[6] for d in decoded],
                }
            )

    return df.mapInPandas(batches, MP3_SCHEMA)
