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

from python_multiproc_bigdata_spark.operators.transforms import fan_out_scan

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
    return fan_out_scan(df.select("doc_id"), "doc_id").mapInPandas(batches, schema)


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


# ---------------------------------------------------------------------------
# Layer III side information (ISO/IEC 11172-3 §2.4.1.7) — the next layer
# below the frame walk: per-granule Huffman/scalefactor bookkeeping. Full
# MDCT sample synthesis stays behind the documented stub (library-bound);
# the side info is pure bit-packed integers, so the parser is exact and a
# DuckDB oracle replays the synth corpus's field arithmetic. Mono frames:
# 17 side-info bytes after the 4-byte header (no CRC), 2 granules.
# ---------------------------------------------------------------------------


def _pack_bits(pairs: list[tuple[int, int]]) -> bytes:
    """MSB-first bit packer: (value, n_bits) fields → bytes; total must
    be byte-aligned (the 136-bit mono side-info block is)."""
    acc, nb = 0, 0
    for val, n in pairs:
        if not 0 <= val < (1 << n):
            raise ValueError(f"field {val} does not fit in {n} bits")
        acc = (acc << n) | val
        nb += n
    if nb % 8:
        raise ValueError(f"side-info block not byte-aligned: {nb} bits")
    return acc.to_bytes(nb // 8, "big")


class _BitReader:
    """MSB-first bit reader over a bytes slice."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def get(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


MAX_BIG_VALUES = 288  # spec bound: big_values <= 288 (§2.4.2.7)


def _si_fields(d: int, f: int, g: int) -> dict:
    """The synth corpus's per-granule field arithmetic — one place, so
    synth, test replay, and the SQL oracle all cite the same formulas."""
    wsf = (d + f + g) % 2
    out = {
        "p23": (d * 13 + f * 5 + g * 9) % 4096,
        "bv": (d * 3 + f + 2 * g) % (MAX_BIG_VALUES + 1),
        "gg": (d * 7 + f * 3 + g) % 256,
        "sfc": (d + f + g) % 16,
        "wsf": wsf,
        "pre": (d // 3 + f + g) % 2,
        "sfs": (d // 5 + f + g) % 2,
        "c1t": (d // 7 + f + g) % 2,
    }
    if wsf:
        out["bt"] = 1 + (d + g) % 3
        out["mixed"] = (d + f) % 2
        out["ts"] = [(d * 5 + f + g + i) % 32 for i in (0, 1)]
        out["sbg"] = [(d + f + g + i) % 8 for i in range(3)]
    else:
        out["ts"] = [(d * 5 + f + g + i) % 32 for i in range(3)]
        out["r0"] = (d + f) % 16
        out["r1"] = (d + g) % 8
    return out


def _side_info_block(d: int, f: int) -> bytes:
    """Pack one mono side-info block (17 bytes / 136 bits): 9-bit
    main_data_begin, 5 private bits, 4-bit scfsi, then 59 bits per
    granule (37 fixed + 22 branch — both window layouts exercised)."""
    pairs: list[tuple[int, int]] = [
        ((d * 31 + f * 7) % 512, 9),
        (0, 5),
        ((d + f) % 16, 4),
    ]
    for g in (0, 1):
        x = _si_fields(d, f, g)
        pairs += [
            (x["p23"], 12),
            (x["bv"], 9),
            (x["gg"], 8),
            (x["sfc"], 4),
            (x["wsf"], 1),
        ]
        if x["wsf"]:
            pairs += [(x["bt"], 2), (x["mixed"], 1)]
            pairs += [(t, 5) for t in x["ts"]]
            pairs += [(s, 3) for s in x["sbg"]]
        else:
            pairs += [(t, 5) for t in x["ts"]]
            pairs += [(x["r0"], 4), (x["r1"], 3)]
        pairs += [(x["pre"], 1), (x["sfs"], 1), (x["c1t"], 1)]
    return _pack_bits(pairs)


def synth_mp3_si(doc_id: int) -> bytes:
    """Deterministic MONO MP3 whose frames carry REAL side-info blocks:
    nf = 2 + doc_id%3 frames, bitrate/samplerate/padding reusing
    synth_mp3's table-covering formulas, mode bits 11 (single channel),
    the 17-byte side-info block packed from _si_fields, then non-0xFF
    filler (main data stays honest filler — only the side info is
    claimed decoded)."""
    out = bytearray()
    n_frames = 2 + doc_id % 3
    sr_idx = doc_id % 3
    for f in range(n_frames):
        br_idx = 1 + (doc_id * 3 + f * 5) % 14
        pad = (doc_id + f) % 2
        ln = frame_length(BITRATE_KBPS[br_idx], SAMPLE_RATES[sr_idx], pad)
        hdr = bytearray(_header(br_idx, sr_idx, pad))
        hdr[3] = 0b11000000  # mono (mode 11)
        si = _side_info_block(doc_id, f)
        out += hdr + si + bytes([(doc_id + f) % 0xFE] * (ln - 4 - len(si)))
    return bytes(out)


def mp3_side_info(payload: bytes) -> list[dict]:
    """Walk a MONO MP3 payload and bit-decode every frame's side-info
    block: returns one dict per frame with main_data_begin, scfsi, and
    a 2-tuple of granule dicts. Validates sync, mono mode, the spec
    big_values <= 288 bound, and block_type != 0 under window
    switching — raising loudly, same gate posture as mp3_frames."""
    pos = 0
    n = len(payload)
    frames: list[dict] = []
    while pos < n:
        if pos + 4 > n:
            raise ValueError(f"truncated frame header at {pos}")
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at {pos}")
        if (b1 >> 3) & 0x03 != 0b11 or (b1 >> 1) & 0x03 != 0b01:
            raise ValueError(f"not MPEG-1 Layer III at {pos}")
        if (b3 >> 6) & 0x03 != 0b11:
            raise ValueError(f"side-info walker requires mono frames at {pos}")
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        pad = (b2 >> 1) & 0x01
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError(f"reserved header field at {pos}")
        ln = frame_length(BITRATE_KBPS[br_idx], SAMPLE_RATES[sr_idx], pad)
        if pos + ln > n or ln < 4 + 17:
            raise ValueError(f"frame at {pos} cannot hold mono side info")
        r = _BitReader(payload[pos + 4 : pos + 4 + 17])
        fr = {"main_data_begin": r.get(9), "_priv": r.get(5), "scfsi": r.get(4)}
        grans = []
        for g in range(2):
            gr = {
                "part2_3_length": r.get(12),
                "big_values": r.get(9),
                "global_gain": r.get(8),
                "scalefac_compress": r.get(4),
                "window_switching": r.get(1),
            }
            if gr["big_values"] > MAX_BIG_VALUES:
                raise ValueError(
                    f"big_values {gr['big_values']} > {MAX_BIG_VALUES} at {pos} g{g}"
                )
            if gr["window_switching"]:
                gr["block_type"] = r.get(2)
                if gr["block_type"] == 0:
                    raise ValueError(f"reserved block_type 0 under switching at {pos}")
                gr["mixed_block"] = r.get(1)
                gr["table_select"] = [r.get(5) for _ in range(2)]
                gr["subblock_gain"] = [r.get(3) for _ in range(3)]
            else:
                gr["table_select"] = [r.get(5) for _ in range(3)]
                gr["region0_count"] = r.get(4)
                gr["region1_count"] = r.get(3)
            gr["preflag"] = r.get(1)
            gr["scalefac_scale"] = r.get(1)
            gr["count1table_select"] = r.get(1)
            grans.append(gr)
        fr["granules"] = grans
        frames.append(fr)
        pos += ln
    return frames


MP3_SI_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sum_main_data_begin", T.LongType()),
        T.StructField("sum_scfsi", T.LongType()),
        T.StructField("sum_part23", T.LongType()),
        T.StructField("sum_big_values", T.LongType()),
        T.StructField("sum_global_gain", T.LongType()),
        T.StructField("sum_scalefac_compress", T.LongType()),
        T.StructField("n_switched", T.LongType()),
        T.StructField("sum_block_type", T.LongType()),
        T.StructField("n_mixed", T.LongType()),
        T.StructField("sum_table_select", T.LongType()),
        T.StructField("sum_subblock_gain", T.LongType()),
        T.StructField("sum_region0", T.LongType()),
        T.StructField("sum_region1", T.LongType()),
        T.StructField("n_preflag", T.LongType()),
        T.StructField("n_scalefac_scale", T.LongType()),
        T.StructField("n_count1", T.LongType()),
    ]
)


def _si_stats(payload: bytes) -> tuple:
    fr = mp3_side_info(payload)
    gs = [g for f in fr for g in f["granules"]]
    sw = [g for g in gs if g["window_switching"]]
    no = [g for g in gs if not g["window_switching"]]
    return (
        len(fr),
        sum(f["main_data_begin"] for f in fr),
        sum(f["scfsi"] for f in fr),
        sum(g["part2_3_length"] for g in gs),
        sum(g["big_values"] for g in gs),
        sum(g["global_gain"] for g in gs),
        sum(g["scalefac_compress"] for g in gs),
        len(sw),
        sum(g["block_type"] for g in sw),
        sum(g["mixed_block"] for g in sw),
        sum(t for g in gs for t in g["table_select"]),
        sum(s for g in sw for s in g["subblock_gain"]),
        sum(g["region0_count"] for g in no),
        sum(g["region1_count"] for g in no),
        sum(g["preflag"] for g in gs),
        sum(g["scalefac_scale"] for g in gs),
        sum(g["count1table_select"] for g in gs),
    )


def attach_mp3_si(df: DataFrame) -> DataFrame:
    """Synthesize the mono side-info MP3 payload column in Arrow
    batches — attach_mp3's sibling fixture stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [synth_mp3_si(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return fan_out_scan(df.select("doc_id"), "doc_id").mapInPandas(batches, schema)


def mp3_sideinfo_features(df: DataFrame) -> DataFrame:
    """Side-info-walk a binary MP3 column via mapInPandas: 1 blob in →
    1 integer-stats row out, map-only, zero shuffle."""
    names = [f.name for f in MP3_SI_SCHEMA.fields[1:]]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_si_stats(bytes(p)) for p in pdf["media"]]
            cols = {"doc_id": pdf["doc_id"]}
            for i, nm in enumerate(names):
                cols[nm] = [d[i] for d in decoded]
            yield pd.DataFrame(cols)

    return df.mapInPandas(batches, MP3_SI_SCHEMA)


# ---------------------------------------------------------------------------
# Layer III scalefactors (ISO/IEC 11172-3 §2.4.2.7) — the first MAIN-DATA
# field, one layer below the side info: per-granule scalefactor bit fields
# whose widths come from the scalefac_compress → (slen1, slen2) table and
# whose layout depends on the window mode (21 long bands / 12 short bands
# × 3 windows / the 8+9·3 mixed split), with granule-1 bands skipped per
# the scfsi copy groups. Huffman spectrum decode + MDCT synthesis stay
# behind the documented library-bound stub; scalefactors are fixed-width
# integers, so the parser is exact and replayable. Supported subset kept
# honest: main_data_begin must be 0 (no bit-reservoir backpointer — the
# synth corpus writes none), asserted loudly.
# ---------------------------------------------------------------------------

# scalefac_compress → (slen1, slen2), ISO 11172-3 table B.6
SLEN = (
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
)
# scfsi copy groups over the 21 long scalefactor bands
SCFSI_GROUPS = ((0, 6), (6, 11), (11, 16), (16, 21))


def _sf_layout(wsf: int, bt: int, mixed: int) -> list[tuple[str, int, int]]:
    """Band layout for one granule: list of (kind, band, which_slen)
    rows in bitstream order — kind 'l' long band, 's' short (band
    encodes sfb*4 + window so rows stay unique and SQL-replayable)."""
    if not wsf or bt != 2:
        return [("l", b, 1 if b < 11 else 2) for b in range(21)]
    if mixed:
        rows = [("l", b, 1) for b in range(8)]
        for sfb in range(3, 12):
            for w in range(3):
                rows.append(("s", sfb * 4 + w, 1 if sfb < 6 else 2))
        return rows
    rows = []
    for sfb in range(12):
        for w in range(3):
            rows.append(("s", sfb * 4 + w, 1 if sfb < 6 else 2))
    return rows


def _sf_value(d: int, f: int, g: int, band: int, slen: int) -> int:
    """Synth corpus scalefactor arithmetic — cited by the oracle."""
    return (d + f + g * 7 + band * 3) % (1 << slen) if slen else 0


def synth_mp3_sf(doc_id: int) -> bytes:
    """Deterministic MONO MP3 whose frames carry real side info AND
    real main-data scalefactor fields (main_data_begin = 0, so each
    frame's main data starts right after its side info — the
    no-reservoir subset the parser supports): nf = 2 + doc_id%3 frames;
    granule window mode wsf = ((doc_id + f + g) // 2) % 2 (both-long,
    both-short, and mixed frames all occur), block_type
    1 + (doc_id + f + g) % 3 when switching (short only at 2), mixed
    flag (doc_id + f) % 2; scfsi = (doc_id + f) % 16 when BOTH granules
    are long else 0 (spec: scfsi copies are long-block-only), granule-1
    bands in set scfsi groups omitted from the bitstream; scalefactors
    from _sf_value; part2_3_length = the true scalefactor bit count
    plus an 8 + (doc_id + f + g) % 25 bit filler 'part3' of
    alternating bits."""
    out = bytearray()
    d = doc_id
    n_frames = 2 + d % 3
    sr_idx = d % 3
    for f in range(n_frames):
        br_idx = 1 + (d * 3 + f * 5) % 14
        pad = (d + f) % 2
        ln = frame_length(BITRATE_KBPS[br_idx], SAMPLE_RATES[sr_idx], pad)
        gmeta = []
        for g in (0, 1):
            wsf = ((d + f + g) // 2) % 2
            bt = 1 + (d + f + g) % 3 if wsf else 0
            mixed = (d + f) % 2 if wsf else 0
            gmeta.append((wsf, bt, mixed))
        both_long = all(not w or b != 2 for w, b, _ in gmeta)
        scfsi = (d + f) % 16 if both_long else 0
        main_bits: list[tuple[int, int]] = []
        p23 = []
        for g in (0, 1):
            wsf, bt, mixed = gmeta[g]
            sf_bits = 0
            sfc = (d + f + g) % 16
            s1, s2 = SLEN[sfc]
            for kind, band, which in _sf_layout(wsf, bt, mixed):
                if g == 1 and kind == "l":
                    grp = next(
                        i for i, (lo, hi) in enumerate(SCFSI_GROUPS) if lo <= band < hi
                    )
                    if (scfsi >> (3 - grp)) & 1:
                        continue  # copied from granule 0 — not in stream
                slen = s1 if which == 1 else s2
                if slen:
                    main_bits.append((_sf_value(d, f, g, band, slen), slen))
                sf_bits += slen
            filler = 8 + (d + f + g) % 25
            for i in range(filler):
                main_bits.append((i & 1, 1))
            p23.append(sf_bits + filler)
        # side info: same field layout as synth_mp3_si but with the
        # REAL part2_3_length and this corpus's window metadata
        pairs: list[tuple[int, int]] = [(0, 9), (0, 5), (scfsi, 4)]
        for g in (0, 1):
            wsf, bt, mixed = gmeta[g]
            sfc = (d + f + g) % 16
            pairs += [
                (p23[g], 12),
                ((d * 3 + f + 2 * g) % (MAX_BIG_VALUES + 1), 9),
                ((d * 7 + f * 3 + g) % 256, 8),
                (sfc, 4),
                (wsf, 1),
            ]
            if wsf:
                pairs += [(bt, 2), (mixed, 1)]
                pairs += [((d * 5 + f + g + i) % 32, 5) for i in (0, 1)]
                pairs += [((d + f + g + i) % 8, 3) for i in range(3)]
            else:
                pairs += [((d * 5 + f + g + i) % 32, 5) for i in range(3)]
                pairs += [((d + f) % 16, 4), ((d + g) % 8, 3)]
            pairs += [
                ((d // 3 + f + g) % 2, 1),
                ((d // 5 + f + g) % 2, 1),
                ((d // 7 + f + g) % 2, 1),
            ]
        si = _pack_bits(pairs)
        # main data: bit-packed scalefactors + fillers, byte-padded
        acc, nb = 0, 0
        for val, n in main_bits:
            acc = (acc << n) | val
            nb += n
        padbits = (-nb) % 8
        acc <<= padbits
        nb += padbits
        md = acc.to_bytes(nb // 8, "big") if nb else b""
        body_len = ln - 4 - len(si) - len(md)
        if body_len < 0:
            raise ValueError(f"frame too small for main data at doc {d} frame {f}")
        hdr = bytearray(_header(br_idx, sr_idx, pad))
        hdr[3] = 0b11000000  # mono
        out += hdr + si + md + bytes([(d + f) % 0xFE] * body_len)
    return bytes(out)


def mp3_scalefactors(payload: bytes) -> list[dict]:
    """Walk a MONO, reservoir-free MP3 payload and decode every
    granule's SCALEFACTORS from main data: side info first (reusing
    mp3_side_info's field layout via a fresh parse), then, asserting
    main_data_begin == 0 (the documented no-reservoir subset — a
    nonzero backpointer raises), bit-read each granule's scalefactor
    fields per the window-mode layout with slen widths from the
    scalefac_compress table, honoring scfsi copy groups for granule 1
    (copied bands repeat granule 0's value, consuming no bits), and
    skip the remaining part2_3_length bits as spectrum data. Returns
    one dict per frame: scfsi + per-granule {'long': {band: sf},
    'short': {(sfb, window): sf}, 'part2_bits': n}."""
    frames_si = mp3_side_info(payload)
    # re-walk the frame boundaries to slice main data per frame
    pos = 0
    n = len(payload)
    out: list[dict] = []
    fi = 0
    while pos < n:
        b2 = payload[pos + 2]
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        pad = (b2 >> 1) & 0x01
        ln = frame_length(BITRATE_KBPS[br_idx], SAMPLE_RATES[sr_idx], pad)
        si = frames_si[fi]
        if si["main_data_begin"] != 0:
            raise ValueError(
                "bit-reservoir backpointer unsupported: main_data_begin="
                f"{si['main_data_begin']} at frame {fi} (this walker decodes "
                "the reservoir-free subset)"
            )
        r = _BitReader(payload[pos + 4 + 17 : pos + ln])
        scfsi = si["scfsi"]
        grans = []
        g0_long: dict[int, int] = {}
        for g, gr in enumerate(si["granules"]):
            wsf = gr["window_switching"]
            bt = gr.get("block_type", 0)
            mixed = gr.get("mixed_block", 0)
            s1, s2 = SLEN[gr["scalefac_compress"]]
            longs: dict[int, int] = {}
            shorts: dict[tuple[int, int], int] = {}
            bits_read = 0
            for kind, band, which in _sf_layout(wsf, bt, mixed):
                slen = s1 if which == 1 else s2
                if g == 1 and kind == "l":
                    grp = next(
                        i for i, (lo, hi) in enumerate(SCFSI_GROUPS) if lo <= band < hi
                    )
                    if (scfsi >> (3 - grp)) & 1:
                        if wsf and bt == 2:
                            raise ValueError(
                                f"scfsi copy into short-block granule at frame {fi}"
                            )
                        longs[band] = g0_long[band]
                        continue
                v = r.get(slen) if slen else 0
                bits_read += slen
                if kind == "l":
                    longs[band] = v
                else:
                    shorts[(band // 4, band % 4)] = v
            if g == 0:
                g0_long = longs
            part3 = gr["part2_3_length"] - bits_read
            if part3 < 0:
                raise ValueError(
                    f"part2_3_length {gr['part2_3_length']} smaller than "
                    f"scalefactor bits {bits_read} at frame {fi} g{g}"
                )
            r.pos += part3  # spectrum (Huffman) data — not decoded here
            grans.append(
                {"long": longs, "short": shorts, "part2_bits": bits_read}
            )
        out.append({"scfsi": scfsi, "granules": grans})
        pos += ln
        fi += 1
    return out


MP3_SF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_long_granules", T.LongType()),
        T.StructField("n_short_granules", T.LongType()),
        T.StructField("n_mixed_granules", T.LongType()),
        T.StructField("sum_long_sf", T.LongType()),
        T.StructField("sum_short_sf", T.LongType()),
        T.StructField("n_copied_bands", T.LongType()),
        T.StructField("sum_part2_bits", T.LongType()),
        T.StructField("sum_scfsi", T.LongType()),
    ]
)


def _sf_stats(payload: bytes) -> tuple:
    si = mp3_side_info(payload)
    sf = mp3_scalefactors(payload)
    n_long = n_short = n_mixed = 0
    sum_long = sum_short = copied = part2 = 0
    for fsi, fsf in zip(si, sf):
        for g, (gsi, gsf) in enumerate(zip(fsi["granules"], fsf["granules"])):
            wsf = gsi["window_switching"]
            bt = gsi.get("block_type", 0)
            mixed = gsi.get("mixed_block", 0)
            if not wsf or bt != 2:
                n_long += 1
            elif mixed:
                n_mixed += 1
            else:
                n_short += 1
            sum_long += sum(gsf["long"].values())
            sum_short += sum(gsf["short"].values())
            part2 += gsf["part2_bits"]
            if g == 1 and (not wsf or bt != 2):
                for grp, (lo, hi) in enumerate(SCFSI_GROUPS):
                    if (fsf["scfsi"] >> (3 - grp)) & 1:
                        copied += hi - lo
    return (
        len(sf),
        n_long,
        n_short,
        n_mixed,
        sum_long,
        sum_short,
        copied,
        part2,
        sum(f["scfsi"] for f in sf),
    )


def attach_mp3_sf(df: DataFrame) -> DataFrame:
    """Synthesize the scalefactor-corpus MP3 payload column in Arrow
    batches — attach_mp3_si's sibling fixture stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [synth_mp3_sf(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return fan_out_scan(df.select("doc_id"), "doc_id").mapInPandas(batches, schema)


def mp3_scalefactor_features(df: DataFrame) -> DataFrame:
    """Scalefactor-walk a binary MP3 column via mapInPandas: 1 blob in
    → 1 integer-stats row out, map-only, zero shuffle."""
    names = [f.name for f in MP3_SF_SCHEMA.fields[1:]]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_sf_stats(bytes(p)) for p in pdf["media"]]
            cols = {"doc_id": pdf["doc_id"]}
            for i, nm in enumerate(names):
                cols[nm] = [x[i] for x in decoded]
            yield pd.DataFrame(cols)

    return df.mapInPandas(batches, MP3_SF_SCHEMA)


# ---------------------------------------------------------------------------
# Layer III HUFFMAN big-values + count1 decode (r12) — one layer below the
# scalefactor walk, completing the Layer III chain short of MDCT synthesis
# (which stays the documented library-bound line). Reference parity:
# v2/core (no equivalent — beyond-reference multimodal family); spec: ISO
# 11172-3 §2.4.2.7 (region partitioning via Table B.8 scalefactor-band
# boundaries) and Table B.7 (Huffman code tables).
#
# Supported subset, loudly bounded: mono, main_data_begin = 0 (no bit
# reservoir), LONG blocks only in the Huffman region (short/mixed region
# partitioning raises), big-values Huffman tables 0 (zero region, no
# bits) and 1 (the 2x2 no-linbits table) — table_select 2..31 raises —
# and count1 table B (the fixed 4-bit quadruple code); count1 table A
# raises. Every gate is a raise, never a silent zero.
# ---------------------------------------------------------------------------

# Table B.7 Huffman code table 1: (x, y) -> (hlen, hcod). xlen=ylen=2,
# no linbits. Complete prefix code (Kraft sum == 1, property-tested).
HUFF_TABLE_1 = {
    (0, 0): (1, 0b1),
    (0, 1): (3, 0b001),
    (1, 0): (2, 0b01),
    (1, 1): (3, 0b000),
}
# count1 table B (count1table_select = 1): all 16 (v,w,x,y) quadruples
# at 4 bits, hcod = 15 - (v<<3 | w<<2 | x<<1 | y).
COUNT1_TABLE_B = {
    ((n >> 3) & 1, (n >> 2) & 1, (n >> 1) & 1, n & 1): (4, 15 - n)
    for n in range(16)
}
# decode maps: (hlen, hcod) -> symbol
_HUFF1_DEC = {v: k for k, v in HUFF_TABLE_1.items()}
_COUNT1B_DEC = {v: k for k, v in COUNT1_TABLE_B.items()}
_HUFF_MAX_LEN = 4

# Table B.8 long-block scalefactor-band sample boundaries, MPEG-1, by
# header sr_idx (0=44.1 kHz, 1=48 kHz, 2=32 kHz); 22 bands -> 23 edges,
# last edge 576. Region0 ends at edge[region0_count+1], region1 at
# edge[region0_count+region1_count+2] (long blocks, §2.4.2.7).
SFB_LONG_BOUNDS = (
    (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
     162, 196, 238, 288, 342, 418, 576),
    (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
     156, 190, 230, 276, 330, 384, 576),
    (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
     194, 240, 296, 364, 448, 550, 576),
)


def _hf_pair(d: int, f: int, g: int, i: int) -> tuple[int, int, int, int]:
    """Synth corpus big-values pair arithmetic for pair i: (x, y,
    sign_x, sign_y) with x,y in {0,1} and sign 1 = negative — cited by
    the oracle replay."""
    return (
        (d + f + g + i) % 2,
        (d + 3 * f + i) % 2,
        (d + i) % 2,
        (f + i) % 2,
    )


def _hf_quad(d: int, f: int, g: int, i: int) -> tuple:
    """Synth corpus count1 quadruple arithmetic for quad i: four values
    in {0,1} plus four sign bits (applied only to nonzero values)."""
    vals = ((d + i) % 2, (f + i) % 2, (g + i) % 2, (d + f + i) % 2)
    signs = tuple((d + f + g + i + p) % 2 for p in range(4))
    return vals, signs


def _hf_dims(d: int, f: int, g: int) -> dict:
    """Per-granule Huffman-corpus side-info arithmetic (long blocks
    only) — one place for synth, tests, and the oracle replay."""
    return {
        "bv": (d * 3 + f + 2 * g) % 17,
        "r0": (d + f + g) % 4,
        "r1": (d + 2 * f + g) % 4,
        "ts": ((d + f + g) % 2, (d + f) % 2, (d + g) % 2),
        "nq": (d + f + g) % 5,
        "sfc": (d + f + g) % 16,
        "gg": (d * 7 + f * 3 + g) % 256,
    }


def synth_mp3_hf(doc_id: int) -> bytes:
    """Deterministic MONO MP3 whose main data carries real scalefactor
    fields AND a real Huffman-coded spectrum region: nf = 2 + doc_id%3
    frames x 2 long-block granules; per granule, big_values pairs from
    _hf_pair coded with Table B.7 table 1 in table-1 regions (table-0
    regions emit no bits and decode to zeros), region boundaries from
    region0/1_count via Table B.8, then nq count1 quadruples from
    _hf_quad coded with count1 table B; part2_3_length is the EXACT
    scalefactor + Huffman bit count, so the decoder must land on the
    boundary bit-perfectly or fail."""
    out = bytearray()
    d = doc_id
    n_frames = 2 + d % 3
    sr_idx = d % 3
    bounds = SFB_LONG_BOUNDS[sr_idx]
    for f in range(n_frames):
        br_idx = 9 + (d + f) % 5
        pad = (d + f) % 2
        ln = frame_length(BITRATE_KBPS[br_idx], SAMPLE_RATES[sr_idx], pad)
        main_bits: list[tuple[int, int]] = []
        p23 = []
        gdims = []
        for g in (0, 1):
            dims = _hf_dims(d, f, g)
            gdims.append(dims)
            bits = 0
            s1, s2 = SLEN[dims["sfc"]]
            for band in range(21):
                slen = s1 if band < 11 else s2
                if slen:
                    main_bits.append((_sf_value(d, f, g, band, slen), slen))
                bits += slen
            b0 = min(dims["bv"], bounds[dims["r0"] + 1] // 2)
            b1 = min(dims["bv"], bounds[dims["r0"] + dims["r1"] + 2] // 2)
            for i in range(dims["bv"]):
                region = 0 if i < b0 else (1 if i < b1 else 2)
                tsel = dims["ts"][region]
                if tsel == 0:
                    continue  # zero region: no bits in the stream
                x, y, sx, sy = _hf_pair(d, f, g, i)
                hlen, hcod = HUFF_TABLE_1[(x, y)]
                main_bits.append((hcod, hlen))
                bits += hlen
                if x:
                    main_bits.append((sx, 1))
                    bits += 1
                if y:
                    main_bits.append((sy, 1))
                    bits += 1
            for i in range(dims["nq"]):
                vals, signs = _hf_quad(d, f, g, i)
                hlen, hcod = COUNT1_TABLE_B[vals]
                main_bits.append((hcod, hlen))
                bits += hlen
                for v, s in zip(vals, signs):
                    if v:
                        main_bits.append((s, 1))
                        bits += 1
            if dims["bv"] * 2 + dims["nq"] * 4 > 576:
                raise ValueError("corpus granule exceeds 576 samples")
            p23.append(bits)
        # side info: long-block layout, scfsi 0, count1table_select 1
        pairs: list[tuple[int, int]] = [(0, 9), (0, 5), (0, 4)]
        for g in (0, 1):
            dims = gdims[g]
            pairs += [
                (p23[g], 12),
                (dims["bv"], 9),
                (dims["gg"], 8),
                (dims["sfc"], 4),
                (0, 1),  # window_switching = 0: long block
            ]
            pairs += [(t, 5) for t in dims["ts"]]
            pairs += [(dims["r0"], 4), (dims["r1"], 3)]
            pairs += [(0, 1), (0, 1), (1, 1)]  # preflag, sf_scale, count1 B
        si = _pack_bits(pairs)
        acc, nb = 0, 0
        for val, n in main_bits:
            acc = (acc << n) | val
            nb += n
        padbits = (-nb) % 8
        acc <<= padbits
        nb += padbits
        md = acc.to_bytes(nb // 8, "big") if nb else b""
        body_len = ln - 4 - len(si) - len(md)
        if body_len < 0:
            raise ValueError(f"frame too small for main data at doc {d} frame {f}")
        hdr = bytearray(_header(br_idx, sr_idx, pad))
        hdr[3] = 0b11000000  # mono
        out += hdr + si + md + bytes([(d + f) % 0xFE] * body_len)
    return bytes(out)


def _read_huffman(r: "_BitReader", dec: dict) -> tuple:
    """Walk one codeword MSB-first through a (hlen, hcod) -> symbol
    map; raises on a code absent from the table (corrupt stream or an
    unsupported table — the loud gate)."""
    code, ln = 0, 0
    while ln <= _HUFF_MAX_LEN:
        code = (code << 1) | r.get(1)
        ln += 1
        sym = dec.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError(f"no Huffman codeword matches prefix {code:0{ln}b}")


def mp3_huffman(payload: bytes) -> list[dict]:
    """Walk a MONO, reservoir-free MP3 payload and decode every
    granule's HUFFMAN-CODED spectrum: side info, then scalefactors
    (long-block layout), then the big-values region pair-by-pair with
    the region's selected table (region edges from Table B.8 and
    region0/1_count), sign bits after each nonzero, then count1
    quadruples with table B until part2_3_length is exhausted — the
    decode must consume EXACTLY part2_3_length bits or the walk raises.
    Returns one dict per frame: per-granule {'coeffs': [(idx, val)...]
    for nonzeros, 'n_pairs': (r0, r1, r2), 'n_quads': n,
    'huff_bits': n, 'sf_bits': n}."""
    frames_si = mp3_side_info(payload)
    pos = 0
    n = len(payload)
    out: list[dict] = []
    fi = 0
    while pos < n:
        b2 = payload[pos + 2]
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        pad = (b2 >> 1) & 0x01
        ln = frame_length(BITRATE_KBPS[br_idx], SAMPLE_RATES[sr_idx], pad)
        si = frames_si[fi]
        if si["main_data_begin"] != 0:
            raise ValueError(
                f"bit-reservoir backpointer unsupported at frame {fi}"
            )
        bounds = SFB_LONG_BOUNDS[sr_idx]
        r = _BitReader(payload[pos + 4 + 17 : pos + ln])
        grans = []
        for g, gr in enumerate(si["granules"]):
            if gr["window_switching"]:
                raise ValueError(
                    "short/mixed-block Huffman region partitioning "
                    f"unsupported at frame {fi} g{g} (long-only subset)"
                )
            start = r.pos
            s1, s2 = SLEN[gr["scalefac_compress"]]
            scfsi = si["scfsi"]
            for band in range(21):
                slen = s1 if band < 11 else s2
                if g == 1 and scfsi:
                    grp = next(
                        i
                        for i, (lo, hi) in enumerate(SCFSI_GROUPS)
                        if lo <= band < hi
                    )
                    if (scfsi >> (3 - grp)) & 1:
                        continue
                r.pos += slen
            sf_bits = r.pos - start
            p23 = gr["part2_3_length"]
            bv = gr["big_values"]
            r0, r1 = gr["region0_count"], gr["region1_count"]
            b0 = min(bv, bounds[r0 + 1] // 2)
            b1 = min(bv, bounds[r0 + r1 + 2] // 2)
            coeffs: list[tuple[int, int]] = []
            n_pairs = [0, 0, 0]
            for i in range(bv):
                region = 0 if i < b0 else (1 if i < b1 else 2)
                n_pairs[region] += 1
                tsel = gr["table_select"][region]
                if tsel == 0:
                    continue
                if tsel != 1:
                    raise ValueError(
                        f"Huffman table {tsel} unsupported (tables 0 and 1 "
                        f"only — the documented subset) at frame {fi} g{g}"
                    )
                x, y = _read_huffman(r, _HUFF1_DEC)
                if x:
                    if r.get(1):
                        x = -x
                    coeffs.append((2 * i, x))
                if y:
                    if r.get(1):
                        y = -y
                    coeffs.append((2 * i + 1, y))
                if r.pos - start > p23:
                    raise ValueError(
                        f"big-values decode overran part2_3_length at "
                        f"frame {fi} g{g}"
                    )
            if gr["count1table_select"] != 1:
                raise ValueError(
                    "count1 table A unsupported (table B only — the "
                    f"documented subset) at frame {fi} g{g}"
                )
            n_quads = 0
            sample = 2 * bv
            while r.pos - start < p23:
                if sample + 4 > 576:
                    raise ValueError(
                        f"count1 region past 576 samples at frame {fi} g{g}"
                    )
                vals = _read_huffman(r, _COUNT1B_DEC)
                for k, v in enumerate(vals):
                    if v:
                        if r.get(1):
                            v = -v
                        coeffs.append((sample + k, v))
                sample += 4
                n_quads += 1
            if r.pos - start != p23:
                raise ValueError(
                    f"granule consumed {r.pos - start} bits, part2_3_length "
                    f"says {p23} at frame {fi} g{g}"
                )
            grans.append(
                {
                    "coeffs": coeffs,
                    "n_pairs": tuple(n_pairs),
                    "n_quads": n_quads,
                    "huff_bits": p23 - sf_bits,
                    "sf_bits": sf_bits,
                }
            )
        out.append({"granules": grans})
        pos += ln
        fi += 1
    return out


MP3_HF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sum_big_values", T.LongType()),
        T.StructField("sum_r0_pairs", T.LongType()),
        T.StructField("sum_r1_pairs", T.LongType()),
        T.StructField("sum_r2_pairs", T.LongType()),
        T.StructField("sum_abs_coeff", T.LongType()),
        T.StructField("n_neg_coeff", T.LongType()),
        T.StructField("sum_quads", T.LongType()),
        T.StructField("sum_huff_bits", T.LongType()),
        T.StructField("sum_sf_bits", T.LongType()),
        T.StructField("coeff_checksum", T.LongType()),
    ]
)


def _hf_stats(payload: bytes) -> tuple:
    si = mp3_side_info(payload)
    hf = mp3_huffman(payload)
    sum_bv = r0p = r1p = r2p = sabs = nneg = quads = hbits = sfbits = 0
    chk = 0
    for fsi, fhf in zip(si, hf):
        for gsi, ghf in zip(fsi["granules"], fhf["granules"]):
            sum_bv += gsi["big_values"]
            a, b, c = ghf["n_pairs"]
            r0p += a
            r1p += b
            r2p += c
            for idx, v in ghf["coeffs"]:
                sabs += abs(v)
                if v < 0:
                    nneg += 1
                # order-sensitive checksum: a misplaced coefficient moves it
                chk = (chk + (idx + 1) * (v + 3)) % 1_000_003
            quads += ghf["n_quads"]
            hbits += ghf["huff_bits"]
            sfbits += ghf["sf_bits"]
    return (
        len(hf), sum_bv, r0p, r1p, r2p, sabs, nneg, quads, hbits, sfbits, chk
    )


def attach_mp3_hf(df: DataFrame) -> DataFrame:
    """Synthesize the Huffman-corpus MP3 payload column in Arrow
    batches — attach_mp3_sf's sibling fixture stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [synth_mp3_hf(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("media", T.BinaryType())]
    )
    return fan_out_scan(df.select("doc_id"), "doc_id").mapInPandas(batches, schema)


def mp3_huffman_features(df: DataFrame) -> DataFrame:
    """Huffman-walk a binary MP3 column via mapInPandas: 1 blob in →
    1 integer-stats row out, map-only, zero shuffle."""
    names = [f.name for f in MP3_HF_SCHEMA.fields[1:]]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_hf_stats(bytes(p)) for p in pdf["media"]]
            cols = {"doc_id": pdf["doc_id"]}
            for i, nm in enumerate(names):
                cols[nm] = [x[i] for x in decoded]
            yield pd.DataFrame(cols)

    return df.mapInPandas(batches, MP3_HF_SCHEMA)
