"""Multimodal plumbing query: binary payloads + mapInPandas feature
extraction, oracle-checked because the fake decode is md5-deterministic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.multimodal import (
    AUDIO_FRAME_WINDOW,
    FRAME_BYTES,
    RESIZE_H,
    RESIZE_W,
    WAV_RATE,
    attach_avi,
    attach_binary,
    attach_bmp,
    attach_gif,
    attach_png,
    attach_ppm,
    attach_tiff,
    attach_wav,
    decode_avi_features,
    decode_bmp_features,
    decode_gif_features,
    decode_png_features,
    decode_ppm_features,
    decode_tiff_features,
    decode_wav_features,
    extract_features,
    frame_audio_windows,
    resize_ppm_features,
    sample_frames,
)
from python_multiproc_bigdata_spark.operators.jpeg import (
    attach_jpeg,
    attach_jpeg_sub,
    decode_jpeg_features,
)
from python_multiproc_bigdata_spark.operators.mp3 import (
    attach_mp3,
    attach_mp3_si,
    mp3_frame_features,
    mp3_sideinfo_features,
)
from python_multiproc_bigdata_spark.operators.mp4 import (
    attach_mp4,
    decode_mp4_features,
)
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(prep(spark), sf_dir, "documents")
    return extract_features(attach_binary(d, "text", kind="image"))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N mapInPandas frame sampling: every 2nd FRAME_BYTES-byte chunk,
    max 4 per doc, keyed by the original frame index. Oracle reproduces
    the chunking with character slicing — valid because the documents
    corpus is pure ASCII (octet_length == length for every row), so byte
    offsets and char offsets coincide."""
    d = table(prep(spark), sf_dir, "documents")
    return sample_frames(attach_binary(d, "text", kind="video"), every_n=2, max_frames=4)


# The fake decode is width = int(md5[:4],16) % 1024, height = int(md5[4:8],16) % 1024
# over the utf-8 payload; md5 of the text is identical in DuckDB.
SQL_MULTIMODAL = """
SELECT doc_id,
       'image' AS kind,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest,
       ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024 AS width,
       ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024 AS height
FROM documents
"""


SQL_FRAME_SAMPLE = f"""
WITH chunks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
         substring(text, CAST(i * {FRAME_BYTES} + 1 AS INTEGER), {FRAME_BYTES}) AS fr
  FROM (SELECT doc_id, text,
               unnest(range(CAST(ceil(length(text) / {FRAME_BYTES}.0) AS INTEGER))) AS i
        FROM documents)
  WHERE i % 2 = 0 AND i // 2 < 4
)
SELECT doc_id, frame_idx, length(fr) AS n_frame_bytes, md5(fr) AS frame_digest
FROM chunks
"""


def multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over a binary column: synthesize P6 PPM bytes
    per document (deterministic header + comment + arithmetic raster,
    operators/multimodal.py:synth_ppm), then PARSE them back with the
    real struct decoder (decode_ppm: magic, comment-skipping header
    tokenizer, raster validation, numpy channel sums) in a second
    mapInPandas stage that sees only opaque bytes. The oracle replays
    the raster arithmetic — (doc_id·31 + i·7) mod 256 over unnested
    pixel indices — in pure SQL, so the decoder's output is value-checked
    end-to-end. Integer channel SUMS, not float means: bit-exact parity."""
    d = table(prep(spark), sf_dir, "documents")
    # r13: microsecond-per-row rollup — skip the fan-out exchange
    # (guide §2.5; the r12 unconditional fan cost 2-3x the decode here).
    return decode_ppm_features(attach_ppm(d, wide=False))


# Replays synth_ppm's arithmetic: w = 4 + doc_id%5, h = 3 + doc_id%4,
# raster byte i = (doc_id*31 + i*7) % 256, channel = i % 3. DuckDB sums
# promote to HUGEINT — cast back to BIGINT to match Spark's LongType.
SQL_DECODE_PPM = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, unnest(range(3 * w * h)) AS i FROM dims
), v AS (
  SELECT doc_id, w, h, i % 3 AS ch, (doc_id * 31 + i * 7) % 256 AS v FROM px
)
SELECT doc_id,
       w AS width,
       h AS height,
       CAST(255 AS BIGINT) AS maxval,
       w * h AS n_pixels,
       CAST(sum(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN ch = 2 THEN v END) AS BIGINT) AS sum_b
FROM v
GROUP BY doc_id, w, h
"""


def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode over a binary column — the PPM decoder's RIFF
    sibling: synthesize WAVE bytes per document (deterministic LIST +
    fmt + data chunks, PCM16 interleaved samples, operators/
    multimodal.py:synth_wav), then PARSE them back with the real chunk
    walker (decode_wav: magic + RIFF size checks, odd-chunk pad rule,
    fmt validation, numpy int16 stats) in a second mapInPandas stage
    that sees only opaque bytes. The oracle replays the sample
    arithmetic — ((doc_id·37 + i·11) mod 4001) − 2000 over unnested
    sample indices — in pure SQL. Integer sums/peaks, not float RMS:
    bit-exact parity."""
    d = table(prep(spark), sf_dir, "documents")
    # r13: wide=False as in multimodal_decode_ppm.
    return decode_wav_features(attach_wav(d, wide=False))


# Replays synth_wav's arithmetic: n_channels = 1 + doc_id%2, n_frames =
# 20 + doc_id%13, interleaved sample i = ((doc_id*37 + i*11) % 4001) - 2000.
# DuckDB sums promote to HUGEINT — cast back to BIGINT to match LongType.
SQL_DECODE_WAV = f"""
WITH dims AS (
  SELECT doc_id, 1 + doc_id % 2 AS n_channels, 20 + doc_id % 13 AS n_frames
  FROM documents
), idx AS (
  SELECT doc_id, n_channels, n_frames, unnest(range(n_channels * n_frames)) AS i
  FROM dims
), s AS (
  SELECT doc_id, n_channels, n_frames,
         (doc_id * 37 + i * 11) % 4001 - 2000 AS v
  FROM idx
)
SELECT doc_id,
       CAST({WAV_RATE} AS BIGINT) AS sample_rate,
       n_channels,
       n_frames,
       n_frames * 1000 // {WAV_RATE} AS duration_ms,
       CAST(sum(v) AS BIGINT) AS sum_samples,
       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
       CAST(max(abs(v)) AS BIGINT) AS peak
FROM s
GROUP BY doc_id, n_channels, n_frames
"""


def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Short-time audio features over the decoded WAV column: per
    (doc, channel, 8-frame window) integer energy (sum of squares) and
    zero-crossing count — the framing/energy/ZCR front-end a VAD or
    MFCC pipeline runs right after decode, and the 1→N explosion shape
    (row per analysis window) that distinguishes it from
    multimodal_decode_wav's whole-file rollup. Real chunk-walk decode
    (operators/multimodal.py:wav_samples) in mapInPandas; the oracle
    replays synth_wav's interleaved-sample arithmetic per (channel,
    frame) index and the same window/sign rules in pure SQL — all
    integers, bit-exact."""
    d = table(prep(spark), sf_dir, "documents")
    return frame_audio_windows(attach_wav(d))


# Replays synth_wav: sample at interleaved index i = j*n_ch + c is
# ((doc_id*37 + i*11) % 4001) - 2000; window = j // W; a zero crossing
# is a sign flip ((v>=0) != (vprev>=0)) between consecutive frames of
# the SAME channel inside one window (j % W != 0).
SQL_AUDIO_FRAMES = f"""
WITH dims AS (
  SELECT doc_id, 1 + doc_id % 2 AS n_ch, 20 + doc_id % 13 AS n_frames
  FROM documents
), ch AS (
  SELECT doc_id, n_ch, n_frames, unnest(range(n_ch)) AS c FROM dims
), fr AS (
  SELECT doc_id, n_ch, c, unnest(range(n_frames)) AS j FROM ch
), v AS (
  SELECT doc_id, c, j, j // {AUDIO_FRAME_WINDOW} AS win,
         (doc_id * 37 + (j * n_ch + c) * 11) % 4001 - 2000 AS v,
         CASE WHEN j % {AUDIO_FRAME_WINDOW} != 0
              THEN (doc_id * 37 + ((j - 1) * n_ch + c) * 11) % 4001 - 2000
         END AS vprev
  FROM fr
)
SELECT doc_id, CAST(c AS INTEGER) AS channel, CAST(win AS INTEGER) AS win,
       CAST(count(*) AS INTEGER) AS n_samps,
       CAST(sum(v * v) AS BIGINT) AS energy,
       CAST(sum(CASE WHEN vprev IS NOT NULL AND ((v >= 0) != (vprev >= 0))
                     THEN 1 ELSE 0 END) AS INTEGER) AS zcr
FROM v GROUP BY doc_id, c, win
"""


def multimodal_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: decode each synthesized P6 raster and
    nearest-neighbor resample to 8×8 (operators/multimodal.py:
    resize_ppm_features — upgraded from the byte-truncation stand-in),
    emitting integer channel sums of the RESIZED raster. The oracle
    replays the full chain in SQL — synth arithmetic, the floor-index
    NN mapping sx=(tx·w)//8, and the channel sums — so the resample
    itself is value-checked, not just the plumbing."""
    d = table(prep(spark), sf_dir, "documents")
    # r13: wide=False as in multimodal_decode_ppm.
    return resize_ppm_features(attach_ppm(d, wide=False))


SQL_RESIZE_PPM = f"""
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
), grid AS (
  SELECT doc_id, w, h, unnest(range({RESIZE_W * RESIZE_H})) AS t FROM dims
), mapped AS (
  SELECT doc_id, w, h,
         ((t // {RESIZE_W}) * h // {RESIZE_H}) * w
           + ((t % {RESIZE_W}) * w // {RESIZE_W}) AS i
  FROM grid
), px AS (
  SELECT doc_id, w, h,
         (doc_id * 31 + (3 * i + 0) * 7) % 256 AS r,
         (doc_id * 31 + (3 * i + 1) * 7) % 256 AS g,
         (doc_id * 31 + (3 * i + 2) * 7) % 256 AS b
  FROM mapped
)
SELECT doc_id,
       CAST(w AS INTEGER) AS src_w, CAST(h AS INTEGER) AS src_h,
       CAST({RESIZE_W} AS INTEGER) AS dst_w, CAST({RESIZE_H} AS INTEGER) AS dst_h,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id, w, h
"""


AHASH_HAMMING_MAX = 3  # lossless under the 4-band pigeonhole guarantee


def multimodal_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup via average-hash + banded Hamming join
    — the image twin of MinHash-LSH text dedup and the dedup pass a
    multimodal training pipeline runs on its image corpus: REAL P6
    decode → 8x8 NN resample → integer grayscale → 64-bit aHash packed
    as 4x16-bit bands (operators/multimodal.py:ahash_bands), candidates
    from EQUAL-BAND buckets (never all-pairs: 3 differing bits can
    touch at most 3 of 4 bands, so every Hamming<=3 pair shares a band
    — the candidate set is provably complete), verified by exact XOR
    popcount over the 4 band values. The synthetic rasters repeat every
    lcm(5,4,256)=1280 doc_ids, so true duplicate images exist in-corpus
    by construction. The oracle replays synth arithmetic, the resize
    mapping, grayscale, bit packing, banding, and popcount in pure SQL
    — all integers, bit-exact.

    Scale note: runtime is OUTPUT-bound — qualifying pairs grow
    quadratically in duplicate-group size (measured 239 rows at sf0.01
    vs 41,970 at sf0.1 against a 5.6x runtime step, i.e. per-pair cost
    falls), and the banded candidate set equals the qualifying set. A
    100 TB deployment emits per-image cluster assignments instead of
    pairs (the dedup_keep_best_per_cluster shape) to keep output
    linear in corpus size."""
    from python_multiproc_bigdata_spark.operators.multimodal import (
        ahash_bands,
        ahash_neardup_pairs,
    )

    d = table(prep(spark), sf_dir, "documents")
    # the 4-rows-per-image band relation feeds both sides of the
    # candidate join and both verify lookups — localCheckpoint instead
    # of 4x decode+resample (it is the signature table an indexed
    # deployment materializes; no persist to leak)
    bands = ahash_bands(attach_ppm(d)).localCheckpoint(eager=True)
    return ahash_neardup_pairs(bands, max_hamming=AHASH_HAMMING_MAX)


# Replays the full aHash chain on synth_ppm's arithmetic: the
# SQL_RESIZE_PPM floor-index NN mapping, grayscale (r+g+b)//3, bit t =
# [64*g_t > sum(g)] (cross-multiplied), 4x16-bit band packing, banded
# candidates, XOR popcount verify. DuckDB bit_count returns TINYINT —
# cast before summing.
SQL_IMAGE_AHASH_NEARDUP = f"""
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
), grid AS (
  SELECT doc_id, w, h, unnest(range({RESIZE_W * RESIZE_H})) AS t FROM dims
), mapped AS (
  SELECT doc_id, t,
         ((t // {RESIZE_W}) * h // {RESIZE_H}) * w
           + ((t % {RESIZE_W}) * w // {RESIZE_W}) AS i
  FROM grid
), gray AS (
  SELECT doc_id, t,
         (((doc_id * 31 + (3 * i + 0) * 7) % 256)
          + ((doc_id * 31 + (3 * i + 1) * 7) % 256)
          + ((doc_id * 31 + (3 * i + 2) * 7) % 256)) // 3 AS g
  FROM mapped
), bits AS (
  SELECT doc_id, t,
         CASE WHEN {RESIZE_W * RESIZE_H} * g > sum(g) OVER (PARTITION BY doc_id)
              THEN 1 ELSE 0 END AS bit
  FROM gray
), bands AS (
  SELECT doc_id, CAST(t // 16 AS INTEGER) AS band_idx,
         CAST(sum(bit * (1 << (t % 16))) AS BIGINT) AS band_val
  FROM bits GROUP BY doc_id, band_idx
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
  WHERE a.doc_id < b.doc_id
), ham AS (
  SELECT c.doc_a, c.doc_b,
         CAST(sum(CAST(bit_count(xor(x.band_val, y.band_val)) AS INTEGER))
              AS INTEGER) AS hamming
  FROM cand c
  JOIN bands x ON x.doc_id = c.doc_a
  JOIN bands y ON y.doc_id = c.doc_b AND y.band_idx = x.band_idx
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= {AHASH_HAMMING_MAX}
"""


def multimodal_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup via DCT-hash (pHash) + banded Hamming
    join (r10) — the frequency-domain sibling of the aHash query:
    decode → 32x32 NN resample → integer grayscale → FIXED-POINT 2D
    DCT (operators/multimodal.py:dct32_int — integer coefficients so
    the median threshold is engine-exact) → 64-bit low-frequency
    signature packed as 4x16-bit bands → the same provably-complete
    equal-band candidate join + exact XOR-popcount verify as aHash.
    The two hashes catch different near-dup classes (aHash: luminance
    layout; pHash: spectral shape — robust to brightness shifts and
    high-frequency noise), which is why image-dedup pipelines run
    both.

    Oracle: GENERATED — an independent pure-Python replay (its own
    loop-based fixed-point DCT, no numpy matmuls, no shared hashing
    code) reconstructs every raster from the synth arithmetic, hashes,
    and emits all qualifying pairs as a VALUES literal."""
    from python_multiproc_bigdata_spark.operators.multimodal import (
        ahash_neardup_pairs,
        attach_ppm,
        phash_bands,
    )

    d = table(prep(spark), sf_dir, "documents")
    bands = phash_bands(attach_ppm(d)).localCheckpoint(eager=True)
    return ahash_neardup_pairs(bands, max_hamming=AHASH_HAMMING_MAX)


def make_phash_oracle() -> str:
    """Independent single-node pHash replay: rebuild each raster from
    synth_ppm's documented arithmetic (byte i = (doc_id·31 + i·7) mod
    256, w = 4+doc_id%5, h = 3+doc_id%4), NN-resample with the
    floor-index mapping, grayscale (r+g+b)//3, fixed-point DCT via
    plain nested loops over an inline cos table (same rounding formula
    as dct32_int but none of its code), median-of-63 threshold, 64-bit
    hash, all-pairs popcount — banding is deliberately NOT replayed:
    emitting every Hamming<=3 pair from the full pair space is exactly
    the completeness claim the banded join must match."""
    import math
    import os

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    n = 32
    scale = 1 << 14
    c = [
        [
            round(
                (math.sqrt(1.0 / n) if u == 0 else math.sqrt(2.0 / n))
                * math.cos((2 * x + 1) * u * math.pi / (2 * n))
                * scale
            )
            for x in range(n)
        ]
        for u in range(8)
    ]
    hashes: dict[int, int] = {}
    for doc_id in ids:
        w = 4 + doc_id % 5
        h = 3 + doc_id % 4
        gray = [
            [
                sum((doc_id * 31 + (3 * (yy * w + xx) + ch) * 7) % 256 for ch in range(3)) // 3
                for xx in ((x * w) // n for x in range(n))
            ]
            for yy in ((y * h) // n for y in range(n))
        ]
        t = [[sum(gray[y][x] * c[v][x] for x in range(n)) for v in range(8)] for y in range(n)]
        d8 = [sum(c[u][y] * t[y][v] for y in range(n)) for u in range(8) for v in range(8)]
        thr = sorted(d8[1:])[31]
        bits = 0
        for pos, val in enumerate(d8):
            if val > thr:
                bits |= 1 << pos
        hashes[doc_id] = bits
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= AHASH_HAMMING_MAX:
                rows.append((a, b, ham))
    if not rows:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_a, CAST(NULL AS BIGINT) AS doc_b,"
            " CAST(NULL AS INTEGER) AS hamming WHERE FALSE"
        )
    values = ",\n".join(f"({a}, {b}, {hm})" for a, b, hm in rows)
    return (
        "SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,"
        " CAST(hamming AS INTEGER) AS hamming\n"
        f"FROM (VALUES {values}) AS t(doc_a, doc_b, hamming)"
    )


def multimodal_video_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video shot-boundary detection (r10) — the scene segmentation a
    video-ingest pipeline runs before per-shot frame sampling: REAL
    RIFF/AVI container decode (operators/multimodal.py:avi_frames),
    then per consecutive-frame pair the total CIRCULAR per-channel
    pixel distance, boundary where the per-cell mean exceeds the
    threshold. The scene-structured corpus (synth_avi_shots) drifts +3
    per value inside 4-frame scenes and jumps 88 at cuts — both
    constant across pixels by construction, so the oracle states the
    expected distances in CLOSED FORM while the Spark side must earn
    them from actual decoded pixels (any decoder/raster/stride slip
    changes the sums). Map-only, 1 blob → n_frames−1 rows."""
    from python_multiproc_bigdata_spark.operators.multimodal import (
        attach_avi_shots,
        avi_shot_transitions,
    )

    d = table(prep(spark), sf_dir, "documents")
    return avi_shot_transitions(attach_avi_shots(d))


# Closed-form replay of synth_avi_shots: the pixel formula is additive
# in pixel index and channel, so every cell of transition f shares the
# same circular delta — 3·(f%4−(f−1)%4) + 97·(f//4−(f−1)//4) mod 256 —
# and dist = circ(delta) · w·h·3. The Spark side computes the same
# numbers from decoded rasters.
SQL_VIDEO_SHOTS = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 3 AS w, 3 + doc_id % 2 AS h,
         8 + doc_id % 5 AS nf
  FROM documents
), tr AS (
  SELECT doc_id, w, h, CAST(unnest(range(1, nf)) AS INTEGER) AS f FROM dims
), d AS (
  SELECT doc_id, w, h, f,
         ((97 * ((f // 4) - ((f - 1) // 4))
           + 3 * ((f % 4) - ((f - 1) % 4))) % 256 + 256) % 256 AS delta
  FROM tr
)
SELECT doc_id,
       f AS frame_idx,
       CAST(least(delta, 256 - delta) * w * h * 3 AS BIGINT) AS dist,
       least(delta, 256 - delta) > 16 AS is_boundary
FROM d
"""


def multimodal_audio_snippet_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio snippet → source matching via spectral-landmark hashing
    (r10) — the constellation-hash retrieval recipe (Wang 2003)
    re-expressed integer-exact over the chirp fingerprint corpus
    (synth_wav_fp — per-doc spectral structure; the base WAV corpus is
    a phase-shifted sawtooth no fingerprint should tell apart): WAV →
    mono PCM, hop-grid windows get fixed-point-DFT peak bins (16-point
    DFT, bins 1..8), consecutive-peak quads become 4096-value posting
    keys, and each query snippet (every 5th doc, cut 2 hops into the
    source — audio_landmarks(snippet=True)) is matched by landmark-key
    join + time-offset voting (audio_match_snippets): the true source
    wins because all its landmarks agree on ONE dt (every snippet here
    resolves to its own source at dt=2) while coincidental key
    collisions scatter. Candidates come only from equal-key postings —
    never snippet×corpus all-pairs — and the snippet side broadcasts.

    Oracle: GENERATED — an independent pure-Python replay (mono mix,
    windowing, DFT peaks, keys, and the full vote count from the synth
    arithmetic, no shared code) emits the winning (snippet, doc, dt,
    votes) rows as a VALUES literal."""
    from python_multiproc_bigdata_spark.operators.multimodal import (
        attach_wav_fp,
        audio_landmarks,
        audio_match_snippets,
    )

    d = table(prep(spark), sf_dir, "documents")
    corpus_lm = audio_landmarks(attach_wav_fp(d)).localCheckpoint(eager=True)
    snips = audio_landmarks(
        attach_wav_fp(d.filter(F.col("doc_id") % 5 == 0)), snippet=True
    )
    return audio_match_snippets(snips, corpus_lm, min_votes=2)


def make_audio_snippet_oracle() -> str:
    """Independent single-node replay of the snippet-match pipeline
    from synth_wav_fp's documented arithmetic — the MONO integer chirp
    sample i = ((doc_id·37 + i·11 + i²·13·(1+doc_id%97) +
    i³·(1+doc_id%11)) mod 4001) − 2000 over n = 96 + doc_id%31 samples
    (no stereo mix: the fingerprint corpus is single-channel) — with
    its own twiddle table and plain-loop DFT — then FULL vote counting
    over every (snippet, doc) key collision and the same
    (votes DESC, doc ASC, dt ASC) winner rule."""
    import math
    import os
    from collections import Counter

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    win, hop, cut, nb = 16, 4, 8, 8
    tw = [
        [
            (
                round(math.cos(2 * math.pi * k * t / win) * (1 << 14)),
                round(-math.sin(2 * math.pi * k * t / win) * (1 << 14)),
            )
            for t in range(win)
        ]
        for k in range(1, nb + 1)
    ]

    def mono_of(doc_id: int) -> list[int]:
        n = 96 + doc_id % 31
        return [
            ((doc_id * 37 + i * 11 + i * i * 13 * (1 + doc_id % 97)
              + i * i * i * (1 + doc_id % 11)) % 4001) - 2000
            for i in range(n)
        ]

    def landmarks(mono: list[int]) -> list[tuple[int, int]]:
        peaks = []
        t0 = 0
        while t0 + win <= len(mono):
            best_k, best_e = 0, -1
            for ki in range(nb):
                re = sum(mono[t0 + t] * tw[ki][t][0] for t in range(win))
                im = sum(mono[t0 + t] * tw[ki][t][1] for t in range(win))
                e = re * re + im * im
                if e > best_e:
                    best_k, best_e = ki, e
            peaks.append(best_k)
            t0 += hop
        return [
            (
                i,
                ((peaks[i] * nb + peaks[i + 1]) * nb + peaks[i + 2]) * nb
                + peaks[i + 3],
            )
            for i in range(len(peaks) - 3)
        ]

    corpus = {d: landmarks(mono_of(d)) for d in ids}
    by_key: dict[int, list[tuple[int, int]]] = {}
    for d, lms in corpus.items():
        for t, k in lms:
            by_key.setdefault(k, []).append((d, t))
    rows = []
    for sid in ids:
        if sid % 5:
            continue
        votes: Counter = Counter()
        for ts, k in landmarks(mono_of(sid)[cut:]):
            for d, tc in by_key.get(k, ()):
                votes[(d, tc - ts)] += 1
        if not votes:
            continue
        (doc, dt), n = min(
            votes.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n >= 2:
            rows.append((sid, doc, dt, n))
    if not rows:
        return (
            "SELECT CAST(NULL AS BIGINT) AS snippet_id, CAST(NULL AS BIGINT) AS matched_doc,"
            " CAST(NULL AS INTEGER) AS dt, CAST(NULL AS INTEGER) AS votes WHERE FALSE"
        )
    values = ",\n".join(f"({s}, {d}, {dt}, {n})" for s, d, dt, n in rows)
    return (
        "SELECT CAST(snippet_id AS BIGINT) AS snippet_id,"
        " CAST(matched_doc AS BIGINT) AS matched_doc,"
        " CAST(dt AS INTEGER) AS dt, CAST(votes AS INTEGER) AS votes\n"
        f"FROM (VALUES {values}) AS t(snippet_id, matched_doc, dt, votes)"
    )


def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode over a binary column — the third container
    format (after P6 PPM and RIFF/WAVE), with genuinely different
    on-disk quirks: bottom-up row storage, BGR byte order, and
    4-byte row-stride padding that w = 3 + doc_id%5 cycles through
    3/0/1/2/3 bytes so every pad case is parsed on every run
    (operators/multimodal.py:synth_bmp / decode_bmp). Same
    synth→opaque-bytes→struct-decode shape as multimodal_decode_ppm;
    the oracle replays the raster arithmetic over unnested pixel
    indices, so the full decoder path (header validation, stride
    recovery, row flip, channel swap, numpy sums) is value-checked."""
    d = table(prep(spark), sf_dir, "documents")
    return decode_bmp_features(attach_bmp(d))


# Replays synth_bmp's arithmetic: w = 3 + doc_id%5, h = 2 + doc_id%4,
# pixel i channels R/G/B = (doc_id*17 + i*5 + {0,3,6}) % 256. The
# decoder un-does the BGR/bottom-up/stride encoding, so the oracle is
# in clean image order. DuckDB sums promote to HUGEINT — cast back.
SQL_DECODE_BMP = """
WITH dims AS (
  SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM dims
)
SELECT doc_id,
       w AS width,
       h AS height,
       w * h AS n_pixels,
       CAST(sum((doc_id * 17 + i * 5) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id * 17 + i * 5 + 3) % 256) AS BIGINT) AS sum_g,
       CAST(sum((doc_id * 17 + i * 5 + 6) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id, w, h
"""


def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode over a binary column — the first true CODEC
    format (not just a container): per-chunk CRC-32 verification, IHDR
    validation, zlib DEFLATE decompression of the IDAT stream, and
    per-row reverse filtering where the synthetic corpus cycles the
    filter type through None/Sub/Up/Average/Paeth
    (operators/multimodal.py:synth_png / decode_png — stdlib zlib, no
    PIL needed for the 8-bit RGB non-interlaced subset; baseline JPEG
    joined as a real codec in r9 — operators/jpeg.py). The
    oracle replays the pre-filter raster arithmetic over unnested pixel
    indices, so compression, filtering, and their exact inverses are
    value-checked end-to-end: one flipped bit anywhere in the DEFLATE
    stream or filter algebra and every downstream channel sum moves."""
    d = table(prep(spark), sf_dir, "documents")
    return decode_png_features(attach_png(d))


# Replays synth_png's pre-filter arithmetic: w = 3 + doc_id%5,
# h = 2 + doc_id%4, pixel i channels R/G/B = (doc_id*23 + i*11 +
# {0,5,10}) % 256. The filter+DEFLATE encode and its inverse cancel by
# construction — which is exactly the claim under test.
SQL_DECODE_PNG = """
WITH dims AS (
  SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM dims
)
SELECT doc_id,
       w AS width,
       h AS height,
       w * h AS n_pixels,
       CAST(sum((doc_id * 23 + i * 11) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id * 23 + i * 11 + 5) % 256) AS BIGINT) AS sum_g,
       CAST(sum((doc_id * 23 + i * 11 + 10) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id, w, h
"""


def multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF87a decode over a binary column — the second true codec
    after PNG, and a different compression family: the pixel-index
    raster is LZW-compressed (variable code widths, LSB-first packing,
    clear/end codes, the KwKwK case) and packaged in length-prefixed
    sub-blocks; no stdlib decompressor exists for LZW, so
    operators/multimodal.py:lzw_decode_gif implements the codec from
    the spec (property-tested against 30k-symbol streams that drive
    the code width to 12 bits, plus HAND-PACKED bitstreams in the unit
    test so an encoder/decoder symmetric bug cannot hide). The palette
    alternates 4/8 entries so BOTH starting code widths appear. The
    oracle replays palette-lookup sums over unnested pixel indices —
    one wrong bit in the LZW stream or table timing moves every sum."""
    d = table(prep(spark), sf_dir, "documents")
    return decode_gif_features(attach_gif(d))


# Replays synth_gif's arithmetic: w = 3 + doc_id%5, h = 2 + doc_id%4,
# palette size ps = 1 << (2 + doc_id%2), pixel i's index
# j = (doc_id*13 + i*7) % ps, palette entry j channels R/G/B =
# (doc_id*29 + j*37 + {0,9,18}) % 256.
SQL_DECODE_GIF = """
WITH dims AS (
  SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h,
         (1 << (2 + doc_id % 2))::BIGINT AS ps
  FROM documents
), px AS (
  SELECT doc_id, w, h, ps,
         (doc_id * 13 + unnest(range(w * h)) * 7) % ps AS j
  FROM dims
)
SELECT doc_id,
       w AS width,
       h AS height,
       ps AS palette_size,
       w * h AS n_pixels,
       CAST(sum((doc_id * 29 + j * 37) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id * 29 + j * 37 + 9) % 256) AS BIGINT) AS sum_g,
       CAST(sum((doc_id * 29 + j * 37 + 18) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id, w, h, ps
"""


def multimodal_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-TIFF decode over a binary column (r9) — the fifth
    real image/container format, structurally unlike all prior ones:
    values live in a directory of TYPED TAGS (the IFD) that are INLINE
    when they fit 4 bytes and at an OFFSET otherwise, and the raster is
    stored as STRIPS (RowsPerStrip=2 cycles the strip count 1/2/2/3
    with the corpus heights, so single-strip inline offsets and
    multi-strip external offset arrays are both decoded every run;
    BitsPerSample is always an external SHORT[3] array)
    (operators/multimodal.py:synth_tiff / decode_tiff — pure struct
    parsing, no codec library). Same synth→opaque-bytes→struct-decode
    mapInPandas shape as the PPM/BMP/PNG/GIF/AVI siblings; the oracle
    replays the raster arithmetic AND the strip-count formula, so the
    IFD walk, offset resolution, and strip assembly are value-checked
    end-to-end."""
    d = table(prep(spark), sf_dir, "documents")
    # r13: wide=False as in multimodal_decode_ppm.
    return decode_tiff_features(attach_tiff(d, wide=False))


# Replays synth_tiff's arithmetic: w = 3 + doc_id%5, h = 2 + doc_id%4,
# n_strips = ceil(h / RowsPerStrip=2), pixel i channels R/G/B =
# (doc_id*19 + i*7 + {0,4,8}) % 256. DuckDB sums promote to HUGEINT —
# cast back.
SQL_DECODE_TIFF = """
WITH dims AS (
  SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM dims
)
SELECT doc_id,
       w AS width,
       h AS height,
       (h + 1) // 2 AS n_strips,
       w * h AS n_pixels,
       CAST(sum((doc_id * 19 + i * 7) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id * 19 + i * 7 + 4) % 256) AS BIGINT) AS sum_g,
       CAST(sum((doc_id * 19 + i * 7 + 8) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id, w, h
"""


def multimodal_decode_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL AVI decode over a binary column — VIDEO as a genuinely
    parsed container (operators/multimodal.py:synth_avi / decode_avi):
    nested RIFF LIST walking with the odd-size pad rule, avih
    main-header dims cross-checked against the strf BITMAPINFOHEADER,
    and '00db' uncompressed DIB frames recovered through the BMP raster
    rules (bottom-up rows, BGR order, stride padding). With this, every
    modality has a real container decode (PPM/BMP images, WAV audio,
    AVI video) and three real codecs exist (PNG DEFLATE, GIF LZW, and
    as of r9 baseline JPEG — operators/jpeg.py); only MP3 synthesis and
    compressed video codecs remain stubbed. The oracle replays the
    per-frame raster arithmetic over doubly-unnested (frame, pixel)
    indices."""
    d = table(prep(spark), sf_dir, "documents")
    return decode_avi_features(attach_avi(d))


# Replays synth_avi's arithmetic: w = 3 + doc_id%5, h = 2 + doc_id%4,
# n_frames = 2 + doc_id%3, frame f pixel i channels R/G/B =
# (doc_id*19 + f*13 + i*5 + {0,7,14}) % 256.
SQL_DECODE_AVI = """
WITH dims AS (
  SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h,
         2 + doc_id % 3 AS nf
  FROM documents
), fr AS (
  SELECT doc_id, w, h, nf, unnest(range(nf)) AS f FROM dims
), px AS (
  SELECT doc_id, w, h, nf,
         doc_id * 19 + f * 13 + unnest(range(w * h)) * 5 AS base
  FROM fr
)
SELECT doc_id,
       w AS width,
       h AS height,
       nf AS n_frames,
       w * h * nf AS n_pixels,
       CAST(sum(base % 256) AS BIGINT) AS sum_r,
       CAST(sum((base + 7) % 256) AS BIGINT) AS sum_g,
       CAST(sum((base + 14) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id, w, h, nf
"""


def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode over a binary column (r9) — the LAST
    image format to graduate from the honest codec stub, and the first
    LOSSY one: operators/jpeg.py implements the full ITU-T T.81
    baseline pipeline (marker walk, DHT canonical-Huffman
    reconstruction FROM THE FILE, DC-predicted category decode with
    EXTEND, AC run/size with ZRL/EOB, byte un-stuffing, DRI/RSTn
    resync, dequantize, inverse zigzag, matrix IDCT, level shift).
    Value-checking a lossy codec against a SQL oracle uses the
    exact-roundtrip construction: every 8×8 block in the synthetic
    corpus is constant with an EVEN value, so the sole nonzero
    coefficient 8·(v−128) is an exact multiple of the Annex-K DC step
    and decode reproduces v bit-exactly — while general lossy behavior
    is separately proven by tolerance round-trips and a hand-packed
    entropy bitstream in tests/test_multimodal_jpeg.py. One third of
    the corpus carries restart intervals, so predictor reset and
    marker resync are on the checked path every run."""
    d = table(prep(spark), sf_dir, "documents")
    return decode_jpeg_features(attach_jpeg(d))


# Replays synth_jpeg's arithmetic: wb = 1 + doc_id%3, hb = 1 + doc_id%2
# blocks (8×8 each), block b constant value v = 2·((doc_id·7 + b·9) %
# 96) + 32; decode is bit-exact by construction (see operators/jpeg.py)
# so sum_y = Σ 64·v(b), min/max over blocks. DuckDB sums promote to
# HUGEINT — cast back.
SQL_DECODE_JPEG = """
WITH dims AS (
  SELECT doc_id, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb FROM documents
), blk AS (
  SELECT doc_id, wb, hb,
         2 * ((doc_id * 7 + unnest(range(wb * hb)) * 9) % 96) + 32 AS v
  FROM dims
)
SELECT doc_id,
       wb * 8 AS width,
       hb * 8 AS height,
       wb * hb AS n_blocks,
       wb * hb * 64 AS n_pixels,
       CAST(sum(64 * v) AS BIGINT) AS sum_y,
       CAST(min(v) AS BIGINT) AS min_y,
       CAST(max(v) AS BIGINT) AS max_y
FROM blk
GROUP BY doc_id, wb, hb
"""


def multimodal_decode_jpeg_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chroma-SUBSAMPLED baseline-JPEG decode (r10) — the dominant
    real-world JPEG layout on the driver-gated path: the corpus
    alternates 4:2:0 (even doc_ids) and 4:2:2 (odd), exercising
    per-component sampling factors, T.81 A.2.3 interleaved MCUs,
    chroma downsample/replication-upsample, and RSTn resync inside
    multi-MCU frames. The constant-chroma construction
    (operators/jpeg.py:synth_jpeg_sub — r=g=b pixels make Cb=Cr exactly
    128 at every stage) keeps the LUMA stats bit-exact, so this query
    shares SQL_DECODE_JPEG with the 4:4:4 corpus: matching it IS the
    proof that subsampling reproduces the same luma values — general
    lossy color behavior is tolerance-tested in
    tests/test_multimodal_jpeg.py."""
    d = table(prep(spark), sf_dir, "documents")
    return decode_jpeg_features(attach_jpeg_sub(d))


def multimodal_mp3_frame_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 (MPEG-1 Layer III) frame-structure walk over a binary column
    (r9) — spec-level audio introspection for the one format whose full
    DECODE is honestly library-bound (the MDCT/filterbank stub in
    operators/multimodal.py:decode_media stays): operators/mp3.py walks
    sync words, validates version/layer/table indices against the
    ISO 11172-3 bitrate and sample-rate tables, advances by the Layer
    III frame-length formula ⌊144·bitrate/fs⌋ + padding, and skips
    ID3v2 tags via their syncsafe size — what an ingest pipeline needs
    to validate/measure audio blobs (duration, bitrate profile, tag
    overhead) without decoding samples. The synth corpus cycles every
    bitrate row, all three sample rates, both padding states, and five
    ID3v2 tag sizes; filler bytes are never 0xFF, so the walker's
    computed-length advance (not lucky re-syncing) is what the oracle
    value-checks."""
    d = table(prep(spark), sf_dir, "documents")
    return mp3_frame_features(attach_mp3(d))


def multimodal_mp3_sideinfo_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 Layer III SIDE-INFORMATION decode (r11) — one layer below
    the r9 frame walk (ISO 11172-3 §2.4.1.7): each mono frame's 17-byte
    side-info block is bit-decoded into main_data_begin, scfsi, and
    per-granule part2_3_length / big_values / global_gain /
    scalefac_compress / window-switching branch (block_type, mixed
    flag, 2 table_selects + 3 subblock gains) vs the normal branch
    (3 table_selects + region counts), preflag / scalefac_scale /
    count1table_select — the Huffman/scalefactor bookkeeping a real
    decoder reads before touching main data (MDCT synthesis stays the
    documented library-bound stub). The walker validates mono mode,
    the spec big_values ≤ 288 bound, and the reserved block_type 0
    under switching. The synth corpus packs BOTH window branches every
    few granules, so every field path round-trips through real bit
    packing; the oracle replays the field arithmetic
    (operators/mp3.py:_si_fields) in exact integer SQL. Map-only,
    zero shuffle — same plan shape as the frame walk."""
    d = table(prep(spark), sf_dir, "documents")
    return mp3_sideinfo_features(attach_mp3_si(d))


# Replays synth_mp3_si's field arithmetic (operators/mp3.py:_si_fields)
# over nf = 2 + doc_id%3 frames × 2 granules: per-frame fields counted
# once (g=0 filter), branch fields under their window_switching guard.
SQL_MP3_SIDEINFO = """
WITH dims AS (
  SELECT doc_id, 2 + doc_id % 3 AS nf FROM documents
), fr AS (
  SELECT doc_id, nf, unnest(range(nf)) AS f FROM dims
), gr AS (
  SELECT doc_id, nf, f, unnest(range(2)) AS g FROM fr
), fx AS (
  SELECT doc_id, nf, f, g,
    (doc_id*31 + f*7) % 512 AS mdb,
    (doc_id + f) % 16 AS scfsi,
    (doc_id*13 + f*5 + g*9) % 4096 AS p23,
    (doc_id*3 + f + 2*g) % 289 AS bv,
    (doc_id*7 + f*3 + g) % 256 AS gg,
    (doc_id + f + g) % 16 AS sfc,
    (doc_id + f + g) % 2 AS wsf,
    1 + (doc_id + g) % 3 AS bt,
    (doc_id + f) % 2 AS mixed,
    (doc_id*5 + f + g) % 32 AS t0,
    (doc_id*5 + f + g + 1) % 32 AS t1,
    (doc_id*5 + f + g + 2) % 32 AS t2,
    (doc_id + f + g) % 8 AS s0,
    (doc_id + f + g + 1) % 8 AS s1,
    (doc_id + f + g + 2) % 8 AS s2,
    (doc_id + f) % 16 AS r0,
    (doc_id + g) % 8 AS r1,
    (doc_id // 3 + f + g) % 2 AS pre,
    (doc_id // 5 + f + g) % 2 AS sfs,
    (doc_id // 7 + f + g) % 2 AS c1t
  FROM gr
)
SELECT doc_id,
  CAST(max(nf) AS BIGINT) AS n_frames,
  CAST(sum(CASE WHEN g = 0 THEN mdb ELSE 0 END) AS BIGINT) AS sum_main_data_begin,
  CAST(sum(CASE WHEN g = 0 THEN scfsi ELSE 0 END) AS BIGINT) AS sum_scfsi,
  CAST(sum(p23) AS BIGINT) AS sum_part23,
  CAST(sum(bv) AS BIGINT) AS sum_big_values,
  CAST(sum(gg) AS BIGINT) AS sum_global_gain,
  CAST(sum(sfc) AS BIGINT) AS sum_scalefac_compress,
  CAST(sum(wsf) AS BIGINT) AS n_switched,
  CAST(sum(CASE WHEN wsf = 1 THEN bt ELSE 0 END) AS BIGINT) AS sum_block_type,
  CAST(sum(CASE WHEN wsf = 1 THEN mixed ELSE 0 END) AS BIGINT) AS n_mixed,
  CAST(sum(t0 + t1 + CASE WHEN wsf = 0 THEN t2 ELSE 0 END) AS BIGINT) AS sum_table_select,
  CAST(sum(CASE WHEN wsf = 1 THEN s0 + s1 + s2 ELSE 0 END) AS BIGINT) AS sum_subblock_gain,
  CAST(sum(CASE WHEN wsf = 0 THEN r0 ELSE 0 END) AS BIGINT) AS sum_region0,
  CAST(sum(CASE WHEN wsf = 0 THEN r1 ELSE 0 END) AS BIGINT) AS sum_region1,
  CAST(sum(pre) AS BIGINT) AS n_preflag,
  CAST(sum(sfs) AS BIGINT) AS n_scalefac_scale,
  CAST(sum(c1t) AS BIGINT) AS n_count1
FROM fx GROUP BY doc_id
"""


def multimodal_decode_png_adam7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG ADAM7 interlaced decode (r11) — the progressive-transmission
    mode of the r8 PNG codec (PNG spec §8.2): seven passes extracted on
    the spec grid, each pass an independently FILTERED sub-image
    (prev-row resets per pass; genuinely EMPTY passes on the small end
    of the corpus emit no bytes — the rule that breaks naive decoders),
    de-interlaced back onto the raster. The synth corpus cycles all
    five row filters WITHIN passes and both empty and full pass sets.
    Output adds POSITION-WEIGHTED channel sums Σ(i+1)·c to the plain
    sums, so a de-interlace bug that merely permutes pixels (which
    plain sums cannot see) hash-fails. Map-only mapInPandas; oracle
    replays the pixel arithmetic in exact integer SQL."""
    from python_multiproc_bigdata_spark.operators.multimodal import (
        attach_png_i7,
        decode_png_adam7_features,
    )

    d = table(prep(spark), sf_dir, "documents")
    return decode_png_adam7_features(attach_png_i7(d))


# Replays synth_png_i7's pixel arithmetic: pixel i of doc d has
# R/G/B = (d·29 + i·13 + {0,7,14}) mod 256 over w·h pixels — the
# interlacing itself must cancel out, and the weighted sums pin it.
SQL_DECODE_PNG_I7 = """
WITH dims AS (
  SELECT doc_id, 3 + doc_id % 8 AS w, 3 + doc_id % 7 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM dims
), ch AS (
  SELECT doc_id, w, h, i,
         (doc_id*29 + i*13) % 256 AS r,
         (doc_id*29 + i*13 + 7) % 256 AS g,
         (doc_id*29 + i*13 + 14) % 256 AS b
  FROM px
)
SELECT doc_id,
  CAST(max(w) AS BIGINT) AS width,
  CAST(max(h) AS BIGINT) AS height,
  CAST(count(*) AS BIGINT) AS n_pixels,
  CAST(sum(r) AS BIGINT) AS sum_r,
  CAST(sum(g) AS BIGINT) AS sum_g,
  CAST(sum(b) AS BIGINT) AS sum_b,
  CAST(sum((i + 1) * r) AS BIGINT) AS wsum_r,
  CAST(sum((i + 1) * g) AS BIGINT) AS wsum_g,
  CAST(sum((i + 1) * b) AS BIGINT) AS wsum_b
FROM ch GROUP BY doc_id
"""


def multimodal_mp3_scalefac_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 Layer III SCALEFACTOR decode (r11) — the first MAIN-DATA
    layer, one below the side-info walk (ISO 11172-3 §2.4.2.7): each
    granule's scalefactor fields are bit-read from the frame's main
    data with widths from the scalefac_compress → (slen1, slen2) table
    and the window-mode band layout (21 long bands / 12 short × 3
    windows / the 8+9×3 mixed split), honoring scfsi copy groups for
    granule 1 (copied bands repeat granule 0's value and consume no
    bits — enforced long-block-only per spec) and skipping the
    remaining part2_3_length bits as spectrum data. The supported
    subset is documented and loud: main_data_begin must be 0 (no
    bit-reservoir backpointer); Huffman spectrum + MDCT synthesis stay
    the library-bound stub. The synth corpus hits all three layouts
    and real scfsi copies; the oracle is an INDEPENDENT pure-Python
    replay (own slen table, own layout loops, no shared code) emitted
    as a VALUES literal. Map-only, zero shuffle."""
    from python_multiproc_bigdata_spark.operators.mp3 import (
        attach_mp3_sf,
        mp3_scalefactor_features,
    )

    d = table(prep(spark), sf_dir, "documents")
    return mp3_scalefactor_features(attach_mp3_sf(d))


def make_mp3_scalefac_oracle() -> str:
    """Independent replay of synth_mp3_sf's documented arithmetic with
    its OWN slen table and band-layout loops (nothing imported from
    operators/mp3.py): per doc, nf = 2 + doc_id%3 frames × 2 granules;
    wsf = ((d+f+g)//2)%2, bt = 1+(d+f+g)%3 under switching, mixed =
    (d+f)%2; scfsi = (d+f)%16 only when both granules are long;
    scalefactor value (d + f + g·7 + band·3) mod 2^slen; granule-1
    bands in set scfsi groups copy granule 0 (with granule 0's slen);
    part2 bits summed from the layout; filler 8+(d+f+g)%25 ignored
    (it is part3). Emits the per-doc stats rows as a VALUES literal."""
    import os

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    slen_tab = [
        (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
    ]
    groups = ((0, 6), (6, 11), (11, 16), (16, 21))

    def layout(wsf, bt, mixed):
        if not wsf or bt != 2:
            return [("l", b, 1 if b < 11 else 2) for b in range(21)]
        rows = []
        if mixed:
            rows += [("l", b, 1) for b in range(8)]
            sfbs = range(3, 12)
        else:
            sfbs = range(12)
        for sfb in sfbs:
            for w in range(3):
                rows.append(("s", sfb * 4 + w, 1 if sfb < 6 else 2))
        return rows

    rows_out = []
    for d in ids:
        nf = 2 + d % 3
        n_long = n_short = n_mixed = 0
        sum_long = sum_short = copied = part2 = scfsi_sum = 0
        for f in range(nf):
            gmeta = []
            for g in (0, 1):
                wsf = ((d + f + g) // 2) % 2
                bt = 1 + (d + f + g) % 3 if wsf else 0
                mixed = (d + f) % 2 if wsf else 0
                gmeta.append((wsf, bt, mixed))
            both_long = all(not w or b != 2 for w, b, _ in gmeta)
            scfsi = (d + f) % 16 if both_long else 0
            scfsi_sum += scfsi
            g0_vals = {}
            for g in (0, 1):
                wsf, bt, mixed = gmeta[g]
                if not wsf or bt != 2:
                    n_long += 1
                elif mixed:
                    n_mixed += 1
                else:
                    n_short += 1
                s1, s2 = slen_tab[(d + f + g) % 16]
                for kind, band, which in layout(wsf, bt, mixed):
                    slen = s1 if which == 1 else s2
                    if g == 1 and kind == "l":
                        grp = next(
                            i for i, (lo, hi) in enumerate(groups) if lo <= band < hi
                        )
                        if (scfsi >> (3 - grp)) & 1:
                            sum_long += g0_vals[band]
                            copied += 1
                            continue
                    v = (d + f + g * 7 + band * 3) % (1 << slen) if slen else 0
                    part2 += slen
                    if kind == "l":
                        sum_long += v
                        if g == 0:
                            g0_vals[band] = v
                    else:
                        sum_short += v
        rows_out.append(
            f"({d},{nf},{n_long},{n_short},{n_mixed},{sum_long},"
            f"{sum_short},{copied},{part2},{scfsi_sum})"
        )
    values = ",".join(rows_out)
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_frames AS BIGINT) AS n_frames, "
        "CAST(n_long_granules AS BIGINT) AS n_long_granules, "
        "CAST(n_short_granules AS BIGINT) AS n_short_granules, "
        "CAST(n_mixed_granules AS BIGINT) AS n_mixed_granules, "
        "CAST(sum_long_sf AS BIGINT) AS sum_long_sf, "
        "CAST(sum_short_sf AS BIGINT) AS sum_short_sf, "
        "CAST(n_copied_bands AS BIGINT) AS n_copied_bands, "
        "CAST(sum_part2_bits AS BIGINT) AS sum_part2_bits, "
        "CAST(sum_scfsi AS BIGINT) AS sum_scfsi "
        f"FROM (VALUES {values}) AS t(doc_id, n_frames, n_long_granules, "
        "n_short_granules, n_mixed_granules, sum_long_sf, sum_short_sf, "
        "n_copied_bands, sum_part2_bits, sum_scfsi)"
    )


def multimodal_mp3_huffman_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 Layer III HUFFMAN spectrum decode (r12) — the layer below
    the scalefactor walk, completing the Layer III chain short of MDCT
    (the documented library-bound line): each granule's big-values
    region is decoded pair-by-pair with the region's Table B.7 code
    table (region edges from region0/1_count via the Table B.8
    long-block band boundaries), a sign bit after each nonzero, then
    count1 quadruples with table B until part2_3_length is exhausted —
    the walk must land on the part2_3 boundary BIT-PERFECTLY or it
    raises. Supported subset, loudly gated: mono, no bit reservoir,
    long blocks, tables 0/1 + count1 B (operators/mp3.py:mp3_huffman).
    The oracle is an independent pure-Python replay (own hlen table,
    own boundary literals, own region loop) emitted as a VALUES
    literal; coeff_checksum is ORDER-SENSITIVE (Σ (idx+1)·(val+3) mod
    1e6+3), so one misplaced or missigned coefficient moves it.
    Map-only, zero shuffle."""
    from python_multiproc_bigdata_spark.operators.mp3 import (
        attach_mp3_hf,
        mp3_huffman_features,
    )

    d = table(prep(spark), sf_dir, "documents")
    return mp3_huffman_features(attach_mp3_hf(d))


def make_mp3_huffman_oracle() -> str:
    """Independent replay of synth_mp3_hf's documented arithmetic with
    its OWN Huffman length table, Table B.8 boundary literals, and
    region loop (nothing imported from operators/mp3.py): per doc,
    nf = 2 + d%3 frames x 2 long granules; bv/r0/r1/ts/nq per
    _hf_dims' published formulas; pair values (d+f+g+i)%2 /
    (d+3f+i)%2 with sign bits (d+i)%2 / (f+i)%2; count1 quadruple
    values and signs per _hf_quad's formulas; table-0 regions decode
    to nothing. Emits per-doc stats rows as a VALUES literal."""
    import os

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    slen_tab = [
        (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
    ]
    hlen = {(0, 0): 1, (0, 1): 3, (1, 0): 2, (1, 1): 3}
    bounds_by_sr = (
        (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
         162, 196, 238, 288, 342, 418, 576),
        (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
         156, 190, 230, 276, 330, 384, 576),
        (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
         194, 240, 296, 364, 448, 550, 576),
    )
    rows_out = []
    for d in ids:
        nf = 2 + d % 3
        bounds = bounds_by_sr[d % 3]
        sum_bv = r0p = r1p = r2p = sabs = nneg = quads = 0
        hbits = sfbits = chk = 0
        for f in range(nf):
            for g in (0, 1):
                bv = (d * 3 + f + 2 * g) % 17
                r0 = (d + f + g) % 4
                r1 = (d + 2 * f + g) % 4
                ts = ((d + f + g) % 2, (d + f) % 2, (d + g) % 2)
                nq = (d + f + g) % 5
                s1, s2 = slen_tab[(d + f + g) % 16]
                sfbits += s1 * 11 + s2 * 10
                b0 = min(bv, bounds[r0 + 1] // 2)
                b1 = min(bv, bounds[r0 + r1 + 2] // 2)
                sum_bv += bv
                coeffs = []
                for i in range(bv):
                    reg = 0 if i < b0 else (1 if i < b1 else 2)
                    if reg == 0:
                        r0p += 1
                    elif reg == 1:
                        r1p += 1
                    else:
                        r2p += 1
                    if ts[reg] == 0:
                        continue
                    x = (d + f + g + i) % 2
                    y = (d + 3 * f + i) % 2
                    hbits += hlen[(x, y)] + (x != 0) + (y != 0)
                    if x:
                        coeffs.append((2 * i, -x if (d + i) % 2 else x))
                    if y:
                        coeffs.append((2 * i + 1, -y if (f + i) % 2 else y))
                sample = 2 * bv
                for i in range(nq):
                    vals = ((d + i) % 2, (f + i) % 2, (g + i) % 2,
                            (d + f + i) % 2)
                    hbits += 4 + sum(vals)
                    for k, v in enumerate(vals):
                        if v:
                            neg = (d + f + g + i + k) % 2
                            coeffs.append((sample + k, -v if neg else v))
                    sample += 4
                quads += nq
                for idx, v in coeffs:
                    sabs += abs(v)
                    if v < 0:
                        nneg += 1
                    chk = (chk + (idx + 1) * (v + 3)) % 1_000_003
        rows_out.append(
            f"({d},{nf},{sum_bv},{r0p},{r1p},{r2p},{sabs},{nneg},{quads},"
            f"{hbits},{sfbits},{chk})"
        )
    values = ",".join(rows_out)
    cols = (
        "doc_id n_frames sum_big_values sum_r0_pairs sum_r1_pairs "
        "sum_r2_pairs sum_abs_coeff n_neg_coeff sum_quads sum_huff_bits "
        "sum_sf_bits coeff_checksum"
    ).split()
    sel = ", ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
    return f"SELECT {sel} FROM (VALUES {values}) AS t({', '.join(cols)})"


# Replays synth_mp3's arithmetic: nf = 3 + doc_id%4 frames, sample rate
# by doc_id%3, ID3v2 tag 10 + (doc_id%5)·7 bytes on even docs, frame f
# bitrate index 1 + (doc_id·3 + f·5) % 14 via the spec table, padding
# (doc_id + f) % 2, frame bytes ⌊144·kbps·1000/sr⌋ + pad. DuckDB sums
# promote to HUGEINT — cast back.
SQL_MP3_FRAME_WALK = """
WITH brt(idx, kbps) AS (
  VALUES (1,32),(2,40),(3,48),(4,56),(5,64),(6,80),(7,96),(8,112),
         (9,128),(10,160),(11,192),(12,224),(13,256),(14,320)
), dims AS (
  SELECT doc_id,
         3 + doc_id % 4 AS nf,
         CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS sr,
         CASE WHEN doc_id % 2 = 0 THEN 10 + (doc_id % 5) * 7
              ELSE 0 END AS tagb
  FROM documents
), fr AS (
  SELECT doc_id, nf, sr, tagb, unnest(range(nf)) AS f FROM dims
), fx AS (
  SELECT doc_id, nf, sr, tagb,
         1 + (doc_id * 3 + f * 5) % 14 AS bidx,
         (doc_id + f) % 2 AS pad
  FROM fr
)
SELECT fx.doc_id,
       nf AS n_frames,
       CAST(sr AS BIGINT) AS sample_rate,
       CAST(tagb AS BIGINT) AS tag_bytes,
       CAST(sum((144 * kbps * 1000) // sr + pad) AS BIGINT) AS audio_bytes,
       nf * 1152 AS total_samples,
       CAST(sum(kbps) AS BIGINT) AS sum_bitrate_kbps,
       CAST(sum(pad) AS BIGINT) AS n_padded
FROM fx JOIN brt ON brt.idx = fx.bidx
GROUP BY fx.doc_id, nf, sr, tagb
"""


def multimodal_mp4_box_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 / ISO-BMFF box walk over a binary column (r9) — the MODERN
    video container joining AVI as the second genuinely parsed one
    (operators/mp4.py; codec payloads stay honestly stubbed, container
    structure is what ingest must validate/measure): iterative box
    descent with strict boundary accounting, all three spec size
    encodings on the checked path every run (32-bit, largesize=1 →
    64-bit on a quarter of the corpus, size=0 → to-EOF on a fifth),
    version-0 AND version-1 (64-bit time) mvhd/tkhd/mdhd headers, a
    `free` box every reader must skip unparsed, handler-typed tracks,
    and 16.16 fixed-point track dimensions. The oracle replays the
    synth arithmetic — one wrong size decode shifts every downstream
    box and the walk fails loudly or the stats move."""
    d = table(prep(spark), sf_dir, "documents")
    return decode_mp4_features(attach_mp4(d))


# Replays synth_mp4's arithmetic: tracks = 1 + doc_id%2, boxes = ftyp +
# free + moov + mvhd + 5 per track + mdat, timescale 600·(1+doc_id%3),
# duration 600 + doc_id·37, mdat 50 + doc_id%100 bytes, video width
# 16·(1+doc_id%4), largesize on doc_id%4==0.
SQL_MP4_BOX_WALK = """
SELECT doc_id,
       CAST(5 + 5 * (1 + doc_id % 2) AS BIGINT) AS n_boxes,
       CAST(1 + doc_id % 2 AS BIGINT) AS n_tracks,
       CAST(600 * (1 + doc_id % 3) AS BIGINT) AS timescale,
       CAST(600 + doc_id * 37 AS BIGINT) AS duration_units,
       CAST(50 + doc_id % 100 AS BIGINT) AS mdat_bytes,
       CAST(16 * (1 + doc_id % 4) AS BIGINT) AS video_width,
       doc_id % 4 = 0 AS used_largesize
FROM documents
"""


REGISTRY = {
    "multimodal_features": QuerySpec(multimodal_features, SQL_MULTIMODAL),
    "multimodal_decode_jpeg": QuerySpec(multimodal_decode_jpeg, SQL_DECODE_JPEG),
    "multimodal_decode_jpeg_sub": QuerySpec(
        multimodal_decode_jpeg_sub, SQL_DECODE_JPEG
    ),
    "multimodal_mp4_box_walk": QuerySpec(multimodal_mp4_box_walk, SQL_MP4_BOX_WALK),
    "multimodal_mp3_frame_walk": QuerySpec(
        multimodal_mp3_frame_walk, SQL_MP3_FRAME_WALK
    ),
    "multimodal_mp3_sideinfo_walk": QuerySpec(
        multimodal_mp3_sideinfo_walk, SQL_MP3_SIDEINFO
    ),
    "multimodal_mp3_scalefac_walk": QuerySpec(
        multimodal_mp3_scalefac_walk, make_mp3_scalefac_oracle
    ),
    "multimodal_mp3_huffman_walk": QuerySpec(
        multimodal_mp3_huffman_walk, make_mp3_huffman_oracle
    ),
    "multimodal_decode_png_adam7": QuerySpec(
        multimodal_decode_png_adam7, SQL_DECODE_PNG_I7
    ),
    "multimodal_decode_avi": QuerySpec(multimodal_decode_avi, SQL_DECODE_AVI),
    "multimodal_decode_tiff": QuerySpec(multimodal_decode_tiff, SQL_DECODE_TIFF),
    "multimodal_decode_bmp": QuerySpec(multimodal_decode_bmp, SQL_DECODE_BMP),
    "multimodal_decode_png": QuerySpec(multimodal_decode_png, SQL_DECODE_PNG),
    "multimodal_decode_gif": QuerySpec(multimodal_decode_gif, SQL_DECODE_GIF),
    "multimodal_image_ahash_neardup": QuerySpec(
        multimodal_image_ahash_neardup, SQL_IMAGE_AHASH_NEARDUP
    ),
    "multimodal_image_phash_neardup": QuerySpec(
        multimodal_image_phash_neardup, make_phash_oracle
    ),
    "multimodal_audio_snippet_match": QuerySpec(
        multimodal_audio_snippet_match, make_audio_snippet_oracle
    ),
    "multimodal_video_shot_boundaries": QuerySpec(
        multimodal_video_shot_boundaries, SQL_VIDEO_SHOTS
    ),
    "multimodal_resize_ppm": QuerySpec(multimodal_resize_ppm, SQL_RESIZE_PPM),
    "multimodal_audio_frames": QuerySpec(multimodal_audio_frames, SQL_AUDIO_FRAMES),
    "multimodal_frame_sample": QuerySpec(multimodal_frame_sample, SQL_FRAME_SAMPLE),
    "multimodal_decode_ppm": QuerySpec(multimodal_decode_ppm, SQL_DECODE_PPM),
    "multimodal_decode_wav": QuerySpec(multimodal_decode_wav, SQL_DECODE_WAV),
}
