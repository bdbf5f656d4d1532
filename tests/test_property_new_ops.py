"""Property-based checks (hypothesis) for the continuation-session
algorithms whose correctness arguments are the subtlest: PPJoin prefix
filtering (must be LOSSLESS vs all-pairs Jaccard for every corpus) and
degree-oriented triangle counting (must equal the brute-force census
for every graph). Few examples, small inputs — each example is a full
Spark roundtrip."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


WORDS = ["w%d" % i for i in range(12)]


@st.composite
def tiny_corpus(draw):
    n_docs = draw(st.integers(2, 6))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(0, 12))
        toks = [draw(st.sampled_from(WORDS)) for _ in range(n_tok)]
        docs.append((i, " ".join(toks)))
    return docs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=tiny_corpus())
def test_prefix_filter_lossless_on_random_corpora(spark, corpus):
    from python_multiproc_bigdata_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    allp = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(df, 0.8).collect()
    }
    ppj = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(df, 4, 5).collect()
    }
    assert ppj == allp


@st.composite
def tiny_graph(draw):
    n = draw(st.integers(3, 8))
    possible = list(itertools.combinations(range(n), 2))
    chosen = draw(
        st.lists(st.sampled_from(possible), min_size=0, max_size=len(possible))
    )
    return chosen


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=tiny_graph())
def test_triangle_count_matches_bruteforce(spark, edges):
    from collections import Counter

    from python_multiproc_bigdata_spark.operators.graph import triangle_count

    if not edges:
        return
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    es = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = {v for e in es for v in e}
    expect: Counter = Counter()
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if (
            frozenset((a, b)) in es
            and frozenset((b, c)) in es
            and frozenset((a, c)) in es
        ):
            expect[a] += 1
            expect[b] += 1
            expect[c] += 1
    assert got == dict(expect)


@given(
    w=st.integers(min_value=1, max_value=17),
    h=st.integers(min_value=1, max_value=13),
    maxval=st.integers(min_value=1, max_value=255),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    comment=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_ppm_decoder_roundtrip_property(w, h, maxval, seed, comment):
    """decode_ppm inverts an independently-constructed encoder for any
    dims/maxval/raster — not just synth_ppm's fixed layout — and its
    channel sums equal a reference computation."""
    from python_multiproc_bigdata_spark.operators.multimodal import decode_ppm

    n = 3 * w * h
    raster = bytes((seed * 2654435761 + i * 40503) % (maxval + 1) for i in range(n))
    header = b"P6\n"
    if comment:
        header += b"# c%d\n" % (seed % 100)
    header += b"%d %d\n%d\n" % (w, h, maxval)
    got = decode_ppm(header + raster)
    sums = [0, 0, 0]
    for i, b in enumerate(raster):
        sums[i % 3] += b
    assert got == (w, h, maxval, w * h, sums[0], sums[1], sums[2])


@given(
    n_channels=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    n_frames=st.integers(min_value=0, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_wav_decoder_against_stdlib_encoder(n_channels, rate, n_frames, seed):
    """decode_wav inverts Python's OWN stdlib `wave` encoder — a fully
    independent RIFF writer, not synth_wav — for any channel count, rate,
    and seeded int16 samples; stats equal a reference computation."""
    import io
    import struct
    import wave

    from python_multiproc_bigdata_spark.operators.multimodal import decode_wav

    n = n_channels * n_frames
    samples = [((seed * 2654435761 + i * 40503) % 65536) - 32768 for i in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{n}h", *samples))
    got = decode_wav(buf.getvalue())
    assert got == (
        rate,
        n_channels,
        n_frames,
        n_frames * 1000 // rate,
        sum(samples),
        sum(abs(s) for s in samples),
        max((abs(s) for s in samples), default=0),
    )


def test_wav_decoder_rejects_malformed():
    """Error paths: bad magic, wrong RIFF size, truncated PCM."""
    import struct

    import pytest

    from python_multiproc_bigdata_spark.operators.multimodal import (
        decode_wav,
        synth_wav,
    )

    good = synth_wav(5)  # doc 5: odd-sized LIST note exercises the pad rule
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + good[4:])
    bad_size = good[:4] + struct.pack("<I", 7) + good[8:]
    with pytest.raises(ValueError, match="RIFF size"):
        decode_wav(bad_size)
    with pytest.raises(ValueError, match="RIFF size"):
        decode_wav(good[:-3])
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    data = b"data" + struct.pack("<I", 3) + b"abc\x00"  # 3 bytes: not a frame multiple
    body = b"WAVE" + fmt + data
    with pytest.raises(ValueError, match="truncated PCM"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


@given(
    n_channels=st.integers(min_value=1, max_value=3),
    n_frames=st.integers(min_value=1, max_value=60),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_audio_window_features_against_pure_python(n_channels, n_frames, seed):
    """frame_audio_windows' numpy window math equals a per-sample pure
    Python reference (stdlib-wave-encoded input, so the chunk walk is
    exercised too): window split, energy, and the inside-window
    sign-flip ZCR rule."""
    import io
    import struct
    import wave

    from python_multiproc_bigdata_spark.operators.multimodal import (
        AUDIO_FRAME_WINDOW as W,
        wav_samples,
    )

    n = n_channels * n_frames
    samples = [((seed * 2654435761 + i * 40503) % 65536) - 32768 for i in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{n}h", *samples))
    _rate, n_ch, mat = wav_samples(buf.getvalue())
    assert (n_ch, mat.shape) == (n_channels, (n_frames, n_channels))

    # reference: pure-Python per channel/window fold
    expect = {}
    for c in range(n_channels):
        ch = [samples[j * n_channels + c] for j in range(n_frames)]
        for j, v in enumerate(ch):
            key = (c, j // W)
            e = expect.setdefault(key, [0, 0, 0])  # n, energy, zcr
            e[0] += 1
            e[1] += v * v
            if j % W and ((v >= 0) != (ch[j - 1] >= 0)):
                e[2] += 1

    # the numpy path, replicated exactly as frame_audio_windows computes
    got = {}
    for c in range(n_channels):
        ch = mat[:, c]
        nonneg = ch >= 0
        for w0 in range(0, n_frames, W):
            seg = ch[w0 : w0 + W]
            flips = nonneg[w0 : w0 + len(seg)]
            got[(c, w0 // W)] = [
                len(seg),
                int((seg * seg).sum()),
                int((flips[1:] != flips[:-1]).sum()),
            ]
    assert got == expect


@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=150, deadline=None)
def test_nn_resize_against_per_pixel_reference(w, h, seed):
    """The numpy fancy-index NN resample equals a per-pixel pure-Python
    reference for arbitrary source dims (up- and down-sampling), on an
    independently encoded P6 payload."""
    import numpy as np

    from python_multiproc_bigdata_spark.operators.multimodal import ppm_raster

    n = 3 * w * h
    raster = bytes((seed * 2654435761 + i * 40503) % 256 for i in range(n))
    payload = b"P6\n%d %d\n255\n" % (w, h) + raster
    pw, ph, maxval, px = ppm_raster(payload)
    assert (pw, ph, maxval) == (w, h, 255)

    dw = dh = 8
    xs = (np.arange(dw) * w) // dw
    ys = (np.arange(dh) * h) // dh
    resized = px[np.ix_(ys, xs)]
    for ty in range(dh):
        for tx in range(dw):
            sx, sy = (tx * w) // dw, (ty * h) // dh
            i = sy * w + sx
            for c in range(3):
                assert resized[ty, tx, c] == raster[3 * i + c]
