"""Audio snippet-match tests (operators/multimodal.py audio_* family,
r10): landmark determinism, snippet-to-source resolution through the
full Spark pipeline, the vote-threshold negative path, and the chirp
corpus's spectral distinctness claim."""

from __future__ import annotations

from python_multiproc_bigdata_spark.operators.multimodal import (
    AUDIO_FP_HOP,
    AUDIO_FP_SNIPPET_HOPS,
    _landmarks_of,
    _mono_pcm,
    attach_wav_fp,
    audio_landmarks,
    audio_match_snippets,
    synth_wav_fp,
)


def test_landmarks_shift_invariance():
    """Cutting a signal on the hop grid shifts every landmark's anchor
    by exactly the hop count and changes no key — the property the
    offset-voting matcher is built on."""
    cut = AUDIO_FP_SNIPPET_HOPS * AUDIO_FP_HOP
    for d in (0, 3, 17, 42, 96):
        mono = _mono_pcm(synth_wav_fp(d))
        full = dict(_landmarks_of(mono))
        for t, key in _landmarks_of(mono[cut:]):
            assert full[t + AUDIO_FP_SNIPPET_HOPS] == key, (d, t)


def test_snippets_resolve_to_their_source(spark):
    """Through the full Spark pipeline: every snippet must match its
    own source doc at dt = AUDIO_FP_SNIPPET_HOPS with votes = its
    landmark count (all landmarks agree), and vote margins must be
    decisive (the corpus is spectrally distinct by construction)."""
    doc_ids = list(range(90))
    df = spark.createDataFrame([(d,) for d in doc_ids], ["doc_id"])
    corpus = audio_landmarks(attach_wav_fp(df)).localCheckpoint(eager=True)
    snips = audio_landmarks(
        attach_wav_fp(df.filter("doc_id % 5 = 0")), snippet=True
    )
    out = {r.snippet_id: r for r in audio_match_snippets(snips, corpus).collect()}
    assert sorted(out) == [d for d in doc_ids if d % 5 == 0]
    for sid, r in out.items():
        assert r.matched_doc == sid and r.dt == AUDIO_FP_SNIPPET_HOPS, r
        n_lm = len(_landmarks_of(_mono_pcm(synth_wav_fp(sid))[
            AUDIO_FP_SNIPPET_HOPS * AUDIO_FP_HOP :
        ]))
        assert r.votes == n_lm, (sid, r.votes, n_lm)


def test_min_votes_gate(spark):
    """A snippet whose source is absent from the corpus must not
    produce a confident match: against a disjoint corpus the best
    coincidental (doc, dt) hypothesis collects only scattered votes,
    far below the aligned count."""
    df_corpus = spark.createDataFrame([(d,) for d in range(40, 80)], ["doc_id"])
    df_snip = spark.createDataFrame([(d,) for d in (0, 5, 10)], ["doc_id"])
    corpus = audio_landmarks(attach_wav_fp(df_corpus)).localCheckpoint(eager=True)
    snips = audio_landmarks(attach_wav_fp(df_snip), snippet=True)
    aligned = min(
        len(_landmarks_of(_mono_pcm(synth_wav_fp(d))[
            AUDIO_FP_SNIPPET_HOPS * AUDIO_FP_HOP :
        ]))
        for d in (0, 5, 10)
    )
    for r in audio_match_snippets(snips, corpus, min_votes=2).collect():
        assert r.votes < aligned // 2, r
