"""Unit tests for the unigram-LM (SentencePiece-style) trainer —
pure-Python core, no Spark session needed."""

from __future__ import annotations

from python_multiproc_bigdata_spark.operators.unigram import (
    seed_pieces,
    unigram_train,
    viterbi_segment,
    word_piece_counts,
)

WC = [("banana", 50), ("bandana", 30), ("ana", 20), ("cab", 5), ("x", 1)]


def test_seed_keeps_all_single_chars():
    seeds = seed_pieces(WC, max_piece_len=3, seed_size=5)
    for ch in "bandcx":
        assert ch in seeds


def test_viterbi_reconstructs_word():
    vocab = unigram_train(WC, max_piece_len=3, seed_size=30, vocab_size=15)
    logp = {p: lp for _, p, _, lp in vocab}
    for w, _ in WC:
        segs = viterbi_segment(w, logp, 3)
        assert "".join(segs) == w
        assert all(p in logp for p in segs)


def test_frequent_substring_becomes_piece():
    vocab = unigram_train(WC, max_piece_len=3, seed_size=30, vocab_size=15)
    pieces = {p for _, p, _, _ in vocab}
    # "an"/"ana" dominates the weighted corpus; the trainer must learn
    # at least one multi-char piece covering it
    assert any(p in pieces for p in ("ana", "an", "na"))


def test_deterministic_across_runs_and_input_order():
    a = unigram_train(sorted(WC), max_piece_len=3, seed_size=30, vocab_size=15)
    b = unigram_train(sorted(WC, reverse=True), max_piece_len=3, seed_size=30, vocab_size=15)
    assert a == b


def test_word_piece_counts_bounded_by_length():
    vocab = unigram_train(WC, max_piece_len=3, seed_size=30, vocab_size=15)
    counts = word_piece_counts([w for w, _ in WC], vocab, 3)
    for w, n in counts.items():
        assert 1 <= n <= len(w)
    # multi-char pieces must actually compress: banana is not 6 singles
    assert counts["banana"] < 6
