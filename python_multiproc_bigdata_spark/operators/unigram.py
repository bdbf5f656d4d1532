"""Unigram-LM (SentencePiece-style) tokenizer training — Kudo 2018,
the other major public subword algorithm next to BPE (operators/bpe.py).

Scale shape (shared with BPE): ONE corpus-scale shuffle — the
word-frequency groupBy — then everything operates on the VOCABULARY
(distinct words + counts), which is corpus-size-independent (Heaps'
law). The EM itself runs driver-side over the bounded word-count table
(same discipline as the k-means centroid trainer and BPE's per-merge
argmax: O(vocab), not O(data)), capped by construction via a
deterministic top-`max_vocab_rows` cut so the collect cannot grow with
the corpus. The encode side (fertility stats) replays segmentation over
the VOCAB and joins the per-word piece count back onto the token stream
— vocab-sized build side, AQE broadcasts it.

Determinism: no RNG anywhere — seeding is frequency-ranked with
lexicographic tie-breaks, the EM is hard (Viterbi) EM with a fixed
iteration count, and the Viterbi DP breaks score ties toward the
longest final piece then lexicographically. The oracle generator
re-derives word counts from the parquet with DuckDB (independently of
Spark's shuffle) and runs this same trainer, so an engine-side
word-count divergence changes the embedded literals and fails the
hash — the piece-table check validates the distributed aggregation
through the trainer, while the fertility query's join is checked
end-to-end in SQL.
"""

from __future__ import annotations

import math


def seed_pieces(
    word_counts: list[tuple[str, int]], max_piece_len: int = 4, seed_size: int = 200
) -> dict[str, int]:
    """Candidate piece inventory: every substring of length 1..max_piece_len
    of every vocab word, weighted by word frequency (counting each
    occurrence position). Keep the top `seed_size` by (count DESC, piece
    ASC) — plus ALL single characters unconditionally, so every word
    stays segmentable after pruning."""
    counts: dict[str, int] = {}
    for word, freq in word_counts:
        n = len(word)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = word[i:j]
                counts[p] = counts.get(p, 0) + freq
    singles = {p for p in counts if len(p) == 1}
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = {p for p, _ in ranked[:seed_size]} | singles
    return {p: counts[p] for p in keep}


def viterbi_segment(word: str, logp: dict[str, float], max_piece_len: int) -> list[str]:
    """Best segmentation of `word` into known pieces maximizing the sum
    of piece log-probs. DP over end positions; ties break toward the
    LONGEST final piece, then the lexicographically smallest piece —
    fully deterministic. Assumes every single char is a known piece
    (seed_pieces guarantees it)."""
    n = len(word)
    # (score, chosen_start) per end position
    best: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
    for end in range(1, n + 1):
        cand: tuple[float, int, str] | None = None
        for start in range(max(0, end - max_piece_len), end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                continue
            score = best[start][0] + lp
            if cand is None:
                cand = (score, start, piece)
            else:
                better = score > cand[0] or (
                    score == cand[0]
                    and (
                        start < cand[1]  # longer final piece
                        or (start == cand[1] and piece < cand[2])
                    )
                )
                if better:
                    cand = (score, start, piece)
        assert cand is not None, f"unsegmentable word {word!r}"
        best[end] = (cand[0], cand[1])
    pieces: list[str] = []
    end = n
    while end > 0:
        start = best[end][1]
        pieces.append(word[start:end])
        end = start
    pieces.reverse()
    return pieces


def unigram_train(
    word_counts: list[tuple[str, int]],
    max_piece_len: int = 4,
    seed_size: int = 200,
    vocab_size: int = 80,
    em_iters: int = 3,
) -> list[tuple[int, str, int, float]]:
    """Train a unigram-LM piece vocabulary by hard (Viterbi) EM; returns
    [(rank, piece, count, logprob)] for the final top-`vocab_size`
    pieces by (count DESC, piece ASC), single chars always retained.
    `count` is the (integer) number of weighted piece occurrences in the
    final Viterbi segmentation of the corpus; `logprob` is
    ln(count/total) rounded to 6 — integers plus one rounded transform,
    so cross-engine replay is hash-exact."""
    seeds = seed_pieces(word_counts, max_piece_len, seed_size)
    total0 = sum(seeds.values())
    logp = {p: math.log(c / total0) for p, c in seeds.items()}
    counts: dict[str, int] = {}
    for _ in range(em_iters):
        counts = {}
        for word, freq in word_counts:
            for piece in viterbi_segment(word, logp, max_piece_len):
                counts[piece] = counts.get(piece, 0) + freq
        # M-step over pieces actually used; unused seeds drop out, but
        # single chars are re-floored so segmentability never breaks
        for p in {s for s in seeds if len(s) == 1}:
            counts.setdefault(p, 1)
        total = sum(counts.values())
        logp = {p: math.log(c / total) for p, c in counts.items()}
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    singles = [(p, c) for p, c in ranked if len(p) == 1]
    multis = [(p, c) for p, c in ranked if len(p) > 1]
    kept = sorted(
        (multis[: max(0, vocab_size - len(singles))] + singles),
        key=lambda kv: (-kv[1], kv[0]),
    )
    total = sum(counts.values())
    return [
        (rank, p, c, round(math.log(c / total), 6))
        for rank, (p, c) in enumerate(kept, start=1)
    ]


def word_piece_counts(
    words: list[str], vocab: list[tuple[int, str, int, float]], max_piece_len: int = 4
) -> dict[str, int]:
    """Per-word piece count under the trained vocabulary's Viterbi
    segmentation — the encode-side map joined back onto the token
    stream for fertility stats. Single chars are in the vocab by
    construction, so every word segments."""
    logp = {p: lp for _, p, _, lp in vocab}
    return {w: len(viterbi_segment(w, logp, max_piece_len)) for w in words}
