"""Unit tests for the continuation-session corpus ops: MOSS winnowing
fingerprints/pairs, PMI collocations, and the UDTF registered query."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_pairs,
)


def _winnow_py(text: str, k: int = 8, w: int = 4) -> set[str]:
    """Reference single-node winnowing (position-free variant): distinct
    window minima of md5-16-hex k-gram hashes over the normalized text."""
    import re

    norm = re.sub(r"[ \t\n\r\f\x0B]+", " ", text.strip().lower())
    if len(norm) < k + w - 1:
        return set()
    hs = [
        hashlib.md5(norm[i : i + k].encode()).hexdigest()[:16]
        for i in range(len(norm) - k + 1)
    ]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_fingerprints_match_reference_impl(spark):
    docs = [
        (1, "The quick   brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog!"),
        (3, "completely unrelated content about spark plans"),
        (4, "tiny"),  # shorter than k+w-1 -> no fingerprints
    ]
    df = spark.createDataFrame(docs, ["id", "text"])
    got = {
        (r.id, r.h)
        for r in winnow_fingerprints(df, "id", "text", k=8, w=4).collect()
    }
    want = {(i, h) for i, t in docs for h in _winnow_py(t)}
    assert got == want
    assert not any(i == 4 for i, _ in got)


def test_winnow_guarantee_shared_substring_yields_shared_fp(spark):
    # winnowing guarantee: a shared substring of length >= k + w - 1
    # (here 11) contributes at least one shared fingerprint
    shared = "identical shared passage of text"
    docs = [(1, "prefix one " + shared), (2, shared + " suffix two")]
    df = spark.createDataFrame(docs, ["id", "text"])
    fps = winnow_fingerprints(df, "id", "text").collect()
    a = {r.h for r in fps if r.id == 1}
    b = {r.h for r in fps if r.id == 2}
    assert a & b


def test_winnow_pairs_containment_and_cap(spark):
    base = "a long enough document body that produces many fingerprints"
    docs = [(1, base), (2, base + " with a small tail"), (3, "nothing alike here at all x")]
    df = spark.createDataFrame(docs, ["id", "text"])
    out = winnow_pairs(df, "id", "text", min_containment=0.5).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(1, 2)]
    r = out[0]
    a, b = _winnow_py(base), _winnow_py(base + " with a small tail")
    assert r.n_shared == len(a & b)
    assert abs(r.containment - round(len(a & b) / min(len(a), len(b)), 4)) < 1e-9
    # cap removes every fingerprint when the corpus-frequency bound is 1
    # on duplicated docs -> no pairs survive
    dup = spark.createDataFrame([(1, base), (2, base)], ["id", "text"])
    assert winnow_pairs(dup, "id", "text", max_fp_freq=0).count() == 0


def test_pmi_collocations_hand_computed(spark, tmp_path):
    import math

    # corpus: "x y" always adjacent (5 times), "p q" never adjacent
    rows = [(i, "x y filler%d p" % i, "en", "s", 1) for i in range(5)]
    rows += [(10, "q p other words q", "en", "s", 1)]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from python_multiproc_bigdata_spark.registry.text import text_pmi_collocations

    out = {(r.w1, r.w2): (r.c_xy, r.pmi) for r in text_pmi_collocations(spark, str(tmp_path)).collect()}
    assert ("x", "y") in out
    c_xy, pmi = out[("x", "y")]
    assert c_xy == 5
    nu = sum(len(t.split()) for _, t, *_ in rows)
    nb = sum(len(t.split()) - 1 for _, t, *_ in rows)
    cx = cy = 5  # x and y each appear 5 times
    assert abs(pmi - round(math.log(c_xy * nu * nu / (nb * cx * cy)), 4)) < 1e-9
    assert ("p", "q") not in out  # never adjacent


def test_udtf_char_ngrams_registered_query(spark):
    from python_multiproc_bigdata_spark.registry.funcs import func_udtf_char_ngrams

    out = func_udtf_char_ngrams(spark, "/root/testdata/sf0.001").collect()
    assert out, "bounded slice should yield trigrams"
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.ngram))
    for doc, grams in by_doc.items():
        poss = [p for p, _ in grams]
        assert poss == list(range(len(poss)))  # dense 0..n-3
        assert all(len(g) == 3 for _, g in grams)


def test_bpe_merges_hand_computed(spark):
    from python_multiproc_bigdata_spark.operators.bpe import (
        apply_merge,
        bpe_train_merges,
    )

    # corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(text,)], ["text"])
    merges = bpe_train_merges(df, "text", n_merges=4)
    # pair counts round 1: (l,o)=7 (e,s)=9 (s,t)=9 (w,e)=2+... -> compute:
    # es: newest 6 + widest 3 = 9; st: 9; lo: 7; best tie (e,s) vs (s,t):
    # 9 each -> ('e','s') < ('s','t') lexicographic -> (e,s) first
    assert merges[0][1:] == ("e", "s", 9)
    # after merging 'es': (es,t)=9 wins round 2
    assert merges[1][1:] == ("es", "t", 9)
    # round 3: (l,o)=7
    assert merges[2][1:] == ("l", "o", 7)
    # round 4: n-e=6, e-w=6, w-est=6, lo-w=7 -> (lo,w)=7
    assert merges[3][1:] == ("lo", "w", 7)

    # greedy non-overlapping scan: 'aaa' with (a,a) -> ['aa','a']
    d2 = spark.createDataFrame([(["a", "a", "a"],)], ["syms"])
    out = d2.select(apply_merge("syms", "a", "a").alias("m")).collect()[0].m
    assert out == ["aa", "a"]


def _sequential_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent one-merge-at-a-time reference (the textbook loop the
    batched trainer must reproduce bit-for-bit)."""
    syms = {w: tuple(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            sq = syms[w]
            for i in range(len(sq) - 1):
                pc[(sq[i], sq[i + 1])] = pc.get((sq[i], sq[i + 1]), 0) + f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, c))
        for w, sq in syms.items():
            out, i = [], 0
            while i < len(sq):
                if i + 1 < len(sq) and sq[i] == a and sq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sq[i])
                    i += 1
            syms[w] = tuple(out)
    return merges


def test_bpe_batched_equals_sequential_adversarial(spark):
    """The r10 batched trainer accepts multiple merges per aggregation
    round only when provably identical to sequential greedy — pin that
    claim on corpora built to stress every stop condition: heavy ties,
    chained merges (the new symbol immediately participates), repeated
    chars (greedy-overlap semantics), and a merged-string collision
    with a pre-existing symbol."""
    import re

    from python_multiproc_bigdata_spark.operators.bpe import bpe_train_merges

    corpora = [
        # ties everywhere: all pair counts equal
        " ".join(["ab"] * 4 + ["cd"] * 4 + ["ef"] * 4),
        # chaining: es -> est -> west dominate successively
        " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3),
        # repeated single char: (a,a) merges cascade, aa+aa collides
        # with nothing yet aaaa = (aa)+(aa) reuses merged symbols
        " ".join(["aaaaaaaa"] * 5 + ["aaab"] * 3),
        # collision course: 'xy' appears both as a word (so symbol pair
        # x,y) and inside longer words; merged 'xy' then pairs again
        " ".join(["xy"] * 10 + ["xyz"] * 6 + ["zxy"] * 4 + ["zz"] * 8),
        # skew: one dominant pair, then a cliff of equal-count pairs
        " ".join(["qu"] * 50 + ["qa"] * 3 + ["qb"] * 3 + ["qc"] * 3),
    ]
    for text in corpora:
        wf: dict[str, int] = {}
        for w in re.split(r"\s+", text):
            if w:
                wf[w] = wf.get(w, 0) + 1
        want = _sequential_bpe(wf, 6)
        df = spark.createDataFrame([(text,)], ["text"])
        # exercise both a generous and a tiny collected page (tail-bound
        # logic differs when the page is complete vs truncated)
        for topk in (64, 3):
            got = bpe_train_merges(df, "text", n_merges=6, topk=topk)
            assert got == want, f"corpus={text[:40]}... topk={topk}"


def test_pca_core_and_project(spark):
    import numpy as np

    from python_multiproc_bigdata_spark.operators.similarity import (
        pca_core,
        pca_mudots,
        project_pca,
    )

    rng = np.random.RandomState(7)
    # anisotropic cloud: dominant variance along a known direction
    base = rng.randn(200, 4) * np.array([5.0, 1.0, 0.2, 0.05])
    x = base / np.linalg.norm(base, axis=1, keepdims=True)
    mu, comps = pca_core(x, n_components=3)
    c = np.array(comps)
    # orthonormal, sign-fixed, variance-ordered
    assert np.allclose(c @ c.T, np.eye(3), atol=1e-9)
    for comp in c:
        assert comp[int(np.argmax(np.abs(comp)))] > 0
    xc = x - np.array(mu)
    var = [(xc @ comp).var() for comp in c]
    assert var[0] >= var[1] >= var[2]

    # distributed projection == numpy projection (rounded)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x[:20])],
        schema="vec_id long, embedding array<double>",
    )
    out = {
        (r.vec_id, r.pc_id): r.value
        for r in project_pca(df, mu, comps).collect()
    }
    mud = pca_mudots(mu, comps)
    for i in range(20):
        for k in range(3):
            want = round(float(x[i] @ c[k]) - mud[k], 4)
            assert abs(out[(i, k + 1)] - want) <= 1e-4


def test_bpe_encode_stats_hand_computed(spark, tmp_path):
    from python_multiproc_bigdata_spark.registry.text import text_bpe_encode_stats

    # two langs; "aaaa" words compress under (a,a) merges
    rows = [(0, "aaaa aaaa bb", "en", "s", 1), (1, "aaaa cc", "de", "s", 1)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in text_bpe_encode_stats(spark, str(tmp_path)).collect()}
    assert set(out) == {"en", "de"}
    # merges learned (10 rounds on this tiny corpus): (a,a)->aa first
    # (freq 6), then (aa,aa)->aaaa (freq 3), then pairs of remaining
    # words -> each "aaaa" ends as ONE symbol; "bb"->1, "cc"->1
    en = out["en"]
    assert en.n_tokens == 3 and en.n_symbols == 3
    de = out["de"]
    assert de.n_tokens == 2 and de.n_symbols == 2


def test_wordpiece_merges_likelihood_beats_raw_count(spark):
    """WordPiece on a corpus engineered so the raw-count argmax and the
    likelihood argmax DIFFER: 'xy' appears 20x but x,y are everywhere
    (low score); 'qz' appears 6x and q,z appear nowhere else (score 1
    bucket) — WordPiece must pick (q, ##z) first where BPE would pick
    the count winner. Replay cross-checked with exact // arithmetic."""
    from collections import Counter

    from python_multiproc_bigdata_spark.operators.bpe import (
        wordpiece_train_merges,
    )

    docs = [("xy " * 20 + "qz " * 6 + "x y " * 15).strip()]
    df = spark.createDataFrame([(t,) for t in docs], ["text"])
    merges = wordpiece_train_merges(df, "text", n_merges=2)
    # independent arithmetic: counts over words {xy:20, qz:6, x:15, y:15}
    # symbols: x:35, ##y:20, y:15, q:6, ##z:6
    # score(q,##z) = 6e12 // 36 >> score(x,##y) = 20e12 // 700
    assert (merges[0][1], merges[0][2]) == ("q", "##z"), merges
    assert merges[0][3] == 6  # pair_freq
    assert merges[0][4] == (6 * 10**12) // (6 * 6)
    # after merging qz, the next best is (x, ##y)
    assert (merges[1][1], merges[1][2]) == ("x", "##y"), merges
    assert merges[1][4] == (20 * 10**12) // (35 * 20)


def test_wordpiece_merges_selfpair_and_incremental_counts(spark):
    """r13: symbol counts are maintained EXACTLY on the driver between
    rounds (count'(a)=count(a)-c etc. for a != b merges) with an a == b
    merge invalidating the cache. This corpus forces BOTH paths: round 1
    picks the self-pair ('##o','##o') (q = 2e12//9 beats (o,'##x')'s
    10e12//110), round 2 must re-collect true counts ('oooo' greedily
    merges to [o,##oo,##o], NOT two '##oo'), rounds 2-3 then run on
    incrementally updated counts. Cross-checked against an independent
    Counter replay of the training rule."""
    import re
    from collections import Counter

    from python_multiproc_bigdata_spark.operators.bpe import (
        wordpiece_train_merges,
    )

    docs = [("oooo " + "ox " * 10).strip()]
    df = spark.createDataFrame([(t,) for t in docs], ["text"])
    got = wordpiece_train_merges(df, "text", n_merges=3)
    assert (got[0][1], got[0][2]) == ("##o", "##o"), got  # the a == b round

    # independent single-node replay (the oracle's algorithm, no shared
    # code with the operator's incremental bookkeeping)
    wf: Counter = Counter()
    for t in docs:
        for w in re.split(r"\s+", t.lower()):
            if w:
                wf[w] += 1
    syms = {w: tuple([w[0]] + ["##" + ch for ch in w[1:]]) for w in wf}
    want = []
    for rank in range(1, 4):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for w, f in wf.items():
            sq = syms[w]
            for s in sq:
                sc[s] += f
            for i in range(len(sq) - 1):
                pc[(sq[i], sq[i + 1])] += f
        best = min(
            (-((c * 10**12) // (sc[a] * sc[b])), a, b, c)
            for (a, b), c in pc.items()
        )
        qv, a, b, c = -best[0], best[1], best[2], best[3]
        merged = a + (b[2:] if b.startswith("##") else b)
        want.append((rank, a, b, c, qv))
        for w, sq in syms.items():
            out, i = [], 0
            while i < len(sq):
                if i + 1 < len(sq) and sq[i] == a and sq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sq[i])
                    i += 1
            syms[w] = tuple(out)
    assert got == want, (got, want)


def test_wordpiece_encode_greedy_longest_match(spark):
    """The maximal-munch fold: a longer vocab piece must beat shorter
    prefixes ('hel' over 'he'), continuation pieces carry '##', and an
    unmatchable position marks the WHOLE word unk."""
    from python_multiproc_bigdata_spark.operators.bpe import (
        wordpiece_encode_counts,
    )

    vocab = ["h", "##e", "##l", "##o", "he", "hel", "a", "##x", "x"]
    df = spark.createDataFrame([("hello hex ax hq",)], ["text"])
    got = {
        r.word: (r.n_pieces, r.is_unk)
        for r in wordpiece_encode_counts(df, vocab).collect()
    }
    # hello = hel + ##l + ##o (3, not he+...); hex = he + ##x; ax = a + ##x
    assert got["hello"] == (3, False)
    assert got["hex"] == (2, False)
    assert got["ax"] == (2, False)
    assert got["hq"][1] is True  # 'q' has no piece -> [UNK]
    plan = (
        wordpiece_encode_counts(df, vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_wordpiece_encode_stats_hand_computed(spark, tmp_path):
    """text_wordpiece_encode on a corpus whose 8 merges are derivable
    by hand: quantized-score ties break (a ASC, b ASC), so (c,##d)
    and (e,##f) (score 1.0) merge before the abab chain; after round 5
    every word is ONE piece — each lang's pieces == tokens, zero
    UNKs."""
    from python_multiproc_bigdata_spark.registry.text import (
        text_wordpiece_encode,
    )

    rows = [(0, "abab abab cd", "en", "s", 1), (1, "abab ef", "de", "s", 1)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in text_wordpiece_encode(spark, str(tmp_path)).collect()}
    assert set(out) == {"en", "de"}
    assert (out["en"].n_tokens, out["en"].n_pieces, out["en"].n_unk_tokens) == (3, 3, 0)
    assert (out["de"].n_tokens, out["de"].n_pieces, out["de"].n_unk_tokens) == (2, 2, 0)
    assert out["en"].pieces_per_token == 1.0
