"""Byte-pair-encoding merge training (Sennrich et al. 2016, the public
subword-tokenizer algorithm) — the canonical tokenizer-training step of a
large-scale training-data pipeline, distributed Spark-first.

Generalizes the reference's token-frequency pipeline (its words ETL
counts whole words; v2/main.py) one rung up the stack: BPE learns WHICH
subword units to count.

Scale shape (the property that makes BPE feasible at 100 TB):
- ONE corpus-scale shuffle — the word-frequency groupBy (word-count
  shaped, map-side combined). Everything after operates on the VOCABULARY
  (distinct words + counts), which is corpus-size-independent (Heaps'
  law: ~millions of rows for web corpora vs trillions of tokens).
- Each merge iteration is an explode + sum-agg over the vocab relation
  plus a LIMIT-1 collect of the argmax pair — a driver-side scalar per
  iteration, like the k-means centroid collects (O(n_merges), not
  O(data)).
- The merge application is a JVM-side F.aggregate fold per word (greedy
  left-to-right non-overlapping, the textbook scan) — vocab words are
  short, so the per-row fold is trivially bounded.
- The evolving vocab relation is persisted per iteration and the prior
  one unpersisted — iteration i+1 reads a cached ~vocab-sized frame, not
  the corpus (same discipline as the k-means Lloyd loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.functions.text import WHITESPACE_RE


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over the whitespace token stream — the single
    corpus-scale aggregation BPE needs.

    Deliberately NOT fan_out_scan'd (r12): an interleaved A/B at sf0.1
    showed the fan neutral-to-negative here (tokenize+explode+count is
    memory-bandwidth-cheap per row, unlike the md5-dense shingle maps) —
    and at real scale the scan fans out by itself."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = df.select(F.explode(F.split(txt, WHITESPACE_RE)).alias("word")).filter(
        F.length(F.trim("word")) > 0
    )
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def apply_merge(syms_col: str, a: str, b: str, merged: str | None = None) -> Column:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    symbol pair (a, b) with the merged symbol (a||b unless overridden —
    WordPiece strips b's '##' continuation prefix) — one F.aggregate
    fold per row, JVM-side. The accumulator carries the output prefix
    plus the one pending symbol the scan hasn't committed yet; after a
    merge the merged symbol is committed immediately, so it can't chain
    as the left element of another (a, b) hit in the same pass
    (textbook BPE)."""
    merged = merged if merged is not None else a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: Column, s: Column) -> Column:
        hit = acc.pend.isNotNull() & (acc.pend == F.lit(a)) & (s == F.lit(b))
        return F.struct(
            F.when(hit, F.concat(acc.out, F.array(F.lit(merged))))
            .otherwise(
                F.when(
                    acc.pend.isNotNull(), F.concat(acc.out, F.array(acc.pend))
                ).otherwise(acc.out)
            )
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s).alias("pend"),
        )

    def finish(acc: Column) -> Column:
        return F.when(
            acc.pend.isNotNull(), F.concat(acc.out, F.array(acc.pend))
        ).otherwise(acc.out)

    return F.aggregate(syms_col, init, step, finish)


def _accept_batch(
    rows,
    tail: int,
    known_merged: set[str],
    batch_k: int,
) -> list[tuple[str, str, int]]:
    """From one snapshot of the top pair counts (ordered c DESC, a ASC,
    b ASC), accept the longest PROVABLY-sequential prefix of merges —
    the batch is valid iff replaying it one-at-a-time would pick the
    exact same pairs in the exact same order. Pure driver-side logic on
    ≤ topk rows; no Spark.

    Proof obligations per candidate i (vs the accepted j < i):
    - its snapshot count is still exact: {a_i, b_i} shares no symbol
      with any accepted pair, and neither side equals an accepted
      merged string (a collision would CREATE occurrences of a_i/b_i);
    - nothing that merge j changed or created can beat it: every
      changed pair involves a_j or b_j, and every NEW pair (x, a_j b_j)
      arises from a snapshot pair (x, a_j) / (b_j, y) — all bounded by
      d = max snapshot count over collected pairs touching an accepted
      symbol, or by `tail` (the last collected count bounds every
      uncollected pair). Strict c_i > d keeps tie order intact;
    - no merged string collides with an existing symbol (the initial
      alphabet is single chars, so every multi-char symbol is a prior
      merge — known_merged is the exact collision set): a collision
      would conflate new pairs with surviving ones and break the bound.
    The first candidate that cannot be proven stops the batch (the next
    aggregation round re-derives exact counts)."""
    accepted: list[tuple[str, str, int]] = []
    acc_pairs: set[tuple[str, str]] = set()
    acc_syms: set[str] = set()
    acc_merged: set[str] = set()
    for row in rows:
        if len(accepted) >= batch_k:
            break
        a, b, c = row["a"], row["b"], int(row["c"])
        if accepted:
            if a in acc_syms or b in acc_syms or a in acc_merged or b in acc_merged:
                break
            d = tail
            for r in rows:
                ra, rb = r["a"], r["b"]
                if (ra, rb) in acc_pairs:
                    continue
                if ra in acc_syms or rb in acc_syms:
                    d = max(d, int(r["c"]))
            if c <= d:
                break
        if a + b in known_merged or a + b in acc_merged:
            # collision: accept this merge alone-terminated (it is the
            # true argmax — exact snapshot count — but nothing after it
            # can be proven once conflation is possible)
            accepted.append((a, b, c))
            break
        accepted.append((a, b, c))
        acc_pairs.add((a, b))
        acc_syms |= {a, b}
        acc_merged.add(a + b)
    return accepted


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    lowercase: bool = True,
    batch_k: int = 8,
    topk: int = 64,
    wf: DataFrame | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn the first `n_merges` BPE merges; returns
    [(rank, left_sym, right_sym, pair_freq), ...].

    Ties break deterministically by (pair_freq DESC, left ASC, right ASC)
    — binary string order, identical in Spark (UTF-8 byte order) and any
    replayer comparing code points, since UTF-8 order equals code-point
    order.

    Batched driver rounds (r10): instead of one Spark aggregation + one
    argmax collect PER MERGE, each round collects the top-`topk` pair
    counts once and accepts the longest prefix of merges that is
    PROVABLY identical to the sequential greedy (_accept_batch — symbol
    disjointness + a strict dominance bound over everything a prior
    merge in the batch could have changed), then applies the whole
    batch as chained JVM folds with ONE eager checkpoint. The merge
    SEQUENCE is bit-identical to one-at-a-time training by
    construction; only the job count drops (|merges| + |merges|/4
    jobs → ~2 per round, with round count corpus-dependent — Zipfian
    pair tables with well-separated counts batch several merges per
    round, adversarial ties degrade gracefully to one).

    `wf` optionally supplies a prebuilt (word, freq) relation (caller
    persists it) so compositions sharing the word-count pass compute it
    once — r12, guide §1.2."""
    wf = wf if wf is not None else word_frequencies(df, text_col, lowercase)
    # The vocab relation is small (Heaps' law) — 8 partitions keeps each
    # iteration's task count (and so its scheduling overhead) bounded;
    # raise for a web-scale vocabulary.
    cur = (
        wf.select("freq", F.split("word", "").alias("syms"))
        .repartition(8)
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        pairs = (
            cur.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.size("syms") - 1).alias("a"),
                        F.slice("syms", 2, F.size("syms") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("c"))
        )
        rows = [
            r
            for r in pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(topk)
            .collect()
            if r["c"] is not None
        ]
        if not rows:
            break
        # every uncollected pair's count is bounded by the last
        # collected one; a short page means we saw the whole relation
        tail = int(rows[-1]["c"]) if len(rows) == topk else 0
        known_merged = {a + b for _, a, b, _ in merges}
        batch = _accept_batch(
            rows, tail, known_merged, min(batch_k, n_merges - len(merges))
        )
        base = len(merges)
        merges.extend(
            (base + i, a, b, c) for i, (a, b, c) in enumerate(batch, start=1)
        )
        if len(merges) < n_merges:
            nxt = cur
            for a, b, _c in batch:
                nxt = nxt.withColumn("syms", apply_merge("syms", a, b))
            # one eager checkpoint per ROUND: truncates the accreting
            # fold plan and materializes the new generation (the r8
            # form paid a collect plus a persist/checkpoint per MERGE).
            # A lazy checkpoint here (folding the materialization into
            # the next round's collect job) was tried and measured
            # SLOWER (3.7 s vs 2.7 s median at sf0.1) — the fused job's
            # serial critical path beats the two short parallel jobs.
            cur = nxt.localCheckpoint(eager=True)
    return merges


def bpe_symbol_counts(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    lowercase: bool = True,
    wf: DataFrame | None = None,
) -> DataFrame:
    """Apply a learned merge list and return (word, n_syms): the symbol
    count of every DISTINCT word after replaying the merges in rank
    order. The folds run over the VOCABULARY, never the token stream —
    the encode-side twin of the training loop's scale property (a 100 TB
    corpus has a bounded vocab; per-token folding would redo identical
    work millions of times). Callers join the result back onto the token
    stream (vocab-sized build side — AQE broadcasts it).

    Every 4th merge localCheckpoints to truncate the accreting fold
    plan, matching bpe_train_merges. `wf` as in bpe_train_merges."""
    wf = wf if wf is not None else word_frequencies(df, text_col, lowercase)
    cur = wf.select("word", F.split("word", "").alias("syms")).repartition(8)
    for i, (_, a, b, _c) in enumerate(sorted(merges), start=1):
        cur = cur.withColumn("syms", apply_merge("syms", a, b))
        if i % 4 == 0:
            cur = cur.localCheckpoint(eager=True)
    return cur.select("word", F.size("syms").alias("n_syms"))


def wordpiece_train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    lowercase: bool = True,
    wf: DataFrame | None = None,
) -> list[tuple[int, str, str, int, int]]:
    """Learn the first `n_merges` WORDPIECE merges (Schuster & Nakajima
    2012 — BPE's likelihood-scored sibling and the third member of the
    tokenizer-training family beside BPE and unigram-LM): words split
    as [c0, ##c1, ##c2, ...] and each round merges the adjacent pair
    maximizing score = count(ab) / (count(a)·count(b)) instead of raw
    count (a pair of RARE symbols that always co-occur beats a pair of
    common ones that co-occur incidentally — the LM-likelihood-gain
    argmax). Returns [(rank, left, right, pair_freq, score_q)].

    Determinism contract (the cross-engine exactness trick): the score
    is compared as the QUANTIZED integer q = (c·10¹²) div (ca·cb) —
    exact integer arithmetic on both engines (Spark DECIMAL(38,0)
    integral div ≡ Python //), ties broken (a ASC, b ASC). A float
    ratio would be argmax-unstable across engines at near-equal scores;
    the quantization IS the training rule, stated rather than hidden.

    Scale shape = BPE's: ONE corpus-scale word-count shuffle, then
    per-round work on the vocabulary relation — a pair-count agg scored
    against DRIVER-MAINTAINED exact symbol counts and a 1-row argmax
    collect. Merge application reuses the JVM apply_merge fold with the
    '##' prefix stripped from the right symbol. `wf` as in
    bpe_train_merges.

    Symbol counts (r13): WordPiece's denominator input is
    alphabet-bounded (distinct SYMBOLS = training characters + '##'
    variants + one per merge — not words), so it is collected once and
    then maintained EXACTLY on the driver: merging (a, b) with a != b
    applies at every adjacent occurrence (overlap needs
    syms[i+1] = a = b), so count'(a) = count(a) - c, count'(b) =
    count(b) - c, count(merged) += c — the identical integers a per-round
    re-aggregation (or the oracle's Counter replay) produces. An a == b
    merge (overlap-capable, applied count not derivable from c) just
    invalidates the cache and the next round re-collects. This removes
    the per-round symbol-count aggregation AND both broadcast joins
    (r12 ran the scounts subtree twice per round, once per broadcast
    build): rounds 2+ are ONE Spark job each instead of three."""
    wf = wf if wf is not None else word_frequencies(df, text_col, lowercase)
    chars = F.split("word", "")
    syms = F.transform(
        chars,
        lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit("##"), c)),
    )
    cur = (
        wf.select("freq", syms.alias("syms"))
        .repartition(8)
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int, int]] = []
    sc: dict[str, int] | None = None  # exact symbol counts (see docstring)
    for rank in range(1, n_merges + 1):
        # NOTE (r12): fusing the pair and symbol aggregations into one
        # tagged explode + single groupBy (one vocab pass/round instead
        # of two) was tried and measured DECISIVELY slower at sf0.1
        # (4.75 -> 7.9 s median interleaved A/B) — the widened explode
        # projection triples the syms references in one stage on top of
        # the accreting apply_merge fold. The r13 driver-maintained
        # counts remove the second pass without widening the first.
        pairs = (
            cur.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.size("syms") - 1).alias("a"),
                        F.slice("syms", 2, F.size("syms") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("c"))
        )
        if sc is None:
            sc = {
                r["s"]: int(r["sc"])
                for r in cur.select("freq", F.explode("syms").alias("s"))
                .groupBy("s")
                .agg(F.sum("freq").alias("sc"))
                .collect()
            }
        if len(sc) <= 4096:
            # constant-folded literal map: O(|alphabet|) lookup per pair
            # row, zero extra jobs. Fine for any realistic alphabet.
            smap = F.create_map(
                *[
                    lit
                    for s, v in sorted(sc.items())
                    for lit in (F.lit(s), F.lit(v).cast("long"))
                ]
            )
            withcounts = pairs.withColumn(
                "ca", F.element_at(smap, F.col("a"))
            ).withColumn("cb", F.element_at(smap, F.col("b")))
        else:
            # mega-alphabet guard (full-Unicode corpora): hash-lookup via
            # broadcast joins of a LOCAL relation (no re-aggregation —
            # the counts are still the driver-maintained exact ones).
            scd = cur.sparkSession.createDataFrame(
                sorted(sc.items()), schema="s string, scnt long"
            )
            withcounts = pairs.join(
                F.broadcast(scd.select(F.col("s").alias("a"), F.col("scnt").alias("ca"))),
                "a",
            ).join(
                F.broadcast(scd.select(F.col("s").alias("b"), F.col("scnt").alias("cb"))),
                "b",
            )
        scored = withcounts.withColumn(
            "q",
            F.expr(
                "CAST((CAST(c AS DECIMAL(38,0)) * 1000000000000) div "
                "(CAST(ca AS DECIMAL(38,0)) * CAST(cb AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
        top = scored.orderBy(F.desc("q"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top:
            break
        a, b, c, qv = top[0]["a"], top[0]["b"], int(top[0]["c"]), int(top[0]["q"])
        merged = a + (b[2:] if b.startswith("##") else b)
        merges.append((rank, a, b, c, qv))
        if a != b:
            sc[a] -= c
            sc[b] -= c
            if sc[a] == 0:
                del sc[a]
            if sc[b] == 0:
                del sc[b]
            sc[merged] = sc.get(merged, 0) + c
        else:
            sc = None  # applied count != c possible under overlap
        if rank < n_merges:
            cur = cur.withColumn("syms", apply_merge("syms", a, b, merged))
            # cadence 4 re-A/B'd r13 under the clean-cache harness:
            # eager-every-round measured 6.2/10.6 s vs 4.5/5.6 s
            # (merges/encode, 2 interleaved rounds) — the extra
            # materialization jobs cost more than the shorter fold
            # plans save. Kept at every 4th merge.
            if rank % 4 == 0:
                cur = cur.localCheckpoint(eager=True)
    return merges


def wordpiece_vocab(
    df: DataFrame,
    merges: list[tuple[int, str, str, int, int]],
    text_col: str = "text",
    lowercase: bool = True,
    wf: DataFrame | None = None,
) -> list[str]:
    """The WordPiece vocabulary a trained merge list induces: every
    word-initial / '##'-continuation CHARACTER symbol observed in the
    training corpus plus the merged symbols, sorted. The alphabet
    collect is vocab-bounded (distinct symbols, not words — the same
    boundedness argument as the training loop's 1-row argmax).
    `wf` as in bpe_train_merges."""
    wf = wf if wf is not None else word_frequencies(df, text_col, lowercase)
    chars = F.split("word", "")
    syms = F.transform(
        chars,
        lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit("##"), c)),
    )
    alphabet = [
        r["s"]
        for r in wf.select(F.explode(syms).alias("s")).distinct().collect()
    ]
    merged = [a + (b[2:] if b.startswith("##") else b) for _, a, b, _c, _q in merges]
    return sorted(set(alphabet) | set(merged))


def wordpiece_encode_counts(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    lowercase: bool = True,
    wf: DataFrame | None = None,
) -> DataFrame:
    """WordPiece INFERENCE (greedy longest-match-first, the rule
    Schuster & Nakajima tokenizers apply at serving time) over the
    DISTINCT vocabulary of `df`, entirely as a JVM fold — apply_merge's
    sibling: returns (word, n_pieces, is_unk) where n_pieces is the
    piece count under maximal munch against `vocab` and is_unk marks a
    word with an unmatchable position (standard WordPiece maps the
    WHOLE word to [UNK]).

    The fold runs over character POSITIONS: the accumulator carries
    (next unmatched position, piece count, unk flag); at each active
    position an ascending when-chain over candidate lengths 1..L (L =
    the longest vocab symbol, a driver-known literal) keeps the LAST
    matching length — ascending order with override IS longest-match.
    Positions inside a committed piece are skipped. Work is
    vocab-bounded (distinct words), never per-token; callers join the
    result back onto the token stream (AQE broadcasts it)."""
    max_len = max(len(v) - 2 if v.startswith("##") else len(v) for v in vocab)
    varr = F.array(*[F.lit(v) for v in sorted(vocab)])
    wf = wf if wf is not None else word_frequencies(df, text_col, lowercase)
    w = F.col("word")
    init = F.struct(
        F.lit(0).alias("nxt"), F.lit(0).alias("np"), F.lit(False).alias("unk")
    )

    def step(acc, p):
        active = (~acc.unk) & (p == acc.nxt)
        mlen = F.lit(0)
        for ln in range(1, max_len + 1):
            piece = F.concat(
                F.when(p == 0, F.lit("")).otherwise(F.lit("##")),
                F.substring(w, p + 1, F.lit(ln)),
            )
            ok = (F.length(w) >= p + ln) & F.array_contains(varr, piece)
            mlen = F.when(ok, F.lit(ln)).otherwise(mlen)
        hit = active & (mlen > 0)
        return F.struct(
            F.when(hit, p + mlen).otherwise(acc.nxt).alias("nxt"),
            F.when(hit, acc.np + 1).otherwise(acc.np).alias("np"),
            (acc.unk | (active & (mlen == 0))).alias("unk"),
        )

    acc = F.aggregate(
        F.sequence(F.lit(0), F.length(w) - 1),
        init,
        step,
        lambda a: F.struct(a.np.alias("np"), a.unk.alias("unk")),
    )
    return wf.select(
        "word",
        acc.np.alias("n_pieces"),
        acc.unk.alias("is_unk"),
    )
