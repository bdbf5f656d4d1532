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
    corpus-scale aggregation BPE needs."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = df.select(F.explode(F.split(txt, WHITESPACE_RE)).alias("word")).filter(
        F.length(F.trim("word")) > 0
    )
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def apply_merge(syms_col: str, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    symbol pair (a, b) with the merged symbol a||b — one F.aggregate fold
    per row, JVM-side. The accumulator carries the output prefix plus the
    one pending symbol the scan hasn't committed yet; after a merge the
    merged symbol is committed immediately, so it can't chain as the left
    element of another (a, b) hit in the same pass (textbook BPE)."""
    merged = a + b
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


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    lowercase: bool = True,
) -> list[tuple[int, str, str, int]]:
    """Learn the first `n_merges` BPE merges; returns
    [(rank, left_sym, right_sym, pair_freq), ...].

    Ties break deterministically by (pair_freq DESC, left ASC, right ASC)
    — binary string order, identical in Spark (UTF-8 byte order) and any
    replayer comparing code points, since UTF-8 order equals code-point
    order."""
    wf = word_frequencies(df, text_col, lowercase)
    # The vocab relation is small (Heaps' law) — 8 partitions keeps each
    # iteration's task count (and so its scheduling overhead) bounded;
    # raise for a web-scale vocabulary.
    cur = (
        wf.select("freq", F.split("word", "").alias("syms"))
        .repartition(8)
        .persist()
    )
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
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
            # ONE action per iteration: the argmax collect materializes
            # `cur`'s persist; only then is the previous generation safe
            # to drop (unpersisting earlier would force a full lineage
            # recompute from the corpus).
            best = pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b")).limit(1).collect()
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best or best[0]["c"] is None:
                break
            a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
            merges.append((rank, a, b, c))
            if rank < n_merges:
                nxt = cur.withColumn("syms", apply_merge("syms", a, b))
                # every 4th generation localCheckpoints instead of
                # persisting: the logical plan otherwise accretes one
                # nested F.aggregate fold per merge and analysis/
                # optimization re-walks the whole chain each iteration —
                # checkpointing truncates it (measured 5.2 s → below at
                # sf0.1, and the effect compounds with n_merges)
                if rank % 4 == 0:
                    nxt = nxt.localCheckpoint(eager=True)
                else:
                    nxt = nxt.persist()
                prev, cur = cur, nxt
    finally:
        cur.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def bpe_symbol_counts(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Apply a learned merge list and return (word, n_syms): the symbol
    count of every DISTINCT word after replaying the merges in rank
    order. The folds run over the VOCABULARY, never the token stream —
    the encode-side twin of the training loop's scale property (a 100 TB
    corpus has a bounded vocab; per-token folding would redo identical
    work millions of times). Callers join the result back onto the token
    stream (vocab-sized build side — AQE broadcasts it).

    Every 4th merge localCheckpoints to truncate the accreting fold
    plan, matching bpe_train_merges."""
    wf = word_frequencies(df, text_col, lowercase)
    cur = wf.select("word", F.split("word", "").alias("syms")).repartition(8)
    for i, (_, a, b, _c) in enumerate(sorted(merges), start=1):
        cur = cur.withColumn("syms", apply_merge("syms", a, b))
        if i % 4 == 0:
            cur = cur.localCheckpoint(eager=True)
    return cur.select("word", F.size("syms").alias("n_syms"))
