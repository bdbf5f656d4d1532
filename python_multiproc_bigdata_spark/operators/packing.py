"""Sequence packing: assign documents to fixed-token-budget training
bins — the step between a curated corpus and actual training batches
(beyond-reference; completes the training-data story of
registry/training.py).

Two semantics, matching the two ways production pipelines pack:

- `chunk_pack`: concat-then-chunk. Documents are laid out end-to-end in
  a deterministic per-shard order and the stream is cut every `budget`
  tokens; a document belongs to the bin where it STARTS (documents may
  straddle a cut — exactly what concat-and-chunk pretraining loaders
  do). This is a pure prefix-sum: one window aggregate per shard, fully
  parallel, no state.

- `greedy_pack`: first-fit-sequential. Walk the shard in order and
  start a new bin whenever the next document would overflow the budget
  (documents never straddle; bins under-fill instead). The fill level
  resets on overflow, so this is an ordered FOLD, not a prefix sum —
  no window function expresses it. It runs as one Arrow-batched
  applyInPandas pass per shard: the payload is metadata only
  (id + token count, ~16 bytes/doc — a 10^8-doc shard is ~1.6 GB),
  so the shard key chooses the parallelism/coherence trade-off; at
  100 TB shard by (lang, hash-bucket) to bound the per-task list, at
  the cost of one final partially-filled bin per extra bucket.

Both orders by the id column — packing must be deterministic or two
runs of the same corpus produce different batches (and different loss
curves).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_pack(
    df: DataFrame,
    budget: int,
    by: str,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(by, id, n_tokens, offset, bin_id): concat-then-chunk packing.
    `offset` is the document's start position in the shard's concatenated
    token stream; `bin_id = offset // budget`. One RANGE-frame window sum
    per shard — Catalyst plans a single sort+window, no shuffle beyond
    the partitionBy, and the frame is safe because `id_col` is unique
    within a shard (ties would otherwise share a cumulative value)."""
    w = Window.partitionBy(by).orderBy(id_col)
    offset = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("long")
    return df.select(
        by,
        id_col,
        tokens_col,
        offset.alias("offset"),
        F.floor(offset / F.lit(budget)).cast("long").alias("bin_id"),
    )


def greedy_pack(
    df: DataFrame,
    budget: int,
    by: str,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(by, id, n_tokens, bin_id): first-fit-sequential packing per
    shard. A document larger than the budget gets a bin of its own (it
    always overflows the running fill). Implemented as applyInPandas —
    the per-shard fold is inherently sequential, but shards pack in
    parallel and only (id, token-count) metadata moves through Arrow."""
    out_schema = f"{by} string, {id_col} long, {tokens_col} long, bin_id long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        bins: list[int] = []
        fill = 0
        b = -1  # first doc always "overflows" the empty fill into bin 0
        for t in pdf[tokens_col]:
            if b >= 0 and fill + t <= budget:
                fill += t
            else:
                b += 1
                fill = t
            bins.append(b)
        pdf = pdf[[by, id_col, tokens_col]].copy()
        pdf["bin_id"] = bins
        return pdf

    return (
        df.select(by, id_col, tokens_col).groupBy(by).applyInPandas(pack, out_schema)
    )


def chunk_documents(
    df: DataFrame,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = r"[ \t\n\r\f\x0B]+",
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens): cut each document into
    sliding token windows of `size` tokens starting every `stride`
    tokens (stride < size → overlapping context windows, stride == size
    → disjoint). Chunk starts are 0, stride, 2·stride, … for every start
    < the doc's token count, so each token lands in ≥1 chunk and the
    last chunk may run short — the deterministic rule RAG/pretraining
    chunkers use.

    Entirely JVM-side: tokenize once in a projection, `sequence()` the
    start offsets, posexplode, `slice()` each window out of the kept
    token array. Chunking inherently rewrites the corpus ~size/stride×
    — that output amplification is the cost of the operator itself, not
    plan overhead; the explode is map-only (no shuffle), so it pipelines
    into whatever consumes the chunks.
    """
    if not (0 < stride <= size):
        raise ValueError(f"need 0 < stride <= size, got {stride=} {size=}")
    toks = df.select(
        id_col,
        F.filter(F.split(text_col, pattern), lambda w: F.length(w) > 0).alias("_t"),
    ).filter(F.size("_t") > 0)
    starts = F.sequence(F.lit(0), F.size("_t") - 1, F.lit(stride))
    return toks.select(
        id_col, "_t", F.posexplode(starts).alias("chunk_id", "_start")
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(F.slice("_t", F.col("_start") + 1, size), " ").alias(
            "chunk_text"
        ),
        F.least(F.lit(size), F.size("_t") - F.col("_start"))
        .cast("long")
        .alias("n_tokens"),
    )


def length_bucketed_batches(
    df: DataFrame,
    batch_size: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(bucket, batch_id, n_docs, max_tokens, sum_tokens, pad_frac):
    length-bucketed batching — the third packing semantics alongside
    concat-then-chunk and first-fit: sequences are grouped into
    power-of-two length classes and batched WITHIN a class, so each
    batch pads to its own max length instead of the global one (the
    padding-efficiency trick dynamic-batching trainers use; pad_frac is
    the padding waste that batch still pays).

    The length class is the token count's BIT LENGTH (length of its
    base-2 string — integer/string ops only, deliberately not
    floor(log2(x)), whose float boundary at exact powers of two is an
    engine-parity flake). Batching is deterministic: docs order by id
    within a bucket, batch_id = (rank-1) // batch_size.

    Scale: one shuffle on the bucket key (≤ ~20 buckets for any real
    corpus — at 100 TB salt the bucket with a shard hash to spread the
    window, same recipe as operators/skew.py), then one partial-agg
    groupBy. The output is one row per BATCH, corpus-size / batch_size
    rows."""
    bucket = (
        F.when(F.col(tokens_col) <= 0, F.lit(0))
        .otherwise(F.length(F.conv(F.col(tokens_col).cast("string"), 10, 2)))
        .cast("int")
    )
    b = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        bucket.alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    rows = b.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / F.lit(batch_size)).cast("long"),
    )
    return rows.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max(tokens_col).alias("max_tokens"),
        F.sum(tokens_col).alias("sum_tokens"),
        F.when(
            F.max(tokens_col) > 0,
            F.round(
                F.lit(1.0)
                - F.sum(tokens_col) / (F.count(F.lit(1)) * F.max(tokens_col)),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("pad_frac"),
    )


def bin_stats(
    packed: DataFrame, budget: int, by: str, tokens_col: str = "n_tokens"
) -> DataFrame:
    """Per-bin packing report: (by, bin_id, n_docs, bin_tokens,
    fill_ratio). The consumer-side sanity check — mean fill_ratio is the
    padding waste a training run will pay."""
    return packed.groupBy(by, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).alias("bin_tokens"),
        F.round(F.sum(tokens_col) / F.lit(budget), 4).alias("fill_ratio"),
    )
