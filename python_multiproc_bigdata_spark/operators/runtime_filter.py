"""Hand-built runtime join filters (the 'broadcast bitmap semi-join').

Spark's own runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter.
enabled, on in session.py) only injects when its cost model fires, and its
building block `bloom_filter_agg` is not exposed as a public SQL function
in 4.1 — so an engine user who wants a GUARANTEED pre-shuffle prune of a
fact table against a selective dim subset needs it as an operator. This is
the classic TPC-style pattern: at 100 TB the fact side's shuffle dominates
the join, and dropping 95% of fact rows map-side (before the exchange)
beats any join-strategy choice.

Design: a 1-hash Bloom filter materialized as a sparse word table
(word_idx → 64-bit word of set bits), built with ONE tiny aggregation over
the dim keys, then broadcast; the fact side probes it with a broadcast
hash join on word_idx + a bitwise test — all JVM built-ins, no UDF. With
k=1 the false-positive rate is n/m (size num_bits ≥ 16× distinct keys);
false positives are harmless because the exact join that follows removes
them — the composed result is bit-identical to the plain join, which is
what makes the pattern fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_semi_filter(
    big: DataFrame,
    big_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    num_bits: int = 1 << 20,
) -> DataFrame:
    """Return ``big`` with rows whose ``big_key`` cannot appear in
    ``dim_keys[dim_key]`` removed map-side (plus hash false positives,
    rate ≈ distinct_keys/num_bits — callers MUST still apply the exact
    join; this is a prune, not a membership proof).

    Both key columns must be the same type (xxhash64 of the value is the
    bit address, so a bigint 7 and a string '7' would not collide).

    Plan shape: one groupBy over the dim keys (≤ num_bits/64 output
    rows), broadcast to a hash join the fact side probes without any
    fact-side shuffle — the Exchange the plain semi join would need on
    the fact side never happens.
    """
    nbits = F.lit(num_bits)
    # Python's F.shiftleft only takes a literal shift amount — go through
    # the SQL form, which accepts a column.
    bit_of = "shiftleft(CAST(1 AS BIGINT), CAST(_bit_pos AS INT))"
    d_idx = F.pmod(F.xxhash64(F.col(dim_key)), nbits)
    words = (
        dim_keys.select(
            (d_idx / 64).cast("long").alias("_word_idx"),
            (d_idx % 64).alias("_bit_pos"),
        )
        .withColumn("_bit", F.expr(bit_of))
        .groupBy("_word_idx")
        .agg(F.bit_or("_bit").alias("_word"))
    )
    b_idx = F.pmod(F.xxhash64(F.col(big_key)), nbits)
    probed = (
        big.withColumn("_word_idx", (b_idx / 64).cast("long"))
        .withColumn("_bit_pos", b_idx % 64)
        .withColumn("_probe_bit", F.expr(bit_of))
        .drop("_bit_pos")
        # inner join: a fact row whose word was never set by any dim key
        # is dropped right here, map-side against the broadcast table
        .join(F.broadcast(words), "_word_idx")
        .filter(F.col("_word").bitwiseAND(F.col("_probe_bit")) != 0)
    )
    return probed.drop("_word_idx", "_probe_bit", "_word")
