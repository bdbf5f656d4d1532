"""Skew mitigation (north-star scale requirement: 'skewed keys → salting
or AQE skew-join').

AQE's skew-join handling (on by default in session.py) covers sort-merge
joins; these helpers cover the two cases AQE does not:

- `salted_count_per_key`: a single hot GROUP BY key melts one reducer.
  Two-phase aggregation through a random salt spreads the partial
  aggregation over `salt_buckets` reducers; the final merge shuffles only
  one row per (key, salt). Works for any algebraic aggregate.
- `salted_broadcast_left_join`: a hot join key on the fact side with a
  small-but-not-tiny dim: replicate the dim `salt_buckets` times (still
  broadcast) and salt the fact side, so one hot key's rows land in
  `salt_buckets` tasks instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_per_key(
    df: DataFrame, keys: Sequence[str], out_col: str = "count", salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-safe count: groupBy(keys + salt) → groupBy(keys).

    Results are identical to count_per_key; only the shuffle layout
    changes. (Spark's own partial aggregation already map-combines, so
    this matters when a single key dominates entire *partitions* — the
    salt forces the second phase to merge tiny partials instead of one
    reducer seeing every row of the hot key.)
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    partial = df.groupBy(*keys, salt).agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(out_col))


def salted_broadcast_left_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """LEFT join fact↔dim on `on` with the dim exploded across salts and
    broadcast. Row-identical to fact.join(broadcast(dim), on, "left"):
    each fact row carries exactly one salt, so unmatched rows survive
    once with null dim columns."""
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    return salted_fact.join(F.broadcast(salted_dim), [on, "_salt"], "left").drop("_salt")
