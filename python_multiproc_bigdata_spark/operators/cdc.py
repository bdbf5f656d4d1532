"""CDC / upsert patterns (guide: 'MERGE INTO needs Delta; in v1 emulate
with anti-join + union + window').

Spark core has no MERGE INTO without a table format (Delta/Iceberg —
jars absent in this image), so the batch emulation is the operator:
upsert = updates ∪ (target ⟂ updates). At scale both sides shuffle once
on the key; with a bucketed target the anti-join is co-located.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE INTO emulation: rows from `updates` win on key collision;
    unmatched target rows pass through. Schemas must match."""
    key_list = list(keys)
    untouched = target.join(updates.select(*key_list), key_list, "left_anti")
    return untouched.unionByName(updates)


def latest_per_key(
    changes: DataFrame, keys: Sequence[str], version_col: str
) -> DataFrame:
    """Change-log compaction: keep each key's highest-version row (the
    second half of a CDC apply — dedupe a multi-version change feed
    before upserting). Deterministic via version desc, then arbitrary-
    but-stable struct max is avoided: require unique (key, version)."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.desc(version_col)
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
