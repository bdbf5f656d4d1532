"""Join operators Spark lacks natively (SURVEY §2.7 lists joins as new
surface; the guide's OLAP patterns name as-of and range joins as the two
worth hand-building).

Both are built from shuffle-friendly primitives — union+window for as-of,
bucket-equi-join for range — so they scale like any groupBy: no crossJoin,
no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join with pd.merge_asof semantics
    (allow_exact_matches=True) in all three directions:

    - ``backward``: greatest right ``on`` ≤ left.``on`` (default)
    - ``forward``:  smallest right ``on`` ≥ left.``on``
    - ``nearest``:  whichever of the two is closer by |Δon|; ties go to
      the backward match (pandas' tie rule). Requires a NUMERIC ``on``
      column (pass e.g. unix_micros(ts)) so the distance arithmetic is
      exact — doubles near epoch-second magnitude can't resolve 1 µs.

    Implementation: tag and union both sides, then one window per ``by``
    key ordered by (on, side) carries the last non-null right payload
    forward; left rows read it. ONE shuffle on ``by`` — at 100 TB this
    beats the per-group ``applyInPandas``+``merge_asof`` alternative
    because no Python worker ever sees the data. ``forward`` is the same
    scan ordered descending; ``nearest`` evaluates both orderings over
    the SAME exchange (two sorts, one shuffle) and picks per-row.

    Right side must be unique per (by, on) — pre-aggregate if not, or
    the carried payload at a tied timestamp is undefined.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    # the right `on` value rides inside the payload struct as `_ron` so
    # `nearest` can compare distances; it's stripped from the output.
    payload = F.struct(
        F.col(on).alias("_ron"), *[F.col(c) for c in right_payload]
    ).alias("_payload")
    r = right.select(
        F.col(by).alias("_by"), F.col(on).alias("_on"), F.lit(0).alias("_side"), payload
    )
    l = left.withColumn("_by", F.col(by)).withColumn("_on", F.col(on)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_payload", F.lit(None).cast(r.schema["_payload"].dataType))
    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps (side 0 < 1 in
    # both orderings) → exact matches are visible to the left row.
    w_back = (
        Window.partitionBy("_by")
        .orderBy(F.col("_on").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("_by")
        .orderBy(F.col("_on").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if direction == "backward":
        matched = F.last("_payload", ignorenulls=True).over(w_back)
    elif direction == "forward":
        matched = F.last("_payload", ignorenulls=True).over(w_fwd)
    else:
        b = F.last("_payload", ignorenulls=True).over(w_back)
        f = F.last("_payload", ignorenulls=True).over(w_fwd)
        matched = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(F.col("_on") - b["_ron"] <= f["_ron"] - F.col("_on"), b)
            .otherwise(f)
        )
    carried = unioned.withColumn("_matched", matched)
    stripped = F.when(
        F.col("_matched").isNotNull(),
        F.struct(*[F.col("_matched")[c].alias(c) for c in right_payload]),
    )
    out_cols = [c for c in left.columns] + [stripped.alias("asof")]
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_a: str,
    end_a: str,
    start_b: str,
    end_b: str,
    width: float,
) -> DataFrame:
    """Pairs (l, r) whose closed intervals [start_a, end_a] and
    [start_b, end_b] overlap (greatest(starts) ≤ least(ends)) — the
    interval-interval generalization of range_join_bucketed's
    point-to-point gap join.

    Bucketized: each interval explodes to the ``width``-buckets it
    covers, pairs meet by bucket equi-join (hash, not nested-loop), an
    exact predicate keeps true overlaps, and each pair survives ONLY in
    the bucket containing greatest(start_a, start_b) — the standard
    dedup rule that makes the bucketed join emit every overlapping pair
    exactly once. Pick ``width`` near the typical interval length: the
    explode factor is len/width + 1 per row, while too-wide buckets
    inflate the per-bucket candidate cross product.

    Intervals must be numeric with start ≤ end (a reversed interval is
    clamped to empty rather than crashing sequence()). All four column
    names must be distinct; other columns must not collide.
    """
    def buckets(s: str, e: str):
        lo = F.floor(F.col(s) / width)
        # total even on bad rows: Catalyst may evaluate project
        # expressions on rows a later Filter drops, and sequence(hi, lo)
        # with hi > lo goes DESCENDING instead of failing
        hi = F.greatest(F.floor(F.col(e) / width), lo)
        return F.explode(F.sequence(lo, hi))

    la = left.withColumn("_bucket", buckets(start_a, end_a))
    rb = right.withColumn("_bucket", buckets(start_b, end_b))
    ov_start = F.greatest(F.col(start_a), F.col(start_b))
    return (
        la.join(rb, "_bucket")
        .filter(ov_start <= F.least(F.col(end_a), F.col(end_b)))
        .filter(F.floor(ov_start / width) == F.col("_bucket"))
        .drop("_bucket")
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    max_gap: float,
    bucket_width: float | None = None,
) -> DataFrame:
    """Range join: pairs (l, r) with the same ``by`` key and
    0 < r.on − l.on ≤ max_gap.

    Implementation: bucketize the range key to ``bucket_width`` (default
    max_gap) and equi-join on (by, bucket) with the left side exploded to
    {bucket, bucket+1} — every qualifying pair shares one of those two
    buckets; a final filter applies the exact predicate. Turns an
    inequality join (O(n²) nested loop) into a hash join.

    Both sides must carry columns named ``on`` and ``by``; all other
    column names must be disjoint (alias beforehand). Output keeps
    left's columns, right's extra columns, and `_lon`/`_ron` (the two
    range keys as doubles).
    """
    width = max_gap if bucket_width is None else bucket_width
    if width < max_gap:
        raise ValueError(
            f"bucket_width ({width}) must be >= max_gap ({max_gap}): the left "
            "side only probes {bucket, bucket+1}, so a narrower bucket would "
            "silently drop qualifying pairs more than one bucket apart"
        )
    lon = F.col(on).cast("double")
    lb = left.withColumn("_lon", lon).withColumn(
        "_bucket",
        F.explode(F.array(F.floor(lon / width), F.floor(lon / width) + 1)),
    ).drop(on)
    rb = (
        right.withColumn("_ron", F.col(on).cast("double"))
        .withColumn("_bucket", F.floor(F.col(on).cast("double") / width))
        .drop(on)
    )
    return (
        lb.join(rb, [by, "_bucket"])
        .filter(
            (F.col("_ron") - F.col("_lon") > 0)
            & (F.col("_ron") - F.col("_lon") <= max_gap)
        )
        .drop("_bucket")
    )
