"""Event-stream queries (batch forms) over the `events` table: JSON scalar
extraction, time-bucketed windows, sessionization — SURVEY §7 M4/M5.
Streaming twins live in streaming/ (registry/streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar ops on `props` (SURVEY §7 M4): average of $.k per
    event_type. get_json_object stays JVM-side."""
    e = table(prep(spark), sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_JSON = """
SELECT event_type,
       round(avg(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows — the SAME plan builder the streaming
    variant uses (streaming/windows.py:tumbling_counts), applied to the
    batch DataFrame, so batch/streaming equivalence holds by
    construction rather than by parallel maintenance."""
    from python_multiproc_bigdata_spark.streaming.windows import tumbling_counts

    return tumbling_counts(table(prep(spark), sf_dir, "events"))


SQL_TUMBLING = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
"""


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide) — shared plan builder
    with the streaming variant (see events_tumbling_window note)."""
    from python_multiproc_bigdata_spark.streaming.windows import sliding_counts

    return sliding_counts(table(prep(spark), sf_dir, "events"))


# DuckDB twin: generate both covering window starts per event explicitly.
SQL_SLIDING = """
SELECT window_start, count(*) AS n FROM (
  SELECT unnest([
    time_bucket(INTERVAL '30 minutes', ts),
    time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
  ]) AS window_start
  FROM events
) GROUP BY 1
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag + cumulative-sum of gap>30min flags per
    user (the guide's standard pattern). Emits per-user session count and
    total events. Window partitions are per-user — bounded, scales."""
    e = table(prep(spark), sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional seconds, matching the oracle's epoch() — a long cast
    # would floor-truncate and could flip the gap>1800 session cut
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    sess = F.sum(
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


SQL_SESSIONIZE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), sess AS (
  SELECT user_id,
         sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM sess GROUP BY user_id
"""


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native session windows (F.session_window) in a BATCH
    aggregation — the merge-on-overlap operator itself, complementing
    events_sessionize's lag+cumsum islands formulation. One per-user
    session row with its [start, last_event + gap) bounds.

    Boundary semantics differ from the islands query deliberately: a gap
    of EXACTLY the 30-minute duration starts a new session here (the next
    event does not overlap [ts, ts+30m)), whereas gap > 1800 s starts one
    there — the oracle mirrors this with integer-micros gap >= 1800e6 (no
    float seconds, so the boundary cannot flip on rounding)."""
    e = table(prep(spark), sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


SQL_SESSION_WINDOW = """
WITH gaps AS (
  SELECT user_id, ts, value, event_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), sess AS (
  SELECT user_id, ts, value,
         sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS total_value
FROM sess GROUP BY user_id, sid
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation funnel: users reaching each stage."""
    e = table(prep(spark), sf_dir, "events")
    return e.agg(
        F.countDistinct(F.when(F.col("event_type") == "view", F.col("user_id"))).alias("viewed"),
        F.countDistinct(F.when(F.col("event_type") == "click", F.col("user_id"))).alias("clicked"),
        F.countDistinct(F.when(F.col("event_type") == "purchase", F.col("user_id"))).alias("purchased"),
    )


SQL_FUNNEL = """
SELECT count(DISTINCT user_id) FILTER (WHERE event_type = 'view') AS viewed,
       count(DISTINCT user_id) FILTER (WHERE event_type = 'click') AS clicked,
       count(DISTINCT user_id) FILTER (WHERE event_type = 'purchase') AS purchased
FROM events
"""


def events_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema (vs get_json_object string
    extraction): parse props into a struct, aggregate the typed field."""
    e = table(prep(spark), sf_dir, "events")
    parsed = e.withColumn(
        "p", F.from_json("props", "k INT")
    )
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("p.k")).alias("sum_k"),
        F.count(F.when(F.col("p.k").isNull(), 1)).alias("null_k"),
    )


SQL_FROM_JSON = """
SELECT event_type,
       CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
       count(CASE WHEN props->>'$.k' IS NULL THEN 1 END) AS null_k
FROM events GROUP BY event_type
"""


def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured props: parse_json once
    into an open-schema VARIANT column, then typed variant_get
    extraction — the shredding-friendly shape for 100 TB of
    heterogeneous JSON (no fixed schema to declare up front, columnar
    shredding when written to parquet). Aggregates the high-k slice so
    the extraction feeds both a predicate and a measure."""
    e = table(prep(spark), sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        e.withColumn("k", k)
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_high"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_PROPS_VARIANT = """
SELECT event_type,
       count(*) AS n_high,
       round(avg(k), 4) AS avg_k,
       max(k) AS max_k
FROM (SELECT event_type, (props::JSON ->> 'k')::BIGINT AS k FROM events)
WHERE k >= 50
GROUP BY event_type
ORDER BY event_type
"""


def events_cumulative_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: running value sum per user over event time
    (ROWS UNBOUNDED PRECEDING), reporting each user's final cumulative
    total and peak single-event share."""
    e = table(prep(spark), sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = e.withColumn("running", F.round(F.sum("value").over(w), 4))
    return cum.groupBy("user_id").agg(
        F.max("running").alias("final_total"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_CUMULATIVE = """
WITH cum AS (
  SELECT user_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING), 4) AS running
  FROM events
)
SELECT user_id, max(running) AS final_total, count(*) AS n
FROM cum GROUP BY user_id
"""


def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): per-user inter-event gap stats (mean seconds, max gap)."""
    e = table(prep(spark), sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    return (
        e.withColumn("gap", gap)
        .filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(F.avg("gap"), 4).alias("mean_gap_sec"),
            F.round(F.max("gap"), 4).alias("max_gap_sec"),
        )
    )


SQL_INTERARRIVAL = """
WITH g AS (
  SELECT user_id,
         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id, round(avg(gap), 4) AS mean_gap_sec, round(max(gap), 4) AS max_gap_sec
FROM g WHERE gap IS NOT NULL GROUP BY user_id
"""


def events_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU panel: distinct users + event volume per day. One scan, one
    partial-aggregated groupBy on the day bucket (the distinct expands
    to (day, user) partial dedup — still a word-count shape). Day bucket
    via F.window to mirror the proven time_bucket pairing."""
    e = table(prep(spark), sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("day"), "n_users", "n_events")
    )


SQL_DAU = """
SELECT time_bucket(INTERVAL '1 day', ts) AS day,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY 1
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    distinct actives per (cohort_day, day_offset). Two groupBys (first
    day per user; distinct activity days) + a join keyed on user_id —
    the cohort table is |users| rows, so AQE broadcasts it against the
    activity relation; at 100 TB both sides partial-aggregate before
    any shuffle and the join key is the natural user partitioning."""
    e = table(prep(spark), sf_dir, "events")
    day = F.col("w.start")
    act = (
        e.groupBy("user_id", F.window("ts", "1 day").alias("w"))
        .agg(F.lit(1))
        .select("user_id", day.alias("day"))
    )
    cohort = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: raw → 1-minute
    partials → hourly (aggregating the minute PARTIALS, not raw) →
    daily (aggregating hourly). Only algebraic measures (count, sum,
    min, max) flow through the cascade — avg is derived at the final
    level from sum/count, never re-averaged. At 100 TB this is the
    rollup-maintenance pattern: each level reads the level below
    (minutes: 1440× smaller than raw per day), so refreshing a day
    never rescans raw events; the oracle aggregates raw directly,
    making the re-aggregation equivalence ITSELF the checked claim."""
    e = table(prep(spark), sf_dir, "events")

    def lift(df, src_col: str, trunc: str):
        return df.groupBy(
            F.date_trunc(trunc, F.col(src_col)).alias("bucket")
        ).agg(
            F.sum("n").alias("n"),
            F.sum("sv").alias("sv"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )

    minute = e.groupBy(F.date_trunc("minute", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    hour = lift(minute, "bucket", "hour")
    day = lift(hour, "bucket", "day")
    return day.select(
        F.col("bucket").cast("date").alias("day"),
        F.col("n").alias("n_events"),
        F.round("sv", 2).alias("sum_value"),
        F.round("mn", 6).alias("min_value"),
        F.round("mx", 6).alias("max_value"),
        F.round(F.col("sv") / F.col("n"), 6).alias("avg_value"),
    ).orderBy("day")


SQL_HIERARCHICAL_ROLLUP = """
SELECT date_trunc('day', ts) AS day,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       round(sum(value) / count(*), 6) AS avg_value
FROM events
GROUP BY 1
ORDER BY 1
"""


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: per user, the first view,
    the first click strictly after it, the first purchase strictly after
    that (strict ordering makes tied timestamps deterministic). Three
    user-keyed groupBys + two user-keyed joins — every stage relation is
    ≤ |users| rows and shrinks monotonically, all on the same natural
    user_id partitioning, so at 100 TB the joins are AQE-broadcast or
    co-partitioned; nothing rescans the event log more than the three
    stage filters (one scan each, filter pushed to parquet)."""
    e = table(prep(spark), sf_dir, "events")

    def first_after(stage: str, prev, prev_col: str, alias: str):
        f = e.filter(F.col("event_type") == stage).select("user_id", "ts")
        if prev is None:
            return f.groupBy("user_id").agg(F.min("ts").alias(alias))
        return (
            f.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(alias))
        )

    views = first_after("view", None, "", "t_view")
    clicks = first_after("click", views, "t_view", "t_click")
    purchases = first_after("purchase", clicks, "t_click", "t_purchase")
    n = lambda df: df.agg(F.count(F.lit(1)).alias("n"))  # noqa: E731
    return (
        n(views).select(F.col("n").alias("n_view"))
        .crossJoin(n(clicks).select(F.col("n").alias("n_click")))
        .crossJoin(n(purchases).select(F.col("n").alias("n_purchase")))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            F.round(F.col("n_click") / F.col("n_view"), 4).alias("view_to_click"),
            F.round(F.col("n_purchase") / F.col("n_click"), 4).alias(
                "click_to_purchase"
            ),
        )
    )


SQL_FUNNEL_ORDERED = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(ts) AS t_click FROM events e JOIN v USING (user_id)
  WHERE event_type = 'click' AND ts > t_view GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(ts) AS t_purchase FROM events e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND ts > t_click GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click,
       (SELECT count(*) FROM p) AS n_purchase,
       round((SELECT count(*) FROM c) / (SELECT count(*) FROM v)::DOUBLE, 4)
         AS view_to_click,
       round((SELECT count(*) FROM p) / (SELECT count(*) FROM c)::DOUBLE, 4)
         AS click_to_purchase
"""


SQL_RETENTION = """
WITH act AS (
  SELECT DISTINCT user_id, time_bucket(INTERVAL '1 day', ts) AS day FROM events
), cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id
)
SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
       count(DISTINCT user_id) AS n_users
FROM act JOIN cohort USING (user_id)
GROUP BY cohort_day, day_offset
"""


def events_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per event, the count and max value of the same
    user's events in the trailing hour (fraud/velocity-check shape).
    The frame is over integer epoch seconds so both engines cut it
    identically; count/max are order-independent inside the frame, so
    tied timestamps (frame peers) cannot flake the hash. Per-user
    partitions — bounded state, scales like sessionize."""
    e = table(prep(spark), sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.max("value").over(w), 4).alias("max_value_1h"),
    )


SQL_TRAILING_1H = """
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       round(max(value) OVER w, 4) AS max_value_1h
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def events_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session journey patterns: sessionize (same 30-min-gap
    cumulative-flag rule as events_sessionize), serialize each
    session's ordered event types into a 'view>click>purchase' path
    string, and count pattern frequency — the session-path report every
    product-analytics stack ships next to the funnel.

    Path assembly is collect_list of (ts, event_id, type) structs
    array_sort'ed then projected — sort-by-struct makes the order
    deterministic regardless of collect_list's arrival order (the
    documented-unordered part). Per-session arrays are session-sized
    (bounded by user activity), and the final pattern groupBy is
    |distinct paths|-sized with map-side partials — word-count shaped.
    Ordering ties at the same count break lexicographically."""
    e = table(prep(spark), sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    sess = F.sum(
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    paths = (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path")
        )
    )
    # top-20 via orderBy().limit() (TakeOrderedAndProject): the distinct
    # session-path relation is NOT bounded (paths explode
    # combinatorially with activity), so no unpartitioned window may
    # rank it; rk is re-derived after the cut over the 20-row relation
    wtop = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
        .withColumn("rk", F.row_number().over(wtop))
    )


SQL_TOP_SESSION_PATHS = """
WITH gaps AS (
  SELECT user_id, ts, event_id, event_type,
         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, session_id
), counted AS (
  SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
)
SELECT path, n_sessions, rk FROM (
  SELECT path, n_sessions,
         row_number() OVER (ORDER BY n_sessions DESC, path ASC) AS rk
  FROM counted) WHERE rk <= 20
"""


def events_time_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed engagement: sum of
    value * exp(-age / 7 days) with age measured from the corpus's
    newest event (a fixed anchor, so the result is deterministic — a
    production run would anchor at job time). Recency-weighted scores
    are how feature stores summarize activity without a cliff cutoff.

    Map-side weight math (one 1-row max-ts broadcast), one groupBy —
    word-count shaped at any scale. exp() is libm-dependent at ulp
    scale, so the sum is rounded to 4 dp (repo posture for
    transcendental outputs)."""
    e = table(prep(spark), sf_dir, "events")
    anchor = e.agg(F.max(F.col("ts").cast("double")).alias("t0"))
    decay = F.exp(
        -(F.col("t0") - F.col("ts").cast("double")) / (7.0 * 86400.0)
    )
    return (
        e.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("value") * decay), 4).alias("decayed_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


SQL_TIME_DECAYED = """
WITH anchor AS (
  SELECT max(epoch(ts)) AS t0 FROM events
)
SELECT user_id,
       round(sum(value * exp(-(t0 - epoch(ts)) / (7.0 * 86400.0))), 4) AS decayed_value,
       count(*) AS n_events
FROM events, anchor
GROUP BY user_id
"""


def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type with explicit zero buckets —
    the densification step trailing-window and charting queries need
    (a RANGE frame over a sparse series silently skips empty hours;
    downstream forecasting expects a regular grid).

    The hour spine is sequence(min_hour, max_hour) exploded from a
    1-row bounds aggregate — O(hours) rows generated ONCE, not per
    key — cross-joined with the |event_types| dimension and
    left-joined against the actual hourly counts. At 100 TB the spine
    is still tiny (hours x types); the only big relation is the
    pre-aggregated hourly counts."""
    e = table(prep(spark), sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = e.select("event_type").distinct()
    return (
        spine.crossJoin(types)
        .join(hourly, ["h", "event_type"], "left")
        .select(
            F.col("h").alias("hour"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )


SQL_GAPFILL_HOURLY = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events
), spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
)
SELECT s.h AS hour, t.event_type, coalesce(n, 0) AS n
FROM spine s CROSS JOIN types t
LEFT JOIN hourly USING (h, event_type)
"""


def events_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch linear attribution: each purchase's value is split
    equally across the user's click/view touchpoints in the preceding
    hour, then credit rolls up by touch type — the marketing-analytics
    complement of the last-touch as-of join (asof_click_to_view gives
    100% to the nearest touch; linear shares it).

    Plan: purchases x touches is a per-user interval join (equi on
    user_id + range predicate — the range-join shape, bounded by
    per-user activity), the per-purchase touch count is a window over
    the join result partitioned by purchase (purchase-sized groups),
    and the rollup is |touch types| rows. Credit rounded to 4."""
    e = table(prep(spark), sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("double").alias("pts"),
        "value",
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("tu"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").cast("double").alias("tts"),
    )
    j = p.join(
        t,
        (F.col("user_id") == F.col("tu"))
        & (F.col("tts") >= F.col("pts") - 3600.0)
        & (F.col("tts") < F.col("pts")),
    )
    wn = Window.partitionBy("purchase_id")
    credited = j.withColumn("credit", F.col("value") / F.count(F.lit(1)).over(wn))
    return (
        credited.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum("credit"), 4).alias("total_credit"),
        )
        .orderBy("touch_type")
    )


SQL_LINEAR_ATTRIBUTION = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch(ts) AS pts, value
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id AS tu, event_id AS touch_id, event_type AS touch_type, epoch(ts) AS tts
  FROM events WHERE event_type IN ('click', 'view')
), j AS (
  SELECT purchase_id, touch_type, value,
         count(*) OVER (PARTITION BY purchase_id) AS n
  FROM p JOIN t ON user_id = tu AND tts >= pts - 3600.0 AND tts < pts
)
SELECT touch_type, count(*) AS n_touches,
       round(sum(value / n), 4) AS total_credit
FROM j GROUP BY touch_type ORDER BY touch_type
"""


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier events by robust-ish z-score: value standardized against
    the EVENT TYPE's own mean/stddev (types have different value
    scales, so a global z flags whole types, not anomalies). Emits the
    top-50 |z| events — the monitoring primitive behind every alerting
    pipeline.

    Per-type stats are a |types|-row aggregate broadcast back map-side;
    the top-50 cut is one TakeOrdered (no full sort materialization —
    Spark plans ORDER BY+LIMIT as a bounded per-partition heap). z
    rounded to 4."""
    e = table(prep(spark), sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("s")
    )
    z = F.round((F.col("value") - F.col("m")) / F.col("s"), 4)
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.col("s") > 0)
        .select("event_id", "event_type", "user_id", "value", z.alias("z"))
        .orderBy(F.abs(F.col("z")).desc(), F.col("event_id").asc())
        .limit(50)
    )


SQL_ANOMALY_ZSCORE = """
WITH stats AS (
  SELECT event_type, avg(value) AS m, stddev_samp(value) AS s
  FROM events GROUP BY 1
)
SELECT event_id, event_type, user_id, value,
       round((value - m) / s, 4) AS z
FROM events JOIN stats USING (event_type)
WHERE s > 0
ORDER BY abs(round((value - m) / s, 4)) DESC, event_id ASC
LIMIT 50
"""


def events_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event value (alpha=0.1) over event-time order —
    the inherently-sequential recurrence no SQL window frame expresses,
    run as a parallel-per-user pandas fold
    (operators/udfs.py:ewma_per_key). The DuckDB oracle replays the
    identical recurrence with a recursive CTE (one recursion level per
    event rank; bounded by the busiest user), and because both sides
    evaluate a*x + (1-a)*s in the same order on float64, the values
    match BIT-EXACTLY with no rounding."""
    from python_multiproc_bigdata_spark.operators.udfs import ewma_per_key

    e = table(prep(spark), sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("double").alias("tsd"),
        "event_id",
        "value",
    )
    out = ewma_per_key(
        e,
        "user_id",
        ["tsd", "event_id"],
        "value",
        alpha=0.1,
        out_schema="user_id long, tsd double, event_id long, rn long, ewma double",
    )
    return out.select("user_id", "event_id", "rn", "ewma")


SQL_EWMA = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch(ts), event_id) AS rn
  FROM events
), ew AS (
  SELECT user_id, event_id, rn, value AS ewma FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn, 0.1 * s.value + 0.9 * e.ewma AS ewma
  FROM seq s JOIN ew e ON s.user_id = e.user_id AND s.rn = e.rn + 1
)
SELECT user_id, event_id, rn, ewma FROM ew
"""


_HOLT_ALPHA, _HOLT_BETA = 0.5, 0.3


def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type volume forecast via Holt double-exponential smoothing
    (additive trend) over the hourly count series — the forecasting
    step a capacity/traffic pipeline runs on top of the trend fit
    (events_linear_trend gives the global OLS line; Holt adapts level
    and trend recency-weighted and emits h-step-ahead forecasts f1–f3).

    The recurrence is inherently sequential (operators/udfs.py:
    holt_forecast_per_key, applyInPandas per type); the oracle replays
    it with a recursive CTE in the identical float-op order, so values
    match BIT-EXACTLY with no rounding (the events_ewma_value
    doctrine). The series is the type's OBSERVED hourly points in hour
    order (gaps carry no 0 rows — documented choice shared by the
    oracle; compose events_gapfill_hourly upstream for a zero-filled
    series)."""
    from python_multiproc_bigdata_spark.operators.udfs import (
        holt_forecast_per_key,
    )

    e = table(prep(spark), sf_dir, "events")
    cnt = (
        e.select(
            "event_type",
            F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    return holt_forecast_per_key(
        cnt, "event_type", ["hr"], "y", alpha=_HOLT_ALPHA, beta=_HOLT_BETA
    )


SQL_FORECAST_HOLT = f"""
WITH RECURSIVE cnt AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS hr, count(*) AS y
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM cnt
), holt AS (
  -- every constant is CAST to DOUBLE: DuckDB types bare numeric
  -- literals as DECIMAL, which would quantize the whole recursion
  -- (b stuck at one decimal place) instead of float64 arithmetic
  SELECT event_type, rn, n, CAST(y AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.rn, s.n,
         CAST({_HOLT_ALPHA!r} AS DOUBLE) * CAST(s.y AS DOUBLE)
           + CAST({1.0 - _HOLT_ALPHA!r} AS DOUBLE) * (h.l + h.b) AS l,
         CAST({_HOLT_BETA!r} AS DOUBLE)
           * ((CAST({_HOLT_ALPHA!r} AS DOUBLE) * CAST(s.y AS DOUBLE)
               + CAST({1.0 - _HOLT_ALPHA!r} AS DOUBLE) * (h.l + h.b)) - h.l)
           + CAST({1.0 - _HOLT_BETA!r} AS DOUBLE) * h.b AS b
  FROM seq s JOIN holt h ON s.event_type = h.event_type AND s.rn = h.rn + 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_points, l AS level, b AS trend,
       l + CAST(1 AS DOUBLE) * b AS f1,
       l + CAST(2 AS DOUBLE) * b AS f2,
       l + CAST(3 AS DOUBLE) * b AS f3
FROM holt WHERE rn = n
"""


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-event transition matrix: P(next event_type | current
    event_type) per user journey — the standard clickstream path model
    (what follows a view? how often does checkout abandon to browse?).

    Plan: one lead() window per user (shuffle on user_id — the same
    partitioning every per-user events query reuses) then a tiny
    groupBy on (cur, nxt): |event_type|^2 rows out, so the aggregate is
    map-side-combined to near-nothing regardless of corpus size. The
    row-probability denominator comes from a window SUM over the
    (cur, nxt) counts — |types|^2 rows, no second scan of events.
    End-of-journey (lead = NULL) rows are dropped: rows are
    P(next | current, a next exists), each row of the matrix sums to 1.
    Probability rounded to 6 dp (repo posture for division outputs)."""
    e = table(prep(spark), sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("cur")
    return pairs.select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow), 6).alias("p"),
    )


SQL_TRANSITION_MATRIX = """
WITH pairs AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), counted AS (
  SELECT cur, nxt, count(*) AS n FROM pairs WHERE nxt IS NOT NULL GROUP BY cur, nxt
)
SELECT cur, nxt, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY cur), 6) AS p
FROM counted
"""


def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency profile of the ordered funnel: for users who
    progressed view → click (→ purchase) under the strict-order rule of
    events_funnel_conversion, the time between stages — count, mean,
    median, and p90 seconds per stage. The funnel count query says HOW
    MANY convert; this says HOW FAST — the metric a growth team
    actually tunes against.

    Exactness: latencies are INTEGER microseconds (unix_micros /
    epoch_us — the loader already truncates nanos to micros on both
    engines), so the mean's sum is exact and one division; median/p90
    interpolate the same integer multiset with the same type-7 rule on
    both engines. Scale shape = the funnel's: stage relations are
    ≤|users| rows on the user_id partitioning."""
    e = table(prep(spark), sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(us).alias("t_view"))
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("t"))
        .join(views, "user_id")
        .filter(F.col("t") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("t"))
        .join(clicks, "user_id")
        .filter(F.col("t") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    vc = views.join(clicks, "user_id").select(
        F.lit("view_to_click").alias("stage"),
        (F.col("t_click") - F.col("t_view")).alias("lat_us"),
    )
    cp = clicks.join(purchases, "user_id").select(
        F.lit("click_to_purchase").alias("stage"),
        (F.col("t_purchase") - F.col("t_click")).alias("lat_us"),
    )
    return (
        vc.unionByName(cp)
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum("lat_us").cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(1000000.0)),
                6,
            ).alias("avg_s"),
            F.round(F.expr("percentile(lat_us, 0.5)") / F.lit(1000000.0), 6).alias(
                "median_s"
            ),
            F.round(F.expr("percentile(lat_us, 0.9)") / F.lit(1000000.0), 6).alias(
                "p90_s"
            ),
        )
    )


SQL_FUNNEL_LATENCY = """
WITH views AS (
  SELECT user_id, min(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY 1
), clicks AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
  FROM events e JOIN views v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
  GROUP BY 1
), purchases AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
  FROM events e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
  GROUP BY 1
), lats AS (
  SELECT 'view_to_click' AS stage, c.t_click - v.t_view AS lat_us
  FROM views v JOIN clicks c USING (user_id)
  UNION ALL
  SELECT 'click_to_purchase' AS stage, p.t_purchase - c.t_click AS lat_us
  FROM clicks c JOIN purchases p USING (user_id)
)
SELECT stage, CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(sum(lat_us) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS avg_s,
       round(quantile_cont(lat_us, 0.5) / CAST(1000000.0 AS DOUBLE), 6) AS median_s,
       round(quantile_cont(lat_us, 0.9) / CAST(1000000.0 AS DOUBLE), 6) AS p90_s
FROM lats GROUP BY stage
"""


def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on each type's hourly volume series:
    the hour where the cumulative deviation from the series mean peaks
    — the standard "when did the level shift?" estimator (the argmax of
    |Σ_{i≤t}(y_i − ȳ)|). Per type: the changepoint's hour index, the
    peak statistic (normalized), and the shift direction.

    Exactness: the mean makes the textbook form fractional, so the
    statistic is multiplied through by n: S_t = n·Σ_{i≤t} y_i − t·Σy —
    EXACT INTEGERS under a running-sum window; the export divides the
    peak once by n (mean-deviation units). A negative peak means the
    prefix ran BELOW the overall mean, i.e. the level shifted UP at the
    changepoint. Argmax is a total (|S| DESC, t ASC) order. Scale: one
    (type, hour) partial agg, one per-type window — the linear-trend
    family's shapes."""
    e = table(prep(spark), sf_dir, "events")
    cnt = (
        e.select(
            "event_type",
            F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    wseq = Window.partitionBy("event_type").orderBy("hr")
    wall = Window.partitionBy("event_type")
    scored = cnt.select(
        "event_type",
        F.row_number().over(wseq).alias("t"),
        F.sum("y").over(wseq.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("y").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).select(
        "event_type",
        "t",
        "n",
        (F.col("n") * F.col("cum") - F.col("t") * F.col("tot")).alias("s"),
    )
    wpk = Window.partitionBy("event_type").orderBy(F.desc(F.abs(F.col("s"))), F.asc("t"))
    return (
        scored.withColumn("rk", F.row_number().over(wpk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("t").alias("cp_index"),
            "n",
            F.round(F.col("s").cast("double") / F.col("n").cast("double"), 4).alias(
                "peak_dev"
            ),
            F.when(F.col("s") < 0, F.lit("up")).otherwise(F.lit("down")).alias(
                "direction"
            ),
        )
    )


SQL_CHANGEPOINT_CUSUM = """
WITH cnt AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS hr, count(*) AS y
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t,
         sum(y) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(y) OVER (PARTITION BY event_type) AS tot,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM cnt
), scored AS (
  SELECT event_type, t, n, n * cum - t * tot AS s FROM seq
), peak AS (
  SELECT event_type, t, n, s,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(s) DESC, t ASC) AS rk
  FROM scored
)
SELECT event_type, t AS cp_index, CAST(n AS BIGINT) AS n,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS peak_dev,
       CASE WHEN s < 0 THEN 'up' ELSE 'down' END AS direction
FROM peak WHERE rk = 1
"""


def events_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile per event type — the traffic-shape
    diagnostic capacity planning and anomaly baselining read first:
    for consecutive events of the same (user, type), the gap
    distribution (n, mean, p90) plus the coefficient of variation and
    Goh-Barabási burstiness B = (sigma - mu)/(sigma + mu) (B -> -1
    periodic, 0 Poisson, +1 bursty).

    Exactness: gaps are integer microseconds from one lag() over the
    (user, type) partitioning; mean comes from the exact BIGINT sum;
    the variance's sum of squares runs in DECIMAL(38,0) on Spark /
    HUGEINT on DuckDB (gap^2 overflows int64 at day-scale gaps), and
    both engines convert the same exact integers to double with the
    same mirrored expression before the round. p90 interpolates the
    same integer multiset (percentile == quantile_cont)."""
    e = table(prep(spark), sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id", "event_type").orderBy("t", "event_id")
    gaps = (
        e.select("user_id", "event_type", us.alias("t"), "event_id")
        .withColumn("gap", F.col("t") - F.lag("t").over(w))
        .filter(F.col("gap").isNotNull())
    )
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("s1"),
        # cast BEFORE multiplying: gap*gap overflows int64 at day-scale
        # gaps (ANSI mode throws; the decimal product is exact)
        F.sum(F.col("gap").cast("decimal(19,0)") * F.col("gap")).alias("s2"),
        F.expr("percentile(gap, 0.9D)").alias("p90_us"),
    )
    n = F.col("n_gaps").cast("double")
    mu = F.col("s1") / n
    var = (n * F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double")) / (n * n)
    sigma = F.sqrt(var)
    return agg.select(
        "event_type",
        "n_gaps",
        F.round(mu / 1000000.0, 4).alias("mean_s"),
        F.round(F.col("p90_us") / 1000000.0, 6).alias("p90_s"),
        F.round(sigma / mu, 4).alias("cv"),
        F.round((sigma - mu) / (sigma + mu), 4).alias("burstiness"),
    ).orderBy("event_type")


SQL_INTERARRIVAL_PROFILE = """
WITH t AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
), gaps AS (
  SELECT event_type,
         t - lag(t) OVER (PARTITION BY user_id, event_type
                          ORDER BY t, event_id) AS gap
  FROM t
), g AS (SELECT event_type, gap FROM gaps WHERE gap IS NOT NULL),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap) AS BIGINT) AS s1,
         sum(CAST(gap AS HUGEINT) * gap) AS s2,
         quantile_cont(gap, 0.9) AS p90_us
  FROM g GROUP BY event_type
)
SELECT event_type, n_gaps,
       round((CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)) / 1000000.0, 4)
         AS mean_s,
       round(p90_us / 1000000.0, 6) AS p90_s,
       round(sqrt((CAST(n_gaps AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
             / (CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 4) AS cv,
       round((sqrt((CAST(n_gaps AS DOUBLE) * CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
              - CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             / (sqrt((CAST(n_gaps AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                     / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
                + CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 4) AS burstiness
FROM agg ORDER BY event_type
"""


def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k = 1..3) of each type's hourly volume —
    the temporal-dependence diagnostic that separates bursty series
    from white noise (and the sanity input to any forecasting choice,
    e.g. whether the Holt query above is even warranted).

    Pearson r at each lag over the (x_t, x_{t+k}) pairs via the SAME
    exact-integer algebraic-sums recipe as events_linear_trend: counts
    are integers, so n, Σx, Σy, Σxy, Σx², Σy² are exact and r² enters
    a double exactly once per side. r is exported as
    sign(num) · √(num² / (dx·dy)) computed identically on both engines
    from the integer sums. Pairs come from a lag() window, not a
    self-join; one (type, hour) partial agg feeds all three lags."""
    e = table(prep(spark), sf_dir, "events")
    cnt = (
        e.select(
            "event_type",
            F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    lagged = cnt.select(
        "event_type",
        F.col("y").alias("x"),
        *[F.lead("y", k).over(w).alias(f"y{k}") for k in (1, 2, 3)],
    )
    out = None
    for k in (1, 2, 3):
        pairs = lagged.filter(F.col(f"y{k}").isNotNull()).select(
            "event_type", "x", F.col(f"y{k}").alias("yy")
        )
        sums = pairs.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("yy").alias("sy"),
            F.sum(F.col("x") * F.col("yy")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("yy") * F.col("yy")).alias("syy"),
        )
        num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
        dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
        r = sums.filter((dx > 0) & (dy > 0)).select(
            "event_type",
            F.lit(k).alias("lag"),
            "n",
            F.round(
                F.signum(num.cast("double"))
                * F.sqrt(
                    (num.cast("double") * num.cast("double"))
                    / (dx.cast("double") * dy.cast("double"))
                ),
                6,
            ).alias("acf"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def _autocorr_sql() -> str:
    blocks = []
    for k in (1, 2, 3):
        blocks.append(
            f"""
SELECT event_type, {k} AS lag, CAST(n AS BIGINT) AS n,
       round(sign(CAST(n * sxy - sx * sy AS DOUBLE))
             * sqrt((CAST(n * sxy - sx * sy AS DOUBLE)
                     * CAST(n * sxy - sx * sy AS DOUBLE))
                    / (CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE))), 6) AS acf
FROM (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(yy) AS sy,
         sum(x * yy) AS sxy, sum(x * x) AS sxx, sum(yy * yy) AS syy
  FROM (
    SELECT event_type, y AS x,
           lead(y, {k}) OVER (PARTITION BY event_type ORDER BY hr) AS yy
    FROM cnt) WHERE yy IS NOT NULL
  GROUP BY event_type
) WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0"""
        )
    return (
        """
WITH cnt AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS hr, count(*) AS y
  FROM events GROUP BY 1, 2
)"""
        + "\nUNION ALL\n".join(blocks)
    )


SQL_AUTOCORRELATION = _autocorr_sql()


def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × day-of-week activity profile with lift vs uniform —
    the seasonality heatmap behind staffing/capacity dashboards and the
    baseline any hour-level anomaly rule needs (events_anomaly_zscore
    flags deviations over TIME; this is the deviation over the WEEKLY
    CYCLE). Per (dow, hod) cell: event count and lift = observed
    share / uniform share, computed as count·168/total so the only
    float op is the exported division (the CUSUM multiply-through
    trick). dow is 1=Sunday..7=Saturday (Spark dayofweek == DuckDB
    dayofweek+1 — the oracle adds 1 to DuckDB's 0=Sunday convention).
    One partial-agg groupBy to 168 cells; the total broadcasts back."""
    e = table(prep(spark), sf_dir, "events")
    cells = (
        e.select(
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hod"),
        )
        .groupBy("dow", "hod")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.agg(F.sum("n").alias("total"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hod",
        "n",
        F.round(
            (F.col("n") * F.lit(168)).cast("double") / F.col("total").cast("double"),
            6,
        ).alias("lift"),
    )


SQL_SEASONALITY = """
WITH cells AS (
  SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod, count(*) AS n
  FROM events GROUP BY 1, 2
), tot AS (SELECT sum(n) AS total FROM cells)
SELECT dow, hod, CAST(n AS BIGINT) AS n,
       round(CAST(n * 168 AS DOUBLE) / CAST(total AS DOUBLE), 6) AS lift
FROM cells CROSS JOIN tot
"""


def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution (the data-driven cooperative-
    game model, Zhao et al. 2018 — the principled successor to the
    first/last/linear heuristics in events_attribution_touch /
    events_linear_attribution): each user's exposure SET of non-
    purchase channels is a coalition, v(S) = conversion rate of users
    with exactly that set (unobserved coalitions contribute v = 0, the
    standard simplification), and each channel's credit is its exact
    Shapley value φ_i = Σ_{S∌i} |S|!(k−1−|S|)!/k! · (v(S∪i) − v(S)).

    Tractability/exactness: coalitions are INTEGER BITMASKS (channel →
    bit by alphabetical rank), so the lattice is 2^k rows (k = 4 here),
    set ops are `&`/`|`, and every Shapley term is an exact integer —
    factorial(s)·factorial(k−1−s)·(v_up_micro − v_base_micro) — summed
    exactly and divided ONCE by k!·1e6 at export. Scale: the only
    corpus passes are the per-user conversion agg and the distinct
    exposure relation (both user_id-partitioned); everything after is
    2^k-row algebra."""
    e = table(prep(spark), sf_dir, "events")
    ch = (
        e.filter(F.col("event_type") != "purchase")
        .select("event_type")
        .distinct()
        .withColumn(
            "bit", F.row_number().over(Window.orderBy("event_type")) - F.lit(1)
        )
    )
    conv = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    exposure = (
        e.filter(F.col("event_type") != "purchase")
        .select("user_id", "event_type")
        .distinct()
    )
    bitval = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
    umask = (
        exposure.join(F.broadcast(ch), "event_type")
        .groupBy("user_id")
        .agg(F.sum(bitval).alias("mask"))
    )
    users = conv.join(umask, "user_id", "left").select(
        F.coalesce(F.col("mask"), F.lit(0)).alias("mask"), "conv"
    )
    vrel = users.groupBy("mask").agg(
        F.round(
            F.sum("conv").cast("double") / F.count(F.lit(1)).cast("double")
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("v_micro")
    )
    kk = ch.agg(F.count(F.lit(1)).alias("k"))
    lattice = kk.select(
        F.explode(
            F.sequence(
                F.lit(0),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)) - 1"),
            )
        ).alias("s"),
        "k",
    )
    v = lattice.join(
        vrel.select(F.col("mask").alias("s"), "v_micro"), "s", "left"
    ).select("s", "k", F.coalesce(F.col("v_micro"), F.lit(0)).alias("v_micro"))
    vup = v.select(F.col("s").alias("su"), F.col("v_micro").alias("v_up"))
    pairs = (
        v.crossJoin(F.broadcast(ch))
        .filter(F.expr("(s & shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))) = 0"))
        .withColumn(
            "su", F.expr("s | shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
        )
        .join(F.broadcast(vup), "su")
        .select(
            "event_type",
            "k",
            F.expr("CAST(bit_count(s) AS BIGINT)").alias("ssz"),
            (F.col("v_up") - F.col("v_micro")).alias("dv"),
        )
    )
    terms = pairs.groupBy("event_type", "k").agg(
        F.sum(
            F.factorial(F.col("ssz").cast("int"))
            * F.factorial((F.col("k") - 1 - F.col("ssz")).cast("int"))
            * F.col("dv")
        ).alias("t")
    )
    nu = exposure.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    return terms.join(nu, "event_type").select(
        F.col("event_type").alias("channel"),
        "n_users",
        F.round(
            F.col("t").cast("double")
            / (F.factorial(F.col("k").cast("int")).cast("double") * F.lit(1000000.0)),
            6,
        ).alias("shapley"),
    )


SQL_ATTRIBUTION_SHAPLEY = """
WITH ch AS (
  SELECT event_type, row_number() OVER (ORDER BY event_type) - 1 AS bit
  FROM (SELECT DISTINCT event_type FROM events WHERE event_type != 'purchase')
), conv AS (
  SELECT user_id, max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
), exposure AS (
  SELECT DISTINCT user_id, event_type FROM events WHERE event_type != 'purchase'
), umask AS (
  SELECT user_id, sum(1::BIGINT << bit) AS mask
  FROM exposure JOIN ch USING (event_type) GROUP BY 1
), users AS (
  SELECT coalesce(m.mask, 0) AS mask, c.conv
  FROM conv c LEFT JOIN umask m USING (user_id)
), vrel AS (
  SELECT mask,
         CAST(round(CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS v_micro
  FROM users GROUP BY 1
), kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ch),
latt0 AS (SELECT unnest(range(1::BIGINT << CAST(k AS INT))) AS s, k FROM kk),
v AS (
  SELECT l.s, l.k, coalesce(vr.v_micro, 0) AS v_micro
  FROM latt0 l LEFT JOIN vrel vr ON l.s = vr.mask
), pairs AS (
  SELECT ch.event_type, v.k, CAST(bit_count(v.s) AS BIGINT) AS ssz,
         vu.v_micro - v.v_micro AS dv
  FROM v
  JOIN ch ON (v.s & (1::BIGINT << ch.bit)) = 0
  JOIN v vu ON vu.s = (v.s | (1::BIGINT << ch.bit))
), terms AS (
  SELECT event_type, k,
         sum(CAST(factorial(CAST(ssz AS INT)) AS BIGINT)
             * CAST(factorial(CAST(k - 1 - ssz AS INT)) AS BIGINT)
             * dv) AS t
  FROM pairs GROUP BY 1, 2
), nu AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
  FROM exposure GROUP BY 1
)
SELECT t.event_type AS channel, nu.n_users,
       round(CAST(t.t AS DOUBLE)
             / (CAST(factorial(CAST(t.k AS INT)) AS DOUBLE) * 1000000.0), 6)
         AS shapley
FROM terms t JOIN nu USING (event_type)
"""


_SEQ_MAX_GAP = 5


def events_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining (PrefixSpan's k=2 level, gapped): for
    every ordered type pair (a → b with b within the next 5 events of
    the SAME user), the number of users whose journey contains it and
    that support as a share of active users. Unlike the transition
    matrix (ADJACENT steps only), this sees "a leads to b eventually" —
    the pattern basis funnel discovery starts from.

    Plan: NO self-join — the gapped follower set expands map-side from
    5 lead() columns over one (user, ts, event_id) sort, then ONE
    distinct on (user, a, b) and a |types|²-bounded count. Support is
    users-containing (set semantics), the standard sequence-mining
    count, so a user repeating a pattern doesn't inflate it."""
    e = table(prep(spark), sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    leads = e.select(
        "user_id",
        F.col("event_type").alias("a"),
        *[
            F.lead("event_type", o).over(w).alias(f"_l{o}")
            for o in range(1, _SEQ_MAX_GAP + 1)
        ],
    )
    pairs = leads.select(
        "user_id",
        "a",
        F.explode(F.array(*[F.col(f"_l{o}") for o in range(1, _SEQ_MAX_GAP + 1)])).alias(
            "b"
        ),
    ).filter(F.col("b").isNotNull())
    per_user = pairs.select("user_id", "a", "b").distinct()
    nu = e.agg(F.countDistinct("user_id").alias("nu"))
    return (
        per_user.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .crossJoin(F.broadcast(nu))
        .select(
            "a",
            "b",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("nu").cast("double"), 6
            ).alias("support"),
        )
    )


def _freq_seq_sql() -> str:
    lead_cols = ",\n         ".join(
        f"lead(event_type, {o}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l{o}"
        for o in range(1, _SEQ_MAX_GAP + 1)
    )
    unions = "\n  UNION ALL\n".join(
        f"  SELECT user_id, a, l{o} AS b FROM leads WHERE l{o} IS NOT NULL"
        for o in range(1, _SEQ_MAX_GAP + 1)
    )
    return f"""
WITH leads AS (
  SELECT user_id, event_type AS a,
         {lead_cols}
  FROM events
), pairs AS (
{unions}
), per_user AS (
  SELECT DISTINCT user_id, a, b FROM pairs
), nu AS (SELECT count(DISTINCT user_id) AS n FROM events)
SELECT a, b, CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(count(*) AS DOUBLE) / CAST(nu.n AS DOUBLE), 6) AS support
FROM per_user CROSS JOIN nu
GROUP BY a, b, nu.n
"""


SQL_FREQUENT_SEQUENCES = _freq_seq_sql()


def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier curve for time-to-first-purchase: per user, hours
    from their first event to their first purchase (the "death"); users
    who NEVER purchase are RIGHT-CENSORED at their observed lifetime —
    the conversion-survival estimator that answers "what fraction is
    still unconverted after t hours" without the bias of dropping
    non-converters (the reason a naive mean time-to-convert lies).
    Output: one row per distinct event time with the at-risk count,
    deaths, and S(t) = Π_{i≤t} (1 − dᵢ/nᵢ).

    Exactness: durations are integer hours (integer div, no float
    epoch math); dᵢ/nᵢ are integer pairs; the cumulative PRODUCT is
    inherently sequential, so it folds in pandas in textbook order and
    the oracle replays it with a recursive CTE — BIT-EXACT doubles, no
    rounding (the events_ewma_value doctrine; Spark has no product
    aggregate, and exp(Σlog) would differ in float-op order). Scale:
    one per-user agg (user_id partitioning), a |distinct durations|-row
    KM table, and a single bounded sequential fold."""
    import pandas as pd

    e = table(prep(spark), sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    per_user = e.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.max(us).alias("t1"),
        F.min(
            F.when(F.col("event_type") == "purchase", us)
        ).alias("tp"),
    )
    lived = per_user.select(
        F.expr(
            "CASE WHEN tp IS NOT NULL THEN (tp - t0) div 3600000000"
            " ELSE (t1 - t0) div 3600000000 END"
        ).alias("dur"),
        F.col("tp").isNull().alias("censored"),
    )
    km = (
        lived.groupBy("dur")
        .agg(
            F.count(F.lit(1)).alias("n_at"),
            F.sum((~F.col("censored")).cast("long")).alias("d_i"),
        )
    )
    w = Window.orderBy(F.desc("dur")).rowsBetween(Window.unboundedPreceding, 0)
    staged = (
        km.select(
            "dur", "d_i", F.sum("n_at").over(w).alias("n_i")
        )
        .filter(F.col("d_i") > 0)
        .withColumn("g", F.lit(1))
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dur")
        s = 1.0
        out = []
        for d_i, n_i in zip(pdf["d_i"], pdf["n_i"]):
            s = s * (1.0 - float(d_i) / float(n_i))
            out.append(s)
        res = pdf[["dur", "d_i", "n_i"]].copy()
        res["survival"] = out
        return res

    return (
        staged.groupBy("g")
        .applyInPandas(
            fold, schema="dur long, d_i long, n_i long, survival double"
        )
    )


SQL_SURVIVAL_KM = """
WITH RECURSIVE per_user AS (
  SELECT user_id, min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
  FROM events GROUP BY 1
), lived AS (
  SELECT CAST(CASE WHEN tp IS NOT NULL THEN (tp - t0) // 3600000000
                   ELSE (t1 - t0) // 3600000000 END AS BIGINT) AS dur,
         tp IS NULL AS censored
  FROM per_user
), km AS (
  SELECT dur, count(*) AS n_at,
         sum(CASE WHEN censored THEN 0 ELSE 1 END) AS d_i
  FROM lived GROUP BY 1
), staged AS (
  SELECT dur, d_i,
         sum(n_at) OVER (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING) AS n_i
  FROM km
), seq AS (
  SELECT dur, d_i, n_i,
         row_number() OVER (ORDER BY dur ASC) AS rn,
         count(*) OVER () AS n
  FROM staged WHERE d_i > 0
), surv AS (
  SELECT dur, d_i, n_i, rn, n,
         CAST(1.0 AS DOUBLE)
           * (CAST(1.0 AS DOUBLE)
              - CAST(d_i AS DOUBLE) / CAST(n_i AS DOUBLE)) AS survival
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.dur, s.d_i, s.n_i, s.rn, s.n,
         p.survival * (CAST(1.0 AS DOUBLE)
                       - CAST(s.d_i AS DOUBLE) / CAST(s.n_i AS DOUBLE)) AS survival
  FROM seq s JOIN surv p ON s.rn = p.rn + 1
)
SELECT dur, CAST(d_i AS BIGINT) AS d_i, CAST(n_i AS BIGINT) AS n_i, survival
FROM surv
"""


_MARKOV_ROUNDS = 4
_MARKOV_SCALE = 1_000_000


def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state event-type distribution: 4 fixed-point power
    iterations of the clickstream transition matrix (the
    events_transition_matrix relation) from a uniform start — where a
    user journey settles if it runs long enough, the standard
    steady-state read of a Markov behavior model.

    Exactness: the iteration runs in FIXED-POINT INTEGER arithmetic —
    P is the micro-probability matrix round(1e6·n/row_total), the mass
    vector starts UNIFORM at 1e6 // n_types per type (total mass ≈ 1 in
    micro units) and each round is
    v'(j) = (Σᵢ v(i)·P_micro(i,j)) // 1e6 (floor AFTER the exact
    integer sum). Float power iteration would hit cross-engine sum
    order; this defined integer recurrence replays bit-for-bit as
    nested CTEs. The tiny floor leak per round is part of the defined
    computation (documented, not hidden). Scale: the matrix is
    |types|² rows — broadcast; each round is one tiny join + groupBy;
    the only corpus-scale pass is the lead() window that builds the
    transition counts."""
    e = table(prep(spark), sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("cur")
    pm = pairs.select(
        "cur",
        "nxt",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(wrow).cast("double")
            * F.lit(float(_MARKOV_SCALE))
        )
        .cast("bigint")
        .alias("p_micro"),
    )
    nodes = pm.select("cur").distinct()
    n_types = nodes.agg(F.count(F.lit(1)).alias("nt"))
    v = nodes.crossJoin(F.broadcast(n_types)).select(
        F.col("cur").alias("node"),
        F.expr(f"CAST({_MARKOV_SCALE} div nt AS BIGINT)").alias("v"),
    )
    for _ in range(_MARKOV_ROUNDS):
        v = (
            pm.join(v, pm["cur"] == v["node"])
            .groupBy(F.col("nxt").alias("node2"))
            .agg(
                F.expr(f"sum(v * p_micro) div {_MARKOV_SCALE}").alias("v")
            )
            .select(F.col("node2").alias("node"), "v")
        )
    return v.select(
        F.col("node").alias("event_type"),
        F.col("v").alias("stationary_micro"),
        (F.col("v") / F.lit(float(_MARKOV_SCALE))).alias("stationary"),
    )


def _markov_sql() -> str:
    s = _MARKOV_SCALE
    parts = [
        f"""WITH pairs AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), counted AS (
  SELECT cur, nxt, count(*) AS n FROM pairs WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
), pm AS (
  SELECT cur, nxt,
         CAST(round(CAST(n AS DOUBLE)
                    / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE)
                    * {float(s)!r}) AS BIGINT) AS p_micro
  FROM counted
), v0 AS (
  SELECT cur AS node,
         CAST({s} // (SELECT count(DISTINCT cur) FROM pm) AS BIGINT) AS v
  FROM (SELECT DISTINCT cur FROM pm)
)"""
    ]
    for r in range(1, _MARKOV_ROUNDS + 1):
        parts.append(
            f""", v{r} AS (
  SELECT pm.nxt AS node, CAST(sum(p.v * pm.p_micro) // {s} AS BIGINT) AS v
  FROM pm JOIN v{r - 1} p ON pm.cur = p.node
  GROUP BY pm.nxt
)"""
        )
    parts.append(
        f"""
SELECT node AS event_type, v AS stationary_micro,
       CAST(v AS DOUBLE) / CAST({float(s)!r} AS DOUBLE) AS stationary
FROM v{_MARKOV_ROUNDS}"""
    )
    return "".join(parts)


SQL_MARKOV_STATIONARY = _markov_sql()


def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of hourly volume per event type: the
    MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i) — the estimator
    that shrugs off the outlier hours that drag the OLS fit
    (events_linear_trend is the algebraic sibling; a gap between the
    two flags influential outliers). Slopes are floored integer
    micro-slopes ((Δy·1e6) div Δx — deterministic on both engines, no
    float ratio), the median interpolates that integer multiset
    identically, and n_pairs is reported so the estimate's support is
    visible. Scale: the pair space is hours², bounded by the series
    length, never the event count — the pair join runs on the tiny
    (type, hour) rollup. Types with < 2 active hours drop."""
    e = table(prep(spark), sf_dir, "events")
    cnt = (
        e.select(
            "event_type",
            F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    a = cnt.select("event_type", F.col("hr").alias("x1"), F.col("y").alias("y1"))
    b = cnt.select("event_type", F.col("hr").alias("x2"), F.col("y").alias("y2"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("x1") < F.col("x2"))
        .select(
            "event_type",
            F.expr("((y2 - y1) * 1000000) div (x2 - x1)").alias("slope_micro"),
        )
    )
    return slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.expr("percentile(slope_micro, 0.5)") / F.lit(1000000.0), 6
        ).alias("theilsen_slope"),
    )


SQL_THEILSEN = """
WITH cnt AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS hr, count(*) AS y
  FROM events GROUP BY 1, 2
), slopes AS (
  SELECT a.event_type,
         ((b.y - a.y) * 1000000) // (b.hr - a.hr) AS slope_micro
  FROM cnt a JOIN cnt b
    ON a.event_type = b.event_type AND a.hr < b.hr
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       round(quantile_cont(slope_micro, 0.5) / CAST(1000000.0 AS DOUBLE), 6)
         AS theilsen_slope
FROM slopes GROUP BY event_type
"""


def events_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS linear trend of hourly event volume — the
    grouped-regression primitive behind growth/decay monitoring, fit the
    scalable way: slope and intercept from the five ALGEBRAIC sums
    (n, Σx, Σy, Σxy, Σx²) so the whole fit is two map-side-combined
    groupBys, no per-group matrix solve and no data movement beyond a
    |types·hours|-row relation.

    x is the hour index REBASED to each type's first active hour: the
    sums then stay exact 64-bit integers (x ≤ corpus-hours, y = counts;
    every product < 2⁵³), so slope/intercept are a single exact-integer
    expression divided at the end — bit-identical on any engine.
    Intercept is the fitted volume at the type's first hour. Types with
    a single active hour (undefined slope) are dropped."""
    e = table(prep(spark), sf_dir, "events")
    cnt = (
        e.select(
            "event_type",
            F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    mn = cnt.groupBy("event_type").agg(F.min("hr").alias("mn"))
    xy = cnt.join(F.broadcast(mn), "event_type").select(
        "event_type", (F.col("hr") - F.col("mn")).alias("x"), "y"
    )
    sums = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    # r² = cov²/(varx·vary): the exact-bigint factors exceed 2^63 when
    # squared, so each converts to double FIRST (exact — all < 2^53)
    # and the ratio is computed in double on both engines identically
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    r2 = F.when(
        deny != 0, F.round((num * num) / (den.cast("double") * deny.cast("double")), 6)
    )
    return (
        sums.filter((F.col("n") >= 2) & (den != 0))
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 4).alias("intercept"),
            r2.alias("r2"),
        )
        .orderBy("event_type")
    )


SQL_LINEAR_TREND = """
WITH cnt AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS hr, count(*) AS y
  FROM events GROUP BY 1, 2
), mn AS (
  SELECT event_type, min(hr) AS mn FROM cnt GROUP BY 1
), xy AS (
  SELECT cnt.event_type, cnt.hr - mn.mn AS x, y
  FROM cnt JOIN mn USING (event_type)
), sums AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM xy GROUP BY 1
)
SELECT event_type, n AS n_hours,
       round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx) * 1.0 / n, 4) AS intercept,
       CASE WHEN (n * syy - sy * sy) != 0 THEN
         round(((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE)
               / ((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE), 6)
       END AS r2
FROM sums
WHERE n >= 2 AND (n * sxx - sx * sx) != 0
ORDER BY event_type
"""


def events_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a materialized per-type aggregate
    (count/sum/min/max over the first ~75% of events by hash) is
    refreshed by MERGING the delta batch's partial aggregate — union of
    two partial-agg relations + one re-aggregation — instead of
    rescanning history. avg derives from sum/count at the end (never
    re-averaged). The oracle aggregates the FULL table directly, so the
    checked claim is the merge-equals-recompute equivalence itself —
    the invariant every continuous-aggregate refresh at 100 TB rests on
    (the delta path reads |delta| + |state|, not |history|)."""
    e = table(prep(spark), sf_dir, "events")
    part = F.md5(F.col("event_id").cast("string")) < "c"  # ~75% base slice

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sv"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    base = agg(e.filter(part))       # the standing materialized state
    delta = agg(e.filter(~part))     # the newly-arrived batch's partials
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
            F.round(F.sum("sv") / F.sum("n"), 4).alias("avg_value"),
        )
    )
    return merged.orderBy("event_type")


# full-table recompute: the equivalence oracle for the merge path
SQL_INCREMENTAL_MERGE = """
SELECT event_type,
       count(*) AS n_events,
       min(value) AS min_value,
       max(value) AS max_value,
       round(sum(value) / count(*), 4) AS avg_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flagging by median/MAD — the heavy-tail-safe twin
    of events_anomaly_zscore (mean/stddev are themselves dragged by the
    outliers they're meant to find; median and median-absolute-deviation
    are 50%-breakdown robust). Two grouped EXACT medians (Spark's
    median == DuckDB's interpolating median) with the per-type constants
    broadcast back map-side; emits the top-50 events by |v - med| / MAD
    (the 'robust z', rounded to 4).

    Scale: each median is one groupBy over |types| groups; the flagging
    pass is map-side. Exactness note: interpolating median of an
    even-count group is the mean of two order statistics — identical
    arithmetic both engines."""
    e = table(prep(spark), sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "user_id", "value",
        F.abs(F.col("value") - F.col("med")).alias("adev"), "med",
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    rz = F.round(F.abs(F.col("value") - F.col("med")) / F.col("mad"), 4)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select("event_id", "event_type", "user_id", "value", rz.alias("robust_z"))
        .orderBy(F.desc("robust_z"), F.asc("event_id"))
        .limit(50)
    )


SQL_MAD_OUTLIERS = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type, e.event_id, e.user_id, e.value,
         abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
)
SELECT d.event_id, d.event_type, d.user_id, d.value,
       round(abs(d.value - d.med) / m.mad, 4) AS robust_z
FROM dev d JOIN mad m USING (event_type)
WHERE m.mad > 0
ORDER BY robust_z DESC, event_id ASC
LIMIT 50
"""


def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per event_type — the classic interval
    sweep-line, built WITHOUT a single-timeline sort.

    Shape: (1) sessionize per (user, type) (lag+cumsum islands, the
    events_sessionize pattern), (2) each session [start, end] emits
    (+1 at start, -1 at end) deltas, (3) running sum of deltas ordered
    by (t, delta DESC) — +1 before -1 at ties, so a session ending
    exactly when another starts counts as overlap (closed intervals) —
    (4) max per type.

    The naive form sorts each type's WHOLE timeline in one window
    partition — a 100 TB scale-killer for a hot type. Here the running
    sum is two-phase, the with_global_index split (transforms.py:119):
    deltas bucket by day, rows running-sum WITHIN (type, day) in
    parallel, and day-level offsets come from a window over the tiny
    (type × day) aggregate, joined back via AQE-broadcast. Peak values
    at ties are order-invariant: within a (t, d) tie block the running
    values are {base+d, ..., base+k·d} regardless of row order, so
    max() is deterministic even though intermediate rows aren't.

    Reference scope: generalizes the reference's per-key counting
    (v2/core/transformers.py ReduceItemTransformer) to overlapping
    intervals."""
    e = table(prep(spark), sf_dir, "events")
    uw = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(uw)
    sid = F.sum(
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).over(uw.rowsBetween(Window.unboundedPreceding, 0))
    iv = (
        e.withColumn("sid", sid)
        .groupBy("user_id", "event_type", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    deltas = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionByName(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("d"))
    ).withColumn("day", F.date_trunc("day", "t"))
    # phase 1: parallel within-day running sums + per-day totals
    wl = Window.partitionBy("event_type", "day").orderBy(
        F.col("t").asc(), F.col("d").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    local = deltas.withColumn("run", F.sum("d").over(wl))
    # phase 2: offsets over the tiny (type, day) aggregate
    day_tot = deltas.groupBy("event_type", "day").agg(F.sum("d").alias("dt"))
    wo = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = day_tot.withColumn(
        "off", F.coalesce(F.sum("dt").over(wo), F.lit(0))
    ).select("event_type", "day", "off")
    conc = local.join(offsets, ["event_type", "day"]).withColumn(
        "c", F.col("off") + F.col("run")
    )
    return (
        conc.groupBy("event_type")
        .agg(F.max("c").cast("bigint").alias("max_concurrent"))
        .orderBy("event_type")
    )


def sessions_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every pair of DIFFERENT users whose sessions overlap in time
    (closed intervals; a session ending exactly when another starts
    counts) with the overlap length — co-presence analysis, the
    interval-INTERVAL join events_max_concurrency's sweep line only
    counts and range_join_close_events's point-gap join can't express.

    Shape: sessionize (lag+cumsum islands) → session intervals → the
    bucketized interval_overlap_join (operators/joins.py): intervals
    explode to their 1-hour buckets, pairs meet by bucket EQUI-join, and
    each pair survives only in the bucket holding the later start — no
    nested-loop inequality join anywhere, so the plan is hash-join
    shaped at any scale. Width 3600 s ≈ the typical session length
    (30-min gap rule), keeping the explode factor ~2."""
    from python_multiproc_bigdata_spark.operators.joins import interval_overlap_join

    e = table(prep(spark), sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tsd = F.col("ts").cast("double")
    gap = tsd - F.lag(tsd).over(w)
    sid = F.sum(
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    sess = (
        e.withColumn("tsd", tsd)
        .withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(F.min("tsd").alias("s"), F.max("tsd").alias("e"))
    )
    a = sess.select(
        F.col("user_id").alias("user_a"), F.col("sid").cast("bigint").alias("sess_a"),
        F.col("s").alias("start_a"), F.col("e").alias("end_a"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"), F.col("sid").cast("bigint").alias("sess_b"),
        F.col("s").alias("start_b"), F.col("e").alias("end_b"),
    )
    out = interval_overlap_join(
        a, b, "start_a", "end_a", "start_b", "end_b", width=3600.0
    )
    return out.filter(F.col("user_a") < F.col("user_b")).select(
        "user_a", "sess_a", "user_b", "sess_b",
        F.round(
            F.least("end_a", "end_b") - F.greatest("start_a", "start_b"), 6
        ).alias("overlap_sec"),
    )


SQL_SESSIONS_OVERLAP = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         epoch(ts) - lag(epoch(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), tagged AS (
  SELECT user_id, epoch(ts) AS tsd,
         sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
), sess AS (
  SELECT user_id, CAST(sid AS BIGINT) AS sid,
         min(tsd) AS s, max(tsd) AS e
  FROM tagged GROUP BY 1, 2
)
SELECT a.user_id AS user_a, a.sid AS sess_a,
       b.user_id AS user_b, b.sid AS sess_b,
       round(least(a.e, b.e) - greatest(a.s, b.s), 6) AS overlap_sec
FROM sess a JOIN sess b
  ON a.user_id < b.user_id
 AND greatest(a.s, b.s) <= least(a.e, b.e)
"""


# flat single-window sweep: the exactness oracle for the two-phase split
SQL_MAX_CONCURRENCY = """
WITH gaps AS (
  SELECT user_id, event_type, ts, event_id,
         epoch(ts) - lag(epoch(ts)) OVER
           (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
  FROM events
), sess AS (
  SELECT user_id, event_type, ts,
         sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
), iv AS (
  SELECT event_type, min(ts) AS s, max(ts) AS e
  FROM sess GROUP BY user_id, event_type, sid
), deltas AS (
  SELECT event_type, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS d FROM iv
), run AS (
  SELECT event_type,
         sum(d) OVER (PARTITION BY event_type ORDER BY t ASC, d DESC
                      ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas
)
SELECT event_type, CAST(max(conc) AS BIGINT) AS max_concurrent
FROM run GROUP BY event_type ORDER BY event_type
"""


def events_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution rollup: every purchase is attributed to the
    FIRST and the LAST click/view touch by the same user within the 7
    days before it; output is revenue and purchase counts per
    (attribution model, touch type) — the classic first-touch /
    last-touch comparison table.

    Plan: a bounded interval join (purchases ⋈ touches on user within
    [ts−7d, ts]) — the range-join class, fan-out bounded by per-user
    7-day activity — then one row_number per direction on the joined
    relation ((ts, event_id) total order, so ties are impossible), and
    a |models|×|touch types|-row rollup. Purchases with no touch in
    the window drop out of both models identically (inner join).

    Scale: the interval join shuffles on user_id only; everything after
    is proportional to the touch-attributed purchase set. Revenue sums
    rounded 4dp on both engines."""
    ev = table(prep(spark), sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("revenue"),
    )
    t = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
    )
    j = p.join(t, "u").where(
        (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    w_last = Window.partitionBy("p_id").orderBy(F.desc("t_ts"), F.desc("t_id"))
    w_first = Window.partitionBy("p_id").orderBy(F.asc("t_ts"), F.asc("t_id"))
    attributed = j.select(
        "p_id",
        "revenue",
        "touch_type",
        F.row_number().over(w_last).alias("rn_last"),
        F.row_number().over(w_first).alias("rn_first"),
    )
    def rollup(flag_col: str, model: str) -> DataFrame:
        return (
            attributed.where(F.col(flag_col) == 1)
            .groupBy("touch_type")
            .agg(
                F.count(F.lit(1)).alias("n_purchases"),
                F.round(F.sum("revenue"), 4).alias("revenue"),
            )
            .select(F.lit(model).alias("model"), "touch_type", "n_purchases", "revenue")
        )

    return rollup("rn_first", "first_touch").unionByName(rollup("rn_last", "last_touch"))


SQL_ATTRIBUTION_TOUCH = """
WITH p AS (
  SELECT event_id AS p_id, user_id AS u, ts AS p_ts, value AS revenue
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id AS u, ts AS t_ts, event_id AS t_id, event_type AS touch_type
  FROM events WHERE event_type IN ('click', 'view')
), j AS (
  SELECT p.p_id, p.revenue, t.touch_type,
         row_number() OVER (PARTITION BY p.p_id ORDER BY t.t_ts DESC, t.t_id DESC) AS rn_last,
         row_number() OVER (PARTITION BY p.p_id ORDER BY t.t_ts ASC, t.t_id ASC) AS rn_first
  FROM p JOIN t ON p.u = t.u
   AND t.t_ts <= p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
)
SELECT 'first_touch' AS model, touch_type,
       count(*) AS n_purchases, round(sum(revenue), 4) AS revenue
FROM j WHERE rn_first = 1 GROUP BY touch_type
UNION ALL
SELECT 'last_touch', touch_type, count(*), round(sum(revenue), 4)
FROM j WHERE rn_last = 1 GROUP BY touch_type
"""


REGISTRY = {
    "events_attribution_touch": QuerySpec(
        events_attribution_touch, SQL_ATTRIBUTION_TOUCH
    ),
    "events_max_concurrency": QuerySpec(events_max_concurrency, SQL_MAX_CONCURRENCY),
    "sessions_overlap_pairs": QuerySpec(sessions_overlap_pairs, SQL_SESSIONS_OVERLAP),
    "events_from_json_struct": QuerySpec(events_from_json_struct, SQL_FROM_JSON),
    "events_transition_matrix": QuerySpec(
        events_transition_matrix, SQL_TRANSITION_MATRIX
    ),
    "events_top_session_paths": QuerySpec(
        events_top_session_paths, SQL_TOP_SESSION_PATHS
    ),
    "events_time_decayed_value": QuerySpec(
        events_time_decayed_value, SQL_TIME_DECAYED
    ),
    "events_ewma_value": QuerySpec(events_ewma_value, SQL_EWMA),
    "events_forecast_holt": QuerySpec(events_forecast_holt, SQL_FORECAST_HOLT),
    "events_markov_stationary": QuerySpec(events_markov_stationary, SQL_MARKOV_STATIONARY),
    "events_funnel_latency": QuerySpec(events_funnel_latency, SQL_FUNNEL_LATENCY),
    "events_changepoint_cusum": QuerySpec(events_changepoint_cusum, SQL_CHANGEPOINT_CUSUM),
    "events_frequent_sequences": QuerySpec(events_frequent_sequences, SQL_FREQUENT_SEQUENCES),
    "events_autocorrelation": QuerySpec(events_autocorrelation, SQL_AUTOCORRELATION),
    "events_interarrival_profile": QuerySpec(
        events_interarrival_profile, SQL_INTERARRIVAL_PROFILE
    ),
    "events_seasonality_profile": QuerySpec(events_seasonality_profile, SQL_SEASONALITY),
    "events_survival_km": QuerySpec(events_survival_km, SQL_SURVIVAL_KM),
    "events_attribution_shapley": QuerySpec(events_attribution_shapley, SQL_ATTRIBUTION_SHAPLEY),
    "events_anomaly_zscore": QuerySpec(events_anomaly_zscore, SQL_ANOMALY_ZSCORE),
    "events_linear_attribution": QuerySpec(
        events_linear_attribution, SQL_LINEAR_ATTRIBUTION
    ),
    "events_gapfill_hourly": QuerySpec(events_gapfill_hourly, SQL_GAPFILL_HOURLY),
    "events_props_variant": QuerySpec(events_props_variant, SQL_PROPS_VARIANT),
    "events_funnel_conversion": QuerySpec(events_funnel_conversion, SQL_FUNNEL_ORDERED),
    "events_hierarchical_rollup": QuerySpec(
        events_hierarchical_rollup, SQL_HIERARCHICAL_ROLLUP
    ),
    "events_cumulative_value": QuerySpec(events_cumulative_value, SQL_CUMULATIVE),
    "events_interarrival": QuerySpec(events_interarrival, SQL_INTERARRIVAL),
    "events_json_extract": QuerySpec(events_json_extract, SQL_JSON),
    "events_tumbling_window": QuerySpec(events_tumbling_window, SQL_TUMBLING),
    "events_sliding_window": QuerySpec(events_sliding_window, SQL_SLIDING),
    "events_sessionize": QuerySpec(events_sessionize, SQL_SESSIONIZE),
    "events_session_window": QuerySpec(events_session_window, SQL_SESSION_WINDOW),
    "events_linear_trend": QuerySpec(events_linear_trend, SQL_LINEAR_TREND),
    "events_theilsen_trend": QuerySpec(events_theilsen_trend, SQL_THEILSEN),
    "events_incremental_merge": QuerySpec(events_incremental_merge, SQL_INCREMENTAL_MERGE),
    "events_mad_outliers": QuerySpec(events_mad_outliers, SQL_MAD_OUTLIERS),
    "events_funnel": QuerySpec(events_funnel, SQL_FUNNEL),
    "events_daily_active_users": QuerySpec(events_daily_active_users, SQL_DAU),
    "events_retention_cohorts": QuerySpec(events_retention_cohorts, SQL_RETENTION),
    "events_trailing_1h": QuerySpec(events_trailing_1h, SQL_TRAILING_1H),
}
