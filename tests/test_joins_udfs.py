"""Unit tests: as-of join, bucketized range join, Pandas-UDAF reducer."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.joins import (
    asof_join,
    interval_overlap_join,
    range_join_bucketed,
)
from python_multiproc_bigdata_spark.operators.udfs import median_by_group


def test_asof_join_backward_with_exact_match(spark):
    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", 20.0), (3, "u", 5.0), (4, "v", 10.0)],
        ["id", "user", "t"],
    )
    right = spark.createDataFrame(
        [("u", 10.0, "a"), ("u", 15.0, "b"), ("w", 1.0, "z")],
        ["user", "t", "tag"],
    )
    out = asof_join(left, right, on="t", by="user", right_payload=["tag"])
    got = {r.id: (r.asof.tag if r.asof else None) for r in out.collect()}
    # id1 t=10: exact match 'a'; id2 t=20: latest ≤ 20 is 'b';
    # id3 t=5: nothing before → null; id4 user v: no rights → null
    assert got == {1: "a", 2: "b", 3: None, 4: None}


def test_asof_join_forward_and_nearest(spark):
    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 20), (3, "u", 5), (4, "u", 12), (5, "v", 10)],
        ["id", "user", "t"],
    )
    right = spark.createDataFrame(
        [("u", 10, "a"), ("u", 15, "b"), ("w", 1, "z")],
        ["user", "t", "tag"],
    )
    fwd = asof_join(
        left, right, on="t", by="user", right_payload=["tag"], direction="forward"
    )
    got = {r.id: (r.asof.tag if r.asof else None) for r in fwd.collect()}
    # id1 t=10: exact fwd match 'a'; id2 t=20: nothing ≥ 20 → null;
    # id3 t=5: earliest ≥ 5 is 'a'; id4 t=12: 'b'; id5 user v: null
    assert got == {1: "a", 2: None, 3: "a", 4: "b", 5: None}

    near = asof_join(
        left, right, on="t", by="user", right_payload=["tag"], direction="nearest"
    )
    got = {r.id: (r.asof.tag if r.asof else None) for r in near.collect()}
    # id2 t=20: only backward exists → 'b'; id3 t=5: only forward → 'a';
    # id4 t=12: dist 2 back ('a') vs 3 fwd ('b') → 'a'
    assert got == {1: "a", 2: "b", 3: "a", 4: "a", 5: None}

    # equidistant (12: dist 2 to both 10/'a' and 14/'c') → backward wins
    # (pandas merge_asof tie rule)
    tie = asof_join(
        spark.createDataFrame([(9, "u", 12)], ["id", "user", "t"]),
        spark.createDataFrame([("u", 10, "a"), ("u", 14, "c")], ["user", "t", "tag"]),
        on="t", by="user", right_payload=["tag"], direction="nearest",
    )
    assert tie.collect()[0].asof.tag == "a"


def test_interval_overlap_join_dedup_and_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 0.0, 25.0), (2, 100.0, 100.0), (3, 200.0, 210.0)],
        ["ida", "start_a", "end_a"],
    )
    right = spark.createDataFrame(
        # overlaps id1 across 3 buckets (width 10) — must emit ONCE;
        # touches id2 exactly at a point; disjoint from id3
        [(10, 5.0, 30.0), (11, 100.0, 100.0), (12, 211.0, 220.0)],
        ["idb", "start_b", "end_b"],
    )
    out = interval_overlap_join(
        left, right, "start_a", "end_a", "start_b", "end_b", width=10.0
    )
    pairs = sorted((r.ida, r.idb) for r in out.collect())
    assert pairs == [(1, 10), (2, 11)]  # exactly once each, touch counts


def test_range_join_bucketed_boundaries(spark):
    left = spark.createDataFrame(
        [(1, "u", 0.0), (2, "u", 100.0)], ["id_a", "user", "t"]
    )
    right = spark.createDataFrame(
        [(10, "u", 0.0), (11, "u", 120.0), (12, "u", 121.0), (13, "v", 50.0)],
        ["id_b", "user", "t"],
    )
    out = range_join_bucketed(left, right, on="t", by="user", max_gap=120.0)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    # gap must be in (0, 120]: (1,11) gap=120 in; (1,10) gap=0 out;
    # (1,12) gap=121 out; (2,11) gap=20 in; (2,12) gap=21 in; v key isolated
    assert pairs == {(1, 11), (2, 11), (2, 12)}


def test_median_by_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 10.0), ("b", 4.0), ("b", 6.0)],
        ["k", "v"],
    )
    out = {r.k: (r.median, r.n) for r in median_by_group(df, ["k"], "v").collect()}
    assert out == {"a": (2.0, 3), "b": (5.0, 2)}  # even count → interpolated


def test_char_ngrams_udtf_matches_jvm_path(spark):
    """The UDTF (generality escape hatch) must agree with the JVM-side
    expression form (the fast path) on the same input."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.operators.udfs import char_ngrams_udtf

    spark.udtf.register("char_ngrams_t", char_ngrams_udtf())
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "ab"), (3, None)], "id long, text string"
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT d.id, g.pos, g.ngram FROM udtf_docs d, LATERAL char_ngrams_t(d.text) g"
            ).collect(),
        )
    )
    jvm = sorted(
        map(
            tuple,
            docs.select(
                "id",
                F.posexplode(
                    # NB: Spark sequence(1, 0) DESCENDS ([1,0]) instead of
                    # being empty — guard short strings explicitly
                    F.expr(
                        "CASE WHEN length(text) >= 3 THEN"
                        " transform(sequence(1, length(text) - 2),"
                        " i -> substring(text, i, 3))"
                        " ELSE array() END"
                    )
                ).alias("pos", "ngram"),
            ).collect(),
        )
    )
    assert got == jvm


def test_ewma_per_key_recurrence_exact(spark):
    """Hand-replay of the EWMA fold on a two-key fixture, including
    out-of-order input (the fold must sort by the order columns, not
    trust arrival order)."""
    from python_multiproc_bigdata_spark.operators.udfs import ewma_per_key

    rows = [
        (1, 3.0, 30, 7.0),   # key 1, deliberately shuffled order
        (1, 1.0, 10, 1.0),
        (1, 2.0, 20, 4.0),
        (2, 1.0, 11, 10.0),
    ]
    df = spark.createDataFrame(rows, ["k", "o", "eid", "v"])
    out = ewma_per_key(
        df, "k", ["o", "eid"], "v", alpha=0.5,
        out_schema="k long, o double, eid long, rn long, ewma double",
    ).collect()
    got = {(r.k, r.rn): r.ewma for r in out}
    # key 1 ordered values: 1.0, 4.0, 7.0 → s = 1.0, 2.5, 4.75
    assert got[(1, 1)] == 1.0
    assert got[(1, 2)] == 0.5 * 4.0 + 0.5 * 1.0
    assert got[(1, 3)] == 0.5 * 7.0 + 0.5 * 2.5
    assert got[(2, 1)] == 10.0


def test_holt_forecast_recurrence_exact(spark):
    """Holt fold on a hand series reproduces the textbook recurrence
    bit-for-bit, one row per key, and f_h == level + h*trend; a
    single-point key degrades to (level=y, trend=0)."""
    from python_multiproc_bigdata_spark.operators.udfs import (
        holt_forecast_per_key,
    )

    ys = [10, 14, 9, 20, 7, 30]
    rows = [("a", i, y) for i, y in enumerate(ys)] + [("solo", 0, 42)]
    df = spark.createDataFrame(rows, "k string, hr long, y long")
    got = {
        r.k: r
        for r in holt_forecast_per_key(
            df, "k", ["hr"], "y", alpha=0.5, beta=0.3
        ).collect()
    }

    l = b = None
    for y in ys:
        y = float(y)
        if l is None:
            l, b = y, 0.0
        else:
            nl = 0.5 * y + 0.5 * (l + b)
            b = 0.3 * (nl - l) + 0.7 * b
            l = nl
    a = got["a"]
    assert (a.n_points, a.level, a.trend) == (len(ys), l, b)
    for h in (1, 2, 3):
        assert a[f"f{h}"] == l + h * b
    s = got["solo"]
    assert (s.n_points, s.level, s.trend, s.f3) == (1, 42.0, 0.0, 42.0)
