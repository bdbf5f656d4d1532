"""Structural tests for registry/stats.py (values are oracle-checked by
tools/check_parity.py; these pin the engine-side invariants)."""

import pytest

from python_multiproc_bigdata_spark.registry.stats import (
    grouping_sets_orders,
    split_train_test_documents,
)

SF_DIR = "/root/testdata/sf0.001"


def test_split_is_deterministic_partition(spark):
    rows = {r.split: r.n_docs for r in split_train_test_documents(spark, SF_DIR).collect()}
    assert set(rows) == {"train", "test"}
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(rows.values()) == total  # a partition, not a sample
    # md5 split is stable run-to-run
    again = {r.split: r.n_docs for r in split_train_test_documents(spark, SF_DIR).collect()}
    assert rows == again


def test_grouping_sets_levels(spark):
    out = grouping_sets_orders(spark, SF_DIR).collect()
    # exactly one grand-total row, flagged (1,1) with null group columns
    grand = [r for r in out if r.g_status == 1 and r.g_priority == 1]
    assert len(grand) == 1
    assert grand[0].o_orderstatus is None and grand[0].o_orderpriority is None
    # status subtotals sum to the grand total
    subtotals = [r for r in out if r.g_status == 0 and r.g_priority == 1]
    assert sum(r.n_orders for r in subtotals) == grand[0].n_orders


def test_price_histogram_partitions_rows(spark):
    from python_multiproc_bigdata_spark.registry.stats import (
        N_BUCKETS,
        stats_price_histogram,
    )

    out = stats_price_histogram(spark, SF_DIR).collect()
    li_rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    assert sum(r.n_items for r in out) == li_rows  # every row lands in a bucket
    for r in out:
        assert 0 <= r.bucket < N_BUCKETS
        # observed extremes sit inside the bucket bounds (clamp buckets
        # 0 / N-1 may legitimately hold out-of-range values; none in TPC-H)
        assert r.bucket_lo <= r.min_price <= r.max_price <= r.bucket_hi


def test_argminmax_deterministic_extremes(spark):
    from python_multiproc_bigdata_spark.registry.stats import stats_argminmax_orders

    out = {r.o_orderpriority: r for r in stats_argminmax_orders(spark, SF_DIR).collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    for prio, r in out.items():
        rows = o.filter(o.o_orderpriority == prio).collect()
        mx = max(rows, key=lambda x: (x.o_totalprice, x.o_orderkey))
        mn = min(rows, key=lambda x: (x.o_totalprice, x.o_orderkey))
        assert r.max_price_orderkey == mx.o_orderkey
        assert r.min_price_orderkey == mn.o_orderkey


def test_hll_sketch_union_consistency(spark):
    from python_multiproc_bigdata_spark.registry.stats import stats_hll_users_per_type

    rows = {r.event_type: r for r in stats_hll_users_per_type(spark, SF_DIR).collect()}
    assert "ALL" in rows
    per_type = [r for t, r in rows.items() if t != "ALL"]
    # the union-of-sketches estimate can never undershoot any single type
    assert rows["ALL"].approx_users >= max(r.approx_users for r in per_type)
    assert rows["ALL"].n_events == sum(r.n_events for r in per_type)
    # HLL at this cardinality (~150 users) is exact-ish: within 5%
    exact = (
        spark.read.parquet(f"{SF_DIR}/events.parquet").select("user_id").distinct().count()
    )
    assert abs(rows["ALL"].approx_users - exact) / exact < 0.05


def test_global_index_is_dense_and_parallel(spark):
    from python_multiproc_bigdata_spark.operators.transforms import with_global_index

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey")
    out = with_global_index(o, "o_orderkey", out_col="idx", n_buckets=8)
    rows = sorted((r.o_orderkey, r.idx) for r in out.collect())
    n = len(rows)
    # dense permutation 0..n-1, monotone in the key
    assert [i for _, i in rows] == list(range(n))
    # the whole point: no single-partition global sort in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_global_index_multicol_and_cumsum(spark):
    """The r11 extension: composite (tie-broken) ordering plus running
    sums must reproduce the single-sort window exactly — checked
    against a driver-side replay on a relation with heavy first-key
    ties (so ties genuinely cross the quantile-cut code path)."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.operators.transforms import with_global_index

    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(
            "o_orderkey",
            (F.col("o_orderkey") % 7).alias("k"),  # ~heavy ties on the quantile key
            (F.col("o_orderkey") % 13 + 1).alias("v"),
        )
    )
    out = with_global_index(
        o, ["k", "o_orderkey"], out_col="idx", n_buckets=8, cumsum={"v": "run"}
    )
    rows = sorted((r.k, r.o_orderkey, r.idx, r.v, r.run) for r in out.collect())
    acc = 0
    for i, (_k, _ok, idx, v, run) in enumerate(rows):
        acc += v
        assert idx == i, (i, rows[i])
        assert run == acc, (i, rows[i])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    out.unpersist()


def test_approx_top_k_exact_below_capacity_only(spark):
    """The full-hash oracle for stats_top_types_sketch is legitimate
    only because capacity exceeds cardinality: verify counts are exact
    in that regime and that the over-capacity regime truncates to k."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select((F.col("id") % 100).cast("string").alias("v"))
    exact = {r["v"]: r["n"] for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    big = df.agg(F.expr("approx_top_k(v, 200, 10000)").alias("t")).collect()[0]["t"]
    assert {x["item"]: x["count"] for x in big} == exact
    small = df.agg(F.expr("approx_top_k(v, 10, 10000)").alias("t")).collect()[0]["t"]
    assert len(small) == 10


def test_funnel_requires_strict_stage_order(spark):
    """events_funnel_conversion counts a click only if STRICTLY after
    the user's first view (and purchase strictly after that click) —
    pin with a constructed log where ordering differs per user."""
    from datetime import datetime as dt

    import python_multiproc_bigdata_spark.registry.events as ev

    rows = [
        # u1: view < click < purchase → counts at every stage
        (1, dt(2024, 1, 1, 10, 0), "view"),
        (1, dt(2024, 1, 1, 10, 5), "click"),
        (1, dt(2024, 1, 1, 10, 9), "purchase"),
        # u2: click BEFORE view → viewed only
        (2, dt(2024, 1, 1, 9, 0), "click"),
        (2, dt(2024, 1, 1, 9, 30), "view"),
        # u3: click at the SAME instant as view → strict '>' excludes it
        (3, dt(2024, 1, 1, 8, 0), "view"),
        (3, dt(2024, 1, 1, 8, 0), "click"),
        # u4: purchase before click → clicked only
        (4, dt(2024, 1, 1, 7, 0), "view"),
        (4, dt(2024, 1, 1, 7, 2), "purchase"),
        (4, dt(2024, 1, 1, 7, 5), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    orig = ev.table
    ev.table = lambda s, d, n: df if n == "events" else orig(s, d, n)
    try:
        r = ev.events_funnel_conversion(spark, "unused").collect()[0]
    finally:
        ev.table = orig
    assert (r["n_view"], r["n_click"], r["n_purchase"]) == (4, 2, 1)


def test_hierarchical_rollup_equals_direct_aggregation(spark):
    """The cascade's correctness claim: day-level results derived from
    minute→hour partials equal aggregating raw directly."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.registry.events import (
        events_hierarchical_rollup,
    )
    from python_multiproc_bigdata_spark.registry.common import load_events

    sf = "/root/testdata/sf0.001"
    cascade = {r["day"]: r for r in events_hierarchical_rollup(spark, sf).collect()}
    direct = {
        r["day"]: r
        for r in load_events(spark, sf)
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .collect()
    }
    assert set(cascade) == set(direct)
    for d, row in direct.items():
        assert cascade[d]["n_events"] == row["n_events"], d
        assert abs(cascade[d]["sum_value"] - row["sum_value"]) < 0.02, d


def test_ab_ttest_detects_planted_shift(spark, tmp_path):
    """Welch t on a crafted experiment: treatment values shifted by a
    constant — |t| must be large for the shifted type and ~0 for the
    null type; welch_df stays within (min(n)-1, n_a+n_b-2]."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.registry.stats import stats_ab_ttest

    rows = []
    eid = 0
    for u in range(40):
        for i in range(10):
            eid += 1
            base = float((u * 7 + i * 3) % 11)
            shift = 50.0 if (u % 2 == 1) else 0.0
            rows.append((eid, "2024-01-01 00:00:00", u, "shifted", base + shift, "{}"))
            eid += 1
            rows.append((eid, "2024-01-01 00:00:00", u, "null_effect", base, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = tmp_path / "ab"
    df.write.parquet(str(d / "events.parquet"))
    got = {r.event_type: r for r in stats_ab_ttest(spark, str(d)).collect()}
    assert abs(got["shifted"].t_stat) > 20
    assert abs(got["null_effect"].t_stat) < 2
    for r in got.values():
        assert min(r.n_a, r.n_b) - 1 <= r.welch_df <= r.n_a + r.n_b - 2


def test_eval_langid_f1_invariants(spark):
    """Eval-metrics rollup: tp bounded by both supports, metrics in
    [0,1], F1 harmonic-mean consistency, and totals reconcile (sum of
    gold supports == sum of predicted counts == corpus size)."""
    from python_multiproc_bigdata_spark.registry.text import eval_langid_f1
    from tests.conftest import SF_DIR

    rows = eval_langid_f1(spark, SF_DIR).collect()
    assert rows, "no classes"
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_gold for r in rows) == n_docs
    assert sum(r.n_pred for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.tp <= min(r.n_gold, r.n_pred) or (r.n_gold == 0 or r.n_pred == 0)
        for m in (r.precision, r.recall, r.f1):
            assert 0.0 <= m <= 1.0
        if r.precision + r.recall > 0:
            expected = 2 * r.precision * r.recall / (r.precision + r.recall)
            assert abs(r.f1 - expected) < 5e-3


def test_token_entropy_bounds(spark):
    """H in [0, log2(n_types)]; uniform-unique doc hits the max; TTR in
    (0, 1]."""
    import math

    from python_multiproc_bigdata_spark.registry.text import text_token_entropy
    from tests.conftest import SF_DIR

    rows = text_token_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.entropy_bits <= round(math.log2(r.n_types), 4) + 1e-9
        assert 0 < r.ttr <= 1.0
        assert r.n_types <= r.n_tokens


def test_dp_noised_counts_mechanism(spark):
    """Seeded-Laplace release: deterministic across runs, noise actually
    applied (some groups move), and calibrated — for ε=1 the Laplace
    scale is 1, so |noise| stays well under ~15 (P(|X|>15) = e^-15) and
    the median |noise| sits near ln(2) ≈ 0.69."""
    from python_multiproc_bigdata_spark.registry.stats import (
        privacy_dp_noised_counts,
    )

    a = privacy_dp_noised_counts(spark, "/root/testdata/sf0.001").collect()
    b = privacy_dp_noised_counts(spark, "/root/testdata/sf0.001").collect()
    assert a == b
    noises = [abs(r.noised_n - r.true_n) for r in a]
    assert any(n > 0.01 for n in noises)
    assert max(noises) < 15.0, max(noises)
    noises.sort()
    med = noises[len(noises) // 2]
    assert 0.05 < med < 3.0, med


def test_countmin_never_underestimates_and_is_tight(spark):
    """The CMS >= truth guarantee must hold on every probed token, and
    with 4x256 cells vs a ~10k-token stream the top-20 estimates should
    be within 3x of truth (collision load factor ~40/256 per row)."""
    from python_multiproc_bigdata_spark.registry.stats import (
        stats_countmin_heavy_hitters,
    )

    rows = stats_countmin_heavy_hitters(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    for r in rows:
        assert r.is_overestimate and r.cms_est >= r.true_n
        assert r.cms_est <= 3 * r.true_n, (r.token, r.true_n, r.cms_est)


def test_hll_portable_error_within_bound(spark):
    """Raw HLL at p=8 has sigma = 1.04/sqrt(256) = 6.5%; allow 3 sigma.
    Also sanity: the estimate is positive and scales with the corpus."""
    from python_multiproc_bigdata_spark.registry.stats import stats_hll_portable

    r = stats_hll_portable(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.exact_distinct > 0 and r.hll_estimate > 0
    assert r.rel_error <= 0.195, (r.exact_distinct, r.hll_estimate, r.rel_error)


def test_sketch_mergeability_cms_and_hll():
    """The distributive property the 100 TB story claims: a sketch
    built per partition and MERGED (CMS: cell-wise sum; HLL: register
    max) must equal the sketch built over the whole corpus. Verified on
    the oracle arithmetic via an even/odd doc split — engine-agnostic,
    so it pins the ALGORITHM, not a particular shuffle."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    cms_sql = r"""
    SELECT r,
           (16 * (strpos('0123456789abcdef',
                         substr(md5('cms' || r || '|' || token), 1, 1)) - 1)
            + (strpos('0123456789abcdef',
                      substr(md5('cms' || r || '|' || token), 2, 1)) - 1)) % 256
             AS bucket,
           CAST(count(*) AS BIGINT) AS cell
    FROM (SELECT unnest(list_filter(
            string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
            x -> length(x) > 0)) AS token
          FROM documents WHERE {pred}) CROSS JOIN range(4) t(r)
    GROUP BY 1, 2
    """
    full = {(r, b): c for r, b, c in con.execute(cms_sql.format(pred="true")).fetchall()}
    even = {(r, b): c for r, b, c in con.execute(cms_sql.format(pred="doc_id % 2 = 0")).fetchall()}
    odd = {(r, b): c for r, b, c in con.execute(cms_sql.format(pred="doc_id % 2 = 1")).fetchall()}
    merged = dict(even)
    for k, v in odd.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == full

    hll_sql = r"""
    SELECT bucket, max(CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END) AS m
    FROM (
      SELECT CAST((strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(md5(token), 2, 1)) - 1)
                  AS INTEGER) AS bucket,
             CAST((strpos('0123456789abcdef', substr(md5(token), 3, 1)) - 1)
                  AS BIGINT) AS v
      FROM (SELECT DISTINCT unnest(list_filter(
              string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
              x -> length(x) > 0)) AS token
            FROM documents WHERE {pred}))
    GROUP BY bucket
    """
    # NOTE: truncated-v register here (1 hex digit) — merge algebra is
    # identical regardless of register width
    hfull = dict(con.execute(hll_sql.format(pred="true")).fetchall())
    heven = dict(con.execute(hll_sql.format(pred="doc_id % 2 = 0")).fetchall())
    hodd = dict(con.execute(hll_sql.format(pred="doc_id % 2 = 1")).fetchall())
    hmerged = dict(heven)
    for k, v in hodd.items():
        hmerged[k] = max(hmerged.get(k, 0), v)
    assert hmerged == hfull


def test_embedding_isotropy_matches_bruteforce(spark):
    """The moment identity equals the literal O(n²) average pairwise
    cosine on a small slice, and the panel's values are sane."""
    import numpy as np

    from python_multiproc_bigdata_spark.registry.stats import (
        stats_embedding_isotropy,
    )

    row = stats_embedding_isotropy(spark, "/root/testdata/sf0.001").collect()[0]
    import pyarrow.parquet as pq

    x = np.array(
        pq.read_table("/root/testdata/sf0.001/embeddings.parquet")["embedding"]
        .to_pylist(),
        dtype=np.float64,
    )
    n = len(x)
    assert (row.n_vecs, row.dim) == (n, x.shape[1])
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    g = u @ u.T
    brute = (g.sum() - np.trace(g)) / (n * (n - 1))
    assert abs(row.avg_pairwise_cos - brute) < 1e-4
    assert abs(row.mean_norm - np.linalg.norm(x, axis=1).mean()) < 1e-3


def test_bootstrap_ci_brackets_point_estimate(spark):
    """Poisson-bootstrap CI semantics at sf0.001: every group's 95% CI
    brackets the full-data mean with positive width, and the resample
    weights actually average ~1 (the Poisson(1) cutoffs are calibrated)."""
    from pyspark.sql import functions as F
    from python_multiproc_bigdata_spark.registry.stats import (
        _N_BOOT,
        _POIS_CUTS,
        stats_bootstrap_ci,
    )

    rows = stats_bootstrap_ci(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    for r in rows:
        assert r.ci_lo < r.mean_price < r.ci_hi, r
        assert r.ci_hi - r.ci_lo > 0

    # cutoff calibration: E[w] == sum_k P(u >= c_k) == 1 by construction
    d = float(16**12)
    ew = sum(1.0 - c / d for c in _POIS_CUTS)
    assert abs(ew - (1.0 - 6.7e-5)) < 1e-3  # 1 - tail mass beyond w=6
    assert _N_BOOT == 64


def test_rfm_segmentation_invariants(spark):
    """RFM rollup at sf0.001: scores span 1..5 on every axis, cell
    customer counts sum to the distinct customer count, and quintile
    populations are balanced (sizes differ by at most 1 per axis)."""
    from python_multiproc_bigdata_spark.registry.stats import (
        events_rfm_segmentation,
    )

    rows = events_rfm_segmentation(spark, "/root/testdata/sf0.001").collect()
    n_cust = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for axis in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            per[r[axis]] = per.get(r[axis], 0) + r.n_customers
        assert set(per) == {1, 2, 3, 4, 5}
        assert max(per.values()) - min(per.values()) <= 1, (axis, per)
    assert all(r.avg_spend > 0 for r in rows)


def test_rake_hand_example(spark):
    """RAKE on a hand-traceable corpus: degree/frequency ratios and
    phrase scores computed manually (deep 9/4=2.25, learning 6/3=2.0,
    networks 5/2=2.5, convolutional 3/1=3.0, rate 2/1=2.0)."""
    from python_multiproc_bigdata_spark.registry.text import rake_topk

    docs = spark.createDataFrame(
        [
            (1, "deep learning of deep networks"),
            (2, "deep learning and the learning rate"),
            (3, "deep convolutional networks"),
        ],
        "doc_id long, text string",
    )
    rows = {r.phrase: r for r in rake_topk(docs).collect()}
    # word ratios: deep 9/4=2.25, learning 6/3=2.0, networks 5/2=2.5,
    # convolutional 3/1=3.0, rate 2/1=2.0
    assert rows["deep convolutional networks"].score == 2.25 + 3.0 + 2.5
    assert rows["deep networks"].score == 2.25 + 2.5
    assert rows["deep learning"].score == 2.25 + 2.0
    assert rows["deep learning"].n_occ == 2
    assert rows["learning rate"].score == 2.0 + 2.0
    # stopwords never appear inside phrases
    assert all(
        w not in {"of", "and", "the"}
        for p in rows
        for w in p.split()
    )


def test_gini_matches_independent_recomputation(spark):
    """Spark Gini/top-share panel equals a pure-Python recomputation
    from the same parquet (duckdb read, no Spark)."""
    import duckdb

    from python_multiproc_bigdata_spark.registry.stats import (
        stats_gini_concentration,
    )

    sf = "/root/testdata/sf0.001"
    got = stats_gini_concentration(spark, sf).collect()[0]

    con = duckdb.connect()
    cents = [
        r[0]
        for r in con.execute(
            "SELECT sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) "
            f"FROM read_parquet('{sf}/orders.parquet') GROUP BY o_custkey"
        ).fetchall()
    ]
    xs = sorted(cents)
    n, s0 = len(xs), sum(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    gini = (2 * s1 - (n + 1) * s0) / (n * s0)
    k1, k10 = (n + 99) // 100, (n + 9) // 10
    assert got.n_customers == n
    assert got.gini == round(gini, 6)
    assert got.top1_share == round(sum(xs[n - k1:]) / s0, 6)
    assert got.top10_share == round(sum(xs[n - k10:]) / s0, 6)
    assert 0 < got.gini < 1


def test_l_diversity_consistent_with_marginal(spark):
    """Every class's l_distinct equals the lang variety recomputed from
    the raw marginal, and class sizes sum to the corpus size."""
    from python_multiproc_bigdata_spark.registry.stats import (
        privacy_l_diversity,
    )

    sf = "/root/testdata/sf0.001"
    rows = privacy_l_diversity(spark, sf).collect()
    d = spark.read.parquet(f"{sf}/documents.parquet")
    assert sum(r.class_size for r in rows) == d.count()
    langs: dict[tuple, set] = {}
    for r in d.select("source", "n_chars", "lang").collect():
        langs.setdefault((r.source, r.n_chars // 100), set()).add(r.lang)
    for r in rows:
        assert r.l_distinct == len(langs[(r.source, r.len_bucket)])
        assert r.diverse == (r.l_distinct >= 3)


def test_benford_shares_sum_to_one_and_skew_low(spark):
    """First-digit audit: 9 digits, shares sum to 1, and TPC-H's
    uniform-ish totalprice should NOT follow Benford (big positive
    diff mass on middle digits) — the audit must be able to flag."""
    from python_multiproc_bigdata_spark.registry.stats import (
        stats_benford_firstdigit,
    )

    rows = stats_benford_firstdigit(spark, "/root/testdata/sf0.001").collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_p for r in rows) - 1.0) < 1e-3
    assert any(abs(r.diff) > 0.02 for r in rows)


def test_ltv_cohorts_cumulative_and_consistent(spark):
    """LTV curves: cumulative average is non-decreasing in age within a
    cohort, and the final cumulative LTV × cohort size recovers each
    cohort's total revenue (to cent/floor precision)."""
    from python_multiproc_bigdata_spark.registry.stats import (
        events_ltv_cohorts,
    )

    rows = events_ltv_cohorts(spark, "/root/testdata/sf0.001").collect()
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_mon, []).append(r)
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    total_rev = sum(r.revenue for r in rows)
    import math

    assert math.isclose(
        total_rev,
        sum(row.o_totalprice for row in o.select("o_totalprice").collect()),
        rel_tol=1e-9,
    )
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_month)
        assert all(a.avg_cum_ltv <= b.avg_cum_ltv for a, b in zip(rs, rs[1:]))
        last = rs[-1]
        recovered = last.avg_cum_ltv * last.n_customers
        cohort_rev = sum(r.revenue for r in rs)
        assert abs(recovered - cohort_rev) <= 0.0001 * last.n_customers + 0.01


def test_funnel_latency_hand_log(spark):
    """Hand log: u1 converts view→click in 300s and click→purchase in
    240s; u2 clicks 60s after view, never purchases; u3's click
    precedes its view (excluded). Medians/means over {300,60} and
    {240} exactly."""
    from datetime import datetime as dt

    import python_multiproc_bigdata_spark.registry.events as ev

    rows = [
        (1, dt(2024, 1, 1, 10, 0, 0), "view"),
        (1, dt(2024, 1, 1, 10, 5, 0), "click"),
        (1, dt(2024, 1, 1, 10, 9, 0), "purchase"),
        (2, dt(2024, 1, 1, 9, 0, 0), "view"),
        (2, dt(2024, 1, 1, 9, 1, 0), "click"),
        (3, dt(2024, 1, 1, 8, 5, 0), "click"),
        (3, dt(2024, 1, 1, 8, 30, 0), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    orig = ev.table
    ev.table = lambda s, d, n: df if n == "events" else orig(s, d, n)
    try:
        got = {r.stage: r for r in ev.events_funnel_latency(spark, "unused").collect()}
    finally:
        ev.table = orig
    vc = got["view_to_click"]
    assert (vc.n_users, vc.avg_s, vc.median_s) == (2, 180.0, 180.0)
    cp = got["click_to_purchase"]
    assert (cp.n_users, cp.avg_s, cp.median_s, cp.p90_s) == (1, 240.0, 240.0, 240.0)


def test_cusum_finds_planted_level_shift(spark):
    """CUSUM on a crafted series: type 'shift' doubles its hourly rate
    exactly halfway — the detected changepoint must sit at the shift
    boundary with direction 'up'; a flat type's peak deviation is
    near zero by comparison."""
    from datetime import datetime as dt, timedelta

    import python_multiproc_bigdata_spark.registry.events as ev

    rows = []
    base = dt(2024, 1, 1)
    eid = 0
    for h in range(40):
        n = 2 if h < 20 else 4  # 'shift' doubles at hour 20 (t=21)
        for _ in range(n):
            rows.append((eid, 1, base + timedelta(hours=h, minutes=eid % 50), "shift"))
            eid += 1
        for _ in range(3):  # 'flat' constant
            rows.append((eid, 2, base + timedelta(hours=h, minutes=eid % 50), "flat"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    orig = ev.table
    ev.table = lambda s, d, n: df if n == "events" else orig(s, d, n)
    try:
        got = {
            r.event_type: r
            for r in ev.events_changepoint_cusum(spark, "unused").collect()
        }
    finally:
        ev.table = orig
    assert got["shift"].cp_index == 20 and got["shift"].direction == "up"
    # flat series: every S_t == 0 → tie-break picks t=1, deviation 0
    assert got["flat"].peak_dev == 0.0 and got["flat"].cp_index == 1
    assert abs(got["shift"].peak_dev) > 5


def test_frequent_sequences_gap_and_set_semantics(spark):
    """Gapped pattern semantics on a hand journey: b 3 events after a
    counts (gap ≤ 5), b 6 events after does NOT; a user repeating a
    pattern counts ONCE (set support)."""
    from datetime import datetime as dt, timedelta

    import python_multiproc_bigdata_spark.registry.events as ev

    def journey(uid, types, start):
        return [
            (uid * 100 + i, uid, start + timedelta(minutes=i), t)
            for i, t in enumerate(types)
        ]

    base = dt(2024, 1, 1)
    rows = (
        # u1: view then purchase at gap 3 — counts; repeated later: once
        journey(1, ["view", "x1", "x2", "purchase", "view", "x3", "x4", "purchase"], base)
        # u2: view then purchase at gap 6 — beyond the window
        + journey(2, ["view", "x1", "x2", "x3", "x4", "x5", "purchase"], base)
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    orig = ev.table
    ev.table = lambda s, d, n: df if n == "events" else orig(s, d, n)
    try:
        got = {
            (r.a, r.b): r
            for r in ev.events_frequent_sequences(spark, "unused").collect()
        }
    finally:
        ev.table = orig
    vp = got[("view", "purchase")]
    assert vp.n_users == 1 and vp.support == 0.5
    assert ("x5", "purchase") in got  # adjacent still counts for u2


def test_autocorrelation_alternating_and_constantish(spark):
    """ACF semantics on crafted series: a strictly alternating 2/4
    hourly rate has lag-1 ACF ≈ −1 and lag-2 ACF ≈ +1; the statistic
    matches numpy's corrcoef on the same pairs."""
    from datetime import datetime as dt, timedelta

    import numpy as np

    import python_multiproc_bigdata_spark.registry.events as ev

    rows, eid, base = [], 0, dt(2024, 1, 1)
    counts = [2 if h % 2 == 0 else 4 for h in range(30)]
    for h, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, 1, base + timedelta(hours=h, minutes=eid % 55), "alt"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    orig = ev.table
    ev.table = lambda s, d, n: df if n == "events" else orig(s, d, n)
    try:
        got = {
            (r.event_type, r.lag): r.acf
            for r in ev.events_autocorrelation(spark, "unused").collect()
        }
    finally:
        ev.table = orig
    xs = np.array(counts, dtype=float)
    for k in (1, 2, 3):
        want = np.corrcoef(xs[:-k], xs[k:])[0, 1]
        assert abs(got[("alt", k)] - round(want, 6)) < 1e-6, (k, want)
    assert got[("alt", 1)] < -0.9 and got[("alt", 2)] > 0.9


def test_seasonality_profile_invariants(spark):
    """168 cells at most, counts recover the corpus size, and lift
    averages ~1 weighted by uniform cells (sum of n·lift relations)."""
    from python_multiproc_bigdata_spark.registry.events import (
        events_seasonality_profile,
    )
    from python_multiproc_bigdata_spark.registry.common import load_events

    sf = "/root/testdata/sf0.001"
    rows = events_seasonality_profile(spark, sf).collect()
    assert len(rows) <= 168
    total = load_events(spark, sf).count()
    assert sum(r.n for r in rows) == total
    for r in rows:
        assert 1 <= r.dow <= 7 and 0 <= r.hod <= 23
        assert abs(r.lift - r.n * 168 / total) < 1e-6


def test_shapley_attribution_two_channel_hand_game(spark):
    """Exact 2-channel Shapley: v(A)=0.4, v(B)=0.1, v(AB)=0.6, v(∅)=0
    (unobserved) → φ_A = ½·0.4 + ½·(0.6−0.1) = 0.45, φ_B = 0.15, and
    efficiency holds: φ_A + φ_B = v(AB)."""
    from datetime import datetime as dt, timedelta

    import python_multiproc_bigdata_spark.registry.events as ev

    base, rows, eid = dt(2024, 1, 1), [], 0

    def add(uid, types):
        nonlocal eid
        for t in types:
            rows.append((eid, uid, base + timedelta(minutes=eid), t))
            eid += 1

    for u in range(1, 11):  # {A}: 4/10 convert
        add(u, ["a"] + (["purchase"] if u <= 4 else []))
    for u in range(11, 21):  # {B}: 1/10
        add(u, ["b"] + (["purchase"] if u == 11 else []))
    for u in range(21, 31):  # {A,B}: 6/10
        add(u, ["a", "b"] + (["purchase"] if u <= 26 else []))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    orig = ev.table
    ev.table = lambda s, d, n: df if n == "events" else orig(s, d, n)
    try:
        got = {
            r.channel: r
            for r in ev.events_attribution_shapley(spark, "unused").collect()
        }
    finally:
        ev.table = orig
    assert got["a"].shapley == 0.45 and got["b"].shapley == 0.15
    assert got["a"].n_users == 20 and got["b"].n_users == 20
    assert abs(got["a"].shapley + got["b"].shapley - 0.6) < 1e-9


def test_ks_two_sample_hand_distributions(spark):
    """KS on hand samples A={10,20,30,40}, B={30,40,50,60}: the ECDF
    gap peaks at 0.5 (after v=20), λ = 0.5·√2. Ties at 30/40 are
    evaluated at distinct values only."""
    import math

    import python_multiproc_bigdata_spark.registry.events  # noqa: F401
    import python_multiproc_bigdata_spark.registry.stats as st

    rows = [("1-URGENT", v / 100) for v in (1000, 2000, 3000, 4000)] + [
        ("5-LOW", v / 100) for v in (3000, 4000, 5000, 6000)
    ] + [("3-MEDIUM", 99.0)]  # other priorities must be ignored
    df = spark.createDataFrame(rows, "o_orderpriority string, o_totalprice double")
    orig = st.table
    st.table = lambda s, d, n: df if n == "orders" else orig(s, d, n)
    try:
        r = st.stats_ks_two_sample(spark, "unused").collect()[0]
    finally:
        st.table = orig
    assert (r.n_a, r.n_b) == (4, 4)
    assert r.d_stat == 0.5
    assert r.ks_lambda == round(0.5 * math.sqrt(16 / 8), 6)


def test_mannwhitney_hand_ranks_with_ties(spark):
    """Hand U with tied values: A={10,20,20,50}, B={20,30,40} →
    average rank of the three 20s is 3, R_A = 14, U₁ = 12 + 10 − 14 =
    8. Tie term Σ(t³−t) = 24."""
    import python_multiproc_bigdata_spark.registry.stats as st

    rows = [("1-URGENT", v / 100) for v in (1000, 2000, 2000, 5000)] + [
        ("5-LOW", v / 100) for v in (2000, 3000, 4000)
    ]
    df = spark.createDataFrame(rows, "o_orderpriority string, o_totalprice double")
    orig = st.table
    st.table = lambda s, d, n: df if n == "orders" else orig(s, d, n)
    try:
        r = st.stats_mannwhitney_u(spark, "unused").collect()[0]
    finally:
        st.table = orig
    assert (r.n_a, r.n_b) == (4, 3)
    assert r.u_stat == 8.0
    import math

    sigma2 = 4 * 3 / 12 * ((7 + 1) - 24 / (7 * 6))
    assert r.z == round((8.0 - 6.0) / math.sqrt(sigma2), 6)


def test_spearman_matches_numpy_reference(spark):
    """Spearman ρ on crafted data (a noisy monotone relation with ties)
    equals a numpy reference computed via tie-averaged ranks."""
    import numpy as np

    import python_multiproc_bigdata_spark.registry.stats as st

    rng_x = [1, 2, 2, 3, 4, 5, 5, 6, 7, 8]
    rng_y = [2, 1, 3, 3, 5, 4, 6, 7, 7, 9]  # discount in percent
    rows = [(float(x), y / 100.0) for x, y in zip(rng_x, rng_y)]
    df = spark.createDataFrame(rows, "l_quantity double, l_discount double")
    orig = st.table
    st.table = lambda s, d, n: df if n == "lineitem" else orig(s, d, n)
    try:
        r = st.stats_spearman_corr(spark, "unused").collect()[0]
    finally:
        st.table = orig

    def avg_ranks(v):
        v = np.asarray(v, dtype=float)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j + 1 < len(v) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    ra, rb = avg_ranks(rng_x), avg_ranks(rng_y)
    want = np.corrcoef(ra, rb)[0, 1]
    assert r.n == 10
    assert abs(r.spearman_rho - round(want, 6)) <= 1e-6


def test_nonparametric_panel_random_reference(spark):
    """KS, Mann-Whitney, and the engine's exact rank machinery agree
    with pure-Python references on seeded random data with heavy ties
    (values drawn from a small lattice so ties are guaranteed)."""
    import math
    import random

    import python_multiproc_bigdata_spark.registry.stats as st

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        a = [rng.randrange(1, 15) * 100 for _ in range(40)]
        b = [rng.randrange(3, 18) * 100 for _ in range(30)]
        rows = [("1-URGENT", v / 100) for v in a] + [("5-LOW", v / 100) for v in b]
        df = spark.createDataFrame(rows, "o_orderpriority string, o_totalprice double")
        orig = st.table
        st.table = lambda s, d, n: df if n == "orders" else orig(s, d, n)
        try:
            ks = st.stats_ks_two_sample(spark, "unused").collect()[0]
            mw = st.stats_mannwhitney_u(spark, "unused").collect()[0]
        finally:
            st.table = orig

        # KS reference: sup ECDF gap at distinct values
        na, nb = len(a), len(b)
        d_ref = max(
            abs(sum(x <= v for x in a) / na - sum(x <= v for x in b) / nb)
            for v in sorted(set(a + b))
        )
        assert abs(ks.d_stat - round(d_ref, 6)) <= 1e-6, seed

        # MWU reference: tie-averaged ranks
        pooled = sorted(a + b)
        rank_of = {}
        i = 0
        while i < len(pooled):
            j = i
            while j + 1 < len(pooled) and pooled[j + 1] == pooled[i]:
                j += 1
            rank_of[pooled[i]] = (i + j) / 2 + 1
            i = j + 1
        r_a = sum(rank_of[v] for v in a)
        u_ref = na * nb + na * (na + 1) / 2 - r_a
        assert mw.u_stat == round(u_ref, 2), seed
        ties = 0
        for v in set(pooled):
            t = pooled.count(v)
            ties += t * t * t - t
        nn = na + nb
        sigma2 = na * nb / 12 * ((nn + 1) - ties / (nn * (nn - 1)))
        assert abs(mw.z - round((u_ref - na * nb / 2) / math.sqrt(sigma2), 6)) <= 1e-6


def test_pareto_cutoffs_hand_distribution(spark):
    """Spend {50,20,15,10,5}: 50% needs top-1 (50≥50), 80% top-3
    (85≥80), 90% top-4 (95≥90), 99% top-5."""
    import python_multiproc_bigdata_spark.registry.stats as st

    rows = [(i + 1, float(v)) for i, v in enumerate((50, 20, 15, 10, 5))]
    df = spark.createDataFrame(rows, "o_custkey long, o_totalprice double")
    orig = st.table
    st.table = lambda s, d, n: df if n == "orders" else orig(s, d, n)
    try:
        got = {
            r.threshold_pct: r.top_customers_needed
            for r in st.stats_pareto_cutoffs(spark, "unused").collect()
        }
    finally:
        st.table = orig
    assert got == {50: 1, 80: 3, 90: 4, 99: 5}


def test_survival_km_hand_cohort(spark):
    """Textbook KM: deaths at t=1 (n=5) and t=3 (n=3, after a censor at
    t=2): S(1) = 4/5, S(3) = 4/5 · 2/3. Censored users never appear as
    event rows but stay in the risk set until their censor time."""
    from datetime import datetime as dt, timedelta

    import python_multiproc_bigdata_spark.registry.events as ev

    base, rows, eid = dt(2024, 1, 1), [], 0

    def user(uid, purchase_at_h=None, last_h=5):
        nonlocal eid
        rows.append((eid, uid, base, "view")); eid += 1
        if purchase_at_h is not None:
            rows.append((eid, uid, base + timedelta(hours=purchase_at_h), "purchase"))
            eid += 1
        else:
            rows.append((eid, uid, base + timedelta(hours=last_h), "click"))
            eid += 1

    user(1, purchase_at_h=1)
    user(2, purchase_at_h=3)
    user(3, purchase_at_h=3)
    user(4, purchase_at_h=None, last_h=2)  # censored at 2
    user(5, purchase_at_h=None, last_h=9)  # censored at 9
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    orig = ev.table
    ev.table = lambda s, d, n: df if n == "events" else orig(s, d, n)
    try:
        got = {r.dur: r for r in ev.events_survival_km(spark, "unused").collect()}
    finally:
        ev.table = orig
    assert set(got) == {1, 3}
    assert (got[1].d_i, got[1].n_i) == (1, 5)
    assert got[1].survival == 1.0 * (1.0 - 1.0 / 5.0)
    assert (got[3].d_i, got[3].n_i) == (2, 3)
    assert got[3].survival == (1.0 * (1.0 - 1.0 / 5.0)) * (1.0 - 2.0 / 3.0)


def test_mutual_information_independent_and_dependent(spark):
    """MI semantics: an independent 2×2 layout gives MI ≈ 0 (and tiny
    NMI); a perfectly dependent one (lang determines source) gives
    MI == H(lang) and NMI == 1."""
    import python_multiproc_bigdata_spark.registry.stats as st

    def run(rows):
        df = spark.createDataFrame(rows, "lang string, source string")
        orig = st.table
        st.table = lambda s, d, n: df if n == "documents" else orig(s, d, n)
        try:
            return st.stats_mutual_information(spark, "unused").collect()[0]
        finally:
            st.table = orig

    indep = (
        [("en", "web")] * 20 + [("en", "books")] * 20
        + [("fr", "web")] * 10 + [("fr", "books")] * 10
    )
    r = run(indep)
    assert r.mi_nats == 0.0 and r.nmi == 0.0

    dep = [("en", "web")] * 30 + [("fr", "books")] * 30
    r = run(dep)
    import math

    assert r.mi_nats == round(math.log(2), 4)
    assert r.nmi == 1.0


def test_theilsen_robust_to_outlier_hour(spark):
    """A clean slope-2 series with one wild outlier hour: Theil–Sen
    recovers slope ≈ 2 (median of pairwise slopes) where OLS would be
    dragged; exact expectation computed from the crafted pairs."""
    from datetime import datetime as dt, timedelta

    import python_multiproc_bigdata_spark.registry.events as ev

    base, rows, eid = dt(2024, 1, 1), [], 0
    counts = [2 + 2 * h for h in range(10)]
    counts[5] = 100  # outlier hour
    for h, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, 1, base + timedelta(hours=h, minutes=eid % 50), "t"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    orig = ev.table
    ev.table = lambda s, d, n: df if n == "events" else orig(s, d, n)
    try:
        r = ev.events_theilsen_trend(spark, "unused").collect()[0]
    finally:
        ev.table = orig
    assert r.n_pairs == 45
    # reference: median of floored micro-slopes, numpy-free
    slopes = sorted(
        ((counts[j] - counts[i]) * 1000000) // (j - i) if (counts[j] - counts[i]) >= 0
        else -((-(counts[j] - counts[i]) * 1000000) // (j - i))
        for i in range(10) for j in range(i + 1, 10)
    )
    n = len(slopes)
    med = (slopes[n // 2 - 1] + slopes[n // 2]) / 2 if n % 2 == 0 else slopes[n // 2]
    assert r.theilsen_slope == round(med / 1000000.0, 6)
    assert abs(r.theilsen_slope - 2.0) < 1.0  # robust: near true slope 2


def test_t_closeness_flags_skewed_class(spark, tmp_path):
    """t-closeness on a crafted corpus: a class holding ALL of a rare
    lang must be flagged (TVD 0.9), a class near the global mix must
    not (TVD 0.1) — exact cross-multiplied values, not approximations."""
    from python_multiproc_bigdata_spark.registry.stats import (
        privacy_t_closeness,
    )

    rows = []
    did = 0
    for _ in range(10):  # class a: 10 docs, all rare lang zz
        rows.append((did, "a", 50, "zz")); did += 1
    for i in range(90):  # class b: 45 en + 45 fr
        rows.append((did, "b", 50, "en" if i % 2 == 0 else "fr")); did += 1
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars", "lang"])
    d = tmp_path / "tc"
    df.write.parquet(str(d / "documents.parquet"))
    got = {r.source: r for r in privacy_t_closeness(spark, str(d)).collect()}
    assert got["a"].class_size == 10 and got["b"].class_size == 90
    assert got["a"].tvd == 0.9 and got["a"].leaky
    assert got["b"].tvd == 0.1 and not got["b"].leaky


def test_quantile_sketch_within_one_bucket(spark):
    """The fixed-grid sketch's interpolated readback must sit within
    one bucket width of the exact percentile at every probe (the
    construction bound the query's err column makes checkable), and
    the estimate must be monotone in p."""
    from python_multiproc_bigdata_spark.registry.stats import (
        stats_quantile_sketch,
    )

    rows = sorted(
        stats_quantile_sketch(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.p,
    )
    assert [r.p for r in rows] == [0.5, 0.9, 0.99, 0.999]
    for r in rows:
        assert r.abs_err_cents <= r.bucket_width_cents, r
    ests = [r.est_usd for r in rows]
    assert ests == sorted(ests)


def test_heaps_law_curve_and_fit(spark, tmp_path):
    """On a crafted corpus whose vocabulary grows like sqrt(tokens),
    the relational log-log OLS must recover beta ~ 0.5 and match
    numpy's polyfit on the same 10 points; on the SYNTHETIC testdata
    corpus (a closed 31-token vocabulary) the diagnostic must report
    saturation: flat cum_vocab and beta == 0 exactly."""
    import math

    import numpy as np

    from python_multiproc_bigdata_spark.registry.text import text_heaps_law

    # crafted Heaps corpus: token at global position g is w_isqrt(g),
    # so V(T) = floor(sqrt(T)) + 1 -> beta ~ 0.5
    docs = []
    for i in range(200):
        words = [f"w{math.isqrt(i * 20 + j)}" for j in range(20)]
        docs.append((i, " ".join(words), "en", "synthetic", len(" ".join(words))))
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"])
    d = tmp_path / "heaps"
    df.write.parquet(str(d / "documents.parquet"))

    rows = sorted(text_heaps_law(spark, str(d)).collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == list(range(1, 11))
    toks = [r.cum_tokens for r in rows]
    vocab = [r.cum_vocab for r in rows]
    assert toks == sorted(toks) and vocab == sorted(vocab)
    assert all(v <= t for v, t in zip(vocab, toks))
    beta = rows[0].heaps_beta
    assert 0.45 < beta < 0.55
    slope, intercept = np.polyfit(
        [math.log(t) for t in toks], [math.log(v) for v in vocab], 1
    )
    assert abs(beta - slope) < 1e-3
    assert abs(rows[0].heaps_k - math.exp(intercept)) <= 1e-3 * math.exp(intercept)

    # the synthetic testdata corpus: closed vocabulary -> saturation
    sat = sorted(
        text_heaps_law(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.k,
    )
    assert len({r.cum_vocab for r in sat}) == 1  # flat from checkpoint 1
    assert sat[0].heaps_beta == 0.0


def test_interarrival_burstiness_on_crafted_traffic(spark, tmp_path):
    """A strictly periodic stream must profile as B = -1 (cv 0) and a
    two-scale bursty stream as B > 0; mean must equal the exact gap."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.registry.events import (
        events_interarrival_profile,
    )

    rows = []
    eid = 0
    # periodic: user 1, every 10 s exactly
    for i in range(50):
        eid += 1
        rows.append((eid, 1_700_000_000_000_000 + i * 10_000_000, 1, "tick", 1.0, "{}"))
    # bursty: user 2, one dense 1 s-spaced burst of 49 events, then one
    # straggler 100000 s later -> 48 tiny gaps + 1 huge gap (cv ~ 6.9)
    t = 1_700_000_000_000_000
    for i in range(49):
        eid += 1
        rows.append((eid, t + i * 1_000_000, 2, "burst", 1.0, "{}"))
    eid += 1
    rows.append((eid, t + 48 * 1_000_000 + 100_000_000_000, 2, "burst", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "us", "user_id", "event_type", "value", "props"]
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    d = tmp_path / "ia"
    df.write.parquet(str(d / "events.parquet"))
    got = {r.event_type: r for r in events_interarrival_profile(spark, str(d)).collect()}
    tick = got["tick"]
    assert tick.n_gaps == 49 and tick.mean_s == 10.0
    assert tick.cv == 0.0 and tick.burstiness == -1.0
    burst = got["burst"]
    assert burst.n_gaps == 49
    assert burst.burstiness > 0.5  # two-scale traffic is strongly bursty


def test_hll_sliding_merge_accuracy_and_monotonicity(spark):
    """The merged trailing-window sketch must track the exact trailing
    distinct within the p=8 error regime (<= 20% at these counts), and
    the trailing-window exact count can never be below the best single
    day inside it (merge sanity)."""
    from python_multiproc_bigdata_spark.registry.stats import (
        events_hll_sliding_users,
    )

    rows = sorted(
        events_hll_sliding_users(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.day,
    )
    assert len(rows) >= 7
    for r in rows:
        assert r.rel_error <= 0.20, (r.day, r.rel_error)
        assert r.hll_estimate > 0
    # trailing window is a superset of each member day: exact counts
    # never shrink vs a 1-day window at the warmup ramp's start
    assert rows[6].exact_users >= rows[0].exact_users


def test_temporal_holdout_no_leakage(spark):
    """The temporal split's defining property: every user's last train
    event precedes their first test event (max_train_us < min_test_us
    whenever both sides are non-empty), the global 80/20 proportion
    holds, and counts reconcile to the corpus."""
    from python_multiproc_bigdata_spark.registry.stats import (
        split_temporal_holdout,
    )

    rows = split_temporal_holdout(spark, "/root/testdata/sf0.001").collect()
    total_train = sum(r.n_train for r in rows)
    total_test = sum(r.n_test for r in rows)
    n = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert total_train + total_test == n
    assert 0.75 <= total_train / n <= 0.85
    for r in rows:
        if r.n_train > 0 and r.n_test > 0:
            assert r.max_train_us < r.min_test_us, r.user_id


def test_velocity_gate_flags_burst_user(spark, tmp_path):
    """A user firing 10 events inside one 5-minute bucket must be
    flagged; a user spreading 10 events over 10 separate buckets must
    not — and peak/mean/total must reconcile exactly."""
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.registry.stats import (
        events_velocity_gate,
    )

    rows = []
    eid = 0
    base = 1_700_000_000_000_000
    for i in range(10):  # burst user: all inside one bucket
        eid += 1
        rows.append((eid, base + i * 1_000_000, 1, "view", 1.0, "{}"))
    for i in range(10):  # steady user: one event per 5-min bucket
        eid += 1
        rows.append((eid, base + i * 300_000_000, 2, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "us", "user_id", "event_type", "value", "props"]
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    d = tmp_path / "vel"
    df.write.parquet(str(d / "events.parquet"))
    got = {r.user_id: r for r in events_velocity_gate(spark, str(d)).collect()}
    assert got[1].peak_per_5min == 10 and got[1].flagged
    assert got[1].active_buckets == 1 and got[1].n_events == 10
    assert got[2].peak_per_5min == 1 and not got[2].flagged
    assert got[2].active_buckets == 10 and got[2].mean_rate == 1.0


def test_hll_bucket_rho_matches_hashlib_reference(spark):
    """operators/sketches.py's conv()-based bucket/rho (r8) must agree
    with an independent hashlib-md5 reference — the expression is
    shared by three value-checked queries, so a silent hex-extraction
    bug here would shift every sketch in the same wrong direction."""
    import hashlib

    from python_multiproc_bigdata_spark.operators.sketches import hll_bucket_rho

    vals = ["", "hello", "0", "a" * 300, "عَرَبِي", "1\x012"]
    df = spark.createDataFrame([(v,) for v in vals], "val string")
    bucket, rho = hll_bucket_rho("val")
    got = {
        r.val: (r.b, r.r)
        for r in df.select("val", bucket.alias("b"), rho.alias("r")).collect()
    }
    for v in vals:
        h = hashlib.md5(v.encode()).hexdigest()
        w = int(h[2:14], 16)
        exp_rho = 49 if w == 0 else 49 - w.bit_length()
        assert got[v] == (int(h[:2], 16), exp_rho), v
