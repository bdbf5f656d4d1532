"""Recommender-system queries: item-item collaborative filtering over
TPC-H purchase behavior (the Amazon-style "customers who bought X also
bought Y" serving tables every large-scale recsys pipeline starts from).

Two capability classes beyond the association-rule mining in
registry/curation.py (basket_association_rules mines per-ORDER pair
support/confidence/lift): here the interaction unit is the CUSTOMER's
whole purchase history, similarity is cosine-normalized co-occurrence,
and the outputs are ranked serving artifacts — a per-item neighbor list
and per-user personalized recommendations.

Reference scope: extends the reference's per-key counting
(v2 ReduceItemTransformer, reference core/transformers.py) to
co-occurrence statistics and ranked retrieval; no reference operator is
ported here.

Parity notes: every double that reaches the hash compare is either
round()ed identically on both engines or summed as an EXACT INTEGER
(micro-units) first — float sums are order-dependent across engines,
integer sums are not (same convention as events_linear_trend).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table


def _interactions(s: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (custkey, brand) purchase incidence.

    Scale shape: lineitem joins the broadcast part dim map-side, then
    the one big shuffle of the family — lineitem⋈orders on orderkey
    (bucket both on orderkey at 100 TB and this co-locates) — and the
    distinct reshuffles on (custkey, brand), which is also the
    partitioning every downstream per-customer stage wants."""
    li = table(s, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(s, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pt = table(s, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("custkey"), F.col("p_brand").alias("brand"))
        .distinct()
    )


def _sims_from_interactions(inter: DataFrame) -> DataFrame:
    """Symmetric item-item cosine relation (brand, neighbor, n_co,
    sim_micro) with sim_micro = round(1e6 * co / sqrt(n_a * n_b)) as
    BIGINT — the integer form downstream sums stay exact in.

    The unordered pairs expand MAP-SIDE from each customer's sorted
    brand array (25-brand space → ≤300 pairs/customer) — no
    interactions self-join shuffle. `_bs` is referenced via size() in
    the pair expression so CollapseProject cannot inline the
    collect_set into the lambda (the O(n^2) re-eval trap, SCALE.md).
    At a real item cardinality (millions of items) the pair expansion
    gets capped per user and the co-count groupBy is the shuffle to
    salt; the cosine math and ranking below are unchanged."""
    cnt = inter.groupBy("brand").agg(F.count(F.lit(1)).alias("n"))
    baskets = inter.groupBy("custkey").agg(
        F.array_sort(F.collect_set("brand")).alias("_bs")
    )
    pair_expr = F.expr(
        """
        flatten(transform(_bs, (x, i) ->
          transform(slice(_bs, i + 2, greatest(size(_bs) - i - 1, 1)),
                    y -> struct(x AS brand_a, y AS brand_b))))
        """
    )
    pairs = (
        baskets.select(F.explode_outer(pair_expr).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    sym = pairs.select("brand_a", "brand_b", "n_co").union(
        pairs.select(
            F.col("brand_b").alias("brand_a"),
            F.col("brand_a").alias("brand_b"),
            "n_co",
        )
    )
    ca = cnt.select(F.col("brand").alias("brand_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("brand").alias("brand_b"), F.col("n").alias("nb"))
    return (
        sym.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .select(
            F.col("brand_a").alias("brand"),
            F.col("brand_b").alias("neighbor"),
            "n_co",
            F.round(
                F.col("n_co").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("sim_micro"),
        )
    )


def _item_sims(s: SparkSession, sf_dir: str) -> DataFrame:
    return _sims_from_interactions(_interactions(s, sf_dir))


def recsys_item_similar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item neighbor serving table: for every brand, its top-3
    most-similar brands by cosine over customer purchase vectors
    (co-customers / sqrt(n_a * n_b)), ties broken by neighbor name.

    Ranking happens on the INTEGER micro-cosine, so the order the
    window sees is bit-identical on both engines; the exported cosine
    is derived from that same integer (never re-divided)."""
    sims = _item_sims(prep(spark), sf_dir)
    w = Window.partitionBy("brand").orderBy(F.desc("sim_micro"), F.asc("neighbor"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "brand",
            "neighbor",
            "n_co",
            F.round(F.col("sim_micro") / F.lit(1000000.0), 6).alias("cosine"),
            "rank",
        )
    )


_SIMS_CTES = """
WITH inter AS (
  SELECT DISTINCT o.o_custkey AS custkey, p.p_brand AS brand
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
),
cnt AS (SELECT brand, count(*) AS n FROM inter GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_co
  FROM inter a JOIN inter b ON a.custkey = b.custkey AND a.brand < b.brand
  GROUP BY a.brand, b.brand
),
sym AS (
  SELECT brand_a, brand_b, n_co FROM pairs
  UNION ALL
  SELECT brand_b AS brand_a, brand_a AS brand_b, n_co FROM pairs
),
sims AS (
  SELECT s.brand_a AS brand, s.brand_b AS neighbor, s.n_co,
         CAST(round(CAST(s.n_co AS DOUBLE)
                    / sqrt(CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS sim_micro
  FROM sym s
  JOIN cnt ca ON s.brand_a = ca.brand
  JOIN cnt cb ON s.brand_b = cb.brand
)
"""


SQL_ITEM_SIMILAR = _SIMS_CTES + """
, ranked AS (
  SELECT brand, neighbor, n_co, sim_micro,
         row_number() OVER (PARTITION BY brand
                            ORDER BY sim_micro DESC, neighbor ASC) AS rank
  FROM sims
)
SELECT brand, neighbor, n_co,
       round(sim_micro / 1000000.0, 6) AS cosine, rank
FROM ranked WHERE rank <= 3
"""


def recsys_user_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized top-3 brand recommendations for a deterministic
    1/16 customer sample (md5(custkey) < '1'): each candidate brand the
    customer has NOT bought is scored by the SUM of its cosine
    similarity to every brand they HAVE bought (classic item-based CF
    scoring), ranked per customer by (score DESC, brand ASC).

    Scale shape: the similarity relation is items^2-bounded (tiny here,
    top-M-pruned at real item counts) and BROADCAST, so scoring is one
    map-side join off the (custkey, brand)-partitioned interactions,
    one (custkey, candidate) partial-agg shuffle, and one window — the
    anti-join back onto the same interactions partitioning removes
    already-owned candidates without a new exchange shape. Scores are
    summed in exact integer micro-units (order-independent), divided
    back to a double only at export."""
    s = prep(spark)
    # interactions feed THREE consumers (similarity build, the sampled
    # scoring join, the owned-items anti-join) — materialize once
    # (measured 5.4 s -> 3.9 s at sf0.1; the relation is the distinct
    # (customer, item) incidence — dedup-bounded; cluster storage at
    # real scale)
    inter = _interactions(s, sf_dir).localCheckpoint(eager=True)
    sims = _sims_from_interactions(inter)
    sampled = inter.filter(F.md5(F.col("custkey").cast("string")) < "1")
    scores = (
        sampled.join(F.broadcast(sims), "brand")
        .groupBy("custkey", F.col("neighbor").alias("candidate"))
        .agg(F.sum("sim_micro").alias("score_micro"))
    )
    owned = inter.select(
        "custkey", F.col("brand").alias("candidate")
    )
    fresh = scores.join(owned, ["custkey", "candidate"], "left_anti")
    w = Window.partitionBy("custkey").orderBy(
        F.desc("score_micro"), F.asc("candidate")
    )
    return (
        fresh.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "custkey",
            "candidate",
            F.round(F.col("score_micro") / F.lit(1000000.0), 6).alias("score"),
            "rank",
        )
    )


SQL_USER_RECOMMEND = _SIMS_CTES + """
, sampled AS (
  SELECT custkey, brand FROM inter
  WHERE md5(CAST(custkey AS VARCHAR)) < '1'
),
scores AS (
  SELECT sa.custkey, si.neighbor AS candidate,
         sum(si.sim_micro) AS score_micro
  FROM sampled sa JOIN sims si ON sa.brand = si.brand
  GROUP BY sa.custkey, si.neighbor
),
fresh AS (
  SELECT sc.* FROM scores sc
  ANTI JOIN inter i
    ON sc.custkey = i.custkey AND sc.candidate = i.brand
),
ranked AS (
  SELECT custkey, candidate, score_micro,
         row_number() OVER (PARTITION BY custkey
                            ORDER BY score_micro DESC, candidate ASC) AS rank
  FROM fresh
)
SELECT custkey, candidate,
       round(score_micro / 1000000.0, 6) AS score, rank
FROM ranked WHERE rank <= 3
"""


def recsys_eval_hitrate_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-last-out accuracy eval for the item-based recommender —
    the temporal protocol recsys papers report: for each eligible
    customer (>=2 brands, deterministic md5 quarter-sample), HOLD OUT
    the brand they adopted LAST (latest first-purchase date, ties to
    the lower brand), retrain the similarity relation on the remaining
    interactions only (no leakage: holding out the last FIRST-TIME
    brand removes ALL of that pair's support), score candidates with
    the standard CF sum, and report hit-rate@10 and MRR@10 as ONE row.

    Exactness: dates and counts are integers; per-hit reciprocal ranks
    are summed as round(1e6/rank) BIGINT micro-units (rank <= 10, so
    order-independent) and divided back once at export — the
    eval_ranking_ndcg integer-gain discipline. Scale shape: identical
    to recsys_user_recommend (broadcast sims over the (custkey, brand)
    partitioning) plus one row_number to pick each user's holdout."""
    s = prep(spark)
    li = table(s, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(s, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    pt = table(s, sf_dir, "part").select("p_partkey", "p_brand")
    ev = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("p_brand").alias("brand"),
            "o_orderdate",
        )
    )
    firsts = ev.groupBy("custkey", "brand").agg(
        F.min("o_orderdate").alias("first_dt")
    )
    wl = Window.partitionBy("custkey").orderBy(F.desc("first_dt"), F.asc("brand"))
    # r12: materialize MARKED (the corpus-scale join + window) instead of
    # train — the old shape checkpointed only the train filter, so the
    # eligible groupBy and the holdout filter each replayed the full
    # lineitem⋈orders⋈window lineage (3x), ~22 exchanges per run. With
    # marked checkpointed once, train/holdout are trivial filters over
    # materialized rows.
    # r13 (guide §2.4): the per-customer brand count rides the SAME
    # partitionBy(custkey) exchange as the rank (unsorted count frame
    # beside the sorted rank frame — one shuffle), so `eligible` is a
    # filter over marked instead of a groupBy + second checkpoint, and
    # `holdout` needs no eligible join at all (n_brands >= 2 and the
    # md5 quarter-sample are row-local predicates on the _r = 1 row).
    marked = (
        firsts.withColumn("_r", F.row_number().over(wl))
        .withColumn(
            "_nb", F.count(F.lit(1)).over(Window.partitionBy("custkey"))
        )
        .withColumn(
            "_el",
            (F.col("_nb") >= 2) & (F.md5(F.col("custkey").cast("string")) < "4"),
        )
        .localCheckpoint(eager=True)
    )
    train = marked.filter(F.col("_r") >= 2).select("custkey", "brand")
    eligible = marked.filter((F.col("_r") == 1) & F.col("_el")).select("custkey")
    holdout = marked.filter((F.col("_r") == 1) & F.col("_el")).select(
        "custkey", F.col("brand").alias("held")
    )
    sims = _sims_from_interactions(train)
    sampled = train.join(eligible, "custkey")
    scores = (
        sampled.join(F.broadcast(sims), "brand")
        .groupBy("custkey", F.col("neighbor").alias("candidate"))
        .agg(F.sum("sim_micro").alias("score_micro"))
    )
    fresh = scores.join(
        train.select("custkey", F.col("brand").alias("candidate")),
        ["custkey", "candidate"],
        "left_anti",
    )
    wr = Window.partitionBy("custkey").orderBy(
        F.desc("score_micro"), F.asc("candidate")
    )
    topk = fresh.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= 10
    )
    hits = topk.join(holdout, "custkey").filter(
        F.col("candidate") == F.col("held")
    )
    n_eval = eligible.agg(F.count(F.lit(1)).cast("long").alias("n_eval"))
    agg = hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_hit"),
        F.coalesce(
            F.sum(F.round(F.lit(1000000.0) / F.col("rank"), 0).cast("long")),
            F.lit(0),
        )
        .cast("long")
        .alias("mrr_micro"),
    )
    return n_eval.crossJoin(agg).select(
        "n_eval",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_eval"), 6).alias("hit_rate_at_10"),
        F.round(F.col("mrr_micro") / F.col("n_eval") / 1000000.0, 6).alias(
            "mrr_at_10"
        ),
    )


SQL_EVAL_HITRATE_LOO = """
WITH ev AS (
  SELECT o.o_custkey AS custkey, p.p_brand AS brand, o.o_orderdate
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
),
firsts AS (
  SELECT custkey, brand, min(o_orderdate) AS first_dt
  FROM ev GROUP BY 1, 2
),
marked AS (
  SELECT custkey, brand,
         row_number() OVER (PARTITION BY custkey
                            ORDER BY first_dt DESC, brand ASC) AS _r
  FROM firsts
),
train AS (SELECT custkey, brand FROM marked WHERE _r >= 2),
eligible AS (
  SELECT custkey FROM marked GROUP BY custkey
  HAVING count(*) >= 2 AND md5(CAST(custkey AS VARCHAR)) < '4'
),
holdout AS (
  SELECT m.custkey, m.brand AS held
  FROM marked m JOIN eligible e ON m.custkey = e.custkey
  WHERE m._r = 1
),
cnt AS (SELECT brand, count(*) AS n FROM train GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_co
  FROM train a JOIN train b ON a.custkey = b.custkey AND a.brand < b.brand
  GROUP BY a.brand, b.brand
),
sym AS (
  SELECT brand_a, brand_b, n_co FROM pairs
  UNION ALL
  SELECT brand_b AS brand_a, brand_a AS brand_b, n_co FROM pairs
),
sims AS (
  SELECT s.brand_a AS brand, s.brand_b AS neighbor, s.n_co,
         CAST(round(CAST(s.n_co AS DOUBLE)
                    / sqrt(CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS sim_micro
  FROM sym s
  JOIN cnt ca ON s.brand_a = ca.brand
  JOIN cnt cb ON s.brand_b = cb.brand
),
sampled AS (
  SELECT t.custkey, t.brand FROM train t JOIN eligible e ON t.custkey = e.custkey
),
scores AS (
  SELECT sa.custkey, si.neighbor AS candidate,
         sum(si.sim_micro) AS score_micro
  FROM sampled sa JOIN sims si ON sa.brand = si.brand
  GROUP BY sa.custkey, si.neighbor
),
fresh AS (
  SELECT sc.* FROM scores sc
  ANTI JOIN train t
    ON sc.custkey = t.custkey AND sc.candidate = t.brand
),
topk AS (
  SELECT custkey, candidate,
         row_number() OVER (PARTITION BY custkey
                            ORDER BY score_micro DESC, candidate ASC) AS rank
  FROM fresh
),
hits AS (
  SELECT t.custkey, t.rank
  FROM topk t JOIN holdout h ON t.custkey = h.custkey AND t.candidate = h.held
  WHERE t.rank <= 10
),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_eval FROM eligible),
ag AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hit,
         CAST(COALESCE(sum(CAST(round(1000000.0 / rank, 0) AS BIGINT)), 0)
              AS BIGINT) AS mrr_micro
  FROM hits
)
SELECT n_eval, n_hit,
       round(n_hit * 1.0 / n_eval, 6) AS hit_rate_at_10,
       round(mrr_micro / n_eval / 1000000.0, 6) AS mrr_at_10
FROM ne CROSS JOIN ag
"""


def recsys_eval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-quality eval for the recommender: catalog COVERAGE (what
    share of brands ever appear in anyone's top-3 — a popularity-biased
    recommender collapses here) and intra-list DIVERSITY (mean pairwise
    dissimilarity 1 − cosine inside each user's list, averaged over
    users) — the two health metrics that catch degenerate recommenders
    accuracy metrics miss. One row: n_users, n_brands, coverage,
    avg_intra_diversity.

    Exactness: the pairwise dissimilarity sums INTEGER micro-cosines
    (the sims relation's own units) over each list's ≤3 pairs and
    divides once; coverage is a count ratio. The recommendation and
    similarity relations are the registered queries' own (shared
    helpers), so this eval driver-gates their composition too."""
    s = prep(spark)
    inter = _interactions(s, sf_dir).localCheckpoint(eager=True)
    # r12: the first cut called recsys_user_recommend(), which built its
    # OWN interactions checkpoint and sims tower on top of this one, and
    # consumed the un-materialized recs relation four times (coverage
    # distinct, the diversity self-join twice, n_users) — ~25 jobs/run.
    # Everything now derives from ONE interactions checkpoint; sims and
    # recs are item²-/sample-bounded, so their checkpoints are one tiny
    # job each and every consumer reads materialized rows. The recs
    # arithmetic is the registered query's own (same integer micro-unit
    # sums, same ranking), so values are unchanged.
    sims = _sims_from_interactions(inter).localCheckpoint(eager=True)
    sampled = inter.filter(F.md5(F.col("custkey").cast("string")) < "1")
    scores = (
        sampled.join(F.broadcast(sims), "brand")
        .groupBy("custkey", F.col("neighbor").alias("candidate"))
        .agg(F.sum("sim_micro").alias("score_micro"))
    )
    fresh = scores.join(
        inter.select("custkey", F.col("brand").alias("candidate")),
        ["custkey", "candidate"],
        "left_anti",
    )
    wr = Window.partitionBy("custkey").orderBy(
        F.desc("score_micro"), F.asc("candidate")
    )
    recs = (
        fresh.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 3)
        .select("custkey", "candidate")
        .localCheckpoint(eager=True)
    )
    nb = inter.agg(F.countDistinct("brand").alias("n_brands"))
    covered = recs.select(F.col("candidate").alias("brand")).distinct()
    cov = covered.agg(F.count(F.lit(1)).alias("n_covered"))
    pairs = (
        recs.alias("x")
        .join(recs.alias("y"), "custkey")
        .filter(F.col("x.candidate") < F.col("y.candidate"))
        .select(
            "custkey",
            F.col("x.candidate").alias("brand"),
            F.col("y.candidate").alias("neighbor"),
        )
        .join(
            F.broadcast(sims.select("brand", "neighbor", "sim_micro")),
            ["brand", "neighbor"],
            "left",
        )
        .select(F.coalesce(F.col("sim_micro"), F.lit(0)).alias("sim_micro"))
    )
    div = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("sim_micro").alias("sum_micro"),
    )
    nu = recs.select("custkey").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    return (
        nu.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(cov))
        .crossJoin(F.broadcast(div))
        .select(
            "n_users",
            "n_brands",
            F.round(
                F.col("n_covered").cast("double") / F.col("n_brands").cast("double"),
                6,
            ).alias("coverage"),
            F.round(
                F.lit(1.0)
                - F.col("sum_micro").cast("double")
                / (F.col("n_pairs").cast("double") * F.lit(1000000.0)),
                6,
            ).alias("avg_intra_diversity"),
        )
    )


SQL_EVAL_COVERAGE = _SIMS_CTES + """
, sampled AS (
  SELECT custkey, brand FROM inter
  WHERE md5(CAST(custkey AS VARCHAR)) < '1'
),
scores AS (
  SELECT sa.custkey, si.neighbor AS candidate,
         sum(si.sim_micro) AS score_micro
  FROM sampled sa JOIN sims si ON sa.brand = si.brand
  GROUP BY sa.custkey, si.neighbor
),
fresh AS (
  SELECT sc.* FROM scores sc
  ANTI JOIN inter i
    ON sc.custkey = i.custkey AND sc.candidate = i.brand
),
recs AS (
  SELECT custkey, candidate FROM (
    SELECT custkey, candidate,
           row_number() OVER (PARTITION BY custkey
                              ORDER BY score_micro DESC, candidate ASC) AS rank
    FROM fresh) WHERE rank <= 3
),
nb AS (SELECT CAST(count(DISTINCT brand) AS BIGINT) AS n_brands FROM inter),
cov AS (SELECT CAST(count(DISTINCT candidate) AS BIGINT) AS n_covered FROM recs),
rpairs AS (
  SELECT coalesce(s.sim_micro, 0) AS sim_micro
  FROM recs x JOIN recs y
    ON x.custkey = y.custkey AND x.candidate < y.candidate
  LEFT JOIN sims s
    ON s.brand = x.candidate AND s.neighbor = y.candidate
),
div AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(sim_micro) AS BIGINT) AS sum_micro
  FROM rpairs
),
nu AS (SELECT CAST(count(DISTINCT custkey) AS BIGINT) AS n_users FROM recs)
SELECT n_users, n_brands,
       round(CAST(n_covered AS DOUBLE) / CAST(n_brands AS DOUBLE), 6)
         AS coverage,
       round(1.0 - CAST(sum_micro AS DOUBLE)
                   / (CAST(n_pairs AS DOUBLE) * 1000000.0), 6)
         AS avg_intra_diversity
FROM nu CROSS JOIN nb CROSS JOIN cov CROSS JOIN div
"""


REGISTRY = {
    "recsys_item_similar_topk": QuerySpec(recsys_item_similar_topk, SQL_ITEM_SIMILAR),
    "recsys_user_recommend": QuerySpec(recsys_user_recommend, SQL_USER_RECOMMEND),
    "recsys_eval_coverage": QuerySpec(recsys_eval_coverage, SQL_EVAL_COVERAGE),
    "recsys_eval_hitrate_loo": QuerySpec(
        recsys_eval_hitrate_loo, SQL_EVAL_HITRATE_LOO
    ),
}
