"""Iterative graph operators: fixed-iteration PageRank.

Companion to the connected-components labeler in operators/curation.py
(which canonicalizes dup clusters): PageRank is the link-graph quality
signal a web-crawl curation pipeline feeds into training-mix scoring —
rank mass concentrates on well-referenced pages.

Scale design (100 TB of edges): each iteration is ONE join (ranks ⋈
edges on src — both sides partitioned by the same key, so AQE reuses
the shuffle) + ONE groupBy dst with an algebraic sum (map-side partial
aggregation). State per iteration is the |nodes|-sized rank relation,
persisted and explicitly unpersisted so lineage never deepens past one
round — the same persist-per-round discipline as
curation.connected_components. No collect, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def pagerank(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """PageRank over a directed edge list (`src`, `dst`) for
    `iterations` rounds from a uniform start; returns (node, rank).

    Assumes every node has at least one out-edge (no dangling-mass
    redistribution) — guaranteed when the caller symmetrizes the edge
    list, as the bipartite registry query does. Fixed iteration count
    keeps the result deterministic (modulo float-sum order, which the
    registry rounds away) so a SQL oracle can replay it exactly.

    The RETURNED frame is persisted (it is the last round's state);
    unpersist it when done — same caller contract as
    transforms.with_global_index."""
    edges = edges.select("src", "dst").distinct().persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = deg.count()  # O(|nodes|) driver scalar, also materializes `edges`
    base = (1.0 - DAMPING) / n_nodes

    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("rank"))
    # contrib (edges ⋈ deg) is read once per iteration — persist it or
    # every round re-runs the degree groupBy AND the join
    contrib = edges.join(deg, "src").persist()
    for _ in range(iterations):
        prev = ranks.persist()
        ranks = (
            contrib.join(prev, F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg((F.lit(base) + DAMPING * F.sum(F.col("rank") / F.col("deg"))).alias("rank"))
            .select(F.col("dst").alias("node"), "rank")
        )
        ranks.persist().count()  # materialize before dropping the previous round
        prev.unpersist()
    contrib.unpersist()
    edges.unpersist()
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """Triangle counting via degree orientation (the node-iterator++
    algorithm): orient each undirected edge from the endpoint with
    lower (degree, id) to the higher, turning the graph into a DAG in
    which every triangle {u,v,w} appears exactly once as the wedge
    u→v→w closed by u→w. Returns (node, n_triangles), each triangle
    credited to all three corners.

    Scale design: the orientation is WHY this survives skew — wedge
    generation joins the oriented list with itself on the middle
    vertex, and out-degree under (deg, id) orientation is O(sqrt(m))
    even for celebrity nodes, so the total wedge count is bounded by
    O(m^1.5) instead of sum(deg^2) (the naive wedge join explodes on
    the hottest vertex). Three shuffles total: degree groupBy, wedge
    join, closure join; AQE handles residual middle-vertex skew. This
    is the same plan Spark GraphFrames and every MPP triangle query
    use; no iteration, no collect."""
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = e.join(
        deg.select(F.col("n").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("deg").alias("db")), "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    wedge = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    tri = wedge.join(
        o.alias("e3"),
        (F.col("x") == F.col("e3.u")) & (F.col("z") == F.col("e3.v")),
    ).select("x", "y", "z")
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
