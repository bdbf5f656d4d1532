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
    contrib = edges.join(deg, "src")
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
    edges.unpersist()
    return ranks
