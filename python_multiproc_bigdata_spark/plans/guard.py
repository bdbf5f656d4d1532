"""Plan-shape guard: detect unpartitioned (global) Window operators
whose input is NOT bounded by a Limit — the single-task global-sort
shape that funnels a corpus-scale relation through one executor thread
at 100 TB. `with_global_index` / `orderBy().limit(k)` / `max_by` are
the sanctioned replacements (operators/transforms.py); the registry-
wide test (tests/test_window_guard.py) runs this over EVERY registered
batch query and whitelists only documented-bounded sites.

Walks the OPTIMIZED logical plan tree directly over py4j (class name +
children + Window.partitionSpec) — NOT TreeNode.toJSON(), which
serializes every literal and OOMs the driver on plans embedding large
literal arrays (trained centroids, vocab lists). A Window node with an
empty partitionSpec is flagged unless some descendant is a
GlobalLimit/LocalLimit (then the window ranks a bounded, already-cut
relation — e.g. re-deriving rk over a top-20 result). Windows inside
an InMemoryRelation's cached plan are not visible — by design: the
bucketed primitives materialize their (partitioned) windows behind a
cache boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIMITS = ("GlobalLimit", "LocalLimit")


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _subtree_has_limit(node) -> bool:
    if node.getClass().getSimpleName() in _LIMITS:
        return True
    return any(_subtree_has_limit(c) for c in _children(node))


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Simple class names of Window nodes in df's optimized logical
    plan that have an empty PARTITION BY and no Limit anywhere below
    them — each one is a global sort through a single task at scale.
    Empty list = the plan is safe from this debt class."""
    out: list[str] = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "Window" and node.partitionSpec().isEmpty():
            kids = _children(node)
            if not any(_subtree_has_limit(k) for k in kids):
                out.append(cls)
        for k in _children(node):
            walk(k)

    walk(df._jdf.queryExecution().optimizedPlan())
    return out
