"""Registry-wide SinglePartition-window guard (r12): EVERY registered
batch query's optimized plan is swept for unpartitioned Window
operators with no Limit bound (plans/guard.py) — the single-task
global-sort shape that killed the gini/pareto/budget trio and the r11
five at scale. Only the whitelisted, documented-bounded sites below may
carry one; any new query that plans an unbounded global window fails
here, so this debt class cannot silently recur.

Streaming queries are excluded: they RUN their pipeline at
construction and return a read of the sink — the returned plan carries
no window logic to audit (their batch twins are audited)."""

from __future__ import annotations

from python_multiproc_bigdata_spark.plans.guard import unbounded_global_windows
from python_multiproc_bigdata_spark.registry import REGISTRY
from tests.conftest import SF_DIR

# Documented-bounded sites: each ranks/folds a relation bounded by
# CONSTRUCTION (a value grid, distinct test statistics, a fixed subset
# lattice, a diagnostic sample) — the window never sees a corpus-scale
# relation. The docstring of each query states the bound; several also
# register a sampled/cutoff sibling as the production path.
WINDOW_GUARD_WHITELIST = {
    # per-language share walk: |languages| rows (a bounded dimension)
    "training_temperature_mix",
    # KM fold over |distinct durations| rows (docstring-bounded)
    "events_survival_km",
    # subset-lattice walk: 2^|channels| rows, channels fixed at 4
    "events_attribution_shapley",
    # exact-ntile DIAGNOSTIC; events_rfm_segmentation_sampled is the
    # registered production path (broadcast sample-derived cutoffs)
    "events_rfm_segmentation",
    # ECDF/rank prefix-sums over DISTINCT integer cents (value grids)
    "stats_ks_two_sample",
    "stats_mannwhitney_u",
    "stats_spearman_corr",
    # fixed 256-bucket grid cumulative walk
    "stats_quantile_sketch",
    # single-sort diagnostic of a 64-block sample-sized relation; the
    # production writer (zorder_write) range-partitions on samples
    "layout_skipping_hilbert",
}


def test_no_unbounded_global_window_in_any_registered_query(spark):
    offenders: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        if name.startswith("streaming_"):
            continue
        try:
            bad = unbounded_global_windows(spec.fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — an unbuildable plan is its own failure
            errors[name] = f"{type(e).__name__}: {e}"[:160]
            continue
        if bad and name not in WINDOW_GUARD_WHITELIST:
            offenders[name] = len(bad)
    assert not errors, errors
    assert not offenders, (
        "unbounded unpartitioned Window(s) outside the documented "
        f"whitelist: {offenders} — rewire via orderBy().limit(k) / "
        "with_global_index / max_by, or document the bound and extend "
        "WINDOW_GUARD_WHITELIST"
    )


def test_whitelist_entries_still_carry_the_window():
    """The whitelist must not rot: every entry still exists in the
    registry (a renamed/removed query should be pruned here)."""
    missing = WINDOW_GUARD_WHITELIST - set(REGISTRY)
    assert not missing, missing
