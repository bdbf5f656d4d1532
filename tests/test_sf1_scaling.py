"""Decade-scaling regression gate for the ANN SERVING tier (r11,
VERDICT r10 ask #7): the five serving-shape queries are run at sf0.1
and the synthesized sf1 (tools/make_sf1.py — 10x data) in one warm
session, and each must hold a t(sf1)/t(sf0.1) ratio <= CEILING. This
turns SCALING.md's "serving queries hold at 1.3-1.8x per decade" from
a measured-once observation into a regression-guarded invariant: a
rewrite that silently degrades partition pruning or broadcasts would
trip the ceiling here before it ships.

Deselected from the default run (pytest.ini addopts) because the sweep
costs minutes and needs the /tmp/pmb_sf1 build: run `pytest -m sf1`.
"""

from __future__ import annotations

import time

import pytest

from python_multiproc_bigdata_spark.registry import REGISTRY

SF01 = "/root/testdata/sf0.1"

# serving-shape ANN queries (bounded query set against the corpus): the
# tier whose 100 TB story is partition pruning + broadcasts, so their
# decade ratio is the scaling claim worth pinning. CEILING 3x per
# decade (VERDICT r10): measured medians sit at 1.3-1.8x; 3x leaves
# noise headroom while still failing loudly on an accidental
# full-corpus scan (10x data through a full scan -> ~10x).
SERVING = [
    "sim_topk_ivfpq",
    "sim_topk_pq",
    "sim_topk_sq8_ivf",
    "sim_topk_filtered",
    "sim_mmr_from_ivf",
]
CEILING = 3.0


def _median3(fn, spark, sf: str) -> float:
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return sorted(times)[1]


@pytest.fixture(scope="module")
def sf1_dir(spark) -> str:
    from tools.make_sf1 import build

    return build(spark)


@pytest.mark.sf1
@pytest.mark.parametrize("name", SERVING)
def test_serving_decade_ratio(spark, sf1_dir, name):
    fn = REGISTRY[name].fn
    t01 = _median3(fn, spark, SF01)
    t1 = _median3(fn, spark, sf1_dir)
    ratio = t1 / t01 if t01 else float("inf")
    assert ratio <= CEILING, (
        f"{name}: sf0.1 {t01:.2f}s -> sf1 {t1:.2f}s = {ratio:.1f}x "
        f"per decade (ceiling {CEILING}x) — a serving query stopped "
        "amortizing; check partition pruning / broadcast shapes"
    )
