"""Z-order clustering and runtime bloom-filter pruning
(operators/layout.py): arithmetic correctness against a pure-Python
Morton reference, actual row-group stat narrowing on disk, plan-shape
pin for the injected bloom filter, and conf-restoration hygiene."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.layout import (
    _BLOOM_CONFS,
    bloom_pruned_join,
    with_z_value,
    zorder_write,
)
from tests.conftest import SF01_DIR, SF_DIR


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_bitwise_reference(spark):
    rows = [(x, y) for x in (0, 1, 7, 255, 65535) for y in (0, 3, 64, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    # bounds 0..65535 on both dims → normalization is identity
    got = {
        (r["x"], r["y"]): r["z"]
        for r in with_z_value(df, ["x", "y"], out_col="z").collect()
    }
    for (x, y), z in got.items():
        nx = (x * 65535) // 65535  # identity under these bounds
        ny = (y * 65535) // 65535
        assert z == _morton_ref(nx, ny), (x, y)


def test_zorder_write_narrows_rowgroup_ranges_on_both_dims(spark, tmp_path):
    li = spark.read.parquet(f"{SF01_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    li.repartition(16).write.parquet(plain)
    zorder_write(li, ["l_partkey", "l_suppkey"], zed, target_files=16)

    def mean_span(path: str, col: str) -> float:
        spans, files = [], list(Path(path).glob("*.parquet"))
        assert files
        for f in files:
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col:
                        spans.append(c.statistics.max - c.statistics.min)
        return sum(spans) / len(spans)

    # Z-order narrows the per-row-group min/max window on BOTH columns;
    # a hash repartition leaves every row group spanning ~the full
    # domain. 2× is a loose floor — measured 3.5× per dim at sf0.01
    # with 16 files (16 z-ranges split each dim's top 2 bits → ~4×).
    for col in ("l_partkey", "l_suppkey"):
        assert mean_span(plain, col) > 2 * mean_span(zed, col), col

    # layout column does not leak into the schema
    assert "_z" not in [f.name for f in pq.read_schema(next(Path(zed).glob("*.parquet")))]


def test_bloom_join_plan_and_conf_hygiene(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    before = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    j = bloom_pruned_join(spark, li, o, F.col("l_orderkey") == F.col("o_orderkey"))
    after = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    assert before == after, "bloom confs leaked into the session"

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    plan = fmt(j)
    assert "might_contain" in plan, "runtime bloom filter was not injected"
    assert "bloom_filter_agg" in plan

    # the bloom never changes results: identical to the plain join
    expect = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert j.count() == expect

    # the REGISTERED query (join + aggregate) must keep the filter too:
    # a transformation applied outside the conf window re-optimizes
    # without it (the bug PLANS.md exposed — finish= is the fix)
    from python_multiproc_bigdata_spark.registry.layout import bloom_filtered_join

    from tests.conftest import SF01_DIR as _sf01  # noqa: PLC0415

    reg_plan = fmt(bloom_filtered_join(spark, _sf01))
    assert "might_contain" in reg_plan, "registered query lost the runtime filter"


def test_skipping_stats_zorder_beats_linear(spark):
    """The whole point of Z-ordering, pinned as data: under the same 5%
    partkey predicate, value-range blocks of the z-ordered layout are
    mostly skippable while insertion-order blocks are not (partkey is
    uncorrelated with orderkey, so every linear block straddles the
    full partkey range)."""
    from python_multiproc_bigdata_spark.registry.layout import (
        layout_skipping_stats,
    )

    rows = {
        r.layout: r
        for r in layout_skipping_stats(spark, "/root/testdata/sf0.001").collect()
    }
    assert rows["linear"].n_blocks_skipped == 0
    assert rows["zorder"].n_blocks_skipped > rows["zorder"].n_blocks // 2
    assert rows["zorder"].n_rows_scanned < rows["linear"].n_rows_scanned // 4
    assert rows["linear"].n_rows_total == rows["zorder"].n_rows_total
