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
