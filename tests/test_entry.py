"""Driver-contract smoke tests: entry() runs, every queries() entry returns
a DataFrame at sf0.001, and oracle_sql() keys are a subset of queries()."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as e
from tests.conftest import SF_DIR


def test_entry_smoke(spark):
    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "word",
        "word_len",
        "word_truncated",
        "file_path",
        "file_words_count",
    ]


def test_oracle_keys_subset():
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 24


def test_all_queries_run_sf0001(spark):
    for name, fn in e.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
