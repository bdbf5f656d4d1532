"""CI-level parity spot checks for registry queries flagged as having no
pytest coverage (ADVICE r3): events_trailing_1h (RANGE frame) and
stats_price_quartiles_ntile (ntile bucketing). Mini version of
tools/check_parity.py at sf0.001 so a regression trips in the test suite,
not only in an ad-hoc parity run."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_parity import norm_rows  # noqa: E402

from python_multiproc_bigdata_spark.registry import REGISTRY  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.mark.parametrize("name", ["events_trailing_1h", "stats_price_quartiles_ntile"])
def test_spot_parity(spark, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    res = con.execute(spec.resolve_oracle())
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols)
    assert len(srows) > 0
    assert norm_rows(scols, srows) == norm_rows(dcols, drows)


def test_bm25_invariants(spark):
    from python_multiproc_bigdata_spark.registry.text import (
        BM25_TOP_K,
        BM25_TOP_QUERIES,
        text_bm25_topk,
    )

    rows = text_bm25_topk(spark, SF_DIR).collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r.term, []).append(r)
    assert len(by_term) == BM25_TOP_QUERIES
    for term, rs in by_term.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_TOP_K
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)  # rank follows score
        assert all(r.tf >= 1 for r in rs)  # only docs containing the term
