"""BENCH_r02 was zeroed by ONE query's AnalysisException (rc=1, no JSON
line, a full round of perf data lost). Pin the fix: a raising query is
recorded under "errors" and every other query still gets a timing —
bench.py must ALWAYS emit its JSON line."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from python_multiproc_bigdata_spark.registry.common import QuerySpec


def _boom(spark, sf_dir):
    raise RuntimeError("deliberately broken query")


def test_one_broken_query_does_not_zero_the_bench(spark, monkeypatch, capsys, tmp_path):
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "HEADLINE", ["words_total_tokens", "q1_pricing_summary"])
    monkeypatch.setattr(bench, "BENCH_FULL_PATH", tmp_path / "BENCH_FULL.json")
    monkeypatch.setitem(bench.REGISTRY, "q1_pricing_summary", QuerySpec(_boom, None))

    bench.main()

    # compact stdout line (the driver's tail capture) stays parseable
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["n_errors"] == 1
    assert out["n_queries"] == 1
    assert out["value"] > 0
    # per-query detail lands in the full artifact
    full = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert "q1_pricing_summary" in full["errors"]
    assert "RuntimeError" in full["errors"]["q1_pricing_summary"]
    assert full["queries"]["words_total_tokens"] > 0


def test_warmup_failure_is_survivable(spark, monkeypatch, capsys, tmp_path):
    # the warmup runs names[0] — if THAT query is the broken one, the
    # bench must still run the rest and report the error once
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "HEADLINE", ["q1_pricing_summary", "words_total_tokens"])
    monkeypatch.setattr(bench, "BENCH_FULL_PATH", tmp_path / "BENCH_FULL.json")
    monkeypatch.setitem(bench.REGISTRY, "q1_pricing_summary", QuerySpec(_boom, None))

    bench.main()

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_errors"] == 1
    full = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert "q1_pricing_summary" in full["errors"]
    assert full["queries"]["words_total_tokens"] > 0
