"""Words-ETL throughput benchmark against the reference baseline.

Replicates the reference's scale harness (generate_test_data.py duplicates
the ~13 MB fixture corpus to a target size) and runs the FULL canonical
pipeline — file source → tokenize → per-file count → per-file distinct →
derive → CSV sink — measuring end-to-end MB/s to compare with the
reference's published 1.95 MB/s (BASELINE.md: 0.513 s/MB on 8 vCPU).

Usage: python tools/bench_corpus.py [target_mb] [--arabic]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_multiproc_bigdata_spark.functions.arabic import arabic_tokenize
from python_multiproc_bigdata_spark.plans.words import words_pipeline
from python_multiproc_bigdata_spark.session import get_spark
from python_multiproc_bigdata_spark.sources.files import read_text_lines, read_whole_files

SAMPLE_BOOKS = "/root/reference/sample_data/books"


def replicate_corpus(target_mb: int) -> str:
    """Duplicate the fixture corpus to ~target_mb (the reference's
    generate_test_data.py approach)."""
    out = tempfile.mkdtemp(prefix="corpus_bench_")
    src_files = [
        os.path.join(SAMPLE_BOOKS, f)
        for f in os.listdir(SAMPLE_BOOKS)
        if f.endswith(".txt")
    ]
    total, i = 0, 0
    target = target_mb * 1024 * 1024
    while total < target:
        for src in src_files:
            dst = os.path.join(out, f"copy{i}_{os.path.basename(src)}")
            shutil.copy(src, dst)
            total += os.path.getsize(src)
            i += 1
            if total >= target:
                break
    return out


def main() -> None:
    target_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    arabic = "--arabic" in sys.argv
    corpus_dir = replicate_corpus(target_mb)
    try:
        size_mb = sum(
            os.path.getsize(os.path.join(corpus_dir, f))
            for f in os.listdir(corpus_dir)
        ) / (1024 * 1024)
        spark = get_spark(app_name="words-corpus-bench")
        spark.sparkContext.setLogLevel("ERROR")
        sink_dir = tempfile.mkdtemp(prefix="corpus_out_")

        # Per-line source: splits parallelize within files and explode works
        # on small arrays — measured 6.6x faster than wholetext on this
        # corpus (words never span lines, so tokenization is equivalent).
        # The reference documented this as a RAM-vs-time operator choice
        # (v2/main.py:89); in Spark the line source simply wins.
        whole = "--wholetext" in sys.argv
        t0 = time.perf_counter()
        if whole:
            corpus = read_whole_files(spark, corpus_dir, pattern="*.txt")
            text_col = "content"
        else:
            corpus = read_text_lines(spark, corpus_dir, pattern="*.txt")
            text_col = "line"
        tokenizer = arabic_tokenize(text_col) if arabic else None
        out = words_pipeline(corpus, text_col=text_col, tokenizer=tokenizer)
        out.write.mode("overwrite").option("sep", ";").csv(sink_dir)
        elapsed = time.perf_counter() - t0
        rows = sum(1 for f in os.listdir(sink_dir) if f.startswith("part"))

        print(
            json.dumps(
                {
                    "metric": "words_etl_rate",
                    "value": round(size_mb / elapsed, 2),
                    "unit": "MB/s",
                    "corpus_mb": round(size_mb, 1),
                    "elapsed_sec": round(elapsed, 2),
                    "baseline_mb_s": 1.95,
                    "speedup_vs_baseline": round(size_mb / elapsed / 1.95, 1),
                    "sink": "csv",
                    "part_files": rows,
                }
            )
        )
        shutil.rmtree(sink_dir, ignore_errors=True)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
