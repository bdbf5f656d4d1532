"""Sequence-packing invariants (operators/packing.py) on constructed
data — the oracle parity check (training_pack_chunks/_greedy) pins the
values on the real corpus; these pin the packing CONTRACT."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from python_multiproc_bigdata_spark.operators import packing as P


@pytest.fixture(scope="module")
def toks(spark):
    rows = [
        # (shard, id, tokens): includes an over-budget doc (130) and an
        # exact-fit tail
        ("a", 1, 60), ("a", 2, 50), ("a", 3, 130), ("a", 4, 10),
        ("a", 5, 90), ("a", 6, 10),
        ("b", 7, 100), ("b", 8, 100),
    ]
    return spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")


def test_greedy_never_overflows_except_single_doc(spark, toks):
    packed = P.greedy_pack(toks, budget=100, by="lang").collect()
    by_bin: dict[tuple, list] = {}
    for r in packed:
        by_bin.setdefault((r.lang, r.bin_id), []).append(r.n_tokens)
    for docs in by_bin.values():
        assert sum(docs) <= 100 or len(docs) == 1
    # the 130-token doc sits alone in its bin
    big = next(r for r in packed if r.doc_id == 3)
    assert by_bin[(big.lang, big.bin_id)] == [130]


def test_greedy_bins_are_contiguous_in_id_order(spark, toks):
    packed = sorted(
        P.greedy_pack(toks, budget=100, by="lang").collect(),
        key=lambda r: (r.lang, r.doc_id),
    )
    for shard in ("a", "b"):
        bins = [r.bin_id for r in packed if r.lang == shard]
        assert bins == sorted(bins)
        assert bins[0] == 0
        # bin ids advance by at most 1 (a fold can't skip a bin)
        assert all(b2 - b1 <= 1 for b1, b2 in zip(bins, bins[1:]))


def test_chunk_pack_offsets_are_exclusive_prefix_sums(spark, toks):
    got = {
        r.doc_id: (r.offset, r.bin_id)
        for r in P.chunk_pack(toks, budget=100, by="lang").collect()
    }
    # shard a: 60, 50, 130, 10, 90, 10 → offsets 0, 60, 110, 240, 250, 340
    assert got[1] == (0, 0)
    assert got[2] == (60, 0)
    assert got[3] == (110, 1)
    assert got[4] == (240, 2)
    assert got[5] == (250, 2)
    assert got[6] == (340, 3)
    assert got[7] == (0, 0) and got[8] == (100, 1)


def test_chunk_documents_windows(spark):
    # 10 tokens, size 4, stride 3 → starts 0,3,6,9; last two run short
    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a"), (3, "   ")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in P.chunk_documents(docs, size=4, stride=3).collect()
    }
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert got[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert got[(1, 3)] == ("t9", 1)
    assert got[(2, 0)] == ("a", 1)
    # whitespace-only doc produces no chunks; every token of doc 1 is
    # covered and consecutive chunks overlap by size - stride = 1
    assert {k for k in got if k[0] == 3} == set()
    assert len(got) == 5


def test_chunk_documents_rejects_bad_stride(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        P.chunk_documents(docs, size=4, stride=0)
    with pytest.raises(ValueError):
        P.chunk_documents(docs, size=4, stride=5)


def test_bin_stats_fill_ratio(spark, toks):
    packed = P.greedy_pack(toks, budget=100, by="lang")
    stats = {
        (r.lang, r.bin_id): (r.n_docs, r.bin_tokens, r.fill_ratio)
        for r in P.bin_stats(packed, budget=100, by="lang").collect()
    }
    # shard a, budget 100, docs 60,50,130,10,90,10 →
    # bins [60], [50], [130], [10,90], [10]
    assert stats[("b", 0)] == (1, 100, 1.0)
    assert stats[("a", 0)] == (1, 60, 0.6)
    assert stats[("a", 1)] == (1, 50, 0.5)
    assert stats[("a", 2)] == (1, 130, 1.3)
    assert stats[("a", 3)] == (2, 100, 1.0)
    assert stats[("a", 4)] == (1, 10, 0.1)


def test_length_bucketed_batches_semantics(spark):
    # token counts 1..10 → bit-length buckets: 1→1, 2-3→2, 4-7→3, 8-10→4
    docs = spark.createDataFrame(
        [(i, i) for i in range(1, 11)] + [(11, 0)], "doc_id long, n_tokens long"
    )
    out = {
        (r.bucket, r.batch_id): (r.n_docs, r.max_tokens, r.sum_tokens, r.pad_frac)
        for r in P.length_bucketed_batches(docs, batch_size=2).collect()
    }
    assert out[(0, 0)] == (1, 0, 0, 0.0)  # zero-length doc, pad guard
    assert out[(1, 0)] == (1, 1, 1, 0.0)
    assert out[(2, 0)] == (2, 3, 5, round(1 - 5 / 6, 4))
    # bucket 3 holds 4..7 → two batches of 2 in doc_id order
    assert out[(3, 0)] == (2, 5, 9, round(1 - 9 / 10, 4))
    assert out[(3, 1)] == (2, 7, 13, round(1 - 13 / 14, 4))
    assert out[(4, 0)] == (2, 9, 17, round(1 - 17 / 18, 4))
    assert out[(4, 1)] == (1, 10, 10, 0.0)
