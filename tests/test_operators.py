"""Unit tests: transforms (T-family), aggregates (A-family), sources,
sinks, pipeline runner."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.aggregates import (
    count_per_key,
    distinct_per_key,
    group_having,
    reduce_per_key,
    sum_over_distinct,
    with_count_per_key,
)
from python_multiproc_bigdata_spark.operators.transforms import (
    derive_values,
    drop_columns,
    filter_tokens,
    project_values_path,
    static_values,
    trans_values,
)
from python_multiproc_bigdata_spark.plans.pipeline import Pipeline
from python_multiproc_bigdata_spark.sinks import (
    conditional_sink,
    csv_sink,
    multi_sink,
    noop_sink,
)


def test_transforms_t_family(spark):
    df = spark.createDataFrame([("a", 1), (None, 2)], ["s", "i"])
    out = static_values(df, {"k": "const"})
    assert out.select("k").distinct().collect()[0].k == "const"

    # T4 null-safe composition: null stays null, mapper never applied
    out = trans_values(df, [("s", [F.upper, lambda c: F.concat(c, F.lit("!"))])])
    vals = {r.i: r.s for r in out.collect()}
    assert vals[1] == "A!" and vals[2] is None

    out = derive_values(df, [("i", "i2", [lambda c: c * 2])])
    assert {r.i2 for r in out.collect()} == {2, 4}

    assert drop_columns(df, "s").columns == ["i"]

    toks = spark.createDataFrame(
        [("ok",), ("  ",), ("x",), ("waytoolongtoken12345",)], ["word"]
    )
    kept = filter_tokens(toks, "word", min_len=1, max_len=16).collect()
    assert [r.word for r in kept] == ["ok"]


def test_values_path_projection(spark):
    # T8: required-null drops the whole row; nested key paths flatten
    df = spark.createDataFrame(
        [(("w1", 2), "f1"), ((None, 3), "f2")],
        "t struct<word:string,n:int>, fp string",
    )
    out = project_values_path(
        df, [("word", "t.word", True), ("file_path", "fp", False)]
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].word == "w1" and out.columns == ["word", "file_path"]


def test_aggregates_a_family(spark):
    df = spark.createDataFrame(
        [("f", "a"), ("f", "b"), ("f", "a"), ("g", "c")], ["fp", "w"]
    )
    assert {(r.fp, r["count"]) for r in count_per_key(df, ["fp"]).collect()} == {
        ("f", 3),
        ("g", 1),
    }
    carried = with_count_per_key(df, ["fp"], "n")
    assert carried.filter("fp='f'").select("n").distinct().collect()[0].n == 3

    # general fold: string-concat reducer (non-algebraic path)
    red = reduce_per_key(
        df.orderBy("w"), ["fp"], "w", lambda acc, x: F.concat(acc, x), initial=""
    )
    vals = {r.fp: sorted(r.reduced) for r in red.collect()}
    assert vals["f"] == ["a", "a", "b"]

    ded = distinct_per_key(df, ["fp"], "w", normalizers=[F.lower])
    assert ded.count() == 3

    # keep="max" must carry the other columns of the SAME (max) row
    dfm = spark.createDataFrame(
        [("f", "APPLE", "metaA"), ("f", "apple", "metaB")], ["fp", "w", "meta"]
    )
    kept = distinct_per_key(dfm, ["fp"], "w", normalizers=[F.lower], keep="max").collect()
    assert [(r.w, r.meta) for r in kept] == [("apple", "metaB")]
    kept_min = distinct_per_key(dfm, ["fp"], "w", normalizers=[F.lower], keep="min").collect()
    assert [(r.w, r.meta) for r in kept_min] == [("APPLE", "metaA")]

    sod = sum_over_distinct(
        spark.createDataFrame([("f", 5), ("f", 5), ("g", 7)], ["fp", "n"]),
        ["fp", "n"],
        "n",
    )
    assert sod.collect()[0].total == 12

    gh = group_having(df, F.col("w"), "w_grp", min_count=2)
    assert [(r.w_grp, r.cnt) for r in gh.collect()] == [("a", 2)]


def test_pipeline_and_sinks(spark, tmp_path):
    df = spark.createDataFrame([("x", 1), ("y", 2)], ["s", "i"])
    csv_dir = str(tmp_path / "csv_out")
    flag = {"ran": False}

    def probe_sink(d):
        flag["ran"] = True

    p = Pipeline(
        source=df,
        transforms=[lambda d: d.filter(F.col("i") > 1)],
        sinks=[noop_sink(), csv_sink(csv_dir, n_files=1), probe_sink,
               conditional_sink(False, lambda d: (_ for _ in ()).throw(AssertionError))],
    )
    out = p.run()
    assert out.count() == 1 and flag["ran"]
    files = [f for f in os.listdir(csv_dir) if f.endswith(".csv")]
    assert len(files) == 1
    with open(os.path.join(csv_dir, files[0])) as fh:
        assert fh.read().strip().splitlines() == ["s;i", "y;2"]

    ms = multi_sink(probe_sink, probe_sink)
    ms(df)  # no error == pass

    import pytest

    with pytest.raises(ValueError):
        Pipeline(source=df, sinks=[])


def test_sources_text_corpus(spark, tmp_path):
    d = tmp_path / "corpus" / "sub"
    d.mkdir(parents=True)
    (d / "a.txt").write_text("hello world\n\n  \nsecond line\n")
    (d / "skip.dat").write_text("nope")
    from python_multiproc_bigdata_spark.sources.files import (
        list_files,
        read_text_lines,
        read_whole_files,
        with_path_taxonomy,
    )

    listed = list_files(spark, str(tmp_path / "corpus"), pattern="*.txt").collect()
    assert len(listed) == 1 and listed[0].file_path.endswith("a.txt")

    lines = read_text_lines(spark, str(tmp_path / "corpus")).collect()
    assert sorted(r.line for r in lines) == ["hello world", "second line"]

    whole = read_whole_files(spark, str(tmp_path / "corpus")).collect()
    assert len(whole) == 1 and "second line" in whole[0].content

    tax = with_path_taxonomy(
        spark.createDataFrame([("/bdall/corpus1/base/domainA/p1/f.txt",)], ["file_path"]),
        ["corpus", "base", "domaine", "periode"],
    ).collect()[0]
    assert (tax.corpus, tax.base, tax.domaine, tax.periode) == (
        "corpus1", "base", "domainA", "p1",
    )


def test_profile_approx_default_no_expand(spark):
    # approx (HLL++) is the default: N exact countDistincts in one agg
    # plan an Expand that multiplies the scan by N — wrong for a 100 TB
    # pre-flight. Exact is opt-in and must agree with approx within the
    # 1% rsd on this corpus (and exactly on n_rows / n_nulls).
    from python_multiproc_bigdata_spark.operators.profile import profile

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    approx_df = profile(d)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = (
        profile(d, exact=True)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan  # the cost the default avoids
    approx = {r.col_name: r for r in approx_df.collect()}
    exact = {r.col_name: r for r in profile(d, exact=True).collect()}
    assert approx.keys() == exact.keys()
    for c in exact:
        assert approx[c].n_rows == exact[c].n_rows
        assert approx[c].n_nulls == exact[c].n_nulls
        assert abs(approx[c].n_distinct - exact[c].n_distinct) <= max(
            3, 0.03 * exact[c].n_distinct
        ), c


def test_jsonl_roundtrip_with_corrupt_quarantine(spark, tmp_path):
    from python_multiproc_bigdata_spark.sinks import jsonl_sink
    from python_multiproc_bigdata_spark.sources.files import read_jsonl

    docs = spark.createDataFrame(
        [(1, "hello world", "en", "web", 11), (2, "bonjour", "fr", "web", 7)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "corpus_jsonl")
    jsonl_sink(out)(docs)
    # drop a malformed file into the dataset (a fresh file, not an
    # append — Hadoop's .crc sidecars reject in-place edits)
    with open(out + "/malformed.json", "w") as fh:
        fh.write('{"doc_id": broken not json\n')

    # persist before splitting: Spark disallows queries that prune the
    # raw scan to only the corrupt column (see read_jsonl docstring)
    back = read_jsonl(spark, out).persist()
    clean = back.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = back.filter(F.col("_corrupt_record").isNotNull())
    assert clean.count() == 2 and bad.count() == 1
    got = {r.doc_id: (r.text, r.lang) for r in clean.collect()}
    assert got[1] == ("hello world", "en") and got[2] == ("bonjour", "fr")


def test_expectations_report_counts(spark):
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.operators.quality import expectations_report

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "B"), (2, 0.0, "A"), (4, 3.0, "Z")],
        "id long, price double, status string",
    )
    out = {
        r.check_name: (r.n_violations, r.n_rows, r.passed)
        for r in expectations_report(
            df,
            violated_when={
                "positive_price": ~(F.col("price") > 0),
                "status_in_domain": ~F.col("status").isin("A", "B"),
            },
            unique_keys={"unique_id": ["id"]},
        ).collect()
    }
    assert out["positive_price"] == (2, 4, False)
    assert out["status_in_domain"] == (1, 4, False)
    assert out["unique_id"] == (1, 4, False)


def test_expectations_report_rejects_unsafe_names(spark):
    """Check names become stack() aliases — quotes/backticks would inject
    into the generated expression and _n_rows collides with the internal
    row-count alias, so both are rejected up front (ADVICE r3)."""
    import pytest
    from pyspark.sql import functions as F

    from python_multiproc_bigdata_spark.operators.quality import expectations_report

    df = spark.range(3)
    for bad in ("has'quote", "back`tick", "1starts_with_digit", "_n_rows", "a b"):
        with pytest.raises(ValueError):
            expectations_report(df, {bad: F.col("id") < 0})
    with pytest.raises(ValueError):  # duplicate across the two maps
        expectations_report(df, {"dup": F.col("id") < 0}, unique_keys={"dup": ["id"]})


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Evolved datasets (a 100 TB corpus never has one frozen schema):
    writer adds a column in a later batch; mergeSchema reconciles, old
    rows read null for the new column, filters on it stay pushed."""
    p = str(tmp_path / "evolving")
    spark.range(0, 5).select("id").write.parquet(p + "/batch=1")
    spark.range(5, 10).select(
        "id", (F.col("id") * 2).alias("extra")
    ).write.parquet(p + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "extra", "batch"}
    rows = {r.id: r.extra for r in df.collect()}
    assert rows[0] is None and rows[7] == 14
    assert df.filter(F.col("extra").isNotNull()).count() == 5


def test_orc_sink_source_roundtrip(spark, tmp_path):
    """ORC is the second columnar format Spark ships natively — the
    engine's sinks are format-parameterized, so prove the roundtrip
    (schema + values) like the CSV/JSONL sinks."""
    p = str(tmp_path / "orc_out")
    df = spark.range(0, 100).select(
        "id", (F.col("id") % 5).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    df.write.format("orc").mode("overwrite").save(p)
    back = spark.read.format("orc").load(p)
    # nullability widens on read (ORC files don't carry Spark's
    # non-null flag for range()-derived columns); names+types must hold
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_sliding_chunks_semantics(spark):
    """Window construction invariants on hand-sized docs: chunk count,
    overlap, final chunk reaching the last token, empty-doc behavior."""
    import hashlib

    from python_multiproc_bigdata_spark.functions.text import sliding_chunks

    docs = [
        (1, " ".join(f"t{i}" for i in range(50))),  # 2 chunks: [0,32) [24,50)
        (2, " ".join(f"t{i}" for i in range(32))),  # exactly one full chunk
        (3, "a b c"),                               # one short chunk
        (4, ""),                                    # one empty chunk
        (5, " ".join(f"t{i}" for i in range(57))),  # boundary: 1+ceil(25/24)=3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        (r.doc_id, r.chunk_idx): r
        for r in sliding_chunks(df, chunk_tokens=32, stride=24).collect()
    }
    per_doc = {d: sorted(ci for (dd, ci) in rows if dd == d) for d in (1, 2, 3, 4, 5)}
    assert per_doc == {1: [0, 1], 2: [0], 3: [0], 4: [0], 5: [0, 1, 2]}
    r = rows[(1, 1)]
    assert (r.start_tok, r.n_chunk_tokens) == (24, 26)  # reaches token 49
    expect = hashlib.md5(" ".join(f"t{i}" for i in range(24, 50)).encode()).hexdigest()
    assert r.chunk_digest == expect
    assert rows[(4, 0)].n_chunk_tokens == 0
    assert rows[(4, 0)].chunk_digest == hashlib.md5(b"").hexdigest()
    assert rows[(5, 2)].start_tok == 48 and rows[(5, 2)].n_chunk_tokens == 9


def test_fan_out_scan_probe(spark):
    """r12: fan_out_scan's cheap partition probe — narrow single-file
    scans estimate their true (tiny) split count and fan out; relations
    with a shuffle-introducing operator report cluster width (no-op);
    limits fall back rather than trusting the file-based estimate."""
    from python_multiproc_bigdata_spark.operators.transforms import (
        _estimated_parts,
        _parse_bytes,
        fan_out_scan,
    )

    assert _parse_bytes("134217728b") == 128 << 20
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("64MB") == 64 << 20
    assert _parse_bytes("1g") == 1 << 30

    from tests.conftest import SF_DIR

    scan = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    est, nbytes = _estimated_parts(scan)
    assert est == 1  # one small file -> one split
    assert nbytes and nbytes > 0

    agged = scan.groupBy("l_orderkey").count()
    est_w, nbytes_w = _estimated_parts(agged)
    assert est_w == spark.sparkContext.defaultParallelism
    assert nbytes_w is None

    limited = scan.limit(5)
    assert _estimated_parts(limited) == (None, None)

    # behavioral contract: scan fans out to the keyed repartition,
    # already-wide input passes through untouched
    n = spark.sparkContext.defaultParallelism
    fanned = fan_out_scan(scan, "l_orderkey")
    assert fanned.rdd.getNumPartitions() == n
    assert fan_out_scan(agged, "l_orderkey") is agged
    # bytes-proportional mode: a tiny file never justifies a full fan
    assert fan_out_scan(scan, "l_orderkey", per_part_bytes=1 << 30) is scan


def test_table_relation_cache(spark):
    """r12: table() serves one immutable relation object per
    (session, sf_dir, table) — catalog semantics: plan + schema cached,
    never rows — and distinct sf_dirs stay distinct."""
    from python_multiproc_bigdata_spark.registry.common import (
        _DF_CACHE,
        _SCHEMA_CACHE,
        table,
    )
    from tests.conftest import SF01_DIR, SF_DIR

    a = table(spark, SF_DIR, "orders")
    b = table(spark, SF_DIR, "orders")
    assert a is b  # same resolved relation object
    assert (SF_DIR, "orders") in _SCHEMA_CACHE
    c = table(spark, SF01_DIR, "orders")
    assert c is not a and a.schema == c.schema
    # a fresh query through the cached relation still computes from
    # parquet (counts differ across scale factors)
    assert a.count() != c.count()
    # events goes through the nanos-aware loader and is cached too
    e1 = table(spark, SF_DIR, "events")
    e2 = table(spark, SF_DIR, "events")
    assert e1 is e2
    assert dict(e1.dtypes)["ts"] == "timestamp"
    assert (spark.sparkContext.applicationId, SF_DIR, "events") in _DF_CACHE
