"""Source-format coverage beyond parquet: ORC roundtrip and CSV
malformed-row handling (PERMISSIVE corrupt-record capture vs
DROPMALFORMED) — the ingestion-robustness surface a 100 TB lake needs
(mixed-vintage files, partially corrupt drops)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_orc_roundtrip_with_predicate_pushdown(spark, tmp_path):
    src = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"), F.md5(F.col("id").cast("string")).alias("tag")
    )
    path = str(tmp_path / "t.orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == 1000
    got = back.filter(F.col("bucket") == 3).agg(F.sum("id")).collect()[0][0]
    want = sum(i for i in range(1000) if i % 7 == 3)
    assert got == want
    # the bucket predicate reaches the ORC scan
    plan = back.filter(F.col("bucket") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(bucket), EqualTo(bucket,3)]" in plan


def test_csv_permissive_captures_corrupt_rows(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,value\n1,10\n2,notanumber\n3,30\nbroken row only\n4,40\n")
    schema = "id int, value int, _corrupt_record string"
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(str(p))
    ).cache()  # cache: corrupt-record column requires materialized parse
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r.id for r in good.collect()} == {1, 3, 4}
    assert bad.count() == 2  # the bad value row and the shape-broken row
    df.unpersist()


def test_csv_dropmalformed_keeps_clean_rows(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,value\n1,10\n2,notanumber\n3,30\n")
    df = (
        spark.read.option("header", True)
        .option("mode", "DROPMALFORMED")
        .schema("id int, value int")
        .csv(str(p))
    )
    assert {(r.id, r.value) for r in df.collect()} == {(1, 10), (3, 30)}


def test_parquet_schema_evolution_union(spark, tmp_path):
    old = spark.createDataFrame([(1, "a")], ["id", "name"])
    new = spark.createDataFrame([(2, "b", 9.5)], ["id", "name", "score"])
    old.write.parquet(str(tmp_path / "data" / "v1"))
    new.write.parquet(str(tmp_path / "data" / "v2"))
    merged = spark.read.option("mergeSchema", True).parquet(str(tmp_path / "data" / "*"))
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows[1] == ("a", None) and rows[2] == ("b", 9.5)


def test_xml_roundtrip_values_and_attrs(spark, tmp_path):
    """Spark 4 built-in XML: values survive the write->read hop with an
    explicit schema, one output file per partition (parallel read side),
    and malformed trailing content is the format's own failure — we pin
    the happy path plus null handling."""
    from python_multiproc_bigdata_spark.sinks import xml_sink
    from python_multiproc_bigdata_spark.sources.files import read_xml

    rows = [(1, "en", "a", 10), (2, None, "b", 20), (3, "fr", "a", 30)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, n_chars bigint"
    ).repartition(2)
    p = str(tmp_path / "docs")
    xml_sink(p)(df)
    back = read_xml(
        spark, p, schema="doc_id bigint, lang string, source string, n_chars bigint"
    )
    got = sorted((r.doc_id, r.lang, r.source, r.n_chars) for r in back.collect())
    assert got == sorted(rows)
    assert back.rdd.getNumPartitions() >= 2  # one file per write partition
