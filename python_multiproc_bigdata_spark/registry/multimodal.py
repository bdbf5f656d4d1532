"""Multimodal plumbing query: binary payloads + mapInPandas feature
extraction, oracle-checked because the fake decode is md5-deterministic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_multiproc_bigdata_spark.operators.multimodal import (
    attach_binary,
    extract_features,
)
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(prep(spark), sf_dir, "documents")
    return extract_features(attach_binary(d, "text", kind="image"))


# The fake decode is width = int(md5[:4],16) % 1024, height = int(md5[4:8],16) % 1024
# over the utf-8 payload; md5 of the text is identical in DuckDB.
SQL_MULTIMODAL = """
SELECT doc_id,
       'image' AS kind,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest,
       ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024 AS width,
       ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024 AS height
FROM documents
"""


REGISTRY = {
    "multimodal_features": QuerySpec(multimodal_features, SQL_MULTIMODAL),
}
