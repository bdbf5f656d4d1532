"""Similarity-search query family over `embeddings` (beyond-reference M4).
DuckDB oracles compute cosine manually (list_dot_product-free SQL) so the
float→double arithmetic matches Spark's sequential fold exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_multiproc_bigdata_spark.operators.similarity import (
    neardup_pairs_cosine,
    sign_bucket,
    topk_bruteforce,
    topk_lsh,
)
from python_multiproc_bigdata_spark.registry.common import QuerySpec, prep, table

N_QUERIES = 100  # bounded query set for the brute-force baseline

# Engine-portable cosine: sequential double fold, 0.0 on zero norms.
SQL_COSINE_CTE = """
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e) AS dp,
         sqrt(list_dot_product(q.e, q.e)) AS nq,
         sqrt(list_dot_product(c.e, c.e)) AS nc
  FROM emb q JOIN emb c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {n_queries}
), scored AS (
  SELECT query_id, neighbor_id,
         round(CASE WHEN nq > 0 AND nc > 0 THEN dp / (nq * nc) ELSE 0.0 END, 4) AS score
  FROM pairs
)
"""


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(prep(spark), sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return topk_bruteforce(queries, emb, k=5)


SQL_TOPK = SQL_COSINE_CTE.format(n_queries=N_QUERIES) + """
SELECT query_id, neighbor_id, score, rk FROM (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC) AS rk
  FROM scored)
WHERE rk <= 5
"""


def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(prep(spark), sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return topk_lsh(queries, emb, k=3, bits=8)


SQL_TOPK_LSH = """
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         list_aggregate(list_transform(embedding[1:8],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), 'string_agg', '') AS bucket
  FROM embeddings
), pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e) AS dp,
         sqrt(list_dot_product(q.e, q.e)) AS nq,
         sqrt(list_dot_product(c.e, c.e)) AS nc
  FROM emb q JOIN emb c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
  WHERE q.vec_id < {n_queries}
), scored AS (
  SELECT query_id, neighbor_id,
         round(CASE WHEN nq > 0 AND nc > 0 THEN dp / (nq * nc) ELSE 0.0 END, 4) AS score
  FROM pairs
)
SELECT query_id, neighbor_id, score, rk FROM (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC) AS rk
  FROM scored)
WHERE rk <= 3
""".format(n_queries=N_QUERIES)


def sim_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(prep(spark), sf_dir, "embeddings")
    return neardup_pairs_cosine(emb, threshold=0.4)


SQL_NEARDUP = """
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(CASE WHEN sqrt(list_dot_product(a.e, a.e)) > 0
                   AND sqrt(list_dot_product(b.e, b.e)) > 0
             THEN list_dot_product(a.e, b.e)
                  / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
             ELSE 0.0 END, 4) AS score
FROM emb a JOIN emb b ON a.vec_id < b.vec_id
WHERE round(CASE WHEN sqrt(list_dot_product(a.e, a.e)) > 0
                  AND sqrt(list_dot_product(b.e, b.e)) > 0
            THEN list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
            ELSE 0.0 END, 4) >= 0.4
"""


REGISTRY = {
    "sim_topk_bruteforce": QuerySpec(sim_topk_bruteforce, SQL_TOPK),
    "sim_topk_lsh": QuerySpec(sim_topk_lsh, SQL_TOPK_LSH),
    "sim_neardup_cosine": QuerySpec(sim_neardup_cosine, SQL_NEARDUP),
}
