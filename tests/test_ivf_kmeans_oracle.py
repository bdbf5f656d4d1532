"""The kmeans-IVF oracle's premise is that training is deterministic and
engine-portable: the DuckDB oracle generator retrains the centroids from
the parquet (hashlib md5 sample, Python sequential-fold norms, the shared
kmeans_core) and must agree with the Spark-side trainer BIT-FOR-BIT —
otherwise the embedded literals silently drift from what the registered
query searches with."""

from __future__ import annotations

from python_multiproc_bigdata_spark.operators.similarity import (
    train_spherical_kmeans_driver,
)
from python_multiproc_bigdata_spark.registry.similarity import (
    IVF_KMEANS_CFG,
    _train_centroids_from_parquet,
    make_ivf_kmeans_oracle,
)
from tests.conftest import SF_DIR


def test_oracle_centroids_bit_identical_to_spark_trainer(spark):
    cfg = IVF_KMEANS_CFG
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    spark_cents = train_spherical_kmeans_driver(
        emb,
        n_lists=cfg["n_lists"],
        max_iter=cfg["max_iter"],
        sample_size=cfg["train_sample"],
    )
    oracle_cents = _train_centroids_from_parquet(
        f"{SF_DIR}/embeddings.parquet",
        n_lists=cfg["n_lists"],
        max_iter=cfg["max_iter"],
        sample_size=cfg["train_sample"],
    )
    assert spark_cents == oracle_cents  # exact float equality, no tolerance


def test_oracle_sql_embeds_config(monkeypatch):
    from python_multiproc_bigdata_spark.registry.similarity import (
        _centroid_values_literal,
        make_sq8_ivf_oracle,
    )

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
    sql = make_ivf_kmeans_oracle()
    assert f"pr <= {IVF_KMEANS_CFG['nprobe']}" in sql
    assert f"rk <= {IVF_KMEANS_CFG['k']}" in sql
    assert sql.count("::DOUBLE[])") == IVF_KMEANS_CFG["n_lists"]
    assert make_ivf_kmeans_oracle() == sql
    # the trained-centroid literal is cached (no retrain per call) and
    # shared verbatim by the composed SQ8-over-IVF oracle
    lit = _centroid_values_literal()
    assert _centroid_values_literal() is lit
    assert lit in sql and lit in make_sq8_ivf_oracle()
