from __future__ import annotations

import pytest

from python_multiproc_bigdata_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pmb-spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()
