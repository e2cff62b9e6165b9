from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from taico_data_integration_spark.session import get_spark

    spark = get_spark("taico-tests", shuffle_partitions="4")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
