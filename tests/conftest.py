from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("aqueduct-core-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_TEST_DRIVER_MEM", "4g"))
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "table")
