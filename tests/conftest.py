"""Shared fixtures: one local SparkSession + a DuckDB connection with the
test tables registered as views (mirrors the driver's oracle setup)."""

from __future__ import annotations

import duckdb
import pytest

from sortify_spark.session import get_spark
from sortify_spark.tables import TEST_TABLES

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("sortify-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
