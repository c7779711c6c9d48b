"""Shared fixtures: one SparkSession per test run + a DuckDB oracle
connection with the driver's table views registered (TESTDATA.md)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from n2kupdate_spark.session import get_spark
from n2kupdate_spark.sources import TABLES

#: Small sf for fast tests; override with N2K_TEST_SF_DIR to test at sf0.01.
SF_DIR = os.environ.get("N2K_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="n2kupdate-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
