"""Shared fixtures: one SparkSession per test session, one DuckDB
connection with the testdata tables pre-registered as views (mirroring
the driver's oracle environment)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coviddatapipeline_spark.session import get_spark
from coviddatapipeline_spark.sources import TESTDATA_TABLES

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
# Oracle-parity tests run at the driver's correctness scale by default;
# set SPARK_GRAFT_PARITY_SF=0.001 for a faster inner loop.
PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "0.01")


def sf_dir(sf: str) -> str:
    return os.path.join(TESTDATA_ROOT, f"sf{sf}")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def parity_sf_dir() -> str:
    return sf_dir(PARITY_SF)


@pytest.fixture(scope="session")
def duck(parity_sf_dir):
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(parity_sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
