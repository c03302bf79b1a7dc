"""Shared fixtures: one SparkSession per test session, DuckDB oracle con."""

from __future__ import annotations

import duckdb
import pytest

from embarrassingly_parallel_image_classification_spark.session import get_spark
from embarrassingly_parallel_image_classification_spark.sources.tables import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("epic-spark-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    """Shared DuckDB connection; views are (re)registered per sf_dir by
    register_views / assert_matches_oracle."""
    yield duckdb.connect()


def register_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )


def assert_matches_oracle(spark, con, name: str, fn, sql: str, sf_dir: str) -> None:
    """EXACT, dtype-sensitive comparison — the model of the driver's value
    hash (round-1 lesson: atol/check_dtype=False hid three driver reds)."""
    from embarrassingly_parallel_image_classification_spark.verify import diff_exact

    register_views(con, sf_dir)
    got = fn(spark, sf_dir).toPandas()
    want = con.execute(sql).fetchdf()
    diff = diff_exact(got, want)
    assert diff is None, f"{name}: {diff}"
