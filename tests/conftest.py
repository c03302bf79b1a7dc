"""Shared fixtures: one SparkSession per test session, DuckDB oracle con."""

from __future__ import annotations

import duckdb
import pandas as pd
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


def _norm_cell(v):
    if isinstance(v, (list, tuple)):
        return str([_norm_cell(x) for x in v])
    if isinstance(v, dict):
        return str(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive, dtype-insensitive canonical form (mirrors the
    driver's row-count + schema-name + value-hash comparison)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = {}
    for c in pdf.columns:
        col = pdf[c]
        if pd.api.types.is_bool_dtype(col):
            out[c] = col.astype("boolean").astype(str)
        elif pd.api.types.is_numeric_dtype(col):
            out[c] = col.astype("float64").round(6)
        elif pd.api.types.is_datetime64_any_dtype(col):
            out[c] = col.astype(str)
        else:
            out[c] = col.map(_norm_cell).astype(str)
    res = pd.DataFrame(out)
    if len(res):
        res = res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)
    return res


def assert_matches_oracle(spark, con, name: str, fn, sql: str, sf_dir: str) -> None:
    register_views(con, sf_dir)
    got = normalize(fn(spark, sf_dir).toPandas())
    want = normalize(con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} duckdb={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-5, rtol=1e-5)
