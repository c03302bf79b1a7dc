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


def assert_driver_sortable(name: str, pdf) -> None:
    """Simulate the DRIVER's canonicalizer on the RAW pandas frame: it
    sorts rows by all columns BEFORE any stringification, so a top-level
    array/map/struct cell (unhashable ndarray / dict) crashes it even
    when the values are exactly right — the round-5 `q_embed_centroids`
    red (VERDICT r5 §wrong-1; the local verify.py stringifies first and
    is provably weaker). Every oracle-backed query must pass this."""
    try:
        pdf.head(50).sort_values(by=list(pdf.columns))
    except Exception as ex:  # noqa: BLE001 — any raise means driver crash
        raise AssertionError(
            f"{name}: output is not driver-sortable (top-level array/map/"
            f"struct column? emit long form or array_join instead): {ex}"
        ) from ex


# Oracle-backed queries allowed to return 0 rows at sf0.01. Empty-vs-
# empty "passes" verify nothing (r6 verdict item 3: q_market_basket's
# fixed min-support floor; q_join_anti / q_except before their 'F'
# filters) — any query landing here needs an explicit justification.
_EMPTY_OK_AT_SF001: frozenset[str] = frozenset()


def assert_matches_oracle(spark, con, name: str, fn, sql: str, sf_dir: str) -> None:
    """EXACT, dtype-sensitive comparison — the model of the driver's value
    hash (round-1 lesson: atol/check_dtype=False hid three driver reds).
    Also asserts the oracle result is NON-EMPTY (vacuity guard): a 0-row
    oracle matching a 0-row Spark result consumes a driver window slot
    while verifying nothing."""
    from embarrassingly_parallel_image_classification_spark.verify import diff_exact

    from pyspark.sql.types import ArrayType, MapType, StructType

    if callable(sql):  # lazily-built oracle (pid-scoped scratch paths)
        sql = sql()
    register_views(con, sf_dir)
    df = fn(spark, sf_dir)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: top-level complex-typed column(s) {complex_cols} crash the "
        f"driver canonicalizer — emit long form or array_join (VERDICT r5)"
    )
    got = df.toPandas()
    assert_driver_sortable(name, got)
    want = con.execute(sql).fetchdf()
    if sf_dir.rstrip("/").endswith("sf0.01") and name not in _EMPTY_OK_AT_SF001:
        assert len(want) >= 1, (
            f"{name}: oracle returns 0 rows at sf0.01 — an empty-vs-empty "
            f"driver check verifies nothing; make the query non-vacuous at "
            f"this SF or allowlist it in _EMPTY_OK_AT_SF001 with a reason"
        )
    diff = diff_exact(got, want)
    assert diff is None, f"{name}: {diff}"
