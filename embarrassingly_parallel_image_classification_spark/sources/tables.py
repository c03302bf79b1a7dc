"""Fixture-table loaders.

All fixture tables live as single parquet files under a scale-factor
directory (see FIXTURES.md). Loading is a plain columnar parquet scan —
predicate pushdown / column pruning verified in tests/test_plans.py.

At 100 TB the same call reads a partitioned parquet/iceberg layout; no
code change needed because everything downstream consumes a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# fixes region=5 and nation=25 rows). customer/supplier/part grow with
# sf, so they are broadcast only when an explicit hint makes sense.
BROADCAST_DIMS = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand used throughout the operator library."""
    return load_table(spark, sf_dir, name)
