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
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as a
    long (legacy conf) and rebuild a µs timestamp via integer division —
    never float division: ns epochs ≈ 1.7e18 exceed double's 53-bit
    mantissa and would corrupt low-order digits.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand used throughout the operator library."""
    return load_table(spark, sf_dir, name)
