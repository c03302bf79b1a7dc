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
    """events.ts has shipped as parquet TIMESTAMP(NANOS) in some fixture
    generations and TIMESTAMP(MICROS) in others, so branch on what the
    file actually contains instead of assuming either.

    TIMESTAMP(NANOS) is rejected by Spark's vectorized reader
    ([PARQUET_TYPE_ILLEGAL]); with the legacy nanosAsLong conf it reads
    as a ns-epoch BIGINT, which we rebuild into a µs timestamp via
    integer division — never float division: ns epochs ≈ 1.7e18 exceed
    double's 53-bit mantissa and would corrupt low-order digits. The
    conf is a no-op for µs/ms files, so it is safe to set up front.

    TIMESTAMP(MICROS) (isAdjustedToUTC=false) loads natively as
    TIMESTAMP_NTZ; cast to the session-TZ timestamp type — the session
    TZ is pinned UTC (session.py), so the instants are unchanged and
    match the naive µs values DuckDB reads for the oracles.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(raw.schema["ts"].dataType, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand used throughout the operator library."""
    return load_table(spark, sf_dir, name)
