"""Structured Streaming infrastructure (SURVEY.md §2-I, I8).

Reference analog: operational scoring of newly-arriving imagery batches
[PK]. Testability rules (SURVEY §7 risk 6): file source over the fixture
events parquet, ``trigger(availableNow=True)`` so every run is finite,
memory (or foreachBatch→parquet) sink so results come back as a
DataFrame. No wall-clock sources anywhere.

The events fixture's ts physical type has drifted across fixture
generations (TIMESTAMP(NANOS) vs TIMESTAMP(MICROS)); a file stream
needs an explicit schema, so the loader infers it from a cheap batch
read of the same file and applies the same ts normalization as the
batch loader (sources/tables.py) — the two MUST agree or stream-batch
equivalence silently breaks.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_run_ids = itertools.count()


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a bounded file stream with a proper ts."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Footer-only batch read: gives the stream its required schema and
    # tells us which ts representation this fixture generation uses.
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(batch.schema["ts"].dataType, LongType):
        # TIMESTAMP(NANOS) fixture read as ns-epoch longs.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # TIMESTAMP(MICROS) fixture: NTZ -> session-TZ (UTC) timestamp.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table as a bounded file stream — the crawl-ingest
    shape (new shards arriving continuously) the curation gates run
    on in production. Schema from a footer-only batch read, same as
    events_stream; no ts normalization needed (no timestamp col)."""
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def run_to_memory(result: DataFrame, mode: str) -> DataFrame:
    """Run a (bounded) streaming DataFrame to completion into a memory
    sink; return the sink as a batch DataFrame.

    availableNow processes everything present, then stops — so the
    returned table is the stream's final answer, which is what the
    driver's batch-style compare needs (and what makes stream-batch
    equivalence testable, SURVEY §5.3).
    """
    spark = result.sparkSession
    name = f"epic_stream_sink_{next(_run_ids)}"
    # Stateful streaming ops checkpoint one state store per shuffle
    # partition per microbatch; 32 partitions of checkpoint fsync dwarf
    # the actual work at fixture scale. 8 keeps state I/O proportionate
    # (on a real cluster this is sized to state volume, not core count).
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return spark.table(name)
