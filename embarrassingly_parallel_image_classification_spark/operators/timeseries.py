"""Time-series utilities over the events fixture: dense-spine gap
filling — the resample step every monitoring/feature pipeline needs
(downstream models want a row for every (hour, type), not only hours
that happened to have events).

Scale shape: the spine is (time-range / granularity) × |types| rows —
tiny regardless of data volume — so it broadcasts; the only shuffle is
the per-(hour, type) count of the fact table itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import t


@register(
    "q_timeseries_gapfill",
    oracle="""
    WITH b AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
        SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT CAST(epoch(s.h) AS BIGINT) AS hour_sec,
           t.event_type,
           COALESCE(c.n, 0) AS n,
           c.n IS NULL AS is_gap
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN counts c ON c.h = s.h AND c.event_type = t.event_type
    """,
    tags=("composite", "D1", "C3", "H3"),
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts per type on a DENSE hourly spine: hours with
    no events appear with n=0 and is_gap=true. Spine = sequence(min
    hour, max hour) exploded from a 1-row aggregate — driver never sees
    the data; counts shuffle once on (hour, type)."""
    ev = t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("spine_h")
    )
    types = ev.select(F.col("event_type").alias("spine_type")).distinct()
    counts = ev.groupBy(hour.alias("cnt_h"), F.col("event_type").alias("cnt_type")).agg(
        F.count("*").alias("n")
    )
    return (
        spine.crossJoin(F.broadcast(types))
        .join(
            counts,
            (F.col("cnt_h") == F.col("spine_h"))
            & (F.col("cnt_type") == F.col("spine_type")),
            "left",
        )
        .select(
            F.unix_timestamp("spine_h").alias("hour_sec"),
            F.col("spine_type").alias("event_type"),
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
            F.col("n").isNull().alias("is_gap"),
        )
    )
