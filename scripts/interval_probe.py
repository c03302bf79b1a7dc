"""Interval-overlap join scale probe: the bin-and-equi-join plan
(q_join_interval_overlap) vs the naive broadcast-theta join, at sf0.1 —
the evidence behind the claim that bucketing turns an O(n·m) range
pairing into a hash join whose cost tracks the candidate count.

Both spellings compute the identical pair set (asserted); measured warm
min-of-3 wall time for the full pair count. The naive side is a BNLJ
(every a-interval against every b-interval with the overlap predicate);
the binned side equi-joins on (event_type, hour bucket) and dedupes via
the canonical-bucket filter.

    python scripts/interval_probe.py            # sf0.1 by default
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark import registry
from embarrassingly_parallel_image_classification_spark.session import get_spark
from embarrassingly_parallel_image_classification_spark.sources.tables import t

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed_count(df) -> tuple[float, int]:
    best, n = float("inf"), -1
    for _ in range(3):
        t0 = time.time()
        n = df.count()
        best = min(best, time.time() - t0)
    return best, n


def naive(spark, sf_dir: str):
    iv = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + (1 + F.col("event_id") % 30) * 60_000_000).alias("e"),
    )
    a = iv.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("a_id"), "event_type",
        F.col("s").alias("a_s"), F.col("e").alias("a_e"),
    )
    b = iv.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("b_id"), F.col("event_type").alias("b_type"),
        F.col("s").alias("b_s"), F.col("e").alias("b_e"),
    )
    return a.join(
        b,
        (a.event_type == b.b_type)
        & (F.col("a_s") < F.col("b_e"))
        & (F.col("b_s") < F.col("a_e")),
    )


def main() -> None:
    spark = get_spark()
    binned = registry.queries()["q_join_interval_overlap"](spark, SF)
    t_bin, n_bin = timed_count(binned)
    t_naive, n_naive = timed_count(naive(spark, SF))
    assert n_bin == n_naive, (n_bin, n_naive)
    print(
        f"sf_dir={SF} pairs={n_bin} "
        f"binned_s={t_bin:.2f} naive_theta_s={t_naive:.2f} "
        f"speedup={t_naive / t_bin:.1f}x"
    )


if __name__ == "__main__":
    main()
