"""Spatial radius-join scale probe: the grid-bucketed plan
(q_join_spatial_radius) vs the naive broadcast-theta join at sf0.01
and sf0.1 — the evidence that 3×3 neighbor-cell bucketing turns the
O(n²) distance pairing into an equi-join whose cost tracks candidate
pairs (points sharing a neighborhood), not n².

Both spellings must produce the IDENTICAL pair count (asserted).

    python scripts/spatial_probe.py
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


def points(spark, sf_dir):
    return t(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        (F.col("user_id") % 1000).alias("x"),
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT) % 1000").alias("y"),
    )


def naive_pairs(p):
    a = p.select(F.col("id").alias("a"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = p.select(F.col("id").alias("b"), F.col("x").alias("bx"), F.col("y").alias("by"))
    return a.crossJoin(b).filter(
        (F.col("a") < F.col("b"))
        & (
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            <= 25
        )
    )


def timed(make_df):
    best, val = float("inf"), None
    for _ in range(3):
        df = make_df()
        t0 = time.time()
        val = df.count()
        best = min(best, time.time() - t0)
    return val, round(best, 2)


def main():
    spark = get_spark("spatial-probe")
    spark.sparkContext.setLogLevel("ERROR")
    grid_fn = registry.specs()["q_join_spatial_radius"].fn
    for sf in ("sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        p = points(spark, sf_dir).localCheckpoint(eager=True)
        n = p.count()
        n_naive, t_naive = timed(lambda: naive_pairs(p))
        # grid total pairs = sum of the banded census (same pair set)
        grid_total = lambda: grid_fn(spark, sf_dir).agg(F.sum("n_pairs"))
        n_grid = grid_total().collect()[0][0]
        _, t_grid = timed(grid_total)
        assert n_grid == n_naive, (n_grid, n_naive)
        print(
            f"{sf}: {n} points, {n_naive} pairs | naive theta {t_naive}s | "
            f"grid {t_grid}s | speedup {t_naive / t_grid:.1f}x"
        )


if __name__ == "__main__":
    main()
