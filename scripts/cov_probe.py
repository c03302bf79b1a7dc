"""Covariance-kernel dimension-scale probe: the join-free map-side
upper-triangle Gram accumulation (q_embed_covariance's shape) at
synthetic dimensions d ∈ {64, 128, 256} over N = 20,000 vectors —
evidence that the one-shuffle spelling's cost tracks the d(d+1)/2
output pairs (map-side fanout ×d²/2 into map-side-combined partials),
while the long-form self-join the ORACLE uses (fine at fixture size)
re-shuffles N·d rows and pays a join the kernel never needs.

Each cell also cross-checks: both spellings must produce identical
(i, j, sxy) triples (integer arithmetic — any disagreement is a bug,
not noise).

    python scripts/cov_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.session import get_spark

N = 20_000


def synthetic(spark, d: int):
    """N vectors of d deterministic pseudo-random 1e-6-quantized
    components (xxhash64-derived — no fixture dependency, any d)."""
    return spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {d - 1}), "
            "p -> xxhash64(id, p) % 1000000)"
        ).alias("q"),
    )


def triangle_cov(pts):
    """q_embed_covariance's join-free spelling."""
    a = pts.select(F.posexplode("q").alias("i", "xi"), "q")
    b = a.select(
        "i", "xi", F.expr("posexplode(slice(q, i + 1, size(q))) AS (dj, xj)")
    )
    return (
        b.groupBy("i", (F.col("i") + F.col("dj")).alias("j"))
        .agg(F.sum(F.col("xi") * F.col("xj")).alias("sxy"))
    )


def selfjoin_cov(pts):
    """The oracle's long-form spelling: explode then self-join on
    vec_id — one extra full shuffle of N·d rows plus the join."""
    long = pts.select("vec_id", F.posexplode("q").alias("i", "x"))
    a = long.select("vec_id", F.col("i").alias("ai"), F.col("x").alias("ax"))
    b = long.select("vec_id", F.col("i").alias("bi"), F.col("x").alias("bx"))
    return (
        a.join(b, "vec_id")
        .filter(F.col("ai") <= F.col("bi"))
        .groupBy(F.col("ai").alias("i"), F.col("bi").alias("j"))
        .agg(F.sum(F.col("ax") * F.col("bx")).alias("sxy"))
    )


def main() -> None:
    spark = get_spark()
    spark.range(1).count()  # warm
    print(f"{'d':>5} {'pairs':>8} {'triangle_s':>11} {'selfjoin_s':>11} {'match':>6}")
    for d in (64, 128, 256):
        pts = synthetic(spark, d).localCheckpoint(eager=True)
        t0 = time.time()
        tri = {(r["i"], r["j"]): r["sxy"] for r in triangle_cov(pts).collect()}
        t1 = time.time() - t0
        t0 = time.time()
        sj = {(r["i"], r["j"]): r["sxy"] for r in selfjoin_cov(pts).collect()}
        t2 = time.time() - t0
        assert tri == sj, f"spellings disagree at d={d}"
        print(f"{d:>5} {len(tri):>8} {t1:>11.2f} {t2:>11.2f} {'yes':>6}")


if __name__ == "__main__":
    main()
