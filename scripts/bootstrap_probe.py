"""Naive-vs-scale-spelling probe for q_stats_bootstrap_ci (the
feat_probe / select_probe pattern): bootstrap B replicate means of a
synthetic N-row fact two ways —

  naive   — B SEPARATE `.sample(withReplacement=True)` aggregates,
            i.e. one Spark job per replicate (the spelling every
            single-node stats library uses);
  poisson — ONE pass: explode x B map-side, per-(row, replicate)
            Poisson(1) hash weight, one census shuffle of B partials
            per mapper (the q_stats_bootstrap_ci spelling).

Same statistical estimand (replicate-mean distribution of the mean).
The naive spelling's cost is B full scans + B job schedulings — at
100 TB it is not slower, it is 100 scans of 100 TB. The probe prints
the measured gap at fixture-feasible N so the claim is a number.

    python scripts/bootstrap_probe.py [N] [B]   # default 2_000_000, 50
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.operators.stats import (
    _pois_weight_sql,
)
from embarrassingly_parallel_image_classification_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("bootstrap-probe")
    spark.sparkContext.setLogLevel("ERROR")
    fact = (
        spark.range(n)
        .select(
            F.col("id"),
            (F.xxhash64("id") % 10000).alias("cents"),
        )
        .localCheckpoint()  # isolate generation cost from both spellings
    )

    t0 = time.time()
    naive_means = []
    for r in range(b):
        row = (
            fact.sample(withReplacement=True, fraction=1.0, seed=r)
            .agg(F.avg("cents"))
            .first()
        )
        naive_means.append(row[0])
    t_naive = time.time() - t0

    t0 = time.time()
    reps = (
        fact.select(
            "id",
            "cents",
            F.explode(F.array(*[F.lit(i) for i in range(b)])).alias("b"),
        )
        .selectExpr(
            "b",
            "cents",
            "CAST(conv(substring(md5(CAST(id AS STRING) || ':' || "
            "CAST(b AS STRING)), 1, 8), 16, 10) AS BIGINT) % 1000000 AS u",
        )
        .selectExpr("b", "cents", _pois_weight_sql("u") + " AS w")
        .groupBy("b")
        .agg((F.sum(F.col("w") * F.col("cents")) / F.sum("w")).alias("m"))
        .collect()
    )
    t_pois = time.time() - t0

    print(
        f"N={n} B={b}: naive {t_naive:.1f}s ({t_naive / b:.2f}s/replicate, "
        f"{b} jobs) vs poisson one-pass {t_pois:.1f}s -> "
        f"{t_naive / t_pois:.1f}x",
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": "bootstrap_probe",
                "n": n,
                "b": b,
                "t_naive_sec": round(t_naive, 2),
                "t_poisson_sec": round(t_pois, 2),
                "gap": round(t_naive / t_pois, 2),
                "n_replicates_checked": len(reps) == b and len(naive_means) == b,
            }
        )
    )


if __name__ == "__main__":
    main()
