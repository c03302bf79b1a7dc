"""Diagnose the q_dedup_containment 64x super-linear increment
(BASELINE.md round-9 ladder): hypothesis — the fixture harness pins
spark.sql.shuffle.partitions = 32 (sized for sf0.1) and the blow-up
writes 8 parquet files, so at 64x each reduce partition carries 64x
the bytes (spill) and the scan starts under-parallel. Neither is a
property of the PLAN; a production cluster sizes partitions to data
(or lets AQE coalesce DOWN from a high number — it never splits UP).

The probe times q_dedup_containment on the SAME 64x corpus under:
  a) the harness defaults (32 shuffle partitions, 128 MB splits);
  b) shuffle.partitions = 256;
  c) shuffle.partitions = 256 + maxPartitionBytes = 16 MB (restores
     scan-side parallelism over the 8 written files).

If (b)/(c) recover the candidate-bound scaling, the 64x increment is a
harness-sizing artifact, not an algorithmic blow-up.

    python scripts/shuffle_scale_probe.py [K]   # default K=64
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embarrassingly_parallel_image_classification_spark import registry
from embarrassingly_parallel_image_classification_spark.session import get_spark
from scripts.scale_ladder import SF_DIR, build_blowup

PASSES = 2
CONFIGS = [
    ("harness-32", {}),
    ("shuffle-256", {"spark.sql.shuffle.partitions": "256"}),
    (
        "shuffle-256+split-16mb",
        {
            "spark.sql.shuffle.partitions": "256",
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    ),
]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark("shuffle-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    defaults = {
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
        "spark.sql.files.maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
    }
    blow = build_blowup(spark, k, {"documents"})
    fn = registry.queries()["q_dedup_containment"]
    rows = []
    try:
        for label, conf in CONFIGS:
            for key, val in {**defaults, **conf}.items():
                spark.conf.set(key, val)
            best = float("inf")
            for _ in range(PASSES):
                t0 = time.time()
                fn(spark, blow).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            rows.append({"config": label, f"t_{k}x_sec": round(best, 3)})
            print(f"{label:24s} {best:7.2f}s", flush=True)
    finally:
        for key, val in defaults.items():
            spark.conf.set(key, val)
        shutil.rmtree(blow, ignore_errors=True)
    print(json.dumps({"metric": "shuffle_scale_probe", "k": k, "rows": rows}))


if __name__ == "__main__":
    main()
