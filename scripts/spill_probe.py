"""Spill robustness probe (round-4 verdict item 7): run the three
heaviest shuffles at sf0.1 in a memory-starved session and prove they
COMPLETE by spilling instead of OOMing — the cheapest in-sandbox proxy
for 100×-scale robustness, where shuffle partitions routinely exceed
executor memory.

Constrained session: 1 GiB driver heap (vs the 16 GiB test default),
spark.memory.fraction=0.2 (unified execution+storage pool shrunk to
~200 MiB), 8 shuffle partitions so each partition carries 4× the data
of the default 32. A run records wall time plus the per-stage
memory/disk spill bytes from the UI REST API — nonzero spill with a
green result is exactly the behavior we want to see.

    python scripts/spill_probe.py            # sf0.1 by default

Results are recorded in BASELINE.md's spill table. Must run in its own
process (memory fraction and heap are static confs).
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from embarrassingly_parallel_image_classification_spark.session import ENGINE_CONFS

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEAVY = ["q_dedup_minhash", "q_dedup_ngram_jaccard", "q_tpch_q21"]


HEAP = os.environ.get("SPILL_PROBE_HEAP", "1g")
FRACTION = os.environ.get("SPILL_PROBE_FRACTION", "0.05")
PARTS = os.environ.get("SPILL_PROBE_PARTS", "2")


def constrained_session() -> SparkSession:
    b = SparkSession.builder.appName("spill-probe").master("local[8]")
    confs = dict(ENGINE_CONFS)
    confs.update(
        {
            "spark.driver.memory": HEAP,
            "spark.memory.fraction": FRACTION,
            # Few, fat partitions: per-task state grows 16× vs the
            # 32-partition default — the shape a 100× data scale-up
            # forces on a fixed partition count.
            "spark.sql.shuffle.partitions": PARTS,
            # AQE coalescing would re-split and relieve the pressure we
            # are deliberately applying; keep it honest.
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        }
    )
    for k, v in confs.items():
        b = b.config(k, v)
    return b.getOrCreate()


def spill_bytes(spark: SparkSession) -> tuple[int, int]:
    """Total (memoryBytesSpilled, diskBytesSpilled) across all stages,
    via the local UI REST API."""
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    return (
        sum(s.get("memoryBytesSpilled", 0) for s in stages),
        sum(s.get("diskBytesSpilled", 0) for s in stages),
    )


def main() -> None:
    spark = constrained_session()
    spark.sparkContext.setLogLevel("ERROR")
    heap = spark.conf.get("spark.driver.memory")
    frac = spark.conf.get("spark.memory.fraction")
    print(f"constrained session: driver.memory={heap} memory.fraction={frac}")

    from embarrassingly_parallel_image_classification_spark import registry

    qs = registry.queries()
    results = {}
    for name in HEAVY:
        t0 = time.time()
        n = qs[name](spark, SF).count()
        dt = round(time.time() - t0, 2)
        results[name] = {"rows": n, "sec": dt}
        print(f"OK {name}: {n} rows in {dt}s", flush=True)
    mem_sp, disk_sp = spill_bytes(spark)
    summary = {
        "sf_dir": SF,
        "driver_memory": heap,
        "memory_fraction": frac,
        "queries": results,
        "memoryBytesSpilled": mem_sp,
        "diskBytesSpilled": disk_sp,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
