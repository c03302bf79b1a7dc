"""Erasure-cost probe: erase_rows claims its rewrite cost tracks the
AFFECTED file count, not the table size — the property that makes
cross-history GDPR erasure a routine maintenance job instead of a
full-table rewrite. Measured here directly: orders at sf0.1 written
range-partitioned by o_custkey into 16 files × 2 snapshots, then one
customer erased (a) from the range layout, where the victim's rows
live in ~1 file per snapshot, and (b) from a hash-by-orderkey layout,
where every file holds some of the victim's rows (the worst case —
equivalent to rewriting the whole table). Also timed: the no-op path
(erasing a key that never existed — one scan, zero rewrites).

    python scripts/erase_probe.py          # sf0.1 by default
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.plans import lakehouse
from embarrassingly_parallel_image_classification_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = f"/tmp/erase_probe_{os.getpid()}"


def build(spark, layout: str) -> str:
    path = os.path.join(SCRATCH, layout)
    shutil.rmtree(path, ignore_errors=True)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    for half in (0, 1):
        part = o.filter(F.col("o_orderkey") % 2 == half)
        part = (
            part.repartitionByRange(16, "o_custkey")
            if layout == "range"
            else part.repartition(16, "o_orderkey")
        )
        lakehouse.snapshot_write(part, path, "append")
    return path


def main() -> None:
    spark = get_spark()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    victim = o.agg(F.min("o_custkey")).collect()[0][0]
    total = o.count()
    print(f"orders rows={total}, victim custkey={victim}")
    for layout in ("range", "hash"):
        path = build(spark, layout)
        t0 = time.time()
        n = lakehouse.erase_rows(spark, path, "o_custkey", victim)
        dt = time.time() - t0
        t0 = time.time()
        n0 = lakehouse.erase_rows(spark, path, "o_custkey", -1)
        dt0 = time.time() - t0
        left = lakehouse.snapshot_read(spark, path).count()
        print(
            f"{layout:5s}: erased from {n:2d}/32 files in {dt:5.1f}s; "
            f"no-op scan {dt0:4.1f}s ({n0} files); rows after={left}"
        )
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
