"""MoR read-overhead probe (round-5 verdict item 6): measure how
snapshot_read_mor degrades as delete files accumulate, and where
compact_mor pays for itself — the data behind the "compact after N
deletes" maintenance rule recorded in BASELINE.md.

Setup: orders at sf0.1 written as one snapshot, then K merge-on-read
DELETE snapshots (each removing a disjoint ~0.7% key slice). Measured
per K in {0, 1, 4, 16}: warm min-of-3 wall time of a full aggregate
over (a) snapshot_read_mor (anti-joins K delete files at scan time)
vs (b) the plain snapshot_read of the SAME surviving rows after
compact_mor folds the deletes in. The compaction's own one-off cost is
timed too, so the crossover (#reads after which compaction is cheaper)
is computable.

    python scripts/mor_probe.py            # sf0.1 by default
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
from embarrassingly_parallel_image_classification_spark.sources.tables import t

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DELETE_COUNTS = (1, 4, 16)
MOD = 150  # each delete removes keys ≡ i (mod 150): ~0.67% per file


def timed_agg(df) -> tuple[float, int]:
    best = float("inf")
    n = -1
    for _ in range(3):
        t0 = time.time()
        row = df.agg(
            F.count("*").alias("n"), F.sum("cents").alias("cents")
        ).collect()[0]
        best = min(best, time.time() - t0)
        n = row["n"]
    return round(best, 3), n


def main() -> None:
    spark = get_spark("mor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/tmp/mor_probe_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    orders = t(spark, SF, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    path = os.path.join(base, "tbl")
    lakehouse.snapshot_write(orders, path, "append")
    plain_sec, plain_n = timed_agg(lakehouse.snapshot_read(spark, path, 1))
    print(f"baseline plain read (0 deletes): {plain_sec}s n={plain_n}")

    results = []
    applied = 0
    for target in DELETE_COUNTS:
        while applied < target:
            doomed = orders.filter(F.col("o_orderkey") % MOD == applied).select(
                "o_orderkey"
            )
            lakehouse.delete_where(spark, path, "o_orderkey", doomed)
            applied += 1
        mor_sec, mor_n = timed_agg(lakehouse.snapshot_read_mor(spark, path))
        t0 = time.time()
        # compact on a COPY of the table dir so later Ks keep accumulating
        cpath = os.path.join(base, f"compacted_{target}")
        shutil.copytree(path, cpath)
        lakehouse.compact_mor(spark, cpath)
        compact_sec = round(time.time() - t0, 3)
        post_sec, post_n = timed_agg(lakehouse.snapshot_read(spark, cpath))
        assert mor_n == post_n, (mor_n, post_n)
        overhead = round(mor_sec / post_sec, 2)
        crossover = (
            round(compact_sec / max(mor_sec - post_sec, 1e-9), 1)
            if mor_sec > post_sec
            else float("inf")
        )
        results.append((target, mor_sec, post_sec, overhead, compact_sec, crossover))
        print(
            f"deletes={target}: mor_read={mor_sec}s post_compact_read={post_sec}s "
            f"overhead={overhead}x compact_cost={compact_sec}s "
            f"crossover_reads={crossover} rows={mor_n}"
        )

    print("\n| delete files | MoR read | compacted read | overhead | "
          "compact cost | break-even reads |")
    print("|---|---|---|---|---|---|")
    for target, mor_sec, post_sec, overhead, compact_sec, crossover in results:
        print(
            f"| {target} | {mor_sec} s | {post_sec} s | {overhead}× | "
            f"{compact_sec} s | {crossover} |"
        )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
