"""Probe: when does an eager localCheckpoint PIN pay for itself?

The kcore double-pin finding (BASELINE round-12 session 2) showed the
qualitative cliff: an unpinned 4-round iterative plan re-expands
exponentially and never finishes. This probe measures the SMOOTH part
of the trade: a branch of cost C consumed by k independent consumers
costs ~k*C unpinned vs ~C + pin_overhead + k*read_cost pinned. Two
branches bracket the regimes:

  EXPENSIVE branch: the 4-table nation trade-edge derivation at sf0.1
  (lineitem join orders join customer join supplier -> distinct pairs)
  — the q_graph_* shared frame.
  CHEAP branch: a 5-row event_type census off the same scan volume is
  not cheap to BUILD (the scan dominates) — so the truly cheap case is
  a 25-row in-memory frame where the pin's fixed overhead (eager job +
  RDD checkpoint) can only lose.

Usage: python scripts/probe_pin_cost.py   (prints a small table)
"""
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def edges():
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet")
        c = spark.read.parquet(f"{SF}/customer.parquet")
        s = spark.read.parquet(f"{SF}/supplier.parquet")
        return (
            li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .select(
                F.col("c_nationkey").alias("src"),
                F.col("s_nationkey").alias("dst"),
            )
            .distinct()
        )

    def consume(df, k):
        for i in range(k):
            df.agg(
                F.count("*"), F.sum("src" if i % 2 == 0 else "dst")
            ).collect()

    print("branch=expensive (4-table edge derivation, sf0.1)")
    for k in (1, 2, 3):
        t_un = timed(lambda: consume(edges(), k))
        def pinned():
            e = edges().localCheckpoint(eager=True)
            consume(e, k)
        t_pin = timed(pinned)
        print(f"  k={k}: unpinned={t_un:.2f}s pinned={t_pin:.2f}s "
              f"ratio={t_un / t_pin:.2f}x")

    print("branch=trivial (25-row in-memory frame)")
    base = spark.range(25).select(
        F.col("id").alias("src"), (F.col("id") * 7 % 25).alias("dst")
    )
    for k in (2, 4):
        t_un = timed(lambda: consume(base, k))
        def pinned2():
            e = base.localCheckpoint(eager=True)
            consume(e, k)
        t_pin = timed(pinned2)
        print(f"  k={k}: unpinned={t_un:.2f}s pinned={t_pin:.2f}s "
              f"ratio={t_un / t_pin:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
