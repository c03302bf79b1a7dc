"""Naive-vs-scale-spelling probe for q_alloc_fifo: FIFO lot matching
on synthetic per-user supply/demand streams two ways —

  naive    — the sequential per-user loop everyone writes first,
             as a grouped-map pandas UDF (applyInPandas): walk the
             user's events in time order carrying mutable inventory
             state;
  interval — q_alloc_fifo's spelling: two prefix-sum windows + one
             user-keyed equi-join with a range residual.

Identical per-user matched totals asserted. The naive spelling's cost
is a Python loop per event (Arrow transfer + interpreter stepping);
the interval join stays whole-stage-codegen JVM.

    python scripts/fifo_probe.py [n_events ...]   # default 1M 4M
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.session import get_spark


def interval_fifo(x):
    w = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def ranged(df):
        return df.select(
            "user_id",
            (F.sum("cents").over(w) - F.col("cents")).alias("lo"),
            F.sum("cents").over(w).alias("hi"),
        )

    lots = ranged(x.filter(F.col("is_supply")))
    outs = (
        ranged(x.filter(~F.col("is_supply")))
        .withColumnRenamed("lo", "olo")
        .withColumnRenamed("hi", "ohi")
    )
    return (
        lots.join(outs, "user_id")
        .filter((F.col("lo") < F.col("ohi")) & (F.col("olo") < F.col("hi")))
        .groupBy("user_id")
        .agg(
            F.sum(
                (F.least("hi", "ohi") - F.greatest("lo", "olo"))
                * (F.col("lo") + 7 * F.col("olo"))
            ).alias("m")
        )
    )


def naive_fifo(x):
    """Sequential two-queue FIFO matcher (backorder semantics: demand
    queues until supply arrives — the same pairing the interval
    identity computes, where the k-th supplied cent meets the k-th
    demanded cent). Emits a per-user PAIRING checksum so the probe
    verifies which lot fills which outflow, not just totals."""

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        from collections import deque

        inv = deque()   # (lot_lo, remaining)
        dem = deque()   # (out_lo, remaining)
        s_tot = d_tot = 0
        chk = 0
        for is_supply, cents in zip(pdf["is_supply"], pdf["cents"]):
            c = int(cents)
            if is_supply:
                inv.append([s_tot, c])
                s_tot += c
            else:
                dem.append([d_tot, c])
                d_tot += c
            while inv and dem:
                take = min(inv[0][1], dem[0][1])
                chk += take * (inv[0][0] + 7 * dem[0][0])
                inv[0][1] -= take
                dem[0][1] -= take
                if inv[0][1] == 0:
                    inv.popleft()
                if dem[0][1] == 0:
                    dem.popleft()
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "m": [chk]}
        )

    return x.groupBy("user_id").applyInPandas(walk, "user_id long, m long")


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    spark = get_spark("fifo-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        x = (
            spark.range(n)
            .select(
                F.col("id").alias("seq"),
                (F.abs(F.xxhash64("id")) % 10_000).alias("user_id"),
                (F.abs(F.xxhash64("id", F.lit(1))) % 2 == 0).alias(
                    "is_supply"
                ),
                (F.abs(F.xxhash64("id", F.lit(2))) % 1000 + 1).alias(
                    "cents"
                ),
            )
            .localCheckpoint()
        )
        t0 = time.time()
        a = {r["user_id"]: int(r["m"]) for r in interval_fifo(x).collect()}
        t_int = time.time() - t0
        t0 = time.time()
        b = {r["user_id"]: int(r["m"]) for r in naive_fifo(x).collect()}
        t_naive = time.time() - t0
        users = set(a) | set(b)
        assert all(a.get(u, 0) == b.get(u, 0) for u in users), "mismatch"
        a = {u: a.get(u, 0) for u in users}
        print(json.dumps({
            "metric": "fifo_probe", "n": n,
            "t_interval_sec": round(t_int, 2),
            "t_naive_loop_sec": round(t_naive, 2),
            "gap": round(t_naive / t_int, 2),
            "users": len(a), "results_equal": True,
        }))


if __name__ == "__main__":
    main()
