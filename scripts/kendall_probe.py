"""Naive-vs-scale-spelling probe for q_stats_kendall (the feat_probe /
bootstrap_probe pattern): Kendall's C - D on synthetic (group, v, k)
data two ways —

  naive — the textbook O(n^2) PAIR ENUMERATION: self-join each group
          on itself, sign(dv*dk) summed (what any single-node stats
          library does);
  grid  — q_stats_kendall's spelling: joint census to (v, k) cells,
          dense domain grid, 2D prefix sums, C - D read off each cell.

Same integers out (asserted). The naive join grows ~n^2/|groups|;
the grid's post-census cost is FIXED by the value domains.

    python scripts/kendall_probe.py [n ...]   # default 20000 40000 80000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.session import get_spark


def grid_cd(x):
    cells = x.groupBy("g", "v", "k").agg(F.count("*").alias("c"))
    vd = x.select("g", "v").distinct()
    kd = x.select("g", "k").distinct()
    grid = (
        vd.join(kd, "g").join(cells, ["g", "v", "k"], "left").na.fill({"c": 0})
    )
    wv = Window.partitionBy("g", "k").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wk = Window.partitionBy("g", "v").orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p2 = grid.withColumn("pv", F.sum("c").over(wv)).withColumn(
        "p", F.sum("pv").over(wk)
    )
    wlag = Window.partitionBy("g", "k").orderBy("v")
    p3 = p2.select(
        "g",
        "v",
        "c",
        F.coalesce(F.lag(F.col("p") - F.col("pv")).over(wlag), F.lit(0)).alias("ll"),
        F.coalesce(F.lag("p").over(wlag), F.lit(0)).alias("pvm1k"),
    )
    vm = x.groupBy("g", "v").agg(F.count("*").alias("tv"))
    wvm = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vmc = vm.withColumn("cvm1", F.sum("tv").over(wvm) - F.col("tv"))
    return (
        p3.join(vmc.select("g", "v", "cvm1"), ["g", "v"])
        .groupBy("g")
        .agg(
            F.sum(
                F.col("c") * (F.col("ll") - (F.col("cvm1") - F.col("pvm1k")))
            ).alias("cmd")
        )
    )


def naive_cd(x):
    a = x.select("g", F.col("v").alias("v1"), F.col("k").alias("k1"),
                 F.col("rid").alias("r1"))
    b = x.select("g", F.col("v").alias("v2"), F.col("k").alias("k2"),
                 F.col("rid").alias("r2"))
    pairs = a.join(b, "g").filter(F.col("r1") < F.col("r2"))
    s = F.signum(
        (F.col("v1") - F.col("v2")).cast("double")
        * (F.col("k1") - F.col("k2")).cast("double")
    ).cast("bigint")
    return pairs.groupBy("g").agg(F.sum(s).alias("cmd"))


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [20000, 40000, 80000]
    spark = get_spark("kendall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        x = (
            spark.range(n)
            .select(
                F.col("id").alias("rid"),
                (F.xxhash64("id") % 5).cast("string").alias("g"),
                (F.abs(F.xxhash64("id", F.lit(1))) % 500).alias("v"),
                (F.abs(F.xxhash64("id", F.lit(2))) % 100).alias("k"),
            )
            .localCheckpoint()
        )
        t0 = time.time()
        got_grid = {r["g"]: int(r["cmd"]) for r in grid_cd(x).collect()}
        t_grid = time.time() - t0
        t0 = time.time()
        got_naive = {r["g"]: int(r["cmd"]) for r in naive_cd(x).collect()}
        t_naive = time.time() - t0
        assert got_grid == got_naive, (got_grid, got_naive)
        print(json.dumps({
            "metric": "kendall_probe", "n": n,
            "t_grid_sec": round(t_grid, 2),
            "t_naive_sec": round(t_naive, 2),
            "gap": round(t_naive / t_grid, 2),
            "results_equal": True,
        }))


if __name__ == "__main__":
    main()
