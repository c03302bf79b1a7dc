"""Selection-vs-sort quantile probe: the q_agg_group_median_select
plan argument — histogram selection never co-locates a group, while
the sort spelling (ROW_NUMBER per group + rank filter) shuffles every
row of a group to ONE reducer and sorts there — measured on a
deliberately SKEWED synthetic: one hot group holds 90% of the rows,
so the sort spelling's wall clock is a single straggler task however
many cores the box has.

Both spellings compute the identical exact median per group
(asserted). Timed at N and 4N rows: selection should scale with the
scan (its shuffles carry ≤ 256 histogram partials per mapper per
round); the sort spelling with the hot group's single-task sort.

    python scripts/select_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.operators.aggregates import (
    select_group_quantiles,
)
from embarrassingly_parallel_image_classification_spark.session import get_spark

N_BASE = 2_000_000
PASSES = 2


def make_facts(spark, n: int):
    # 90% of rows land in group 'hot'; cents spread over a wide domain
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "hot")
        .otherwise(F.concat(F.lit("g"), F.col("id") % 7))
        .alias("g"),
        (F.abs(F.xxhash64("id")) % 10_000_000_000).cast("bigint").alias(
            "cents"
        ),
    )


def median_selection(pts):
    _, got = select_group_quantiles(pts, (50,))
    return {tag.rsplit(":", 1)[0]: v for tag, v in got.items()}


def median_sort(pts):
    w = Window.partitionBy("g").orderBy("cents", "g")
    n_w = Window.partitionBy("g")
    ranked = pts.select(
        "g",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(n_w).alias("n"),
    )
    rows = ranked.filter(
        F.col("rn") == F.expr("(n + 1) DIV 2")
    ).collect()
    return {r["g"]: int(r["cents"]) for r in rows}


def timed(fn, pts):
    best = float("inf")
    got = None
    for _ in range(PASSES):
        t0 = time.monotonic()
        got = fn(pts)
        best = min(best, time.monotonic() - t0)
    return best, got


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for scale, n in (("1x", N_BASE), ("4x", 4 * N_BASE)):
        pts = make_facts(spark, n).persist()
        pts.count()  # materialize before timing; unpersist below works
        ts, ms = timed(median_selection, pts)
        tw, mw = timed(median_sort, pts)
        assert ms == mw, f"medians disagree at {scale}"
        out[scale] = {
            "rows": n,
            "selection_sec": round(ts, 3),
            "sort_sec": round(tw, 3),
            "gap": round(tw / ts, 2),
        }
        print(
            f"{scale}: selection {ts:.3f}s sort {tw:.3f}s "
            f"gap {tw / ts:.2f}x (medians equal, hot group = 90%)"
        )
        pts.unpersist()
    print(json.dumps({"probe": "group_median_selection_vs_sort", **out}))


if __name__ == "__main__":
    main()
