"""Feature-encoding scale probe: the Q-family plan argument — target
encoding (and every transform in ml/features.py) spells as a tiny
category aggregate broadcast back onto the fact table, so the fact
rows NEVER shuffle — measured against the naive window spelling
(`AVG(y) OVER (PARTITION BY category)` + the LOO correction), which
exchanges the ENTIRE fact table on a 5-value key: every row moves,
and at most 5 reduce tasks do all the work regardless of cluster
size (the guaranteed-skew plan).

Both spellings compute the identical leave-one-out encoding
(asserted: full checksum equality over all rows). The probe times
them at N and 4N synthetic rows: the broadcast spelling should scale
with the scan, the window spelling with the shuffle — and the gap
should WIDEN with N, because the window pays network + single-task
sort on a constant key domain.

    python scripts/feat_probe.py
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

N_BASE = 2_000_000
N_CATS = 5  # the TPC-H priority-domain shape
PASSES = 2


def make_facts(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % N_CATS).cast("bigint").alias("cat"),
        (F.abs(F.xxhash64("id")) % 1_000_000).cast("bigint").alias("y"),
    )


def te_broadcast(pts):
    g = pts.groupBy("cat").agg(
        F.sum("y").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    return pts.join(F.broadcast(g), "cat").select(
        "k", F.expr("CAST((s - y) DIV (n - 1) AS BIGINT)").alias("te")
    )


def te_window(pts):
    w = Window.partitionBy("cat")
    return pts.select(
        "k",
        (F.sum("y").over(w) - F.col("y")).cast("bigint").alias("_s"),
        F.count("*").over(w).cast("bigint").alias("_n"),
    ).select(
        "k",
        F.expr("CAST(_s DIV (_n - 1) AS BIGINT)").alias("te"),
    )


def checksum(df):
    # modular per-term reduction: SUM(k·te) raw would exceed int64 at
    # the 4x rung (~1.6e19 > 2^63) and rely on identical wrapping;
    # each (k·te) % p term is < 1e9, so the sum stays exact
    r = df.agg(
        F.count("*").alias("n"),
        F.sum((F.col("k") * F.col("te")) % F.lit(1_000_000_007)).alias("x"),
    ).first()
    return (int(r["n"]), int(r["x"]))


def timed(fn, pts):
    best = float("inf")
    chk = None
    for _ in range(PASSES):
        t0 = time.monotonic()
        chk = checksum(fn(pts))
        best = min(best, time.monotonic() - t0)
    return best, chk


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for scale, n in (("1x", N_BASE), ("4x", 4 * N_BASE)):
        pts = make_facts(spark, n).persist()
        pts.count()  # materialize before timing; unpersist below works
        tb, cb = timed(te_broadcast, pts)
        tw, cw = timed(te_window, pts)
        assert cb == cw, f"spellings disagree at {scale}: {cb} vs {cw}"
        out[scale] = {
            "rows": n,
            "broadcast_sec": round(tb, 3),
            "window_sec": round(tw, 3),
            "gap": round(tw / tb, 2),
        }
        print(
            f"{scale}: broadcast {tb:.3f}s window {tw:.3f}s "
            f"gap {tw / tb:.2f}x (checksums equal)"
        )
        pts.unpersist()
    print(json.dumps({"probe": "feat_target_encode", **out}))


if __name__ == "__main__":
    main()
