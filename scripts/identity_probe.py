"""Cost probe for IDENTITY-column assignment (plans/lakehouse.py):
snapshot_write on an identity table stages the batch, then reads the
immutable staged files back to bake contiguous ids (footer-count
ranges) and writes the final files — i.e. the batch is written TWICE.
This probe measures that honest overhead vs a plain append of the
same frame, at growing batch sizes.

    python scripts/identity_probe.py [n_rows ...]   # default 500k 2M
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from embarrassingly_parallel_image_classification_spark.plans import lakehouse
from embarrassingly_parallel_image_classification_spark.session import get_spark


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [500_000, 2_000_000]
    spark = get_spark("identity-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        df = (
            spark.range(n)
            .select(
                F.col("id").alias("k"),
                (F.xxhash64("id") % 10_000).alias("v"),
            )
            .localCheckpoint()
        )
        base = tempfile.mkdtemp(prefix="idprobe_")
        plain = os.path.join(base, "plain")
        ident = os.path.join(base, "ident")
        t0 = time.time()
        lakehouse.snapshot_write(df, plain, "append")
        t_plain = time.time() - t0
        empty = df.withColumn(
            "rid", F.lit(None).cast("bigint")
        ).limit(0)
        lakehouse.snapshot_write(empty, ident, "append")
        lakehouse.set_identity_column(spark, ident, "rid")
        t0 = time.time()
        lakehouse.snapshot_write(df, ident, "append")
        t_ident = time.time() - t0
        got = lakehouse.snapshot_read(spark, ident).agg(
            F.countDistinct("rid"), F.min("rid"), F.max("rid")
        ).collect()[0]
        assert (got[0], got[1], got[2]) == (n, 1, n), got
        shutil.rmtree(base, ignore_errors=True)
        print(json.dumps({
            "metric": "identity_probe", "n": n,
            "t_plain_append_sec": round(t_plain, 2),
            "t_identity_append_sec": round(t_ident, 2),
            "overhead": round(t_ident / t_plain, 2),
            "ids_contiguous": True,
        }))


if __name__ == "__main__":
    main()
