"""Warm min-of-N timing for named queries at $SPARK_GRAFT_SF_DIR.

Bench-identical methodology (construction + noop sink inside the timed
region, interleaved passes, min per query) for before/after evidence on
individual optimization targets without running the whole HEADLINE.

    python scripts/time_queries.py q_anomaly_mad q_concurrency_peak
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embarrassingly_parallel_image_classification_spark import registry  # noqa: E402
from embarrassingly_parallel_image_classification_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("TIME_ROUNDS", "3"))


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("epic-time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    # one untimed warm pass (JVM/JIT/footers)
    for n in names:
        qs[n](spark, SF).write.format("noop").mode("overwrite").save()
    best: dict[str, float] = {}
    for _ in range(ROUNDS):
        for n in names:
            spark.sparkContext.setJobDescription(f"time:{n}")
            t0 = time.time()
            df = qs[n](spark, SF)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[n] = min(best.get(n, float("inf")), dt)
            spark.sparkContext.setJobDescription(None)
    print(f"loadavg={os.getloadavg()}")
    for n in names:
        print(f"{best[n]:7.3f}  {n}")


if __name__ == "__main__":
    main()
