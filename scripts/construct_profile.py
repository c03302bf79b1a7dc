"""Split each headline query's warm wall time into CONSTRUCTION
(Python/py4j expression building + any eager pin jobs) vs ACTION (the
noop sink execution).

The q_stats_sign_bh lesson (r12): a query can be fast to EXECUTE but
pay seconds of pure driver time BUILDING the plan (per-cell py4j
literal calls, deep expression trees) — invisible in stage metrics,
fully visible in the bench (which re-constructs per pass). Rank by
construction time to find the next py4j-bound offender.

    python scripts/construct_profile.py            # whole HEADLINE
    python scripts/construct_profile.py q_stats    # substring filter
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embarrassingly_parallel_image_classification_spark import registry  # noqa: E402
from embarrassingly_parallel_image_classification_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SKIP_PREFIXES = ("q_stream_",)


def main() -> None:
    import bench as benchmod

    flt = sys.argv[1:]
    spark = get_spark("epic-construct-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = [
        n
        for n in benchmod.HEADLINE
        if not n.startswith(SKIP_PREFIXES)
        and (not flt or any(s in n for s in flt))
    ]
    rows = []
    for name in names:
        try:
            qs[name](spark, SF).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            df = qs[name](spark, SF)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
        except Exception as ex:  # noqa: BLE001
            print(f"ERR  {name}: {ex}")
            continue
        rows.append((t1 - t0, t2 - t1, name))
    rows.sort(reverse=True)
    print(f"{'construct':>9s} {'action':>7s}  query")
    for c, a, name in rows:
        print(f"{c:9.3f} {a:7.3f}  {name}")


if __name__ == "__main__":
    main()
