"""Count parquet scans per table in every headline query's physical plan.

The round-12 optimization detector: a query whose plan scans the same
fact table N>1 times is re-paying the scan (and any derivation above
it) N times — the census-pin / stack() / derive-from-census family of
fixes applies. Prints one line per query, sorted by total scan count,
with the per-table breakdown so the repeated table is visible.

    python scripts/scan_census.py            # whole HEADLINE
    python scripts/scan_census.py q_stats    # substring filter
    python scripts/scan_census.py --all      # FULL registry (r12 verdict item 1)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embarrassingly_parallel_image_classification_spark import registry  # noqa: E402
from embarrassingly_parallel_image_classification_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SKIP_PREFIXES = ("q_stream_",)


def main() -> None:
    import bench as benchmod

    flt = sys.argv[1:]
    spark = get_spark("epic-scan-census")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = list(benchmod.HEADLINE)
    if "--all" in flt:
        flt.remove("--all")
        names = sorted(qs)  # the FULL registry, not just the bench
    rows = []
    for name in names:
        if name.startswith(SKIP_PREFIXES):
            continue
        if flt and not any(s in name for s in flt):
            continue
        try:
            df = qs[name](spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            print(f"ERR  {name}: {ex}")
            continue
        tree = plan.split("== Physical Plan ==")[-1]
        tables = re.findall(r"Scan parquet[^\n]*?(\w+)\.parquet", tree)
        # fallback: location lines in the detail section
        if not tables:
            tables = re.findall(r"Location:[^\n]*?(\w+)\.parquet", plan)
        per: dict[str, int] = {}
        for t in tables:
            per[t] = per.get(t, 0) + 1
        rows.append((sum(per.values()), name, per))
    rows.sort(reverse=True)
    for tot, name, per in rows:
        detail = " ".join(f"{k}x{v}" for k, v in sorted(per.items()))
        print(f"{tot:3d}  {name:38s} {detail}")


if __name__ == "__main__":
    main()
