"""Dump .explain("formatted") for queries to plans/<tag>/<query>_<suffix>.txt.

    python scripts/dump_plans.py r12 before q_stats_kendall q_feat_robust_scale
    python scripts/dump_plans.py r12 before --top 40     # slowest N from BENCH_full.json
    python scripts/dump_plans.py r12 after q_stats_kendall

Also prints a one-line summary per query: #Scan parquet, #Exchange,
#Python-boundary nodes — the quick scan-multiplicity check behind the
round-12 shared-census restructures.

Streaming queries (q_stream_*) are skipped: their returned frame is the
memory sink, whose plan says nothing about the streaming job.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embarrassingly_parallel_image_classification_spark import registry  # noqa: E402
from embarrassingly_parallel_image_classification_spark.session import get_spark  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if names and names[0] == "--top":
        full = json.load(open(os.path.join(ROOT, "BENCH_full.json")))
        names = [
            k
            for k, _ in sorted(full["queries"].items(), key=lambda kv: -kv[1])[
                : int(names[1])
            ]
        ]
    outdir = os.path.join(ROOT, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("epic-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        if name.startswith("q_stream_"):
            print(f"skip {name} (streaming)")
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        tree = plan.split("== Physical Plan ==")[-1].split("\n(1) ")[0]
        scans = len(re.findall(r"Scan parquet", tree))
        exch = len(re.findall(r"\bExchange\b", tree))
        py = len(
            re.findall(
                r"ArrowEvalPython|BatchEvalPython|MapInPandas|MapInArrow|"
                r"FlatMapGroupsInPandas|PythonMapInArrow",
                tree,
            )
        )
        print(f"{name}: scans={scans} exchanges={exch} python={py} -> {path}")


if __name__ == "__main__":
    main()
