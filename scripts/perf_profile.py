"""Per-query perf profiler (round 12 optimization tooling).

Bench-identical timing (build + noop sink, min over passes) PLUS the
breakdown the bench can't give: per-query Spark JOB inventory pulled
from the UI REST API (job count, summed job wall, implied driver gap).
The gap between bench wall and summed job time is driver-side work —
plan construction, analysis, optimization, collect round-trips —
which at fixture scale is often the real cost of a "slow" query and
at 100 TB is the fixed overhead ahead of every stage.

    python scripts/perf_profile.py q_feat_robust_scale q_graph_pagerank
    python scripts/perf_profile.py --top 30          # slowest 30 from BENCH_full.json
    python scripts/perf_profile.py --all             # whole HEADLINE

Writes /tmp/perf_profile_r12.json (one record per query):
    {name, passes: [..], best: sec, build: sec, jobs: n,
     job_wall: sec, gap: sec}
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from embarrassingly_parallel_image_classification_spark import registry  # noqa: E402
from embarrassingly_parallel_image_classification_spark.session import get_spark  # noqa: E402


def rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    import bench as benchmod

    if args and args[0] == "--top":
        n = int(args[1])
        full = json.load(open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_full.json")))
        names = [k for k, _ in sorted(full["queries"].items(),
                                      key=lambda kv: -kv[1])[:n]]
    elif args and args[0] == "--all":
        names = list(benchmod.HEADLINE)
    else:
        names = args

    spark = get_spark("epic-perf-profile")
    spark.sparkContext.setLogLevel("ERROR")
    benchmod.warmup(spark, sf_dir)

    qs = registry.queries()
    out = []
    npass = int(os.environ.get("PERF_PASSES", "3"))
    for name in names:
        spark.sparkContext.setJobGroup(name, name)
        passes, builds = [], []
        for _ in range(npass):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(round(t1 - t0, 3))
            passes.append(round(t2 - t0, 3))
        spark.sparkContext.setJobGroup(None, None)
        rec = {
            "name": name,
            "passes": passes,
            "best": min(passes),
            "build_best": min(builds),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)

    # job inventory per group (jobGroup == query name)
    jobs = rest(spark, "jobs")
    by_group: dict[str, list] = {}
    for j in jobs:
        g = j.get("jobGroup")
        if g:
            by_group.setdefault(g, []).append(j)
    for rec in out:
        js = by_group.get(rec["name"], [])
        walls = []
        for j in js:
            try:
                t0 = pd.Timestamp(j["submissionTime"])
                t1 = pd.Timestamp(j["completionTime"])
                walls.append((t1 - t0).total_seconds())
            except Exception:
                pass
        rec["jobs"] = len(js)
        rec["jobs_per_pass"] = round(len(js) / max(npass, 1), 1)
        rec["job_wall_sum"] = round(sum(walls), 3)
        rec["job_wall_per_pass"] = round(sum(walls) / max(npass, 1), 3)
        rec["gap_per_pass"] = round(
            rec["best"] - rec["job_wall_per_pass"], 3
        )
    with open("/tmp/perf_profile_r12.json", "w") as f:
        json.dump(out, f, indent=1)
    print("== summary (best sec | build | jobs/pass | jobwall/pass | gap) ==")
    for rec in sorted(out, key=lambda r: -r["best"]):
        print(
            f"{rec['best']:7.3f} {rec['build_best']:7.3f} "
            f"{rec['jobs_per_pass']:6.1f} {rec['job_wall_per_pass']:8.3f} "
            f"{rec['gap_per_pass']:7.3f}  {rec['name']}"
        )


if __name__ == "__main__":
    main()
