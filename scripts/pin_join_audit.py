"""Pin-join audit (r12 verdict item 4): flag every non-broadcast join
whose subtree contains an RDD-backed pin (localCheckpoint => Scan
ExistingRDD) or a LocalTableScan literal.

The sign_bh lesson: an RDD-backed pin carries NO size statistics, so
the planner assumes it is huge and silently plans SortMergeJoin against
a 310-row frame — a needless fact-side shuffle at 100 TB. Every join
against a pin needs the small side broadcast (F.broadcast hint) unless
BOTH sides are bounded censuses of comparable size (then a local
sort-merge/shuffled-hash of two tiny frames is harmless and a driver
broadcast round-trip per side would cost more — the pagerank negative
result). This audit walks the pre-AQE physical plan of every registered
query and prints each SortMergeJoin / ShuffledHashJoin / CartesianProduct
with an ExistingRDD or LocalTableScan descendant, so the exceptions are
reviewed deliberately instead of silently planned.

    python scripts/pin_join_audit.py             # whole HEADLINE
    python scripts/pin_join_audit.py --all       # full registry
    python scripts/pin_join_audit.py q_stats     # substring filter
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embarrassingly_parallel_image_classification_spark import registry  # noqa: E402
from embarrassingly_parallel_image_classification_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SKIP_PREFIXES = ("q_stream_",)

FLAG_JOINS = ("SortMergeJoinExec", "ShuffledHashJoinExec", "CartesianProductExec")
PIN_SCANS = ("RDDScanExec", "LocalTableScanExec")


def children(node):
    out = []
    seq = node.children()
    for i in range(seq.size()):
        out.append(seq.apply(i))
    return out


def subtree_has(node, names) -> bool:
    stack = [node]
    while stack:
        n = stack.pop()
        if n.getClass().getSimpleName() in names:
            return True
        stack.extend(children(n))
    return False


def audit(plan) -> list[str]:
    flags = []
    stack = [plan]
    while stack:
        n = stack.pop()
        name = n.getClass().getSimpleName()
        kids = children(n)
        if name in FLAG_JOINS and len(kids) == 2:
            sides = [subtree_has(k, PIN_SCANS) for k in kids]
            if any(sides):
                which = (
                    "both"
                    if all(sides)
                    else ("left" if sides[0] else "right")
                )
                flags.append(f"{name.replace('Exec', '')}[pin:{which}]")
        stack.extend(kids)
    return flags


def main() -> None:
    import bench as benchmod

    flt = sys.argv[1:]
    names = list(benchmod.HEADLINE)
    if "--all" in flt:
        flt.remove("--all")
        names = sorted(registry.queries())
    spark = get_spark("pin-join-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    n_flagged = 0
    for name in names:
        if name.startswith(SKIP_PREFIXES):
            continue
        if flt and not any(s in name for s in flt):
            continue
        try:
            df = qs[name](spark, SF)
            flags = audit(df._jdf.queryExecution().sparkPlan())
        except Exception as ex:  # noqa: BLE001
            print(f"ERR  {name}: {str(ex)[:120]}")
            continue
        if flags:
            n_flagged += 1
            print(f"FLAG {name}: {', '.join(flags)}")
    print(f"\n{n_flagged} flagged")


if __name__ == "__main__":
    main()
