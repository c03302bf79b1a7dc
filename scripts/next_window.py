"""Compute the next round's `_DRIVER_PRIORITY` rotation: every
oracle-backed query with no driver-verified green row in any
CORRECTNESS_r*.json, followed by cross-family canaries, capped at the
50-slot window. Prints a ready-to-paste Python tuple.

    python scripts/next_window.py

The policy (registry.py docstring): never-verified oracle-backed
queries first (they need third-party verification most), rows-only
never inside the window, canaries re-prove one green query per major
family. Paste the output over `_DRIVER_PRIORITY` and re-run
tests/test_smoke.py::test_registry_driver_window_ordering after
updating its spot-check set.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embarrassingly_parallel_image_classification_spark import registry  # noqa: E402

WINDOW = 50

# One stable, long-green representative per family for drift canaries.
CANARY_POOL = [
    "q_tpch_q9",
    "q_stream_tumbling",
    "q_dedup_ngram_jaccard",
    "q_window_firstlast",
    "q_join_asof",
    "q_text_chunking",
    "q_agg_basic",
    "q_knn_exact",
]


def main() -> None:
    specs = registry.specs()
    verified: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") or (
                    row.get("rows_match") and row.get("err") is None
                ):
                    verified.add(name)
    never = [
        n
        for n, s in specs.items()
        if s.oracle is not None and n not in verified
    ]
    canaries = [n for n in CANARY_POOL if n in specs and n in verified]
    slots_for_canaries = max(0, WINDOW - len(never))
    window = never[:WINDOW] + canaries[:slots_for_canaries]
    overflow = never[WINDOW:]
    print(f"# {len(never)} never-verified oracle-backed; "
          f"{len(canaries[:slots_for_canaries])} canaries; "
          f"window = {len(window)}")
    if overflow:
        print(f"# OVERFLOW ({len(overflow)} don't fit; they lead the NEXT rotation): {overflow}")
    print("_DRIVER_PRIORITY = (")
    for n in window:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
