"""Compute the next round's `_DRIVER_PRIORITY` rotation. Prints a
ready-to-paste Python tuple.

    python scripts/next_window.py

THE ROTATION RULE (r7 verdict item 6 — codified so regressions can't
hide behind stale green rows):

1. **Never-verified first.** Every oracle-backed query with no
   driver-green row in any CORRECTNESS_r*.json leads the window, in
   registration order — new registrations always land here, so new
   coverage is verified the round it ships.
2. **Then oldest evidence first.** Remaining slots go to already-green
   oracle-backed queries ordered by the ROUND of their most recent
   green row, ascending (ties: registration order) — the query whose
   evidence is stalest gets re-verified soonest. Over ceil(N/50)
   rounds every query's evidence is refreshed; a regression can
   survive at most that long.
3. **Rows-only tail (r9 verdict item 2).** Up to ROWS_ONLY_TAIL of the
   LAST window slots go to rows-only queries with no driver row yet
   (registration order): the driver records its weaker rows-only check
   for them — independent did-it-run-at-all evidence that pytest alone
   doesn't give. Rows-only queries never displace a never-verified
   ORACLE query (the tail shrinks first). Cross-family canaries are
   only padded in while never-verified queries still exist (once the
   window is pure rotation, rule 2 IS the canary).

Paste the output over `_DRIVER_PRIORITY` (registry.py) and re-run
tests/test_smoke.py::test_registry_driver_window_ordering after
updating its spot-check set.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embarrassingly_parallel_image_classification_spark import registry  # noqa: E402

WINDOW = 50
ROWS_ONLY_TAIL = 5

# One stable, long-green representative per family, padded in while
# never-verified queries still exist (rule 3).
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


def last_green_rounds() -> tuple[dict[str, int], dict[str, int]]:
    """Per query: most recent round with (a) a driver-green ORACLE row,
    (b) a rows-only did-it-run record (err == "no_oracle" with a row
    count — the weaker evidence class the r9 tail policy collects).
    Kept separate: a rows-only record must never satisfy the oracle
    rotation (a later oracle upgrade re-enters as never-verified)."""
    green: dict[str, int] = {}
    recorded: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") or (
                    row.get("rows_match") and row.get("err") is None
                ):
                    green[name] = max(green.get(name, 0), rnd)
                elif (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                ):
                    recorded[name] = max(recorded.get(name, 0), rnd)
    return green, recorded


def main() -> None:
    specs = registry.specs()
    last, recorded = last_green_rounds()
    oracle_backed = [n for n, s in specs.items() if s.oracle is not None]
    # registration order, not current driver order: the priority tuple
    # itself must not feed back into the rotation
    reg_order = {n: i for i, n in enumerate(registry._REGISTRY)}
    never = sorted(
        (n for n in oracle_backed if n not in last),
        key=lambda n: reg_order[n],
    )
    stale_first = sorted(
        (n for n in oracle_backed if n in last),
        key=lambda n: (last[n], reg_order[n]),
    )
    # rows-only tail (rule 3): rows-only queries with no driver row at
    # all, oldest registration first, capped so they never displace a
    # never-verified oracle query
    rows_only_unrecorded = sorted(
        (
            n
            for n, s in specs.items()
            if s.oracle is None and n not in last and n not in recorded
        ),
        key=lambda n: reg_order[n],
    )
    tail_n = min(ROWS_ONLY_TAIL, max(0, WINDOW - len(never)))
    tail = rows_only_unrecorded[:tail_n]
    window = list(never[: WINDOW - len(tail)])
    if never:
        # canaries hedge family-wide drift while unverified queries
        # still crowd the window
        for c in CANARY_POOL:
            if len(window) >= WINDOW - len(tail):
                break
            if c in specs and c in last and c not in window:
                window.append(c)
    for n in stale_first:
        if len(window) >= WINDOW - len(tail):
            break
        if n not in window:
            window.append(n)
    n_rotation = len(window) - len(never[: WINDOW - len(tail)])
    window.extend(tail)
    overflow = never[WINDOW - len(tail) :]
    print(
        f"# {len(never)} never-verified; "
        f"{n_rotation} rotation/canary; "
        f"{len(tail)} rows-only tail; "
        f"window = {len(window)} "
        f"(evidence ages: oldest green r{min(last.values(), default=0)})"
    )
    if overflow:
        print(
            f"# OVERFLOW ({len(overflow)} don't fit; they lead the NEXT "
            f"rotation): {overflow}"
        )
    print("_DRIVER_PRIORITY = (")
    for n in window:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
