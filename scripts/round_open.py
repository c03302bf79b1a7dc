#!/usr/bin/env python
"""Round-open automation (the standing VERDICT items that recur every round).

Run once at the top of each round:

    python scripts/round_open.py [--commit]

Steps, in order:
  1. Detect driver artifacts the previous round left uncommitted
     (BENCH_r*.json, CORRECTNESS_r*.json, BENCH_full.json, VERDICT.md,
     ADVICE.md) and -- with --commit -- `git add` + commit them with a
     standard message. Without --commit it only reports.
  2. Re-probe the environment blocks (optional libs + network) and report
     whether SURVEY.md's "Environment blocks re-probed <date>" line needs
     re-dating (it always needs the round number bumped; any UNBLOCK is
     flagged loudly because it reprioritizes the round).
  3. Print the fresh `_DRIVER_PRIORITY` window (delegates to
     scripts/next_window.py) to paste into registry.py -- remember to
     update tests/test_smoke.py::test_registry_driver_window_ordering's
     `must_be_inside` set alongside.
"""
from __future__ import annotations

import argparse
import glob
import importlib
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACT_GLOBS = (
    "BENCH_r*.json",
    "CORRECTNESS_r*.json",
    "BENCH_full.json",
    "VERDICT.md",
    "ADVICE.md",
)

PROBE_MODULES = (
    "delta",
    "pyiceberg",
    "google.protobuf",
    "PIL",
    "torch",
    "torchvision",
    "tensorflow",
    "cv2",
    "librosa",
)


def uncommitted_artifacts() -> list[str]:
    out = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout
    dirty = {line[3:].strip() for line in out.splitlines() if line.strip()}
    hits: list[str] = []
    for pat in ARTIFACT_GLOBS:
        for path in glob.glob(os.path.join(REPO, pat)):
            rel = os.path.relpath(path, REPO)
            if rel in dirty:
                hits.append(rel)
    return sorted(hits)


def probe_environment() -> list[str]:
    unblocked: list[str] = []
    for mod in PROBE_MODULES:
        try:
            importlib.import_module(mod)
        except Exception:
            print(f"  {mod:20s} blocked")
        else:
            print(f"  {mod:20s} AVAILABLE  <-- UNBLOCKED, reprioritize!")
            unblocked.append(mod)
    try:
        socket.create_connection(("repo1.maven.org", 443), timeout=3).close()
    except Exception:
        print(f"  {'network':20s} blocked")
    else:
        print(f"  {'network':20s} AVAILABLE  <-- UNBLOCKED, reprioritize!")
        unblocked.append("network")
    return unblocked


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true",
                    help="git add+commit uncommitted driver artifacts")
    args = ap.parse_args()

    print("== 1. driver artifacts ==")
    hits = uncommitted_artifacts()
    if not hits:
        print("  clean (previous round's artifacts already committed)")
    elif args.commit:
        subprocess.run(["git", "add", "--"] + hits, cwd=REPO, check=True)
        subprocess.run(
            ["git", "commit", "-m",
             "round open: commit driver artifacts from previous round"],
            cwd=REPO, check=True,
        )
        print(f"  committed: {', '.join(hits)}")
    else:
        print(f"  UNCOMMITTED (re-run with --commit): {', '.join(hits)}")

    print("== 2. environment probes ==")
    unblocked = probe_environment()
    if unblocked:
        print(f"  !! UNBLOCKED: {', '.join(unblocked)} — real-format "
              "integration jumps to the top of the round plan")
    print("  (bump the round number on SURVEY.md's 'Environment blocks "
          "re-probed' line either way)")

    print("== 3. next _DRIVER_PRIORITY window ==")
    subprocess.run([sys.executable, os.path.join(REPO, "scripts",
                                                 "next_window.py")],
                   cwd=REPO, check=True)
    print("(paste into registry.py; update tests/test_smoke.py "
          "must_be_inside alongside)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
