#!/usr/bin/env python3
"""Adjudicate a Bench record before committing it (r13, VERDICT r12 #2).

A committed BENCH_*.json is only evidence if (a) it was measured on the
tree being graded and (b) the host was quiet while it ran. Three rounds
of driver snapshots (r10 362.9s, r11 569.6s, r12 921.6s while the code
got faster) had to be adjudicated by judge re-runs; this makes the two
checks a script:

  1. git_sha in the record == HEAD of this repo (and git_dirty is false);
  2. calibration.ratio <= threshold (default 2.0) — the same fixed
     CPU-bound reduction timed at sweep start/middle/end; a busy host
     shows up as a large ratio.

Usage: dev/check_bench.py BENCH_r13_full.json [--max-cal-ratio 2.0]
Exit 0 = record is self-consistent evidence; nonzero = do not commit it
as the round's record (reason printed).
"""
import argparse
import json
import subprocess
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("record")
    ap.add_argument("--max-cal-ratio", type=float, default=2.0)
    args = ap.parse_args()

    with open(args.record) as f:
        rec = json.loads(f.readline())

    failures = []

    sha = rec.get("git_sha", "")
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True).stdout.strip()
    if not sha or sha == "unknown":
        failures.append("record carries no git_sha (pre-r13 Bench, or git "
                        "unavailable at measure time)")
    elif sha != head:
        failures.append(f"git_sha {sha[:12]} != HEAD {head[:12]} — the "
                        "record was not measured on this tree")
    if rec.get("git_dirty", False):
        failures.append("git_dirty=true — src/ or build.sbt had uncommitted "
                        "changes at measure time")

    cal = rec.get("calibration") or {}
    ratio = cal.get("ratio")
    if ratio is None:
        failures.append("record carries no calibration sentinel")
    elif ratio > args.max_cal_ratio:
        failures.append(f"calibration ratio {ratio} > {args.max_cal_ratio} "
                        f"(start={cal.get('start')} mid={cal.get('mid')} "
                        f"end={cal.get('end')}) — host was contended; "
                        "re-measure on a quiet host")

    if failures:
        for f_ in failures:
            print(f"check_bench: FAIL — {f_}", file=sys.stderr)
        return 1
    print(f"check_bench: OK — sha {sha[:12]} == HEAD, clean tree, "
          f"cal ratio {ratio} <= {args.max_cal_ratio}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
