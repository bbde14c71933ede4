#!/usr/bin/env python3
"""Compare two Bench JSON records (per-query, best-of-2 seconds).

Usage: python3 dev/bench_compare.py OLD.json NEW.json [ratio]

Prints queries whose time moved by more than `ratio` (default 1.5x) in
either direction, new/removed queries, and the common-query totals —
the adjudication the judge does by hand, scripted. Host noise moves
single queries by ~15%; re-pin any reported mover with a solo
SPARK_GRAFT_ONLY run before believing it (memoized dedup/graph frames
make some queries cheaper in the full run than solo).

r10 (VERDICT r9 what's-wrong #3): reads BOTH record shapes — the
Bench-emitted full record ({"queries": {...}}) and the driver wrapper
({"tail": "<truncated stdout>", "parsed": ...}), recovering per-query
pairs from a truncated tail by regex; and the zero-common case reports
instead of dividing by zero.
"""
import json
import re
import sys


# Bench-record keys whose values are numeric but are not query timings.
NON_QUERY_KEYS = {"value", "n_ok", "n_failed", "sf", "metric", "unit"}


def load_queries(path):
    """Per-query {name: seconds} from a full record or a driver wrapper."""
    rec = json.load(open(path))
    if isinstance(rec, dict) and isinstance(rec.get("queries"), dict):
        return rec["queries"]
    if isinstance(rec, dict) and isinstance(rec.get("parsed"), dict) and \
            isinstance(rec["parsed"].get("queries"), dict):
        return rec["parsed"]["queries"]
    tail = rec.get("tail") if isinstance(rec, dict) else None
    if isinstance(tail, str):
        # The tail is a bounded capture: the FRONT of the per-query map may
        # be cut off (possibly mid-pair). Recover every complete
        # "name":seconds pair; drop record-level numeric fields.
        pairs = re.findall(r'"([a-z][a-z0-9_]*)":([0-9]+\.[0-9]+)', tail)
        out = {}
        for name, sec in pairs:
            if name not in NON_QUERY_KEYS:
                out[name] = float(sec)
        if out:
            print(f"note: {path} is a driver wrapper; recovered "
                  f"{len(out)} per-query timings from its truncated tail")
        return out
    return {}


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = load_queries(old_path)
    new = load_queries(new_path)
    common = sorted(set(old) & set(new))
    movers = []
    for q in common:
        a, b = old[q], new[q]
        if a > 0 and b > 0 and (b / a >= ratio or a / b >= ratio) \
                and max(a, b) >= 0.3:
            movers.append((b / a, q, a, b))
    regressions = sorted((m for m in movers if m[0] > 1), reverse=True)
    improvements = sorted((m for m in movers if m[0] <= 1))
    print(f"== REGRESSIONS (> {ratio}x slower, >= 0.3s): {len(regressions)} ==")
    for r, q, a, b in regressions:
        print(f"SLOWER {q:34s} {a:6.2f} -> {b:6.2f}  ({r:.2f}x)")
    print(f"== improvements (> {ratio}x faster): {len(improvements)} ==")
    for r, q, a, b in improvements:
        print(f"faster {q:34s} {a:6.2f} -> {b:6.2f}  ({r:.2f}x)")
    for q in sorted(set(new) - set(old)):
        print(f"new    {q:34s}          {new[q]:6.2f}")
    for q in sorted(set(old) - set(new)):
        print(f"gone   {q:34s} {old[q]:6.2f}")
    if not common:
        print(f"\nno common queries between {old_path} ({len(old)}q) and "
              f"{new_path} ({len(new)}q) — nothing to compare")
        return 0 if (old or new) else 1
    to, tn = sum(old[q] for q in common), sum(new[q] for q in common)
    print(f"\ncommon {len(common)} queries: {to:.1f}s -> {tn:.1f}s ({tn / to:.2f}x)"
          f" | totals old={sum(old.values()):.1f}s ({len(old)}q)"
          f" new={sum(new.values()):.1f}s ({len(new)}q)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
