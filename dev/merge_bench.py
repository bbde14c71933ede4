#!/usr/bin/env python3
"""Merge supplemental per-query bench runs into a base bench record.

Usage: dev/merge_bench.py BASE.json SUPPLEMENT.json [SUPPLEMENT2.json ...]

Writes BASE.json in place. Supplements must be same-SF runs (the sf path
basename must match); their per-query timings and errors are unioned into
the base (supplement wins on conflict — it is the newer measurement), the
total is recomputed as the sum of per-query timings, counts refreshed, and
a `merged_from` note appended so the record is honest about being the
union of runs rather than one sweep.
"""
import json
import os
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    base_path, supplements = sys.argv[1], sys.argv[2:]
    with open(base_path) as f:
        base = json.load(f)
    base_sf = os.path.basename(base.get("sf", "").rstrip("/"))
    merged = []
    for sp in supplements:
        with open(sp) as f:
            sup = json.load(f)
        sup_sf = os.path.basename(sup.get("sf", "").rstrip("/"))
        if sup_sf != base_sf:
            print(f"refusing: {sp} is sf '{sup_sf}', base is '{base_sf}'")
            return 1
        for k, v in sup.get("queries", {}).items():
            base["queries"][k] = v
            base.get("errors", {}).pop(k, None)
        for k, v in sup.get("errors", {}).items():
            if k not in sup.get("queries", {}):
                base.setdefault("errors", {})[k] = v
                base["queries"].pop(k, None)
        merged.append(os.path.basename(sp))
    base["n_ok"] = len(base["queries"])
    base["n_failed"] = len(base.get("errors", {}))
    base["value"] = round(sum(base["queries"].values()), 3)
    note = base.get("note", "")
    tag = f"merged_from: {', '.join(merged)}"
    base["note"] = f"{note}; {tag}" if note else tag
    with open(base_path, "w") as f:
        json.dump(base, f, separators=(",", ":"))
        f.write("\n")
    print(f"{base_path}: {base['n_ok']} ok, {base['n_failed']} failed, "
          f"total {base['value']}s ({tag})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
