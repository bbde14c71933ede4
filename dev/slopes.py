#!/usr/bin/env python3
"""Scaling-slope report between two Bench JSON records (r9, verdict #1).

Usage: python3 dev/slopes.py SMALL.json BIG.json [data_factor]

For each query present in both records prints slope = t_big / t_small
against the data growth factor (default 10 = sf0.1 -> sf1). slope <<
factor means fixed overhead still dominates; slope ~ factor is linear;
slope > factor is SUPER-LINEAR and needs its documented escape (or a
written justification with numbers). Sorted by slope descending so the
suspects lead.
"""
import json
import sys


def main() -> int:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small.get("queries", {}), big.get("queries", {})
    common = sorted(set(qs) & set(qb))
    rows = sorted(((qb[q] / qs[q] if qs[q] > 0 else float("inf"), q)
                   for q in common), reverse=True)
    n_super = 0
    print(f"{'query':36s} {'small':>7s} {'big':>7s} {'slope':>6s}  verdict")
    for slope, q in rows:
        verdict = ("SUPER-LINEAR" if slope > factor else
                   "~linear" if slope > factor / 2 else
                   "sub-linear")
        if slope > factor:
            n_super += 1
        print(f"{q:36s} {qs[q]:7.2f} {qb[q]:7.2f} {slope:5.1f}x  {verdict}")
    ts, tb = sum(qs[q] for q in common), sum(qb[q] for q in common)
    print(f"\n{len(common)} queries, total {ts:.1f}s -> {tb:.1f}s "
          f"({tb / ts:.1f}x vs {factor:.0f}x data), "
          f"{n_super} super-linear")
    return 0


if __name__ == "__main__":
    sys.exit(main())
