#!/usr/bin/env bash
# Cross-SF oracle audit (r8, verdict #3): runs the FULL verify sweep +
# DuckDB compare at a caller-chosen scale factor. The standing defense
# against fixture luck — a query can be hash-green at sf0.01 and drift at
# another SF (stat_changepoint_cusum, r7; ts_seasonal_anomaly's hazard,
# r8). Usage:
#   dev/crosssf.sh 0.001          # one SF
#   dev/crosssf.sh all            # sf0.001 + sf0.01 + sf0.1
# Optional: SPARK_GRAFT_VERIFY_ONLY=q1,q2 restricts the sweep.
set -euo pipefail
cd "$(dirname "$0")/.."
sfs="${1:?usage: dev/crosssf.sh <sf|all>}"
[ "$sfs" = all ] && sfs="0.001 0.01 0.1"
rc=0
for sf in $sfs; do
  out="/tmp/verify_sf${sf}"
  echo "=== cross-SF audit @ sf${sf} -> ${out} ==="
  sbt -batch "runMain graft.Verify /root/testdata/sf${sf} ${out}" >/tmp/verify_sf${sf}.log 2>&1 \
    || { echo "verify FAILED (see /tmp/verify_sf${sf}.log)"; rc=1; continue; }
  python3 dev/check_oracle.py "/root/testdata/sf${sf}" "${out}" || rc=1
done
exit $rc
