#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 dev/check_oracle.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or pass
--run to run it here). For each query: load Spark's parquet result and the
DuckDB oracle result, sort columns by name, compare row-by-row with exact
equality (floats: exact bits, plus a diagnostic max-abs-diff on mismatch).
"""
import json
import math
import subprocess
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    if "--run" in sys.argv:
        subprocess.run(
            ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
            check=True, cwd="/root/repo")

    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; GenData (r9 seed-fuzz/sf1)
        # writes Spark-style directories — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        odf, sdf = odf[ocols], sdf[ocols]
        bad = []
        for c in ocols:
            ov, sv = odf[c].tolist(), sdf[c].tolist()
            for i, (a, b) in enumerate(zip(ov, sv)):
                a_nan = isinstance(a, float) and math.isnan(a)
                b_nan = isinstance(b, float) and math.isnan(b)
                if a_nan and b_nan:
                    continue
                if a is None and b is None:
                    continue
                if a != b:
                    d = ""
                    if isinstance(a, float) and isinstance(b, float):
                        d = f" absdiff={abs(a - b):.3e}"
                    bad.append(f"col={c} row={i}: spark={b!r} oracle={a!r}{d}")
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ value mismatches")
            for m in bad:
                print(f"   {m}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(odf)} rows)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(SparkQueriesNotInOracle(out_dir, oracle))} rows-only")
    return 1 if n_fail else 0


def SparkQueriesNotInOracle(out_dir, oracle):
    import os
    dirs = [d for d in os.listdir(out_dir)
            if os.path.isdir(f"{out_dir}/{d}")]
    return [d for d in dirs if d not in oracle]


if __name__ == "__main__":
    sys.exit(main())
