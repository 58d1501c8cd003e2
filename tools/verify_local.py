#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
engine itself has no Python dependency). Usage:

  python3 tools/verify_local.py [sfDir] [outDir] [--skip-spark]

Runs graft.Verify via sbt, then executes each oracle_sql.json entry in
DuckDB over the same parquet tables and compares values column-sorted,
both in result order and row-sorted."""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_spark():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}']
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    if r.returncode != 0:
        print("sbt runMain failed"); sys.exit(1)


def canon(v):
    # strict: exact repr, no tolerance — the whole query set passes
    # bit-for-bit, so keep the gate at full strength
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return repr(v)


def main():
    if "--skip-spark" not in sys.argv:
        run_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(OUT.iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        got = con.execute(
            f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
        got_cols = sorted(got.columns)
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got)} rows)")
            if len(got) == 0:
                print(f"    WARN: empty result")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        exp_cols = sorted(exp.columns)
        if got_cols != exp_cols:
            print(f"✗ {name}: column mismatch {got_cols} vs {exp_cols}")
            n_fail += 1
            continue
        g = [[canon(v) for v in row] for row in
             got[got_cols].itertuples(index=False, name=None)]
        e = [[canon(v) for v in row] for row in
             exp[exp_cols].itertuples(index=False, name=None)]
        ordered = g == e
        sorted_eq = sorted(map(tuple, g)) == sorted(map(tuple, e))
        if ordered:
            print(f"✓ {name} ({len(g)} rows)")
            n_pass += 1
        elif sorted_eq:
            print(f"~ {name}: rows match only after sorting ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"✗ {name}: VALUE MISMATCH ({len(g)} vs {len(e)} rows)")
            gs, es = set(map(tuple, g)), set(map(tuple, e))
            for d in list(gs - es)[:3]:
                print(f"    spark-only: {d}")
            for d in list(es - gs)[:3]:
                print(f"    oracle-only: {d}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
