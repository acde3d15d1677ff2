#!/usr/bin/env python3
"""Local differential check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [outDir]
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
     (or pass --run to run it here);
  2. for each query dir under outDir, loads the Spark parquet result and
     runs the matching oracle SQL from oracle_sql.json in DuckDB with the
     fixture tables registered as views;
  3. compares: row count, column names (sorted), and cell values with
     rows sorted by every column — strict equality, which upper-bounds
     whatever normalization the driver applies.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def frame_key(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = Path(args[1] if len(args) > 1 else "/tmp/graft_verify")
    only = args[2].split(",") if len(args) > 2 else None
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
                       check=True, cwd="/root/repo")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        if only and name not in only:
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(qdir.glob("*.parquet"))],
                            ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_bad += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only: {len(got)} rows)")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        gc, gr = frame_key(got)
        ec, er = frame_key(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_bad += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            n_bad += 1
            continue
        diff = [(a, b) for a, b in zip(gr, er) if a != b]
        if diff:
            print(f"FAIL {name}: {len(diff)}/{len(gr)} differing rows; first: \n  spark={diff[0][0]}\n  duck ={diff[0][1]}\n  cols={gc}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(gr)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {len(oracle)} oracles declared")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
