#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver:
runs DuckDB on oracle_sql.json over the same sf dir and compares each
query's parquet output (columns sorted by name, values compared cell-wise).

Usage: python3 tools/check_oracles.py <outDir> <sfDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, glob
import duckdb, pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
n_ok = n_bad = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        print(f"MISSING-OUTPUT {name}"); n_bad += 1; continue
    try:
        got = pd.read_parquet(spark_dir)
        want = con.sql(sql).df()
    except Exception as e:
        print(f"ERROR {name}: {str(e)[:200]}"); n_bad += 1; continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA {name}: spark={list(got.columns)} duckdb={list(want.columns)}"); n_bad += 1; continue
    if got.shape != want.shape:
        print(f"ROWS {name}: spark={got.shape} duckdb={want.shape}"); n_bad += 1; continue
    # normalize dtypes for compare
    diffs = []
    for c in got.columns:
        a, b = got[c], want[c]
        try:
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                bad = ~((a.isna() & b.isna()) | (a == b))
            else:
                bad = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
        except Exception:
            bad = pd.Series([True] * len(a))
        if bad.any():
            i = bad.idxmax()
            diffs.append(f"col {c} row {i}: spark={a[i]!r} duckdb={b[i]!r} ({int(bad.sum())} cells)")
    if diffs:
        print(f"VALUES {name}: " + "; ".join(diffs[:3])); n_bad += 1
    else:
        print(f"OK {name} ({got.shape[0]} rows)"); n_ok += 1
print(f"\n{n_ok} ok, {n_bad} bad, {len(oracle)} total")
sys.exit(1 if n_bad else 0)
