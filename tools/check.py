#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir> [--json <reportPath>]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

--json writes the per-query outcome in the driver's CORRECTNESS format, so
a self-run artifact (CORRECTNESS_SELF.json) can be committed every round
and a stale driver artifact can never mask a regression.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
report_path = None
if len(sys.argv) > 4 and sys.argv[3] == "--json":
    report_path = sys.argv[4]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracles = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime") or str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(9)
        else:
            try:
                df[c] = df[c].astype("int64")
            except Exception:
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails, passes, rows_only = [], [], []
for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
    name = os.path.basename(qdir)
    files = glob.glob(os.path.join(qdir, "*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracles:
        rows_only.append((name, len(spark_df)))
        continue
    try:
        oracle_df = con.execute(oracles[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    a, b = canon(spark_df.copy()), canon(oracle_df.copy())
    if list(a.columns) != list(b.columns):
        fails.append((name, f"columns spark={list(a.columns)} oracle={list(b.columns)}"))
        continue
    if len(a) != len(b):
        fails.append((name, f"rowcount spark={len(a)} oracle={len(b)}"))
        continue
    if not a.equals(b):
        diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
        # show first mismatching rows
        mask = (a != b).any(axis=1)
        idx = list(a.index[mask])[:3]
        detail = []
        for i in idx:
            detail.append(f"row{i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}")
        fails.append((name, f"value mismatch in {diff_cols}; " + " | ".join(detail)))
        continue
    passes.append((name, len(a)))

for n, c in passes:
    print(f"PASS  {n} ({c} rows)")
for n, c in rows_only:
    print(f"ROWS  {n} ({c} rows{'  ** EMPTY **' if c == 0 else ''})")
for n, msg in fails:
    print(f"FAIL  {n}: {msg[:600]}")
print(f"\n{len(passes)} pass, {len(rows_only)} rows-only, {len(fails)} fail")

if report_path:
    report = {}
    for n, c in passes:
        report[n] = {"rows_match": True, "schema_match": True, "hash_match": True,
                     "spark_rows": c, "oracle_rows": c, "err": None}
    for n, c in rows_only:
        report[n] = {"rows_match": None, "schema_match": None, "hash_match": None,
                     "spark_rows": c, "oracle_rows": None, "err": "no_oracle"}
    for n, msg in fails:
        report[n] = {"rows_match": False, "schema_match": False, "hash_match": False,
                     "spark_rows": None, "oracle_rows": None, "err": msg[:300]}
    with open(report_path, "w") as f:
        json.dump(dict(sorted(report.items())), f, indent=2)
    print(f"wrote {report_path}")
sys.exit(1 if fails else 0)
