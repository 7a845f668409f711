#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify's
parquet dumps against the DuckDB oracle SQL, canonicalized per
FIXTURES.md §3 (columns sorted by name, rows sorted, doubles rounded to
6 dp, NULL distinct from empty string). Dev tool only — not part of the
engine."""
import json, sys, glob, os
import duckdb
import pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].astype("float64").round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c], utc=True).dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif df[c].dtype == "object":
            def norm(v):
                if hasattr(v, "tolist"):  # numpy array from parquet/duckdb
                    v = v.tolist()
                if isinstance(v, (list, dict)):
                    return json.dumps(v, sort_keys=True, default=str)
                return v
            df[c] = df[c].map(norm)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracle):
    if ONLY and name not in ONLY:
        continue
    res_dir = f"{OUT}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING   {name} (no verify output)")
        fails += 1
        continue
    try:
        mine = canon(con.execute(
            f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf())
        orc = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"ERROR     {name}: {e}")
        fails += 1
        continue
    if list(mine.columns) != list(orc.columns):
        print(f"SCHEMA    {name}: mine={list(mine.columns)} oracle={list(orc.columns)}")
        fails += 1
    elif len(mine) != len(orc):
        print(f"ROWCOUNT  {name}: mine={len(mine)} oracle={len(orc)}")
        fails += 1
    elif not mine.equals(orc):
        neq = (mine != orc) & ~(mine.isna() & orc.isna())
        bad_cols = [c for c in mine.columns if neq[c].any()]
        print(f"VALUES    {name}: differing cols={bad_cols}")
        for c in bad_cols[:2]:
            i = neq[c].idxmax()
            print(f"   row {i} col {c}: mine={mine[c][i]!r} oracle={orc[c][i]!r}")
        fails += 1
    else:
        print(f"OK        {name} ({len(mine)} rows)")

# rows-only entries (queries without oracle)
for res_dir in sorted(glob.glob(f"{OUT}/*/")):
    name = os.path.basename(res_dir.rstrip("/"))
    if name not in oracle:
        try:
            n = con.execute(f"SELECT count(*) FROM '{res_dir}/*.parquet'").fetchone()[0]
            print(f"ROWS-ONLY {name} ({n} rows)")
        except Exception as e:
            print(f"ERROR     {name}: {e}")
            fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
