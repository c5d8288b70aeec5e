#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify
parquet output, run the corresponding oracle SQL in DuckDB over the same
sf directory, sort columns by name + rows by all values, and compare.

Usage: python3 tools/selfcheck.py [sfdir] [outdir]
(Dev tooling only — the shipped Scala library has no Python deps.)
"""
import json, math, sys

import duckdb
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b or str(a) == str(b)

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        got = canon(pd.read_parquet(f"{OUTDIR}/{name}"))
    except Exception as e:
        fails.append((name, f"spark output missing: {e}"))
        continue
    try:
        exp = canon(con.execute(sql).df())
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}"))
        continue
    if sorted(got.columns) != sorted(exp.columns):
        fails.append((name, f"columns differ: spark={sorted(got.columns)} duck={sorted(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"row count: spark={len(got)} duck={len(exp)}"))
        continue
    bad = None
    exact = True
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if not cmp_cell(a, b):
                bad = f"col {c} row {i}: spark={a!r} duck={b!r}"
                break
            if isinstance(a, float) and isinstance(b, float) and a != b and not (math.isnan(a) and math.isnan(b)):
                exact = False
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append((name, len(got), "exact" if exact else "APPROX-ONLY"))

for name, n, kind in passes:
    print(f"PASS  {name:32s} rows={n:<7d} {kind}")
for name, why in fails:
    print(f"FAIL  {name:32s} {why}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
