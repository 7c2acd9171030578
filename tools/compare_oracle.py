#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Loads each query's Spark parquet result from <verifyOutDir>/<name>/, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf tables, sorts
columns by name, and compares values cell-by-cell (timestamps normalized to
UTC ns; floats compared exactly after the queries' own rounding).
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)

fails, passes = [], []
import os

for name, sql in sorted(oracle.items()):
    path = f"{out_dir}/{name}.parquet"
    if not os.path.exists(path):
        path = f"{out_dir}/{name}"  # pre-contract layout
    try:
        got = norm(pd.read_parquet(path))
        want = norm(con.execute(sql).fetchdf())
    except Exception as e:
        fails.append((name, f"load/exec error: {e}"))
        continue
    if list(got.columns) != list(want.columns):
        fails.append((name, f"columns differ: {list(got.columns)} vs {list(want.columns)}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"row count {len(got)} vs {len(want)}"))
        continue
    bad = None
    for c in got.columns:
        a, b = got[c], want[c]
        # Type-strict gate (r9 verdict #2): the driver's hash is dtype-sensitive,
        # so an integer Spark column vs a float oracle column (e.g. DuckDB's
        # HUGEINT sum materializing as float64) must fail HERE, not at the driver.
        ka = a.dtype.kind if hasattr(a.dtype, "kind") else "O"
        kb = b.dtype.kind if hasattr(b.dtype, "kind") else "O"
        cls = lambda k: {"i": "int", "u": "int", "f": "float", "b": "bool",
                         "M": "datetime", "m": "timedelta"}.get(k, "object")
        if cls(ka) != cls(kb):
            bad = f"col {c} dtype class differs: spark {a.dtype} ({cls(ka)}) vs oracle {b.dtype} ({cls(kb)})"
            break
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            af = a.astype(float).to_numpy()
            bf = b.astype(float).to_numpy()
            eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
        else:
            eq = (a.to_numpy() == b.to_numpy()) | (a.isna().to_numpy() & b.isna().to_numpy())
        if not eq.all():
            i = int(np.argmin(eq))
            bad = f"col {c} differs at row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r} ({int((~eq).sum())} cells)"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

print(f"PASS {len(passes)}/{len(passes) + len(fails)}")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
