#!/usr/bin/env python3
"""Hollow-output audit: flag constant columns in Verify results.

Usage: python3 tools/audit_constant_columns.py <verifyOutDir>

The oracle-equality gate proves both engines AGREE — it cannot see that
an agreed answer is degenerate (a boolean flag that never fires, a
threshold that sits outside the fixture's range, a rank that is always
1). This sweep catches that class: for every result with >= 3 rows it
reports boolean columns with a single value, and for results with
>= 10 rows any non-object column with a single distinct value.

Triage, don't blindly fix: many hits are BY DESIGN (sketch/ANN
guarantee columns are all-true because the guarantee holds; a hash-split
A/B with no real effect is correctly never significant; a one-month
fixture has a constant year). The round-10 triage of the full catalog is
recorded in NOTES.md — new hits beyond that list deserve a look.
"""
import os
import sys

import pandas as pd

out_dir = sys.argv[1]
hits = []
for f in sorted(os.listdir(out_dir)):
    if not f.endswith(".parquet"):
        continue
    try:
        df = pd.read_parquet(os.path.join(out_dir, f))
    except Exception:
        continue
    if len(df) < 3:
        continue  # tiny summaries: constants expected
    for c in df.columns:
        s = df[c]
        if s.dtype == bool and s.nunique() == 1:
            hits.append((f, c, "const-bool", bool(s.iloc[0])))
        elif s.dtype != object and s.nunique() == 1 and len(df) >= 10:
            hits.append((f, c, "const-val", s.iloc[0]))

for h in hits:
    print(f"CONST {h[0]}\t{h[1]}\t{h[2]}\t{h[3]}")
print(f"{len(hits)} constant columns across "
      f"{len([f for f in os.listdir(out_dir) if f.endswith('.parquet')])} results")
