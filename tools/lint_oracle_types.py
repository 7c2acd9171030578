#!/usr/bin/env python3
"""Oracle dtype lint (r9 verdict #2b).

For every entry in oracle_sql.json, resolve the DuckDB result schema with
`DESCRIBE <sql>` (no execution) and compare each column's type against the
Spark result schema read from the Verify parquet footer. The driver's hash is
dtype-sensitive (q164 went red on HUGEINT->float64 vs int64 alone), so any
class mismatch — in particular an uncast SUM returning HUGEINT — fails here.

Usage: python3 tools/lint_oracle_types.py <sfDir> <verifyOutDir>
"""
import json
import os
import re
import sys

import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def canon_duck(t):
    """DuckDB type string -> the pandas dtype CLASS the driver hashes.

    The classes model fetchdf() materialization, because that is what the
    driver's type-sensitive hash sees: DECIMAL -> float64 ("float"),
    DATE/TIMESTAMP -> datetime64 ("datetime"). HUGEINT stays its own
    token — it materializes float64 while the Spark twin is long, the
    exact q164 failure; an uncast SUM/COUNT must fail this lint.
    """
    t = t.strip().upper()
    m = re.match(r"(.+)\[\]$", t)
    if m:
        return "list<" + canon_duck(m.group(1)) + ">"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t == "HUGEINT":
        return "HUGEINT"  # never acceptable: cast the oracle to BIGINT/DOUBLE
    if t in ("DOUBLE", "FLOAT", "REAL") or t.startswith("DECIMAL"):
        return "float"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "datetime"
    if t == "BOOLEAN":
        return "bool"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "string"
    if t in ("BLOB", "BYTEA"):
        return "binary"
    return t.lower()


def canon_arrow(t):
    s = str(t)
    if s.startswith("list<") or s.startswith("large_list<"):
        inner = re.match(r"(?:large_)?list<(?:item|element): (.+)>$", s)
        return "list<" + canon_arrow(inner.group(1)) + ">" if inner else s
    if re.match(r"u?int\d+$", s):
        return "int"
    if s in ("float", "double", "halffloat", "float32", "float64") \
            or s.startswith("decimal"):
        return "float"
    if s.startswith("timestamp") or s.startswith("date"):
        return "datetime"
    if s == "bool":
        return "bool"
    if s in ("string", "large_string", "utf8", "large_utf8"):
        return "string"
    if s in ("binary", "large_binary"):
        return "binary"
    return s


def spark_schema(path):
    """Schema of a Spark parquet output dir (or a bare file)."""
    if os.path.isdir(path):
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not parts:
            raise FileNotFoundError(f"no part files in {path}")
        path = os.path.join(path, sorted(parts)[0])
    return pq.read_schema(path)


fails, passes = [], []
seen = set()
for name, sql in sorted(oracle.items()):
    path = f"{out_dir}/{name}.parquet" if not name.endswith(".parquet") \
        else f"{out_dir}/{name}"
    if not os.path.exists(path):
        path = f"{out_dir}/{name}"
    if path in seen:  # oracle_sql.json carries both name and name.parquet keys
        continue
    seen.add(path)
    try:
        duck = {r[0]: canon_duck(r[1])
                for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        spark = {f.name: canon_arrow(f.type) for f in spark_schema(path)
                 if not f.name.startswith("__")}
    except Exception as e:
        fails.append((name, f"resolve error: {e}"))
        continue
    if sorted(duck) != sorted(spark):
        fails.append((name, f"columns differ: {sorted(spark)} vs {sorted(duck)}"))
        continue
    bad = [f"{c}: spark={spark[c]} oracle={duck[c]}"
           for c in sorted(duck) if duck[c] != spark[c]]
    if bad:
        fails.append((name, "; ".join(bad)))
    else:
        passes.append(name)

print(f"TYPELINT PASS {len(passes)}/{len(passes) + len(fails)}")
for n, msg in fails:
    print(f"TYPELINT FAIL {n}: {msg}")
sys.exit(1 if fails else 0)
