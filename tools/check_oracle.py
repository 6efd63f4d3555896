#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each
query's Spark parquet dump, runs its oracle SQL in DuckDB over the same
fixture tables, and compares (rows, columns-sorted-by-name, row-sorted
values). Exact match required; doubles compared bit-exact after the
round() both sides apply.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, json, glob, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

class ArrayCell(Exception):
    """Mirrors the driver: its pandas comparator cannot hash/sort
    array-typed cells (CORRECTNESS_r01: 'unhashable type: numpy.ndarray').
    Queries must serialize arrays to strings; we fail loudly like it does."""

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)  # kill any residual repr noise
            if isinstance(v, (list, tuple, dict)):
                raise ArrayCell(f"array-typed cell in column '{cols[i]}'")
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

n_pass = n_fail = n_noracle = 0
for path in sorted(glob.glob(f"{out_dir}/*/")):
    name = path.rstrip("/").split("/")[-1]
    rel = con.sql(f"SELECT * FROM '{path}*.parquet'")
    scols, srows = rel.columns, rel.fetchall()
    if name not in oracles:
        n_noracle += 1
        print(f"  [rows-only] {name}: {len(srows)} rows")
        continue
    try:
        orel = con.sql(oracles[name])
        ocols, orows = orel.columns, orel.fetchall()
    except Exception as ex:
        n_fail += 1
        print(f"  [FAIL-sql ] {name}: {str(ex)[:200]}")
        continue
    if sorted(scols) != sorted(ocols):
        n_fail += 1
        print(f"  [FAIL-cols] {name}: spark={sorted(scols)} oracle={sorted(ocols)}")
        continue
    try:
        a, b = canon(srows, scols), canon(orows, ocols)
    except ArrayCell as ex:
        n_fail += 1
        print(f"  [FAIL-arr ] {name}: {ex} — driver cannot grade arrays")
        continue
    if len(a) != len(b):
        n_fail += 1
        print(f"  [FAIL-rows] {name}: spark={len(a)} oracle={len(b)}")
        continue
    bad = [(x, y) for x, y in zip(a, b) if x != y]
    if bad:
        n_fail += 1
        print(f"  [FAIL-vals] {name}: {len(bad)} differing rows; first: {bad[0]}")
    else:
        n_pass += 1
        print(f"  [ok       ] {name}: {len(a)} rows")

print(f"\npass={n_pass} fail={n_fail} rows_only={n_noracle}")
sys.exit(1 if n_fail else 0)
