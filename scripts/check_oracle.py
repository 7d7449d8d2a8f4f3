#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Reads each Verify-dumped parquet under OUT_DIR, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the sf parquet tables, and compares:
row count, column names (sorted), and per-cell values (columns sorted by
name, rows in result order). Floats compare EXACTLY by default — the
driver's gate hashes cells exactly, so a tolerant local gate is strictly
weaker and would let a tiny-float divergence pass locally and fail the
round (the r11 lesson). Pass --tol for the old 1e-9 rel-tol behavior
when triaging.  Usage: check_oracle.py [--tol] <sfDir> <outDir> [query ...]
"""
import json, math, sys
import duckdb

EXACT = True

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def aslist(v):
    import numpy as np
    if isinstance(v, np.ndarray):
        return v.tolist()
    return v

def isnull(v):
    if v is None:
        return True
    try:
        import pandas as pd
        return not isinstance(v, (list, tuple)) and pd.isna(v)
    except (TypeError, ValueError):
        return False

def eq(a, b):
    a, b = aslist(a), aslist(b)
    if isnull(a) or isnull(b):
        return isnull(a) and isnull(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        if EXACT:
            return af == bf
        return af == bf or abs(af - bf) <= 1e-9 * max(abs(af), abs(bf), 1.0)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b

def main():
    global EXACT
    argv = [a for a in sys.argv[1:] if a != "--tol"]
    if "--tol" in sys.argv:
        EXACT = False
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})"); failed.append(name); continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); failed.append(name); continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}"); failed.append(name); continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); failed.append(name); continue
        bad = 0
        for c in gcols:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                a = None if (isinstance(a, float) and math.isnan(a)) else a
                b = None if (isinstance(b, float) and math.isnan(b)) else b
                if not eq(a, b):
                    if bad < 3:
                        print(f"  {name}.{c}[{i}]: spark={a!r} oracle={b!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells over {len(got)} rows")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
