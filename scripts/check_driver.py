#!/usr/bin/env python3
"""Strict stand-in for the DRIVER's comparator (dtype- and bit-sensitive).

The driver (CORRECTNESS_r{N}.json) reads each Verify parquet with pandas,
runs the oracle SQL in DuckDB (.df()), sorts columns by name, sorts rows by
all columns, and HASHES the values. That hash is dtype-sensitive: a Spark
DECIMAL column arrives as python Decimal objects while DuckDB's .df() gives
float64 — cell-equal but hash-different (ingest_lineitem, round 1). It also
crashes outright on ndarray cells ("unhashable numpy.ndarray").

This script replicates that strictness: per query it reports
  rows_match / schema_match / dtype_match (pandas dtype kind per column)
  / exact_match (bit-exact values, no float tolerance)
plus 'sortable' (pandas sort_values does not crash).
Usage: check_driver.py <sfDir> <outDir> [query ...]
"""
import json, sys
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def kind(s):
    # numeric width matters to a value hash less than kind; but object vs
    # float is exactly the trap -> compare pandas dtype kind + object types
    k = s.dtype.kind
    if k == "O" and len(s) > 0:
        t = type(s.dropna().iloc[0]).__name__ if s.notna().any() else "none"
        return f"O:{t}"
    if k == "M":
        return "M"
    return k


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res = {"rows": None, "schema": None, "dtype": None, "exact": None,
               "sortable": None}
        try:
            sdf = pd.read_parquet(f"{out_dir}/{name}")
            odf = con.execute(sql).df()
            res["rows"] = len(sdf) == len(odf)
            res["schema"] = sorted(sdf.columns) == sorted(odf.columns)
            try:
                sdf, odf = canon(sdf), canon(odf)
                res["sortable"] = True
            except TypeError as e:
                res["sortable"] = f"CRASH: {e}"
                bad.append((name, res))
                print(name, res)
                continue
            # timestamps: unify unit (driver compare survives ns-vs-us
            # because values are equal instants; pandas == handles it)
            dt = {c: (kind(sdf[c]), kind(odf[c])) for c in sdf.columns}
            mismatch = {c: v for c, v in dt.items()
                        if v[0] != v[1]
                        and not (v[0] in "Mm" and v[1] in "Mm")
                        # int64 vs int32 both hash by value; allow i==i
                        and not (v[0] in "iu" and v[1] in "iu")
                        and not (v[0] in "f" and v[1] in "f")}
            res["dtype"] = mismatch or True
            eqc = all(
                (sdf[c].isna() & odf[c].isna() |
                 (sdf[c] == odf[c]).fillna(False)).all()
                if sdf[c].dtype.kind != "O" and odf[c].dtype.kind != "O"
                else all((a is None and b is None) or
                         (not (a is None or b is None) and a == b)
                         for a, b in zip(sdf[c].where(sdf[c].notna(), None),
                                         odf[c].where(odf[c].notna(), None)))
                for c in sdf.columns) if res["schema"] else False
            res["exact"] = bool(eqc)
        except Exception as e:
            res["exact"] = f"ERR: {type(e).__name__}: {e}"
        ok = (res["rows"] is True and res["schema"] is True
              and res["dtype"] is True and res["exact"] is True
              and res["sortable"] is True)
        if not ok:
            bad.append((name, res))
            print(name, res)
    n = len([k for k in oracles if not only or k in only])
    print(f"{n - len(bad)}/{n} queries strictly match")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
