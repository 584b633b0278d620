#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB over the oracle SQL dumped by graft.Verify and compares each
query's parquet output (rows, schema-by-name, and values after sorting
columns by name and rows canonically) against the oracle result.

Usage:  python3 tools/check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def canon(rows):
    def key(r):
        return tuple((v is None, str(v)) for v in r)
    return sorted([tuple(r) for r in rows], key=key)

def norm(v):
    # normalize python scalar types across duckdb/pyarrow readers
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    spark_dirs = [d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)]
    for d in sorted(spark_dirs):
        qname = os.path.basename(d)
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"MISSING-OUTPUT {qname}"); fail += 1; continue
        tbl = pq.read_table(files[0])
        if qname not in oracle:
            print(f"rows-only     {qname}: {tbl.num_rows} rows")
            continue
        try:
            res = con.execute(oracle[qname])
            duck_cols = [dsc[0] for dsc in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"ORACLE-ERROR  {qname}: {e}"); fail += 1; continue
        spark_cols = tbl.column_names
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"SCHEMA-DIFF   {qname}: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            fail += 1; continue
        order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        duck_sorted = canon([[norm(r[i]) for i in order] for r in duck_rows])
        cols = sorted(spark_cols)
        pydata = tbl.select(cols).to_pylist()
        spark_sorted = canon([[norm(r[c]) for c in cols] for r in pydata])
        if len(spark_sorted) != len(duck_sorted):
            print(f"ROWCOUNT-DIFF {qname}: spark={len(spark_sorted)} duck={len(duck_sorted)}")
            fail += 1; continue
        if spark_sorted != duck_sorted:
            bad = next(i for i, (a, b) in enumerate(zip(spark_sorted, duck_sorted)) if a != b)
            print(f"VALUE-DIFF    {qname}: first diff at sorted row {bad}:")
            print(f"  spark: {spark_sorted[bad]}")
            print(f"  duck:  {duck_sorted[bad]}")
            fail += 1; continue
        print(f"OK            {qname}: {len(spark_sorted)} rows")
        ok += 1
    print(f"\n{ok} ok, {fail} failed, {len(spark_dirs)-ok-fail} rows-only")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
