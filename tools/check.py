#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB on oracle_sql.json produced by graft.Verify, loads the
parquet each query wrote, normalizes (columns sorted by name, rows
sorted by all columns), and compares. Reports per-query: shape match,
exact match, and max float deviation (we aim for bit-exact; anything
nonzero is flagged).

Usage: python3 tools/check.py [sfdir] [outdir] [query ...]
(Run `sbt "runMain graft.Verify <sfdir> <outdir>"` first.)
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def _hashable(v):
    # array-valued cells (list/ndarray) must become tuples so pandas
    # can factorize them as sort keys and compare elementwise
    if isinstance(v, np.ndarray):
        return tuple(_hashable(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_hashable(x) for x in v)
    return v

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_hashable)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    rows_only = []
    for name in sorted(set(glob.glob(f"{outdir}/*/")
                           and [p.rstrip("/").split("/")[-1]
                                for p in glob.glob(f"{outdir}/*/")])):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            rows_only.append((name, len(got)))
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, e_ = norm(got), norm(exp)
        if list(g.columns) != list(e_.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e_.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e_):
            print(f"FAIL {name}: rows {len(g)} != {len(e_)}")
            n_fail += 1
            continue
        bad = None
        dtype_notes = []
        for c in g.columns:
            gv, ev = g[c], e_[c]
            if str(gv.dtype) != str(ev.dtype):
                dtype_notes.append(f"{c}: {gv.dtype} vs {ev.dtype}")
            if pd.api.types.is_datetime64_any_dtype(gv) or \
               pd.api.types.is_datetime64_any_dtype(ev):
                a = pd.to_datetime(gv).astype("datetime64[ns]")
                b = pd.to_datetime(ev).astype("datetime64[ns]")
                neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    bad = bad or (c, None, a[neq][:3].tolist(),
                                  b[neq][:3].tolist())
            elif pd.api.types.is_numeric_dtype(gv) and \
                 pd.api.types.is_numeric_dtype(ev):
                a = gv.astype(float).to_numpy()
                b = ev.astype(float).to_numpy()
                both_nan = np.isnan(a) & np.isnan(b)
                neq = ~both_nan & (a != b)
                if neq.any():
                    dev = np.nanmax(np.abs(a[neq] - b[neq]))
                    bad = bad or (c, dev, a[neq][:3], b[neq][:3])
            else:
                try:
                    same = gv.equals(ev)
                except Exception:
                    same = False
                if not same:
                    mism = (gv.astype(str) != ev.astype(str))
                    if mism.any():
                        bad = bad or (c, None, gv[mism][:3].tolist(),
                                      e_[c][mism][:3].tolist())
        if bad is None:
            note = f" [dtype: {'; '.join(dtype_notes)}]" if dtype_notes else ""
            print(f"PASS {name}: {len(g)} rows, bit-exact{note}")
            n_pass += 1
        else:
            c, dev, a, b = bad
            print(f"FAIL {name}: col {c} dev={dev} got={a} exp={b}")
            n_fail += 1
    for name, n in rows_only:
        print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
