#!/usr/bin/env python3
"""Dev-only oracle pre-check (mirrors the driver's DuckDB compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each Spark result parquet written by graft.Verify, runs the matching
DuckDB oracle SQL, sorts columns by name and rows by all columns, and
compares values (floats with small tolerance). NOT part of the shipped
library — the Scala engine never depends on this.
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            # exact: the driver hash-compares values, so any drift fails
            return fa == fb
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    for name in sorted(oracle):
        try:
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failed.append(name)
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failed.append(name)
            continue
        bad = None
        for col in g.columns:
            gv, wv = g[col].tolist(), w[col].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if not cell_eq(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: first diff col={col} row={i}: spark={a!r} duck={b!r}")
            failed.append(name)
        else:
            print(f"ok   {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
