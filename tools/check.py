#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, and compares the way the DRIVER does:

  * Spark side loaded with pandas/pyarrow (so parquet DECIMAL arrives as
    decimal.Decimal objects, int64 as int64), oracle side via duckdb .df()
    (so HUGEINT/DECIMAL arrive as float64) — the two readers' REAL dtype
    behavior, not a string normalization that hides it.
  * pandas sort_values over all columns — array/struct result columns crash
    here exactly like they crash the driver (r3: q84/q128).
  * a TYPE-KIND-SENSITIVE value hash: int vs float vs Decimal differ even
    when numerically equal (r2/r3: q69 int64-vs-float64, q127 Decimal).

History: the previous tuple-sort/str() version passed all four rows the
driver rejected in round 3. This gate must be at least as strict as the
driver's, never looser.
"""
import datetime
import decimal
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Canonical (type-kind, value) string for one cell.

    Integer kinds (numpy int64, python int) normalize together, float kinds
    together, Decimal separately — mirroring what survives the driver's
    pandas normalization. Numerically-equal values of different kinds MUST
    differ (337 int64 vs 337.0 float64 is the q69 bug)."""
    if v is None:
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"int:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f != f:
            # Distinct token (not "null"): pandas float64 cannot represent
            # NULL separately from NaN, so BOTH readers surface a missing
            # float as NaN and both land here — comparison stays symmetric.
            # What this refuses to do is equate a float NaN with an
            # object-dtype None in some other column kind.
            return "nan"
        return f"float:{f!r}"
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    if isinstance(v, np.datetime64):
        return f"ts:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        # pyarrow surfaces parquet DATE as datetime.date objects while
        # duckdb .df() surfaces DATE as datetime64 — the driver equates the
        # two (q28/q90/q104/q135 are driver-green), so canonicalize DATE to
        # its midnight-timestamp form
        return f"ts:{v.isoformat()}T00:00:00"
    if isinstance(v, str):
        return f"str:{v}"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    # arrays/structs normally die in sort_values first (as in the driver);
    # anything reaching here is a non-atomic result column — hard error.
    raise TypeError(f"non-atomic cell type {type(v).__name__}: {v!r}")


def frame_rows(df):
    """(sorted cols, hashed rows) after the driver's sort_values step."""
    cols = sorted(df.columns)
    df = df[cols]
    # the driver's crash point for array-typed result columns — do NOT
    # work around it; reproducing the crash locally is the point
    df = df.sort_values(by=cols, kind="mergesort")
    rows = [tuple(norm_cell(v) for v in rec) for rec in
            df.itertuples(index=False, name=None)]
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()

    def tpath(t):
        # driver corpora are single files; EdgeCorpus (Spark-written) tables
        # are directories of part files — glob those for DuckDB
        p = f"{sf_dir}/{t}.parquet"
        return f"{p}/*.parquet" if os.path.isdir(p) else p

    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{tpath(t)}'")
    # events.ts is TIMESTAMP_NS; Spark side truncates to micros — mirror it.
    # EdgeCorpus-written corpora carry ts as BIGINT nanos (what the engine
    # sees under nanosAsLong) — bridge that form with make_timestamp(us).
    ts_type = con.sql(
        f"SELECT column_type FROM (DESCRIBE SELECT ts "
        f"FROM '{tpath('events')}')").fetchone()[0]
    ts_expr = ("make_timestamp(ts // 1000)" if "INT" in ts_type.upper()
               else "CAST(ts AS TIMESTAMP)")
    con.sql("DROP VIEW events")
    con.sql(f"CREATE VIEW events AS SELECT event_id, "
            f"{ts_expr} ts, user_id, event_type, value, props "
            f"FROM '{tpath('events')}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            scols, srows = frame_rows(spark_df)
        except Exception as e:
            print(f"FAIL {name}: spark-side {type(e).__name__} {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            ocols, orows = frame_rows(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle-side {type(e).__name__} {str(e)[:200]}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            n_fail += 1
        elif srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)} "
                  f"first-diffs={diff}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
