#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, and compares: schema (column names), row count, and a
value hash over columns sorted by name.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # exact float compare (repr round-trips doubles): the local gate must be
    # at least as strict as the driver's, never looser
    if isinstance(v, float):
        return repr(v)
    return str(v)


def table_rows(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm(r[i]) for i in order) for r in rel.fetchall()]
    return sorted(cols), sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # events.ts is TIMESTAMP_NS; Spark side truncates to micros — mirror it.
    con.sql("DROP VIEW events")
    con.sql(f"CREATE VIEW events AS SELECT event_id, "
            f"CAST(ts AS TIMESTAMP) ts, user_id, event_type, value, props "
            f"FROM '{sf_dir}/events.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols, srows = table_rows(spark_rel)
            ocols, orows = table_rows(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: exception {str(e)[:200]}")
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
