#!/usr/bin/env python3
"""Local correctness self-check: mimic the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Compares each <outDir>/<name> parquet (Spark result) against the oracle
SQL in <outDir>/oracle_sql.json executed by DuckDB over the raw tables:
row count, column-name set, and exact value match after sorting rows and
columns. Dev tool only — the shipped Scala library has no Python deps.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            if v == 0:
                v = 0.0
            return repr(v)
        return str(v)
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    # union of written outputs, oracle keys, AND the full declared query
    # list: a query that ERRORED in Verify writes no directory, and
    # enumerating only directories would silently drop it from the
    # report (bitten once: a ts-type regression failed 2 queries and
    # the summary still said 0 failing). query_names.json covers the
    # rows-only queries the oracle map cannot.
    written = set(d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d)))
    declared = set(oracle)
    qn_path = os.path.join(out_dir, "query_names.json")
    if os.path.exists(qn_path):
        declared |= set(json.load(open(qn_path)))
    names = sorted(written | declared)
    for name in sorted(declared - written):
        results[name] = "NO_SPARK_OUTPUT (query errored in Verify?)"
    for name in sorted(written):
        parts = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not parts:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({parts!r})").fetchdf()
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(spark_df)})"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        if set(spark_df.columns) != set(duck_df.columns):
            results[name] = (f"SCHEMA_MISMATCH spark={sorted(spark_df.columns)} "
                             f"duck={sorted(duck_df.columns)}")
            continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWCOUNT spark={len(spark_df)} duck={len(duck_df)}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if a == b:
            results[name] = "OK"
        else:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
    bad = 0
    for name in names:
        r = results.get(name, "MISSING")
        flag = "✓" if r == "OK" or r.startswith("ROWS_ONLY") else "✗"
        if flag == "✗":
            bad += 1
        print(f"{flag} {name}: {r[:600]}")
    missing_oracle = [n for n in names if n not in oracle]
    print(f"\n{len(names)} queries, {bad} failing, "
          f"{len(missing_oracle)} rows-only: {missing_oracle}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
