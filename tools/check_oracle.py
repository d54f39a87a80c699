#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
Reads each <outDir>/<name> parquet (Spark result) + oracle_sql.json,
runs the oracle in DuckDB with views named after the tables, and
compares rowcount / columns / sorted values.
"""
import sys, json, math, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    # sort columns by name, rows by all values, stringify with rounding
    cols = sorted(df.columns)
    df = df[cols]
    recs = df.values.tolist()
    def norm(v):
        if v is None: return "NULL"
        if isinstance(v, float):
            if math.isnan(v): return "NaN"
            return repr(v)  # full precision — bit-exact compare
        return str(v)
    rows = sorted(tuple(norm(v) for v in r) for r in recs)
    return cols, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')").df()
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_df)} rows)"
            continue
        try:
            oracle_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {str(e)[:200]}"
            continue
        sc, sr = canon(spark_df)
        oc, orows = canon(oracle_df)
        if sc != oc:
            results[name] = f"COLS-MISMATCH spark={sc} oracle={oc}"
        elif len(sr) != len(orows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(sr)} oracle={len(orows)}"
        elif sr != orows:
            diffs = [(a, b) for a, b in zip(sr, orows) if a != b][:3]
            results[name] = f"VALUES-MISMATCH ({sum(1 for a,b in zip(sr,orows) if a!=b)} rows) e.g. {diffs}"
        else:
            results[name] = f"OK ({len(sr)} rows)"
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
    for k, v in sorted(results.items()):
        mark = "✓" if v.startswith("OK") or v.startswith("rows-only") else "✗"
        print(f"{mark} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
