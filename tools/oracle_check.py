#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir> [query ...]

<verify_out_dir> is the output of `sbt "runMain graft.Verify <sf_dir> <out>"`:
one parquet dir per query plus oracle_sql.json. Registers the testdata tables
in DuckDB, runs each oracle SQL, and compares row multisets (sorted rows,
stringified) and column names against the Spark parquet output.
"""
import sys, json, glob, os
import duckdb

def norm(v):
    # floats: compare exact repr (both engines emit IEEE doubles; formulas
    # are bit-identical by design). bytes -> hex.
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def rows_key(rows):
    return sorted([tuple(norm(v) for v in r) for r in rows])

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sql = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    con = duckdb.connect()
    for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
        p = os.path.join(sf_dir, f'{t}.parquet')
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_skip = 0
    for q in sorted(sql):
        if only and q not in only:
            continue
        qdir = os.path.join(out_dir, q)
        files = glob.glob(os.path.join(qdir, '*.parquet'))
        if not files:
            print(f'SKIP {q}: no spark output')
            n_skip += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        spark_cols = [c.lower() for c in spark_rel.columns]
        spark_rows = spark_rel.fetchall()
        try:
            orel = con.sql(sql[q])
            ocols = [c.lower() for c in orel.columns]
            orows = orel.fetchall()
        except Exception as e:
            print(f'FAIL {q}: oracle error {e}')
            n_fail += 1
            continue
        ok_schema = spark_cols == ocols
        ok_rows = len(spark_rows) == len(orows)
        ok_hash = ok_rows and rows_key(spark_rows) == rows_key(orows)
        if ok_schema and ok_hash:
            print(f'PASS {q} ({len(spark_rows)} rows)')
            n_pass += 1
        else:
            print(f'FAIL {q}: schema_match={ok_schema} rows {len(spark_rows)} vs {len(orows)} hash_match={ok_hash}')
            if not ok_schema:
                print(f'  spark cols: {spark_cols}\n  oracle cols: {ocols}')
            n_fail += 1
    print(f'== {n_pass} pass, {n_fail} fail, {n_skip} skip ==')
    sys.exit(1 if n_fail else 0)

if __name__ == '__main__':
    main()
