#!/usr/bin/env python3
"""Pin exact bitwise cell diffs between spark verify output and DuckDB oracle.

Usage: python3 scripts/diag_bitwise.py <verify_out> <sf_dir> <query> [query...]
"""
import sys, os, json, glob, struct
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def key(v):
    if isinstance(v, float):
        return struct.pack('>d', v).hex()
    return repr(v)

for name in names:
    duck = con.execute(oracle[name]).fetch_arrow_table()
    spark = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_arrow_table()
    cols = sorted(duck.column_names)
    # canonical row sort (mirrors the driver/selfcheck): positional zip on
    # unordered outputs would report spurious diffs
    def rowkey(r):
        return [('f' + struct.pack('>d', r[c]).hex()) if isinstance(r[c], float)
                else type(r[c]).__name__ + repr(r[c]) for c in cols]
    drows = sorted(duck.select(cols).to_pylist(), key=rowkey)
    srows = sorted(spark.select(cols).to_pylist(), key=rowkey)
    if len(drows) != len(srows):
        print(f"{name}: ROW COUNT duck={len(drows)} spark={len(srows)}")
    nbad = 0
    for i, (dr, sr) in enumerate(zip(drows, srows)):
        for c in cols:
            if key(dr[c]) != key(sr[c]):
                nbad += 1
                if nbad <= 10:
                    print(f"{name} row {i} col {c}: duck={dr[c]!r} ({key(dr[c])}) spark={sr[c]!r} ({key(sr[c])})")
    print(f"{name}: {nbad} bitwise-bad cells / {len(drows)} rows")
