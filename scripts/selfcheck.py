#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (SURVEY.md §5.2).

Usage: python3 scripts/selfcheck.py [verify_out_dir] [sf_dir]

Reads Verify.scala's output (<name>.parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf tables, sorts columns by
name (the driver does this before hashing), and compares cell-by-cell.
Reports exact-match status and max float deviation per query.
"""
import sys, os, json, glob, math, struct
from decimal import Decimal
import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def cmp_cell(a, b):
    """-> (exact, absdiff or None).

    TYPE-AWARE: the driver hashes raw pandas bytes, so int vs float vs
    Decimal with equal values are DIFFERENT (this is exactly what bit us in
    round 1: DuckDB sum(int)->Decimal vs Spark LONG, floor()->DOUBLE vs
    LONG — selfcheck's == said equal, the driver's hash said no). Floats
    compare bitwise so -0.0 != 0.0 and ulp drift is caught.
    """
    a, b = norm(a), norm(b)
    if type(a) is not type(b):
        return False, (abs(float(a) - float(b))
                       if isinstance(a, (int, float, Decimal))
                       and isinstance(b, (int, float, Decimal)) else None)
    if isinstance(a, float):
        if struct.pack('>d', a) == struct.pack('>d', b):
            return True, 0.0
        if math.isnan(a) and math.isnan(b):
            return True, 0.0
        return False, abs(a - b)
    if isinstance(a, tuple):
        if len(a) != len(b):
            return False, None
        ex, mx = True, 0.0
        for x, y in zip(a, b):
            e, d = cmp_cell(x, y)
            ex = ex and e
            if d is None and not e:
                return False, None
            mx = max(mx, d or 0.0)
        return ex, mx
    return (a == b), None

n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        print(f"FAIL {name}: no spark result dir")
        n_fail += 1
        continue
    try:
        duck = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        n_fail += 1
        continue
    spark = con.execute(
        f"SELECT * FROM read_parquet('{res_path}/*.parquet')").fetch_arrow_table()
    dcols, scols = sorted(duck.column_names), sorted(spark.column_names)
    if dcols != scols:
        print(f"FAIL {name}: column mismatch duck={dcols} spark={scols}")
        n_fail += 1
        continue
    if duck.num_rows != spark.num_rows:
        print(f"FAIL {name}: rows duck={duck.num_rows} spark={spark.num_rows}")
        n_fail += 1
        continue
    def rowkey(r):
        # order-insensitive compare (the driver sorts rows before hashing):
        # type-tagged canonical key, floats bitwise so -0.0 sorts apart
        def k(v):
            if isinstance(v, float):
                return 'f' + struct.pack('>d', v).hex()
            return type(v).__name__ + repr(v)
        return [k(norm(r[c])) for c in dcols]
    drows = sorted(duck.select(dcols).to_pylist(), key=rowkey)
    srows = sorted(spark.select(scols).to_pylist(), key=rowkey)
    bad = 0
    maxdiff = 0.0
    first_bad = None
    for i, (dr, sr) in enumerate(zip(drows, srows)):
        for c in dcols:
            ex, diff = cmp_cell(dr[c], sr[c])
            if not ex:
                bad += 1
                if diff is not None:
                    maxdiff = max(maxdiff, diff)
                if first_bad is None:
                    first_bad = (i, c, dr[c], sr[c])
    if bad == 0:
        print(f"PASS {name}: {duck.num_rows} rows exact")
        n_pass += 1
    else:
        print(f"FAIL {name}: {bad} bad cells, maxdiff={maxdiff:.3e}, first={first_bad}")
        n_fail += 1

print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
