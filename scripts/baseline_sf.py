#!/usr/bin/env python3
"""DuckDB baseline at an arbitrary SF dir — the BASELINE.md protocol
(duckdb, 8 threads, min of 3 after 1 warm-up, result fully fetched)
run verbatim over B1-B10 so sf1 numbers use the SAME measurement rules
as the committed sf0.1 baseline. VERDICT r7 item 1.

Usage: python3 scripts/baseline_sf.py [sf_dir] [n_timed_rounds]

With n_timed_rounds given, runs that many timed rounds (after the same
1 warm-up) and reports min over them — the single-round form (n=1) is
what Bench.scala invokes repeatedly to INTERLEAVE DuckDB measurement
rounds with its own Spark rounds, so both engines see the same machine
load window (VERDICT r9 item 2a).
"""
import sys, time, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
con = duckdb.connect()
con.execute("SET threads TO 8")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

QUERIES = {  # BASELINE.md "Exact query texts", verbatim
    "B1": """SELECT l_returnflag, l_linestatus, sum(l_quantity), sum(l_extendedprice),
       sum(l_extendedprice*(1-l_discount)), avg(l_quantity), avg(l_discount), count(*)
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-09-01'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "B2": """SELECT c_mktsegment, count(DISTINCT o_orderkey), sum(l_extendedprice*(1-l_discount))
FROM customer JOIN orders ON c_custkey=o_custkey JOIN lineitem ON l_orderkey=o_orderkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "B3": """SELECT * FROM (SELECT n_name, c_name, c_acctbal,
  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) rn
  FROM customer JOIN nation ON c_nationkey=n_nationkey) WHERE rn<=3 ORDER BY n_name, rn""",
    "B4": """SELECT n_name, o_orderstatus, count(*), sum(o_totalprice)
FROM orders JOIN customer ON o_custkey=c_custkey JOIN nation ON c_nationkey=n_nationkey
GROUP BY ROLLUP(n_name, o_orderstatus) ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",
    "B5": """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "B6": """SELECT date_trunc('hour', ts) w, event_type, count(*), sum(value),
       sum(CAST(json_extract(props,'$.k') AS BIGINT))
FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "B7": """SELECT lang, count(DISTINCT source), avg(length(text)), max(upper(substr(text,1,8)))
FROM documents GROUP BY lang ORDER BY lang""",
    "B8": """SELECT count(*) FROM part WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_discount>0.05)
  AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_tax>0.07)""",
    "B9": """WITH q AS (SELECT embedding e FROM embeddings WHERE vec_id=0)
SELECT vec_id, list_sum(list_transform(list_zip(embedding, (SELECT e FROM q)), x -> x[1]*x[2]))
  / (sqrt(list_sum(list_transform(embedding, x->x*x))) * (SELECT sqrt(list_sum(list_transform(e, x->x*x))) FROM q)) sim
FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10""",
    "B10": """SELECT count(*) FROM (SELECT DISTINCT ON (text) doc_id, text FROM documents)""",
}

out = {}
for bid, sql in QUERIES.items():
    con.execute(sql).fetchall()          # warm-up
    times = []
    for _ in range(n_rounds):
        t0 = time.time()
        con.execute(sql).fetchall()
        times.append(time.time() - t0)
    out[bid] = round(min(times), 4)
print(json.dumps({"sf_dir": sf_dir, "threads": 8,
                  "protocol": f"min of {n_rounds} after 1 warm-up, fetchall",
                  "sec": out}))
