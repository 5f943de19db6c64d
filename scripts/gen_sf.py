#!/usr/bin/env python3
"""Deterministic sf-scalable twin of the driver's testdata generator
(schema + distributions profiled from /root/testdata/sf0.1 — see
NOTES_r8 §sf1). Used to produce sf1 locally so the bench can measure
the regime where Spark's fixed per-query costs (scan startup, stage
scheduling) amortize; VERDICT r7 item 1.

The driver's own generator is not available, so this twin matches the
sf0.1 tables' schema, key ranges, and value distributions (profiled
with DuckDB) rather than reproducing its exact rows. That is the right
tool for the purpose: BOTH engines (DuckDB baseline and Spark bench)
run on the SAME generated data, so the comparison stays apples-to-
apples at every SF; correctness vs the driver's oracle still runs on
the driver's own sf0.01 data, never on this.

Usage: python3 scripts/gen_sf.py <sf> <outdir>   e.g. gen_sf.py 1 /tmp/graft_sf1
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sf = float(sys.argv[1])
out = sys.argv[2]
rng = np.random.default_rng(42)

import os
os.makedirs(out, exist_ok=True)

N_LI = int(6_000_000 * sf)
N_ORD = int(1_500_000 * sf)
N_CUST = int(150_000 * sf)
N_SUPP = int(10_000 * sf)
N_PART = int(200_000 * sf)
N_EVT = int(1_000_000 * sf)
N_DOC = int(50_000 * sf)
N_EMB = int(20_000 * sf)


def write(name, table):
    pq.write_table(table, f"{out}/{name}.parquet")
    print(name, table.num_rows, flush=True)


def ts_uniform(n, start, end):
    """microsecond timestamps uniform in [start, end) (numpy datetime64 strings)"""
    s = np.datetime64(start, "us").astype(np.int64)
    e = np.datetime64(end, "us").astype(np.int64)
    return rng.integers(s, e, n).astype("datetime64[us]")


# --- region / nation: fixed dims, copied shape from TPC-H ---
regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": regions}))
nations = ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
           "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
           "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
           "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
           "UNITED STATES"]
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": nations,
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

# --- customer ---
ck = np.arange(N_CUST, dtype=np.int64)
write("customer", pa.table({
    "c_custkey": ck,
    "c_name": [f"Customer#{i:09d}" for i in ck],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": pa.array(
        np.array(["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING",
                  "HOUSEHOLD"])[rng.integers(0, 5, N_CUST)])}))

# --- supplier ---
sk = np.arange(N_SUPP, dtype=np.int64)
write("supplier", pa.table({
    "s_suppkey": sk,
    "s_name": [f"Supplier#{i:09d}" for i in sk],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)}))

# --- part ---
adjs = ["large", "hot", "blue", "red", "small", "green", "dim", "bright"]
nouns = ["ring", "bolt", "case", "drum", "plate", "disk", "rod", "cap"]
pk = np.arange(N_PART, dtype=np.int64)
write("part", pa.table({
    "p_partkey": pk,
    "p_name": [f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in pk],
    "p_brand": [f"Brand#{i % 25}" for i in pk],
    "p_type": pa.array(np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD",
                                 "MEDIUM", "PROMO"])[rng.integers(0, 6, N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(900.0 + (pk % 1000) * 0.1, 2)}))

# --- orders ---
ok = np.arange(N_ORD, dtype=np.int64)
write("orders", pa.table({
    "o_orderkey": ok,
    "o_custkey": rng.integers(0, N_CUST, N_ORD),
    "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, N_ORD)]),
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": ts_uniform(N_ORD, "1995-01-01", "2001-12-01"),
    "o_orderpriority": pa.array(
        np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                  "5-LOW"])[rng.integers(0, 5, N_ORD)])}))

# --- lineitem (~4 lines/order like the profiled data) ---
li_ok = rng.integers(0, N_ORD, N_LI)
write("lineitem", pa.table({
    "l_orderkey": li_ok,
    "l_partkey": rng.integers(0, N_PART, N_LI),
    "l_suppkey": rng.integers(0, N_SUPP, N_LI),
    "l_linenumber": pa.array(rng.integers(1, 8, N_LI), pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LI).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LI), 2),
    "l_discount": np.round(rng.integers(0, 9, N_LI) * 0.01, 2),
    "l_tax": np.round(rng.integers(0, 9, N_LI) * 0.01, 2),
    "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, N_LI)]),
    "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, N_LI)]),
    "l_shipdate": ts_uniform(N_LI, "1995-01-01", "2001-12-01")}))

# --- events ---
ev = np.arange(N_EVT, dtype=np.int64)
write("events", pa.table({
    "event_id": ev,
    "ts": np.sort(ts_uniform(N_EVT, "2024-01-01", "2024-01-31")),
    "user_id": rng.integers(0, int(1500 * max(sf * 10, 1)), N_EVT),
    "event_type": pa.array(np.array(["view", "click", "signup", "purchase",
                                     "error"])[rng.integers(0, 5, N_EVT)]),
    "value": np.round(rng.exponential(60.0, N_EVT), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVT)]}))

# --- documents (vocab + length profile from sf0.1; ~0.2% exact dups) ---
vocab = np.array(["spark", "table", "query", "scan", "fast", "slow", "agg",
                  "join", "filter", "group", "sort", "hash", "merge", "data",
                  "row", "column", "key", "value", "line", "part", "order",
                  "small", "big", "batch", "stream", "window", "vector",
                  "a", "the", "and", "of"])
lens = rng.integers(8, 101, N_DOC)
texts = [" ".join(vocab[rng.integers(0, len(vocab), L)]) for L in lens]
for i in range(0, N_DOC, 500):           # plant exact duplicates
    if i + 1 < N_DOC:
        texts[i + 1] = texts[i]
langs = np.array(["en", "zh", "fr", "es", "de"])
lang_col = langs[rng.choice(5, N_DOC, p=[0.41, 0.15, 0.15, 0.15, 0.14])]
write("documents", pa.table({
    "doc_id": np.arange(N_DOC, dtype=np.int64),
    "text": texts,
    "lang": pa.array(lang_col),
    "source": [f"src{i}" for i in rng.integers(0, 20, N_DOC)],
    "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}))

# --- embeddings (unit gaussian vectors, dim 64) ---
V = rng.standard_normal((N_EMB, 64)).astype(np.float32)
V /= np.linalg.norm(V, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": np.arange(N_EMB, dtype=np.int64),
    "embedding": pa.array(list(V), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32())}))
print("done", out, flush=True)
