#!/usr/bin/env python3
"""Independent fixture-oracle generator for the four owned-hash-family
queries that cannot be expressed as DuckDB SQL (VERDICT r4 item 4):

  e_fingerprint       (doc_id, fp64)
  e_simhash_neardup   (d1, d2, hamming)
  e02_minhash_pairs   (d1, d2, est_jaccard)
  e_ann_lsh           (id1, id2, sim)

This file is the SECOND implementation (the first is TextFunctions.scala /
AnnLsh.scala / CosineSimilarity.scala): it recomputes every query's full
expected output at each scale factor from the raw parquet inputs, using
only the published algorithm spec (see minhash_reference.py, whose
committed golden vectors pin the hash family across both languages).
Outputs land in /root/repo/fixtures/<sf>/<query>.parquet; the engine-side
queries full-outer-join against them so the driver's rows/schema/hash gate
runs end-to-end (oracle SQL = SELECT the fixture).

Determinism notes:
- all hash arithmetic is exact integer math (64-bit wrapping emulated);
- cosine similarity and LSH plane dot products replicate the Scala
  SEQUENTIAL double accumulation order element by element, so doubles are
  bit-identical (Python float == IEEE 754 binary64 == JVM double);
- documents.text is ASCII (asserted by PlanSpec), so Python code points ==
  JVM UTF-16 code units.

Usage: python3 scripts/fixture_oracle.py [sf ...]   (default: all three)
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

MASK = (1 << 64) - 1
P = (1 << 61) - 1
TESTDATA = "/root/testdata"
OUT_ROOT = "/root/repo/fixtures"


def to_signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


def fnv1a64(s):
    h = 0xcbf29ce484222325
    for ch in s:
        h ^= ord(ch)
        h = (h * 0x100000001b3) & MASK
    return h


def splitmix64(seed):
    z = (seed + 0x9e3779b97f4a7c15) & MASK
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) & MASK
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) & MASK
    return z ^ (z >> 31)


def jabs(x):  # Java Long.abs on the signed view (MinValue fixed point)
    s = to_signed(x)
    return abs(s) & MASK


def hash_params(k):
    out = []
    for i in range(k):
        a = (jabs(splitmix64(2 * i + 1)) % (P - 1)) + 1
        b = jabs(splitmix64(2 * i + 2)) % P
        out.append((a, b))
    return out


def norm_ws(text):
    import re
    return re.sub(r"\s+", " ", text.lower()).strip()


def shingles(text, k=5):
    norm = norm_ws(text)
    if len(norm) < k:
        return [norm]
    return [norm[i:i + k] for i in range(len(norm) - k + 1)]


PARAMS128 = hash_params(128)


def minhash128(text):
    sig = [(1 << 63) - 1] * 128
    xs = {fnv1a64(sh) & ((1 << 63) - 1) for sh in shingles(text)}
    for x in xs:
        for i, (a, b) in enumerate(PARAMS128):
            hx = ((a * x) % P + b) % P
            if hx < sig[i]:
                sig[i] = hx
    return sig


def simhash64(text):
    counts = [0] * 64
    for tok in text.lower().split():
        h = fnv1a64(tok)
        for b in range(64):
            counts[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if counts[b] > 0:
            out |= 1 << b
    return out  # unsigned view; sign only matters at serialization


def fingerprint64(text):
    h = 0
    for ch in norm_ws(text):
        h = (h * 257 + ord(ch)) & MASK
    return to_signed(h)


# --- e_ann_lsh plane family (AnnLsh.scala) -------------------------------

def plane(t, b, d):
    seed = ((((t * 1031 + b) & MASK) * 8209 + d) & MASK) * 13007 + 17
    h = splitmix64(seed & MASK)
    return (h >> 11) / float(1 << 52) - 1.0


def plane_matrix(dim, tables, bits):
    return [[[plane(t, b, d) for d in range(dim)] for b in range(bits)]
            for t in range(tables)]


def buckets_of(emb, planes):
    out = []
    for table in planes:
        bucket = 0
        for b, p in enumerate(table):
            dot = 0.0
            for d in range(min(len(p), len(emb))):
                dot += float(emb[d]) * p[d]  # same sequential order as Scala
            if dot >= 0:
                bucket |= 1 << b
        out.append(bucket)
    return out


def cosine(x, y):
    dot = 0.0
    nx = 0.0
    ny = 0.0
    for i in range(min(len(x), len(y))):
        xi = float(x[i])
        yi = float(y[i])
        dot += xi * yi
        nx += xi * xi
        ny += yi * yi
    if nx == 0.0 or ny == 0.0:
        return None
    import math
    return dot / (math.sqrt(nx) * math.sqrt(ny))


def popcount(x):
    return bin(x).count("1")


def write(sf, name, table):
    d = os.path.join(OUT_ROOT, sf)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, name + ".parquet"))
    print(f"[fixture] {sf}/{name}: {table.num_rows} rows")


def gen(sf):
    docs = pq.read_table(f"{TESTDATA}/{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    embs = pq.read_table(f"{TESTDATA}/{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).to_pylist()

    # e_fingerprint
    fps = sorted((r["doc_id"], fingerprint64(r["text"])) for r in docs)
    write(sf, "e_fingerprint", pa.table(
        {"doc_id": pa.array([a for a, _ in fps], pa.int64()),
         "fp64": pa.array([b for _, b in fps], pa.int64())}))

    # e_simhash_neardup: 4x16-bit band buckets, hamming <= 6
    sigs = {r["doc_id"]: simhash64(r["text"]) for r in docs}
    buckets = {}
    for did, sig in sigs.items():
        for band in range(4):
            buckets.setdefault((band, (sig >> (band * 16)) & 0xFFFF),
                               []).append(did)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    rows = sorted((d1, d2, popcount(sigs[d1] ^ sigs[d2]))
                  for d1, d2 in pairs
                  if popcount(sigs[d1] ^ sigs[d2]) <= 6)
    write(sf, "e_simhash_neardup", pa.table(
        {"d1": pa.array([r[0] for r in rows], pa.int64()),
         "d2": pa.array([r[1] for r in rows], pa.int64()),
         "hamming": pa.array([r[2] for r in rows], pa.int32())}))

    # e02_minhash_pairs: 32 bands of 4, est_jaccard >= 0.5
    msigs = {r["doc_id"]: minhash128(r["text"]) for r in docs}
    mbuckets = {}
    for did, sig in msigs.items():
        for band in range(32):
            mbuckets.setdefault((band, tuple(sig[band * 4:band * 4 + 4])),
                                []).append(did)
    mpairs = set()
    for ids in mbuckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                mpairs.add((ids[i], ids[j]))
    mrows = []
    for d1, d2 in sorted(mpairs):
        eq = sum(1 for a, b in zip(msigs[d1], msigs[d2]) if a == b)
        est = eq / 128.0  # exact: k/128 is a dyadic rational
        if est >= 0.5:
            mrows.append((d1, d2, est))
    write(sf, "e02_minhash_pairs", pa.table(
        {"d1": pa.array([r[0] for r in mrows], pa.int64()),
         "d2": pa.array([r[1] for r in mrows], pa.int64()),
         "est_jaccard": pa.array([r[2] for r in mrows], pa.float64())}))

    # e38_incremental_dedup: new batch (top 20% of ids) vs earlier docs
    # (partner = any id < n: historical OR earlier within the batch).
    # d15_stream_dedup: same batch vs the STATIC historical index only
    # (partner = any id < thr) — the streaming twin's semantics, where
    # within-batch resolution is left to the e38 compaction.
    # Exact path: min eligible doc with identical text. Near path: e02's
    # band buckets, but only pairs with the NEW doc on the right; best
    # partner = (max est_jaccard, then min id), est >= 0.5. Exact wins.
    max_id = max(r["doc_id"] for r in docs)
    thr = (max_id + 1) * 4 // 5
    texts = {r["doc_id"]: r["text"] for r in docs}
    by_text = {}
    for did in sorted(texts):
        by_text.setdefault(texts[did], []).append(did)

    def incr_verdicts(eligible):
        exact = {}
        for n in (d for d in sorted(texts) if d >= thr):
            earlier = [d for d in by_text[texts[n]] if eligible(d, n)]
            if earlier:
                exact[n] = earlier[0]
        cand = {}
        for ids in mbuckets.values():
            for n in (i for i in ids if i >= thr):
                for p in ids:
                    if eligible(p, n):
                        cand.setdefault(n, set()).add(p)
        near = {}
        for n, ps in cand.items():
            best = None
            for p in ps:
                eq = sum(1 for a, b in zip(msigs[n], msigs[p]) if a == b)
                est = eq / 128.0
                if est >= 0.5 and (best is None or (est, -p) > (best[1], -best[0])):
                    best = (p, est)
            if best is not None:
                near[n] = best
        rows = []
        for n in (d for d in sorted(texts) if d >= thr):
            if n in exact:
                rows.append((n, "exact", exact[n], None))
            elif n in near:
                rows.append((n, "near", near[n][0], near[n][1]))
            else:
                rows.append((n, "unique", None, None))
        return rows

    for name, rows in (
            ("e38_incremental_dedup", incr_verdicts(lambda p, n: p < n)),
            ("d15_stream_dedup", incr_verdicts(lambda p, n: p < thr))):
        write(sf, name, pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "status": pa.array([r[1] for r in rows], pa.string()),
             "partner": pa.array([r[2] for r in rows], pa.int64()),
             "est_jaccard": pa.array([r[3] for r in rows], pa.float64())}))

    # e_ann_lsh: 8 tables x 12-bit hyperplane buckets, sim >= 0.3
    planes = plane_matrix(64, 8, 12)
    vecs = {r["vec_id"]: r["embedding"] for r in embs}
    lbuckets = {}
    for vid, emb in vecs.items():
        for t, bkt in enumerate(buckets_of(emb, planes)):
            lbuckets.setdefault((t, bkt), []).append(vid)
    lpairs = set()
    for ids in lbuckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                lpairs.add((ids[i], ids[j]))
    lrows = []
    for i1, i2 in sorted(lpairs):
        sim = cosine(vecs[i1], vecs[i2])
        if sim is not None and sim >= 0.3:
            lrows.append((i1, i2, sim))
    write(sf, "e_ann_lsh", pa.table(
        {"id1": pa.array([r[0] for r in lrows], pa.int64()),
         "id2": pa.array([r[1] for r in lrows], pa.int64()),
         "sim": pa.array([r[2] for r in lrows], pa.float64())}))


if __name__ == "__main__":
    for sf in (sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"]):
        gen(sf)
