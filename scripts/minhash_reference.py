#!/usr/bin/env python3
"""Independent reference implementation of graft's owned text-sketch hash
family (TextFunctions.scala), per SURVEY.md §5.2 GOLDEN provenance: the
MinHash/SimHash determinism claim is "two implementations in different
languages produce identical sketches". This file is the second
implementation; src/test/resources/golden/minhash_golden.json is its
committed output, asserted by TextGoldenSpec.

Spec being implemented (must match TextFunctions.scala exactly):
- fnv1a64 over UTF-16 code units, 64-bit wrapping
- splitmix64(seed) parameter derivation; a_i,b_i over Mersenne prime 2^61-1
- shingles: lowercase, whitespace collapsed to single space, k=5 sliding
- minhash: 128 permutations h_i(x) = (a_i*x + b_i) mod p over
  fnv1a64(shingle) & Long.MaxValue
- simhash64: per-token fnv1a64 bit voting
- fingerprint64: polynomial rolling hash base 257 over normalized text
"""
import json, re, sys

MASK = (1 << 64) - 1
P = (1 << 61) - 1

def fnv1a64(s):
    h = 0xcbf29ce484222325
    for ch in s:
        h ^= ord(ch)
        h = (h * 0x100000001b3) & MASK
    return h

def to_signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x

def splitmix64(seed):
    z = (seed + 0x9e3779b97f4a7c15) & MASK
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) & MASK
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) & MASK
    return z ^ (z >> 31)

def jabs(x):  # Java Long .abs semantics on signed 64-bit
    s = to_signed(x)
    return abs(s) & MASK  # Long.MinValue.abs stays MinValue, like Java

def hash_params(k):
    out = []
    for i in range(k):
        a = (jabs(splitmix64(2 * i + 1)) % (P - 1)) + 1
        b = jabs(splitmix64(2 * i + 2)) % P
        out.append((a, b))
    return out

def shingles(text, k):
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    if len(norm) < k:
        return [norm]
    return [norm[i:i + k] for i in range(len(norm) - k + 1)]

def minhash(text, num_perm=128, shingle_k=5):
    params = hash_params(num_perm)
    sig = [(1 << 63) - 1] * num_perm
    for sh in shingles(text, shingle_k):
        x = fnv1a64(sh) & ((1 << 63) - 1)
        for i, (a, b) in enumerate(params):
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
    return to_signed(out)

def fingerprint64(text):
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    h = 0
    for ch in norm:
        h = (h * 257 + ord(ch)) & MASK
    return to_signed(h)

FIXTURES = [
    "the quick brown fox jumps over the lazy dog",
    "spark makes distributed dataframes fast and reliable",
    "Key Agg Row  Scan slow FAST table",
]

if __name__ == "__main__":
    out = []
    for t in FIXTURES:
        out.append({
            "text": t,
            "fnv1a64": to_signed(fnv1a64(t)),
            "minhash_first16": [to_signed(v) for v in minhash(t)[:16]],
            "simhash64": simhash64(t),
            "fingerprint64": fingerprint64(t),
        })
    json.dump(out, sys.stdout, indent=1)
