#!/usr/bin/env python3
"""Brotli (RFC 7932) reference-extraction harness.

Crafts MINIMAL valid brotli streams (one metablock, simple prefix
codes) whose single copy command references a static-dictionary word
under a chosen transform, feeds them to the REFERENCE decoder
(brotlicffi / libbrotli), and reads the transform's effect off the
output. This recovers the RFC Appendix B transform table from the
reference implementation as oracle queries — the same extract-and-pin
discipline as scripts/minhash_reference.py — so the Scala decoder's
hard-coded tables carry reference provenance rather than hand
transcription.

Also re-extracts and sha256-pins the two public data blobs the Scala
side embeds:
  - the 122,784-byte static dictionary (RFC 7932 Appendix A)
  - the 2,048-byte context lookup table (RFC 7932 section 7.1)
both lifted from libbrotlicommon's read-only data (structurally
validated: bucket boundaries / LSB6+MSB6 closed forms).

Usage: brotli_reference.py <out_dir>   (writes dict.bin, ctx.bin,
transforms.tsv, and a set of reference-encoded interop fixtures)
"""
import hashlib
import os
import sys

try:
    import brotlicffi as brotli
except ImportError:  # pragma: no cover
    import brotli

SIZE_BITS = [0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8,
             7, 7, 8, 7, 7, 6, 6, 5, 5]


def find_blob(so_bytes, probe, size):
    i = so_bytes.find(probe)
    assert i >= 0, "probe not found"
    return so_bytes[i:i + size]


def load_common():
    cands = []
    for root, _, fs in os.walk('/root/miniconda'):
        for f in fs:
            if f.startswith('libbrotlicommon.so.1'):
                cands.append(os.path.join(root, f))
    assert cands, "libbrotlicommon not found"
    return open(sorted(cands)[0], 'rb').read()


def extract_dictionary(so):
    # the length-4 bucket famously starts "timedownlifeleftback..."
    dic = find_blob(so, b'timedownlifeleft', 122784)
    # structural checks: bucket offsets land on sane word boundaries
    off = 0
    for length in range(4, 25):
        off += (1 << SIZE_BITS[length]) * length
    assert off == 122784
    return dic


def extract_context_lut(so):
    probe = bytes(i & 63 for i in range(256))
    tbl = find_blob(so, probe, 2048)
    assert all(b == 0 for b in tbl[256:512])          # LSB6 lut1
    assert all(tbl[512 + j] == j >> 2 for j in range(256))  # MSB6 lut0
    return tbl


# ---------------- minimal stream writer ----------------

class Bits:
    def __init__(self):
        self.bits = []

    def w(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


INS_RANGE = [0, 0, 8, 8, 0, 16, 8, 16, 16]
CPY_RANGE = [0, 8, 0, 8, 16, 0, 16, 8, 16]
INSERT_CODES = [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 1),
                (8, 1), (10, 2), (14, 2), (18, 3), (26, 3), (34, 4),
                (50, 4), (66, 5), (98, 5), (130, 6), (194, 7), (322, 8),
                (578, 9), (1090, 10), (2114, 12), (6210, 14), (22594, 24)]
COPY_CODES = [(2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0), (8, 0),
              (9, 0), (10, 1), (12, 1), (14, 2), (18, 2), (22, 3),
              (30, 3), (38, 4), (54, 4), (70, 5), (102, 5), (134, 6),
              (198, 7), (326, 8), (582, 9), (1094, 10), (2118, 24)]


def len_code(table, v):
    for i in range(len(table) - 1, -1, -1):
        off, eb = table[i]
        if v >= off and v < off + (1 << eb):
            return i, v - off, eb
    raise ValueError(v)


def iac_symbol(ins, cpy, implicit):
    ic, ie, ieb = len_code(INSERT_CODES, ins)
    cc, ce, ceb = len_code(COPY_CODES, cpy)
    grids = [(INS_RANGE[g], CPY_RANGE[g]) for g in range(9)]
    g = grids.index((ic & ~7, cc & ~7))
    if implicit:
        assert g in (0, 1), "implicit distance needs insert<8, copy<16"
        cell = g
    else:
        cell = g + 2
    return (cell << 6) | ((ic & 7) << 3) | (cc & 7), (ie, ieb), (ce, ceb)


def dist_code(distance):
    # NPOSTFIX=0, NDIRECT=0: distance = offset + dextra + 1
    for h in range(48):
        n = 1 + (h >> 1)
        base = ((2 + (h & 1)) << n) - 4 + 1
        if base <= distance < base + (1 << n):
            return 16 + h, distance - base, n
    raise ValueError(distance)


def simple_code(b, alphabet_bits, symbols):
    """NSYM=1 or 2 simple prefix code."""
    b.w(1, 2)                     # simple
    b.w(len(symbols) - 1, 2)      # NSYM-1
    for s in sorted(symbols):
        b.w(s, alphabet_bits)


def craft(word_len, address, out_len, mlen, pad_lit=ord('X')):
    """out_len: transformed-word length hypothesis; mlen = out_len + pad."""
    b = Bits()
    b.w(0, 1)                     # WBITS = 16
    b.w(1, 1)                     # ISLAST
    b.w(0, 1)                     # ISLASTEMPTY
    b.w(0, 2)                     # MNIBBLES -> 4 nibbles
    b.w(mlen - 1, 16)
    for _ in range(3):
        b.w(0, 1)                 # one block type each
    b.w(0, 2)                     # NPOSTFIX 0
    b.w(0, 4)                     # NDIRECT 0
    b.w(0, 2)                     # context mode LSB6
    b.w(0, 1)                     # NTREESL 1
    b.w(0, 1)                     # NTREESD 1
    pad = mlen - out_len
    s1, (i1e, i1eb), (c1e, c1eb) = iac_symbol(0, word_len, implicit=False)
    syms = [s1]
    s2 = None
    if pad > 0:
        s2, (i2e, i2eb), (c2e, c2eb) = iac_symbol(pad, 2, implicit=True)
        if s2 != s1:
            syms.append(s2)
    simple_code(b, 8, [pad_lit])          # literal code
    simple_code(b, 10, syms)              # IAC code
    dcode, dextra, dbits = dist_code(1 + address)
    simple_code(b, 6, [dcode])            # distance code
    # command 1: dictionary copy
    if len(syms) == 2:
        b.w(0 if min(syms) == s1 else 1, 1)
    b.w(i1e, i1eb)
    b.w(c1e, c1eb)
    b.w(dextra, dbits)                    # distance symbol is 0-bit
    # command 2: pad literals, copy ignored at mlen
    if pad > 0:
        if len(syms) == 2:
            b.w(0 if min(syms) == s2 else 1, 1)
        b.w(i2e, i2eb)
        b.w(c2e, c2eb)
        # pad literals: 0 bits each (single-symbol code)
    return b.bytes()


def dict_ref_output(word_len, address):
    """Reference decode of a (word_len, address) dictionary reference;
    sweeps the transformed length. Returns the transformed bytes."""
    for out_len in range(0, 40 + word_len):
        for extra_pad in (1, 2):
            mlen = out_len + extra_pad
            try:
                out = brotli.decompress(craft(word_len, address, out_len, mlen))
            except Exception:
                continue
            if len(out) == mlen and out.endswith(b'X' * extra_pad):
                return out[:out_len]
    raise RuntimeError(f"no decode for len={word_len} addr={address}")


def word(dic, length, index):
    off = 0
    for l in range(4, length):
        off += (1 << SIZE_BITS[l]) * l
    return dic[off + index * length: off + (index + 1) * length]


def classify(w, out):
    """Derive (prefix, op, suffix) for transform output `out` of word w."""
    ops = [('Identity', lambda x: x)]
    ops += [(f'OmitFirst{k}', lambda x, k=k: x[k:]) for k in range(1, 10)]
    ops += [(f'OmitLast{k}', lambda x, k=k: x[:-k]) for k in range(1, 10)]

    def ferment(x, pos):
        # uppercase transform at byte pos per RFC 8: ASCII toupper;
        # multi-byte sequences xor'd — handled only for ASCII here,
        # fine for the probe words chosen
        b = bytearray(x)
        if b[pos] >= 97 and b[pos] <= 122:
            b[pos] ^= 32
        return bytes(b), (2 if b[pos] >= 0xc0 else (1 if b[pos] < 0x80 else 2))

    def ferment_first(x):
        if not x:
            return x
        return ferment(x, 0)[0]

    def ferment_all(x):
        b = bytearray(x)
        i = 0
        while i < len(b):
            if 97 <= b[i] <= 122:
                b[i] ^= 32
                i += 1
            elif b[i] < 0x80:
                i += 1
            elif b[i] < 0xe0:
                b[i + 1] ^= 0x20
                i += 2
            else:
                b[i + 2] ^= 0x05
                i += 3
        return bytes(b)

    ops += [('FermentFirst', ferment_first), ('FermentAll', ferment_all)]
    hits = []
    for name, f in ops:
        core = f(w)
        if core and core in out:
            i = out.find(core)
            while i >= 0:
                hits.append((out[:i], name, out[i + len(core):]))
                i = out.find(core, i + 1)
        elif core == b'' and b'' == core:
            pass
    # prefer the shortest prefix+suffix, Identity first
    hits.sort(key=lambda h: (len(h[0]) + len(h[2]),
                             0 if h[1] == 'Identity' else 1))
    return hits


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/brotli_ref'
    os.makedirs(out_dir, exist_ok=True)
    so = load_common()
    dic = extract_dictionary(so)
    ctx = extract_context_lut(so)
    open(os.path.join(out_dir, 'dict.bin'), 'wb').write(dic)
    open(os.path.join(out_dir, 'ctx.bin'), 'wb').write(ctx)
    print('dict sha256', hashlib.sha256(dic).hexdigest())
    print('ctx  sha256', hashlib.sha256(ctx).hexdigest())

    # probe words: a long distinct-letter word, a 4-letter word, and a
    # multi-byte UTF-8 word (the Devanagari tail of the len-24 bucket)
    # so the Ferment ops' UTF-8 arithmetic is pinned too
    nw = {L: 1 << SIZE_BITS[L] for L in range(4, 25)}
    probes = [(24, 0), (4, 0), (24, nw[24] - 1), (5, 1)]
    rows = []
    outputs = {}
    for t in range(121):
        outs = {}
        for (L, idx) in probes:
            o = dict_ref_output(L, t * nw[L] + idx)
            outs[f"{L}_{idx}"] = o.hex()
        outputs[t] = outs
        h24 = classify(word(dic, 24, 0), bytes.fromhex(outs["24_0"]))
        h4 = classify(word(dic, 4, 0), bytes.fromhex(outs["4_0"]))
        both = [a for a in h24 for b in h4
                if a[0] == b[0] and a[2] == b[2] and
                (a[1] == b[1] or
                 a[1].startswith('Omit') and b[1].startswith(a[1][:8]))]
        pick = both[0] if both else h24[0]
        rows.append((t, pick[0], pick[1], pick[2]))
    import json
    meta = {
        'dict_sha256': hashlib.sha256(dic).hexdigest(),
        'ctx_sha256': hashlib.sha256(ctx).hexdigest(),
        'probes': [[L, i] for (L, i) in probes],
        'transform_outputs': outputs,
        'transforms': [[t, pre.decode('latin1'), op, suf.decode('latin1')]
                       for (t, pre, op, suf) in rows],
    }
    json.dump(meta, open(os.path.join(out_dir, 'brotli_golden.json'), 'w'),
              indent=0)

    # Scala table for operators/Brotli.scala
    opcode = {'Identity': 0, 'FermentFirst': 10, 'FermentAll': 11}
    for k in range(1, 10):
        opcode[f'OmitFirst{k}'] = 11 + k
        opcode[f'OmitLast{k}'] = k
    with open(os.path.join(out_dir, 'transforms_scala.txt'), 'w') as f:
        for (t, pre, op, suf) in rows:
            def esc(bs):
                return ''.join(
                    c if 0x20 <= ord(c) < 0x7f and c not in '\\"' else
                    '\\u%04x' % ord(c) for c in bs.decode('latin1'))
            f.write('    T("%s", %d, "%s"),\n' % (esc(pre), opcode[op], esc(suf)))

    # reference-encoded interop fixtures: deterministic payloads
    def payload(kind, n):
        if kind == 'text':
            words = ['the', 'time', 'data', 'information', 'people', 'work',
                     'about', 'which', 'their', 'other']
            return (' '.join(words[(i * 7 + i // 11) % 10]
                             for i in range(n)) + '\n').encode()
        if kind == 'html':
            return (''.join('<div class="c%d"><a href="http://example.com/p%d">'
                            'item %d</a></div>\n' % (i % 17, i, i)
                            for i in range(n))).encode()
        if kind == 'utf8':
            return (('\u0939\u093f\u0928\u094d\u0926\u0940 abc ' * n)).encode()
        if kind == 'bin':
            import random as _r
            r = _r.Random(42)
            return bytes(r.randrange(256) for _ in range(n))
        raise ValueError(kind)
    fx = {}
    # text/40000 at small windows spans MULTIPLE metablocks — the
    # cross-metablock distance-ring persistence pin
    for kind, n in [('text', 400), ('text', 4000), ('text', 40000),
                    ('html', 120), ('utf8', 60), ('bin', 3000)]:
        data = payload(kind, n)
        for q in (1, 5, 9, 11):
            for w in (10, 16, 22):
                comp = brotli.compress(data, quality=q, lgwin=w)
                assert brotli.decompress(comp) == data
                fx[f"{kind}{n}_q{q}_w{w}"] = {
                    'payload_sha256': hashlib.sha256(data).hexdigest(),
                    'kind': kind, 'n': n, 'stream': comp.hex()}
    json.dump(fx, open(os.path.join(out_dir, 'brotli_streams.json'), 'w'),
              indent=0)
    print('fixtures:', len(fx))


if __name__ == '__main__':
    main()
