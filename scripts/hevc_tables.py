#!/usr/bin/env python3
"""HEVC normative-table extraction with provenance (r18) — the
av1_tables.py discipline: every CABAC table the Scala decoder needs is
carved out of the runtime's own codec libraries and cross-checked, so
no value is trusted to memory.

Sources on this runtime:
  /lib/x86_64-linux-gnu/libx265.so.199   (x265 3.5 — HM-style
      per-syntax-element [3][n] init tables in .rodata, one copy per
      internal bit-depth build; all three copies must be byte-identical)
  /lib/x86_64-linux-gnu/libde265.so.0.1.4 (libde265 1.0.11 — CABAC
      engine tables rangeTabLps + transIdxLps)

Cross-checks performed here:
  1. rangeTabLps (spec Table 9-46) byte-identical in BOTH libraries.
  2. x265's three per-bit-depth table copies byte-identical.
  3. Each carved table row is matched against the structurally known
     layout (row widths from the spec's context counts; the B/P/I row
     order is HM's, pinned by the I-row anchor values of
     sig_coeff_flag / coeff_abs_level_greater1 which are reproduced in
     the ITU-T H.265 spec Tables 9-25..9-32).
Functional validation (the real gate) is HevcSpec's differential
sweep: any wrong init value desyncs CABAC within a few bins.

Output: Scala-ready constant arrays (paste into HevcTables.scala).
Slice-type note: HEIC payloads are always I slices (initType 0), so
only the I rows are emitted.
"""
import re
import sys

X265 = '/lib/x86_64-linux-gnu/libx265.so.199'
DE265 = '/lib/x86_64-linux-gnu/libde265.so.0.1.4'

SIG_I = bytes([111, 111, 125, 110, 110, 94, 124, 108, 124])  # spec 9-26 I-row head
LPS0 = bytes([128, 176, 208, 240, 128, 167, 197, 227])       # spec 9-46 rows 0-1
TRANS = bytes([0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12])  # 9-47 head


def main():
    x2 = open(X265, 'rb').read()
    de = open(DE265, 'rb').read()

    # engine tables, cross-library
    lx = [m.start() for m in re.finditer(re.escape(LPS0), x2)]
    ld = [m.start() for m in re.finditer(re.escape(LPS0), de)]
    assert lx and ld, "rangeTabLps anchor missing"
    lps = de[ld[0]:ld[0] + 256]
    for o in lx:
        assert x2[o:o + 256] == lps, "rangeTabLps differs between libs"
    td = [m.start() for m in re.finditer(re.escape(TRANS), de)]
    assert td, "transIdxLps anchor missing in libde265"
    trans = de[td[0]:td[0] + 64]
    assert trans[62] == 38 and trans[63] == 63

    # x265 init-table region: anchor on the sig_coeff_flag B row start
    # (HM layout [3][42], rows B,P,I — the I row is the spec-known one)
    sig_i = [m.start() for m in re.finditer(re.escape(SIG_I), x2)]
    assert len(sig_i) >= 3, "expected >=3 bit-depth copies"
    base = sig_i[0] - 84  # sig_B start
    span = x2[base - 176:base + 360]  # the init-table region proper
    for o in sig_i[1:3]:
        assert x2[o - 84 - 176:o - 84 + 360] == span, \
            "x265 bit-depth copies differ"

    def carve(rel, n):
        return list(x2[base + rel:base + rel + n])

    # relative offsets established by structural carve (see NOTES_r18);
    # each block is [3][n] in B,P,I row order unless noted.
    tables = {
        # residual family
        'SigCoeff': carve(84, 42),            # I row of [3][42]
        'Greater1': carve(-48, 24),           # I row of [3][24]
        'Greater2': carve(-132, 6),           # I row of [3][6]
        'SubBlock': carve(128 + 8, 4),        # sig_cg I row of [3][4]
        'LastPrefix': carve(196, 18),         # last_sig x/y I row [3][18]
        # transform tree / cbf
        'SplitTransform': carve(-162, 3),     # trans_subdiv I row [3][3]
        'CbfLuma': carve(238, 2),             # qt_cbf I row [3][7]: 2 luma
        'CbfChroma': carve(240, 5),           # ... then 5 chroma
        # coding quadtree / intra
        'SplitCu': carve(350, 3),             # split_cu I row [3][4-ish]
        'PartMode': carve(312, 1),            # part_size I row ctx0
        'PrevIntraLuma': carve(295, 1),       # intra_pred I value
        'ChromaPredMode': carve(291, 1),      # chroma_pred I ctx0
        # sao + qp delta
        'SaoMerge': carve(-156, 1),           # sao_merge I (all 153)
        'SaoTypeIdx': carve(-157, 1),         # sao_type I row (=200)
        'CuQpDeltaAbs': carve(248 + 6, 2),    # dqp I row (154,154)
    }
    # sanity pins from the spec tables (I rows)
    assert tables['SplitCu'] == [139, 141, 157], tables['SplitCu']
    assert tables['PartMode'] == [184]
    assert tables['PrevIntraLuma'] == [184]
    assert tables['ChromaPredMode'] == [63]
    assert tables['SaoMerge'] == [153]
    assert tables['SaoTypeIdx'] == [200]
    assert tables['SplitTransform'] == [153, 138, 138]
    assert tables['CbfLuma'] == [111, 141]
    assert tables['CbfChroma'] == [94, 138, 182, 154, 154]
    assert tables['Greater2'] == [138, 153, 136, 167, 152, 152]
    assert tables['SubBlock'] == [91, 171, 134, 141]
    assert tables['CuQpDeltaAbs'] == [154, 154]
    assert tables['LastPrefix'][:4] == [110, 110, 124, 125]

    # deblock beta/tc (spec Tables 8-12) and the 4:2:0 chroma-QP map
    # (Table 8-10) — byte-identical in BOTH libraries (anchored scans)
    beta_a = bytes([6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20])
    bo_de = de.find(beta_a)
    bo_x2 = x2.find(beta_a)
    assert bo_de > 0 and bo_x2 > 0
    beta = list(de[bo_de - 16:bo_de + 36])
    assert beta == list(x2[bo_x2 - 16:bo_x2 + 36]) and len(beta) == 52
    tc_a = bytes([10, 11, 13, 14, 16, 18, 20, 22, 24])
    to_de = de.find(tc_a)
    to_x2 = x2.find(tc_a)
    tc = list(de[to_de - 45:to_de + 9])
    assert tc == list(x2[to_x2 - 45:to_x2 + 9]) and len(tc) == 54
    assert tc[:18] == [0] * 18 and tc[18] == 1
    cq_a = bytes([29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37])
    co = x2.find(cq_a)
    chromaqp = list(x2[co - 30:co + 14])  # qPi 0..43
    assert chromaqp[:30] == list(range(30)) and chromaqp[-1] == 37
    tables['DeblockBeta'] = beta
    tables['DeblockTc'] = tc
    tables['ChromaQpMap'] = chromaqp

    def scala(name, vals, per=14):
        lines = []
        for i in range(0, len(vals), per):
            lines.append(', '.join(str(v) for v in vals[i:i + per]))
        body = (',\n    ').join(lines)
        return f"  val {name}: Array[Int] = Array(\n    {body})"

    print("  // generated by scripts/hevc_tables.py — do not hand-edit")
    for name, vals in tables.items():
        print(scala('init' + name, vals))
    print(scala('RangeTabLps', list(lps), per=16))
    print(scala('TransIdxLps', list(trans), per=16))


if __name__ == '__main__':
    main()
