#!/usr/bin/env python3
"""Symbol-faithful python twin of Av1Msac + the intra block-header and
coefficient chain (r18 drill tooling; found the FiToDir and tall-ctx
bugs, and drives state-continuation experiments via the scala
GRAFT_AV1_STATEDUMP hook).
Ports Av1Msac + the intra block-header + coefficient chain for the
specific stream shape: single tile, 64-SB, first partition
split_or_vert at (0,0), one 32x64 SMOOTH/DC block, mono or 420.
Prints every symbol with bit-level state.
"""
import json, struct, sys

BIN = '/root/repo/src/main/resources/graft/av1_default_cdfs.bin'

def load_tabs():
    tabs = {}
    lines = open(BIN, 'rb').read().decode('ascii').split('\n')
    assert lines[0] == 'AV1CDF1'
    i = 1
    while lines[i] != 'END':
        name = lines[i]
        dims = [int(x) for x in lines[i+1].split(',')]
        symsline = lines[i+2]
        hexs = lines[i+3]
        data = [int(hexs[j*4:j*4+2], 16) | (int(hexs[j*4+2:j*4+4], 16) << 8)
                for j in range(len(hexs)//4)]
        nrows = 1
        for d in dims:
            nrows *= d
        if symsline.startswith('v:'):
            syms = [int(x) for x in symsline[2:].split(',')]
        else:
            syms = [int(symsline)] * nrows
        tabs[name] = (dims, syms, data)
        i += 4
    return tabs

TABS = load_tabs()

def rows(name):
    dims, syms, data = TABS[name]
    out = []
    off = 0
    for r in range(len(syms)):
        n = syms[r] - 1
        out.append(data[off:off+n] + [0])
        off += n
    return out

def qrows(name, qctx):
    a = rows(name)
    per = len(a) // 4
    return a[qctx*per:(qctx+1)*per]

MASK64 = (1 << 64) - 1

class Msac:
    def __init__(self, buf, log=True):
        self.buf = buf
        self.pos = 0
        self.end = len(buf)
        self.dif = (1 << 63) - 1
        self.rng = 0x8000
        self.cnt = -15
        self.log = log
        self.nsym = 0
        self.refill()

    def refill(self):
        c = 64 - self.cnt - 24
        while True:
            if self.pos >= self.end:
                self.dif |= (~((~0xff) << c)) & MASK64
                self.cnt = 0x4000
                return
            self.dif ^= (self.buf[self.pos] & 0xff) << c
            self.pos += 1
            c -= 8
            if c < 0:
                break
        self.cnt = 64 - c - 24

    def norm(self, dif, rng):
        d = 15 - (rng.bit_length() - 1)
        self.cnt -= d
        self.dif = (((dif + 1) << d) - 1) & MASK64
        self.rng = (rng << d) & 0xffff
        if self.cnt < 0:
            self.refill()

    def symbol(self, cdf, n, label=''):
        c = self.dif >> 48
        r8 = self.rng >> 8
        v = self.rng
        ret = -1
        while True:
            ret += 1
            u = v
            v = ((r8 * (cdf[ret] >> 6)) >> 1) + 4 * (n - 1 - ret)
            if c >= v:
                break
        self.norm(self.dif - ((v << 48) & MASK64), u - v)
        self.update(cdf, ret, n)
        self.nsym += 1
        if self.log:
            print(f"  [{self.nsym:3d}] {label:28s} -> {ret}   "
                  f"(pos={self.pos} rng={self.rng:04x})")
        return ret

    def update(self, cdf, sym, n):
        count = cdf[n-1]
        rate = 4 + (count >> 4) + (1 if n > 3 else 0)
        for i in range(n-1):
            if i < sym:
                cdf[i] += (32768 - cdf[i]) >> rate
            else:
                cdf[i] -= cdf[i] >> rate
        cdf[n-1] = count + (1 if count < 32 else 0)

    def boolp(self, f, label=''):
        c = self.dif >> 48
        v = (((self.rng >> 8) * (f >> 6)) >> 1) + 4
        if c < v:
            self.norm(self.dif, v)
            ret = True
        else:
            self.norm(self.dif - ((v << 48) & MASK64), self.rng - v)
            ret = False
        self.nsym += 1
        if self.log:
            print(f"  [{self.nsym:3d}] {label:28s} -> {ret} (f={f})")
        return ret

    def bool_(self, cdf, label=''):
        return self.symbol(cdf, 2, label) == 1

    def equi(self):
        return self.boolp_quiet(16384)

    def boolp_quiet(self, f):
        c = self.dif >> 48
        v = (((self.rng >> 8) * (f >> 6)) >> 1) + 4
        if c < v:
            self.norm(self.dif, v)
            return True
        self.norm(self.dif - ((v << 48) & MASK64), self.rng - v)
        return False

    def literal(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | (1 if self.equi() else 0)
        return v

    def golomb(self):
        length = 0
        while not self.equi() and length < 32:
            length += 1
        x = 1
        for _ in range(length):
            x = (x << 1) | (1 if self.equi() else 0)
        return x - 1

def diag_scan(w, h):
    # exact port of Av1Tables.diagScan
    out = []
    for dd in range(w + h - 1):
        rlo = max(0, dd - w + 1)
        rhi = min(h - 1, dd)
        bottom_up = (w == h and dd % 2 == 0) or w > h
        rng_ = range(rhi, rlo - 1, -1) if bottom_up else range(rlo, rhi + 1)
        out += [r * w + (dd - r) for r in rng_]
    return out

def main():
    path = sys.argv[1]
    qctx = int(sys.argv[2])
    mono = sys.argv[3] == 'mono'
    d = json.loads(open(path).read())
    payload = bytes.fromhex(d['payload'])
    i = 0
    tile = None
    while i < len(payload):
        hdr = payload[i]
        ot = (hdr >> 3) & 15
        he = (hdr >> 2) & 1
        j = i + 1 + he
        size = 0
        shift = 0
        while True:
            b = payload[j]
            j += 1
            size |= (b & 0x7f) << shift
            if not (b & 0x80):
                break
            shift += 7
        if ot == 6:
            body = payload[j:j+size]
            hdrbytes = int(sys.argv[4]) if len(sys.argv) > 4 else 5
            tile = body[hdrbytes:]
        i = j + size
    print(f"tile {len(tile)} bytes: {tile.hex()}")

    m = Msac(tile)
    # partition row rank3 ctx0 (64x64); partition table rows: 4x(4syms), then 3 groups of 4x(10syms), 4x(8syms)
    part = rows('partition')
    prow = part[3*4 + 0]
    n = 10
    def prob(sym):
        hi = 32768 if sym == 0 else prow[sym-1]
        lo = 0 if sym == n-1 else prow[sym]
        return hi - lo
    # gatherVertAlike: VERT(2)+SPLIT(3)+HORZ_A(4)+VERT_A(6)+VERT_B(7)+VERT_4(9)
    p = prob(2) + prob(3) + prob(4) + prob(6) + prob(7) + prob(9)
    p = min(32767, p)
    print(f"gathered psplit = {p}")
    split = m.boolp(p, 'split_or_vert(64)')
    assert not split, "true VERT assumed for this class"

    skip = m.bool_(qrows_skip[0], 'skip')
    ymode = m.symbol(kfy[0*5+0], 13, 'kf_y_mode(0,0)')
    # mono: no uv. filter_intra gate: max(32,64)>32 -> no read. txSel off.
    # coefficients, TX_32X64: cw=ch=32, txSzCtx=4
    txSzCtx = 4
    ptype = 0
    allzero = m.bool_(txb_skip[txSzCtx*13 + 0], 'txb_skip[4][0]')
    assert not allzero
    # eob: eobPt1024[ptype*2+0]
    row = eob1024[ptype*2 + 0]
    eobPt = m.symbol(row, 11, 'eob_pt_1024') + 1
    eob = eobPt if eobPt < 2 else (1 << (eobPt - 2)) + 1
    if eobPt >= 3:
        extra = eobPt - 2
        if m.bool_(eob_extra[(txSzCtx*2 + ptype)*9 + (eobPt-3)], 'eob_extra'):
            eob += 1 << (extra - 1)
        for k in range(1, extra):
            if m.literal(1):
                eob += 1 << (extra - 1 - k)
    print(f"eob = {eob}")
    cw = ch = 32
    bwl = 5
    scan = diag_scan(32, 32)
    stride = cw + 4
    levels = [0] * ((ch + 4) * stride)
    quant = [0] * (cw * ch)
    TXPL = lambda t: t * 2 + ptype
    for c in range(eob - 1, -1, -1):
        pos = scan[c]
        rr = pos >> bwl
        cc = pos - (rr << bwl)
        lpos = rr * stride + cc
        if c == eob - 1:
            if c == 0:
                ctx = 0
            elif c <= (ch << bwl) // 8:
                ctx = 1
            elif c <= (ch << bwl) // 4:
                ctx = 2
            else:
                ctx = 3
            level = m.symbol(cbase_eob[TXPL(txSzCtx)*4 + ctx], 3,
                             f'base_eob c={c} pos=({rr},{cc})') + 1
        else:
            def lv(r_, c_):
                return min(levels[r_ * stride + c_], 3)
            mag = lv(rr, cc+1) + lv(rr+1, cc)
            mag += lv(rr+1, cc+1) + lv(rr, cc+2) + lv(rr+2, cc)
            ctx = min((mag + 1) >> 1, 4)
            if pos == 0:
                ctx2 = 0
            else:
                B = [[0,1,6,6,21],[1,6,6,21,21],[6,6,21,21,21],
                     [6,21,21,21,21],[21,21,21,21,21]]
                ctx2 = ctx + B[min(rr,4)][min(cc,4)]
            level = m.symbol(cbase[TXPL(txSzCtx)*42 + ctx2], 4,
                             f'base c={c} pos=({rr},{cc}) ctx={ctx2}')
        if level > 2:
            levels[lpos] = level
            for _ in range(4):
                def lvb(r_, c_):
                    return levels[r_ * stride + c_]
                mag = lvb(rr, cc+1) + lvb(rr+1, cc) + lvb(rr+1, cc+1)
                mag = min((mag + 1) >> 1, 6)
                bctx = mag if pos == 0 else (
                    mag + 7 if (rr < 2 and cc < 2) else mag + 14)
                k = m.symbol(cbr[TXPL(3)*21 + bctx], 4, f'br c={c}')
                level += k
                levels[lpos] = min(level, 63)
                if k < 3:
                    break
        else:
            levels[lpos] = level
        quant[pos] = level
    # signs + golomb
    print("levels (scan order):", [quant[scan[c]] for c in range(eob)])
    for c in range(eob):
        pos = scan[c]
        if quant[pos]:
            if c == 0:
                neg = m.bool_(dcsign[ptype*3 + 0], 'dc_sign')
            else:
                neg = m.literal(1) == 1
            lvl = quant[pos]
            if lvl > 14:
                lvl += m.golomb()
            print(f"  coef c={c} pos={pos} level={'-' if neg else '+'}{lvl}")
    print(f"final pos={m.pos}/{len(tile)} rng={m.rng:04x} nsym={m.nsym}")

qrows_skip = rows('skip')
kfy = rows('kf_y_mode')
QCTX = int(sys.argv[2])
txb_skip = qrows('txb_skip', QCTX)
eob1024 = qrows('eob_pt_1024', QCTX)
eob_extra = qrows('eob_extra', QCTX)
cbase_eob = qrows('coeff_base_eob', QCTX)
cbase = qrows('coeff_base', QCTX)
cbr = qrows('coeff_br', QCTX)
dcsign = qrows('dc_sign', QCTX)

main()
