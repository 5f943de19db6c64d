#!/usr/bin/env python3
"""Python mirror of graft's AV1 deblocking loop filter (Av1LoopFilter),
driven by a GRAFT_AV1_LFDUMP state file. Drill companion: replays the
two filter passes with switchable convention VARIANTS and diffs the
result against the reference planes, so edge/extent/mask hypotheses
iterate in milliseconds instead of sbt runs.

  GRAFT_AV1_LFDUMP=/tmp/lf.txt sbt 'Test/runMain ... Av1CalMain m.jsonl'
  python3 scripts/av1_lf_mirror.py /tmp/lf.txt <member.jsonl> [variant]
"""
import json
import sys

TxW = [4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32, 32, 64, 4, 16, 8, 32, 16, 64]
TxH = [4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16, 64, 32, 16, 4, 32, 8, 64, 16]


def load_state(path):
    with open(path) as f:
        head = f.readline().split()
        miRows, miCols, nPl, subX, subY, bd, sharp, dEn, rDel = \
            [int(x) for x in head]
        lf = [int(x) for x in f.readline().split(',')]
        skips = [int(x) for x in f.readline().split(',')]
        txY = [int(x) for x in f.readline().split(',')]
        txUV = [int(x) for x in f.readline().split(',')]
        bOR = [int(x) for x in f.readline().split(',')]
        bOC = [int(x) for x in f.readline().split(',')]
        planes = []
        for _ in range(nPl):
            planes.append([int(x) for x in f.readline().split(',')])
    return dict(miRows=miRows, miCols=miCols, nPl=nPl, subX=subX,
                subY=subY, bd=bd, sharp=sharp, dEn=dEn, rDel=rDel,
                lf=lf, skips=skips, txY=txY, txUV=txUV, bOR=bOR,
                bOC=bOC, planes=planes)


def filter_line(buf, base, step, taps, limit, blimit, thresh, flatT, hiv):
    def p(i): return buf[base - (i + 1) * step]
    def q(i): return buf[base + i * step]
    def sp(i, v): buf[base - (i + 1) * step] = v
    def sq(i, v): buf[base + i * step] = v
    ab = abs
    def r3(x): return (x + 4) >> 3
    def r4(x): return (x + 8) >> 4
    p0, p1 = p(0), p(1)
    q0, q1 = q(0), q(1)
    mask = ab(p1 - p0) <= limit and ab(q1 - q0) <= limit and \
        ab(p0 - q0) * 2 + ab(p1 - q1) // 2 <= blimit
    if not mask:
        return
    hi2 = (hiv + 1) // 2 - 1
    lo2 = -(hiv + 1) // 2
    def c3(x): return lo2 if x < lo2 else (hi2 if x > hi2 else x)
    def clip1(x): return 0 if x < 0 else (hiv if x > hiv else x)

    def filter4():
        hev = ab(p1 - p0) > thresh or ab(q1 - q0) > thresh
        f = c3(p1 - q1) if hev else 0
        f = c3(f + 3 * (q0 - p0))
        f1 = c3(f + 4) >> 3
        f2 = c3(f + 3) >> 3
        sq(0, clip1(q0 - f1))
        sp(0, clip1(p0 + f2))
        if not hev:
            f3 = (f1 + 1) >> 1
            sq(1, clip1(q1 - f3))
            sp(1, clip1(p1 + f3))

    if taps == 4:
        filter4()
        return
    if taps == 6:
        p2, q2 = p(2), q(2)
        mask = mask and ab(p2 - p1) <= limit and ab(q2 - q1) <= limit
        if not mask:
            return
        flat = ab(p1 - p0) <= flatT and ab(q1 - q0) <= flatT and \
            ab(p2 - p0) <= flatT and ab(q2 - q0) <= flatT
        if flat:
            op1 = r3(p2 * 3 + p1 * 2 + p0 * 2 + q0)
            op0 = r3(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1)
            oq0 = r3(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2)
            oq1 = r3(p0 + q0 * 2 + q1 * 2 + q2 * 3)
            sp(1, op1); sp(0, op0); sq(0, oq0); sq(1, oq1)
        else:
            filter4()
        return
    p2, p3 = p(2), p(3)
    q2, q3 = q(2), q(3)
    mask = mask and ab(p2 - p1) <= limit and ab(q2 - q1) <= limit and \
        ab(p3 - p2) <= limit and ab(q3 - q2) <= limit
    if not mask:
        return
    flat = ab(p1 - p0) <= flatT and ab(q1 - q0) <= flatT and \
        ab(p2 - p0) <= flatT and ab(q2 - q0) <= flatT and \
        ab(p3 - p0) <= flatT and ab(q3 - q0) <= flatT
    if taps == 14:
        p4, p5, p6 = p(4), p(5), p(6)
        q4, q5, q6 = q(4), q(5), q(6)
        flat2 = ab(p4 - p0) <= flatT and ab(q4 - q0) <= flatT and \
            ab(p5 - p0) <= flatT and ab(q5 - q0) <= flatT and \
            ab(p6 - p0) <= flatT and ab(q6 - q0) <= flatT
        if flat and flat2:
            sp(5, r4(p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0))
            sp(4, r4(p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0 + q1))
            sp(3, r4(p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0 + q1 + q2))
            sp(2, r4(p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0 + q1 + q2 + q3))
            sp(1, r4(p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0 + q1 + q2 + q3 + q4))
            sp(0, r4(p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + q2 + q3 + q4 + q5))
            sq(0, r4(q6 + q5 + q4 + q3 + q2 + q1 * 2 + q0 * 2 + p0 * 2 + p1 + p2 + p3 + p4 + p5))
            sq(1, r4(q6 * 2 + q5 + q4 + q3 + q2 * 2 + q1 * 2 + q0 * 2 + p0 + p1 + p2 + p3 + p4))
            sq(2, r4(q6 * 3 + q5 + q4 + q3 * 2 + q2 * 2 + q1 * 2 + q0 + p0 + p1 + p2 + p3))
            sq(3, r4(q6 * 4 + q5 + q4 * 2 + q3 * 2 + q2 * 2 + q1 + q0 + p0 + p1 + p2))
            sq(4, r4(q6 * 5 + q5 * 2 + q4 * 2 + q3 * 2 + q2 + q1 + q0 + p0 + p1))
            sq(5, r4(q6 * 7 + q5 * 2 + q4 * 2 + q3 + q2 + q1 + q0 + p0))
            return
    if flat:
        sp(2, r3(p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0))
        sp(1, r3(p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1))
        sp(0, r3(p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2))
        sq(0, r3(p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3))
        sq(1, r3(p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3))
        sq(2, r3(p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3))
    else:
        filter4()


def run(st, w, h, variant=''):
    miRows, miCols = st['miRows'], st['miCols']
    bd = st['bd']
    scale = bd - 8
    hiv = (1 << bd) - 1
    out = [list(p) for p in st['planes']]
    for plane in range(st['nPl']):
        subX = 0 if plane == 0 else st['subX']
        subY = 0 if plane == 0 else st['subY']
        al = ((miCols * 4 + 63) // 64) * 64
        ah = ((miRows * 4 + 63) // 64) * 64
        pw = al >> subX
        ph = ah >> subY
        vw = (w + subX) >> subX
        vh = (h + subY) >> subY
        buf = out[plane]
        for pas in range(2):
            base_l = st['lf'][pas] if plane == 0 else st['lf'][1 + plane]
            if base_l == 0:
                continue
            lvl = base_l
            if st['dEn']:
                sh = base_l >> 5
                lvl = max(0, min(63, base_l + (st['rDel'] << sh)))
            if lvl == 0:
                continue
            sharp = st['sharp']
            shift = 2 if sharp > 4 else (1 if sharp > 0 else 0)
            limit0 = max(1, min(9 - sharp, lvl >> shift)) if sharp > 0 \
                else max(1, lvl)
            blimit = (2 * (lvl + 2) + limit0) << scale
            limit = limit0 << scale
            thresh = (lvl >> 4) << scale
            flatT = 1 << scale
            rowStep = 1 << subY
            colStep = 1 << subX

            def miIdx(r, c):
                if plane == 0:
                    return r * miCols + c
                return min(r | subY, miRows - 1) * miCols + \
                    min(c | subX, miCols - 1)

            def txOf(r, c):
                return st['txY'][r * miCols + c] if plane == 0 \
                    else st['txUV'][miIdx(r, c)]

            for row in range(0, miRows, rowStep):
                for col in range(0, miCols, colStep):
                    xP = (col >> subX) * 4
                    yP = (row >> subY) * 4
                    if pas == 0:
                        if xP == 0 or xP >= vw:
                            continue
                    else:
                        if yP == 0 or yP >= vh:
                            continue
                    tx = txOf(row, col)
                    curDim = TxW[tx] if pas == 0 else TxH[tx]
                    pos = xP if pas == 0 else yP
                    if pos % curDim != 0:
                        continue
                    pr, pc = (row, col - colStep) if pas == 0 \
                        else (row - rowStep, col)
                    prevTx = txOf(pr, pc)
                    prevDim = TxW[prevTx] if pas == 0 else TxH[prevTx]
                    oMi = st['bOC'][miIdx(row, col)] & ~subX if pas == 0 \
                        else st['bOR'][miIdx(row, col)] & ~subY
                    oP2 = (oMi >> (subX if pas == 0 else subY)) * 4
                    isBlockEdge = pos == oP2
                    skipCur = st['skips'][miIdx(row, col)]
                    skipPrev = st['skips'][miIdx(pr, pc)]
                    if not (isBlockEdge or not skipCur or not skipPrev):
                        continue
                    minDim = min(curDim, prevDim)
                    if plane == 0:
                        taps = 14 if minDim >= 16 else (8 if minDim >= 8 else 4)
                    else:
                        taps = 6 if minDim >= 8 else 4
                    lineLim = min(ph, (vh + 3) & ~3) if pas == 0 \
                        else min(pw, (vw + 3) & ~3)
                    for k in range(4):
                        if pas == 0:
                            y = yP + k
                            if y < lineLim:
                                filter_line(buf, y * pw + xP, 1, taps,
                                            limit, blimit, thresh, flatT, hiv)
                        else:
                            x = xP + k
                            if x < lineLim:
                                filter_line(buf, yP * pw + x, pw, taps,
                                            limit, blimit, thresh, flatT, hiv)
    return out


def main():
    st = load_state(sys.argv[1])
    d = json.loads(open(sys.argv[2]).read())
    w, h = d['w'], d['h']
    variant = sys.argv[3] if len(sys.argv) > 3 else ''
    out = run(st, w, h, variant)
    # diff plane 0 against reference
    ref = bytes.fromhex(d['planes'][0])
    al = ((st['miCols'] * 4 + 63) // 64) * 64
    nd = 0
    first = None
    for y in range(h):
        for x in range(w):
            rv = ref[y * w + x] if d['depth'] == 8 else \
                ref[2 * (y * w + x)] | (ref[2 * (y * w + x) + 1] << 8)
            if out[0][y * al + x] != rv:
                nd += 1
                if first is None:
                    first = (x, y, out[0][y * al + x], rv)
    print(f"variant='{variant}' plane0 ndiff={nd} first={first}")


if __name__ == '__main__':
    main()
