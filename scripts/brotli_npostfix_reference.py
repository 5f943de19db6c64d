import sys
sys.path.insert(0, '/root/repo/scripts')
import brotli_reference as R
import brotlicffi as B
import json, hashlib

def dist_code_np(distance, npostfix, ndirect):
    if distance <= ndirect:
        return (16 + distance - 1, 0, 0)
    pm = (1 << npostfix) - 1
    x = distance - ndirect - 1
    lcode = x & pm
    rest = x >> npostfix
    h = 0
    while True:
        n = 1 + (h >> 1)
        off = ((2 + (h & 1)) << n) - 4
        if off <= rest < off + (1 << n):
            return (16 + ndirect + ((h << (npostfix)) | lcode) if False else
                    16 + ndirect + ((h << npostfix) | lcode), rest - off, n)
        h += 1

def craft_np(npostfix, ndirect, dist_seq, k_cmds):
    """k_cmds commands of (insert 4 lits 'ABCD', copy 4 at dist_seq[i])."""
    b = R.Bits()
    mlen = 8 * k_cmds
    b.w(0,1); b.w(1,1); b.w(0,1); b.w(0,2); b.w(mlen-1,16)
    for _ in range(3): b.w(0,1)
    b.w(npostfix,2); b.w(ndirect >> npostfix,4)
    b.w(0,2); b.w(0,1); b.w(0,1)
    lit_syms = [ord('A'),ord('B'),ord('C'),ord('D')]
    s1,(ie,ieb),(ce,ceb) = R.iac_symbol(4, 4, implicit=False)
    codes = [dist_code_np(d, npostfix, ndirect) for d in dist_seq]
    dsts = sorted(set(c[0] for c in codes))
    assert len(dsts) <= 2, dsts
    b.w(1,2); b.w(3,2)
    for s_ in sorted(lit_syms): b.w(s_,8)
    b.w(0,1)
    R.simple_code(b, 10, [s1])
    alpha = 16 + ndirect + (48 << npostfix)
    abits = max(1,(alpha-1).bit_length())
    b.w(1,2); b.w(len(dsts)-1,2)
    for s_ in dsts: b.w(s_,abits)
    for i in range(k_cmds):
        b.w(ie,ieb); b.w(ce,ceb)
        for ch in b'ABCD': b.w(lit_syms.index(ch),2)
        dc,de,dbits = codes[i % len(codes)]
        if len(dsts)==2: b.w(dsts.index(dc),1)
        b.w(de,dbits)
    return b.bytes()

cases = {
  # direct range distances (<= NDIRECT): two direct dcodes
  'np2_nd8_direct': (2, 8, [3, 8], 6),
  # one postfix dcode, extra bit varying (h=1,lcode=2 -> dist 19/23)
  'np2_nd8_postfix': (2, 8, [19, 23], 6),
  # npostfix=3, ndirect=0, lcode=5
  'np3_nd0': (3, 0, [((2+0)<<1)-4+0<<3 | 0, 0], 0),  # placeholder, fix below
  'np1_nd14_mix': (1, 14, [14, 17], 6),
}
# compute valid np3 distances: h=2 -> n=2, off=4 -> rest in [4,7];
# distance = (rest<<3) + lcode + 0 + 1, lcode=5 -> rest=4: 37+... (4<<3)+5+1=38; rest=5: 46
cases['np3_nd0'] = (3, 0, [38, 46], 6)

out = {}
for name, (np_, nd, ds, k) in cases.items():
    st = craft_np(np_, nd, ds, k)
    ref = B.decompress(st)   # reference is the truth
    assert len(ref) == 8 * k, (name, len(ref))
    out[name] = {'stream': st.hex(), 'payload_sha256': hashlib.sha256(ref).hexdigest(),
                 'payload': ref.decode('latin1')}
    print(name, 'OK', ref[:24])
json.dump(out, open('/tmp/brotli_npostfix.json','w'), indent=0)

# (metadata-metablock golden cases were generated with the same
# discipline — see the merged brotli_npostfix.json keys meta0/5/300.)
