#!/usr/bin/env python3
"""Reference oracle for the VP8 (lossy WebP) key-frame decoder.

Drives the runtime's reference codec (libwebp.so.7 via ctypes — the
PUBLIC libwebp C API) to:
  golden <out.json>      write the committed golden set: deterministic
                         closed-form images, encoded at a spread of
                         qualities/configs, with the reference-decoded
                         Y/U/V plane and RGBA SHA-256s recorded;
  sweep <n> <seed>       emit n JSONL cases for the live differential
                         sweep (Vp8Spec's 400-seed standard);
  decode <file.webp>     dump full reference planes as JSON (debug aid).

Encode coverage: the one-shot WebPEncodeRGB API plus (when the ABI
handshake succeeds) the advanced WebPEncode API, which lets the sweep
exercise simple-vs-normal loop filter, 1..8 token partitions, 1..4
segments, filter strength/sharpness spreads and method 0..6.
All image content is closed-form (xorshift/trig over (x, y)) — no
external inputs.
"""
import ctypes, hashlib, json, math, random, struct, sys

lib = ctypes.CDLL('libwebp.so.7')
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)

def encode_simple(rgb, w, h, quality):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, 3 * w,
                          ctypes.c_float(quality), ctypes.byref(out))
    if n == 0:
        raise RuntimeError('WebPEncodeRGB failed')
    data = bytes(out[:n])
    lib.WebPFree(out)
    return data

def encode_rgba(rgba, w, h, quality):
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.WebPEncodeRGBA(bytes(rgba), w, h, 4 * w,
                           ctypes.c_float(quality), ctypes.byref(out))
    if n == 0:
        raise RuntimeError('WebPEncodeRGBA failed')
    data = bytes(out[:n])
    lib.WebPFree(out)
    return data

# ---------------- advanced API (struct-by-offset; sanity-checked) ------

_ABI = None
for cand in (0x020f, 0x0210, 0x020e, 0x020d):
    cfg = ctypes.create_string_buffer(512)
    if lib.WebPConfigInitInternal(cfg, 0, ctypes.c_float(75.0), cand) == 1:
        _ABI = cand
        break

def _put_i32(buf, off, v): struct.pack_into('<i', buf, off, v)
def _put_f32(buf, off, v): struct.pack_into('<f', buf, off, v)

CFG = dict(method=8, segments=24, sns_strength=28, filter_strength=32,
           filter_sharpness=36, filter_type=40, autofilter=44,
           alpha_compression=48, alpha_filtering=52, alpha_quality=56,
           passes=60, preprocessing=68, partitions=72)

def encode_advanced(rgb, w, h, quality, rgba=False, **kw):
    """Returns stream bytes, or None if the advanced ABI is unavailable
    or any struct sanity check fails (caller falls back to simple)."""
    if _ABI is None:
        return None
    cfg = ctypes.create_string_buffer(512)
    if lib.WebPConfigInitInternal(cfg, 0, ctypes.c_float(quality), _ABI) != 1:
        return None
    for k, v in kw.items():
        _put_i32(cfg, CFG[k], v)
    if lib.WebPValidateConfig(cfg) != 1:
        return None
    pic = ctypes.create_string_buffer(512)
    if lib.WebPPictureInitInternal(pic, _ABI) != 1:
        return None
    _put_i32(pic, 8, w)
    _put_i32(pic, 12, h)
    imported = (lib.WebPPictureImportRGBA(pic, bytes(rgb), 4 * w) if rgba
                else lib.WebPPictureImportRGB(pic, bytes(rgb), 3 * w))
    if imported != 1:
        return None
    # sanity: y pointer at 16 non-null, y_stride at 40 == w
    y_ptr = struct.unpack_from('<Q', pic, 16)[0]
    y_stride = struct.unpack_from('<i', pic, 40)[0]
    if y_ptr == 0 or y_stride != w:
        lib.WebPPictureFree(pic)
        return None
    writer = ctypes.create_string_buffer(64)
    lib.WebPMemoryWriterInit(writer)
    struct.pack_into('<Q', pic, 96,
                     ctypes.cast(lib.WebPMemoryWrite, ctypes.c_void_p).value)
    struct.pack_into('<Q', pic, 104, ctypes.addressof(writer))
    ok = lib.WebPEncode(cfg, pic)
    lib.WebPPictureFree(pic)
    if ok != 1:
        return None
    mem, size = struct.unpack_from('<QQ', writer, 0)
    data = ctypes.string_at(mem, size)
    lib.WebPFree(ctypes.c_void_p(mem))
    if data[:4] != b'RIFF' or (data[8:16] != b'WEBPVP8 '
                               and data[8:16] != b'WEBPVP8X'):
        return None
    return data

def decode_ref(data):
    W = ctypes.c_int(); H = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
    st = ctypes.c_int(); uvst = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, ctypes.c_size_t(len(data)),
                          ctypes.byref(W), ctypes.byref(H), ctypes.byref(u),
                          ctypes.byref(v), ctypes.byref(st), ctypes.byref(uvst))
    if not y:
        raise RuntimeError('WebPDecodeYUV failed')
    w, h = W.value, H.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    yb = b''.join(bytes(y[r * st.value:r * st.value + w]) for r in range(h))
    ub = b''.join(bytes(u[r * uvst.value:r * uvst.value + cw]) for r in range(ch))
    vb = b''.join(bytes(v[r * uvst.value:r * uvst.value + cw]) for r in range(ch))
    lib.WebPFree(y)
    W2 = ctypes.c_int(); H2 = ctypes.c_int()
    rgba = lib.WebPDecodeRGBA(data, ctypes.c_size_t(len(data)),
                              ctypes.byref(W2), ctypes.byref(H2))
    if not rgba:
        raise RuntimeError('WebPDecodeRGBA failed')
    rb = bytes(rgba[:w * h * 4])
    lib.WebPFree(rgba)
    return w, h, yb, ub, vb, rb

# ---------------- closed-form images ----------------

def xs(state):
    state ^= (state << 13) & 0xffffffffffffffff
    state ^= state >> 7
    state ^= (state << 17) & 0xffffffffffffffff
    return state

def gen_image(kind, w, h, seed):
    px = bytearray(w * h * 3)
    s = seed | 1
    for yy in range(h):
        for xx in range(w):
            i = (yy * w + xx) * 3
            if kind == 'flat':
                r, g, b = (seed >> 16) & 255, (seed >> 8) & 255, seed & 255
            elif kind == 'hgrad':
                r = (xx * 255) // max(1, w - 1); g = 255 - r; b = 128
            elif kind == 'vgrad':
                g = (yy * 255) // max(1, h - 1); r = 40; b = 255 - g
            elif kind == 'diag':
                r = ((xx + yy) * 255) // max(1, w + h - 2); g = r // 2; b = 255 - r
            elif kind == 'plasma':
                r = int(127.5 + 127.5 * math.sin(xx * 0.31 + seed % 7))
                g = int(127.5 + 127.5 * math.sin(yy * 0.23 + seed % 5))
                b = int(127.5 + 127.5 * math.sin((xx + yy) * 0.17))
            elif kind == 'checker':
                k = 1 + (seed % 6)
                on = ((xx // k) + (yy // k)) % 2 == 0
                r, g, b = (230, 40, 20) if on else (20, 60, 220)
            elif kind == 'blocks':
                s2 = (xx // 8) * 2654435761 + (yy // 8) * 40503 + seed
                s2 &= 0xffffffff
                r, g, b = (s2 >> 16) & 255, (s2 >> 8) & 255, s2 & 255
            else:  # noise
                s = xs(s)
                r, g, b = (s >> 16) & 255, (s >> 8) & 255, s & 255
            px[i] = r; px[i + 1] = g; px[i + 2] = b
    return px

def gen_alpha(kind, w, h, seed):
    """RGBA image: RGB from gen_image, alpha a separate closed form."""
    rgb = gen_image(kind, w, h, seed)
    px = bytearray(w * h * 4)
    s = seed | 1
    for yy in range(h):
        for xx in range(w):
            i = yy * w + xx
            m = seed % 4
            if m == 0:
                a = 255 if ((xx // 4) + (yy // 4)) % 2 == 0 else 0
            elif m == 1:
                a = (xx * 255) // max(1, w - 1)
            elif m == 2:
                s = xs(s); a = (s >> 24) & 255
            else:
                a = 200
            px[4 * i:4 * i + 3] = rgb[3 * i:3 * i + 3]
            px[4 * i + 3] = a
    return px

KINDS = ['flat', 'hgrad', 'vgrad', 'diag', 'plasma', 'checker', 'blocks', 'noise']
SIZES = [(1, 1), (3, 2), (7, 5), (8, 8), (16, 16), (17, 13), (32, 32),
         (33, 29), (48, 80), (64, 64), (128, 96), (176, 144)]

def sha(b): return hashlib.sha256(b).hexdigest()

def case_json(name, data):
    w, h, yb, ub, vb, rb = decode_ref(data)
    return {'name': name, 'w': w, 'h': h, 'webp': data.hex(),
            'y_sha': sha(yb), 'u_sha': sha(ub), 'v_sha': sha(vb),
            'rgba_sha': sha(rb)}

def cmd_golden(path):
    out = {}
    idx = 0
    for kind in KINDS:
        for (w, h) in [(7, 5), (16, 16), (33, 29), (64, 64)]:
            for q in (10, 50, 90):
                img = gen_image(kind, w, h, 0xC0FFEE + idx)
                data = encode_simple(img, w, h, q)
                c = case_json(f'{kind}_{w}x{h}_q{q}', data)
                out[c.pop('name')] = c
                idx += 1
    # advanced-config members (simple filter, multi-partition, segments)
    adv_cases = [
        dict(filter_type=0, filter_strength=50, autofilter=0),
        dict(partitions=3, segments=4, sns_strength=80),
        dict(filter_strength=0),
        dict(segments=1, method=0),
        dict(method=6, filter_sharpness=5, filter_strength=90),
    ]
    for i, kw in enumerate(adv_cases):
        img = gen_image('blocks', 80, 56, 0xBEEF00 + i)
        data = encode_advanced(img, 80, 56, 40 + 12 * i, **kw)
        if data is not None:
            c = case_json(f'adv{i}_' + '_'.join(f'{k}{v}' for k, v in kw.items()),
                          data)
            out[c.pop('name')] = c
    # one large case for the scale shape
    img = gen_image('plasma', 176, 144, 7)
    c = case_json('plasma_176x144_q75', encode_simple(img, 176, 144, 75))
    out[c.pop('name')] = c
    # ALPH-chunk members: the simple RGBA API (lossless alpha, encoder-
    # chosen filter) plus advanced members pinning alpha_compression=0
    # (raw plane) and each explicit filtering mode
    a_idx = 0
    for kind in ['checker', 'hgrad', 'noise', 'plasma']:
        for q in (30, 75):
            rgba = gen_alpha(kind, 24, 20, 0xA11CE + a_idx)
            c = case_json(f'alpha_{kind}_q{q}', encode_rgba(rgba, 24, 20, q))
            out[c.pop('name')] = c
            a_idx += 1
    for i, kw in enumerate([dict(alpha_compression=0),
                            dict(alpha_filtering=0),
                            dict(alpha_filtering=2),
                            dict(alpha_compression=0, alpha_filtering=2)]):
        rgba = gen_alpha('vgrad', 33, 29, 0xA11CF0 + i)
        data = encode_advanced(rgba, 33, 29, 60, rgba=True, **kw)
        if data is not None:
            c = case_json(
                f'alphaadv{i}_' + '_'.join(f'{k[6:]}{v}' for k, v in kw.items()),
                data)
            out[c.pop('name')] = c
    with open(path, 'w') as f:
        json.dump(out, f, indent=0)
    print(f'wrote {path}: {len(out)} cases, advanced API '
          + ('LIVE' if _ABI is not None else 'unavailable'), file=sys.stderr)

def cmd_sweep(n, seed):
    rng = random.Random(seed)
    emitted = 0
    while emitted < n:
        kind = rng.choice(KINDS)
        w, h = rng.choice(SIZES)
        q = rng.choice([0, 5, 10, 20, 30, 40, 50, 60, 70, 80, 90, 95, 100])
        roll = rng.random()
        if roll < 0.25:  # ALPH member
            rgba = gen_alpha(kind, w, h, rng.getrandbits(30))
            if rng.random() < 0.5 and _ABI is not None:
                data = encode_advanced(rgba, w, h, q, rgba=True,
                                       alpha_compression=rng.randint(0, 1),
                                       alpha_filtering=rng.randint(0, 2))
                name = f'alphaadv_{kind}_{w}x{h}_q{q}'
            else:
                data = None
            if data is None:
                data = encode_rgba(rgba, w, h, q)
                name = f'alpha_{kind}_{w}x{h}_q{q}'
            print(json.dumps(case_json(f'{emitted}_{name}', data)))
            emitted += 1
            continue
        img = gen_image(kind, w, h, rng.getrandbits(30))
        if roll < 0.75 and _ABI is not None:
            kw = dict(filter_type=rng.randint(0, 1),
                      filter_strength=rng.choice([0, 20, 50, 80, 100]),
                      filter_sharpness=rng.randint(0, 7),
                      partitions=rng.randint(0, 3),
                      segments=rng.randint(1, 4),
                      sns_strength=rng.choice([0, 50, 100]),
                      method=rng.randint(0, 6),
                      autofilter=rng.randint(0, 1))
            data = encode_advanced(img, w, h, q, **kw)
            name = f'adv_{kind}_{w}x{h}_q{q}_' + \
                '_'.join(f'{k[:4]}{v}' for k, v in kw.items())
        else:
            data = encode_simple(img, w, h, q)
            name = f'simple_{kind}_{w}x{h}_q{q}'
        if data is None:
            data = encode_simple(img, w, h, q)
            name = f'fallback_{kind}_{w}x{h}_q{q}'
        print(json.dumps(case_json(f'{emitted}_{name}', data)))
        emitted += 1

def cmd_fixture():
    """Dev-time, run-once: the lossy-WebP pipeline fixtures.

    Writes (a) src/main/resources/graft/vp8_lossy.json — reference-
    encoded lossy streams the e113b/e29b query fixtures materialize at
    run time — and (b) fixtures/<sf>/{e113b_webp_lossy,
    e29b_webp_neardup}.parquet, the expected engine outputs computed
    INDEPENDENTLY here: stats and average-hashes are derived from the
    REFERENCE decoder's RGBA (libwebp), with the aHash + banded-pair
    logic reimplemented in Python (the e02 independent-fixture
    precedent). Rounding matches WebpL.parse (HALF_EVEN at 6 dp over
    the IEEE quotient).
    """
    import decimal
    import pyarrow as pa
    import pyarrow.parquet as pq
    streams = {}
    stats_rows = []
    hashes = {}

    def r6(total, n):
        return float(decimal.Decimal(total / n).quantize(
            decimal.Decimal('0.000001'), decimal.ROUND_HALF_EVEN))

    def ahash64(w, h, rb):
        cs = [0] * 64; cn = [0] * 64; tot = 0
        for y in range(h):
            rk = (y * 8 // h) * 8
            for x in range(w):
                k = rk + x * 8 // w
                i = (y * w + x) * 4
                p = rb[i] + rb[i + 1] + rb[i + 2]
                cs[k] += p; cn[k] += 1; tot += p
        n = w * h
        hv = 0
        for k in range(64):
            if cs[k] * n > tot * cn[k]:
                hv |= 1 << (63 - k)
        return hv

    # e113b: 24 stats members — kinds × sizes × qualities, plus
    # advanced-config members (simple filter, 8 partitions, 4 segments)
    idx = 0
    for kind in ['flat', 'hgrad', 'plasma', 'checker', 'blocks', 'noise']:
        for (w, h, q) in [(16, 16, 25), (33, 29, 60), (48, 80, 85)]:
            img = gen_image(kind, w, h, 0x113B00 + idx)
            data = encode_simple(img, w, h, q)
            streams[f'st{idx:02d}_{kind}_{w}x{h}_q{q}.webp'] = data
            idx += 1
    for i, kw in enumerate([
            dict(filter_type=0, filter_strength=60),
            dict(partitions=3, segments=4, sns_strength=80),
            dict(filter_strength=0, method=0),
            dict(method=6, filter_sharpness=4),
            dict(segments=2, sns_strength=100, autofilter=1),
            dict(partitions=2, filter_type=0, filter_strength=30)]):
        img = gen_image('blocks', 40 + 8 * i, 32, 0x113BF0 + i)
        data = encode_advanced(img, 40 + 8 * i, 32, 35 + 10 * i, **kw)
        assert data is not None, 'advanced API unavailable at generation time'
        streams[f'st{idx + i:02d}_adv{i}.webp'] = data
    idx += 6
    # ALPH members: mean_a becomes load-bearing (checker/gradient/noise/
    # flat alpha forms; one raw-plane, one explicit-filter config)
    for i, kind in enumerate(['checker', 'hgrad', 'noise', 'plasma']):
        rgba = gen_alpha(kind, 24, 20, 0xA11C00 + i)
        streams[f'st{idx + i:02d}_alpha_{kind}.webp'] = \
            encode_rgba(rgba, 24, 20, 50 + 10 * i)
    idx += 4
    for i, kw in enumerate([dict(alpha_compression=0),
                            dict(alpha_filtering=2)]):
        rgba = gen_alpha('vgrad', 33, 29, 0xA11D00 + i)
        data = encode_advanced(rgba, 33, 29, 55, rgba=True, **kw)
        assert data is not None
        streams[f'st{idx + i:02d}_alphaadv{i}.webp'] = data
    for name in sorted(streams):
        w, h, yb, ub, vb, rb = decode_ref(streams[name])
        n = w * h
        stats_rows.append(dict(
            fname=name, width=w, height=h,
            mean_a=r6(float(sum(rb[3::4])), n),
            mean_r=r6(float(sum(rb[0::4])), n),
            mean_g=r6(float(sum(rb[1::4])), n),
            mean_b=r6(float(sum(rb[2::4])), n)))

    # e29b: near-dup corpus — the canonical lossy near-dup is a
    # re-encode of the same content at a new rate. Four re-encode pairs
    # on hash-stable content (strong-contrast plasma/checker/blocks;
    # gradients sit ON the cell-mean boundary and flip dozens of bits),
    # one byte-identical copy, three unpaired distractors.
    nd = {}
    for i, (kind, seed, w, q2) in enumerate([
            ('plasma', 0x29B000, 32, 68), ('plasma', 0x29B007, 40, 68),
            ('blocks', 0x29B004, 48, 55), ('checker', 0x29B00B, 48, 68)]):
        img = gen_image(kind, w, 32, seed)
        nd[f'nd{i:02d}a_{kind}.webp'] = encode_simple(img, w, 32, 80)
        nd[f'nd{i:02d}b_{kind}.webp'] = encode_simple(img, w, 32, q2)
    for i, kind in enumerate(['hgrad', 'vgrad', 'diag']):
        img = gen_image(kind, 32, 32, 0x29B100 + i)
        nd[f'nd{i + 4:02d}a_{kind}.webp'] = encode_simple(img, 32, 32, 80)
    nd['nd00c_copy.webp'] = nd['nd00a_plasma.webp']
    for name, data in nd.items():
        w, h, yb, ub, vb, rb = decode_ref(data)
        hashes[name] = ahash64(w, h, rb)
    pair_rows = []
    names = sorted(nd)
    for a in range(len(names)):
        for b in range(a + 1, len(names)):
            hm = bin(hashes[names[a]] ^ hashes[names[b]]).count('1')
            if hm <= 3:
                pair_rows.append(dict(f1=names[a], f2=names[b], hamming=hm))
    assert len(pair_rows) >= 4, f'only {len(pair_rows)} near-dup pairs'
    assert any(r['hamming'] == 0 for r in pair_rows), 'no hamming-0 pair'
    streams.update(nd)

    with open('src/main/resources/graft/vp8_lossy.json', 'w') as f:
        json.dump({k: v.hex() for k, v in streams.items()}, f, indent=0)
    for sf in ('sf0.001', 'sf0.01', 'sf0.1'):
        pq.write_table(pa.Table.from_pylist(stats_rows),
                       f'fixtures/{sf}/e113b_webp_lossy.parquet')
        pq.write_table(pa.Table.from_pylist(pair_rows),
                       f'fixtures/{sf}/e29b_webp_neardup.parquet')
    print(f'{len(streams)} streams ({len(stats_rows)} stats members, '
          f'{len(nd)} near-dup members, {len(pair_rows)} expected pairs)',
          file=sys.stderr)

def cmd_decode(path):
    data = open(path, 'rb').read()
    w, h, yb, ub, vb, rb = decode_ref(data)
    print(json.dumps({'w': w, 'h': h, 'y': yb.hex(), 'u': ub.hex(),
                      'v': vb.hex(), 'rgba': rb.hex()}))

if __name__ == '__main__':
    if sys.argv[1] == 'golden':
        cmd_golden(sys.argv[2])
    elif sys.argv[1] == 'sweep':
        cmd_sweep(int(sys.argv[2]), int(sys.argv[3]))
    elif sys.argv[1] == 'decode':
        cmd_decode(sys.argv[2])
    elif sys.argv[1] == 'fixture':
        cmd_fixture()
    else:
        raise SystemExit(
            'usage: golden <out.json> | sweep <n> <seed> | decode <f> | fixture')
