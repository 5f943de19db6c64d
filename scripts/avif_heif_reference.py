#!/usr/bin/env python3
"""AVIF / HEIC reference harness (r16) — the codec-trigger discipline
that shipped brotli (r13, brotlicffi), BCJ2 (r14, bsdtar) and VP8 (r15,
libwebp), fired this round by libavif.so.15 (aom enc/dec + dav1d dec)
and libheif.so.1 (x265 enc + libde265 dec) appearing on the runtime.

Commands:
  fixture   dev-time, run-once: writes
            (a) src/main/resources/graft/avif_heif_members.json —
                REFERENCE-ENCODED members (libavif/aom for .avif,
                libheif/x265 for .heic) the e119 query fixture
                materializes at run time, and
            (b) fixtures/<sf>/e119_avif.parquet — the expected engine
                rows, computed INDEPENDENTLY here: width/height/depth/
                alpha come from the REFERENCE decoders (avifDecoderRead-
                Memory / heif_decode handle), while the container fields
                the reference APIs don't expose (item count, primary
                extent bytes, irot) come from a from-scratch Python
                ISOBMFF walk, and the AV1 sequence-header bits
                (seq_profile, still_picture) from a from-scratch Python
                OBU bit parse — the e02/e113b independent-fixture
                pattern.
  probe     prints library availability + versions (for NOTES memos).

libavif structs are accessed by offset with sanity handshakes (the
WebPEncode r15 precedent): avifImageCreate(123,45,8,fmt) must read back
(123,45,8,fmt) at offsets 0/4/8/12 before anything else runs.
"""
import ctypes
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- libavif
class RW(ctypes.Structure):
    _fields_ = [("data", ctypes.c_void_p), ("size", ctypes.c_size_t)]


def load_avif():
    av = ctypes.CDLL("libavif.so.15")
    for n, res, args in [
            ("avifImageCreate", ctypes.c_void_p,
             [ctypes.c_uint32] * 3 + [ctypes.c_int]),
            ("avifImageAllocatePlanes", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_int]),
            ("avifEncoderCreate", ctypes.c_void_p, []),
            ("avifEncoderWrite", ctypes.c_int, [ctypes.c_void_p] * 3),
            ("avifDecoderCreate", ctypes.c_void_p, []),
            ("avifDecoderReadMemory", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p,
              ctypes.c_size_t]),
            ("avifVersion", ctypes.c_char_p, [])]:
        f = getattr(av, n)
        f.restype = res
        f.argtypes = args
    # struct-offset handshake (avifImage: width u32@0, height@4, depth@8,
    # yuvFormat@12; yuvPlanes u8*@24/32/40; yuvRowBytes u32@48/52/56;
    # alphaPlane u8*@64; alphaRowBytes u32@72)
    probe = av.avifImageCreate(123, 45, 8, 3)
    u32 = (ctypes.c_uint32 * 4).from_address(probe)
    assert list(u32) == [123, 45, 8, 3], "avifImage layout handshake failed"
    # encoder handshake (codecChoice int@0=0, maxThreads@4=1, speed@8=-1)
    enc = av.avifEncoderCreate()
    e32 = (ctypes.c_int32 * 3).from_address(enc)
    assert (e32[0], e32[1], e32[2]) == (0, 1, -1), \
        "avifEncoder layout handshake failed"
    return av


def avif_encode(av, w, h, depth, fmt, alpha, seed, opts=(), smooth=False,
                minq=None, maxq=None, speed=10):
    """Encode a deterministic image; returns bytes."""
    img = av.avifImageCreate(w, h, depth, fmt)
    assert av.avifImageAllocatePlanes(img, 1) == 0  # AVIF_PLANES_YUV
    u64 = (ctypes.c_uint64 * 16).from_address(img)
    u32 = (ctypes.c_uint32 * 32).from_address(img)
    cw, chh = (w + 1) // 2, (h + 1) // 2
    dims = [(w, h)]
    if fmt == 3:
        dims += [(cw, chh), (cw, chh)]
    elif fmt == 2:
        dims += [(cw, h), (cw, h)]
    elif fmt == 1:
        dims += [(w, h), (w, h)]
    # fmt 4 (YUV400): luma only
    s = seed
    for p, (pw, ph) in enumerate(dims):
        rb = u32[12 + p]
        stride = rb if depth == 8 else rb // 2
        ctor = ctypes.c_uint8 if depth == 8 else ctypes.c_uint16
        plane = (ctor * (stride * ph)).from_address(u64[3 + p])
        for yy in range(ph):
            for xx in range(stride):
                s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
                r = (s >> 33) % (1 << depth)
                plane[yy * stride + xx] = ((xx * 7 + yy * 13 +
                    (r & 31)) % (1 << depth)) if smooth else r
    if alpha:
        assert av.avifImageAllocatePlanes(img, 2) == 0  # AVIF_PLANES_A
        rb = u32[18]  # alphaRowBytes
        if depth == 8:
            plane = (ctypes.c_uint8 * (rb * h)).from_address(u64[8])
            for i in range(rb * h):
                s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
                plane[i] = (s >> 33) & 0xff
        else:
            plane = (ctypes.c_uint16 * (rb * h // 2)).from_address(u64[8])
            for i in range(rb * h // 2):
                s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
                plane[i] = (s >> 33) % (1 << depth)
    enc = av.avifEncoderCreate()
    e32 = (ctypes.c_int32 * 16).from_address(enc)
    e32[2] = speed
    if minq is not None:
        e32[6] = minq
    if maxq is not None:
        e32[7] = maxq
    for k, v in opts:
        av.avifEncoderSetCodecSpecificOption(enc, k.encode(), v.encode())
    out = RW()
    assert av.avifEncoderWrite(enc, img, ctypes.byref(out)) == 0
    return ctypes.string_at(out.data, out.size)


def avif_decode_info(av, data):
    """Reference decode → (width, height, depth, has_alpha)."""
    dec = av.avifDecoderCreate()
    img = av.avifImageCreate(0, 0, 8, 0)
    r = av.avifDecoderReadMemory(dec, img, data, len(data))
    assert r == 0, f"reference avif decode failed: {r}"
    u32 = (ctypes.c_uint32 * 4).from_address(img)
    u64 = (ctypes.c_uint64 * 16).from_address(img)
    return u32[0], u32[1], u32[2], u64[8] != 0


def avif_decode_plane_means(av, data):
    """Reference decode → per-plane sample means over the visible area
    (y, u, v, alpha — None where the plane is absent), 6dp. The r17
    pixel oracle: the engine's from-scratch AV1 decoder must reproduce
    these from the bitstream.
    """
    dec = av.avifDecoderCreate()
    img = av.avifImageCreate(0, 0, 8, 0)
    r = av.avifDecoderReadMemory(dec, img, data, len(data))
    assert r == 0, f"reference avif decode failed: {r}"
    u32 = (ctypes.c_uint32 * 32).from_address(img)
    u64 = (ctypes.c_uint64 * 16).from_address(img)
    w, h, depth, fmt = u32[0], u32[1], u32[2], u32[3]
    if fmt == 3:
        dims = [(w, h), ((w + 1) // 2, (h + 1) // 2),
                ((w + 1) // 2, (h + 1) // 2)]
    elif fmt == 2:
        dims = [(w, h), ((w + 1) // 2, h), ((w + 1) // 2, h)]
    elif fmt == 1:
        dims = [(w, h)] * 3
    else:
        dims = [(w, h)]
    out = []
    for p, (pw, ph) in enumerate(dims):
        ptr = u64[3 + p]
        if not ptr:
            out.append(None)
            continue
        rb = u32[12 + p]
        total = 0
        if depth == 8:
            buf = (ctypes.c_uint8 * (rb * ph)).from_address(ptr)
            for y in range(ph):
                total += sum(buf[y * rb:y * rb + pw])
        else:
            buf = (ctypes.c_uint16 * (rb * ph // 2)).from_address(ptr)
            for y in range(ph):
                total += sum(buf[y * (rb // 2):y * (rb // 2) + pw])
        out.append(round(total / (pw * ph), 6))
    while len(out) < 3:
        out.append(None)
    aptr = u64[8]
    if aptr:
        rb = u32[18]
        total = 0
        if depth == 8:
            buf = (ctypes.c_uint8 * (rb * h)).from_address(aptr)
            for y in range(h):
                total += sum(buf[y * rb:y * rb + w])
        else:
            buf = (ctypes.c_uint16 * (rb * h // 2)).from_address(aptr)
            for y in range(h):
                total += sum(buf[y * (rb // 2):y * (rb // 2) + w])
        out.append(round(total / (w * h), 6))
    else:
        out.append(None)
    return out


# ---------------------------------------------------------------- libheif
class HErr(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


def load_heif():
    h = ctypes.CDLL("libheif.so.1")
    sigs = [
        ("heif_get_version", ctypes.c_char_p, []),
        ("heif_context_alloc", ctypes.c_void_p, []),
        ("heif_context_get_encoder_for_format", HErr,
         [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]),
        ("heif_image_create", HErr,
         [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
          ctypes.c_void_p]),
        ("heif_image_add_plane", HErr, [ctypes.c_void_p] + [ctypes.c_int] * 4),
        ("heif_image_get_plane", ctypes.c_void_p,
         [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]),
        ("heif_context_encode_image", HErr, [ctypes.c_void_p] * 5),
        ("heif_context_write_to_file", HErr, [ctypes.c_void_p, ctypes.c_char_p]),
        ("heif_context_read_from_memory_without_copy", HErr,
         [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]),
        ("heif_context_get_primary_image_handle", HErr,
         [ctypes.c_void_p, ctypes.c_void_p]),
        ("heif_image_handle_get_width", ctypes.c_int, [ctypes.c_void_p]),
        ("heif_image_handle_get_height", ctypes.c_int, [ctypes.c_void_p]),
        ("heif_image_handle_has_alpha_channel", ctypes.c_int, [ctypes.c_void_p]),
        ("heif_image_handle_get_luma_bits_per_pixel", ctypes.c_int,
         [ctypes.c_void_p]),
        ("heif_decode_image", HErr,
         [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
          ctypes.c_void_p]),
        ("heif_image_get_plane_readonly", ctypes.POINTER(ctypes.c_ubyte),
         [ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]),
        ("heif_image_get_width", ctypes.c_int,
         [ctypes.c_void_p, ctypes.c_int]),
        ("heif_image_get_height", ctypes.c_int,
         [ctypes.c_void_p, ctypes.c_int]),
        ("heif_image_release", None, [ctypes.c_void_p])]
    for n, res, args in sigs:
        f = getattr(h, n)
        f.restype = res
        f.argtypes = args
    return h


def heif_decode_plane_means(h, data, mono, w, ht):
    """Reference pixel means for a HEIC member: libde265 on the
    extracted hvc1 payload (scripts/hevc_reference.py's from-scratch
    container walk), cropped top-left to the logical ispe dims, 6dp.

    Deliberately NOT via heif_decode_image: libheif's high-level decode
    pipes YCbCr through an RGB round-trip (verified: a native-format
    request returns R/G/B planes), which perturbs every sample — the
    codec-layer oracle for the engine's from-scratch HEVC decoder is
    the raw libde265 output, exactly as libwebp/libavif raw planes
    were for VP8/AV1.
    """
    import importlib.util as _il
    spec = _il.spec_from_file_location(
        "hvr", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "hevc_reference.py"))
    hvr = _il.module_from_spec(spec)
    spec.loader.exec_module(hvr)
    annexb, _ = hvr.hvc1_to_annexb(data)
    planes = hvr.de265_decode_annexb(hvr.load_de265(), annexb)
    out = []
    n = 1 if mono else 3
    for i in range(n):
        pw, ph, b = planes[i]
        cw = w if i == 0 else (w + 1) // 2
        chh = ht if i == 0 else (ht + 1) // 2
        assert pw >= cw and ph >= chh, f"plane {i}: {pw}x{ph} < {cw}x{chh}"
        total = 0
        for y in range(chh):
            total += sum(b[y * pw:y * pw + cw])
        out.append(round(total / (cw * chh), 6))
    while len(out) < 4:
        out.append(None)
    return out


def heif_encode(h, w, h_, mono, seed, path):
    ctx = h.heif_context_alloc()
    enc = ctypes.c_void_p()
    e = h.heif_context_get_encoder_for_format(ctx, 1, ctypes.byref(enc))
    assert e.code == 0, e.message
    img = ctypes.c_void_p()
    # colorspace: YCbCr=0, monochrome=2; chroma: mono=0, 420=1
    e = h.heif_image_create(w, h_, 2 if mono else 0, 0 if mono else 1,
                            ctypes.byref(img))
    assert e.code == 0, e.message
    planes = [(0, w, h_)] if mono else \
        [(0, w, h_), (1, (w + 1) // 2, (h_ + 1) // 2),
         (2, (w + 1) // 2, (h_ + 1) // 2)]
    s = seed
    for ch, pw, ph in planes:
        e = h.heif_image_add_plane(img, ch, pw, ph, 8)
        assert e.code == 0, e.message
        stride = ctypes.c_int()
        p = h.heif_image_get_plane(img, ch, ctypes.byref(stride))
        buf = (ctypes.c_uint8 * (stride.value * ph)).from_address(p)
        for i in range(stride.value * ph):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            buf[i] = (s >> 33) & 0xff
    hd = ctypes.c_void_p()
    e = h.heif_context_encode_image(ctx, img, enc, None, ctypes.byref(hd))
    assert e.code == 0, e.message
    e = h.heif_context_write_to_file(ctx, path.encode())
    assert e.code == 0, e.message
    with open(path, "rb") as f:
        return f.read()


def heif_decode_info(h, data):
    ctx = h.heif_context_alloc()
    e = h.heif_context_read_from_memory_without_copy(ctx, data, len(data), None)
    assert e.code == 0, e.message
    hd = ctypes.c_void_p()
    e = h.heif_context_get_primary_image_handle(ctx, ctypes.byref(hd))
    assert e.code == 0, e.message
    return (h.heif_image_handle_get_width(hd),
            h.heif_image_handle_get_height(hd),
            h.heif_image_handle_get_luma_bits_per_pixel(hd),
            h.heif_image_handle_has_alpha_channel(hd) != 0)


# ------------------------------------------- independent ISOBMFF walk
def boxes(data, start, end):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    p = start
    while p + 8 <= end:
        size = int.from_bytes(data[p:p + 4], "big")
        typ = data[p + 4:p + 8].decode("latin1")
        body = p + 8
        if size == 1:
            size = int.from_bytes(data[p + 8:p + 16], "big")
            body = p + 16
        elif size == 0:
            size = end - p
        assert size >= body - p and p + size <= end, "box overruns parent"
        yield typ, body, p + size
        p += size


def find(data, start, end, *path):
    cur = [(start, end)]
    for name in path:
        nxt = []
        for s, e in cur:
            for typ, bs, be in boxes(data, s, e):
                if typ == name:
                    nxt.append((bs, be))
        cur = nxt
    return cur


def walk_meta(data):
    """From-scratch container facts: (n_items, primary_id, primary_bytes,
    irot, primary_item_payload_bytes). meta is a FULL box (4-byte
    version/flags before children); iloc offsets are absolute (construction
    method 0 — both writers here emit it)."""
    metas = find(data, 0, len(data), "meta")
    assert len(metas) == 1
    ms, me = metas[0]
    ms += 4  # FULL box version/flags
    idats = find(data, ms, me, "idat")
    idat = idats[0] if idats else None
    pitm = find(data, ms, me, "pitm")[0]
    v = data[pitm[0]]
    primary = (int.from_bytes(data[pitm[0] + 4:pitm[0] + 6], "big") if v == 0
               else int.from_bytes(data[pitm[0] + 4:pitm[0] + 8], "big"))
    iinf = find(data, ms, me, "iinf")[0]
    iv = data[iinf[0]]
    n_items = (int.from_bytes(data[iinf[0] + 4:iinf[0] + 6], "big") if iv == 0
               else int.from_bytes(data[iinf[0] + 4:iinf[0] + 8], "big"))
    # primary item's infe type (v2/v3: [FULL(4)] id(2/4) protection(2) type(4))
    primary_type = None
    body_off = iinf[0] + (6 if iv == 0 else 8)
    for typ, bs, be in boxes(data, body_off, iinf[1]):
        if typ == "infe":
            ev = data[bs]
            if ev == 2:
                iid = int.from_bytes(data[bs + 4:bs + 6], "big")
                ityp = data[bs + 8:bs + 12].decode("latin1")
            else:
                iid = int.from_bytes(data[bs + 4:bs + 8], "big")
                ityp = data[bs + 10:bs + 14].decode("latin1")
            if iid == (int.from_bytes(data[pitm[0] + 4:pitm[0] + 6], "big")
                       if data[pitm[0]] == 0
                       else int.from_bytes(data[pitm[0] + 4:pitm[0] + 8], "big")):
                primary_type = ityp
    # iloc: parse the primary item's extents
    iloc = find(data, ms, me, "iloc")[0]
    b = data
    p = iloc[0]
    ver = b[p]
    p += 4
    off_sz = b[p] >> 4
    len_sz = b[p] & 15
    p += 1
    base_sz = b[p] >> 4
    idx_sz = (b[p] & 15) if ver in (1, 2) else 0
    p += 1
    if ver < 2:
        cnt = int.from_bytes(b[p:p + 2], "big"); p += 2
    else:
        cnt = int.from_bytes(b[p:p + 4], "big"); p += 4
    primary_bytes = 0
    payload = None
    for _ in range(cnt):
        if ver < 2:
            iid = int.from_bytes(b[p:p + 2], "big"); p += 2
        else:
            iid = int.from_bytes(b[p:p + 4], "big"); p += 4
        method = 0
        if ver in (1, 2):
            method = int.from_bytes(b[p:p + 2], "big") & 15
            p += 2
        p += 2  # data_reference_index
        base = int.from_bytes(b[p:p + base_sz], "big"); p += base_sz
        ecnt = int.from_bytes(b[p:p + 2], "big"); p += 2
        total = 0
        first = None
        for _ in range(ecnt):
            p += idx_sz
            eoff = int.from_bytes(b[p:p + off_sz], "big"); p += off_sz
            elen = int.from_bytes(b[p:p + len_sz], "big"); p += len_sz
            if first is None:
                first = (base + eoff, elen)
            total += elen
        if iid == primary:
            # method 0: absolute file offsets; method 1: idat-relative
            assert method in (0, 1), f"unexpected iloc method {method}"
            primary_bytes = total
            if ecnt == 1:
                if method == 0:
                    payload = b[first[0]:first[0] + first[1]]
                else:
                    assert idat is not None, "method 1 without idat"
                    payload = b[idat[0] + first[0]:idat[0] + first[0] + first[1]]
    # irot: ipco children in order; ipma associates primary → 1-based index
    irot = 0
    ipcos = find(data, ms, me, "iprp", "ipco")
    if ipcos:
        props = list(boxes(data, ipcos[0][0], ipcos[0][1]))
        ipma = find(data, ms, me, "iprp", "ipma")[0]
        q = ipma[0]
        iv2 = b[q]
        fl = int.from_bytes(b[q + 1:q + 4], "big")
        q += 4
        ecount = int.from_bytes(b[q:q + 4], "big"); q += 4
        for _ in range(ecount):
            if iv2 == 0:
                iid = int.from_bytes(b[q:q + 2], "big"); q += 2
            else:
                iid = int.from_bytes(b[q:q + 4], "big"); q += 4
            acnt = b[q]; q += 1
            for _ in range(acnt):
                if fl & 1:
                    pidx = int.from_bytes(b[q:q + 2], "big") & 0x7fff; q += 2
                else:
                    pidx = b[q] & 0x7f; q += 1
                if iid == primary and 1 <= pidx <= len(props):
                    typ, bs, be = props[pidx - 1]
                    if typ == "irot":
                        irot = b[bs] & 3
    return n_items, primary_type, primary_bytes, irot, payload


def parse_av1_seq(payload):
    """From-scratch OBU walk → (seq_profile, still_picture) of the first
    sequence-header OBU."""
    p = 0
    while p < len(payload):
        hdr = payload[p]
        assert hdr & 0x80 == 0, "forbidden bit"
        otype = (hdr >> 3) & 15
        has_ext = (hdr >> 2) & 1
        has_size = (hdr >> 1) & 1
        q = p + 1 + has_ext
        size = None
        if has_size:
            size = 0
            shift = 0
            while True:
                byte = payload[q]
                q += 1
                size |= (byte & 0x7f) << shift
                if byte & 0x80 == 0:
                    break
                shift += 7
        if otype == 1:  # OBU_SEQUENCE_HEADER
            bits = payload[q]
            return (bits >> 5) & 7, (bits >> 4) & 1
        assert size is not None, "unsized non-seq OBU"
        p = q + size
    raise AssertionError("no sequence header OBU")


# ------------------------------------------------------------- members
def make_members():
    av = load_avif()
    h = load_heif()
    members = []  # (name, bytes)
    rows = []     # expected engine rows

    avif_specs = [
        ("a420_33x21", 33, 21, 8, 3, False, 111),
        ("a420_64x40", 64, 40, 8, 3, False, 222),
        ("a444_17x9", 17, 9, 8, 1, False, 333),
        ("a400_24x16", 24, 16, 8, 4, False, 444),
        ("a420_alpha_20x14", 20, 14, 8, 3, True, 555),
        ("a420_10bit_16x12", 16, 12, 10, 3, False, 666),
        ("a444_alpha_11x7", 11, 7, 8, 1, True, 777),
        ("a420_7x5", 7, 5, 8, 3, False, 888)]
    for name, w, ht, depth, fmt, alpha, seed in avif_specs:
        data = avif_encode(av, w, ht, depth, fmt, alpha, seed)
        rw, rh, rd, ra = avif_decode_info(av, data)
        assert (rw, rh, rd, ra) == (w, ht, depth, alpha), \
            f"{name}: reference decode disagrees with construction"
        n_items, ptype, pbytes, irot, payload = walk_meta(data)
        assert ptype == "av01", f"{name}: primary type {ptype}"
        assert payload is not None, f"{name}: multi-extent primary"
        prof, still = parse_av1_seq(payload)
        members.append((name + ".avif", data))
        # obu_* expected values are CROSS-DOMAIN: max dims / bit depth from
        # the REFERENCE DECODE of the same member, mono/subsampling from the
        # construction format — the engine derives them from the BITSTREAM
        sub = {3: (1, 1), 1: (0, 0), 4: (1, 1)}[fmt]
        pm = avif_decode_plane_means(av, data)
        rows.append(dict(fname=name + ".avif", item_type=ptype, width=rw,
                         height=rh, depth=rd, has_alpha=ra, n_items=n_items,
                         irot=irot, primary_bytes=pbytes, seq_profile=prof,
                         still_picture=bool(still), obu_max_w=rw,
                         obu_max_h=rh, obu_bitdepth=rd,
                         obu_mono=(fmt == 4), obu_sub_x=sub[0],
                         obu_sub_y=sub[1], px_y_mean=pm[0], px_u_mean=pm[1],
                         px_v_mean=pm[2], px_a_mean=pm[3]))

    heic_specs = [
        ("h420_48x32", 48, 32, False, 1111),
        ("h420_31x17", 31, 17, False, 2222),
        ("hmono_40x24", 40, 24, True, 3333),
        ("h420_64x64", 64, 64, False, 4444)]
    import tempfile
    for name, w, ht, mono, seed in heic_specs:
        with tempfile.NamedTemporaryFile(suffix=".heic", delete=False) as tf:
            path = tf.name
        data = heif_encode(h, w, ht, mono, seed, path)
        os.unlink(path)
        rw, rh, rd, ra = heif_decode_info(h, data)
        assert (rw, rh) == (w, ht), f"{name}: dims disagree"
        n_items, ptype, pbytes, irot, _ = walk_meta(data)
        assert ptype in ("hvc1", "grid"), f"{name}: primary type {ptype}"
        # r18: the engine's from-scratch HEVC decoder now produces
        # pixels for hvc1 primaries — pin them with the REFERENCE
        # decoder's plane means (libheif -> libde265), like the avif
        # rows above
        pm = heif_decode_plane_means(h, data, mono, w, ht)
        members.append((name + ".heic", data))
        rows.append(dict(fname=name + ".heic", item_type=ptype, width=rw,
                         height=rh, depth=rd, has_alpha=ra, n_items=n_items,
                         irot=irot, primary_bytes=pbytes, seq_profile=None,
                         still_picture=None, obu_max_w=None, obu_max_h=None,
                         obu_bitdepth=None, obu_mono=None, obu_sub_x=None,
                         obu_sub_y=None, px_y_mean=pm[0], px_u_mean=pm[1],
                         px_v_mean=pm[2], px_a_mean=pm[3]))
    return members, rows


def cmd_refresh():
    """Recompute the e119 fixture rows from the COMMITTED members
    (src/main/resources/graft/avif_heif_members.json), without
    re-encoding — used when the row schema gains columns (r17: the
    px_*_mean pixel-oracle columns)."""
    av = load_avif()
    h = load_heif()
    members = json.load(open(os.path.join(
        ROOT, 'src/main/resources/graft/avif_heif_members.json')))
    rows = []
    for name in sorted(members):
        data = bytes.fromhex(members[name])
        n_items, ptype, pbytes, irot, payload = walk_meta(data)
        if name.endswith('.avif'):
            rw, rh, rd, ra = avif_decode_info(av, data)
            prof, still = parse_av1_seq(payload)
            pm = avif_decode_plane_means(av, data)
            mono = pm[1] is None
            sub = (0, 0) if (pm[1] is not None and name.startswith('a444'))                 else (1, 1)
            rows.append(dict(fname=name, item_type=ptype, width=rw,
                             height=rh, depth=rd, has_alpha=ra,
                             n_items=n_items, irot=irot,
                             primary_bytes=pbytes, seq_profile=prof,
                             still_picture=bool(still), obu_max_w=rw,
                             obu_max_h=rh, obu_bitdepth=rd, obu_mono=mono,
                             obu_sub_x=sub[0], obu_sub_y=sub[1],
                             px_y_mean=pm[0], px_u_mean=pm[1],
                             px_v_mean=pm[2], px_a_mean=pm[3]))
        else:
            rw, rh, rd, ra = heif_decode_info(h, data)
            rows.append(dict(fname=name, item_type=ptype, width=rw,
                             height=rh, depth=rd, has_alpha=ra,
                             n_items=n_items, irot=irot,
                             primary_bytes=pbytes, seq_profile=None,
                             still_picture=None, obu_max_w=None,
                             obu_max_h=None, obu_bitdepth=None,
                             obu_mono=None, obu_sub_x=None, obu_sub_y=None,
                             px_y_mean=None, px_u_mean=None,
                             px_v_mean=None, px_a_mean=None))
    write_fixture_rows(rows)


def write_fixture_rows(rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    cols = ["fname", "item_type", "width", "height", "depth", "has_alpha",
            "n_items", "irot", "primary_bytes", "seq_profile",
            "still_picture", "obu_max_w", "obu_max_h", "obu_bitdepth",
            "obu_mono", "obu_sub_x", "obu_sub_y", "px_y_mean", "px_u_mean",
            "px_v_mean", "px_a_mean"]
    typed = {
        "fname": pa.string(), "item_type": pa.string(),
        "width": pa.int32(), "height": pa.int32(), "depth": pa.int32(),
        "has_alpha": pa.bool_(), "n_items": pa.int32(), "irot": pa.int32(),
        "primary_bytes": pa.int64(), "seq_profile": pa.int32(),
        "still_picture": pa.bool_(), "obu_max_w": pa.int32(),
        "obu_max_h": pa.int32(), "obu_bitdepth": pa.int32(),
        "obu_mono": pa.bool_(), "obu_sub_x": pa.int32(),
        "obu_sub_y": pa.int32(), "px_y_mean": pa.float64(),
        "px_u_mean": pa.float64(), "px_v_mean": pa.float64(),
        "px_a_mean": pa.float64()}
    table = pa.table({c: pa.array([r[c] for r in rows], typed[c])
                      for c in cols})
    import pyarrow.parquet as _pq
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        out = os.path.join(ROOT, "fixtures", sf, "e119_avif.parquet")
        _pq.write_table(table, out)
        print(f"wrote {out}")
    for r in rows:
        print(r)


def cmd_fixture():
    import pyarrow as pa
    import pyarrow.parquet as pq
    members, rows = make_members()
    res = os.path.join(ROOT, "src/main/resources/graft/avif_heif_members.json")
    with open(res, "w") as f:
        json.dump({n: d.hex() for n, d in members}, f, indent=0)
    print(f"wrote {res}: {len(members)} members, "
          f"{sum(len(d) for _, d in members)} bytes")
    cols = ["fname", "item_type", "width", "height", "depth", "has_alpha",
            "n_items", "irot", "primary_bytes", "seq_profile",
            "still_picture", "obu_max_w", "obu_max_h", "obu_bitdepth",
            "obu_mono", "obu_sub_x", "obu_sub_y", "px_y_mean", "px_u_mean",
            "px_v_mean", "px_a_mean"]
    arrays = {
        "fname": pa.array([r["fname"] for r in rows], pa.string()),
        "item_type": pa.array([r["item_type"] for r in rows], pa.string()),
        "width": pa.array([r["width"] for r in rows], pa.int32()),
        "height": pa.array([r["height"] for r in rows], pa.int32()),
        "depth": pa.array([r["depth"] for r in rows], pa.int32()),
        "has_alpha": pa.array([r["has_alpha"] for r in rows], pa.bool_()),
        "n_items": pa.array([r["n_items"] for r in rows], pa.int32()),
        "irot": pa.array([r["irot"] for r in rows], pa.int32()),
        "primary_bytes": pa.array([r["primary_bytes"] for r in rows],
                                  pa.int64()),
        "seq_profile": pa.array([r["seq_profile"] for r in rows], pa.int32()),
        "still_picture": pa.array([r["still_picture"] for r in rows],
                                  pa.bool_()),
        "obu_max_w": pa.array([r["obu_max_w"] for r in rows], pa.int32()),
        "obu_max_h": pa.array([r["obu_max_h"] for r in rows], pa.int32()),
        "obu_bitdepth": pa.array([r["obu_bitdepth"] for r in rows],
                                 pa.int32()),
        "obu_mono": pa.array([r["obu_mono"] for r in rows], pa.bool_()),
        "obu_sub_x": pa.array([r["obu_sub_x"] for r in rows], pa.int32()),
        "obu_sub_y": pa.array([r["obu_sub_y"] for r in rows], pa.int32()),
        "px_y_mean": pa.array([r["px_y_mean"] for r in rows], pa.float64()),
        "px_u_mean": pa.array([r["px_u_mean"] for r in rows], pa.float64()),
        "px_v_mean": pa.array([r["px_v_mean"] for r in rows], pa.float64()),
        "px_a_mean": pa.array([r["px_a_mean"] for r in rows], pa.float64())}
    table = pa.table({c: arrays[c] for c in cols})
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        out = os.path.join(ROOT, "fixtures", sf, "e119_avif.parquet")
        pq.write_table(table, out)
        print(f"wrote {out}")
    for r in rows:
        print(r)


def cmd_sweep(n, seed):
    """Live differential members: n random-config REFERENCE-ENCODED avif
    streams as JSON lines {name, hex, width, height, depth, has_alpha,
    mono, sub_x, sub_y} — dims/depth/alpha from the reference DECODE,
    mono/subsampling from the construction format. The Scala side pins
    Heif.info + the full Av1 sequence-header parse against each.
    """
    av = load_avif()
    rng_state = seed

    def rnd(bound):
        nonlocal rng_state
        rng_state = (rng_state * 6364136223846793005
                     + 1442695040888963407) % (1 << 64)
        return (rng_state >> 33) % bound

    for i in range(n):
        w = 1 + rnd(120)
        h = 1 + rnd(90)
        depth = [8, 8, 10][rnd(3)]
        fmt = [3, 1, 4, 2][rnd(4)]
        alpha = rnd(4) == 0
        data = avif_encode(av, w, h, depth, fmt, alpha, seed + i * 977)
        rw, rh, rd, ra = avif_decode_info(av, data)
        assert (rw, rh, rd, ra) == (w, h, depth, alpha)
        sub = {3: (1, 1), 2: (1, 0), 1: (0, 0), 4: (1, 1)}[fmt]
        pm = avif_decode_plane_means(av, data)
        print(json.dumps(dict(name=f"s{i:04d}", hex=data.hex(), width=w,
                              height=h, depth=depth,
                              has_alpha=alpha, mono=(fmt == 4),
                              sub_x=sub[0], sub_y=sub[1],
                              px_means=pm)))


def cmd_sweep12(n, seed):
    """Live 12-bit differential members (same JSON shape as cmd_sweep):
    profile-2 streams across 420/444/422/mono at mixed speeds — the
    r18-fired 12-bit trigger's permanent live surface."""
    av = load_avif()
    av.avifEncoderSetCodecSpecificOption.restype = ctypes.c_int
    av.avifEncoderSetCodecSpecificOption.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    rng_state = seed

    def rnd(bound):
        nonlocal rng_state
        rng_state = (rng_state * 6364136223846793005
                     + 1442695040888963407) % (1 << 64)
        return (rng_state >> 33) % bound

    for i in range(n):
        w = 8 + rnd(120)
        h = 8 + rnd(96)
        fmt = [3, 1, 4, 2][rnd(4)]
        minq = 2 + rnd(48)
        data = avif_encode(av, w, h, 12, fmt, False, seed + i * 977,
                           opts=[("enable-cdef", str(rnd(2))),
                                 ("enable-restoration", str(rnd(2)))],
                           smooth=(rnd(2) == 1), minq=minq,
                           maxq=min(63, minq + 6 + rnd(10)),
                           speed=[4, 6][rnd(2)])
        rw, rh, rd, ra = avif_decode_info(av, data)
        assert (rw, rh, rd, ra) == (w, h, 12, False)
        sub = {3: (1, 1), 2: (1, 0), 1: (0, 0), 4: (1, 1)}[fmt]
        pm = avif_decode_plane_means(av, data)
        print(json.dumps(dict(name=f"d{i:04d}", hex=data.hex(), width=w,
                              height=h, depth=12,
                              has_alpha=False, mono=(fmt == 4),
                              sub_x=sub[0], sub_y=sub[1],
                              px_means=pm)))


def avif_encode_paletted(av, w, h, depth, fmt, seed, speed=6):
    """Encode a deterministic few-color screen-content-style image —
    sharp block-grid patterns with uncorrelated chroma geometry — the
    shapes the aom encoder answers with palette / screen-content coding
    paths. Returns bytes."""
    img = av.avifImageCreate(w, h, depth, fmt)
    assert av.avifImageAllocatePlanes(img, 1) == 0
    u64 = (ctypes.c_uint64 * 16).from_address(img)
    u32 = (ctypes.c_uint32 * 32).from_address(img)
    s = seed

    def rnd(bound):
        nonlocal s
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return (s >> 33) % bound

    mx = (1 << depth) - 1
    ncol = 2 + rnd(7)
    cols = sorted(set(rnd(mx + 1) for _ in range(ncol))) or [mx // 2]
    ucols = sorted(set(rnd(mx + 1) for _ in range(2 + rnd(3)))) or [mx // 2]
    grid = [4, 8, 8, 16][rnd(4)]
    ugrid = [8, 16, 16][rnd(3)]
    mode = rnd(3)       # 0 checker, 1 v-stripes, 2 random grid cells
    flat_luma = rnd(4) == 0
    cellmap = {}

    def lcol(x, y):
        if flat_luma:
            return mx // 2
        gx, gy = x // grid, y // grid
        if mode == 0:
            return cols[(gx + gy) % len(cols)]
        if mode == 1:
            return cols[gx % len(cols)]
        if (gx, gy) not in cellmap:
            cellmap[(gx, gy)] = cols[rnd(len(cols))]
        return cellmap[(gx, gy)]

    def ccol(x, y, pl):
        g = (x // ugrid + 2 * (y // ugrid)) % len(ucols)
        return ucols[g] if pl == 1 else ucols[len(ucols) - 1 - g]

    sub = 1 if fmt == 3 else 0
    nplanes = 1 if fmt == 4 else 3
    for pl in range(nplanes):
        rb = u32[12 + pl]
        pw = w if pl == 0 else ((w + sub) >> sub)
        ph = h if pl == 0 else ((h + sub) >> sub)
        stride = rb if depth == 8 else rb // 2
        ctor = ctypes.c_uint8 if depth == 8 else ctypes.c_uint16
        plane = (ctor * (stride * ph)).from_address(u64[3 + pl])
        for yy in range(ph):
            for xx in range(pw):
                plane[yy * stride + xx] = (lcol(xx, yy) if pl == 0
                                           else ccol(xx, yy, pl))
    enc = av.avifEncoderCreate()
    (ctypes.c_int32 * 3).from_address(enc)[2] = speed
    out = RW()
    assert av.avifEncoderWrite(enc, img, ctypes.byref(out)) == 0
    return ctypes.string_at(out.data, out.size)


def cmd_palsweep(n, seed):
    """Live palette/screen-content differential members (same JSON shape
    as cmd_sweep)."""
    av = load_avif()
    rng_state = seed

    def rnd(bound):
        nonlocal rng_state
        rng_state = (rng_state * 6364136223846793005
                     + 1442695040888963407) % (1 << 64)
        return (rng_state >> 33) % bound

    for i in range(n):
        w = 8 + rnd(88)
        h = 8 + rnd(72)
        depth = [8, 8, 8, 10][rnd(4)]
        fmt = [3, 1, 4][rnd(3)]
        data = avif_encode_paletted(av, w, h, depth, fmt, seed + i * 977)
        rw, rh, rd, ra = avif_decode_info(av, data)
        assert (rw, rh, rd, ra) == (w, h, depth, False)
        sub = {3: (1, 1), 1: (0, 0), 4: (1, 1)}[fmt]
        pm = avif_decode_plane_means(av, data)
        print(json.dumps(dict(name=f"p{i:04d}", hex=data.hex(), width=w,
                              height=h, depth=depth,
                              has_alpha=False, mono=(fmt == 4),
                              sub_x=sub[0], sub_y=sub[1],
                              px_means=pm)))


def cmd_cdefsweep(n, seed):
    """Live CDEF-exercising differential members: smooth-gradient
    content at heavy quantization with the encoder's CDEF search
    enabled (the default still-image config leaves CDEF off at the
    SEQUENCE level, so no other sweep reaches the CDEF filters). Same
    JSON shape as cmd_sweep.
    """
    av = load_avif()
    av.avifEncoderSetCodecSpecificOption.restype = ctypes.c_int
    av.avifEncoderSetCodecSpecificOption.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    rng_state = seed

    def rnd(bound):
        nonlocal rng_state
        rng_state = (rng_state * 6364136223846793005
                     + 1442695040888963407) % (1 << 64)
        return (rng_state >> 33) % bound

    for i in range(n):
        w = 10 + rnd(110)
        h = 10 + rnd(80)
        depth = [8, 8, 8, 10][rnd(4)]
        fmt = [3, 2, 1, 4][rnd(4)]
        data = avif_encode(av, w, h, depth, fmt, False, seed + i * 977,
                           opts=[("enable-cdef", "1"),
                                 ("enable-restoration", "0")],
                           smooth=True, minq=30 + rnd(15), maxq=55 + rnd(9),
                           speed=6)
        rw, rh, rd, ra = avif_decode_info(av, data)
        assert (rw, rh, rd, ra) == (w, h, depth, False)
        sub = {3: (1, 1), 2: (1, 0), 1: (0, 0), 4: (1, 1)}[fmt]
        pm = avif_decode_plane_means(av, data)
        print(json.dumps(dict(name=f"c{i:04d}", hex=data.hex(), width=w,
                              height=h, depth=depth,
                              has_alpha=False, mono=(fmt == 4),
                              sub_x=sub[0], sub_y=sub[1],
                              px_means=pm)))


def s4sweep_members(av, n, seed):
    """THE definition of the speed-4 sweep draw sequence, shared by
    cmd_s4sweep here and av1cal.py's full-plane calibration harness
    (ADVICE r17: av1cal previously carried a PRNG-identical copy that
    nothing enforced — banked repro names like f0012/f0023 are only
    regenerable while the draw sequence is unique). Yields
    (name, encoded_bytes, width, height, depth, fmt). Keyword-arg
    evaluation order inside the avif_encode call is part of the
    sequence — smooth draws before maxq.
    """
    av.avifEncoderSetCodecSpecificOption.restype = ctypes.c_int
    av.avifEncoderSetCodecSpecificOption.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    rng_state = seed

    def rnd(bound):
        nonlocal rng_state
        rng_state = (rng_state * 6364136223846793005
                     + 1442695040888963407) % (1 << 64)
        return (rng_state >> 33) % bound

    for i in range(n):
        w = 8 + rnd(49)
        h = 8 + rnd(49)
        depth = [8, 8, 10][rnd(3)]
        fmt = [3, 1, 4][rnd(3)]
        minq = 2 + rnd(38)
        data = avif_encode(av, w, h, depth, fmt, False, seed + i * 977,
                           opts=[("enable-cdef", "0"),
                                 ("enable-restoration", "0")],
                           smooth=(rnd(2) == 1), minq=minq,
                           maxq=min(63, minq + 6 + rnd(14)), speed=4)
        yield f"f{i:04d}", data, w, h, depth, fmt


def cmd_s4sweep(n, seed):
    """Live speed-4 differential members: small frames across the q
    range, encoder speed 4 — the features aom only picks below speed 6
    (filter-intra everywhere, deep tx splits, rare directional modes;
    the r17 drill class). Same JSON shape as cmd_sweep. Sizes stay
    <= 64x64: the known-open r17 classes (NOTES_r17) only reproduce on
    larger frames, so this pins the FIXED surface without flaking on
    the open one.
    """
    av = load_avif()
    for name, data, w, h, depth, fmt in s4sweep_members(av, n, seed):
        rw, rh, rd, ra = avif_decode_info(av, data)
        assert (rw, rh, rd, ra) == (w, h, depth, False)
        sub = {3: (1, 1), 1: (0, 0), 4: (1, 1)}[fmt]
        pm = avif_decode_plane_means(av, data)
        print(json.dumps(dict(name=name, hex=data.hex(), width=w,
                              height=h, depth=depth,
                              has_alpha=False, mono=(fmt == 4),
                              sub_x=sub[0], sub_y=sub[1],
                              px_means=pm)))


def cmd_edgesweep(n, seed):
    """Live coded-edge-overhang members (the r18 t1101/big_03 class):
    tiny frames at high q whose right/bottom-edge transforms overhang
    the coded mi area. The entropy-context store must stay clamped to
    the coded area or the neighbor dc-sign sums flip, which on these
    near-pure-flush streams (tails of 20-50 bytes) desyncs the final
    reads. Same JSON shape as cmd_sweep; mixed 8/10/12-bit."""
    av = load_avif()
    av.avifEncoderSetCodecSpecificOption.restype = ctypes.c_int
    av.avifEncoderSetCodecSpecificOption.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    rng_state = seed

    def rnd(bound):
        nonlocal rng_state
        rng_state = (rng_state * 6364136223846793005
                     + 1442695040888963407) % (1 << 64)
        return (rng_state >> 33) % bound

    emitted = 0
    i = 0
    while emitted < n:
        w = 16 + rnd(56)
        h = 16 + rnd(48)
        depth = [8, 10, 12][rnd(3)]
        minq = 40 + rnd(20)
        fmt = [3, 1, 4, 2][rnd(4)]
        try:
            data = avif_encode(av, w, h, depth, fmt, False,
                               seed * 1000 + i * 37,
                               opts=[("enable-cdef", str(rnd(2))),
                                     ("enable-restoration", str(rnd(2)))],
                               smooth=(rnd(2) == 1), minq=minq,
                               maxq=min(63, minq + 8), speed=[4, 6][rnd(2)])
        except Exception:
            i += 1
            continue
        rw, rh, rd, ra = avif_decode_info(av, data)
        assert (rw, rh, rd, ra) == (w, h, depth, False)
        sub = {3: (1, 1), 2: (1, 0), 1: (0, 0), 4: (1, 1)}[fmt]
        pm = avif_decode_plane_means(av, data)
        print(json.dumps(dict(name=f"e{i:04d}", hex=data.hex(), width=w,
                              height=h, depth=depth,
                              has_alpha=False, mono=(fmt == 4),
                              sub_x=sub[0], sub_y=sub[1],
                              px_means=pm)))
        emitted += 1
        i += 1


def cmd_probe():
    try:
        av = load_avif()
        print("libavif:", av.avifVersion().decode())
        buf = ctypes.create_string_buffer(256)
        av.avifCodecVersions(buf)
        print("codecs:", buf.value.decode())
    except Exception as e:
        print("libavif: UNAVAILABLE:", e)
    try:
        h = load_heif()
        print("libheif:", h.heif_get_version().decode())
    except Exception as e:
        print("libheif: UNAVAILABLE:", e)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fixture":
        cmd_fixture()
    elif len(sys.argv) > 1 and sys.argv[1] == "refresh":
        cmd_refresh()
    elif len(sys.argv) > 1 and sys.argv[1] == "sweep":
        cmd_sweep(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "palsweep":
        cmd_palsweep(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "cdefsweep":
        cmd_cdefsweep(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "s4sweep":
        cmd_s4sweep(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "sweep12":
        cmd_sweep12(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "edgesweep":
        cmd_edgesweep(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "probe":
        cmd_probe()
    else:
        raise SystemExit(
            "usage: fixture | sweep | palsweep | cdefsweep <n> <seed> | probe")
