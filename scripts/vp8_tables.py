#!/usr/bin/env python3
"""Dev-time, run-once: extract the VP8 entropy/quantizer tables from the
runtime's reference libwebp and emit src/main/scala/graft/operators/
Vp8Tables.scala.

The tables are PUBLIC data — they are printed in full in RFC 6386
(sections 13.4/13.5 coefficient probabilities, 11.4 keyframe B-mode
probabilities, 14.1 quantizer lookups) — but ~3,000 byte values cannot be
honestly transcribed from memory, so we extract them from the reference
decoder shipped on this runtime (/lib/x86_64-linux-gnu/libwebp.so.7.1.5)
and validate two ways:
 1. libwebp carries an independent second copy of each table on the
    encoder side; both copies must be byte-identical (checked here);
 2. the end-to-end differential sweep (Vp8Spec) decodes hundreds of
    reference-encoded streams — a single wrong byte in any probability
    table desynchronizes the arithmetic decoder and fails the sweep.

Locations were found by signature scan (documented in NOTES_r15):
 - ac quantizer, uint16[128], .rodata 0x5a100 (encoder copy 0x60800)
 - dc quantizer, uint8[128],  0x5a180 (encoder copy 0x60900)
 - kBands[16] {0,1,2,3,6,4,5,6,...,7} at 0x5a200 (spec-known, sanity)
 - coeff UPDATE probs [4][8][3][11] at 0x5a2a0 (encoder 0x60a40)
 - keyframe B-mode probs [10][10][9] at 0x5a6c0 (encoder 0x60ee0)
 - coeff DEFAULT probs [4][8][3][11] at 0x5a8a0 (encoder 0x61200)
   (type 0 / band 0 rows are all-128: unreachable, those blocks start
    at coefficient 1)
"""
import struct, sys

LIB = '/lib/x86_64-linux-gnu/libwebp.so.7.1.5'
data = open(LIB, 'rb').read()

def grab(dec_off, enc_off, n, name):
    a, b = data[dec_off:dec_off+n], data[enc_off:enc_off+n]
    assert a == b, f"{name}: decoder/encoder copies differ"
    return a

ac = grab(368896, 395264, 256, 'acTable')
dc = grab(369152, 395520, 128, 'dcTable')
bands = data[369280:369296]
assert list(bands) == [0,1,2,3,6,4,5,6,6,6,6,6,6,6,6,7], 'kBands'
upd = grab(369312, 395840, 1056, 'updateProbs')
bmode_lw = grab(370368, 396896, 900, 'kBModesProba')
# libwebp's B-mode enum orders {RD, VR, LD} = {4, 5, 6}; RFC 6386 orders
# {LD, RD, VR} = {4, 5, 6}. The repo decoder uses RFC numbering, so the
# [above][left] context axes are permuted here (the 9 in-row
# probabilities are tree-positional and identical in both).
to_lw = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]
bmode = bytes(bmode_lw[(to_lw[a] * 10 + to_lw[l]) * 9 + p]
              for a in range(10) for l in range(10) for p in range(9))
coef = grab(371296, 397824, 1056, 'coeffProbs')
assert bmode[:9] == bytes([231,120,48,89,115,113,120,152,112]), 'kfB[0][0]'
assert coef[:33] == bytes([128]*33), 'type0/band0 filler'
assert list(coef[33:44]) == [253,136,254,255,228,219,128,128,128,128,128]

acv = struct.unpack('<128H', ac)
assert acv[0] == 4 and acv[127] == 284 and all(x<y for x,y in zip(acv,acv[1:]))
dcv = list(dc)
assert dcv[0] == 4 and dcv[127] == 157

def hexs(b, per=96):
    h = b.hex()
    return '\n'.join('    "%s" +' % h[i:i+per] for i in range(0, len(h), per))

out = f'''package graft.operators

/** VP8 entropy & quantizer tables (RFC 6386 sections 11.4, 13.4/13.5,
  * 14.1 — PUBLIC data). Values extracted by scripts/vp8_tables.py from
  * the runtime's reference decoder (libwebp.so.7.1.5 .rodata) rather
  * than hand-transcribed: libwebp carries independent decoder- and
  * encoder-side copies of every table and both copies were verified
  * byte-identical at extraction time; end-to-end validation is the
  * Vp8Spec differential sweep against WebPDecodeYUV/RGBA (a single
  * wrong byte desynchronizes the arithmetic decoder). Layout notes in
  * the extractor header.
  */
private[operators] object Vp8Tables {{
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  /** Default coefficient probabilities [4 types][8 bands][3 ctx][11]. */
  val CoeffProbs: Array[Byte] = unhex(
{hexs(coef)}
    "")

  /** Coefficient probability UPDATE probabilities, same shape. */
  val UpdateProbs: Array[Byte] = unhex(
{hexs(upd)}
    "")

  /** Keyframe intra 4x4 (B) mode probabilities [10 above][10 left][9]. */
  val KfBModeProbs: Array[Byte] = unhex(
{hexs(bmode)}
    "")

  /** DC quantizer lookup, index 0..127. */
  val DcTable: Array[Int] = Array(
{', '.join(str(v) for v in dcv)})

  /** AC quantizer lookup, index 0..127. */
  val AcTable: Array[Int] = Array(
{', '.join(str(v) for v in acv)})
}}
'''
# wrap the two long Array(...) literals
import textwrap
lines = []
for ln in out.split('\n'):
    if len(ln) > 110 and ln[0].isdigit() or len(ln) > 110 and ln.startswith('4,'):
        lines.extend(textwrap.wrap(ln, 100, subsequent_indent='    '))
    else:
        lines.append(ln)
path = 'src/main/scala/graft/operators/Vp8Tables.scala'
open(path, 'w').write('\n'.join(lines) + '\n')
print('wrote', path)
