#!/usr/bin/env python3
"""One-off full-plane AV1 calibration vector: encode a single member
with explicit parameters and emit the av1cal JSON line (payload +
reference planes). Drill companion to av1cal.py for the NOTES-banked
repro incantations (lowq/q35/q45 classes).

  python3 scripts/av1one.py <name> <w> <h> <seed> <smooth 0|1> \
      <minq> <maxq> <speed> [depth [fmt]]
"""
import importlib.util
import json
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "ahr", os.path.join(os.path.dirname(__file__), "avif_heif_reference.py"))
ahr = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ahr)

_c = importlib.util.spec_from_file_location(
    "av1cal", os.path.join(os.path.dirname(__file__), "av1cal.py"))
av1cal = importlib.util.module_from_spec(_c)
_c.loader.exec_module(av1cal)


def main():
    import ctypes
    name = sys.argv[1]
    w, h, seed, smooth, minq, maxq, speed = [int(a) for a in sys.argv[2:9]]
    depth = int(sys.argv[9]) if len(sys.argv) > 9 else 8
    fmt = int(sys.argv[10]) if len(sys.argv) > 10 else 3
    av = ahr.load_avif()
    av.avifEncoderSetCodecSpecificOption.restype = ctypes.c_int
    av.avifEncoderSetCodecSpecificOption.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    data = ahr.avif_encode(av, w, h, depth, fmt, False, seed,
                           opts=[("enable-cdef", "0"),
                                 ("enable-restoration", "0")],
                           smooth=bool(smooth), minq=minq, maxq=maxq,
                           speed=speed)
    ww, hh, dd, planes = av1cal.decode_planes(av, data)
    payload = av1cal.mdat_payload(data)
    print(json.dumps(dict(name=name, w=ww, h=hh, depth=dd,
                          payload=payload.hex(), planes=planes)))


if __name__ == "__main__":
    main()
