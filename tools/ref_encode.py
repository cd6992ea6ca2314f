#!/usr/bin/env python
"""Run the compiled reference encoder in a CLEAN process and emit its
packets.  Used as the golden-packet oracle: running the reference
inside the test process is unreliable (the host process's FPU state —
e.g. FTZ set by ML runtimes — changes the LPC edge packets).

Usage: python tools/ref_encode.py <pcm.npy> <rate> <quality> <out.pkl>
           [managed_kbps] [ctl_json]

ctl_json: optional JSON dict applied via vorbis_encode_ctl between
setup and init, e.g. '{"lowpass": 8.0, "iblock": -10.0, "coupling": 0}'.
"""

import ctypes as C
import json
import pickle
import sys

import numpy as np

LIB = "/tmp/refdsp/libvorbisref_nosym.so"


class vorbis_info(C.Structure):
    _fields_ = [("version", C.c_int), ("channels", C.c_int),
                ("rate", C.c_long), ("bu", C.c_long), ("bn", C.c_long),
                ("bl", C.c_long), ("bw", C.c_long), ("cs", C.c_void_p),
                ("_p", C.c_byte * 64)]


class ogg_packet(C.Structure):
    _fields_ = [("packet", C.POINTER(C.c_ubyte)), ("bytes", C.c_long),
                ("b_o_s", C.c_long), ("e_o_s", C.c_long),
                ("granulepos", C.c_int64), ("packetno", C.c_int64)]


def _blob(n):
    class B(C.Structure):
        _fields_ = [("x", C.c_byte * n)]

    return B()


def main():
    pcm = np.load(sys.argv[1])
    rate = int(sys.argv[2])
    quality = float(sys.argv[3])
    out = sys.argv[4]
    managed = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    ctl = json.loads(sys.argv[6]) if len(sys.argv) > 6 else {}
    lib = C.CDLL(LIB, mode=C.RTLD_GLOBAL)
    lib.vorbis_analysis_buffer.restype = C.POINTER(C.POINTER(C.c_float))
    ch, ns = pcm.shape
    vi = vorbis_info()
    lib.vorbis_info_init(C.byref(vi))
    if managed:
        r = lib.vorbis_encode_setup_managed(
            C.byref(vi), ch, C.c_long(rate), C.c_long(managed * 1000),
            C.c_long(managed * 1000), C.c_long(managed * 1000))
    else:
        r = lib.vorbis_encode_setup_vbr(C.byref(vi), ch, C.c_long(rate),
                                        C.c_float(quality))
    assert r == 0, r
    if "lowpass" in ctl:
        v = C.c_double(ctl["lowpass"])
        assert lib.vorbis_encode_ctl(C.byref(vi), 0x21, C.byref(v)) == 0
    if "iblock" in ctl:
        v = C.c_double(ctl["iblock"])
        assert lib.vorbis_encode_ctl(C.byref(vi), 0x31, C.byref(v)) == 0
    if "coupling" in ctl:
        v = C.c_int(ctl["coupling"])
        assert lib.vorbis_encode_ctl(C.byref(vi), 0x41, C.byref(v)) == 0
    if "ratemanage2" in ctl:
        # OV_ECTL_RATEMANAGE2_SET (vorbisenc.h:269-289, code 0x15)
        class rm2(C.Structure):
            _fields_ = [("management_active", C.c_int),
                        ("bitrate_limit_min_kbps", C.c_long),
                        ("bitrate_limit_max_kbps", C.c_long),
                        ("bitrate_limit_reservoir_bits", C.c_long),
                        ("bitrate_limit_reservoir_bias", C.c_double),
                        ("bitrate_average_kbps", C.c_long),
                        ("bitrate_average_damping", C.c_double)]

        a = ctl["ratemanage2"]
        v = rm2(int(a["management_active"]), int(a["min"]),
                int(a["max"]), int(a["reservoir"]), float(a["bias"]),
                int(a["av"]), float(a["damp"]))
        assert lib.vorbis_encode_ctl(C.byref(vi), 0x15,
                                     C.byref(v)) == 0
    r = lib.vorbis_encode_setup_init(C.byref(vi))
    assert r == 0, r
    vd = _blob(4096)
    vb = _blob(4096)
    vc = _blob(1024)
    lib.vorbis_comment_init(C.byref(vc))
    lib.vorbis_analysis_init(C.byref(vd), C.byref(vi))
    lib.vorbis_block_init(C.byref(vd), C.byref(vb))
    h1, h2, h3 = ogg_packet(), ogg_packet(), ogg_packet()
    lib.vorbis_analysis_headerout(C.byref(vd), C.byref(vc), C.byref(h1),
                                  C.byref(h2), C.byref(h3))
    headers = [C.string_at(h.packet, h.bytes) for h in (h1, h2, h3)]
    buf = lib.vorbis_analysis_buffer(C.byref(vd), C.c_int(ns))
    for c in range(ch):
        C.memmove(buf[c], np.ascontiguousarray(pcm[c]).ctypes.data, 4 * ns)
    lib.vorbis_analysis_wrote(C.byref(vd), C.c_int(ns))
    lib.vorbis_analysis_wrote(C.byref(vd), C.c_int(0))
    packets = []
    op = ogg_packet()
    while lib.vorbis_analysis_blockout(C.byref(vd), C.byref(vb)) == 1:
        lib.vorbis_analysis(C.byref(vb), None)
        lib.vorbis_bitrate_addblock(C.byref(vb))
        while lib.vorbis_bitrate_flushpacket(C.byref(vd), C.byref(op)):
            packets.append((C.string_at(op.packet, op.bytes),
                            int(op.granulepos), bool(op.e_o_s)))
    with open(out, "wb") as f:
        pickle.dump({"headers": headers, "packets": packets}, f)


if __name__ == "__main__":
    main()
