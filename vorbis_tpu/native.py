"""ctypes loader for the host-side native kernels (native/vorbisnative.c).

Gracefully degrades: if the shared object is missing it is built on
first import when a C compiler is available; otherwise `lib` is None
and callers fall back to the numpy paths.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_vorbisnative.so")

lib = None
_raw = None


def _load():
    global lib
    if lib is not None:
        return lib
    # run the (mtime-gated, idempotent) build unconditionally: a stale
    # .so from an older source would otherwise load but lack newer
    # symbols, turning the graceful numpy fallback into AttributeError
    script = os.path.join(_HERE, "..", "native", "build.sh")
    try:
        subprocess.run(["sh", script], check=True,
                       capture_output=True, text=True)
    except Exception:
        if not os.path.exists(_SO):
            return None
    try:
        L = C.CDLL(_SO)
    except OSError:
        return None
    L.vn_pack_bits.restype = C.c_long
    L.vn_pack_bits.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        C.c_long, np.ctypeslib.ndpointer(np.uint8, flags="C")]
    L.vn_read_fields.restype = C.c_long
    L.vn_read_fields.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C"), C.c_long,
        C.POINTER(C.c_long), C.c_int,
        np.ctypeslib.ndpointer(np.int64, flags="C"), C.c_long]
    L.vn_pack_bits_multi.restype = C.c_long
    L.vn_pack_bits_multi.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        C.c_long, C.c_long,
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C")]
    L.vn_ogg_crc.restype = C.c_long
    L.vn_ogg_crc.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C"), C.c_long,
        C.c_uint32]
    L.vn_ogg_pages.restype = C.c_long
    L.vn_ogg_pages.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C"), C.c_long,
        np.ctypeslib.ndpointer(np.uint8, flags="C"), C.c_long,
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        C.c_long, C.c_uint32, C.c_int, C.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C")]
    L.vn_huff_decode.restype = C.c_long
    L.vn_huff_decode.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C"), C.c_long,
        C.POINTER(C.c_long),
        np.ctypeslib.ndpointer(np.int32, flags="C"), C.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"), C.c_int,
        np.ctypeslib.ndpointer(np.int64, flags="C"), C.c_long]
    L.vn_rescue_walk.restype = C.c_long
    L.vn_rescue_walk.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        C.c_long, C.c_long,
        np.ctypeslib.ndpointer(np.int32, flags="C"), C.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C")]
    L.vn_schedule.restype = C.c_long
    L.vn_schedule.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        C.c_long, C.c_long, C.c_long, C.c_long,
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C")]
    # raw-pointer twin for the hot per-packet Huffman calls: the
    # ndpointer from_param marshalling costs more than the decode
    global _raw
    _raw = C.CDLL(_SO)
    _raw.vn_huff_decode.restype = C.c_long
    lib = L
    return lib


def pack_bits(values: np.ndarray, nbits: np.ndarray):
    """Native LSB-first packer; returns (bytes, total_bits) or None if
    the native library is unavailable."""
    L = _load()
    if L is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.uint64)
    nbits32 = np.ascontiguousarray(nbits, dtype=np.int32)
    total = int(nbits32.sum(dtype=np.int64))
    out = np.zeros(((total + 7) >> 3) + 8, np.uint8)
    got = L.vn_pack_bits(values, nbits32, len(values), out)
    assert got == total, (got, total)
    return out[:(total + 7) >> 3].tobytes(), total


class HuffDecoder:
    """Two-level table Huffman decoder over a codebook (built once per
    Codebook; reference: codebook.c decode_packed_entry_number's
    firsttable + bisection replaced by an explicit escape table)."""

    K = 10

    def __init__(self, codewords, lengths, K2=None):
        L = _load()
        self.ok = L is not None
        if not self.ok:
            return
        K = self.K
        lengths = np.asarray(lengths, np.int64)
        maxlen = int(lengths.max(initial=0))
        K2 = K2 or max(1, maxlen - K)
        self.K2 = K2
        t1 = np.full(1 << K, -1, np.int32)
        groups = {}
        for e in range(len(lengths)):
            ln = int(lengths[e])
            if ln == 0:
                continue
            c = int(codewords[e])
            if ln <= K:
                t1[c::1 << ln] = (e << 6) | ln
            else:
                groups.setdefault(c & ((1 << K) - 1), []).append(
                    (c, ln, e))
        sec = []
        offs = [0]
        for w, items in groups.items():
            t2 = np.full(1 << K2, -1, np.int32)
            for c, ln, e in items:
                rest = c >> K
                step = 1 << (ln - K)
                t2[rest::step] = (e << 6) | ln
            t1[w] = -(len(sec)) - 2   # escape to secondary table
            sec.append(t2)
            offs.append(offs[-1] + (1 << K2))
        self.t1 = np.ascontiguousarray(t1)
        self.sec = (np.concatenate(sec).astype(np.int32)
                    if sec else np.zeros(1, np.int32))
        self.sec = np.ascontiguousarray(self.sec)
        self.offs = np.ascontiguousarray(np.asarray(offs, np.int64))
        # raw pointers (arrays are pinned by self references)
        self._t1p = C.c_void_p(self.t1.ctypes.data)
        self._secp = C.c_void_p(self.sec.ctypes.data)
        self._offp = C.c_void_p(self.offs.ctypes.data)

    def decode(self, data: np.ndarray, nbits_total: int, pos: int,
               count: int):
        """Decode up to count entries; returns (entries, new_pos,
        ndecoded)."""
        _load()
        out = np.empty(count, np.int64)
        p = C.c_long(pos)
        got = _raw.vn_huff_decode(
            C.c_void_p(data.ctypes.data), C.c_long(nbits_total),
            C.byref(p), self._t1p, C.c_int(self.K), self._secp,
            self._offp, C.c_int(self.K2),
            C.c_void_p(out.ctypes.data), C.c_long(count))
        return out[:got], int(p.value), int(got)


class _ImTab(C.Structure):
    """Mirrors native vn_imtab (int32 n, nstages, then 14 pointers)."""
    _fields_ = [("n", C.c_int32), ("nstages", C.c_int32),
                ("T", C.c_void_p), ("sa", C.c_void_p),
                ("sb", C.c_void_p), ("ia", C.c_void_p),
                ("ib", C.c_void_p), ("ta", C.c_void_p),
                ("tb", C.c_void_p), ("stageP", C.c_void_p),
                ("tc_all", C.c_void_p), ("e0", C.c_void_p),
                ("e1", C.c_void_p), ("tC", C.c_void_p),
                ("tD", C.c_void_p), ("stage_off", C.c_void_p)]


def _imdct_pack(L, n):
    """Marshaled IMDCT index tables for blocksize n (cached on L; the
    pack dict pins the arrays and carries a ready vn_imtab struct)."""
    from .ops.mdct import _imdct_index_tables
    key = f"_imdct_pack_{n}"
    pack = getattr(L, key, None)
    if pack is None:
        tbl = _imdct_index_tables(n)
        stageP = np.asarray([p for p, _ in tbl["stages"]], np.int32)
        offs, tcs = [], []
        acc = 0
        for _, tc in tbl["stages"]:
            offs.append(acc)
            tcs.append(np.asarray(tc, np.int32))
            acc += len(tc)
        pack = dict(
            T=np.ascontiguousarray(tbl["T"], np.float32),
            ia=np.ascontiguousarray(tbl["ia"], np.int32),
            ib=np.ascontiguousarray(tbl["ib"], np.int32),
            ta=np.ascontiguousarray(tbl["ta"], np.int32),
            tb=np.ascontiguousarray(tbl["tb"], np.int32),
            sa=np.ascontiguousarray(tbl["sa"], np.float32),
            sb=np.ascontiguousarray(tbl["sb"], np.float32),
            stageP=stageP,
            stage_off=np.asarray(offs, np.int64),
            tc_all=(np.concatenate(tcs).astype(np.int32)
                    if tcs else np.zeros(1, np.int32)),
            e0=np.ascontiguousarray(tbl["e0"], np.int32),
            e1=np.ascontiguousarray(tbl["e1"], np.int32),
            tC=np.ascontiguousarray(tbl["tC"], np.int32),
            tD=np.ascontiguousarray(tbl["tD"], np.int32))
        t = _ImTab()
        t.n = n
        t.nstages = len(pack["stageP"])
        for f in ("T", "sa", "sb", "ia", "ib", "ta", "tb", "stageP",
                  "tc_all", "e0", "e1", "tC", "tD", "stage_off"):
            setattr(t, f, pack[f].ctypes.data)
        pack["tab"] = t
        setattr(L, key, pack)
    return pack


def imdct_tab(n):
    """ctypes vn_imtab for blocksize n (or None without the lib)."""
    L = _load()
    if L is None:
        return None
    return _imdct_pack(L, n)["tab"]


def imdct_batch(spec: np.ndarray, n: int):
    """Native bit-exact batched IMDCT (vn_imdct_batch): (B, n//2)
    float32 -> (B, n).  Returns None when the library is unavailable —
    caller falls back to ops.mdct.imdct (identical output)."""
    L = _load()
    if L is None:
        return None
    pack = _imdct_pack(L, n)
    spec = np.ascontiguousarray(spec, np.float32)
    B = spec.shape[0]
    out = np.empty((B, n), np.float32)

    def ptr(a):
        return C.c_void_p(a.ctypes.data)

    common = (C.c_int(n), ptr(pack["T"]),
              ptr(pack["ia"]), ptr(pack["ib"]), ptr(pack["ta"]),
              ptr(pack["tb"]), ptr(pack["sa"]), ptr(pack["sb"]),
              ptr(pack["stageP"]), ptr(pack["stage_off"]),
              C.c_int(len(pack["stageP"])), ptr(pack["tc_all"]),
              ptr(pack["e0"]), ptr(pack["e1"]), ptr(pack["tC"]),
              ptr(pack["tD"]))
    # bulk frames ride the 16-lane frame-tiled kernel (bit-identical
    # per-frame op order, AVX-vectorized across frames); the remainder
    # takes the scalar kernel
    VNL = 16
    Bt = (B // VNL) * VNL
    if Bt:
        scratch16 = np.empty(3 * (n // 2) * VNL, np.float32)
        L.vn_imdct_batch16.restype = C.c_long
        L.vn_imdct_batch16.argtypes = None
        L.vn_imdct_batch16(ptr(spec), C.c_long(Bt), *common,
                           ptr(out), ptr(scratch16))
    if Bt < B:
        scratch = np.empty(n // 2, np.float32)
        L.vn_imdct_batch.restype = C.c_long
        L.vn_imdct_batch.argtypes = None
        L.vn_imdct_batch(
            C.c_void_p(spec[Bt:].ctypes.data), C.c_long(B - Bt),
            *common, C.c_void_p(out[Bt:].ctypes.data), ptr(scratch))
    return out


def ogg_crc(data: bytes, crc: int = 0):
    """Native Ogg CRC; returns None if the library is unavailable."""
    L = _load()
    if L is None:
        return None
    arr = np.frombuffer(bytes(data), np.uint8)
    return int(L.vn_ogg_crc(arr, len(arr), crc)) & 0xFFFFFFFF


def ogg_pages(pk_l, pk_s, ilk, isshort, sizes, gps, serialno, pageno,
              per_page=16, eos_last=True):
    """Assemble one stream's audio pages in one native call.

    pk_l (Fl, wl) / pk_s (Fs, ws) uint8 packet rows; per-packet ilk /
    isshort / sizes / gps.  Returns (pages_bytes, next_pageno) or None
    without the library."""
    L = _load()
    if L is None:
        return None
    pk_l = np.ascontiguousarray(pk_l, np.uint8)
    pk_s = np.ascontiguousarray(pk_s, np.uint8)
    ilk = np.ascontiguousarray(ilk, np.int64)
    iss = np.ascontiguousarray(isshort, np.uint8)
    sizes = np.ascontiguousarray(sizes, np.int64)
    gps = np.ascontiguousarray(gps, np.int64)
    npkt = len(sizes)
    cap = int(sizes.sum()) + npkt * (27 + 255) + 64
    out = np.empty(cap, np.uint8)
    pgio = np.array([pageno], np.int64)
    wl = pk_l.shape[1] if pk_l.ndim == 2 and pk_l.shape[0] else 1
    ws = pk_s.shape[1] if pk_s.ndim == 2 and pk_s.shape[0] else 1
    n = L.vn_ogg_pages(pk_l, C.c_long(wl), pk_s, C.c_long(ws),
                       ilk, iss, sizes, gps, C.c_long(npkt),
                       C.c_uint32(serialno & 0xFFFFFFFF),
                       C.c_int(per_page),
                       C.c_int(1 if eos_last else 0), out, pgio)
    return out[:n].tobytes(), int(pgio[0])


def ogg_scan(data: bytes, serialno=None):
    """Native Ogg page walk -> packet arrays in ONE call
    (vn_ogg_scan; replaces the Python OggStreamReader on the decode
    hot path).  Returns (blob uint8, off, lens, gp, eos, serial) —
    packet i is blob[off[i]:off[i]+lens[i]], gp -1 where the page
    granulepos doesn't land on it — or None without the library."""
    L = _load()
    if L is None:
        return None
    arr = np.frombuffer(data, np.uint8)
    n = len(arr)
    blob = np.empty(n + 8, np.uint8)
    maxpkt = n // 16 + 64

    def ptr(a):
        return C.c_void_p(a.ctypes.data)

    if not getattr(L, "_ogg_scan_sig", False):
        L.vn_ogg_scan.restype = C.c_long
        L.vn_ogg_scan.argtypes = None
        L._ogg_scan_sig = True
    while True:
        off = np.empty(maxpkt, np.int64)
        lens = np.empty(maxpkt, np.int64)
        gp = np.empty(maxpkt, np.int64)
        eos = np.empty(maxpkt, np.uint8)
        ser = np.asarray(
            [-1 if serialno is None else int(serialno)], np.int64)
        got = L.vn_ogg_scan(ptr(arr), C.c_long(n), ptr(ser), ptr(blob),
                            ptr(off), ptr(lens), ptr(gp), ptr(eos),
                            C.c_long(maxpkt))
        if got >= 0:
            return (blob, off[:got], lens[:got], gp[:got], eos[:got],
                    int(ser[0]))
        maxpkt *= 4
        if maxpkt > 4 * n + 1024:
            raise RuntimeError("ogg_scan packet overflow")


def pack_bits_multi(values: np.ndarray, nbits: np.ndarray):
    """Pack every row of (F, C) fields as its own packet in ONE native
    call; returns list of bytes, or None without the library."""
    L = _load()
    if L is None:
        return None
    values = np.ascontiguousarray(values, np.uint64)
    nbits = np.ascontiguousarray(nbits, np.int32)
    F, Cc = values.shape
    bits = nbits.astype(np.int64).sum(1)
    sizes = (bits + 7) >> 3
    off = np.zeros(F, np.int64)
    np.cumsum(sizes[:-1] + 8, out=off[1:])   # +8 slack per packet
    out = np.zeros(int(off[-1] + sizes[-1] + 16), np.uint8)
    nbytes = np.zeros(F, np.int64)
    L.vn_pack_bits_multi(values, nbits, F, Cc, out, off, nbytes)
    return [out[off[f]:off[f] + nbytes[f]].tobytes() for f in range(F)]


def rescue_walk(T1, T2, wlen, smax):
    """Stretch-rescue lockstep walk over device-built trigger tables
    (T1/T2: (smax//2+1, C, Lw) bool, wlen: (C,) window lengths).
    Returns (newmk (C, Lw+2) bool, retrig (C,) bool) or None without
    the library.  Reference state machine: envelope.c:569-681."""
    L = _load()
    if L is None:
        return None
    T1 = np.ascontiguousarray(T1, np.uint8)
    T2 = np.ascontiguousarray(T2, np.uint8)
    _, Cc, Lw = T1.shape
    wlen = np.ascontiguousarray(wlen, np.int32)
    newmk = np.zeros((Cc, Lw + 2), np.uint8)
    retrig = np.zeros(Cc, np.uint8)
    L.vn_rescue_walk(T1, T2, Cc, Lw, wlen, int(smax), newmk, retrig)
    return newmk.astype(bool), retrig.astype(bool)


def schedule(marks, ns, n0, n1):
    """Envelope marks -> block schedule via the native blockout state
    machine (reference: block.c:557-812).  Returns (centers, Ws,
    impulse) or None without the library."""
    L = _load()
    if L is None:
        return None
    marks = np.ascontiguousarray(marks, np.uint8)
    nmk = len(marks)
    hop = n1 // 2
    cap = (hop + int(ns) - hop) // (n0 // 2) + 3
    centers = np.empty(cap, np.int64)
    Ws = np.empty(cap, np.int64)
    imp = np.empty(cap, np.uint8)
    cnt = L.vn_schedule(marks, nmk, int(ns), int(n0), int(n1),
                        centers, Ws, imp)
    assert 0 < cnt <= cap, (cnt, cap)
    return centers[:cnt], Ws[:cnt], imp[:cnt].astype(bool)
