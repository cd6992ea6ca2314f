"""Golden oracle: drive the *system* libvorbis/libvorbisenc/libvorbisfile
shared libraries via ctypes.

The system libraries are stock libvorbis 1.3.7 (the same core version the
reference fork is based on; its decode path is unmodified by aoTuV, whose
changes are encoder-side).  They give us:

  * reference-encoded .ogg test vectors at any (quality, rate, channels)
  * golden float PCM decode output to compare bit-for-bit
  * a validator for OUR encoder's streams (if stock libvorbis decodes
    them cleanly, our headers/books/floor/residue bit syntax is right)

No reference source code is used here — this is plain FFI against the
distro's public ABI.
"""

from __future__ import annotations

import ctypes as C
import os

import numpy as np

_vorbis = C.CDLL("libvorbis.so.0", mode=C.RTLD_GLOBAL)
_venc = C.CDLL("libvorbisenc.so.2", mode=C.RTLD_GLOBAL)
_vfile = C.CDLL("libvorbisfile.so.3", mode=C.RTLD_GLOBAL)
_ogg = C.CDLL("libogg.so.0", mode=C.RTLD_GLOBAL)


# --- public ABI structs we must actually read fields from ---------------
class ogg_packet(C.Structure):
    _fields_ = [
        ("packet", C.POINTER(C.c_ubyte)),
        ("bytes", C.c_long),
        ("b_o_s", C.c_long),
        ("e_o_s", C.c_long),
        ("granulepos", C.c_int64),
        ("packetno", C.c_int64),
    ]


class ogg_page(C.Structure):
    _fields_ = [
        ("header", C.POINTER(C.c_ubyte)),
        ("header_len", C.c_long),
        ("body", C.POINTER(C.c_ubyte)),
        ("body_len", C.c_long),
    ]


class vorbis_info(C.Structure):
    _fields_ = [
        ("version", C.c_int),
        ("channels", C.c_int),
        ("rate", C.c_long),
        ("bitrate_upper", C.c_long),
        ("bitrate_nominal", C.c_long),
        ("bitrate_lower", C.c_long),
        ("bitrate_window", C.c_long),
        ("codec_setup", C.c_void_p),
        ("_pad", C.c_byte * 64),
    ]


# opaque, caller-allocated, generously oversized
def _opaque(n):
    class _O(C.Structure):
        _fields_ = [("_blob", C.c_byte * n)]

    return _O


vorbis_dsp_state = _opaque(4096)
vorbis_block = _opaque(4096)
vorbis_comment = _opaque(1024)
ogg_stream_state = _opaque(8192)
OggVorbis_File = _opaque(16384)

_vfile.ov_fopen.argtypes = [C.c_char_p, C.c_void_p]
_vfile.ov_read_float.restype = C.c_long
_vfile.ov_read.restype = C.c_long
_vfile.ov_info.restype = C.POINTER(vorbis_info)
_vfile.ov_pcm_total.restype = C.c_int64
_vfile.ov_pcm_total.argtypes = [C.c_void_p, C.c_int]
_vorbis.vorbis_analysis_buffer.restype = C.POINTER(C.POINTER(C.c_float))


def encode_vbr(pcm: np.ndarray, rate: int, quality: float,
               path: str, serialno: int = 777,
               managed_kbps: int | None = None,
               comments: dict | None = None) -> bytes:
    """Encode float PCM (channels, samples) with system libvorbisenc.

    quality is the VBR -0.1..1.0 scale; if managed_kbps is given, uses
    ABR management instead (vorbis_encode_init).
    Writes path and returns the ogg bytes.
    """
    pcm = np.ascontiguousarray(pcm, dtype=np.float32)
    ch, nsamp = pcm.shape
    vi = vorbis_info()
    _vorbis.vorbis_info_init(C.byref(vi))
    if managed_kbps is not None:
        r = _venc.vorbis_encode_init(C.byref(vi), C.c_long(ch), C.c_long(rate),
                                     C.c_long(managed_kbps * 1000),
                                     C.c_long(managed_kbps * 1000),
                                     C.c_long(managed_kbps * 1000))
    else:
        r = _venc.vorbis_encode_init_vbr(C.byref(vi), C.c_long(ch),
                                         C.c_long(rate), C.c_float(quality))
    assert r == 0, f"vorbis_encode_init failed: {r}"

    vc = vorbis_comment()
    _vorbis.vorbis_comment_init(C.byref(vc))
    for k, v in (comments or {}).items():
        _vorbis.vorbis_comment_add_tag(C.byref(vc), k.encode(), v.encode())
    vd = vorbis_dsp_state()
    vb = vorbis_block()
    _vorbis.vorbis_analysis_init(C.byref(vd), C.byref(vi))
    _vorbis.vorbis_block_init(C.byref(vd), C.byref(vb))

    os_ = ogg_stream_state()
    _ogg.ogg_stream_init(C.byref(os_), C.c_int(serialno))

    out = bytearray()

    def _pageout(flush=False):
        og = ogg_page()
        fn = _ogg.ogg_stream_flush if flush else _ogg.ogg_stream_pageout
        while fn(C.byref(os_), C.byref(og)):
            out.extend(C.string_at(og.header, og.header_len))
            out.extend(C.string_at(og.body, og.body_len))

    h1, h2, h3 = ogg_packet(), ogg_packet(), ogg_packet()
    _vorbis.vorbis_analysis_headerout(C.byref(vd), C.byref(vc), C.byref(h1),
                                      C.byref(h2), C.byref(h3))
    for h in (h1, h2, h3):
        _ogg.ogg_stream_packetin(C.byref(os_), C.byref(h))
    _pageout(flush=True)

    CHUNK = 1024
    pos = 0
    done_in = False
    while True:
        if not done_in:
            n = min(CHUNK, nsamp - pos)
            buf = _vorbis.vorbis_analysis_buffer(C.byref(vd), C.c_int(CHUNK))
            for c in range(ch):
                C.memmove(buf[c], pcm[c, pos:pos + n].ctypes.data, 4 * n)
            _vorbis.vorbis_analysis_wrote(C.byref(vd), C.c_int(n))
            pos += n
            if n == 0:
                done_in = True
        ended = False
        while _vorbis.vorbis_analysis_blockout(C.byref(vd), C.byref(vb)) == 1:
            _vorbis.vorbis_analysis(C.byref(vb), None)
            _vorbis.vorbis_bitrate_addblock(C.byref(vb))
            op = ogg_packet()
            while _vorbis.vorbis_bitrate_flushpacket(C.byref(vd), C.byref(op)):
                _ogg.ogg_stream_packetin(C.byref(os_), C.byref(op))
                _pageout()
        if done_in:
            break
    _pageout(flush=True)

    _ogg.ogg_stream_clear(C.byref(os_))
    _vorbis.vorbis_block_clear(C.byref(vb))
    _vorbis.vorbis_dsp_clear(C.byref(vd))
    _vorbis.vorbis_comment_clear(C.byref(vc))
    _vorbis.vorbis_info_clear(C.byref(vi))

    data = bytes(out)
    with open(path, "wb") as f:
        f.write(data)
    return data


def decode_float(path: str) -> tuple[np.ndarray, int]:
    """Decode an ogg file to float PCM (channels, samples) via
    libvorbisfile ov_read_float — the golden decode output."""
    vf = OggVorbis_File()
    r = _vfile.ov_fopen(path.encode(), C.byref(vf))
    assert r == 0, f"ov_fopen failed: {r}"
    vi = _vfile.ov_info(C.byref(vf), -1).contents
    ch, rate = vi.channels, int(vi.rate)
    chunks = []
    pcmp = C.POINTER(C.POINTER(C.c_float))()
    bs = C.c_int(0)
    while True:
        n = _vfile.ov_read_float(C.byref(vf), C.byref(pcmp), 4096, C.byref(bs))
        if n == 0:
            break
        assert n > 0, f"ov_read_float error {n}"
        frame = np.empty((ch, n), dtype=np.float32)
        for c in range(ch):
            frame[c] = np.ctypeslib.as_array(pcmp[c], shape=(n,))
        chunks.append(frame)
    _vfile.ov_clear(C.byref(vf))
    pcm = np.concatenate(chunks, axis=1) if chunks else np.zeros((ch, 0), np.float32)
    return pcm, rate


def decode_int16(path: str) -> tuple[np.ndarray, int]:
    """Decode to interleaved int16 via ov_read (little-endian, signed)."""
    vf = OggVorbis_File()
    r = _vfile.ov_fopen(path.encode(), C.byref(vf))
    assert r == 0, f"ov_fopen failed: {r}"
    vi = _vfile.ov_info(C.byref(vf), -1).contents
    ch, rate = vi.channels, int(vi.rate)
    buf = C.create_string_buffer(4096)
    bs = C.c_int(0)
    chunks = []
    while True:
        n = _vfile.ov_read(C.byref(vf), buf, 4096, 0, 2, 1, C.byref(bs))
        if n == 0:
            break
        assert n > 0
        chunks.append(np.frombuffer(buf.raw[:n], dtype="<i2").copy())
    _vfile.ov_clear(C.byref(vf))
    data = np.concatenate(chunks) if chunks else np.zeros(0, np.int16)
    return data.reshape(-1, ch).T, rate


def make_test_signal(rate=44100, seconds=1.0, ch=2, kind="mix", seed=0):
    """Deterministic test audio: windowed sine mix + noise bursts —
    exercises both long blocks (tonal) and short blocks (transients)."""
    n = int(rate * seconds)
    t = np.arange(n) / rate
    rng = np.random.RandomState(seed)
    out = np.zeros((ch, n), dtype=np.float32)
    for c in range(ch):
        sig = (0.45 * np.sin(2 * np.pi * (440 + 60 * c) * t)
               + 0.25 * np.sin(2 * np.pi * (1873 + 40 * c) * t + 0.3)
               + 0.1 * np.sin(2 * np.pi * 7902 * t))
        if kind == "mix":
            sig = sig + 0.02 * rng.randn(n)
            # transient clicks to force short blocks
            for pos in range(rate // 4, n, rate // 3):
                L = min(192, n - pos)
                sig[pos:pos + L] += (0.4 * rng.randn(L) *
                                     np.hanning(L)).astype(np.float64)
        env = np.minimum(1.0, np.minimum(t / 0.01, (t[-1] - t) / 0.01 + 1e-9))
        out[c] = (sig * env * 0.7).astype(np.float32)
    return np.clip(out, -1.0, 1.0)


# --- reference-tree oracle (compiled aoTuV/Lancer scalar lib) -------------
# Built once into /tmp/refdsp/libvorbisref.so by tests that need it; this
# is THE bit-exactness target (BASELINE.md: decode PCM bit-identical to
# the reference tree, which may differ from distro libvorbis by ulps).

REFLIB_PATH = "/tmp/refdsp/libvorbisref.so"


def build_reflib():
    """Compile the reference tree's lib (scalar paths) into a shared
    object linked against the distro libogg.  Idempotent."""
    import subprocess
    if os.path.exists(REFLIB_PATH):
        return REFLIB_PATH
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "build_reflib.sh")
    ref = os.environ.get("VORBIS_REF", "/root/reference")
    if not os.path.isdir(ref):
        import pytest
        pytest.skip("reference tree not available for the oracle lib",
                    allow_module_level=False)
    subprocess.run(["sh", script], check=True,
                   capture_output=True, text=True)
    return REFLIB_PATH


class RefLib:
    def __init__(self):
        build_reflib()
        self.lib = C.CDLL(REFLIB_PATH, mode=C.RTLD_GLOBAL)
        self.lib.vorbis_analysis_buffer.restype = C.POINTER(C.POINTER(C.c_float))
        self.lib.vorbis_synthesis_pcmout.restype = C.c_int
        self.lib.vorbis_window.restype = C.POINTER(C.c_float)

    def decode_packets(self, packets, halfrate=False):
        """packets: list of (bytes, granulepos_or_None, eos).  First 3
        must be the headers.  Returns (ch, n) float32 PCM decoded by the
        REFERENCE library."""
        lib = self.lib
        vi = vorbis_info()
        vc = vorbis_comment()
        lib.vorbis_info_init(C.byref(vi))
        lib.vorbis_comment_init(C.byref(vc))
        bufs = []

        def mkpkt(data, gp, eos, no):
            buf = C.create_string_buffer(bytes(data), len(data))
            bufs.append(buf)
            op = ogg_packet()
            op.packet = C.cast(buf, C.POINTER(C.c_ubyte))
            op.bytes = len(data)
            op.b_o_s = 1 if no == 0 else 0
            op.e_o_s = 1 if eos else 0
            op.granulepos = -1 if gp is None else gp
            op.packetno = no
            return op

        for i in range(3):
            data, gp, eos = packets[i]
            r = lib.vorbis_synthesis_headerin(C.byref(vi), C.byref(vc),
                                              C.byref(mkpkt(data, gp, eos, i)))
            assert r == 0, f"headerin failed {r}"
        if halfrate:
            assert lib.vorbis_synthesis_halfrate(C.byref(vi), 1) == 0
        vd = vorbis_dsp_state()
        vb = vorbis_block()
        assert lib.vorbis_synthesis_init(C.byref(vd), C.byref(vi)) == 0
        lib.vorbis_block_init(C.byref(vd), C.byref(vb))
        ch = vi.channels
        chunks = []
        pcmp = C.POINTER(C.POINTER(C.c_float))()
        for no, (data, gp, eos) in enumerate(packets[3:], start=3):
            op = mkpkt(data, gp, eos, no)
            if lib.vorbis_synthesis(C.byref(vb), C.byref(op)) == 0:
                lib.vorbis_synthesis_blockin(C.byref(vd), C.byref(vb))
            while True:
                n = lib.vorbis_synthesis_pcmout(C.byref(vd), C.byref(pcmp))
                if n <= 0:
                    break
                frame = np.empty((ch, n), dtype=np.float32)
                for c in range(ch):
                    frame[c] = np.ctypeslib.as_array(pcmp[c], shape=(n,))
                chunks.append(frame)
                lib.vorbis_synthesis_read(C.byref(vd), n)
        lib.vorbis_block_clear(C.byref(vb))
        lib.vorbis_dsp_clear(C.byref(vd))
        lib.vorbis_comment_clear(C.byref(vc))
        lib.vorbis_info_clear(C.byref(vi))
        return (np.concatenate(chunks, axis=1) if chunks
                else np.zeros((ch, 0), np.float32))

    def encode_packets(self, pcm, rate, quality, managed_kbps=None):
        """Encode with the REFERENCE encoder; returns (header_packets[3],
        audio list of (bytes, granulepos, eos)) — golden aoTuV packets."""
        lib = self.lib
        pcm = np.ascontiguousarray(pcm, dtype=np.float32)
        ch, nsamp = pcm.shape
        vi = vorbis_info()
        lib.vorbis_info_init(C.byref(vi))
        if managed_kbps is not None:
            r = lib.vorbis_encode_init(C.byref(vi), C.c_long(ch), C.c_long(rate),
                                       C.c_long(managed_kbps * 1000),
                                       C.c_long(managed_kbps * 1000),
                                       C.c_long(managed_kbps * 1000))
        else:
            r = lib.vorbis_encode_init_vbr(C.byref(vi), C.c_long(ch),
                                           C.c_long(rate), C.c_float(quality))
        assert r == 0, f"ref vorbis_encode_init failed: {r}"
        vc = vorbis_comment()
        lib.vorbis_comment_init(C.byref(vc))
        vd = vorbis_dsp_state()
        vb = vorbis_block()
        lib.vorbis_analysis_init(C.byref(vd), C.byref(vi))
        lib.vorbis_block_init(C.byref(vd), C.byref(vb))
        h1, h2, h3 = ogg_packet(), ogg_packet(), ogg_packet()
        lib.vorbis_analysis_headerout(C.byref(vd), C.byref(vc), C.byref(h1),
                                      C.byref(h2), C.byref(h3))
        headers = [C.string_at(h.packet, h.bytes) for h in (h1, h2, h3)]
        audio = []
        CHUNK = 1024
        pos = 0
        done = False
        while True:
            if not done:
                n = min(CHUNK, nsamp - pos)
                buf = lib.vorbis_analysis_buffer(C.byref(vd), C.c_int(CHUNK))
                for c in range(ch):
                    C.memmove(buf[c], pcm[c, pos:pos + n].ctypes.data, 4 * n)
                lib.vorbis_analysis_wrote(C.byref(vd), C.c_int(n))
                pos += n
                if n == 0:
                    done = True
            while lib.vorbis_analysis_blockout(C.byref(vd), C.byref(vb)) == 1:
                lib.vorbis_analysis(C.byref(vb), None)
                lib.vorbis_bitrate_addblock(C.byref(vb))
                op = ogg_packet()
                while lib.vorbis_bitrate_flushpacket(C.byref(vd), C.byref(op)):
                    audio.append((C.string_at(op.packet, op.bytes),
                                  int(op.granulepos), bool(op.e_o_s)))
            if done:
                break
        lib.vorbis_block_clear(C.byref(vb))
        lib.vorbis_dsp_clear(C.byref(vd))
        lib.vorbis_comment_clear(C.byref(vc))
        lib.vorbis_info_clear(C.byref(vi))
        return headers, audio


_reflib = None


def reflib():
    global _reflib
    if _reflib is None:
        _reflib = RefLib()
    return _reflib


def crosslap_float(path1: str, path2: str, nread: int = 1 << 16):
    """Reference ov_crosslap oracle: drain path1 fully, crosslap into
    path2, then read path2's (spliced) output via libvorbisfile."""
    vf1 = OggVorbis_File()
    vf2 = OggVorbis_File()
    assert _vfile.ov_fopen(path1.encode(), C.byref(vf1)) == 0
    assert _vfile.ov_fopen(path2.encode(), C.byref(vf2)) == 0
    pcmp = C.POINTER(C.POINTER(C.c_float))()
    bs = C.c_int(0)
    while True:
        n = _vfile.ov_read_float(C.byref(vf1), C.byref(pcmp), 4096,
                                 C.byref(bs))
        if n <= 0:
            break
    _vfile.ov_crosslap.restype = C.c_int
    r = _vfile.ov_crosslap(C.byref(vf1), C.byref(vf2))
    assert r == 0, r
    vi = _vfile.ov_info(C.byref(vf2), -1).contents
    ch = vi.channels
    chunks = []
    total = 0
    while total < nread:
        n = _vfile.ov_read_float(C.byref(vf2), C.byref(pcmp), 4096,
                                 C.byref(bs))
        if n <= 0:
            break
        frame = np.empty((ch, n), dtype=np.float32)
        for c in range(ch):
            frame[c] = np.ctypeslib.as_array(pcmp[c], shape=(n,))
        chunks.append(frame)
        total += n
    _vfile.ov_clear(C.byref(vf1))
    _vfile.ov_clear(C.byref(vf2))
    return (np.concatenate(chunks, axis=1) if chunks
            else np.zeros((ch, 0), np.float32))
