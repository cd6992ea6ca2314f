import ctypes as C
import subprocess

import numpy as np
import pytest

from vorbis_tpu.ops.mdct import imdct, mdct_forward, mdct_tables


@pytest.fixture(scope="module")
def reflib():
    subprocess.run(["sh", "tools/build_reflib.sh"], check=True,
                   capture_output=True)
    lib = C.CDLL("/tmp/refdsp/libvorbisref.so")
    return lib


class mdct_lookup(C.Structure):
    _fields_ = [("n", C.c_int), ("log2n", C.c_int), ("trig", C.c_void_p),
                ("bitrev", C.c_void_p), ("scale", C.c_float),
                ("_pad", C.c_byte * 256)]


@pytest.mark.parametrize("n", [64, 128, 256, 512, 1024, 2048, 4096, 8192])
def test_imdct_bit_exact(reflib, n):
    lk = mdct_lookup()
    reflib.mdct_init(C.byref(lk), n)
    rng = np.random.RandomState(n)
    spec = (rng.randn(3, n // 2) * np.logspace(0, -4, n // 2)).astype(np.float32)
    ref = np.zeros((3, n), np.float32)
    for b in range(3):
        buf = np.zeros(n, np.float32)
        buf[:n // 2] = spec[b]
        o = np.zeros(n, np.float32)
        reflib.mdct_backward(C.byref(lk),
                             buf.ctypes.data_as(C.POINTER(C.c_float)),
                             o.ctypes.data_as(C.POINTER(C.c_float)))
        ref[b] = o
    assert np.array_equal(np.asarray(imdct(spec, n)), ref)


@pytest.mark.parametrize("n", [64, 128, 256, 512, 1024, 2048, 4096, 8192])
def test_mdct_forward_bit_exact(reflib, n):
    lk = mdct_lookup()
    reflib.mdct_init(C.byref(lk), n)
    rng = np.random.RandomState(n + 1)
    x = rng.randn(3, n).astype(np.float32)
    ref = np.zeros((3, n // 2), np.float32)
    for b in range(3):
        o = np.zeros(n, np.float32)
        reflib.mdct_forward(C.byref(lk),
                            x[b].copy().ctypes.data_as(C.POINTER(C.c_float)),
                            o.ctypes.data_as(C.POINTER(C.c_float)))
        ref[b] = o[:n // 2]
    assert np.array_equal(np.asarray(mdct_forward(x, n)), ref)


def test_mdct_roundtrip_energy():
    # IMDCT(MDCT(x)) with 50% overlap-add reconstructs x (TDAC); check
    # on a sine with rectangular-window-free interior
    n = 2048
    t = np.arange(4 * n)
    x = np.sin(2 * np.pi * t * 0.013).astype(np.float32)
    from vorbis_tpu.ops.window import hybrid_window
    w = hybrid_window(n, n, 0, 0, 0)
    frames = np.stack([x[i * n // 2:i * n // 2 + n] * w
                       for i in range(6)])
    spec = np.asarray(mdct_forward(frames, n))
    rec = np.asarray(imdct(spec, n))
    out = np.zeros(4 * n, np.float32)
    for i in range(6):
        out[i * n // 2:i * n // 2 + n] += rec[i] * w
    mid = out[n:3 * n]
    ref = x[n:3 * n]
    assert np.max(np.abs(mid - ref)) < 1e-4


def test_todB_matches_bitcast():
    from vorbis_tpu.utils.scales import todB
    x = np.array([1.0, 0.5, 2.0, 1e-10, 3.7e5, -2.0], dtype=np.float32)
    # independent reference computation
    u = x.view(np.uint32) & 0x7FFFFFFF
    expect = (u.astype(np.float32) * np.float32(7.17711438e-7)
              - np.float32(764.6161886))
    assert np.array_equal(todB(x), expect)
    # sanity: todB(1.0) ~ 0 dB (within the known ~0.345 dB bias)
    assert abs(float(todB(np.float32(1.0)))) < 1.0


def test_jax_imdct_matches_numpy():
    import jax
    import jax.numpy as jnp
    n = 2048
    rng = np.random.RandomState(5)
    spec = rng.randn(8, n // 2).astype(np.float32)
    ref = np.asarray(imdct(spec, n, xp=np))
    jfn = jax.jit(lambda s: imdct(s, n, xp=jnp))
    out = np.asarray(jfn(jnp.asarray(spec)))
    # bit-exact on the real TPU backend; XLA:CPU's FMA contraction
    # reassociates across the butterfly cascade (the codec's golden
    # paths use the numpy kernel, which stays bit-exact)
    tol = (0.0 if jax.devices()[0].platform == "tpu"
           else 1e-4 * float(np.abs(ref).max()))
    assert np.abs(out - ref).max() <= tol, np.abs(out - ref).max()


def test_jax_mdct_forward_matches_numpy():
    import jax
    import jax.numpy as jnp
    n = 256
    rng = np.random.RandomState(6)
    x = rng.randn(16, n).astype(np.float32)
    ref = np.asarray(mdct_forward(x, n, xp=np))
    out = np.asarray(jax.jit(lambda s: mdct_forward(s, n, xp=jnp))(x))
    tol = 0.0 if jax.devices()[0].platform == "tpu" else 4e-7
    assert np.abs(out - ref).max() <= tol, np.abs(out - ref).max()
