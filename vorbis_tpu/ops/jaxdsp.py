"""Device (JAX/XLA) implementations of the encoder's hot DSP chain.

These are the TPU *fast-path* kernels: batched over frames and
channels, static shapes, no data-dependent control flow — everything a
single `jit` region XLA can fuse.  The scalar-exact numpy versions in
`ops/psy.py` remain the bit-exactness oracle; this module trades the
C float32 op-order guarantee for throughput (the masking curves differ
from the reference by float associativity only).

Reference behavior being reproduced (file:line of the reference tree):
- bark_noise_hybridmp least-squares noise fit: lib/psy.c:3480
- noise companding: lib/psy.c _vp_noisemask
- window + forward MDCT + log spectrum: lib/mdct.c, lib/scales.h:43-52
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.scales import todB
from . import psy as PSY
from .mdct import imdct, mdct_forward
from .window import hybrid_window

f32 = np.float32


def log_spectrum(mdct_coef):
    """logmdct = todB(mdct) + .345 (aoTuV M1 compensation add,
    reference: lib/mapping0.c logmdct computation).  Fast path: the
    add stays f32 (the exact path in codec/encoder.py rounds a double
    add once; difference is <=1 ulp)."""
    return todB(mdct_coef, xp=jnp) + f32(0.345)


def _ls_terms(N, X, XX, Y, XY, lo, hi, neg_lo):
    """Windowed least-squares line-fit terms via prefix-sum gathers.
    neg_lo: True for the low-clipped region (reference adds the
    reflected prefix instead of subtracting)."""
    if neg_lo:
        tN = jnp.take(N, hi, axis=-1) + jnp.take(N, -lo, axis=-1)
        tX = jnp.take(X, hi, axis=-1) - jnp.take(X, -lo, axis=-1)
        tXX = jnp.take(XX, hi, axis=-1) + jnp.take(XX, -lo, axis=-1)
        tY = jnp.take(Y, hi, axis=-1) + jnp.take(Y, -lo, axis=-1)
        tXY = jnp.take(XY, hi, axis=-1) - jnp.take(XY, -lo, axis=-1)
    else:
        tN = jnp.take(N, hi, axis=-1) - jnp.take(N, lo, axis=-1)
        tX = jnp.take(X, hi, axis=-1) - jnp.take(X, lo, axis=-1)
        tXX = jnp.take(XX, hi, axis=-1) - jnp.take(XX, lo, axis=-1)
        tY = jnp.take(Y, hi, axis=-1) - jnp.take(Y, lo, axis=-1)
        tXY = jnp.take(XY, hi, axis=-1) - jnp.take(XY, lo, axis=-1)
    A = tY * tXX - tX * tXY
    B = tN * tXY - tX * tY
    D = tN * tXX - tX * tX
    return A, B, D


def bark_fit(fvec, bark_lo, bark_hi, offset, fixed, i1, i2, j1, j2):
    """Batched bark-windowed weighted LS line fit (reference:
    lib/psy.c bark_noise_hybridmp).  fvec: (..., n) f32.  The region
    boundaries i1/i2 (bark window) and j1/j2 (fixed window) are static
    — they derive from the precomputed bark table, not the data."""
    n = fvec.shape[-1]
    x = jnp.arange(n, dtype=jnp.float32)
    y = jnp.maximum(fvec + f32(offset), f32(1.0))
    w = y * y
    w0_half = w[..., :1] * f32(0.5)
    wx = w * x
    wxx = wx * x
    wy = w * y
    wxy = wx * y
    N = jnp.cumsum(jnp.concatenate([w0_half, w[..., 1:]], -1), -1,
                   dtype=jnp.float32)
    X = jnp.cumsum(jnp.concatenate([w0_half, wx[..., 1:]], -1), -1,
                   dtype=jnp.float32)
    XX = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(w0_half), wxx[..., 1:]], -1), -1,
        dtype=jnp.float32)
    Y = jnp.cumsum(
        jnp.concatenate([w0_half * y[..., :1], wy[..., 1:]], -1), -1,
        dtype=jnp.float32)
    XY = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(w0_half), wxy[..., 1:]], -1), -1,
        dtype=jnp.float32)

    def fit_regions(lo, hi, k1, k2):
        A1, B1, D1 = _ls_terms(N, X, XX, Y, XY, lo[:k1], hi[:k1], True)
        A2, B2, D2 = _ls_terms(N, X, XX, Y, XY, lo[k1:k2], hi[k1:k2],
                               False)
        A = jnp.concatenate([A1, A2], -1)
        B = jnp.concatenate([B1, B2], -1)
        D = jnp.concatenate([D1, D2], -1)
        if k2 < n:
            # extrapolate the last in-range fit across the tail
            Al = A[..., k2 - 1:k2] if k2 > 0 else jnp.zeros_like(w0_half)
            Bl = B[..., k2 - 1:k2] if k2 > 0 else jnp.zeros_like(w0_half)
            Dl = D[..., k2 - 1:k2] if k2 > 0 else jnp.ones_like(w0_half)
            A = jnp.concatenate([A, jnp.broadcast_to(
                Al, A.shape[:-1] + (n - k2,))], -1)
            B = jnp.concatenate([B, jnp.broadcast_to(
                Bl, B.shape[:-1] + (n - k2,))], -1)
            D = jnp.concatenate([D, jnp.broadcast_to(
                Dl, D.shape[:-1] + (n - k2,))], -1)
        return (A + x * B) / D

    R = fit_regions(bark_lo, bark_hi, i1, i2)
    noise = jnp.maximum(R, f32(0.0)) - f32(offset)
    if fixed > 0:
        idx = np.arange(n)
        hi_f = jnp.asarray(np.minimum(idx + fixed // 2, n - 1))
        lo_f = jnp.asarray(idx + fixed // 2 - fixed)
        Rf = fit_regions(lo_f, hi_f, j1, j2)
        noise = jnp.minimum(noise, jnp.maximum(Rf, f32(0.0))
                            - f32(offset))
    return noise


class DeviceAnalysis:
    """Batched encoder analysis spine on device: window -> MDCT ->
    log spectrum -> two-pass bark noise fit -> companded noise mask.

    Mirrors mapping0_forward's per-channel front half
    (lib/mapping0.c + _vp_noisemask) for the long-block path, batched
    over (streams/frames, channels)."""

    def __init__(self, setup, blocktype=3, rate=44100):
        bs = setup.vi.blocksizes
        self.n = bs[1]
        n2 = self.n // 2
        self.n2 = n2
        look = PSY.PsyLook(setup.psy_params[blocktype], setup.psy_global,
                           n2, rate)
        self.look = look
        self.window = jnp.asarray(hybrid_window(bs[0], bs[1], 1, 1, 1))
        bark = np.asarray(look.bark)
        self.bark_lo = jnp.asarray((bark >> 16).astype(np.int32))
        self.bark_hi_raw = (bark & 0xFFFF).astype(np.int32)
        self.bark_hi = jnp.asarray(np.minimum(self.bark_hi_raw, n2 - 1))
        lo = (bark >> 16).astype(np.int64)
        hi = self.bark_hi_raw.astype(np.int64)
        i1 = 0
        while i1 < n2 and lo[i1] < 0 and -lo[i1] < n2 and hi[i1] < n2:
            i1 += 1
        i2 = i1
        while i2 < n2 and 0 <= lo[i2] < n2 and hi[i2] < n2:
            i2 += 1
        self.i1, self.i2 = i1, i2
        fixed = int(look.vi["noisewindowfixed"])
        self.fixed = fixed
        idx = np.arange(n2)
        hi_f = idx + fixed // 2
        lo_f = hi_f - fixed
        j1 = 0
        while j1 < n2 and hi_f[j1] < n2 and lo_f[j1] < 0:
            j1 += 1
        j2 = j1
        while j2 < n2 and hi_f[j2] < n2 and lo_f[j2] >= 0:
            j2 += 1
        self.j1, self.j2 = j1, j2
        self.noisecompand = jnp.asarray(
            np.asarray(look.vi["noisecompand"], np.float32))
        self.noiseoffset = jnp.asarray(np.asarray(look.noiseoffset[1],
                                                  np.float32)[:n2])
        self.ath = jnp.asarray(np.asarray(look.ath, np.float32))

    def __call__(self, frames):
        """frames: (..., n) f32 PCM -> (mdct, logmdct, noise_mask)."""
        n, n2 = self.n, self.n2
        w = frames * self.window
        md = mdct_forward(w, n, xp=jnp)
        logmdct = log_spectrum(md)
        # pass 1: wide bark window, offset 140
        mask = bark_fit(logmdct, self.bark_lo, self.bark_hi, 140.0, -1,
                        self.i1, self.i2, self.j1, self.j2)
        work = logmdct - mask
        # pass 2: refit of the residual with the fixed window minimum
        mask2 = bark_fit(work, self.bark_lo, self.bark_hi, 0.0,
                         self.fixed, self.i1, self.i2, self.j1, self.j2)
        work = logmdct - work
        # companding (lib/psy.c: dB = logmask+.5 int index)
        dB = jnp.clip((mask2 + f32(0.5)).astype(jnp.int32),
                      0, PSY.NOISE_COMPAND_LEVELS - 1)
        noise = (work + jnp.take(self.noisecompand, dB)
                 + self.noiseoffset)
        return md, logmdct, noise


class DeviceSynthesis:
    """Batched decoder back half on device: spectrum -> IMDCT ->
    window -> overlap-add (reference: lib/mdct.c mdct_backward +
    lib/block.c vorbis_synthesis_blockin lapping)."""

    def __init__(self, n=2048):
        self.n = n
        self.window = jnp.asarray(hybrid_window(n // 8, n, 1, 1, 1))

    def __call__(self, spec):
        """spec: (..., F, n/2) -> pcm (..., F*n/2) long-block stream.
        The overlap-add shifts frame f's second half onto frame f+1's
        first half — with the frame axis sharded this lowers to a
        collective-permute halo exchange on the mesh."""
        n = self.n
        pcm = imdct(spec, n, xp=jnp) * self.window
        first, second = pcm[..., :n // 2], pcm[..., n // 2:]
        lapped = first.at[..., 1:, :].add(second[..., :-1, :])
        shape = lapped.shape[:-2] + (lapped.shape[-2] * (n // 2),)
        return lapped.reshape(shape)
