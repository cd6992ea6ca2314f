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


from functools import lru_cache


@lru_cache(maxsize=None)
def _mdct_basis(n: int):
    """Dense MDCT basis (n, n/2): mdct(x) = x @ B.  On the MXU a
    HIGHEST-precision matmul against this basis beats the
    gather-heavy butterfly lowering (measured 3.7ms vs 4.3ms for
    6144x2048 frames on v5e) and matches it to ~1 ulp."""
    return np.asarray(mdct_forward(np.eye(n, dtype=np.float32), n))


@lru_cache(maxsize=None)
def _imdct_basis(n: int):
    """Dense IMDCT basis (n/2, n): imdct(s) = s @ B."""
    return np.asarray(imdct(np.eye(n // 2, dtype=np.float32), n))


def mdct_matmul(x, n: int):
    """Batched forward MDCT as one MXU matmul (fast path)."""
    B = jnp.asarray(_mdct_basis(n))
    return jnp.dot(x, B, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def imdct_matmul(spec, n: int):
    B = jnp.asarray(_imdct_basis(n))
    return jnp.dot(spec, B, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


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

    def __init__(self, setup, blocktype=3, rate=44100, W=1):
        bs = setup.vi.blocksizes
        self.W = W
        self.n = bs[W]
        n2 = self.n // 2
        self.n2 = n2
        look = PSY.PsyLook(setup.psy_params[blocktype], setup.psy_global,
                           n2, rate)
        self.look = look
        # aoTuV M4 (floor boost guard) static region + M1 scale factor
        # (reference: psy.c _vp_offset_and_mix mp4 setup, psy.c:4304-4330
        # and the M1 block psy.c:4434-4459)
        vi_p = look.vi
        ff = setup.floor_full
        end_block = int(ff[W if len(ff) > 1 else 0]["n"])
        hsrate = 0 if rate < 26000 else 1
        m4_end_block = min(end_block + int(vi_p["normal_partition"]), n2)
        if not hsrate:
            m4_end = m4_end_block
        else:
            m4_end = look.tonecomp_endp
        m4_start = int(vi_p["normal_start"])
        if hsrate and vi_p["normal_thresh"] > 1.0:
            m4_start = 9999
        self.m4_start = m4_start
        self.m4_end = m4_end
        self.m4_thres = f32(look.tonecomp_thres)
        self.m_val = f32(look.m_val)
        self.hsrate = hsrate
        if W:
            # windows for the 4 (lW, nW) neighbor shapes; index
            # wid = lW*2 + nW selects per frame (block switching)
            self.windows4 = jnp.asarray(np.stack(
                [hybrid_window(bs[0], bs[1], l, 1, nw)
                 for l in (0, 1) for nw in (0, 1)]))
            self.window = self.windows4[3]
        else:
            self.window = jnp.asarray(hybrid_window(bs[0], bs[1],
                                                    0, 0, 0))
            self.windows4 = None
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
        self.noiseoffsets = jnp.asarray(
            np.asarray(look.noiseoffset, np.float32)[:, :n2])
        self.noiseoffset = self.noiseoffsets[1]
        # per-frame blocktype support: the ONLY psy param that differs
        # between the paired blocktypes (impulse vs padding,
        # transition vs long) in EVERY reference template is the
        # noise-bias curve, so mixed-blocktype batches reduce to
        # selecting between two noiseoffset rows per frame (the
        # trans/impulse flag rides the finish step)
        alt_bt = {0: 1, 1: 0, 2: 3, 3: 2}.get(blocktype, blocktype)
        alt_bt = min(alt_bt, len(setup.psy_params) - 1)
        if alt_bt != blocktype:
            alt_look = PSY.PsyLook(setup.psy_params[alt_bt],
                                   setup.psy_global, n2, rate)
            self.noiseoffsets_alt = jnp.asarray(
                np.asarray(alt_look.noiseoffset, np.float32)[:, :n2])
        else:
            self.noiseoffsets_alt = self.noiseoffsets
        self.ath = jnp.asarray(np.asarray(look.ath, np.float32))
        self.noisemaxsupp = f32(look.vi["noisemaxsupp"])
        self.toneatts = [f32(a) for a in look.vi["tone_masteratt"]]
        self.toneatt1 = self.toneatts[1]
        self.tonemask = DeviceToneMask(look)

    def windowed(self, frames, wid=None):
        if wid is None:
            return frames * self.window
        return frames * jnp.take(self.windows4, wid, axis=0)

    def spectra(self, frames, wid=None, with_fft=False):
        """The per-frame DSP front: window -> MDCT -> log spectrum ->
        two-pass bark noise fit.  Returns (md, logmdct, fit1, dB
        [, logfft]): fit1 is the first fit exactly as _vp_noisemask
        leaves its `work` buffer (double subtraction order), dB the
        clipped compand index from the second fit.  The stateful
        finish pass (ops/psydevice.noisemask_tail) consumes these."""
        n, n2 = self.n, self.n2
        w = self.windowed(frames, wid)
        # butterfly beats the MXU basis matmul inside the fused step
        # (7.6k x-rt vs 7.0k measured on v5e): XLA fuses todB/masking
        # into the elementwise butterfly stages but not into the
        # HIGHEST-precision matmul epilogue
        md = mdct_forward(w, n, xp=jnp)
        logmdct = log_spectrum(md)
        # pass 1: wide bark window, offset 140
        mask = bark_fit(logmdct, self.bark_lo, self.bark_hi, 140.0, -1,
                        self.i1, self.i2, self.j1, self.j2)
        work = logmdct - mask
        # pass 2: refit of the residual with the fixed window minimum
        mask2 = bark_fit(work, self.bark_lo, self.bark_hi, 0.0,
                         self.fixed, self.i1, self.i2, self.j1, self.j2)
        fit1 = logmdct - work
        # companding index (lib/psy.c: dB = logmask+.5 int index)
        dB = jnp.clip((mask2 + f32(0.5)).astype(jnp.int32),
                      0, PSY.NOISE_COMPAND_LEVELS - 1)
        if not with_fft:
            return md, logmdct, fit1, dB
        return md, logmdct, fit1, dB, self.logfft(w)

    def logfft(self, w):
        """Tone-analysis log spectrum of the windowed frames
        (reference uses drft; |rfft|^2 gives the same power)."""
        sp = jnp.fft.rfft(w, axis=-1)[..., :self.n2]
        power = (sp.real * sp.real + sp.imag * sp.imag
                 ).astype(jnp.float32)
        scale = f32(4.0 / self.n)
        return (todB(power * (scale * scale), xp=jnp) * f32(0.5)
                + f32(0.345) + f32(0.345))

    def __call__(self, frames, wid=None, base=False):
        """frames: (..., n) f32 PCM -> (mdct, logmdct, noise_mask).
        wid: optional per-frame window-shape id (lW*2+nW) for the
        long-block switching path.  base=True returns the noise curve
        WITHOUT the offset_select row (managed-mask mixing adds its
        own per-select noiseoffset)."""
        md, logmdct, fit1, dB = self.spectra(frames, wid)
        noise = fit1 + jnp.take(self.noisecompand, dB)
        if base:
            return md, logmdct, noise
        return md, logmdct, noise + self.noiseoffset

    def offset_and_mix(self, md, logmdct, noise, tone, select=1):
        """The stateless core of _vp_offset_and_mix (psy.c:4274-4502)
        for one offset_select: noise/tone mix with the aoTuV M4 floor
        boost guard and (select 1 only) the M1 relative-MDCT scaling.
        The cross-frame M3 terms are applied by the stateful pipeline
        (ops/psydevice) before this when enabled.  Returns
        (scaled_md, mask)."""
        val = jnp.minimum(noise + self.noiseoffsets[select],
                          self.noisemaxsupp)
        tval = tone + self.toneatts[select]
        return self.mix_m4_m1(md, logmdct, val, tval, select)

    def mix_m4_m1(self, md, logmdct, val, tval, select):
        """M4 + (select 1) M1 tail of offset_and_mix, on
        already-adjusted val/tval (the stateful path runs the M3
        history terms in between)."""
        n2 = self.n2
        bins = np.arange(n2)
        # M4 (psy.c:4411-4423): where the tone curve governs inside
        # [m4_start, m4_end], pull it toward the noise val when the
        # spectrum itself sits below it
        in_m4 = jnp.asarray((bins > self.m4_start)
                            & (bins < self.m4_end))
        adj = jnp.where(logmdct < val,
                        tval - (tval - val) * self.m4_thres, logmdct)
        tval_m4 = jnp.where(in_m4 & (logmdct < tval), adj, tval)
        mask = jnp.where(val > tval, val, tval_m4)
        if select == 1:
            # M1 (psy.c:4434-4459): scale the MDCT line by how far the
            # mask sits above the spectrum
            v2 = val - logmdct
            m1c = f32(-17.2)
            de_hi = f32(1.0) - (v2 - m1c) * (f32(0.005) * self.m_val)
            de_lo = f32(1.0) - (v2 - m1c) * (f32(0.0003) * self.m_val)
            de_hi = jnp.where(de_hi < 0, f32(0.0001), de_hi)
            de = jnp.where(v2 > m1c, de_hi, de_lo)
            md = md * de
        return md, mask

    def full_mask(self, frames, wid=None):
        """Complete fast-path masking chain: MDCT + FFT spectra, noise
        fit, tone seeding, and the stateless _vp_offset_and_mix core
        (offset_select=1 path with M1/M4, without the M3 history
        terms).  Returns (mdct, logmdct, final_mask)."""
        md, logmdct, noise, tone = self.mask_components(frames, wid)
        md, mask = self.offset_and_mix(md, logmdct, noise, tone, 1)
        return md, logmdct, mask

    def mask_components(self, frames, wid=None):
        """(mdct, logmdct, noise_base, tone): noise_base EXCLUDES the
        per-offset noiseoffset row so the managed encode can mix the
        three offset_select variants (reference: _vp_offset_and_mix
        under bit management computes masks 0/1/2 from the same noise
        and tone curves with per-select noiseoffset/tone_masteratt,
        mapping0.c:1090-1181)."""
        md, logmdct, fit1, dB, logfft = self.spectra(frames, wid,
                                                     with_fft=True)
        noise = fit1 + jnp.take(self.noisecompand, dB)
        local_max = jnp.minimum(jnp.max(logfft, axis=-1), 0.0)
        global_max = local_max  # stateless: no cross-block ampmax decay
        tone = self.tonemask(logfft, global_max, local_max)
        return md, logmdct, noise, tone

    def managed_masks(self, frames, wid=None):
        """(mdct, logmdct, masks (..., 3, n2)): the three
        offset_select mask variants that anchor the 15 packetblob
        interpolation ladder (reference: mapping0.c:1090-1181)."""
        md, logmdct, noise, tone = self.mask_components(frames, wid)
        masks = []
        # select order mirrors the reference (mapping0.c:1090-1181):
        # mask1 first — its M1 pass rescales the mdct used by every blob
        md, m1 = self.offset_and_mix(md, logmdct, noise, tone, 1)
        _, m2 = self.offset_and_mix(md, logmdct, noise, tone, 2)
        _, m0 = self.offset_and_mix(md, logmdct, noise, tone, 0)
        masks = [m0, m1, m2]
        return md, logmdct, jnp.stack(masks, axis=-2)


class DeviceToneMask:
    """Batched fast-path tone masking (reference: lib/psy.c
    _vp_tonemask / seed_loop / seed_chase / max_seeds).

    The scalar algorithm seeds 56-point EHMER curves at octave lines,
    chases them forward with a stack, and takes windowed minima back to
    the linear domain.  The device formulation:

      - per-octave-group spectral max  -> segment_max (static groups)
      - curve seeding                  -> one scatter-max of (G, 56)
        values at static target lines (amplitude picks the curve level
        dynamically via a row gather)
      - seed chase                     -> sliding-window max over
        eighth-octave lines (drops the amplitude-dependent truncation
        of the exact stack walk; fast path only)
      - linear-domain windowed min     -> static segment min + ATH max

    The exact scalar path in ops/psy.py remains the oracle; this is
    within ~1 dB of it except around sharp seed collisions."""

    def __init__(self, look):
        self.look = look
        n = look.n
        octave = np.asarray(look.octave[:n], np.int64)
        self.linesper = int(look.eighth_octave_lines)
        self.total = int(look.total_octave_lines)
        # octave groups (seed_loop's i runs over equal-octave spans)
        group_id = np.concatenate([[0], np.cumsum(octave[1:]
                                                  != octave[:-1])])
        self.group_id = jnp.asarray(group_id)
        self.n_groups = int(group_id[-1]) + 1
        first = np.searchsorted(group_id, np.arange(self.n_groups))
        group_oc0 = octave[first]
        self.group_first = jnp.asarray(first)
        # static per-(group, ehmer k) seed target lines; because group
        # base lines are unique, the deposit is a static GATHER per k:
        # line t takes its value from group g where
        # t == base_g + (k-16)*linesper - linesper/2
        oc_rel = group_oc0 - look.firstoc
        line2group = np.full(self.total, -1, np.int64)
        in_range = (oc_rel >= 0) & (oc_rel < self.total)
        line2group[oc_rel[in_range]] = np.nonzero(in_range)[0]
        ks = np.arange(PSY.EHMER_MAX)
        offs = (ks - PSY.EHMER_OFFSET) * self.linesper \
            - (self.linesper >> 1)
        lines = np.arange(self.total)
        src_line = lines[None, :] - offs[:, None]        # (E, T)
        ok = (src_line >= 0) & (src_line < self.total) \
            & (lines[None, :] > 0)
        srcg = np.where(ok, line2group[np.clip(src_line, 0,
                                               self.total - 1)], -1)
        self.seed_src = np.clip(srcg, 0, None)           # (E, T) group idx
        self.seed_ok = srcg >= 0
        # curves: (P_BANDS, P_LEVELS, 2+EHMER) -> rows indexed by
        # oc_band*P_LEVELS + level
        oc_band = np.clip(group_oc0 >> look.shiftoc, 0, PSY.P_BANDS - 1)
        self.group_band = jnp.asarray(oc_band)
        curves = np.asarray(look.tonecurves, np.float32)
        self.curve_rows = jnp.asarray(
            curves.reshape(-1, curves.shape[-1]))
        self.p_levels = curves.shape[1]
        # linear-domain windows (max_seeds): for bin j, the seed range
        # is [(oct[j-?]...)]: reproduce the scalar walk statically
        starts = np.empty(n, np.int64)
        ends = np.empty(n, np.int64)
        pos = octave[0] - look.firstoc - (self.linesper >> 1)
        linpos = 0
        while linpos + 1 < n:
            end = ((octave[linpos] + octave[linpos + 1]) >> 1) \
                - look.firstoc
            seg_start = pos
            pos = max(pos, min(end, self.total - 1))
            end_oc = pos + look.firstoc
            j = linpos
            while j < n and octave[j] <= end_oc:
                starts[j] = max(seg_start, 0)
                ends[j] = max(pos, 0)
                j += 1
            linpos = j
        starts[linpos:] = self.total - 1
        ends[linpos:] = self.total - 1
        self.win_start = jnp.asarray(starts)
        self.win_end = jnp.asarray(ends)
        self.ath = jnp.asarray(np.asarray(look.ath, np.float32))
        self.tone_abs_limit = f32(look.vi["tone_abs_limit"])
        self.ath_adjatt = f32(look.vi["ath_adjatt"])
        self.ath_maxatt = f32(look.vi["ath_maxatt"])
        self.max_curve_dB = f32(look.vi["max_curve_dB"])

    def __call__(self, logfft, global_specmax, local_specmax):
        """logfft: (..., n); specmax scalars or (...,) arrays."""
        look = self.look
        n = look.n
        att = jnp.maximum(local_specmax + self.ath_adjatt,
                          self.ath_maxatt)
        flr = self.ath + att[..., None]
        # per-group max
        gmax = jax.ops.segment_max(
            jnp.moveaxis(logfft, -1, 0), np.asarray(self.group_id),
            num_segments=self.n_groups)
        gmax = jnp.moveaxis(gmax, 0, -1)          # (..., G)
        dBoffset = self.max_curve_dB - global_specmax[..., None]
        level = jnp.clip(((gmax + dBoffset - f32(PSY.P_LEVEL_0))
                          * f32(0.1)).astype(jnp.int32),
                         0, self.p_levels - 1)
        rows = self.group_band * self.p_levels + level   # (..., G)
        # whole-curve row lookup as a one-hot f32 matmul at HIGHEST
        # precision: bf16x3 reconstructs each f32 exactly (verified
        # bitwise == jnp.take), the MXU does the work, and XLA skips
        # the gather's layout-fixup reshape+copy chain (~3.5 ms/batch)
        oh = (rows[..., None]
              == jnp.arange(self.curve_rows.shape[0],
                            dtype=jnp.int32)).astype(jnp.float32)
        curves = jax.lax.dot_general(
            oh, self.curve_rows, (((oh.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)     # (..., G, 2+E)
        post0 = curves[..., 0].astype(jnp.int32)
        post1 = curves[..., 1].astype(jnp.int32)
        audible = (gmax + 6.0
                   > jnp.take(flr, self.group_first, axis=-1))
        # seed deposit as 56 static gathers + running max (a TODO for a
        # Pallas kernel: keep the (B, T) seed buffer VMEM-resident
        # across the k loop instead of 56 HBM round trips)
        seed = jnp.full(gmax.shape[:-1] + (self.total,), PSY.NEGINF,
                        jnp.float32)
        for k in range(PSY.EHMER_MAX):
            vk = gmax + curves[..., 2 + k]
            act = (k >= post0) & (k < post1) & audible
            vk = jnp.where(act, vk, PSY.NEGINF)
            contrib = jnp.take(vk, self.seed_src[k], axis=-1)
            contrib = jnp.where(self.seed_ok[k], contrib, PSY.NEGINF)
            seed = jnp.maximum(seed, contrib)
        # chase: extend seeds across one eighth-octave (sliding max)
        ext = seed
        for s in range(1, self.linesper):
            ext = jnp.maximum(ext, jnp.roll(seed, s, axis=-1)
                              .at[..., :s].set(PSY.NEGINF))
        # windowed min over [start_j, end_j] back in the linear domain:
        # sparse-table (dyadic) range-min — levels are log-step sliding
        # mins, each bin gathers two level-k entries (static indices)
        run = jnp.where(ext > PSY.NEGINF, ext, jnp.inf)
        starts = np.asarray(self.win_start)
        ends = np.asarray(self.win_end)
        wlen = ends - starts + 1
        kmax = int(np.floor(np.log2(wlen.max()))) if wlen.max() > 1 \
            else 0
        levels = [run]
        for k in range(kmax):
            prev = levels[-1]
            sh = 1 << k
            levels.append(jnp.minimum(
                prev, jnp.roll(prev, -sh, axis=-1).at[..., -sh:].set(
                    jnp.inf)))
        k_j = np.floor(np.log2(np.maximum(wlen, 1))).astype(np.int64)
        minv = jnp.full(flr.shape, jnp.inf)
        for k in range(kmax + 1):
            m = k_j == k
            if not m.any():
                continue
            lo_idx = starts.copy()
            hi_idx = ends - (1 << k) + 1
            a = jnp.take(levels[k], lo_idx, axis=-1)
            b = jnp.take(levels[k], np.maximum(hi_idx, 0), axis=-1)
            minv = jnp.where(m, jnp.minimum(a, b), minv)
        # seedless windows must stay at the ATH floor: the abs-limit
        # clamp may only apply to real seed minima (clamping the +inf
        # sentinel would raise every quiet bin to tone_abs_limit)
        minv = jnp.where(jnp.isfinite(minv),
                         jnp.minimum(minv, self.tone_abs_limit),
                         PSY.NEGINF)
        return jnp.maximum(flr, minv)


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


class DeviceEnvelope:
    """Batched transient detector for the fast encoder's block
    switching (reference: lib/envelope.c _ve_envelope_search/_ve_amp).

    Per 64-sample step: a sin^2-windowed 128-point MDCT per channel,
    12 weighted bands through pre/post-echo threshold triggers.  The
    reference's `stretch` hysteresis is a serial per-step feedback
    (impulses shrink the pre-window and raise the trigger penalty for
    the following steps); a feedback scan would serialize 8k tiny
    steps per chunk on the TPU, so the fast path runs at the FIXED
    steady-state stretch (VE_MAXSTRETCH) and its penalty.  That makes
    the detector slightly more trigger-happy right after an impulse —
    extra short blocks on borderline frames, never a missed transient.
    The golden encoder keeps the exact serial detector."""

    def __init__(self, gi, ch):
        from .envelope import (BAND_BEGIN, BAND_END, VE_BANDS,
                               VE_MAXSTRETCH, VE_NEARDC)
        import math as _m
        self.ch = ch
        n = 128
        i = np.arange(n)
        t = np.sin(i / (n - 1.0) * _m.pi).astype(np.float32)
        self.mdct_win = jnp.asarray((t * t).astype(np.float32))
        # band matrix (32 sp bins -> 12 bands, weights * 1/total)
        Bm = np.zeros((32, VE_BANDS), np.float32)
        for j in range(VE_BANDS):
            bn = BAND_END[j]
            wv = np.sin((np.arange(bn) + 0.5) / bn * _m.pi)
            Bm[BAND_BEGIN[j]:BAND_BEGIN[j] + bn, j] = \
                (wv / wv.sum()).astype(np.float32)
        self.Bm = jnp.asarray(Bm)
        self.minV = f32(gi["preecho_minenergy"])
        self.stretch = VE_MAXSTRETCH
        pen = max(0.0, float(gi["stretch_penalty"])
                  - (VE_MAXSTRETCH - 2))
        self.pre_thr = jnp.asarray(
            np.asarray(gi["preecho_thresh"], np.float32) + f32(pen))
        self.post_thr = jnp.asarray(
            np.asarray(gi["postecho_thresh"], np.float32) - f32(pen))
        self.neardc = VE_NEARDC

    def marks(self, x):
        """x: (ch, S) f32 PCM (S multiple of 64) -> (S//64 - 1,) bool
        mark flags, one per 64-sample search window."""
        return self.marks_nd(x[:, None, :])[0]

    def accs_np(self, frames):
        """Per-step band amplitudes on the host: frames (ch, steps,
        128) f32 -> (ch, steps, 12) f32, same math as marks_nd (the
        stretch-rescue pass re-derives exact trigger decisions from
        these around candidate clusters).  The 16-step nearDC window
        needs ~16 steps of lead-in before the steps whose accs are
        consumed."""
        win = np.asarray(self.mdct_win)
        B = _mdct_basis(128)
        vec = ((frames * win) @ B).astype(np.float32)
        temp = (vec[..., 0] * vec[..., 0]
                + f32(0.7) * vec[..., 1] * vec[..., 1]
                + f32(0.2) * vec[..., 2] * vec[..., 2])
        cs = np.cumsum(temp, axis=-1, dtype=np.float32)
        w = self.neardc + 1
        winsum = cs - np.concatenate(
            [np.zeros(cs.shape[:-1] + (w,), np.float32),
             cs[..., :-w]], -1)
        decay = todB(winsum * f32(1.0 / w)) * f32(0.5) - f32(15.0)
        pairs = (vec[..., 0::2] * vec[..., 0::2]
                 + vec[..., 1::2] * vec[..., 1::2])[..., :32]
        kk = np.arange(32, dtype=np.float32)
        d = decay[..., None] - f32(8.0) * kk
        sp = np.maximum(np.maximum(todB(pairs) * f32(0.5), d),
                        self.minV)
        return (sp @ np.asarray(self.Bm)).astype(np.float32)

    def marks_nd(self, x):
        """Batched variant: x (ch, NC, S) -> (NC, S//64 - 1) bool.
        The chunk axis lets one dispatch cover every envelope window
        of a whole batch of streams (encode_batch)."""
        ch, NC, S = x.shape
        x64 = x.reshape(ch, NC, S // 64, 64)
        frames = jnp.concatenate([x64[..., :-1, :], x64[..., 1:, :]],
                                 -1)
        # 128-pt MDCT as one MXU matmul — the butterfly lowering's
        # per-stage gathers dominate at this tiny n with a huge batch
        vec = mdct_matmul(frames * self.mdct_win, 128)
        temp = (vec[..., 0] * vec[..., 0]
                + f32(0.7) * vec[..., 1] * vec[..., 1]
                + f32(0.2) * vec[..., 2] * vec[..., 2])
        cs = jnp.cumsum(temp, axis=-1)
        w = self.neardc + 1
        win = cs - jnp.concatenate(
            [jnp.zeros(cs.shape[:-1] + (w,)), cs[..., :-w]], -1)
        decay = todB(win * f32(1.0 / w), xp=jnp) * f32(0.5) - f32(15.0)
        pairs = (vec[..., 0::2] * vec[..., 0::2]
                 + vec[..., 1::2] * vec[..., 1::2])[..., :32]
        kk = jnp.arange(32, dtype=jnp.float32)
        d = decay[..., None] - f32(8.0) * kk
        sp = jnp.maximum(jnp.maximum(
            todB(pairs, xp=jnp) * f32(0.5), d), self.minV)
        acc = jnp.einsum("cnsk,kb->cnsb", sp, self.Bm)  # (ch,NC,st,12)
        prev = jnp.concatenate(
            [jnp.full_like(acc[:, :, :1], -99999.0), acc[:, :, :-1]], 2)
        postmax = jnp.maximum(acc, prev)
        postmin = jnp.minimum(acc, prev)
        premax = jnp.full_like(acc, -99999.0)
        premin = jnp.full_like(acc, 99999.0)
        for s in range(2, 2 + self.stretch):
            sh = jnp.concatenate(
                [jnp.full_like(acc[:, :, :s], -99999.0),
                 acc[:, :, :-s]], 2)
            premax = jnp.maximum(premax, sh)
            premin = jnp.minimum(premin, jnp.where(
                sh <= -99998.0, 99999.0, sh))
        trig1 = ((postmax - premax) > self.pre_thr).any(-1).any(0)
        trig2 = ((postmin - premin) < self.post_thr).any(-1).any(0)
        t1p = jnp.concatenate(
            [jnp.zeros((NC, 1), bool), trig1[:, :-1]], 1)
        t2n = jnp.concatenate(
            [trig2[:, 1:], jnp.zeros((NC, 1), bool)], 1)
        return trig1 | t1p | trig2 | t2n
