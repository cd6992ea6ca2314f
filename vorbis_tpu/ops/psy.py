"""aoTuV psychoacoustic model (noise/tone masking, M1-M9 modules,
coupling/quantization/normalization).

Faithful reimplementation of the reference model (lib/psy.c): tone
masking via octave-seeded empirical curves (EHMER 56-point), noise
masking via two-pass Bark-windowed weighted linear regression over
prefix sums, noise companding, aoTuV modules M1 (MDCT scaling), M2
(post-noise), M3 (impulse noise control), M4 (floor-boost guard), M5
(loud-noise compand), M6 (dynamic lossless promotion), M7 (ntfix), M8
(npeak), M9 (epeak), and point-stereo coupling with noise
normalization.

The heavy per-bin math (bark regression, companding, offset/mix) is
vectorized over bins in float32 with the reference's exact rounding
path; the TPU batched path reuses these formulations with jax.numpy
over (frames, channels) once per-function parity is proven against the
compiled reference (tests/test_psy.py).
"""

from __future__ import annotations

import math
import os
from functools import lru_cache

import numpy as np

from ..utils.scales import fromOC, toBARK, toOC, unitnorm

_DATA = os.path.join(os.path.dirname(__file__), "..", "data")

P_BANDS = 17
P_LEVELS = 8
P_LEVEL_0 = 30.0
P_NOISECURVES = 3
EHMER_MAX = 56
EHMER_OFFSET = 16
NOISE_COMPAND_LEVELS = 40
NEGINF = np.float32(-9999.0)
M3C = 3

f32 = np.float32


@lru_cache(maxsize=1)
def _tables():
    return dict(np.load(os.path.join(_DATA, "psy_tables.npz")))


# stn_compand / freq_bfn / stereo thresholds are small tuning constants
# of the psy model (reference: lib/psy.c top); transcribed via
# tools/transcribe_tables.py into psy_tables.npz along with ATH and the
# tonemask curves.


class PsyLook:
    """Per-(blocktype, n) psychoacoustic lookup state (reference:
    _vp_psy_init)."""

    def __init__(self, vi, gi, n: int, rate: int):
        t = _tables()
        self.vi = vi
        self.gi = gi
        self.n = n
        self.rate = rate
        self.eighth_octave_lines = gi["eighth_octave_lines"]
        self.shiftoc = int(round(math.log2(gi["eighth_octave_lines"] * 8.0))) - 1
        self.firstoc = int(toOC(0.25 * rate * 0.5 / n)
                           * (1 << (self.shiftoc + 1))) \
            - gi["eighth_octave_lines"]
        maxoc = int(toOC((n + 0.25) * rate * 0.5 / n)
                    * (1 << (self.shiftoc + 1)) + 0.5)
        self.total_octave_lines = maxoc - self.firstoc + 1

        # aoTuV positions
        self.n25p = n // 4
        self.n33p = n // 3
        self.n75p = self.n25p * 3
        self.nn25pt = vi["normal_partition"] // 4
        self.nn50pt = 2 * self.nn25pt
        self.nn75pt = 3 * self.nn25pt

        select = -1
        if rate < 26000:
            self.m_val = 0.0
            self.m3n = np.zeros(M3C, np.int64)
        elif rate < 38000:
            self.m_val = 0.93
            sel = {128: 0, 256: 1, 1024: 2, 2048: 3}.get(n, -1)
            select = sel
            self.m3n = (t["m3n32"] if n == 128 else t["m3n32x2"]
                        if n == 256 else np.zeros(M3C, np.int64))
        elif rate > 46000:
            self.m_val = 1.205
            select = {128: 4, 256: 5, 1024: 6, 2048: 7}.get(n, -1)
            self.m3n = (t["m3n48"] if n == 128 else t["m3n48x2"]
                        if n == 256 else np.zeros(M3C, np.int64))
        else:
            self.m_val = 1.0
            select = {128: 8, 256: 9, 1024: 10, 2048: 11}.get(n, -1)
            self.m3n = (t["m3n44"] if n == 128 else t["m3n44x2"]
                        if n == 256 else np.zeros(M3C, np.int64))
        if select < 0:
            self.tonecomp_endp = 0
            self.tonecomp_thres = 0.25
            self.min_nn_lp = 0
            self.tonefix_end = 0
        else:
            pre = t["aotuv_preset"][select]
            self.tonecomp_endp = int(pre[0])
            self.tonecomp_thres = float(t["aotuv_preset_thres"][select])
            self.min_nn_lp = int(pre[2])
            self.tonefix_end = int(pre[3])

        # ATH interpolation onto bins
        ATH = t["ATH"]
        MAX_ATH = len(ATH)
        ath = np.zeros(n, np.float32)
        j = 0
        for i in range(MAX_ATH - 1):
            endpos = int(round(fromOC((i + 1) * 0.125 - 2.0) * 2 * n / rate))
            base = f32(ATH[i])
            if j < endpos:
                delta = f32((ATH[i + 1] - base) / (endpos - j))
                while j < endpos and j < n:
                    ath[j] = f32(base + 100.0)
                    base = f32(base + delta)
                    j += 1
        if j < n:
            cs = np.float64(ath[j - 1])
            dsv = np.float64(ath[j - 1]) - np.float64(ath[j - 2])
            for i in range(j, n):
                ath[i] = f32(cs)
                cs += dsv
        self.ath = ath

        # bark window bounds.  NB: the reference computes the per-bin
        # frequency with C integer division (rate/(2*n)) and stores the
        # center bark as float32 — both are load-bearing for the exact
        # window extents.
        lo = -99
        hi = 1
        bark = np.zeros(n, np.int64)
        hzper = rate // (2 * n)
        wlo = f32(vi["noisewindowlo"])
        whi = f32(vi["noisewindowhi"])
        for i in range(n):
            bk = f32(toBARK(hzper * i))
            # C compares double toBARK(...) against the float32 sum
            # promoted to double — keep both sides as Python floats
            # (numpy would otherwise demote the comparison to float32)
            blo = float(f32(bk - wlo))
            bhi = float(f32(bk + whi))
            while (lo + vi["noisewindowlomin"] < i
                   and toBARK(hzper * lo) < blo):
                lo += 1
            while (hi <= n and (hi < i + vi["noisewindowhimin"]
                                or toBARK(hzper * hi) < bhi)):
                hi += 1
            bark[i] = ((lo - 1) << 16) + (hi - 1)
        self.bark = bark

        # octave mapping (one extra element is read by max_seeds)
        oc = np.zeros(n + 1, np.int64)
        for i in range(n + 1):
            oc[i] = int(toOC((i + 0.25) * 0.5 * rate / n)
                        * (1 << (self.shiftoc + 1)) + 0.5)
        self.octave = oc

        self.tonecurves = _setup_tone_curves(
            np.asarray(vi["toneatt"], np.float64), rate * 0.5 / n, n,
            vi["tone_centerboost"], vi["tone_decay"])

        # noise offsets per curve per bin.  The psy params live in
        # float32 struct fields in the reference and halfoc/del are
        # float32 — replicate that rounding.
        self.noiseoffset = np.zeros((P_NOISECURVES, n), np.float32)
        self.ntfix_noiseoffset = np.zeros(n, np.float32)
        ntfix_off = t["ntfix_offset"].astype(np.float32)
        noiseoff = np.asarray(vi["noiseoff"], np.float32)
        for i in range(n):
            halfoc = f32(toOC((i + 0.5) * rate / (2.0 * n)) * 2.0)
            halfoc = min(max(halfoc, f32(0.0)), f32(P_BANDS - 1))
            inthalfoc = int(halfoc)
            up = min(inthalfoc + 1, P_BANDS - 1)
            del32 = f32(halfoc - inthalfoc)
            del64 = np.float64(del32)
            # C: a*(1.-del) promotes to double (1. is a double literal)
            # but b*del is a float*float product rounded to float32
            for j in range(P_NOISECURVES):
                self.noiseoffset[j, i] = f32(
                    np.float64(noiseoff[j][inthalfoc]) * (1.0 - del64)
                    + np.float64(f32(noiseoff[j][up] * del32)))
            self.ntfix_noiseoffset[i] = f32(
                np.float64(ntfix_off[inthalfoc]) * (1.0 - del64)
                + np.float64(f32(ntfix_off[up] * del32)))


def _setup_tone_curves(curveatt_dB, binHz, n, center_boost,
                       center_decay_rate):
    """Build composited tone-mask curves (reference: setup_tone_curves).
    Returns float32 array (P_BANDS, P_LEVELS, EHMER_MAX+2) where
    [:, :, 0:2] are the fencepost indices."""
    t = _tables()
    ATH = t["ATH"].astype(np.float64)
    MAX_ATH = len(ATH)
    tonemasks = t["tonemasks"].astype(np.float64)  # (17, 6, 56)
    # float32 working arrays with double-evaluated addends, matching the
    # reference's float storage at every step
    workc = np.zeros((P_BANDS, P_LEVELS, EHMER_MAX), np.float32)
    athc = np.zeros((P_LEVELS, EHMER_MAX), np.float32)
    ret = np.zeros((P_BANDS, P_LEVELS, EHMER_MAX + 2), np.float32)
    center_boost = np.float64(f32(center_boost))
    center_decay_rate = np.float64(f32(center_decay_rate))
    curveatt_dB = np.asarray(curveatt_dB, np.float32)

    for i in range(P_BANDS):
        ath_offset = i * 4
        ath = np.zeros(EHMER_MAX, np.float32)
        for j in range(EHMER_MAX):
            mn = f32(999.0)
            for k in range(4):
                idx = j + k + ath_offset
                v = f32(ATH[idx] if idx < MAX_ATH else ATH[MAX_ATH - 1])
                if v < mn:
                    mn = v
            ath[j] = mn
        for j in range(6):
            workc[i, j + 2] = tonemasks[i, j]
        workc[i, 0] = tonemasks[i, 0]
        workc[i, 1] = tonemasks[i, 0]
        for j in range(P_LEVELS):
            k = np.arange(EHMER_MAX)
            # all-float32 chain in C: int*float and float+float products
            adj = (f32(center_boost)
                   + (np.abs(EHMER_OFFSET - k).astype(np.float32)
                      * f32(center_decay_rate))).astype(np.float32)
            adj = np.where((adj < 0) & (center_boost > 0), f32(0.0), adj)
            adj = np.where((adj > 0) & (center_boost < 0), f32(0.0), adj)
            workc[i, j] = (workc[i, j] + adj).astype(np.float32)
        for j in range(P_LEVELS):
            # attenuate_curve takes att as a float parameter: the double
            # expression rounds to float32 at the call, and the per-
            # element add is float32
            att = f32(np.float64(curveatt_dB[i]) + 100.0
                      - (2 if j < 2 else j) * 10.0 - P_LEVEL_0)
            workc[i, j] = (workc[i, j] + att).astype(np.float32)
            att2 = f32(100.0 - np.float64(f32(j * 10.0)) - P_LEVEL_0)
            athc[j] = (ath + att2).astype(np.float32)
            athc[j] = np.maximum(athc[j], workc[i, j])
        for j in range(1, P_LEVELS):
            athc[j] = np.minimum(athc[j], athc[j - 1])
            workc[i, j] = np.minimum(workc[i, j], athc[j])

    for i in range(P_BANDS):
        bin_ = int(fromOC(i * 0.5) / binHz)
        lo_curve = math.ceil(toOC(bin_ * binHz + 1) * 2)
        hi_curve = math.floor(toOC((bin_ + 1) * binHz) * 2)
        lo_curve = min(lo_curve, i)
        lo_curve = max(lo_curve, 0)
        hi_curve = min(hi_curve, P_BANDS - 1)

        for m in range(P_LEVELS):
            brute = np.full(n, 999.0, np.float64)

            def render(k, center_i):
                l = 0
                for j in range(EHMER_MAX):
                    lo_bin = int(fromOC(j * 0.125 + center_i * 0.5 - 2.0625)
                                 / binHz)
                    hi_bin = int(fromOC(j * 0.125 + center_i * 0.5 - 1.9375)
                                 / binHz) + 1
                    lo_bin = min(max(lo_bin, 0), n)
                    if lo_bin < l:
                        l = lo_bin
                    hi_bin = min(max(hi_bin, 0), n)
                    while l < hi_bin and l < n:
                        if brute[l] > workc[k, m, j]:
                            brute[l] = workc[k, m, j]
                        l += 1
                while l < n:
                    if brute[l] > workc[k, m, EHMER_MAX - 1]:
                        brute[l] = workc[k, m, EHMER_MAX - 1]
                    l += 1

            for k in range(lo_curve, hi_curve + 1):
                render(k, k)
            if i + 1 < P_BANDS:
                render(i + 1, i)

            for j in range(EHMER_MAX):
                bn = int(fromOC(j * 0.125 + i * 0.5 - 2.0) / binHz)
                ret[i, m, j + 2] = (-999.0 if bn < 0 or bn >= n
                                    else brute[bn])
            j = 0
            while j < EHMER_OFFSET and ret[i, m, j + 2] <= -200.0:
                j += 1
            ret[i, m, 0] = j
            j = EHMER_MAX - 1
            while j > EHMER_OFFSET + 1 and ret[i, m, j + 2] <= -200.0:
                j -= 1
            ret[i, m, 1] = j
    return ret


# ---------------------------------------------------------------------------
# noise masking
# ---------------------------------------------------------------------------

def bark_noise_hybridmp(n, bark, fvec, offset, fixed):
    """Bark-windowed weighted least-squares line fit per bin, exactly
    replicating the incremental float32 prefix sums of the reference
    (psy.c bark_noise_hybridmp scalar)."""
    f = np.asarray(fvec, np.float32)
    x = np.arange(n, dtype=np.float32)
    y = np.maximum(f + f32(offset), f32(1.0))
    w = (y * y).astype(np.float32)
    w0_half = f32(w[0] * f32(0.5))
    wx = (w * x).astype(np.float32)
    wxx = (wx * x).astype(np.float32)
    wy = (w * y).astype(np.float32)
    wxy = (wx * y).astype(np.float32)
    # the first element enters with weight w/2 and x=0
    wfirst = w.copy()
    wfirst[0] = w0_half
    wyfirst = wy.copy()
    wyfirst[0] = f32(w0_half * y[0])
    N = np.cumsum(wfirst, dtype=np.float32)
    X = np.cumsum(wx, dtype=np.float32)
    X[0] = w0_half  # tX starts at w (x=0 notionally contributes w*0... )
    # reference: tX += w at i=0 (x treated as 0 for X? no: tX += w)
    # Actually: tX += w; so X[0] = w/2, then X[i] = X[0] + sum wx[1..i]
    X = np.cumsum(np.concatenate([[w0_half], wx[1:]]), dtype=np.float32)
    XX = np.cumsum(np.concatenate([[f32(0.0)], wxx[1:]]), dtype=np.float32)
    Y = np.cumsum(wyfirst, dtype=np.float32)
    XY = np.cumsum(np.concatenate([[f32(0.0)], wxy[1:]]), dtype=np.float32)

    noise = np.zeros(n, np.float32)
    lo = (bark >> 16).astype(np.int64)
    hi = (bark & 0xFFFF).astype(np.int64)

    # region 1: window clipped at the low end (lo < 0)
    # region 2: full window
    # region 3: window clipped at the high end (hi >= n) -> extrapolate
    idx = np.arange(n)
    r1 = (lo < 0) & (-lo < n) & (hi < n)
    # find first index where r1 stops holding (reference breaks at first
    # failure, then region 2 until its condition fails, then region 3)
    i1 = 0
    while i1 < n and r1[i1]:
        i1 += 1
    i2 = i1
    while i2 < n and lo[i2] >= 0 and lo[i2] < n and hi[i2] < n:
        i2 += 1

    A_last = f32(0.0)
    B_last = f32(0.0)
    D_last = f32(1.0)
    if i1 > 0:
        s = slice(0, i1)
        tN = N[hi[s]] + N[-lo[s]]
        tX = X[hi[s]] - X[-lo[s]]
        tXX = XX[hi[s]] + XX[-lo[s]]
        tY = Y[hi[s]] + Y[-lo[s]]
        tXY = XY[hi[s]] - XY[-lo[s]]
        A = tY * tXX - tX * tXY
        B = tN * tXY - tX * tY
        D = tN * tXX - tX * tX
        R = ((A + x[s] * B) / D).astype(np.float32)
        noise[s] = np.maximum(R, f32(0.0)) - f32(offset)
    if i2 > i1:
        s = slice(i1, i2)
        tN = N[hi[s]] - N[lo[s]]
        tX = X[hi[s]] - X[lo[s]]
        tXX = XX[hi[s]] - XX[lo[s]]
        tY = Y[hi[s]] - Y[lo[s]]
        tXY = XY[hi[s]] - XY[lo[s]]
        A = tY * tXX - tX * tXY
        B = tN * tXY - tX * tY
        D = tN * tXX - tX * tX
        R = ((A + x[s] * B) / D).astype(np.float32)
        noise[s] = np.maximum(R, f32(0.0)) - f32(offset)
        A_last, B_last, D_last = A[-1], B[-1], D[-1]
    elif i1 > 0:
        A_last, B_last, D_last = A[-1], B[-1], D[-1]
    if i2 < n:
        s = slice(i2, n)
        R = ((A_last + x[s] * B_last) / D_last).astype(np.float32)
        noise[s] = np.maximum(R, f32(0.0)) - f32(offset)

    if fixed <= 0:
        return noise

    hi_f = idx + fixed // 2
    lo_f = hi_f - fixed
    j1 = 0
    while j1 < n and hi_f[j1] < n and lo_f[j1] < 0:
        j1 += 1
    j2 = j1
    while j2 < n and hi_f[j2] < n and lo_f[j2] >= 0:
        j2 += 1
    A_last = f32(0.0)
    B_last = f32(0.0)
    D_last = f32(1.0)
    if j1 > 0:
        s = slice(0, j1)
        tN = N[hi_f[s]] + N[-lo_f[s]]
        tX = X[hi_f[s]] - X[-lo_f[s]]
        tXX = XX[hi_f[s]] + XX[-lo_f[s]]
        tY = Y[hi_f[s]] + Y[-lo_f[s]]
        tXY = XY[hi_f[s]] - XY[-lo_f[s]]
        A = tY * tXX - tX * tXY
        B = tN * tXY - tX * tY
        D = tN * tXX - tX * tX
        R = ((A + x[s] * B) / D).astype(np.float32)
        noise[s] = np.minimum(noise[s], R - f32(offset))
        A_last, B_last, D_last = A[-1], B[-1], D[-1]
    if j2 > j1:
        s = slice(j1, j2)
        tN = N[hi_f[s]] - N[lo_f[s]]
        tX = X[hi_f[s]] - X[lo_f[s]]
        tXX = XX[hi_f[s]] - XX[lo_f[s]]
        tY = Y[hi_f[s]] - Y[lo_f[s]]
        tXY = XY[hi_f[s]] - XY[lo_f[s]]
        A = tY * tXX - tX * tXY
        B = tN * tXY - tX * tY
        D = tN * tXX - tX * tX
        R = ((A + x[s] * B) / D).astype(np.float32)
        noise[s] = np.minimum(noise[s], R - f32(offset))
        A_last, B_last, D_last = A[-1], B[-1], D[-1]
    if j2 < n:
        s = slice(j2, n)
        R = ((A_last + x[s] * B_last) / D_last).astype(np.float32)
        noise[s] = np.minimum(noise[s], R - f32(offset))
    return noise


def ntfix(p: PsyLook, spectral, noise, block_mode):
    """aoTuV M7: compensate tone components underestimated by the noise
    fit (reference: psy.c ntfix)."""
    n = p.n
    nx = p.tonefix_end
    if not nx:
        return
    limit = abs(p.noiseoffset[1][0])
    temp = np.zeros(256, np.float32)

    if block_mode <= 1:
        freq_upc = 3
        freq_unc = 4
        nxplus = nx + freq_unc
        tolerance = 15.0 if n == 256 else 9.0
        strength = 0.6
        if nxplus > n:
            nx = n
            nxplus = n - freq_unc
        inmod = np.zeros(256, np.float32)
        sp = spectral
        m = np.arange(nxplus)
        inmod[:nxplus] = np.where(sp[:nxplus] < -70,
                                  f32(-70) + (sp[:nxplus] + f32(70))
                                  * f32(0.1),
                                  sp[:nxplus])
        i = freq_unc
        while i < nx:
            if sp[i] > sp[i - 1] and sp[i] > sp[i + 1]:
                ps = i - 1
                pe = i + 1
                upper = i - freq_upc
                under = i + freq_unc
                j = ps
                while j > upper:
                    if sp[j + 1] < sp[j]:
                        break
                    ps = j
                    j -= 1
                j = pe
                while j < under:
                    if sp[j - 1] < sp[j]:
                        break
                    pe = j
                    j += 1
                ss = max(f32(inmod[i] - inmod[ps]), f32(inmod[i] - inmod[pe]))
                if ss > tolerance:
                    if sp[i] > noise[i]:
                        ss = f32((ss - f32(tolerance)) * f32(strength))
                    temp[ps:pe + 1] = np.maximum(ss, temp[ps:pe + 1])
                    temp[ps:pe + 1] = np.maximum(temp[ps:pe + 1], f32(0.0))
                i = pe
            i += 1
        k = np.arange(freq_unc - 1, nx)
        test = np.minimum(p.ntfix_noiseoffset[k],
                          p.noiseoffset[1][k] + f32(limit))
        tt = np.minimum(temp[k], test)
        noise[k] -= tt
    elif block_mode == 2:
        # the averaging loop runs while i<nx (ceil(nx/8) averages, the
        # last possibly spanning past nx), but the peak scan stops at
        # nx/8 — the extra average still participates as temp[i+1]
        navg = (nx + 7) // 8
        nx8 = nx // 8
        temp = np.zeros(256, np.float32)
        for i in range(navg):
            na = 0.0  # C: sequential double accumulation of float terms
            for v in noise[8 * i:8 * i + 8]:
                na += float(v)
            temp[i] = f32(na / 8)
        i = 3
        while i < nx8:
            if temp[i] > temp[i - 1] and temp[i] > temp[i + 1]:
                if temp[i - 1] > temp[i - 2]:
                    thres = temp[i - 2]
                    a = i - 3
                else:
                    thres = temp[i - 1]
                    a = i - 2
                b = i + 3
                thres = f32(temp[i] - thres)
                if thres > 2.0:
                    eightimes = i * 8
                    test = min(p.ntfix_noiseoffset[eightimes],
                               f32(p.noiseoffset[1][eightimes] + f32(limit)))
                    thres = min(f32(thres - 2), test)
                    noise[a * 8:b * 8 + 1] -= thres
            i += 1


def noisemask(p: PsyLook, noise_compand_level, logmdct, lastmdct,
              poste, block_mode):
    """_vp_noisemask: returns (logmask, epeak, npeak)."""
    t = _tables()
    stn_compand = t["stn_compand"].astype(np.float32)
    n = p.n
    vi = p.vi
    partition = vi["normal_partition"] if vi["normal_p"] else 16

    logmask = bark_noise_hybridmp(n, p.bark, logmdct, 140.0, -1)
    work = (logmdct - logmask).astype(np.float32)
    logmask = bark_noise_hybridmp(n, p.bark, work, 0.0,
                                  vi["noisewindowfixed"])
    work = (logmdct - work).astype(np.float32)

    ntfix(p, logmdct, work, block_mode)

    epeak = np.zeros(n, np.float32)
    newmask = np.zeros(n, np.float32)
    # C: int dB = logmask[i]+.5 — the add is double (double literal),
    # the cast truncates toward zero
    dB = (logmask.astype(np.float64) + 0.5).astype(np.int64)
    np.clip(dB, 0, NOISE_COMPAND_LEVELS - 1, out=dB)
    nc = np.asarray(vi["noisecompand"], np.float32)
    nch = np.asarray(vi["noisecompand_high"], np.float32)
    i0 = 0
    if noise_compand_level > 0:
        i0 = p.n33p
        s = slice(0, i0)
        epeak[s] = work[s] + stn_compand[dB[s]]
        # C association: (work + nc[dB]) - ((nc[dB]-nch[dB]) * level)
        newmask[s] = ((work[s] + nc[dB[s]])
                      - ((nc[dB[s]] - nch[dB[s]])
                         * f32(noise_compand_level))).astype(np.float32)
    s = slice(i0, n)
    epeak[s] = work[s] + stn_compand[dB[s]]
    newmask[s] = work[s] + nc[dB[s]]
    logmask = newmask

    nparts = max((n + partition - 1) // partition, 1)
    npeak = np.zeros(nparts, np.float32)

    # M2 post-echo reduction
    if poste > 0:
        k = 0
        i = 0
        while i < p.min_nn_lp:
            temp = min(min(poste, 30.0), p.noiseoffset[1][i] + 30.0)
            if temp > 0:
                npeak[k] = -1.0
                logmask[i:i + partition] -= f32(temp)
            i += partition
            k += 1

    # M8: per-partition floor store for noise normalization
    k = 0
    i = 0
    nt = 4.0
    while i < p.min_nn_lp:
        o = p.noiseoffset[1][i + partition - 1] + 6
        if o > 0 and npeak[k] >= -0.5:
            seg_md = logmdct[i:i + partition]
            me = np.max((seg_md - logmask[i:i + partition]).astype(np.float32))
            me = max(f32(0.0), me)
            avge = np.sum(seg_md.astype(np.float64))
            if avge >= (-95 * partition):
                if me < nt:
                    npeak[k] = min(o, nt - me) / nt
        i += partition
        k += 1

    # M9: peak impulse for coupling stereo
    i = 0
    if block_mode > 1:
        end = p.tonecomp_endp
        seg = slice(0, end)
        temp = (logmdct[seg] - epeak[seg]).astype(np.float32)
        mi = (logmdct[seg] - lastmdct[seg]).astype(np.float32)
        epeak[seg] = np.where((temp >= 12.0) & (mi >= 1), mi, f32(0.0))
        i = end
    epeak[i:] = 0.0
    return logmask, epeak, npeak


def lb_loudnoise_fix(p: PsyLook, noise_compand_level, logmdct,
                     block_mode, lW_block_mode):
    """aoTuV M5."""
    if p.m_val < 0.5:
        return -1.0
    if p.vi["normal_thresh"] > 0.45:
        return -1.0
    if not ((block_mode == 2 and lW_block_mode == 3)
            or (block_mode == 3 and lW_block_mode == 2)):
        return noise_compand_level
    seg = logmdct[p.n25p:p.n75p].astype(np.float64)
    hi_th = np.sum(np.maximum(seg, -130.0)) / p.n
    if hi_th > -40.0:
        return -1.0
    if hi_th < -50.0:
        return 1.0
    return 1.0 - ((hi_th + 50) / 10)


def postnoise_detection(pcm, nn, mode, lw_mode):
    """aoTuV M2 pre-detection on raw (unwindowed) PCM."""
    if mode != 2 or lw_mode != 0 or nn < 2048:
        return -1.0
    sn = nn >> 2
    mn = sn + sn
    en = sn + (nn >> 1)
    upt = float(np.sum(np.abs(pcm[sn:mn]).astype(np.float64)))
    unt = float(np.sum(np.abs(pcm[mn:en]).astype(np.float64)))
    if unt / sn > 0.01:
        return -1.0
    upt *= upt
    unt *= unt
    unt *= 15
    if upt > unt:
        ret = upt - unt
        return -1.0 if ret < 0.1 else ret
    return -1.0


# ---------------------------------------------------------------------------
# tone masking
# ---------------------------------------------------------------------------

def tonemask(p: PsyLook, logfft, global_specmax, local_specmax):
    """_vp_tonemask: ATH floor + octave-seeded tone curves."""
    n = p.n
    vi = p.vi
    seed = np.full(p.total_octave_lines, NEGINF, np.float32)
    att = f32(local_specmax + vi["ath_adjatt"])
    if att < vi["ath_maxatt"]:
        att = f32(vi["ath_maxatt"])
    logmask = (p.ath + att).astype(np.float32)

    _seed_loop(p, logfft, logmask, seed, global_specmax)
    _max_seeds(p, seed, logmask)
    return logmask


def _seed_loop(p: PsyLook, f, flr, seed, specmax):
    vi = p.vi
    n = p.n
    dBoffset = f32(vi["max_curve_dB"] - specmax)
    curves = p.tonecurves
    linesper = p.eighth_octave_lines
    total = p.total_octave_lines
    i = 0
    while i < n:
        mx = f[i]
        oc0 = p.octave[i]
        while i + 1 < n and p.octave[i + 1] == oc0:
            i += 1
            if f[i] > mx:
                mx = f[i]
        if f32(mx + 6.0) > flr[i]:
            oc = oc0 >> p.shiftoc
            oc = min(max(oc, 0), P_BANDS - 1)
            _seed_curve(seed, curves[oc], mx, oc0 - p.firstoc,
                        total, linesper, dBoffset)
        i += 1


def _seed_curve(seed, curves, amp, oc, n, linesper, dBoffset):
    choice = int(f32(f32(amp + dBoffset) - f32(P_LEVEL_0)) * f32(0.1))
    choice = min(max(choice, 0), P_LEVELS - 1)
    posts = curves[choice]
    curve = posts[2:]
    post0 = int(posts[0])
    post1 = int(posts[1])
    seedptr = oc + (post0 - EHMER_OFFSET) * linesper - (linesper >> 1)
    for i in range(post0, post1):
        if seedptr > 0:
            lin = f32(amp + curve[i])
            if seed[seedptr] < lin:
                seed[seedptr] = lin
        seedptr += linesper
        if seedptr >= n:
            break


def _seed_chase(seeds, linesper, n):
    posstack = np.zeros(n, np.int64)
    ampstack = np.zeros(n, np.float32)
    stack = 0
    for i in range(n):
        if stack < 2:
            posstack[stack] = i
            ampstack[stack] = seeds[i]
            stack += 1
        else:
            while True:
                if seeds[i] < ampstack[stack - 1]:
                    posstack[stack] = i
                    ampstack[stack] = seeds[i]
                    stack += 1
                    break
                else:
                    if i < posstack[stack - 1] + linesper:
                        if (stack > 1
                                and ampstack[stack - 1] <= ampstack[stack - 2]
                                and i < posstack[stack - 2] + linesper):
                            stack -= 1
                            continue
                    posstack[stack] = i
                    ampstack[stack] = seeds[i]
                    stack += 1
                    break
    pos = 0
    for i in range(stack):
        if i < stack - 1 and ampstack[i + 1] > ampstack[i]:
            endpos = posstack[i + 1]
        else:
            endpos = posstack[i] + linesper + 1
        endpos = min(endpos, n)
        if endpos > pos:
            seeds[pos:endpos] = ampstack[i]
            pos = endpos


def _max_seeds(p: PsyLook, seed, flr):
    n = p.total_octave_lines
    linesper = p.eighth_octave_lines
    _seed_chase(seed, linesper, n)
    linpos = 0
    pos = p.octave[0] - p.firstoc - (linesper >> 1)
    while linpos + 1 < p.n:
        minV = seed[pos]
        end = ((p.octave[linpos] + p.octave[linpos + 1]) >> 1) - p.firstoc
        if minV > p.vi["tone_abs_limit"]:
            minV = f32(p.vi["tone_abs_limit"])
        while pos + 1 <= end:
            pos += 1
            if (seed[pos] > NEGINF and seed[pos] < minV) or minV == NEGINF:
                minV = seed[pos]
        end = pos + p.firstoc
        while linpos < p.n and p.octave[linpos] <= end:
            if flr[linpos] < minV:
                flr[linpos] = minV
            linpos += 1
    minV = seed[p.total_octave_lines - 1]
    flr[linpos:] = np.maximum(flr[linpos:], minV)
