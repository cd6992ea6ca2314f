"""Managed (ABR/CBR) fast encode: the 15-packetblob pass on device.

Reference behavior (lib/mapping0.c:1090-1313 + lib/bitrate.c:73-227):
under bitrate management every block computes THREE floor fits (the
offset_select 0/1/2 psy masks), interpolates them into 15 candidate
post ladders, fully encodes all 15 packet variants (floor wrap coding,
per-blob coupling thresholds and sliding lowpass, residue VQ, Huffman),
and the reservoir "floater" picks which blob to emit, truncating or
zero-padding at the hard min/max walls.

TPU-first formulation (SURVEY.md §7 translation table, "15
packetblobs" row): the 15 variants are data-parallel — the blob axis
folds into the frame batch, so one jit step encodes (F x 15) packets;
the host runs only the tiny serial reservoir scan over the returned
(F, 15) byte sizes and fetches just the chosen packets via a device
gather (1/15th of the packet bytes cross the host link).

The psy masks are the fast path's stateless variants (same contract as
the unmanaged fast path: valid aoTuV-compatible streams, not
byte-identical to the golden encoder).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .encdevice import DeviceFastEncode

f32 = np.float32
PACKETBLOBS = 15


def _interp_posts(pA, pB, uA, uB, delta):
    """floor1_interpolate_fit on device (floor1.c:752): int post
    interpolation in the raw fit domain, 0x8000 only when both ends
    interpolate."""
    out = ((65536 - delta) * (pA & 0x7FFF) + delta * (pB & 0x7FFF)
           + 32768) >> 16
    flag = ((pA & 0x8000) != 0) & ((pB & 0x8000) != 0)
    return jnp.where(flag, out | 0x8000, out), uA & uB


def _blob_ladder(ps, us):
    """The 15-way post ladder from the three offset_select fits
    (floor1_interpolate_fit; endpoints gated on the middle fit like
    the reference blob loop, mapping0.c:1204-1313)."""
    lad, ul = [], []
    for k in range(PACKETBLOBS):
        if k == 7:
            lad.append(ps[1])
            ul.append(us[1])
        elif k == 0:
            lad.append(ps[0])
            ul.append(us[0] & us[1])
        elif k == PACKETBLOBS - 1:
            lad.append(ps[2])
            ul.append(us[2] & us[1])
        elif k < 7:
            p, u = _interp_posts(ps[0], ps[1], us[0], us[1],
                                 k * 65536 // 7)
            lad.append(p)
            ul.append(u)
        else:
            p, u = _interp_posts(ps[1], ps[2], us[1], us[2],
                                 (k - 7) * 65536 // 7)
            lad.append(p)
            ul.append(u)
    return lad, ul


class DeviceManagedEncode:
    """One-jit managed encode step: frames -> 15 packed packet
    variants per frame + their bit counts."""

    def __init__(self, fe, W=1):
        from ..models.fastenc import _couple_params
        self.fe = fe
        # share the encoder's per-W DeviceFastEncode (same plans and
        # compiled caches the unmanaged pipeline uses)
        self.dev = fe._dev_for(W) if hasattr(fe, "_dev_for") \
            else DeviceFastEncode(fe, W=W)
        self.W = W
        ctx = self.dev.ctx
        self.ctx = ctx
        n2 = ctx.n // 2
        self.n2 = n2
        g = fe.setup.psy_global
        # psy blocktype for this block mode: impulse (0) for the short
        # pipeline of a switching encoder, the encoder's main
        # blocktype otherwise
        bt = fe.blocktype if W == fe.W_main else 0
        self.blocktype = bt
        # per-blob coupling thresholds (res2 streams)
        if self.dev.res_type == 2:
            thr1 = np.zeros((PACKETBLOBS, n2), np.float32)
            threv = np.zeros((PACKETBLOBS, n2), np.float32)
            limit = np.zeros(PACKETBLOBS, np.int64)
            for k in range(PACKETBLOBS):
                cp = _couple_params(fe.setup, bt, W, n2,
                                    blob=k)
                thr1[k] = cp["thr1"]
                threv[k] = cp["threv"]
                limit[k] = cp["limit"]
            self.thr1_15 = thr1
            self.threv_15 = threv
            bins = np.arange(n2)
            self.inlimit_15 = (bins[None, :]
                               >= limit[:, None])          # (15, n2)
        # per-blob sliding lowpass (bins), capped at n2
        sl = np.asarray(g["sliding_lowpass"][1 if W else 0],
                        np.int64)[:PACKETBLOBS]
        self.lowpass_15 = np.minimum(sl, n2).astype(np.int32)
        self._step_cache = {}
        self._gather = None

    def make_framed_step(self, F, wb=None):
        """Jittable frames (F, ch, n) -> (packets (F, 15, wb) uint8,
        nbits (F, 15) int32)."""
        dev = self.dev
        ctx = self.ctx
        wb = wb or dev.plan.wb
        ch = dev.ch
        n = dev.n
        n2 = self.n2
        NB = PACKETBLOBS

        def step(frames):
            if frames.dtype != jnp.float32:
                frames = frames.astype(jnp.float32) / f32(32768.0)
            flat = frames.reshape(F * ch, n)
            md, logmdct, masks3 = ctx.analysis.managed_masks(flat)
            ps, us = [], []
            for k in range(3):
                p, u = ctx.floor(logmdct, masks3[:, k])
                ps.append(p)
                us.append(u)
            # 15-way ladder (floor1_interpolate_fit; endpoints gated
            # on the middle fit like the reference blob loop)
            P = ps[0].shape[-1]
            lad, ul = _blob_ladder(ps, us)
            p15 = jnp.stack(lad, 1)                 # (F*ch, 15, P)
            u15 = jnp.stack(ul, 1)                  # (F*ch, 15)
            # fold blob into the frame batch: rows (F, blob, ch)
            p15 = p15.reshape(F, ch, NB, P).transpose(0, 2, 1, 3) \
                .reshape(F * NB * ch, P)
            u15 = u15.reshape(F, ch, NB).transpose(0, 2, 1) \
                .reshape(F * NB * ch)
            mdr = jnp.broadcast_to(
                md.reshape(F, 1, ch, n2), (F, NB, ch, n2)) \
                .reshape(F * NB * ch, n2)
            lowpass = jnp.broadcast_to(
                jnp.asarray(self.lowpass_15)[None, :, None],
                (F, NB, ch)).reshape(F * NB * ch)
            kw = dict(lowpass=lowpass)
            if dev.res_type == 2:
                kw["thr1"] = jnp.broadcast_to(
                    jnp.asarray(self.thr1_15)[None], (F, NB, n2)) \
                    .reshape(F * NB, n2)
                kw["threv"] = jnp.broadcast_to(
                    jnp.asarray(self.threv_15)[None], (F, NB, n2)) \
                    .reshape(F * NB, n2)
                kw["inlimit"] = jnp.broadcast_to(
                    jnp.asarray(self.inlimit_15)[None], (F, NB, n2)) \
                    .reshape(F * NB, n2)
            pk, nb = dev.finish_from_posts(mdr, p15, u15, F * NB, wb,
                                           **kw)
            return pk.reshape(F, NB, -1), nb.reshape(F, NB)

        return step

    def get_step(self, F, wb=None):
        key = (F, wb or self.dev.plan.wb)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                self.make_framed_step(F, wb))
        return self._step_cache[key]

    # -- stateful two-phase (cross-frame psy state) -------------------------
    def make_probe_step(self, F):
        """Phase A for the managed path: frames (F, ch, n) -> spectra
        kept on device + the host-recurrence inputs.  The managed fast
        path is long-only, so the active cross-frame states are the
        ampmax decay (tone mask) and the M9 lastmdct epeak; lastmdct
        is the previous frame's logmdct verbatim (lmode 0)."""
        dev = self.dev
        da = self.ctx.analysis
        n, ch = dev.n, dev.ch

        def step(frames):
            if frames.dtype != jnp.float32:
                frames = frames.astype(jnp.float32) / f32(32768.0)
            flat = frames.reshape(F * ch, n)
            md, logmdct, fit1, dB, logfft = da.spectra(
                flat, None, with_fft=True)
            lam = jnp.minimum(jnp.max(logfft, axis=-1), 0.0)
            return md, logmdct, logfft, fit1, dB, lam

        return step

    def make_finish_step(self, F, wb=None):
        """Phase B: spectra + per-frame state (ampmax (F,), lastmdct
        rows (F*ch, n2)) -> 15 packed packet variants.  Mirrors
        make_framed_step's mask/ladder construction but with the
        stateful noise tail (M7/M8/M9 via psydevice.noisemask_tail)
        and the ampmax-aware tone mask, matching the unmanaged
        two-phase pipeline's psy semantics."""
        from . import psydevice as PD
        dev = self.dev
        ctx = self.ctx
        da = ctx.analysis
        look = da.look
        wb = wb or dev.plan.wb
        ch = dev.ch
        n2 = self.n2
        NB = PACKETBLOBS

        def step(md, logmdct, logfft, fit1, dB, lastmdct, lam,
                 ampmax):
            R = F * ch
            neg1 = jnp.full(R, -1.0, jnp.float32)
            logmask, epeak, npeak = PD.noisemask_tail(
                look, logmdct, fit1, dB, neg1, neg1, lastmdct,
                "long", trans_active=jnp.zeros(R, bool))
            amp_rows = jnp.repeat(ampmax, ch)
            tone = da.tonemask(logfft, amp_rows, lam)
            # select order mirrors the reference (mapping0.c:1090-
            # 1181): mask1 first — its M1 pass rescales the mdct used
            # by every blob
            md1, m1 = da.offset_and_mix(md, logmdct, logmask, tone, 1)
            _, m2 = da.offset_and_mix(md1, logmdct, logmask, tone, 2)
            _, m0 = da.offset_and_mix(md1, logmdct, logmask, tone, 0)
            masks3 = jnp.stack([m0, m1, m2], axis=-2)
            ps, us = [], []
            for k in range(3):
                p, u = ctx.floor(logmdct, masks3[:, k])
                ps.append(p)
                us.append(u)
            P = ps[0].shape[-1]
            lad, ul = _blob_ladder(ps, us)
            p15 = jnp.stack(lad, 1).reshape(F, ch, NB, P) \
                .transpose(0, 2, 1, 3).reshape(F * NB * ch, P)
            u15 = jnp.stack(ul, 1).reshape(F, ch, NB) \
                .transpose(0, 2, 1).reshape(F * NB * ch)
            mdr = jnp.broadcast_to(
                md1.reshape(F, 1, ch, n2), (F, NB, ch, n2)) \
                .reshape(F * NB * ch, n2)
            epk = jnp.broadcast_to(
                epeak.reshape(F, 1, ch, n2), (F, NB, ch, n2)) \
                .reshape(F * NB * ch, n2)
            npk = jnp.broadcast_to(
                npeak.reshape(F, 1, ch, -1),
                (F, NB, ch, npeak.shape[-1])) \
                .reshape(F * NB * ch, npeak.shape[-1])
            lowpass = jnp.broadcast_to(
                jnp.asarray(self.lowpass_15)[None, :, None],
                (F, NB, ch)).reshape(F * NB * ch)
            kw = dict(lowpass=lowpass, epeak=epk, npeak=npk)
            if dev.res_type == 2:
                kw["thr1"] = jnp.broadcast_to(
                    jnp.asarray(self.thr1_15)[None], (F, NB, n2)) \
                    .reshape(F * NB, n2)
                kw["threv"] = jnp.broadcast_to(
                    jnp.asarray(self.threv_15)[None], (F, NB, n2)) \
                    .reshape(F * NB, n2)
                kw["inlimit"] = jnp.broadcast_to(
                    jnp.asarray(self.inlimit_15)[None], (F, NB, n2)) \
                    .reshape(F * NB, n2)
            pk, nb = dev.finish_from_posts(mdr, p15, u15, F * NB, wb,
                                           **kw)
            return pk.reshape(F, NB, -1), nb.reshape(F, NB)

        return step

    def make_finish_step15(self, F, wb=None):
        """Stateful 15-blob finish for the SWITCHED managed pipeline.

        Same per-frame state contract as the unmanaged
        DeviceFastEncode.make_finish_step (fstate packs ampmax /
        lowcomp / poste / trans / wid; m3vec carries the short-mode M3
        fields), but every frame emits all 15 packetblob variants:
        the three offset_select val/tval curves each run the full
        M-module machinery (M5 low_compand, M3 echo control on short
        blocks — the reference runs _vp_offset_and_mix once per
        select, psy.c:4274-4502 via mapping0.c:1090-1181), select 1's
        M1 pass rescales the mdct every blob consumes, then the floor
        fit ladder and per-blob coupling thresholds / sliding lowpass
        finish as in make_finish_step."""
        from . import psydevice as PD
        dev = self.dev
        ctx = self.ctx
        da = ctx.analysis
        look = da.look
        wb = wb or dev.plan.wb
        ch = dev.ch
        n2 = self.n2
        NB = PACKETBLOBS

        def step(md, logmdct, logfft, fit1, dB, lastmdct, lam,
                 fstate, m3vec):
            o = 0
            ampmax = fstate[o:o + F]
            o += F
            lowcomp = fstate[o:o + F * ch]
            o += F * ch
            poste = fstate[o:o + F * ch]
            o += F * ch
            trans = fstate[o:o + F] > f32(0.5)
            o += F
            wid = fstate[o:o + F].astype(jnp.int32)
            m3 = None
            if m3vec is not None:
                m3 = dict(sw=m3vec[0] > f32(0.5), noise_rate=m3vec[1],
                          noise_center=m3vec[2], tone_rate=m3vec[3],
                          reset=m3vec[4] > f32(0.5),
                          impad_zero=m3vec[5] > f32(0.5))
            kind = "long" if self.W else "short"
            logmask, epeak, npeak = PD.noisemask_tail(
                look, logmdct, fit1, dB, lowcomp, poste, lastmdct,
                kind,
                trans_active=jnp.repeat(trans, ch) if self.W
                else None)
            amp_rows = jnp.repeat(ampmax, ch)
            tone = da.tonemask(logfft, amp_rows, lam)
            alt = jnp.repeat(trans, ch)[:, None]

            def val_tval(sel):
                noff = jnp.where(alt, da.noiseoffsets_alt[sel],
                                 da.noiseoffsets[sel])
                val = jnp.minimum(logmask + noff, da.noisemaxsupp)
                tval = tone + da.toneatts[sel]
                tval = PD.lowcompand_tval(look, tval, lowcomp, sel)
                if not self.W and m3 is not None:
                    shp = (F, ch, n2)
                    temps = PD.m3_tempmdct_scan(
                        look, logmdct[:, :n2].reshape(shp),
                        lastmdct.reshape(F, ch, -1),
                        val.reshape(shp), tval.reshape(shp), m3)
                    v2, t2, npk2 = PD.m3_apply(
                        look, val.reshape(shp), tval.reshape(shp),
                        logmdct[:, :n2].reshape(shp),
                        lastmdct.reshape(F, ch, -1), temps,
                        npeak.reshape((F, ch, -1)), m3,
                        m3["impad_zero"])
                    return (v2.reshape(F * ch, n2),
                            t2.reshape(F * ch, n2),
                            npk2.reshape(F * ch, -1))
                return val, tval, npeak

            # select order mirrors the reference: 1 first (M1 rescale
            # feeds every blob), then 2, 0; masks are md-independent
            v1, t1, npk1 = val_tval(1)
            md1, m1 = da.mix_m4_m1(md, logmdct, v1, t1, 1)
            v2, t2, _ = val_tval(2)
            _, m2 = da.mix_m4_m1(md1, logmdct, v2, t2, 2)
            v0, t0, _ = val_tval(0)
            _, m0 = da.mix_m4_m1(md1, logmdct, v0, t0, 0)
            masks3 = jnp.stack([m0, m1, m2], axis=-2)
            ps, us = [], []
            for k in range(3):
                p, u = ctx.floor(logmdct, masks3[:, k])
                ps.append(p)
                us.append(u)
            P = ps[0].shape[-1]
            lad, ul = _blob_ladder(ps, us)
            p15 = jnp.stack(lad, 1).reshape(F, ch, NB, P) \
                .transpose(0, 2, 1, 3).reshape(F * NB * ch, P)
            u15 = jnp.stack(ul, 1).reshape(F, ch, NB) \
                .transpose(0, 2, 1).reshape(F * NB * ch)

            def bcast(x):
                return jnp.broadcast_to(
                    x.reshape(F, 1, ch, x.shape[-1]),
                    (F, NB, ch, x.shape[-1])) \
                    .reshape(F * NB * ch, x.shape[-1])

            mdr = bcast(md1)
            epk = bcast(epeak)
            npk = bcast(npk1)
            lowpass = jnp.broadcast_to(
                jnp.asarray(self.lowpass_15)[None, :, None],
                (F, NB, ch)).reshape(F * NB * ch)
            kw = dict(lowpass=lowpass, epeak=epk, npeak=npk)
            if dev.res_type == 2:
                kw["thr1"] = jnp.broadcast_to(
                    jnp.asarray(self.thr1_15)[None], (F, NB, n2)) \
                    .reshape(F * NB, n2)
                kw["threv"] = jnp.broadcast_to(
                    jnp.asarray(self.threv_15)[None], (F, NB, n2)) \
                    .reshape(F * NB, n2)
                kw["inlimit"] = jnp.broadcast_to(
                    jnp.asarray(self.inlimit_15)[None], (F, NB, n2)) \
                    .reshape(F * NB, n2)
            if self.W:
                kw["wid"] = jnp.repeat(wid, NB * ch)
            pk, nb = dev.finish_from_posts(mdr, p15, u15, F * NB, wb,
                                           **kw)
            return pk.reshape(F, NB, -1), nb.reshape(F, NB)

        return step

    def get_finish_step15(self, F, wb=None):
        key = ("finish15", F, wb or self.dev.plan.wb)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                self.make_finish_step15(F, wb))
        return self._step_cache[key]

    def get_probe_step(self, F):
        key = ("probe", F)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(self.make_probe_step(F))
        return self._step_cache[key]

    def get_finish_step(self, F, wb=None):
        key = ("finish", F, wb or self.dev.plan.wb)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                self.make_finish_step(F, wb))
        return self._step_cache[key]

    def gather_step(self):
        """Jittable (packets (F, 15, wb), choices (F,)) ->
        (F, wb): fetch only the chosen blob's bytes."""
        if self._gather is None:
            @jax.jit
            def g(pk, choices):
                return jnp.take_along_axis(
                    pk, choices[:, None, None].astype(jnp.int32),
                    axis=1)[:, 0]
            self._gather = g
        return self._gather


class ReservoirChooser:
    """vorbis_bitrate_addblock's floater/reservoir state machine
    (lib/bitrate.c:73-227), operating on per-blob byte sizes.  Exact
    port of the golden path's _bitrate_choose (codec/encoder.py),
    shared by the managed fast path."""

    def __init__(self, setup, rate, blocksizes):
        hi = setup.hi
        self.hi = hi
        self.rate = rate
        self.bs = blocksizes
        # vorbis_bitrate_init (bitrate.c:58-70): bitsper counts are per
        # SHORT half-block; choose() scales long blocks by
        # short_per_long
        half = (blocksizes[0] >> 1) / rate
        self.short_per_long = blocksizes[1] // blocksizes[0]
        self.avg_bitsper = int(np.rint(1.0 * hi.bitrate_av * half))
        self.min_bitsper = int(np.rint(1.0 * hi.bitrate_min * half))
        self.max_bitsper = int(np.rint(1.0 * hi.bitrate_max * half))
        self.avgfloat = float(PACKETBLOBS // 2)
        desired = hi.bitrate_reservoir * hi.bitrate_reservoir_bias
        self.minmax_reservoir = desired
        self.avg_reservoir = desired

    def choose(self, sizes, W):
        """sizes: (15,) byte sizes.  Returns (choice, out_bytes_fn)
        where out_bytes_fn(data) applies truncate/pad."""
        hi = self.hi
        choice = int(np.rint(self.avgfloat))
        this_bits = int(sizes[choice]) * 8
        min_tb = self.min_bitsper * (self.short_per_long if W else 1)
        max_tb = self.max_bitsper * (self.short_per_long if W else 1)
        samples = self.bs[W] >> 1
        desired = hi.bitrate_reservoir * hi.bitrate_reservoir_bias
        if self.avg_bitsper > 0:
            avg_tb = self.avg_bitsper * (self.short_per_long
                                         if W else 1)
            slewlimit = 15.0 / hi.bitrate_av_damp
            if self.avg_reservoir + (this_bits - avg_tb) > desired:
                while (choice > 0 and this_bits > avg_tb
                       and self.avg_reservoir + (this_bits - avg_tb)
                       > desired):
                    choice -= 1
                    this_bits = int(sizes[choice]) * 8
            elif self.avg_reservoir + (this_bits - avg_tb) < desired:
                while (choice + 1 < PACKETBLOBS and this_bits < avg_tb
                       and self.avg_reservoir + (this_bits - avg_tb)
                       < desired):
                    choice += 1
                    this_bits = int(sizes[choice]) * 8
            slew = np.rint(choice - self.avgfloat) / samples * self.rate
            slew = min(max(slew, -slewlimit), slewlimit)
            self.avgfloat += slew / self.rate * samples
            choice = int(np.rint(self.avgfloat))
            this_bits = int(sizes[choice]) * 8
        if self.min_bitsper > 0 and this_bits < min_tb:
            while self.minmax_reservoir - (min_tb - this_bits) < 0:
                choice += 1
                if choice >= PACKETBLOBS:
                    break
                this_bits = int(sizes[choice]) * 8
        if self.max_bitsper > 0 and this_bits > max_tb:
            while self.minmax_reservoir + (this_bits - max_tb) \
                    > hi.bitrate_reservoir:
                choice -= 1
                if choice < 0:
                    break
                this_bits = int(sizes[choice]) * 8
        truncate = pad = 0
        if choice < 0:
            maxsize = (max_tb + (hi.bitrate_reservoir
                                 - self.minmax_reservoir)) // 8
            choice = 0
            if int(sizes[0]) > maxsize:
                truncate = int(sizes[0]) - int(maxsize)
            this_bits = (int(sizes[0]) - truncate) * 8
        else:
            minsize = (min_tb - self.minmax_reservoir + 7) // 8
            if choice >= PACKETBLOBS:
                choice = PACKETBLOBS - 1
            pad = max(0, int(minsize) - int(sizes[choice]))
            this_bits = (int(sizes[choice]) + pad) * 8
        # reservoir updates (bitrate.c:192-225)
        if self.min_bitsper > 0 or self.max_bitsper > 0:
            if max_tb > 0 and this_bits > max_tb:
                self.minmax_reservoir += this_bits - max_tb
            elif min_tb > 0 and this_bits < min_tb:
                self.minmax_reservoir += this_bits - min_tb
            else:
                if self.minmax_reservoir > desired:
                    if max_tb > 0:
                        self.minmax_reservoir += this_bits - max_tb
                        if self.minmax_reservoir < desired:
                            self.minmax_reservoir = desired
                    else:
                        self.minmax_reservoir = desired
                else:
                    if min_tb > 0:
                        self.minmax_reservoir += this_bits - min_tb
                        if self.minmax_reservoir > desired:
                            self.minmax_reservoir = desired
                    else:
                        self.minmax_reservoir = desired
        if self.avg_bitsper > 0:
            avg_tb = self.avg_bitsper * (self.short_per_long
                                         if W else 1)
            self.avg_reservoir += this_bits - avg_tb
        return choice, truncate, pad
