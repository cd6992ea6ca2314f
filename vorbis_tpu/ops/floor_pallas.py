"""Pallas TPU kernel for the batched floor1 greedy fit.

The floor fit (reference: lib/floor1.c floor1_fit, greedy post
splitting over <=63 sorted positions) is the encoder's dominant device
stage: the XLA formulation in ops/floor_device.py runs the 63-step
loop as a fori_loop of ~60 small (B, P) ops plus one (B, n) inspect
per step, and per-op dispatch overhead dominates (measured 57 ms of
the 83 ms device step per 1024-frame batch on v5e).

This kernel runs the WHOLE greedy loop per frame block inside one
Pallas program: quant/above spectra and all (frames, posts) state stay
VMEM-resident across iterations, per-frame scalars ride the lane axis,
dynamic post indices become one-hot selects over the tiny padded post
axis, and the per-iteration static tables (sorted visit order, post x
positions, decode-side neighbors) sit in SMEM for scalar reads inside
a lax.fori_loop (a Python unroll of the 63 iterations compiled ~20x
slower under Mosaic for no runtime win).  The arithmetic is
operation-for-operation identical to DeviceFloorFit.__call__ (same f32
expressions, same int32 mse), so the emitted posts are bitwise
identical — asserted by tests/test_floor_device.py.

One structural improvement over the XLA path: the neighbor-run
propagation needs "contiguous run of matching posts adjacent to
sortpos", which the XLA path computed with two full cumsums; here it
is a last-gap/first-gap max/min reduction (provably equivalent: a
position j < sortpos joins the run iff no non-matching position sits
in [j, sortpos), i.e. iff j > max{k < sortpos : not match(k)}).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .floor_device import DeviceFloorFit

f32 = np.float32
NEG = -200


def _round_up(x, m):
    return (x + m - 1) // m * m


class DeviceFloorFitPallas(DeviceFloorFit):
    """Drop-in DeviceFloorFit whose greedy loop is one Pallas kernel.

    Moments (the bin->segment MXU matmul) and the render path stay in
    XLA; only the greedy fit + final output walk move into the
    kernel."""

    def __init__(self, look, block_frames: int = 256,
                 interpret: bool = False):
        super().__init__(look)
        self.block_frames = block_frames
        self.interpret = interpret
        self._build_kernel()

    # -- kernel construction ------------------------------------------------
    def _build_kernel(self):
        P = self.posts
        n = self.n
        P2 = _round_up(P, 128)
        BF = self.block_frames
        rev = np.asarray(self.reverse_index, np.int32)
        sx = np.asarray(self.sorted_x, np.int32)
        postlist = np.asarray(self.postlist, np.int32)
        lo_static = np.asarray(self.lo_static, np.int32)
        hi_static = np.asarray(self.hi_static, np.int32)
        maxover = float(self.maxover)
        maxunder = float(self.maxunder)
        maxerr = float(self.maxerr)
        n_segs = self.n_segs

        # SMEM scalar tables: [rev, postlist, sx, lo_static, hi_static]
        tabs = np.zeros((5, P2), np.int32)
        tabs[0, :P] = rev
        tabs[1, :P] = postlist
        tabs[2, :P] = sx
        tabs[3, :P - 2] = lo_static
        tabs[4, :P - 2] = hi_static
        self._tabs = tabs
        # lane-axis const rows (VMEM): rev, postlist broadcast tables
        self._vtabs = np.stack([tabs[0], tabs[1]]).astype(np.int32)

        def kernel(tabs_ref, vtabs_ref, quant_ref, above_ref,
                   prefix_ref, out_ref):
            lanes = jax.lax.broadcasted_iota(jnp.int32, (BF, P2), 1)
            quant = quant_ref[:]                      # (BF, n) int32
            above = above_ref[:] != 0                 # (BF, n) bool
            xg = jax.lax.broadcasted_iota(jnp.int32, (BF, n), 1)
            quant_f = quant.astype(jnp.float32)
            planes = [prefix_ref[:, k * P2:(k + 1) * P2]
                      for k in range(6)]              # (BF, P2) f32 x6
            rev_t = jnp.broadcast_to(vtabs_ref[0:1, :], (BF, P2))
            post_t = jnp.broadcast_to(vtabs_ref[1:2, :], (BF, P2))

            def gat_i(arr, idx):
                """arr (BF, P2) i32; idx (BF, 1) or scalar -> (BF, 1)."""
                return jnp.sum(jnp.where(lanes == idx, arr, 0), axis=1,
                               keepdims=True)

            def sca(arr, idx, val, cond):
                return jnp.where((lanes == idx) & cond, val, arr)

            def post_Y(fitA, fitB, idx):
                a = gat_i(fitA, idx)
                b = gat_i(fitB, idx)
                return jnp.where(a < 0, b,
                                 jnp.where(b < 0, a, (a + b) >> 1))

            def m_at(idx):
                """6 prefix rows at dynamic (BF,1) or scalar idx."""
                oh = lanes == idx
                return [jnp.sum(jnp.where(oh, pk, f32(0.0)), axis=1,
                                keepdims=True) for pk in planes]

            def fit_line(m0, m1, x0, x1):
                m = [b - a for a, b in zip(m0, m1)]
                xb, yb, x2b, y2b, xyb, bn = m
                denom = bn * x2b - xb * xb
                bad = denom <= 0.0
                d = jnp.where(bad, f32(1.0), denom)
                a = (yb * x2b - xyb * xb) / d
                b = (bn * xyb - xb * yb) / d
                y0 = jnp.clip(jnp.rint(a + b * x0), 0, 1023) \
                    .astype(jnp.int32)
                y1 = jnp.clip(jnp.rint(a + b * x1), 0, 1023) \
                    .astype(jnp.int32)
                y0 = jnp.where(bad, 0, y0)
                y1 = jnp.where(bad, 0, y1)
                return y0, y1, bad

            def render_cols(lx, hx, ly, hy, x):
                """Closed-form DDA (== _render_point), with the wide
                per-bin division strength-reduced to one per-frame
                reciprocal + multiply: |err| <= 1023*1024, quotient
                sits >= 0.5/adx ~ 4.9e-4 from every integer, and the
                two-rounding error of err*(1/adx) is < 1.9e-4 — the
                truncation is identical to the exact division."""
                y0 = ly & 0x7FFF
                y1 = hy & 0x7FFF
                dy = y1 - y0
                adx = hx - lx
                rec = f32(1.0) / jnp.maximum(adx, 1).astype(jnp.float32)
                err = jnp.abs(dy).astype(jnp.float32) \
                    * (x - lx).astype(jnp.float32)
                off = ((err + f32(0.5)) * rec).astype(jnp.int32)
                return jnp.where(dy < 0, y0 - off, y0 + off)

            def inspect(lx, hx, ly, hy):
                inr = (xg >= lx) & (xg < hx)
                y = render_cols(lx, hx, ly, hy, xg)
                diff = y - quant
                mse = jnp.sum(jnp.where(inr, diff * diff, 0), axis=1,
                              keepdims=True)
                yf = y.astype(jnp.float32)
                first = xg == lx
                chk = inr & above & (first | (quant != 0))
                over = chk & ((yf + f32(maxover) < quant_f)
                              | (yf - f32(maxunder) > quant_f))
                hard = jnp.any(over, axis=1, keepdims=True)
                cnti = jnp.maximum(hx - lx, 1)
                cnt = cnti.astype(jnp.float32)
                rough_ok = ((f32(maxover * maxover) / cnt
                             > f32(maxerr))
                            | (f32(maxunder * maxunder) / cnt
                               > f32(maxerr)))
                mse_bad = (mse // cnti).astype(jnp.float32) \
                    > f32(maxerr)
                return hard | (~rough_ok & mse_bad)

            # loop-carry inits derive from a 2-D iota sum so Mosaic
            # assigns them a fully NON-replicated layout: a splat (or
            # single-axis iota) init gets a replicated layout, the loop
            # body's outputs don't, and the carry relayout
            # replicated->non-replicated is rejected by Mosaic
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (BF, P2), 0)
            zero_l = jnp.minimum(rows_i + lanes, 0)   # all-zero
            NEGc = zero_l + NEG
            y0, y1, _ = fit_line(m_at(0), m_at(n_segs),
                                 f32(int(postlist[0])),
                                 f32(int(sx[-1])))
            fitA = sca(sca(NEGc, 0, y0, True), 1, y1, True)
            fitB = fitA
            lon = zero_l
            hin = zero_l + 1
            memo = zero_l - 1

            def body(i, st):
                fitA, fitB, lon, hin, memo = st
                sortpos = tabs_ref[0, i]
                sp_x = tabs_ref[2, sortpos].astype(jnp.float32)
                ln = gat_i(lon, sortpos)
                hn = gat_i(hin, sortpos)
                already = gat_i(memo, ln) == hn
                lsort = gat_i(rev_t, ln)
                hsort = gat_i(rev_t, hn)
                memo = sca(memo, ln, hn, True)
                lx = gat_i(post_t, ln)
                hx = gat_i(post_t, hn)
                ly = post_Y(fitA, fitB, ln)
                hy = post_Y(fitA, fitB, hn)
                bad = inspect(lx, hx, ly, hy)
                act = bad & ~already
                ly0, ly1, ret0 = fit_line(
                    m_at(lsort), m_at(sortpos),
                    lx.astype(jnp.float32), sp_x)
                hy0, hy1, ret1 = fit_line(
                    m_at(sortpos), m_at(hsort),
                    sp_x, hx.astype(jnp.float32))
                ly0 = jnp.where(ret0, ly, ly0)
                ly1 = jnp.where(ret0, hy0, ly1)
                hy0 = jnp.where(ret1, ly1, hy0)
                hy1 = jnp.where(ret1, hy, hy1)
                both = ret0 & ret1
                upd = act & ~both
                fitB = sca(fitB, ln, ly0, upd)
                fitA = sca(fitA, 0, ly0, upd & (ln == 0))
                fitA = sca(fitA, i, ly1, upd)
                fitB = sca(fitB, i, hy0, upd)
                fitA = sca(fitA, hn, hy1, upd)
                fitB = sca(fitB, hn, hy1, upd & (hn == 1))
                neg = act & both
                fitA = sca(fitA, i, NEG, neg)
                fitB = sca(fitB, i, NEG, neg)
                # run propagation as last/first-gap reductions
                prop = upd & ((ly1 >= 0) | (hy0 >= 0))
                below = lanes < sortpos
                match = hin == hn
                lastgap = jnp.max(
                    jnp.where(below & ~match, lanes, -1), axis=1,
                    keepdims=True)
                hin = jnp.where(prop & below & match
                                & (lanes > lastgap), i, hin)
                abv = (lanes > sortpos) & (lanes < P)
                matchl = lon == ln
                firstgap = jnp.min(
                    jnp.where(abv & ~matchl, lanes, P2), axis=1,
                    keepdims=True)
                lon = jnp.where(prop & abv & matchl
                                & (lanes < firstgap), i, lon)
                return fitA, fitB, lon, hin, memo

            fitA, fitB, lon, hin, memo = jax.lax.fori_loop(
                2, P, body, (fitA, fitB, lon, hin, memo))

            # final output walk (static decode-side neighbors, but
            # looped with SMEM lookups to keep the program small)
            out = zero_l
            out = sca(out, 0, post_Y(fitA, fitB, 0), True)
            out = sca(out, 1, post_Y(fitA, fitB, 1), True)

            def walk(i, out):
                ln0 = tabs_ref[3, i - 2]
                hn0 = tabs_ref[4, i - 2]
                x0 = gat_i(post_t, ln0)
                x1 = gat_i(post_t, hn0)
                xi = gat_i(post_t, i)
                y0c = gat_i(out, ln0)
                y1c = gat_i(out, hn0)
                pred = render_cols(x0, x1, y0c, y1c,
                                   xi.astype(jnp.int32))
                vx = post_Y(fitA, fitB, i)
                keep = (vx >= 0) & (pred != vx)
                col = jnp.where(keep, vx, pred | 0x8000)
                return sca(out, i, col, True)

            out = jax.lax.fori_loop(2, P, walk, out)
            out_ref[:] = out

        self._P2 = P2
        self._kernel_fn = kernel

    @functools.lru_cache(maxsize=None)
    def _call_for(self, B):
        BF = self.block_frames
        assert B % BF == 0, (B, BF)
        P2 = self._P2
        n = self.n
        kernel = self._kernel_fn

        return pl.pallas_call(
            kernel,
            grid=(B // BF,),
            in_specs=[
                pl.BlockSpec((5, P2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((2, P2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BF, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BF, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BF, 6 * P2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BF, P2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, P2), jnp.int32),
            interpret=self.interpret,
        )

    # -- the full fit ---------------------------------------------------
    def __call__(self, logmdct, logmask):
        B = logmask.shape[0]
        P = self.posts
        P2 = self._P2
        quant = jnp.clip((logmask * f32(7.3142857) + f32(1023.5))
                         .astype(jnp.int32), 0, 1023)
        above = (logmdct + self.twofitatten) >= logmask
        prefix, an = self._moments(quant, above)
        used = jnp.sum(an, axis=-1) > 0
        # prefix (B, S+1, 6) -> 6 lane-padded planes (B, 6*P2)
        S1 = prefix.shape[1]
        pp = jnp.transpose(prefix, (0, 2, 1))        # (B, 6, S+1)
        pp = jnp.pad(pp, ((0, 0), (0, 0), (0, P2 - S1)))
        pp = pp.reshape(B, 6 * P2)
        BF = self.block_frames
        pad = (-B) % BF
        if pad:
            quant = jnp.pad(quant, ((0, pad), (0, 0)))
            above = jnp.pad(above, ((0, pad), (0, 0)))
            pp = jnp.pad(pp, ((0, pad), (0, 0)))
        out = self._call_for(B + pad)(
            jnp.asarray(self._tabs), jnp.asarray(self._vtabs),
            quant, above.astype(jnp.int32), pp)
        return out[:B, :P], used


def make_floor_fit(look, **kw):
    """DeviceFloorFitPallas on TPU backends, DeviceFloorFit elsewhere
    (tests and the multichip dryrun run on the CPU platform, where the
    XLA formulation is the fast one).  Both produce bitwise-identical
    posts."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    if platform == "tpu":
        try:
            return DeviceFloorFitPallas(look, **kw)
        except Exception:
            pass
    return DeviceFloorFit(look)
