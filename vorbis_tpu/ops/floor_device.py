"""Batched floor1 fitting and rendering on device (reference:
lib/floor1.c floor1_fit / accumulate_fit / fit_line / inspect_error /
render_line; exact scalar path: codec/floor1_codec.py).

The scalar algorithm runs a greedy 63-iteration post-splitting loop
per frame.  Here every step is vectorized across the frame batch:

  - dB quantization + above/below classification: elementwise
  - per-segment two-class regression moments: static segment matmul
  - range fits: weighted-moment prefix sums, closed form per range
  - the greedy loop: a Python-unrolled loop over the STATIC sort
    positions (the visit order is fixed by the floor config); all
    per-frame state (fit values, dynamic neighbors, memo) lives in
    (B, posts) arrays

The greedy control flow is reproduced exactly; the only numeric
difference from the scalar path is f32 fit_line arithmetic (the C
code uses doubles), which can move a post by +-1 quantum in rare
near-tie fits — tested at >99% exact post agreement."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..codec.floor1_codec import Floor1Look

f32 = np.float32
NEG = -200


def _render_point(x0, x1, y0, y1, x):
    """floor1.c render_point: integer DDA closed form (vector ints).

    The floor division runs as f32 divide + trunc, which is EXACT
    here and much faster than the VPU's integer-divide lowering:
    err = |dy|*(x-x0) <= 1023*1024 < 2^21 and adx <= 1024 are exact in
    f32; the quotient (err+0.5)/adx sits >= 0.5/adx ~ 4.9e-4 away from
    every integer while the f32 division error is < 1.3e-4, so the
    truncation can never cross an integer boundary.  (Callers mask out
    x < x0, where err would be negative.)"""
    y0 = y0 & 0x7FFF
    y1 = y1 & 0x7FFF
    dy = y1 - y0
    adx = x1 - x0
    err = jnp.abs(dy) * (x - x0)
    off = ((err.astype(jnp.float32) + f32(0.5))
           / jnp.maximum(adx, 1).astype(jnp.float32)).astype(jnp.int32)
    return jnp.where(dy < 0, y0 - off, y0 + off)


def exact_lookup_256(y, table):
    """table[y] for int y in [0, 256) WITHOUT a computed-index gather
    (XLA's TPU lowering serializes those at ~10 ns/element): two 16-way
    one-hot selects — a (.., 16) x (16, 16) matmul picks the table row,
    an elementwise masked sum picks the column.  Bit-exact: every term
    but the selected one is 0.0, and float adds of 0.0 are exact."""
    T = jnp.asarray(table, jnp.float32).reshape(16, 16)
    hi = y >> 4
    lo = y & 15
    r16 = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (hi[..., None] == r16).astype(jnp.float32)
    oh_lo = (lo[..., None] == r16).astype(jnp.float32)
    rows = jax.lax.dot(oh_hi.reshape(-1, 16), T,
                       precision=jax.lax.Precision.HIGHEST) \
        .reshape(y.shape + (16,))
    return (rows * oh_lo).sum(-1)


class DeviceFloorFit:
    def __init__(self, look: Floor1Look):
        info = look.info
        self.look = look
        self.posts = look.posts
        self.n = look.n
        n = self.n
        P = self.posts
        sx = np.asarray(look.sorted_x, np.int64)
        self.sorted_x = sx
        self.postlist = np.asarray(info.postlist, np.int64)
        self.forward_index = np.asarray(look.forward_index, np.int64)
        self.reverse_index = np.argsort(self.forward_index,
                                        kind="stable")
        self.lo_static = np.asarray(look.loneighbor, np.int64)
        self.hi_static = np.asarray(look.hineighbor, np.int64)
        self.tw = f32(info.twofitweight)
        self.twofitatten = f32(info.twofitatten)
        self.maxover = f32(info.maxover)
        self.maxunder = f32(info.maxunder)
        self.maxerr = f32(info.maxerr)
        # accumulate_fit windows are INCLUSIVE of both endpoints
        # (floor1.c: for(i=x0; i<=x1 && i<n; i++)): boundary bins count
        # in both adjacent segments, so per-segment sums come from
        # bin-level prefixes at static [sx[s], min(sx[s+1], n-1)+1)
        self.n_segs = P - 1
        self.seg_lo = np.minimum(sx[:-1], n - 1)
        self.seg_hi = np.minimum(sx[1:], n - 1) + 1
        self.xg = jnp.asarray(np.arange(n))

    def _seg_mat_np(self):
        """Static (n, S) segment indicator; boundary bins belong to
        both adjacent segments (the inclusive accumulate_fit windows),
        which the overlapping ranges encode directly."""
        if not hasattr(self, "_seg_mat_cache"):
            t = np.arange(self.n)[:, None]
            self._seg_mat_cache = (
                (t >= self.seg_lo[None, :])
                & (t < self.seg_hi[None, :])).astype(np.float32)
        return self._seg_mat_cache

    # -- stage 1: quantization + per-segment moments -------------------
    def _moments(self, quant, above):
        """quant (B, n) int, above (B, n) bool ->
        weighted prefix moments (B, S+1, 6) float32 and per-segment
        an counts (B, S)."""
        q = quant.astype(jnp.float32)
        x = jnp.broadcast_to(self.xg.astype(jnp.float32), q.shape)
        used = quant != 0
        am = used & above
        bm = used & ~above
        ones = jnp.ones_like(q)
        feats = jnp.stack([x, q, x * x, q * q, x * q, ones], -1)

        seg_mat = jnp.asarray(self._seg_mat_np())

        def seg_moments(mask):
            # bin->segment reduction as ONE f32 matmul on the MXU
            # (was: full (B, n, 6) cumsum + boundary gathers)
            vals = jnp.where(mask[..., None], feats, 0.0)
            out = jax.lax.dot_general(
                vals, seg_mat, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)   # (B, 6, S)
            return out.transpose(0, 2, 1)              # (B, S, 6)

        A = seg_moments(am)
        Bv = seg_moments(bm)
        an = A[..., 5]
        bn = Bv[..., 5]
        # fit_line weight: (bn+an)*tw/(an+1)+1 per segment (f32)
        w = ((bn + an) * self.tw / (an + 1.0) + 1.0)[..., None]
        wm = Bv + A * w
        prefix = jnp.cumsum(wm, axis=-2)
        zero = jnp.zeros_like(prefix[..., :1, :])
        self_prefix = jnp.concatenate([zero, prefix], axis=-2)
        return self_prefix, an

    def _fit_line(self, prefix, s0, s1, x0, x1):
        """Weighted LS fit over segments [s0, s1) -> (y0, y1, bad).
        s0/s1/x0/x1: (B,) ints (dynamic)."""
        hi = jnp.take_along_axis(prefix, s1[..., None, None].astype(
            jnp.int32).repeat(6, -1), axis=-2)[..., 0, :]
        lo = jnp.take_along_axis(prefix, s0[..., None, None].astype(
            jnp.int32).repeat(6, -1), axis=-2)[..., 0, :]
        m = hi - lo
        xb, yb, x2b, y2b, xyb, bn = (m[..., 0], m[..., 1], m[..., 2],
                                     m[..., 3], m[..., 4], m[..., 5])
        denom = bn * x2b - xb * xb
        bad = denom <= 0.0
        d = jnp.where(bad, 1.0, denom)
        a = (yb * x2b - xyb * xb) / d
        b = (bn * xyb - xb * yb) / d
        y0 = jnp.clip(jnp.rint(a + b * x0), 0, 1023).astype(jnp.int32)
        y1 = jnp.clip(jnp.rint(a + b * x1), 0, 1023).astype(jnp.int32)
        y0 = jnp.where(bad, 0, y0)
        y1 = jnp.where(bad, 0, y1)
        return y0, y1, bad

    def _inspect(self, quant, above, lx, hx, ly, hy):
        """inspect_error over dynamic ranges [lx, hx): (B,) verdict."""
        x = self.xg
        inr = (x[None, :] >= lx[:, None]) & (x[None, :] < hx[:, None])
        y = _render_point(lx[:, None], hx[:, None], ly[:, None],
                          hy[:, None], x[None, :])
        val = quant
        diff = y - val
        # integer mse: |diff| <= 1023, n <= 1024 -> fits int32 exactly
        # (an f32 sum here loses the low bits of the C int accumulation)
        mse = jnp.sum(jnp.where(inr, diff * diff, 0), axis=-1)
        cnt = (hx - lx).astype(jnp.float32)
        first = x[None, :] == lx[:, None]
        chk = inr & above & (first | (val != 0))
        over = chk & ((y.astype(jnp.float32) + self.maxover
                       < val.astype(jnp.float32))
                      | (y.astype(jnp.float32) - self.maxunder
                         > val.astype(jnp.float32)))
        hard = jnp.any(over, axis=-1)
        cnti = jnp.maximum(hx - lx, 1)
        cnt = cnti.astype(jnp.float32)
        rough_ok = ((self.maxover * self.maxover / cnt > self.maxerr)
                    | (self.maxunder * self.maxunder / cnt
                       > self.maxerr))
        # C: mse/n > maxerr (int division, truncating)
        mse_bad = (mse // cnti).astype(jnp.float32) > self.maxerr
        return hard | (~rough_ok & mse_bad)

    # -- the full fit ----------------------------------------------------
    def __call__(self, logmdct, logmask):
        """(B, n) spectra -> (posts (B, P) int32 with the 0x8000
        interpolation flag, used (B,) bool)."""
        B = logmask.shape[0]
        P = self.posts
        quant = jnp.clip((logmask * f32(7.3142857) + f32(1023.5))
                         .astype(jnp.int32), 0, 1023)
        above = (logmdct + self.twofitatten) >= logmask
        prefix, an = self._moments(quant, above)
        used = jnp.sum(an, axis=-1) > 0

        fitA = jnp.full((B, P), NEG, jnp.int32)
        fitB = jnp.full((B, P), NEG, jnp.int32)
        lon = jnp.zeros((B, P), jnp.int32)
        hin = jnp.ones((B, P), jnp.int32)
        memo = jnp.full((B, P), -1, jnp.int32)

        zeros = jnp.zeros((B,), jnp.int32)
        full = jnp.full((B,), self.n_segs, jnp.int32)
        x0g = jnp.full((B,), int(self.postlist[0]), jnp.int32)
        x1g = jnp.full((B,), int(self.sorted_x[-1]), jnp.int32)
        y0, y1, _ = self._fit_line(prefix, zeros, full, x0g, x1g)
        fitA = fitA.at[:, 0].set(y0)
        fitB = fitB.at[:, 0].set(y0)
        fitA = fitA.at[:, 1].set(y1)
        fitB = fitB.at[:, 1].set(y1)

        def post_Y(A, Bv, idx):
            a = jnp.take_along_axis(A, idx[:, None], 1)[:, 0]
            b = jnp.take_along_axis(Bv, idx[:, None], 1)[:, 0]
            return jnp.where(a < 0, b, jnp.where(b < 0, a,
                                                 (a + b) >> 1))

        postlist = jnp.asarray(self.postlist.astype(np.int32))
        rev = jnp.asarray(self.reverse_index.astype(np.int32))
        sx32 = jnp.asarray(self.sorted_x.astype(np.int32))
        ar = jnp.arange(P)
        bidx = jnp.arange(B)

        # one traced loop body with per-iteration statics looked up
        # from stacked tables — keeps the HLO small (the Python-
        # unrolled version took minutes to compile)
        def body(i, state):
            fitA, fitB, lon, hin, memo = state
            sortpos = jnp.take(rev, i)
            ln = lon[bidx, sortpos]
            hn = hin[bidx, sortpos]
            already = jnp.take_along_axis(memo, ln[:, None],
                                          1)[:, 0] == hn
            lsort = jnp.take(rev, ln)
            hsort = jnp.take(rev, hn)
            memo = memo.at[bidx, ln].set(hn)
            lx = jnp.take(postlist, ln)
            hx = jnp.take(postlist, hn)
            ly = post_Y(fitA, fitB, ln)
            hy = post_Y(fitA, fitB, hn)
            bad = self._inspect(quant, above, lx, hx, ly, hy)
            act = bad & ~already
            sp = jnp.full((B,), 0, jnp.int32) + sortpos
            sp_x = jnp.full((B,), 0, jnp.int32) + jnp.take(sx32,
                                                           sortpos)
            ly0, ly1, ret0 = self._fit_line(prefix, lsort, sp, lx,
                                            sp_x)
            hy0, hy1, ret1 = self._fit_line(prefix, sp, hsort, sp_x,
                                            hx)
            # degenerate handling (floor1.c:668-684)
            ly0 = jnp.where(ret0, ly, ly0)
            ly1 = jnp.where(ret0, hy0, ly1)
            hy0 = jnp.where(ret1, ly1, hy0)
            hy1 = jnp.where(ret1, hy, hy1)
            both = ret0 & ret1
            upd = act & ~both
            cur = fitB[bidx, ln]
            fitB = fitB.at[bidx, ln].set(jnp.where(upd, ly0, cur))
            is0 = upd & (ln == 0)
            fitA = fitA.at[:, 0].set(jnp.where(is0, ly0, fitA[:, 0]))
            fitA = fitA.at[bidx, i].set(jnp.where(upd, ly1,
                                                  fitA[bidx, i]))
            fitB = fitB.at[bidx, i].set(jnp.where(upd, hy0,
                                                  fitB[bidx, i]))
            cur = fitA[bidx, hn]
            fitA = fitA.at[bidx, hn].set(jnp.where(upd, hy1, cur))
            cur = fitB[bidx, hn]
            fitB = fitB.at[bidx, hn].set(
                jnp.where(upd & (hn == 1), hy1, cur))
            neg = act & both
            fitA = fitA.at[bidx, i].set(jnp.where(neg, NEG,
                                                  fitA[bidx, i]))
            fitB = fitB.at[bidx, i].set(jnp.where(neg, NEG,
                                                  fitB[bidx, i]))
            # neighbor propagation: contiguous runs adjacent to sortpos
            prop = upd & ((ly1 >= 0) | (hy0 >= 0))
            below = ar[None, :] < sortpos
            match = hin == hn[:, None]
            gaps = jnp.where(below & match, 0, 1)
            runb = jnp.cumsum(gaps[:, ::-1], 1)[:, ::-1]
            runb = runb == jnp.take_along_axis(
                runb, jnp.broadcast_to(sortpos, (B,))[:, None], 1)
            hin = jnp.where(prop[:, None] & below & match & runb,
                            i, hin)
            abv = ar[None, :] > sortpos
            matchl = lon == ln[:, None]
            runa = jnp.cumsum(jnp.where(abv & matchl, 0, 1), 1)
            runa = runa == jnp.take_along_axis(
                runa, jnp.broadcast_to(sortpos, (B,))[:, None], 1)
            lon = jnp.where(prop[:, None] & abv & matchl & runa,
                            i, lon)
            return fitA, fitB, lon, hin, memo

        # unroll: each traced iteration carries ~60 small ops whose
        # fixed launch/loop overhead dominates at (B, P) sizes.
        # P==2 (endpoint-only floors, e.g. an LFE config) has no
        # interior posts at all — tracing the body would index the
        # empty neighbor tables
        if P > 2:
            fitA, fitB, lon, hin, memo = jax.lax.fori_loop(
                2, P, body, (fitA, fitB, lon, hin, memo), unroll=4)

        # final output walk (floor1.c:735-750) with STATIC decode-side
        # neighbors; sequential in i but only over (B,) lanes
        out = jnp.zeros((B, P), jnp.int32)
        out = out.at[:, 0].set(post_Y(fitA, fitB, jnp.zeros(
            (B,), jnp.int32)))
        out = out.at[:, 1].set(post_Y(fitA, fitB, jnp.ones(
            (B,), jnp.int32)))
        lo_t = jnp.asarray(self.lo_static.astype(np.int32))
        hi_t = jnp.asarray(self.hi_static.astype(np.int32))
        pl_t = jnp.asarray(self.postlist.astype(np.int32))

        def walk(i, out):
            ln0 = jnp.take(lo_t, i - 2)
            hn0 = jnp.take(hi_t, i - 2)
            pred = _render_point(
                jnp.broadcast_to(jnp.take(pl_t, ln0), (B,)),
                jnp.broadcast_to(jnp.take(pl_t, hn0), (B,)),
                out[bidx, ln0], out[bidx, hn0],
                jnp.broadcast_to(jnp.take(pl_t, i), (B,)))
            vx = post_Y(fitA, fitB, jnp.broadcast_to(i, (B,))
                        .astype(jnp.int32))
            keep = (vx >= 0) & (pred != vx)
            return out.at[:, i].set(jnp.where(keep, vx, pred | 0x8000))

        if P > 2:
            out = jax.lax.fori_loop(2, P, walk, out, unroll=4)
        return out, used


    # -- rendering (reference: floor1_encode post quantization +
    # render_line / FLOOR1_fromdB_LOOKUP) -------------------------------
    def quantize_posts(self, posts):
        """fit posts (B, P) -> stream-quantized posts with flags
        (floor1_encode's mult division + prediction re-flagging)."""
        info = self.look.info
        val = posts & 0x7FFF
        if info.mult == 1:
            val = val >> 2
        elif info.mult == 2:
            val = val >> 3
        elif info.mult == 3:
            val = val // 12
        else:
            val = val >> 4
        post = val | (posts & 0x8000)
        B = posts.shape[0]
        bidx = jnp.arange(B)
        out = jnp.zeros_like(post)
        out = out.at[:, 0].set(post[:, 0])
        out = out.at[:, 1].set(post[:, 1])
        lo_t = jnp.asarray(self.lo_static.astype(np.int32))
        hi_t = jnp.asarray(self.hi_static.astype(np.int32))
        pl_t = jnp.asarray(self.postlist.astype(np.int32))

        def body(i, out):
            ln0 = jnp.take(lo_t, i - 2)
            hn0 = jnp.take(hi_t, i - 2)
            pred = _render_point(
                jnp.broadcast_to(jnp.take(pl_t, ln0), (B,)),
                jnp.broadcast_to(jnp.take(pl_t, hn0), (B,)),
                out[bidx, ln0], out[bidx, hn0],
                jnp.broadcast_to(jnp.take(pl_t, i), (B,)))
            flag = ((post[:, i] & 0x8000) != 0) | (pred == post[:, i])
            out = out.at[:, i].set(
                jnp.where(flag, pred | 0x8000, post[:, i]))
            # an explicitly-coded post anchors its neighbors: clear
            # their interpolation flags exactly like the wrap coder and
            # the decoder do (floor1.c floor1_encode post[ln]&=0x7fff /
            # floor1_inverse1) — flags gate which posts the final
            # render uses as segment anchors
            unflag = ~flag
            out = out.at[:, ln0].set(
                jnp.where(unflag, out[:, ln0] & 0x7FFF, out[:, ln0]))
            out = out.at[:, hn0].set(
                jnp.where(unflag, out[:, hn0] & 0x7FFF, out[:, hn0]))
            return out

        return jax.lax.fori_loop(2, self.posts, body, out, unroll=4)

    def render(self, qposts, fromdB_table):
        """Quantized posts (B, P) -> gain curve (B, n) float32, the
        same curve the decoder renders (render_line + fromdB).

        Formulation: per SORTED post position, forward/backward scans
        over the tiny (B, P) axis find the previous/next used post;
        per-bin brackets then come from ONE static gather through the
        precomputed bin->sorted-interval table (each bin's enclosing
        static interval never changes), instead of the former P scatter
        passes over (B, n)."""
        look = self.look
        mult = look.info.mult
        n = self.n
        B = qposts.shape[0]
        P = self.posts
        fwd = self.forward_index
        # per sorted position: static x, dynamic (y, used)
        ys = jnp.clip((qposts[:, fwd] & 0x7FFF) * mult, 0, 255)
        used = (qposts[:, fwd] & 0x8000) == 0
        used = used.at[:, 0].set(True)   # post 0 always anchors
        xs = np.asarray(self.sorted_x)
        if not hasattr(self, "_iv_table"):
            # bin t -> sorted interval j with xs[j] <= t < xs[j+1]
            iv = np.searchsorted(xs, np.arange(n), side="right") - 1
            self._iv_table = np.clip(iv, 0, P - 1)
        iv = self._iv_table
        jar = jnp.arange(P, dtype=jnp.int32)
        # previous used sorted index at-or-before j (inclusive)
        lastu = jax.lax.associative_scan(
            jnp.maximum, jnp.where(used, jar, -1), axis=-1)
        lastu = jnp.maximum(lastu, 0)
        # next used sorted index strictly after j (P when none)
        nxt = jnp.where(used, jar, P)
        nextu = jax.lax.associative_scan(
            jnp.minimum, nxt[:, ::-1], axis=-1)[:, ::-1]
        nextu_after = jnp.concatenate(
            [nextu[:, 1:], jnp.full((B, 1), P, jnp.int32)], axis=1)
        # ALL dynamic lookups stay in the tiny (B, P) space — XLA's
        # TPU lowering serializes computed-index gathers (~10ns per
        # element; even these (B, P) take_along_axis calls cost ~1 ms
        # each at B=4096), so select from a (B, P, P) one-hot
        # masked-sum instead: pure VPU work on ~14 MB
        xs_i = jnp.asarray(xs.astype(np.int32))
        rzp = jnp.minimum(nextu_after, P - 1)
        ohl = lastu[:, :, None] == jar[None, None, :]   # (B, P, P)
        ohr = rzp[:, :, None] == jar[None, None, :]
        lxp = jnp.sum(jnp.where(ohl, xs_i[None, None, :], 0), -1)
        lyp = jnp.sum(jnp.where(ohl, ys[:, None, :], 0), -1)
        hxp = jnp.sum(jnp.where(ohr, xs_i[None, None, :], 0), -1)
        hyp = jnp.sum(jnp.where(ohr, ys[:, None, :], 0), -1)
        hasr = nextu_after < P
        # static bin expansion
        lx = lxp[:, iv]
        ly = lyp[:, iv]
        hx = hxp[:, iv]
        hy = hyp[:, iv]
        hr = hasr[:, iv]
        t = jnp.broadcast_to(self.xg, (B, n))
        # past the last used post the curve holds ly; at the exact post
        # bin render_line writes ly
        seg = hr & (hx > lx) & (t >= lx)
        y = jnp.where(seg, _render_point(lx, hx, ly, hy, t), ly)
        y = jnp.clip(y, 0, 255)
        return exact_lookup_256(y, fromdB_table)


def _scatter_set(arr, idx, val):
    """arr (B, P); arr[b, idx[b]] = val[b]."""
    return arr.at[jnp.arange(arr.shape[0]), idx].set(val)


def _scatter_where(arr, idx, val, cond):
    cur = jnp.take_along_axis(arr, idx[:, None], 1)[:, 0]
    new = jnp.where(cond, val, cur)
    return arr.at[jnp.arange(arr.shape[0]), idx].set(new)
