"""High-throughput batched decoder: native packet parse + vectorized
synthesis.

This is the decode mirror of models/fastenc.py.  The serial half
(Huffman bit I/O for floors and residues of every packet) runs in ONE
native C call (native/vorbisnative.c vn_parse_packets); everything
numeric — floor curve render, inverse coupling, floor multiply, IMDCT,
and the lapped overlap-add — runs vectorized across all packets of the
stream at once.  Output is bit-exact with the scalar Decoder (and the
reference libvorbis): every float op preserves the reference's
per-sample operation order (reference decode chain: lib/mapping0.c
mapping0_inverse -> lib/floor1.c floor1_inverse2 -> lib/mdct.c
mdct_backward -> lib/block.c vorbis_synthesis_blockin).

Design note (lapping): vorbis_synthesis_blockin's 4-case overlap-add is
equivalent to multiplying each raw IMDCT block by its hybrid window
(zeros / rise / flat-1 / fall / zeros, ops/window.py) and scatter-adding
the blocks at their center-aligned offsets (consecutive centers advance
by n_lW/4 + n_W/4).  Flat regions multiply by exactly 1.0f and overlap
regions see the identical (prev*w_rev + cur*w) multiply-add, so the
composition is bitwise identical.

The same dense arrays can feed a jax.numpy variant of this synthesis
for PCIe-attached TPU deployments; on this environment the device->host
PCM transfer alone would cap throughput (tunnel ~3-25 MB/s), so the
production drain is host-vectorized.
"""

from __future__ import annotations

import numpy as np

from ..codec import headers as H
from ..codec.floor1_codec import fromdB_lookup
from ..codec.nativeparse import (StreamParseTables, decode_stream,
                                 parse_packets, scan_W)
from ..ops.mdct import imdct
from ..ops.window import hybrid_window

_WIN_CACHE = {}


def _win_table(bs0, bs1):
    """Concatenated hybrid windows for all 8 (lW, W, nW) ids plus the
    per-id offsets (the vn_decode_stream window table)."""
    key = (bs0, bs1)
    if key not in _WIN_CACHE:
        wins, offs = [], []
        acc = 0
        for wid in range(8):
            l, w, nx = (wid >> 2) & 1, (wid >> 1) & 1, wid & 1
            arr = hybrid_window(bs0, bs1, l, w, nx)
            offs.append(acc)
            wins.append(arr)
            acc += len(arr)
        _WIN_CACHE[key] = (
            np.ascontiguousarray(np.concatenate(wins), np.float32),
            np.asarray(offs, np.int64))
    return _WIN_CACHE[key]


class FastDecodeUnsupported(Exception):
    """Stream shape the native path doesn't cover (floor type 0 or a
    missing native lib; multi-submap mappings like 5.1 ARE supported)
    — caller falls back to the scalar Decoder."""


def _render_curves(look, posts, n2, fromdB):
    """Batched decoder-side floor render: unwrapped posts (B, P) int32
    -> gain curves (B, n2) float32, bit-exact vs floor1_curve.

    Same formulation as DeviceFloorFit.render (scan for previous/next
    used post in sorted (B, P) space, expand per-bin via the static
    bin->interval table, closed-form integer DDA)."""
    info = look.info
    mult = info.mult
    P = look.posts
    B = posts.shape[0]
    fwd = look.forward_index
    xs = np.asarray(look.sorted_x, np.int64)

    ys = np.clip((posts[:, fwd] & 0x7FFF).astype(np.int32) * mult,
                 0, 255).astype(np.int32)
    used = (posts[:, fwd] & 0x8000) == 0
    used[:, 0] = True
    jar = np.arange(P, dtype=np.int32)
    lastu = np.maximum.accumulate(np.where(used, jar, -1), axis=1)
    lastu = np.maximum(lastu, 0)
    nxt = np.where(used, jar, P).astype(np.int32)
    nextu = np.minimum.accumulate(nxt[:, ::-1], axis=1)[:, ::-1]
    nextu_after = np.concatenate(
        [nextu[:, 1:], np.full((B, 1), P, np.int32)], axis=1)

    # per-interval params in tiny (B, P) space, float32 where the bin
    # expansion consumes them (the DDA runs in exact f32: operands
    # < 2^21 and the quotient sits >= 0.5/adx from every integer while
    # the division error is < 1.3e-4, so trunc == the C integer floor)
    take = np.take_along_axis
    sxj = np.broadcast_to(xs.astype(np.int32), (B, P))
    lxp = take(sxj, lastu, 1).astype(np.float32)
    lyp = take(ys, lastu, 1)
    rzp = np.minimum(nextu_after, P - 1)
    hxp = take(sxj, rzp, 1)
    hyp = take(ys, rzp, 1)
    dyp = hyp - lyp
    adyp = np.abs(dyp).astype(np.float32)
    adxp = np.maximum(hxp - take(sxj, lastu, 1), 1).astype(np.float32)
    sgnp = np.where(dyp < 0, np.int32(-1), np.int32(1))
    segp = ((nextu_after < P) & (hxp > take(sxj, lastu, 1))) \
        .astype(np.int32)

    iv = np.clip(np.searchsorted(xs, np.arange(n2), side="right") - 1,
                 0, P - 1).astype(np.intp)
    LX = np.take(lxp, iv, axis=1)
    LY = np.take(lyp, iv, axis=1)
    ADY = np.take(adyp, iv, axis=1)
    ADX = np.take(adxp, iv, axis=1)
    SGN = np.take(sgnp, iv, axis=1)
    SEG = np.take(segp, iv, axis=1)
    tf = np.arange(n2, dtype=np.float32)
    u = tf - LX                               # exact small-int f32
    off = ((ADY * u + np.float32(0.5)) / ADX).astype(np.int32)
    inseg = (SEG != 0) & (u >= 0)
    y = np.where(inseg, LY + SGN * off, LY)
    y = np.clip(y, 0, 255)
    return fromdB[y]


class FastDecoder:
    """Whole-stream batched decoder for one VorbisInfo."""

    def __init__(self, vi: H.VorbisInfo):
        self.vi = vi
        self.tables = StreamParseTables(vi)
        if not self.tables.ok:
            raise FastDecodeUnsupported(
                f"stream not native-decodable: {self.tables.why}")
        self.fromdB = fromdB_lookup()


    @staticmethod
    def _native_lap(groups, gidx, W, lW, nW, offs, wins, out, bs0, bs1):
        """Drive vn_lap_add (same per-sample multiply/add order as the
        numpy fallback).  Returns False when the native lib is
        unavailable."""
        import ctypes as C

        from ..native import _load
        L = _load()
        if L is None:
            return False
        npkt = len(W)
        ch, outlen = out.shape
        blocksL = groups.get(1)
        blocksS = groups.get(0)
        zero = np.zeros(1, np.float32)
        keys = sorted(wins.keys())
        wcat = np.ascontiguousarray(
            np.concatenate([wins[k] for k in keys]).astype(np.float32))
        woff = {}
        acc = 0
        for k in keys:
            woff[k] = acc
            acc += len(wins[k])
        win_off = np.asarray(
            [woff[(int(a), int(b), int(c))]
             for a, b, c in zip(lW, W, nW)], np.int64)
        winid = np.arange(npkt, dtype=np.int32)   # one entry per packet
        # vn_lap_add indexes win_off by winid; give it identity ids
        which = W.astype(np.int32)
        offs64 = offs.astype(np.int64)

        def ptr(a):
            return C.c_void_p(a.ctypes.data if a is not None else None)

        L.vn_lap_add.restype = C.c_long
        L.vn_lap_add.argtypes = None
        L.vn_lap_add(
            ptr(blocksL if blocksL is not None else zero),
            ptr(blocksS if blocksS is not None else zero),
            C.c_int(ch), C.c_int(bs1), C.c_int(bs0), C.c_long(npkt),
            ptr(which), ptr(np.ascontiguousarray(gidx)),
            ptr(winid), ptr(offs64),
            ptr(wcat), ptr(np.ascontiguousarray(win_off)),
            ptr(out), C.c_long(outlen))
        return True

    def _device_imdct_dispatch(self, spec, W, bs0, bs1):
        """Dispatch the IMDCT of both W groups to the accelerator
        (async); returns a pending handle for _device_imdct_drain.
        Dispatching EVERY stream's waves before draining any is what
        lets the multi-stream device batch overlap all transfers and
        compute (decode_ogg_fast_batch(device=True))."""
        import jax
        import jax.numpy as jnp
        if not hasattr(self, "_imdct_jit"):
            self._imdct_jit = {}
        pending = []
        for Wv in (0, 1):
            idx = np.where(W == Wv)[0]
            if not len(idx):
                continue
            n = bs1 if Wv else bs0
            stack = np.ascontiguousarray(
                spec[idx][:, :, :n // 2].reshape(-1, n // 2))
            # fixed-size chunks: one compiled shape per n
            CH = 4096
            G = stack.shape[0]
            if n not in self._imdct_jit:
                self._imdct_jit[n] = jax.jit(
                    lambda s, n=n: imdct(s, n, xp=jnp))
            f = self._imdct_jit[n]
            outs = []
            for o in range(0, G, CH):
                blk = stack[o:o + CH]
                if blk.shape[0] < CH:
                    blk = np.concatenate(
                        [blk, np.zeros((CH - blk.shape[0], n // 2),
                                       np.float32)])
                d = f(blk)
                d.copy_to_host_async()
                outs.append(d)
            pending.append((Wv, idx, n, G, outs))
        return pending

    @staticmethod
    def _device_imdct_drain(pending, npkt):
        """Collect dispatched IMDCT waves into the `groups`/`gidx`
        layout the lap stage consumes."""
        groups = {}
        gidx = np.zeros(npkt, np.int32)
        for Wv, idx, n, G, outs in pending:
            blocks = np.concatenate([np.asarray(o) for o in outs])[:G]
            blocks = np.ascontiguousarray(
                blocks.reshape(len(idx), -1, n))
            groups[Wv] = blocks
            gidx[idx] = np.arange(len(idx), dtype=np.int32)
        return groups, gidx

    def _device_imdct(self, spec, W, bs0, bs1, ch):
        """IMDCT on the TPU for both W groups, batched over packets
        (bit-exact: ops/mdct.py's vectorized butterfly stages preserve
        the reference op order on device; verified by the device
        decode matrix test).  Returns the same `groups`/`gidx` layout
        the native path produces.  On a PCIe-attached TPU this moves
        the decode drain's largest host cost to the MXU-adjacent
        vector units; over this environment's tunnel the PCM
        round-trip outweighs it (fastdec module docstring), so it is
        opt-in."""
        return self._device_imdct_drain(
            self._device_imdct_dispatch(spec, W, bs0, bs1), len(W))

    def _lap_and_trim(self, W, groups, gidx, gps, eoss, pcm=None):
        """Windowed scatter-add lapping + granulepos trim from the
        per-group IMDCT blocks (shared by the staged single-stream
        path and the multi-stream device batch)."""
        vi = self.vi
        ch = vi.channels
        bs0, bs1 = vi.blocksizes
        npkt = len(W)
        lW = np.concatenate([[0], W[:-1]])
        nW = np.concatenate([W[1:], [W[-1]]])
        ns = np.where(W == 1, bs1, bs0).astype(np.int64)
        adv = np.zeros(npkt, np.int64)          # center advance
        adv[1:] = ns[:-1] // 4 + ns[1:] // 4
        centers = np.cumsum(adv)
        starts = centers - ns // 2
        base = starts.min()
        total_len = int(max(centers[-1] + ns[-1] // 2,
                            (starts + ns).max()) - base)
        out = np.zeros((ch, total_len + 8), np.float32)
        wins = {}
        for key in {(int(a), int(b), int(c))
                    for a, b, c in zip(lW, W, nW)}:
            l, w, nx = key
            wins[key] = hybrid_window(bs0, bs1, l, w, nx)
        lap = self._native_lap(groups, gidx, W, lW, nW, starts - base,
                               wins, out, bs0, bs1)
        if not lap:
            for k in range(npkt):
                key = (int(lW[k]), int(W[k]), int(nW[k]))
                o = int(starts[k] - base)
                blk = (pcm[k] if pcm is not None
                       else groups[int(W[k])][gidx[k]])
                out[:, o:o + int(ns[k])] += blk * wins[key]
        gp_arr = np.asarray([-1 if g is None else int(g)
                             for g in gps], np.int64)
        eos_arr = np.asarray(eoss, bool)
        lo, hi = self._trim_range(centers, base, gp_arr, eos_arr)
        return out[:, lo:hi]

    def decode_packets(self, pkts, device: bool = False) -> np.ndarray:
        """pkts: list of (packet_bytes, granulepos_or_None, eos).
        Returns (ch, N) float32 PCM, trimmed exactly like the scalar
        blockin/granulepos state machine.  device=True runs the IMDCT
        stage on the accelerator (see _device_imdct)."""
        vi = self.vi
        ch = vi.channels
        bs0, bs1 = vi.blocksizes
        packets = [p for p, _, _ in pkts]
        if not packets:
            return np.zeros((ch, 0), np.float32)
        W, mode, posts, nonzero, res = parse_packets(self.tables, packets)
        ok = W >= 0
        if not ok.all():
            raise FastDecodeUnsupported("bad packet in stream")
        gps = [g for _, g, _ in pkts]
        eoss = [e for _, _, e in pkts]
        npkt = len(packets)
        n2s = np.where(W == 1, bs1 // 2, bs0 // 2)

        # inverse coupling AND floor render+multiply already happened
        # inside the native parse (mapping0_inverse order: residue ->
        # coupling -> floor1_inverse2); `res` IS the final spectrum
        spec = res            # (npkt, ch, n2max) float32

        # ---- IMDCT per W group (native bit-exact kernel; numpy
        # fallback is the same transform; device=True batches it on
        # the accelerator) ----
        pcm = [None] * npkt
        if device:
            groups, gidx = self._device_imdct(spec, W, bs0, bs1, ch)
            for Wv, blocks in groups.items():
                idx = np.where(W == Wv)[0]
                for j, k in enumerate(idx):
                    pcm[k] = blocks[j]
        else:
            from ..native import imdct_batch
            groups = {}          # Wv -> (blocks (G, ch, n), group idx)
            gidx = np.zeros(npkt, np.int32)
            for Wv in (0, 1):
                idx = np.where(W == Wv)[0]
                if not len(idx):
                    continue
                n = bs1 if Wv else bs0
                stack = np.ascontiguousarray(
                    spec[idx][:, :, :n // 2].reshape(-1, n // 2))
                blocks = imdct_batch(stack, n)
                if blocks is None:
                    blocks = np.asarray(imdct(stack, n))
                blocks = np.ascontiguousarray(
                    blocks.reshape(len(idx), ch, n))
                groups[Wv] = blocks
                gidx[idx] = np.arange(len(idx), dtype=np.int32)
                for j, k in enumerate(idx):
                    pcm[k] = blocks[j]

        return self._lap_and_trim(W, groups, gidx, gps, eoss, pcm=pcm)

    @staticmethod
    def _trim_range(centers, base, gps, eoss):
        """Vectorized granulepos walk (same semantics as the scalar
        blockin/granulepos state machine): the first label sets the
        start trim (or end cut at eos), every later label's expected-
        vs-actual overshoot cuts the tail only at eos — run_gp resets
        at each label, so consecutive label pairs decide
        independently."""
        first_out = int(centers[0] - base)      # center of block 0
        last_out = int(centers[-1] - base)      # center of last block
        start_trim = 0
        end_cut = 0
        lbl = np.flatnonzero(gps >= 0)
        if len(lbl):
            k = int(lbl[0])
            g0 = int(gps[k])
            sc = int(centers[k] - centers[0])
            if sc > g0:
                if eoss[k]:
                    end_cut = sc - g0
                else:
                    start_trim = sc - g0
            if len(lbl) > 1:
                run = gps[lbl[:-1]] + (centers[lbl[1:]]
                                       - centers[lbl[:-1]])
                over = run - gps[lbl[1:]]
                m = (over > 0) & eoss[lbl[1:]]
                if m.any():
                    end_cut = max(end_cut, int(over[m].max()))
        lo = first_out + start_trim
        hi = max(lo, last_out - end_cut)
        return lo, hi

    def decode_arrays(self, blob, off, lens, gps, eoss,
                      CH=128) -> np.ndarray:
        """Fused native whole-stream decode from dense packet arrays
        (the vn_ogg_scan output form): ONE native call runs Huffman
        parse, residue accumulate, inverse coupling, floor render,
        IMDCT and the windowed lapped overlap-add, chunked CH packets
        at a time so every intermediate stays cache-resident.
        Bit-exact with decode_packets (same expression trees; see
        vn_imdct16_rows on scatter-add order)."""
        vi = self.vi
        ch = vi.channels
        bs0, bs1 = vi.blocksizes
        npkt = len(off)
        if npkt == 0:
            return np.zeros((ch, 0), np.float32)
        bits = lens * 8
        W = scan_W(self.tables, blob, off, bits)
        if (W < 0).any():
            raise FastDecodeUnsupported("bad packet in stream")
        ns = np.where(W == 1, bs1, bs0).astype(np.int64)
        adv = np.zeros(npkt, np.int64)
        adv[1:] = ns[:-1] // 4 + ns[1:] // 4
        centers = np.cumsum(adv)
        starts = centers - ns // 2
        base = starts.min()
        # every block's full span (a long block just before a short
        # final block overhangs centers[-1] + ns[-1]//2)
        total_len = int(max(centers[-1] + ns[-1] // 2,
                            (starts + ns).max()) - base)
        lW = np.concatenate([[0], W[:-1]])
        nW = np.concatenate([W[1:], [W[-1]]])
        winid = (lW * 4 + W * 2 + nW).astype(np.int32)
        wins, win_off = _win_table(bs0, bs1)
        out = np.zeros((ch, total_len + 8), np.float32)
        decode_stream(self.tables, blob, off, bits,
                      np.ascontiguousarray(starts - base),
                      np.ascontiguousarray(winid), wins, win_off,
                      out, W, CH=CH)
        lo, hi = self._trim_range(centers, base,
                                  np.asarray(gps, np.int64),
                                  np.asarray(eoss, bool))
        return out[:, lo:hi]


class FastStreamDecoder:
    """Stateful CHUNKED fast decode: K packets per native call with the
    lap tail + granulepos state carried across calls — the incremental
    mirror of FastDecoder.decode_arrays, serving `ov_read`-style
    streaming reads, post-seek reads, and halfrate at drain speed
    (reference: the rolling synthesis buffer in
    lib/block.c:1023-1157 vorbis_synthesis_blockin + the read loop in
    lib/vorbisfile.c:1680-1779,2252).

    Each feed() decodes its packets through ONE fused native call
    (vn_decode_stream: Huffman parse, residue, coupling, floor render,
    IMDCT, windowed lap) into a buffer pre-initialized with the
    previous chunk's windowed lap tail; the scatter-add is linear, so
    chunked accumulation is bitwise-identical to the whole-stream
    drain.  The LAST packet of every feed is held back until the next
    call reveals its successor's block flag (the right-half window of
    block k needs nW = W[k+1]); EOS packets flush immediately.

    halfrate (hs=1) runs the staged variant: native packet parse
    (vn_parse_packets) + batched half-size IMDCT + numpy windowed
    scatter-add with half-unit geometry — same math as the scalar
    halfrate Decoder, batched.

    Granulepos semantics mirror the scalar blockin exactly: the first
    label sets the position (start-trim / eos end-cut within the
    current window), later labels only cut at EOS; damaged packets
    (scan_W < 0 with an audio-type first byte) are dropped and counted
    in `holes` — non-audio packets are dropped silently, like the
    scalar loop's NotAudioPacket skip."""

    def __init__(self, dec: FastDecoder, hs: int = 0):
        vi = dec.vi
        if hs and vi.blocksizes[0] <= 64:
            raise FastDecodeUnsupported("blocksize too small for "
                                        "halfrate")
        self.dec = dec
        self.vi = vi
        self.ch = vi.channels
        self.bs = vi.blocksizes
        self.hs = hs
        # carry state
        self.prev_W = -1              # W of last processed packet
        self.tail = np.zeros((self.ch, 0), np.float32)
        self.pend = None              # held-back (bytes, gp, eos)
        self.granulepos = -1
        self.sample_count = -1
        self.holes = 0                # damaged packets dropped
        self._K0 = 32                 # first-feed parse size (grows)
        self._last = []               # last <=3 processed packets
        self._flushed = False

    def take_holes(self) -> int:
        h, self.holes = self.holes, 0
        return h

    def last_packets(self):
        """Raw bytes of the last <=3 processed packets (for priming a
        scalar Decoder's lap state, e.g. crosslap)."""
        return list(self._last)

    def feed(self, pkts) -> np.ndarray:
        """pkts: list of (packet_bytes, granulepos_or_None, eos).
        Returns newly final PCM (ch, k) — empty until enough packets
        have arrived."""
        allp = ([self.pend] if self.pend is not None else []) + \
            list(pkts)
        self.pend = None
        if not allp:
            return np.zeros((self.ch, 0), np.float32)
        if allp[-1][2]:               # eos: no holdback, nW=W (same
            return self._process(allp, None)   # as the whole-stream drain)
        if len(allp) == 1:
            self.pend = allp[0]
            return np.zeros((self.ch, 0), np.float32)
        self.pend = allp[-1]
        # successor W of the last processed packet, from the held-back
        # packet (so every right-half window is the true one)
        nW_last = self._scan_one_W(self.pend[0])
        return self._process(allp[:-1], nW_last)

    def flush(self) -> np.ndarray:
        """End of packet stream without an EOS flag (truncated
        stream): process the held-back packet with nW = its own W."""
        if self.pend is None:
            return np.zeros((self.ch, 0), np.float32)
        p, self.pend = self.pend, None
        return self._process([p], None)

    # ---- internals ---------------------------------------------------
    def _scan_one_W(self, pk: bytes):
        from ..codec.nativeparse import scan_W
        blob = np.frombuffer(pk + b"\x00" * 8, np.uint8)
        w = scan_W(self.dec.tables, blob, np.zeros(1, np.int64),
                   np.asarray([len(pk) * 8], np.int64))
        return int(w[0])

    def _process(self, pkts, nW_last):
        from ..codec.nativeparse import scan_W
        ch, hs = self.ch, self.hs
        bs0, bs1 = self.bs
        sizes = np.asarray([len(p) for p, _, _ in pkts], np.int64)
        off = np.zeros(len(pkts), np.int64)
        np.cumsum(sizes[:-1], out=off[1:])
        blob = np.frombuffer(
            b"".join(p for p, _, _ in pkts) + b"\x00" * 8, np.uint8)
        W = scan_W(self.dec.tables, blob, off, sizes * 8)
        good = W >= 0
        if not good.all():
            for i in np.flatnonzero(~good):
                if not (pkts[i][0][:1] and pkts[i][0][0] & 1):
                    self.holes += 1   # audio-type packet, bad syntax
            keep = np.flatnonzero(good)
            if not len(keep):
                return np.zeros((ch, 0), np.float32)
            pkts = [pkts[i] for i in keep]
            sizes, off, W = sizes[keep], off[keep], W[keep]
        m = len(pkts)
        self._last = ([p for p, _, _ in pkts[-3:]]
                      if m >= 3 else (self._last
                                      + [p for p, _, _ in pkts])[-3:])

        # local geometry, in half units under halfrate
        ns = np.where(W == 1, bs1, bs0).astype(np.int64)
        lW = np.concatenate([[max(self.prev_W, 0)], W[:-1]])
        advf = ns // 4 + np.where(lW == 1, bs1, bs0) // 4  # full-rate
        adv = advf >> hs
        first_ever = self.prev_W < 0
        fg = bs1 >> hs                # front guard (window reach-back)
        if first_ever:
            cum = np.concatenate([[0], np.cumsum(adv[1:])])
            centers = fg + (ns[0] >> (1 + hs)) + cum
        else:
            centers = fg + np.cumsum(adv)
        starts = centers - (ns >> (1 + hs))
        assert starts.min() >= 0, starts.min()
        # cover every block's full span: a long block right before a
        # short final block overhangs the last center + half block
        outlen = int(max(centers[-1] + (ns[-1] >> (1 + hs)),
                         (starts + (ns >> hs)).max())) + 8
        out = np.zeros((ch, outlen), np.float32)
        tl = self.tail.shape[1]
        if tl:
            out[:, fg:fg + tl] = self.tail
        nWv = np.concatenate([W[1:], [W[-1] if nW_last is None
                                      or nW_last < 0 else nW_last]])
        winid = (lW * 4 + W * 2 + nWv).astype(np.int32)
        if hs:
            self._synth_staged(blob, off, sizes * 8, W, lW, nWv,
                               starts, out)
        else:
            from ..codec.nativeparse import decode_stream
            wins, win_off = _win_table(bs0, bs1)
            decode_stream(self.dec.tables, blob, off, sizes * 8,
                          np.ascontiguousarray(starts),
                          np.ascontiguousarray(winid), wins, win_off,
                          out, np.ascontiguousarray(W))

        # ---- granulepos walk (scalar blockin semantics) ----
        emit_from = int(centers[0]) if first_ever else fg
        emit_to = int(centers[-1])
        cuts = []
        win_lo = emit_from            # current window start
        for i in range(m):
            cur = int(centers[i])
            if self.sample_count < 0:
                self.sample_count = 0
            else:
                self.sample_count += int(advf[i])
            gp_i, eos_i = pkts[i][1], pkts[i][2]
            vgp = -1 if gp_i is None else int(gp_i)
            if self.granulepos == -1:
                if vgp != -1:
                    self.granulepos = vgp
                    if self.sample_count > vgp:
                        extra = (self.sample_count - vgp) >> hs
                        extra = min(extra, cur - win_lo)
                        if eos_i:
                            cuts.append((cur - extra, cur))
                        else:
                            cuts.append((win_lo, win_lo + extra))
            else:
                self.granulepos += int(advf[i])
                if vgp != -1 and self.granulepos != vgp:
                    if self.granulepos > vgp:
                        extra = (self.granulepos - vgp) >> hs
                        if extra and eos_i:
                            extra = min(extra, cur - win_lo)
                            cuts.append((cur - extra, cur))
                    self.granulepos = vgp
            win_lo = cur

        self.prev_W = int(W[-1])
        self.tail = out[:, emit_to:emit_to
                        + (int(ns[-1]) >> (1 + hs))].copy()
        if not cuts:
            return out[:, emit_from:emit_to]
        keepers, pos = [], emit_from
        for a, b in sorted(cuts):
            a, b = max(a, pos), min(b, emit_to)
            if a > pos:
                keepers.append(out[:, pos:a])
            pos = max(pos, b)
        if pos < emit_to:
            keepers.append(out[:, pos:emit_to])
        if not keepers:
            return np.zeros((ch, 0), np.float32)
        return np.concatenate(keepers, 1)

    def _synth_staged(self, blob, off, bits, W, lW, nWv, starts, out):
        """Halfrate chunk synthesis: native parse -> batched half-size
        IMDCT -> windowed scatter-add at half-unit geometry (the
        batched mirror of the scalar halfrate blockin,
        reference: lib/synthesis.c:166 vorbis_synthesis_halfrate)."""
        from ..codec.nativeparse import parse_packet_arrays
        bs0, bs1 = self.bs
        hs = self.hs
        _, _, _, _, res = parse_packet_arrays(
            self.dec.tables, blob, off, bits)
        m = len(W)
        pcm = [None] * m
        for Wv in (0, 1):
            idx = np.flatnonzero(W == Wv)
            if not len(idx):
                continue
            nh = (bs1 if Wv else bs0) >> hs
            stack = np.ascontiguousarray(
                res[idx][:, :, :nh // 2].reshape(-1, nh // 2))
            from ..native import imdct_batch
            blocks = imdct_batch(stack, nh)
            if blocks is None:
                blocks = np.asarray(imdct(stack, nh))
            blocks = blocks.reshape(len(idx), self.ch, nh)
            for j, k in enumerate(idx):
                pcm[k] = blocks[j]
        for k in range(m):
            key = (int(lW[k]), int(W[k]), int(nWv[k]))
            wv = hybrid_window(bs0 >> hs, bs1 >> hs, *key)
            o = int(starts[k])
            out[:, o:o + len(wv)] += pcm[k] * wv


_DEC_CACHE = {}                  # header bytes -> FastDecoder
_DEC_CACHE_MAX = 16


def _decoder_for(header_pkts):
    """FastDecoder memoized by the id+setup header bytes: codebook
    construction (~40 ms) dominates short-stream decode and every
    stream from one encoder config shares it."""
    key = (header_pkts[0], header_pkts[2])
    dec = _DEC_CACHE.get(key)
    if dec is None:
        vi = H.parse_headers(list(header_pkts))
        dec = FastDecoder(vi)
        if len(_DEC_CACHE) >= _DEC_CACHE_MAX:
            _DEC_CACHE.pop(next(iter(_DEC_CACHE)))
        _DEC_CACHE[key] = dec
    return dec


def decode_ogg_fast(data: bytes, device: bool = False):
    """Whole-stream fast decode; returns (pcm, vi).  Raises
    FastDecodeUnsupported when the stream needs the scalar path.
    device=True runs the IMDCT stage on the accelerator.

    The default path is the FUSED native drain: vn_ogg_scan (page walk
    -> packet arrays) + vn_decode_stream (parse/IMDCT/lap in one
    chunked call); the staged decode_packets path backs the device
    option and the no-native fallback."""
    if not device:
        from ..native import ogg_scan
        sc = ogg_scan(data)
        if sc is not None:
            blob, off, lens, gp, eos, _serial = sc
            if len(off) >= 3:
                hdrs = tuple(
                    blob[off[i]:off[i] + lens[i]].tobytes()
                    for i in range(3))
                dec = _decoder_for(hdrs)
                return dec.decode_arrays(blob, off[3:], lens[3:],
                                         gp[3:], eos[3:]), dec.vi
    from ..bitstream.oggfile import OggStreamReader
    rd = OggStreamReader(data)
    pkts = list(rd.packets())
    dec = _decoder_for(tuple(p for p, _, _ in pkts[:3]))
    return dec.decode_packets(pkts[3:], device=device), dec.vi


def _decode_batch_device(streams):
    """Multi-stream DEVICE decode: every stream's packets are parsed
    natively, then ALL streams' spectra ride one IMDCT dispatch wave
    on the accelerator (transfers and compute of different streams
    overlap, like encode_batch's chip-filling batches) before any
    stream's lap/trim drains.  Bit-exact with the per-stream paths."""
    from ..codec.nativeparse import parse_packet_arrays
    from ..native import ogg_scan
    jobs = []
    for data in streams:
        sc = ogg_scan(data)
        if sc is None:
            return [decode_ogg_fast(s, device=True) for s in streams]
        blob, off, lens, gp, eos, _serial = sc
        hdrs = tuple(blob[off[i]:off[i] + lens[i]].tobytes()
                     for i in range(3))
        dec = _decoder_for(hdrs)
        W, _, _, _, res = parse_packet_arrays(
            dec.tables, blob, off[3:], lens[3:] * 8)
        if (W < 0).any():
            raise FastDecodeUnsupported("bad packet in stream")
        jobs.append((dec, W, res, gp[3:], eos[3:]))
    pendings = [
        dec._device_imdct_dispatch(res, W, *dec.vi.blocksizes)
        for dec, W, res, _, _ in jobs]
    outs = []
    for (dec, W, res, gp, eos), pend in zip(jobs, pendings):
        groups, gidx = dec._device_imdct_drain(pend, len(W))
        outs.append((dec._lap_and_trim(W, groups, gidx, gp, eos),
                     dec.vi))
    return outs


def decode_ogg_fast_batch(streams, threads=None, device=False):
    """Decode MANY independent Ogg streams concurrently.

    The per-stream work is two whole-stream native C calls
    (vn_ogg_scan + vn_decode_stream) that release the GIL for their
    entire duration, so a thread pool scales the drain across host
    cores the way the reference would need one process per file
    (libvorbis is single-threaded; SURVEY.md §2 'Parallelism
    strategies').  device=True instead routes ALL streams' packets
    through one accelerator IMDCT dispatch wave (_decode_batch_device).
    Returns a list of (pcm, vi) in input order."""
    if device and len(streams) > 1:
        return _decode_batch_device(streams)
    from concurrent.futures import ThreadPoolExecutor
    if threads is None:
        import os
        # honor the cgroup/affinity mask: os.cpu_count() reports the
        # machine's cores, not the cores THIS process may run on, and a
        # thread pool wider than the mask only buys GIL churn (25%+
        # aggregate loss measured on a 1-core mask)
        try:
            cores = len(os.sched_getaffinity(0))
        except AttributeError:
            cores = os.cpu_count() or 1
        threads = min(8, cores, max(1, len(streams)))
    if threads <= 1 or len(streams) <= 1:
        return [decode_ogg_fast(s, device=device) for s in streams]
    with ThreadPoolExecutor(threads) as ex:
        return list(ex.map(
            lambda s: decode_ogg_fast(s, device=device), streams))
