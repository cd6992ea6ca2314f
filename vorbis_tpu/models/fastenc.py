"""High-throughput batched encoder: device fast path + host bit pack.

This is the TPU production encode mode (SURVEY.md §7 north star): all
DSP decisions — masking, floor fitting, residue quantization, VQ entry
selection — run batched on device for a whole chunk of frames in one
jit; the host only Huffman-packs the precomputed decisions and frames
Ogg pages.  The output is a VALID Vorbis stream (our decoder, the
stock libvorbis, and the reference all accept it) but NOT byte-
identical to aoTuV: the fast path trades the reference's exact f32 op
order and its M3/M4 cross-frame state for throughput, and codes every
frame as a long block.  For byte-identical output use
codec.encoder.Encoder (the golden path).

Stereo inputs couple by default like every reference quality mode:
per-bin lossless flags (stereo point thresholds), the integer mag/ang
lossless transform, the min_indemnity_dipole_hypot point fold, and
res2 interleaved VQ all run on device; coupling=False selects the
uncoupled per-channel layout (encode_ctl COUPLING_SET 0).  An
envelope pass drives 256/2048 block switching by default
(switching=False forces long-only)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..bitstream.bitpack import FieldWriter, ilog
from ..bitstream.oggfile import OggStreamWriter
from ..codec.encoder import Encoder
from ..codec.floor1_codec import fromdB_lookup
from ..ops.floor_pallas import make_floor_fit
from ..ops.jaxdsp import DeviceAnalysis
from ..ops.residue_device import DeviceResidueVQ
from . import encsetup


def _enable_compile_cache():
    """Persist XLA compilations (the unrolled floor-fit graph costs
    minutes to compile; the cache makes later processes instant)."""
    import os
    try:
        cache = os.environ.get("VORBIS_TPU_CACHE",
                               os.path.expanduser("~/.cache/vorbis_tpu_xla"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          2.0)
    except Exception:
        pass


_enable_compile_cache()


class _ShortCtx:
    """Per-mode device components for the short-block (W=0) pipeline
    of the switching fast path."""

    def __init__(self, fe):
        vi = fe.vi
        self.n = vi.blocksizes[0]
        self.mode_idx = next(i for i, m in enumerate(vi.modes)
                             if m.blockflag == 0)
        minfo = vi.modes[self.mode_idx]
        mapping = vi.maps[minfo.mapping]
        self.mapping = mapping
        # impulse psy params (blocktype 0) for every short block; the
        # golden path distinguishes impulse/padding
        self.analysis = DeviceAnalysis(fe.setup, blocktype=0,
                                       rate=fe.rate, W=0)
        fl_idx = mapping.floorsubmap[mapping.chmuxlist[0]]
        self.fl_look = fe.enc.floor_looks[fl_idx]
        self.floor = make_floor_fit(self.fl_look)
        self.fromdB = fe.fromdB
        res_idx = mapping.residuesubmap[mapping.chmuxlist[0]]
        self.res_look = fe.enc.residue_looks[res_idx]
        self.res_type = vi.residue_types[res_idx]
        assert self.res_type in (0, 1, 2)
        self.dvq = DeviceResidueVQ(self.res_look.info,
                                   self.res_look.books,
                                   self.res_look.partbooks)
        pv = fe.setup.psy_params[0]
        self.normal = dict(
            partition=int(pv["normal_partition"]) if pv["normal_p"]
            else 16,
            start=int(pv["normal_start"]),
            thresh=float(pv.get("normal_thresh", 9999.0)))
        if self.res_type == 2:
            self.couple = _couple_params(fe.setup, 0, 0, self.n // 2)
            self.couple["tonefix_end"] = self.analysis.look.tonefix_end


def _couple_params(setup, blocktype, blockflag, n2, blob=7):
    """Static stereo-coupling constants for the fast path (reference:
    _vp_couple_quantize_normalize's threshold setup; blob 7 is the
    unmanaged middle, the managed pass builds all 15)."""
    from ..ops.psy import _tables
    t = _tables()
    g = setup.psy_global
    pv = setup.psy_params[blocktype]
    st = t["stereo_threshholds"]
    stX = t["stereo_threshholds_X"]
    prepoint = np.float32(st[g["coupling_prepointamp"][blob]])
    postpoint = np.float32(st[g["coupling_postpointamp"][blob]])
    prepoint_x = np.float32(stX[g["coupling_prepointamp"][blob]])
    postpoint_x = np.float32(stX[g["coupling_postpointamp"][blob]])
    if prepoint_x < prepoint:
        prepoint_x = prepoint
    if postpoint_x < prepoint:
        postpoint_x = prepoint
    limit = int(g["coupling_pointlimit"][blockflag][blob])
    partition = int(pv["normal_partition"]) if pv["normal_p"] else 16

    def profile(pre, post):
        """per-bin threshold: pre below the point limit, a linear ramp
        across the partition containing it, then post (flag_lossless's
        ps interpolation)."""
        thr = np.full(n2, post, np.float32)
        p0 = (limit // partition) * partition
        thr[:p0] = pre
        if p0 < n2:
            jn = min(partition, n2 - p0)
            ps1 = np.float32((post - pre) / np.float32(jn))
            ramp = pre + ps1 * np.arange(1, jn + 1, dtype=np.float32)
            thr[p0:p0 + jn] = ramp
        return thr

    thr = profile(prepoint, postpoint)
    thr2 = profile(prepoint_x, postpoint_x)
    threv = np.where(np.arange(n2) < limit,
                     np.float32(0.18), np.float32(0.12)).astype(np.float32)
    return dict(thr1=thr, thr2=thr2, prepoint=float(prepoint),
                threv=threv, limit=limit,
                partition=partition,
                tonefix_end=0,
                normal_thresh=float(pv.get("normal_thresh", 9999.0)))


class FastEncoder:
    def __init__(self, ch: int, rate: int, quality: float = 0.5,
                 switching: bool = True, coupling: bool | None = None,
                 bitrate: tuple | None = None, psy_state: bool = True):
        """bitrate=(max_bps, nominal_bps, min_bps) selects managed
        (ABR/CBR) mode: the encode runs the 15-packetblob device pass
        and the host reservoir floater picks each packet
        (ops/managed.py; reference lib/bitrate.c).  Otherwise
        unmanaged VBR at `quality`.

        psy_state=True (default) threads the reference's cross-frame
        psychoacoustic state through the batched pipeline — ampmax
        decay, lastmdct (M9/M3), the M5 compand latch, M2 post-echo,
        M3 impulse-noise control, M7 ntfix, M6 lossless promotion and
        the M8 noise-normalize budgets (ops/psydevice).  False selects
        the round-2 stateless single-pass pipeline."""
        self.managed = bitrate is not None
        if self.managed:
            mx, nom, mn = bitrate
            b = encsetup.setup_managed_staged(ch, rate, mx, nom, mn)
        else:
            b = encsetup.setup_vbr_staged(ch, rate, quality)
        if coupling is None:
            # couple wherever the reference templates do: stereo and
            # the 5.1 layouts (setup_44p51); other channel counts have
            # no coupled template
            coupling = ch in (2, 6)
        if not coupling:
            b.ctl_coupling_set(False)
        self.setup = b.init()
        self.enc = Encoder(self.setup)   # looks, books, header packing
        self.vi = self.setup.vi
        self.ch = ch
        self.rate = rate
        vi = self.vi
        self.n = vi.blocksizes[1]
        n2 = self.n // 2
        # long-block mode + its mapping; single-blocksize templates
        # (8/11 kHz) have only short modes — use mode 0 (W=0 packets,
        # no window-shape bits) with the padding psy params
        try:
            self.mode_idx = next(i for i, m in enumerate(vi.modes)
                                 if m.blockflag == 1)
            self.W_main = 1
        except StopIteration:
            self.mode_idx = 0
            self.W_main = 0
        self.modebits = ilog(len(vi.modes) - 1)
        minfo = vi.modes[self.mode_idx]
        self.mapping = vi.maps[minfo.mapping]
        # device ops
        self.blocktype = min(3 if self.W_main else 1,
                             len(self.setup.psy_params) - 1)
        self.analysis = DeviceAnalysis(
            self.setup, blocktype=self.blocktype,
            rate=rate, W=self.W_main)
        fl_idx = self.mapping.floorsubmap[self.mapping.chmuxlist[0]]
        self.fl_look = self.enc.floor_looks[fl_idx]
        self.floor = make_floor_fit(self.fl_look)
        self.fromdB = jnp.asarray(fromdB_lookup())
        res_idx = self.mapping.residuesubmap[self.mapping.chmuxlist[0]]
        self.res_look = self.enc.residue_looks[res_idx]
        self.res_type = vi.residue_types[res_idx]
        assert self.res_type in (0, 1, 2)
        self.dvq = DeviceResidueVQ(self.res_look.info,
                                   self.res_look.books,
                                   self.res_look.partbooks)
        pv = self.setup.psy_params[self.blocktype]
        self.normal = dict(
            partition=int(pv["normal_partition"]) if pv["normal_p"]
            else 16,
            start=int(pv["normal_start"]),
            thresh=float(pv.get("normal_thresh", 9999.0)))
        if self.res_type == 2:
            # coupled layouts: single-step stereo AND the multi-step
            # multi-submap 5.1 templates (DeviceFastEncode builds the
            # general per-submap configs from the mapping)
            self.couple = _couple_params(
                self.setup, self.blocktype, self.W_main, n2)
            self.couple["tonefix_end"] = self.analysis.look.tonefix_end
        self._step = jax.jit(self._device_step)
        # fixed device batch (frames) — one compiled shape for any
        # input length; ~24s of stereo per chunk at n=2048
        self.chunk_frames = 2048
        # round-2 fully-on-device pipeline (framing -> ... -> packed
        # packet bytes in one jit); lazy so the host-pack path stays
        # importable without building the column plan
        self._dev = None
        # block switching (envelope-driven 256/2048) — on by default
        # when the mode set has two block sizes
        self.switching = bool(switching) and (
            vi.blocksizes[0] != vi.blocksizes[1]
            and any(m.blockflag == 0 for m in vi.modes))
        self._short_ctx = None
        self._dev_short = None
        self._dev_gather = None
        self._managed_dev = None
        self._reservoir = None
        # cross-frame psy state rides the two-phase batched pipeline
        # (unmanaged VBR and the managed 15-blob pass: long-only, so
        # ampmax decay + the M9 lastmdct epeak are the active states)
        self.psy_state = bool(psy_state)

    def ctx(self, W: int = 1):
        """Per-mode component bundle; the long ctx is the encoder
        itself (analysis/floor/dvq attributes), the short ctx is
        built lazily."""
        if W or self.W_main == 0:
            # single-blocksize templates have one mode: the encoder
            # itself is the only ctx
            return self
        if self._short_ctx is None:
            self._short_ctx = _ShortCtx(self)
        return self._short_ctx

    @property
    def dev(self):
        if self._dev is None:
            from ..ops.encdevice import DeviceFastEncode
            self._dev = DeviceFastEncode(self, W=self.W_main)
        return self._dev

    # -- device side ------------------------------------------------------
    def _device_step(self, frames):
        """frames (B, n) -> (posts (B,P), used (B,), partword
        (B,parts), entries list[(B,parts,spp)], residues)."""
        md, logmdct, mask = self.analysis.full_mask(frames)
        posts, used = self.floor(logmdct, mask)
        qposts = self.floor.quantize_posts(posts)
        curve = self.floor.render(qposts, self.fromdB)
        res = jnp.rint(md / curve)
        res = jnp.where(used[:, None], res, 0.0)
        n2 = md.shape[-1]
        end = self.res_look.info.end
        if end > n2:
            pad = jnp.zeros(res.shape[:-1] + (end - n2,), res.dtype)
            resv = jnp.concatenate([res, pad], -1)
        else:
            resv = res
        pw = self.dvq.classify(resv.astype(jnp.int32))
        entries, rem = self.dvq.encode(resv, pw)
        # compact dtypes: the device->host transfer rides a tunnel.
        # uint16 keeps the 0x8000 interpolation flag positive.
        return (posts.astype(jnp.uint16), used,
                pw.astype(jnp.int8),
                [e.astype(jnp.uint16) for e in entries])

    # -- host side: batched field construction ---------------------------
    def _floor_fields(self, posts, used):
        """posts (F, P) raw fit posts, used (F,) -> (vals, lens, mask)
        (F, C) field arrays for one channel's floor, vectorized
        across frames (floor1_encode, floor1.c:774-974)."""
        look = self.fl_look
        info = look.info
        F, P = posts.shape
        post = posts.astype(np.int64)
        val = post & 0x7FFF
        m = info.mult
        val = (val >> 2 if m == 1 else val >> 3 if m == 2
               else val // 12 if m == 3 else val >> 4)
        post = val | (post & 0x8000)
        out = np.zeros((F, P), np.int64)
        out[:, 0] = post[:, 0]
        out[:, 1] = post[:, 1]
        quant_q = look.quant_q
        pl = np.asarray(info.postlist, np.int64)
        for i in range(2, P):
            ln = int(look.loneighbor[i - 2])
            hn = int(look.hineighbor[i - 2])
            y0 = post[:, ln] & 0x7FFF
            y1 = post[:, hn] & 0x7FFF
            dy = y1 - y0
            adx = int(pl[hn] - pl[ln])
            err = np.abs(dy) * int(pl[i] - pl[ln])
            off = err // adx
            predicted = np.where(dy < 0, y0 - off, y0 + off)
            flag = ((post[:, i] & 0x8000) != 0) | (predicted
                                                   == post[:, i])
            headroom = np.minimum(quant_q - predicted, predicted)
            v = post[:, i] - predicted
            vneg = np.where(v < -headroom, headroom - v - 1,
                            -1 - (v << 1))
            vpos = np.where(v >= headroom, v + headroom, v << 1)
            code = np.where(v < 0, vneg, vpos)
            out[:, i] = np.where(flag, 0, code)
            post[:, i] = np.where(flag, predicted | 0x8000, post[:, i])
            unflag = ~flag
            post[:, ln] = np.where(unflag, post[:, ln] & 0x7FFF,
                                   post[:, ln])
            post[:, hn] = np.where(unflag, post[:, hn] & 0x7FFF,
                                   post[:, hn])
        # field assembly
        vals, lens, masks = [], [], []

        def add(v, l, mk=None):
            vals.append(np.asarray(v, np.uint64))
            lens.append(np.asarray(np.broadcast_to(l, (F,)), np.int64))
            masks.append(np.ones(F, bool) if mk is None
                         else np.asarray(mk, bool))

        add(np.where(used, 1, 0), 1)          # nonzero flag
        qb = ilog(quant_q - 1)
        add(out[:, 0], np.where(used, qb, 0))
        add(out[:, 1], np.where(used, qb, 0))
        j = 2
        vi_books = self.vi.books
        sbooks = self.vi.static_books
        for i in range(info.partitions):
            cls = info.partitionclass[i]
            cdim = info.class_dim[cls]
            csubbits = info.class_subs[cls]
            csub = 1 << csubbits
            maxval = np.array([1 if info.class_subbook[cls][k] < 0
                               else sbooks[info.class_subbook[cls][k]]
                               .entries for k in range(csub)], np.int64)
            seg = out[:, j:j + cdim]          # (F, cdim)
            cond = seg[:, :, None] < maxval[None, None, :]
            anyc = cond.any(-1)
            bookas = np.where(anyc, cond.argmax(-1), 0)  # (F, cdim)
            if csubbits:
                shifts = (np.arange(cdim) * csubbits)[None, :]
                cval = (bookas << shifts).sum(-1)
                cb = vi_books[info.class_book[cls]]
                add(cb.codewords[cval], 0, None)
                lens[-1] = np.where(used, cb.lengths[cval], 0)
            for k in range(cdim):
                booknum = np.array(info.class_subbook[cls],
                                   np.int64)[bookas[:, k]]
                # gather codeword/length per frame from the (<=8)
                # candidate subbooks
                v_k = np.zeros(F, np.uint64)
                l_k = np.zeros(F, np.int64)
                ok = np.zeros(F, bool)
                for l in range(csub):
                    bn = info.class_subbook[cls][l]
                    if bn < 0:
                        continue
                    bk = vi_books[bn]
                    sel = (bookas[:, k] == l) & (seg[:, k]
                                                 < bk.entries)
                    if not sel.any():
                        continue
                    ent = seg[sel, k]
                    v_k[sel] = bk.codewords[ent].astype(np.uint64)
                    l_k[sel] = bk.lengths[ent]
                    ok |= sel
                add(v_k, 0, ok & used)
                lens[-1] = l_k
            j += cdim
        return (np.stack(vals, 1), np.stack(lens, 1),
                np.stack(masks, 1))

    def _residue_fields(self, pw, entries, nzmask):
        """pw (ch, F, parts), entries list[s] (ch, F, parts, spp),
        nzmask (ch, F) -> (vals, lens, mask) (F, C) in res01_forward
        emission order.  Channels with a zeroed floor are skipped like
        the reference (nonzero gating in mapping0)."""
        look = self.res_look
        info = look.info
        ch, F, parts = pw.shape
        spp = info.grouping
        ppw = look.dim
        stages = look.stages
        possible = info.partitions
        sec = np.asarray(info.secondstages, np.int64)
        phr = look.phrasebook
        vals, lens, masks = [], [], []

        def add(v, l, mk):
            vals.append(np.asarray(v, np.uint64))
            lens.append(np.asarray(l, np.int64))
            masks.append(np.asarray(mk, bool))

        # stacked per-class codeword tables per stage
        maxent = max((b.entries for row in look.partbooks for b in row
                      if b is not None), default=1)
        cw = np.zeros((stages, possible, maxent), np.uint64)
        cl = np.zeros((stages, possible, maxent), np.int64)
        dims = np.ones((stages, possible), np.int64)
        has = np.zeros((stages, possible), bool)
        for c in range(possible):
            for s in range(len(look.partbooks[c])):
                b = look.partbooks[c][s]
                if b is None:
                    continue
                cw[s, c, :b.entries] = b.codewords.astype(np.uint64)
                cl[s, c, :b.entries] = b.lengths
                dims[s, c] = b.dim
                has[s, c] = True

        nchunks = (parts + ppw - 1) // ppw
        for s in range(stages):
            max_steps = (spp // int(dims[s][has[s]].min())
                         if has[s].any() else 1)
            # phrase words (stage 0 only): vectorized digit packing
            if s == 0:
                pwp = np.zeros((ch, F, nchunks * ppw), np.int64)
                pwp[..., :parts] = pw
                ph_v = np.zeros((ch, F, nchunks), np.int64)
                for k in range(ppw):
                    ph_v = ph_v * possible
                    ph_v = ph_v + pwp[..., k::ppw][..., :nchunks]
                ph_ok = (ph_v < phr.entries) & nzmask[:, :, None]
                ph_v = np.where(ph_ok, ph_v, 0)
                ph_cw = phr.codewords[ph_v].astype(np.uint64)
                ph_cl = np.asarray(phr.lengths)[ph_v].astype(np.int64)
            # entry codewords: (ch, F, parts, max_steps) vectorized
            cls = pw.astype(np.int64)                  # (ch, F, parts)
            act = (((sec[cls] & (1 << s)) != 0) & has[s, cls]
                   & nzmask[:, :, None])
            d = dims[s, cls]                           # (ch, F, parts)
            t = np.arange(max_steps)
            idx = d[..., None] * t                     # (...,max_steps)
            inr = (idx < spp) & act[..., None]
            e = np.take_along_axis(
                entries[s].astype(np.int64),
                np.minimum(idx, spp - 1), axis=-1)
            e = np.maximum(np.where(inr, e, 0), 0)
            ev = cw[s][cls[..., None], e]              # uint64
            el = cl[s][cls[..., None], e]
            # emission order: per chunk: [phrase x ch (s==0)] then per
            # partition in chunk: per channel: its steps
            for c0 in range(nchunks):
                if s == 0:
                    for j in range(ch):
                        add(ph_cw[j, :, c0], ph_cl[j, :, c0],
                            ph_ok[j, :, c0])
                for i in range(c0 * ppw, min((c0 + 1) * ppw, parts)):
                    for j in range(ch):
                        vals.append(ev[j, :, i, :].astype(np.uint64))
                        lens.append(el[j, :, i, :])
                        masks.append(inr[j, :, i, :])
        # concatenate mixed (F,) and (F, max_steps) columns
        vs = [v[:, None] if v.ndim == 1 else v for v in vals]
        ls = [v[:, None] if v.ndim == 1 else v for v in lens]
        ms = [v[:, None] if v.ndim == 1 else v for v in masks]
        return (np.concatenate(vs, 1), np.concatenate(ls, 1),
                np.concatenate(ms, 1))

    def _device_pad(self, pcm_dev):
        """Pad a device-resident (ch, ns) PCM array with the lap
        margins (hop front, 2*hop tail) plus chunk slack, on device."""
        hop = self.n // 2
        CF = self.dev.chunk_packets
        ns = pcm_dev.shape[1]
        F = (ns + 3 * hop - self.n) // hop + 1
        nchunks = (F + CF - 1) // CF
        total = (nchunks - 1) * CF * hop + self.dev.chunk_samples
        tail = total - ns - hop
        return jnp.pad(pcm_dev, ((0, 0), (hop, tail)))

    def _get_slicer(self, dtype, S):
        """One compiled dynamic_slice for chunk extraction from the
        padded device-resident stream."""
        key = (np.dtype(dtype).name,)
        if not hasattr(self, "_slicers"):
            self._slicers = {}
        cs = self.dev.chunk_samples

        if key not in self._slicers:
            @jax.jit
            def slicer(x, s0):
                return jax.lax.dynamic_slice_in_dim(x, s0, cs, axis=1)
            self._slicers[key] = slicer
        return self._slicers[key]



    @staticmethod
    def _write_audio_pages(w, rows_for, sizes, gps, eos_last=True,
                           per_page=16):
        """Emit audio packets onto pages directly (the generic
        OggStreamWriter packetin/lace path costs ~26us/packet in
        Python; this builds each 16-packet page in one pass).  w: an
        OggStreamWriter that already emitted the header pages."""
        import struct

        from ..bitstream.oggfile import ogg_crc
        npkt = len(sizes)
        serialno = w.serialno
        pageno = w.pageno
        pages = w._pages
        i0 = 0
        while i0 < npkt:
            lacing = bytearray()
            body = bytearray()
            hi = i0
            while hi < npkt and hi - i0 < per_page:
                nsz = int(sizes[hi])
                need = nsz // 255 + 1
                if lacing and len(lacing) + need > 255:
                    break                 # lacing table is full
                body += rows_for(hi)
                while nsz >= 255:
                    lacing.append(255)
                    nsz -= 255
                lacing.append(nsz)
                hi += 1
            eos = eos_last and hi == npkt
            htype = 4 if eos else 0
            hdr = struct.pack(
                "<4sBBqIIIB", b"OggS", 0, htype, int(gps[hi - 1]),
                serialno & 0xFFFFFFFF, pageno, 0, len(lacing))
            page = bytearray(hdr + bytes(lacing) + bytes(body))
            crc = ogg_crc(bytes(page))
            page[22:26] = struct.pack("<I", crc)
            pages.append(bytes(page))
            pageno += 1
            i0 = hi
        w.pageno = pageno

    # -- block switching (envelope-driven 256/2048) -----------------------
    def _dev_for(self, W):
        """DeviceFastEncode per block mode (cached)."""
        if W:
            return self.dev
        if self._dev_short is None:
            from ..ops.encdevice import DeviceFastEncode
            self._dev_short = DeviceFastEncode(self, W=0)
        return self._dev_short

    def _gather_step(self, W, B):
        if self._dev_gather is None:
            self._dev_gather = {}
        key = (W, B)
        if key not in self._dev_gather:
            self._dev_gather[key] = jax.jit(
                self._dev_for(W).make_gather_step(B))
        return self._dev_gather[key]

    _ENV_STEPS = 8192        # envelope chunk, in 64-sample steps
    _ENV_HIST = 32           # history overlap (nearDC window + stretch)
    _ENV_NC = 8              # env chunks per dispatch (batch mode)

    def _env_chunk_step(self, NC):
        """Jitted (x64 (ch, R, 64), starts (NC,) int32 row offsets) ->
        (NC, E) bool marks.  Row-gathers envelope chunks from the
        concatenated multi-stream array so one dispatch covers chunks
        of MANY streams (encode_batch's chip-filling envelope pass)."""
        if not hasattr(self, "_env_steps_cache"):
            self._env_steps_cache = {}
        if NC not in self._env_steps_cache:
            from ..ops.jaxdsp import DeviceEnvelope
            env = DeviceEnvelope(self.setup.psy_global, self.ch)
            E = self._ENV_STEPS
            ch = self.ch

            @jax.jit
            def step(x64, starts):
                rows = (starts[:, None]
                        + jnp.arange(E + 1, dtype=jnp.int32)[None, :])
                sl = jnp.take(x64, rows, axis=1)   # (ch, NC, E+1, 64)
                x = sl.reshape(ch, NC, (E + 1) * 64)
                if x.dtype != jnp.float32:
                    x = x.astype(jnp.float32) / np.float32(32768.0)
                return env.marks_nd(x)

            self._env_steps_cache[NC] = step
        return self._env_steps_cache[NC]

    def _envelope_marks_multi(self, x64, metas):
        """Batched envelope pass over the concatenated stream array.
        metas: [(ns, base_row, Si)] per stream (Si >= one envelope
        chunk).  Returns per-stream bool mark arrays."""
        E, H = self._ENV_STEPS, self._ENV_HIST
        plans = []            # (stream, dst_step, lo, take, abs_row)
        for si, (ns, base, Si) in enumerate(metas):
            nsteps = Si // 64 - 1
            s = 0
            while s < nsteps:
                s0 = min(max(0, s - H), max(0, Si // 64 - (E + 1)))
                lo = s - s0
                take = min(E - lo, nsteps - s)
                plans.append((si, s, lo, take, base + s0))
                s += take
        NC = self._ENV_NC
        step = self._env_chunk_step(NC)
        outs = []
        for o in range(0, len(plans), NC):
            grp = plans[o:o + NC]
            st = np.zeros(NC, np.int32)
            st[:len(grp)] = [g[4] for g in grp]
            d = step(x64, jnp.asarray(st))
            d.copy_to_host_async()
            outs.append(d)
        marks = [np.zeros(Si // 64 - 1, bool) for (_, _, Si) in metas]
        for o, d in zip(range(0, len(plans), NC), outs):
            dn = np.asarray(d)
            for j, (si, s, lo, take, _) in enumerate(plans[o:o + NC]):
                marks[si][s:s + take] = dn[j, lo:lo + take]
        return marks

    def _edge_pads(self, pcm, hop, tail, src=None):
        """LPC stream-edge extensions for the lap pads (reference:
        block.c:438-477 pre-extrapolation, 497-537 eof tail): the
        front pad continues the signal BACKWARD (order 16), the tail
        pad FORWARD (order 32, capped at 3 long blocks like the
        reference), so the envelope detector and psy model see a
        smooth lead-in/out instead of zero-pad edges — which read as
        transients and cost short blocks + bits the reference never
        spends.  Returns host arrays in the input dtype.  src: an
        optional (head, tail) pair of already-prefetched edge slices
        (encode_batch issues all streams' edge fetches async before
        draining any, so the tunnel round-trips overlap)."""
        from ..utils.lpc import lpc_extrapolate
        ch, ns = pcm.shape
        n1 = self.n
        w = int(min(ns, 4 * n1))
        if src is not None:
            head = np.asarray(src[0])
            tsrc = np.asarray(src[1])
        else:
            head = np.asarray(pcm[:, :w])
            tsrc = np.asarray(pcm[:, ns - w:])
        dt = np.dtype(str(pcm.dtype))
        i16 = dt == np.int16
        sc = np.float32(1.0 / 32768.0) if i16 else np.float32(1.0)
        front = np.stack([
            lpc_extrapolate(head[c, ::-1].astype(np.float32) * sc,
                            16, hop)[::-1] for c in range(ch)])
        text = int(min(tail, 3 * n1))
        tl = np.stack([
            lpc_extrapolate(tsrc[c].astype(np.float32) * sc, 32, text)
            for c in range(ch)])
        if i16:
            front = np.clip(np.rint(front * 32768.0), -32768, 32767)
            tl = np.clip(np.rint(tl * 32768.0), -32768, 32767)
        tailbuf = np.zeros((ch, tail), dt)
        tailbuf[:, :text] = tl.astype(dt)
        return front.astype(dt), tailbuf

    _RESCUE_PAD = 30     # steps: stretch re-saturates after 24
                         # trigger-free steps, plus mark spill margin

    def _env_obj(self):
        if not hasattr(self, "_env_rescue_obj"):
            from ..ops.jaxdsp import DeviceEnvelope
            self._env_rescue_obj = DeviceEnvelope(
                self.setup.psy_global, self.ch)
        return self._env_rescue_obj

    _RESCUE_G = 128     # clusters per trigger-table dispatch

    def _rescue_trig_step(self, G, Lmax, Lw):
        """Jitted (x64, rows (G, Lmax) i32, nr (G,), ofs (G,)) ->
        (T1, T2) (MAXSTRETCH+1, G, Lw) bool trigger tables, the
        ENTIRE per-cluster envelope replay on device: gather the
        cluster's 64-sample rows, recompute the 12-band amplitudes
        (the same math as DeviceEnvelope.marks_nd), build the
        sliding pre-window extrema for every distinct
        (stretch-window, penalty) combo and compare against the
        pre/post-echo thresholds.  Only these boolean tables cross
        the link (~12 KB/cluster vs the ~32 KB of raw PCM rows the
        round-4 host rescue fetched), and the host walk is left with
        pure boolean indexing.  Reference walk: envelope.c:569-681."""
        if not hasattr(self, "_rescue_trig_cache"):
            self._rescue_trig_cache = {}
        key = (G, Lmax, Lw)
        if key not in self._rescue_trig_cache:
            from ..ops import envelope as ENV
            from ..ops.jaxdsp import mdct_matmul
            from ..utils.scales import todB
            env = self._env_obj()
            gi = self.setup.psy_global
            sp_pen = float(gi["stretch_penalty"])
            pre_t = jnp.asarray(
                np.asarray(gi["preecho_thresh"], np.float32))
            post_t = jnp.asarray(
                np.asarray(gi["postecho_thresh"], np.float32))
            MNS = ENV.VE_MINSTRETCH
            MXS = ENV.VE_MAXSTRETCH
            zpad = MXS + 2
            ch = self.ch
            Lacc = Lmax - 1
            Lp = zpad + Lacc
            w = env.neardc + 1
            Bm = env.Bm
            mwin = env.mdct_win
            minV = env.minV
            f32 = np.float32

            @jax.jit
            def step(x64, rows, nr, ofs):
                sl = jnp.take(x64, rows.reshape(-1), axis=1)
                sl = sl.reshape(ch, G, Lmax, 64)
                if sl.dtype != jnp.float32:
                    sl = sl.astype(jnp.float32) / f32(32768.0)
                # zero rows at/past each cluster's end (the scalar's
                # zero-initialized ampbuf history semantics)
                valid = (jnp.arange(Lmax, dtype=jnp.int32)[None, :]
                         < nr[:, None])
                sl = sl * valid[None, :, :, None]
                frames = jnp.concatenate(
                    [sl[:, :, :-1], sl[:, :, 1:]], -1)
                vec = mdct_matmul(frames * mwin, 128)
                temp = (vec[..., 0] * vec[..., 0]
                        + f32(0.7) * vec[..., 1] * vec[..., 1]
                        + f32(0.2) * vec[..., 2] * vec[..., 2])
                cs = jnp.cumsum(temp, axis=-1)
                winsum = cs - jnp.concatenate(
                    [jnp.zeros(cs.shape[:-1] + (w,)), cs[..., :-w]],
                    -1)
                decay = (todB(winsum * f32(1.0 / w), xp=jnp)
                         * f32(0.5) - f32(15.0))
                pairs = (vec[..., 0::2] * vec[..., 0::2]
                         + vec[..., 1::2] * vec[..., 1::2])[..., :32]
                kk = jnp.arange(32, dtype=jnp.float32)
                d = decay[..., None] - f32(8.0) * kk
                sp = jnp.maximum(jnp.maximum(
                    todB(pairs, xp=jnp) * f32(0.5), d), minV)
                acc = jnp.einsum(
                    "cgsk,kb->cgsb", sp, Bm,
                    precision=jax.lax.Precision.HIGHEST)
                accp = jnp.concatenate(
                    [jnp.zeros((ch, G, zpad, 12), jnp.float32), acc],
                    2)
                pos = jnp.clip(
                    zpad + ofs[:, None]
                    + jnp.arange(Lw, dtype=jnp.int32)[None, :],
                    0, Lp - 1)                        # (G, Lw)
                idx = pos[None, :, :, None]
                take = jnp.take_along_axis
                cur = take(accp, idx, axis=2)
                prv = take(accp, jnp.maximum(idx - 1, 0), axis=2)
                postmax = jnp.maximum(cur, prv)
                postmin = jnp.minimum(cur, prv)
                T1s, T2s = [], []
                combo = {}
                for s2 in range(MXS + 1):
                    su = max(MNS, s2)
                    pen = f32(min(max(sp_pen - (s2 - MNS), 0.0),
                                  sp_pen))
                    ck = (su, float(pen))
                    if ck not in combo:
                        pmx = accp[:, :, :Lp - su + 1]
                        pmn = pmx
                        for s in range(1, su):
                            seg = accp[:, :, s:s + Lp - su + 1]
                            pmx = jnp.maximum(pmx, seg)
                            pmn = jnp.minimum(pmn, seg)
                        pw = jnp.clip(pos - 1 - su, 0, Lp - su)
                        pwi = pw[None, :, :, None]
                        t1 = ((postmax - take(pmx, pwi, axis=2))
                              > (pre_t + pen)).any(-1).any(0)
                        t2 = ((postmin - take(pmn, pwi, axis=2))
                              < (post_t - pen)).any(-1).any(0)
                        combo[ck] = (t1, t2)
                    T1s.append(combo[ck][0])
                    T2s.append(combo[ck][1])

                # bit-pack along the step axis (8 steps/byte, LSB
                # first): the tables cross the throttled tunnel, and
                # 8x fewer bytes is 8x less drain time
                wts = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128],
                                  jnp.uint32)

                def pack(ts):
                    s = jnp.stack(ts).astype(jnp.uint32)
                    s = s.reshape(s.shape[0], s.shape[1],
                                  s.shape[2] // 8, 8)
                    return (s * wts).sum(-1).astype(jnp.uint8)

                return pack(T1s), pack(T2s)

            self._rescue_trig_cache[key] = step
        return self._rescue_trig_cache[key]

    def _rescue_trig_tables(self, x64, jobs):
        """Device trigger tables for a list of rescue jobs: bucket
        clusters by padded row length, dispatch every group before
        draining any (the transfers overlap), and scatter the per-
        group results into (MAXSTRETCH+1, C, Lwmax) host bool arrays
        indexed [stretch//2, cluster, window step]."""
        from ..ops import envelope as ENV
        MXS = ENV.VE_MAXSTRETCH
        R = int(x64.shape[1])
        C = len(jobs)
        nrs = [j[8] for j in jobs]
        wls = [j[5] - j[4] for j in jobs]
        Lwmax = max(wls)

        def bucket(n):
            b = 128
            while b < n:
                b *= 2
            return b

        order = sorted(range(C), key=lambda i: bucket(nrs[i]))
        T1 = np.zeros((MXS + 1, C, Lwmax), bool)
        T2 = np.zeros((MXS + 1, C, Lwmax), bool)
        pend = []
        i = 0
        while i < len(order):
            Lb = bucket(nrs[order[i]])
            grp = [order[i]]
            i += 1
            while (i < len(order) and len(grp) < self._RESCUE_G
                   and bucket(nrs[order[i]]) == Lb):
                grp.append(order[i])
                i += 1
            G = self._RESCUE_G if len(grp) > 8 else 8
            rows = np.zeros((G, Lb), np.int32)
            nr = np.zeros(G, np.int32)
            ofs = np.zeros(G, np.int32)
            for g, ji in enumerate(grp):
                _, _, base, _, w0, _, _, r0, nrj = jobs[ji]
                rows[g, :nrj] = np.minimum(base + r0 + np.arange(nrj),
                                           R - 1)
                nr[g] = nrj
                ofs[g] = w0 - r0
            step = self._rescue_trig_step(G, Lb, Lb)
            d1, d2 = step(x64, jnp.asarray(rows), jnp.asarray(nr),
                          jnp.asarray(ofs))
            d1.copy_to_host_async()
            d2.copy_to_host_async()
            pend.append((grp, d1, d2))
        for grp, d1, d2 in pend:
            h1 = np.unpackbits(np.asarray(d1), axis=-1,
                               bitorder="little")
            h2 = np.unpackbits(np.asarray(d2), axis=-1,
                               bitorder="little")
            for g, ji in enumerate(grp):
                wl = min(wls[ji], h1.shape[2])
                T1[:, ji, :wl] = h1[:, g, :wl]
                T2[:, ji, :wl] = h2[:, g, :wl]
        return T1, T2

    def _stretch_rescue(self, x64, metas, marks):
        """Exact envelope `stretch` hysteresis around candidate marks.

        The batched detector runs at the steady-state stretch and
        penalty (envelope.c's serial feedback would serialize 8k tiny
        steps per chunk), which over-triggers right after an impulse —
        measured ~1.7x the golden encoder's short-block count on
        transient content.  Steady regions (>= 24 trigger-free steps)
        ARE exact, and any trigger is itself a steady-state candidate,
        so only candidate neighborhoods need fixing: dilate candidate
        clusters, replay the per-(stretch, penalty) trigger decisions
        ON DEVICE (_rescue_trig_tables: gather the cluster rows,
        recompute the 12-band amplitudes, sliding pre-window extrema
        and threshold compares — only boolean trigger tables cross
        the link), then advance the reference's serial walk
        (_ve_envelope_search: stretch grows to 2*VE_MAXSTRETCH,
        resets on a pre-echo trigger; the pre-window and penalty
        follow stretch//2) over the tables, replacing the marks.

        The walk runs LOCKSTEP-VECTORIZED across clusters
        (_rescue_walk_batch): only the per-step stretch counter is
        serial state, so all clusters advance together through one
        boolean-indexing state machine — on click-dense content this
        turns thousands of per-cluster Python walks into ~60 vector
        steps, and no PCM or band-amplitude data ever reaches the
        host.  Clusters whose stretch state leaks past the window end
        (a trigger within SMAX+2 steps of it) take the per-cluster
        serial path with window extension (_rescue_cluster_serial),
        interleaved in job order so overlapping extended windows
        overwrite exactly like the all-serial walk did."""
        PAD = self._RESCUE_PAD
        K_long = 3 * (self.n // 4) + self.vi.blocksizes[0] // 4
        lead = 17 + 14       # nearDC window + pre-window lead-in

        # --- phase 1: cluster discovery across ALL streams
        jobs = []
        for (ns, base, Si), mk in zip(metas, marks):
            nst = len(mk)
            # marks past the schedule's look-ahead horizon (tail pad
            # territory) can't change any block decision
            reach = min(nst,
                        (self.n // 2 + ns + K_long) // 64 + PAD)
            cand = np.flatnonzero(mk[:reach])
            if not len(cand):
                continue
            clusters = []
            a = b = int(cand[0])
            for c in cand[1:]:
                if c - b <= 2 * PAD:
                    b = int(c)
                else:
                    clusters.append((a, b))
                    a = b = int(c)
            clusters.append((a, b))
            for a, b in clusters:
                w0 = max(0, a - PAD)
                w1 = min(nst, b + PAD)
                r0 = max(0, w0 - lead)
                rhi = min(Si // 64, w1 + 2)
                jobs.append([mk, nst, base, Si, w0, w1, b, r0,
                             rhi - r0])
        if not jobs:
            return
        T1, T2 = self._rescue_trig_tables(x64, jobs)

        if getattr(self, "_rescue_force_serial", False):
            # test hook: the all-serial walk the lockstep batch is
            # held bitwise-equal to (tests/test_fastenc.py)
            for ci, job in enumerate(jobs):
                self._rescue_cluster_serial(
                    x64, job, T1[:, ci], T2[:, ci])
            return

        # --- phase 2: lockstep walk over every cluster at once
        newmk, retrig = self._rescue_walk_batch(T1, T2, jobs)
        for ci, job in enumerate(jobs):
            mk, nst, w0, w1 = job[0], job[1], job[4], job[5]
            if retrig[ci] and w1 < nst:
                # stretch state leaks past the window end: replay
                # this cluster serially with window extension
                self._rescue_cluster_serial(
                    x64, job, T1[:, ci], T2[:, ci])
                continue
            wl = w1 - w0
            mk[w0:w1] = newmk[ci, :wl]
            if w1 < nst and newmk[ci, wl]:
                mk[w1] = True

    def _rescue_walk_batch(self, T1, T2, jobs):
        """Vectorized phase 2 of _stretch_rescue: the serial stretch
        state machine advanced in lockstep across the cluster axis
        over the device-built trigger tables (_rescue_trig_tables).
        Only the per-step stretch counter is serial state, and every
        per-step decision is a boolean table lookup, so the host does
        ~60 vector steps of pure indexing.  Returns (newmk (C, Lw+2)
        bool, retrig (C,) bool); marks are written by the caller (or
        the serial fallback for retrig clusters).  Bitwise-identical
        decisions to _rescue_cluster_serial's walk
        (tests/test_fastenc.py rescue equivalence test)."""
        from ..ops import envelope as ENV
        from .. import native
        SMAX = 2 * ENV.VE_MAXSTRETCH
        C = len(jobs)
        wlen = np.asarray([j[5] - j[4] for j in jobs])  # w1 - w0
        Lw = T1.shape[2]

        # native table scan when available: giant merged clusters on
        # click-dense content make Lw tens of thousands of steps, and
        # the numpy lockstep pays ~40 us/step in fancy-indexing
        # overhead the C loop doesn't
        res = native.rescue_walk(T1, T2, wlen, SMAX)
        if res is not None:
            return res

        # lockstep serial walk: stretch is the only cross-step state
        cidx = np.arange(C)
        newmk = np.zeros((C, Lw + 2), bool)
        stretch = np.full(C, SMAX, np.int64)
        retrig = np.zeros(C, bool)
        for k in range(Lw):
            act = k < wlen
            stretch = np.minimum(stretch + 1, SMAX)
            s2 = stretch >> 1
            t1 = T1[s2, cidx, k] & act
            t2 = T2[s2, cidx, k] & act
            newmk[:, k] |= t1 | t2
            newmk[:, k + 1] |= t1
            if k > 0:
                newmk[:, k - 1] |= t2
            retrig |= t1 & (k >= wlen - (SMAX + 2))
            stretch = np.where(t1, -1, stretch)
        return newmk, retrig

    def _rescue_cluster_serial(self, x64, job, T1c, T2c):
        """The per-cluster reference walk (window extends while a
        trigger lands within SMAX+2 steps of its end): the exact
        serial replay of _ve_envelope_search over one cluster, over
        the SAME device-built trigger tables as the lockstep batch
        (T1c/T2c: (VE_MAXSTRETCH+1, >= w1-w0) bool, indexed
        [stretch//2, window step])."""
        from ..ops import envelope as ENV
        PAD = self._RESCUE_PAD
        SMAX = 2 * ENV.VE_MAXSTRETCH
        while True:
            mk, nst, _, Si, w0, w1 = job[:6]
            newmk = np.zeros(w1 - w0 + 2, bool)
            stretch = SMAX
            retrig_tail = False
            for j in range(w0, w1):
                stretch = min(stretch + 1, SMAX)
                s2 = stretch >> 1
                k = j - w0
                if T1c[s2, k]:
                    newmk[k] = True
                    newmk[k + 1] = True
                if T2c[s2, k]:
                    newmk[k] = True
                    if k > 0:
                        newmk[k - 1] = True
                if T1c[s2, k]:
                    stretch = -1
                    if j >= w1 - (SMAX + 2):
                        retrig_tail = True
            if retrig_tail and w1 < nst:
                # trigger near the window end: stretch state leaks —
                # extend the window and rebuild this cluster's tables
                # on device (same math as the batch pass)
                b = w1 + PAD
                job[5] = w1 = min(nst, b + PAD)
                job[6] = b
                job[8] = min(Si // 64, w1 + 2) - job[7]
                Tn1, Tn2 = self._rescue_trig_tables(x64, [job])
                T1c, T2c = Tn1[:, 0], Tn2[:, 0]
                continue
            mk[w0:w1] = newmk[:w1 - w0]
            if w1 < nst and newmk[w1 - w0]:
                mk[w1] = True
            break


    def _schedule(self, marks, ns):
        """Envelope marks -> block schedule, replicating the reference
        blockout / envelope_search state machine (block.c:557-812,
        envelope.c:569-735): W starts 0, a persistent scan cursor
        walks the mark array, a mark strictly after the current center
        and before testW = center + bs[W]/4 + bs[1]/2 + bs[0]/4 makes
        the NEXT block short, and the SAME mark keeps blocks short
        until the center passes it (the cursor only moves forward).
        The impulse flag mirrors envelope_mark (span marks or the
        consumed curmark).  Returns (centers, Ws, impulse) in
        padded-stream coordinates (front pad = hop).

        Mark-free long-long stretches bulk-emit arithmetically — the
        next block is long exactly while center <= next_mark - K — so
        scheduling costs O(marks), not O(blocks)."""
        n1 = self.n
        n0 = self.vi.blocksizes[0]
        bs = (n0, n1)
        hop = n1 // 2
        marks = np.asarray(marks, bool)
        nmk = len(marks)
        end_c = hop + ns
        if n0 == n1:
            # single-blocksize template: one mode; keep the "main"
            # label the batched pipeline keys on
            k = (end_c - 1 - hop) // hop + 1
            cs = hop + hop * np.arange(k + 1, dtype=np.int64)
            return (cs, np.ones(k + 1, np.int64),
                    np.zeros(k + 1, bool))
        from .. import native
        res = native.schedule(marks, ns, n0, n1)
        if res is not None:
            # native blockout state machine (vn_schedule), equal to
            # the Python walk below (tests/test_fastenc.py)
            return res
        mpos = np.flatnonzero(marks).astype(np.int64) * 64
        mc = np.concatenate([[0], np.cumsum(marks.astype(np.int64))])
        limit = 64 * nmk
        K_long = 3 * (n1 // 4) + n0 // 4

        def anymark(b_abs, e_abs):
            b = max(0, min(b_abs // 64, nmk))
            e = max(0, min((e_abs + 63) // 64, nmk))
            return e > b and mc[e] > mc[b]

        segs_c, segs_W, segs_I = [], [], []
        centerW = hop
        W = 0                      # _vds_shared_init starts W=0
        cursor = hop               # EnvelopeLookup: blocksizes[1]//2
        curmark = 0
        one = np.ones(1, np.int64)
        while True:
            # bulk: long steady state with the next mark out of reach
            if W == 1 and centerW < end_c:
                j0 = max(cursor, centerW + 64)
                mi = int(np.searchsorted(mpos, j0))
                m_abs = int(mpos[mi]) if mi < len(mpos) else None
                cap = (m_abs if m_abs is not None else limit) - K_long
                cap = min(cap, end_c - 1)
                if cap >= centerW + hop:
                    k = (cap - centerW) // hop + 1
                    arr = centerW + hop * np.arange(k, dtype=np.int64)
                    segs_c.append(arr)
                    segs_W.append(np.ones(k, np.int64))
                    segs_I.append(np.zeros(k, bool))
                    last_testW = int(arr[-1]) + K_long
                    cursor = max(cursor,
                                 ((last_testW - 1) // 64) * 64)
                    centerW = int(arr[-1]) + hop
                    continue
            # serial: envelope_search in absolute coordinates
            testW = centerW + bs[W] // 4 + n1 // 2 + n0 // 4
            mi = int(np.searchsorted(mpos, cursor))
            m_abs = None
            while mi < len(mpos):
                if mpos[mi] > centerW:
                    m_abs = int(mpos[mi])
                    break
                mi += 1
            if m_abs is not None and m_abs < testW:
                bp = 0
                cursor = m_abs
                curmark = m_abs
            elif testW <= limit:
                bp = 1
                cursor = max(cursor, ((testW - 1) // 64) * 64)
            else:
                bp = -1            # end of analyzable data -> short
                cursor = max(cursor, ((limit - 1) // 64) * 64)
            nW = 1 if bp == 1 else 0
            if W == 0:
                b0 = centerW - n0 // 4 - n0 // 4
                e0 = centerW + n0 // 4 + n0 // 4
                imp = anymark(b0, e0) or (b0 <= curmark < e0)
            else:
                imp = False
            segs_c.append(np.array([centerW], np.int64))
            segs_W.append(one * W)
            segs_I.append(np.array([imp]))
            if centerW >= end_c:
                break
            centerW = centerW + bs[W] // 4 + bs[nW] // 4
            W = nW
        return (np.concatenate(segs_c), np.concatenate(segs_W),
                np.concatenate(segs_I))

    # -- stateful two-phase pipeline --------------------------------------
    def _probe_step(self, W, B):
        if not hasattr(self, "_probe_cache"):
            self._probe_cache = {}
        key = (W, B)
        if key not in self._probe_cache:
            n2L = self.n // 2
            self._probe_cache[key] = jax.jit(
                self._dev_for(W).make_probe_step(B, n2L))
        return self._probe_cache[key]

    def _finish_step(self, W, B, wb=None):
        if not hasattr(self, "_finish_cache"):
            self._finish_cache = {}
        key = (W, B, wb)
        if key not in self._finish_cache:
            self._finish_cache[key] = jax.jit(
                self._dev_for(W).make_finish_step(B, wb))
        return self._finish_cache[key]

    @staticmethod
    def _host_compact(pkb, sizes):
        """Concatenate the used prefixes of padded packet rows into
        (blob, off): one dense byte buffer + exclusive byte offsets.
        ~0.2x wb bytes actually copy, and downstream (Ogg paging)
        reads packets by offset with no per-row padding math.
        (A device-side compaction was tried and measured 3-8x slower
        than the plain padded-row transfer on the axon tunnel — the
        searchsorted/gather graph dominates; this host memcpy is ~1 ms
        per 1024-frame batch.)"""
        off = np.cumsum(sizes) - sizes
        total = int(off[-1] + sizes[-1]) if len(sizes) else 0
        blob = np.empty(total, np.uint8)
        for i in range(len(sizes)):
            blob[off[i]:off[i] + sizes[i]] = pkb[i, :sizes[i]]
        return blob, off

    @staticmethod
    def _pad_to(a, B, fill=0):
        if len(a) >= B:
            return np.asarray(a)
        return np.concatenate(
            [np.asarray(a),
             np.full((B - len(a),) + np.shape(a)[1:], fill,
                     np.asarray(a).dtype)])

    def _run_two_phase(self, x64, per, B_long, B_short,
                       managed=False):
        """The cross-frame-state encode: probe pass -> host scalar
        recurrences -> finish pass.  per: per-stream dicts from
        encode_batch (cs, Ws, impulse, li, si, lofs, sofs, starts,
        wid).  Returns ((blob, off, nbits) longs, (blob, off, nbits)
        shorts): packet i's bytes are blob[off[i]:off[i] +
        ((nbits[i]+7)>>3)] — same contract as the stateless gather
        runner.

        managed=True keeps the SAME probe pass and host recurrences
        (with set_m3p's managed noise_rate reduction) but finishes
        through the 15-packetblob steps, returning the undrained
        ((pend_long, B_long), (pend_short, B_short)) lists — each
        entry (bi, pk_dev (B, 15, wb), nb_dev, lastm, m3v, fstate,
        probe_outs) — for the reservoir/gather stage
        (_encode_managed_switched)."""
        from ..ops import psydevice as PD
        ch = self.ch
        n2L = self.n // 2
        hsrate = self.rate >= 26000

        # --- per-stream annotations (batched across streams) +
        # per-frame probe metadata
        S = len(per)
        Fmax = max(len(r["Ws"]) for r in per)
        Ws_p = np.ones((S, Fmax), np.int64)
        imp_p = np.zeros((S, Fmax), bool)
        for sidx, rec in enumerate(per):
            F = len(rec["Ws"])
            Ws_p[sidx, :F] = rec["Ws"]
            imp_p[sidx, :F] = rec["impulse"]
        ann_nd = PD.annotate_frames_nd(Ws_p, imp_p)
        anns = []
        for sidx, rec in enumerate(per):
            F = len(rec["Ws"])
            ann = {k: v[sidx, :F] for k, v in ann_nd.items()}
            anns.append(ann)
            rec["ann"] = ann
        # lmode per frame: how THIS frame's logmdct resamples into its
        # successor's lastmdct (psy.c:4462-4501)
        gl_lm, gs_lm = [], []
        gl_tr = []
        for rec, ann in zip(per, anns):
            Ws = rec["Ws"]
            lmode = np.where(Ws == 1, np.where(ann["nW"] == 0, 2, 0),
                             np.where(ann["nW"] == 1, 1, 0))
            gl_lm.append(lmode[rec["li"]])
            gs_lm.append(lmode[rec["si"]])
            gl_tr.append(ann["bm"][rec["li"]] == 2)
        cat = (lambda lst, dt: np.concatenate(lst).astype(dt)
               if lst else np.zeros(0, dt))
        lm_l = cat(gl_lm, np.int32)
        lm_s = cat(gs_lm, np.int32)
        tr_l = cat(gl_tr, bool)

        # --- phase A: probe all batches (longs then shorts)
        def run_probe(W, starts, wids, lmodes, B):
            devW = self._dev_for(W)
            step = self._probe_step(W, B)
            outs = []
            F = len(starts)
            for b in range(0, max(F, 1), B):
                sl = self._pad_to(starts[b:b + B], B)
                wd = self._pad_to(
                    wids[b:b + B] if wids is not None
                    else np.zeros(min(B, max(F - b, 1)), np.int64),
                    B, 3)
                lmd = self._pad_to(lmodes[b:b + B], B)
                o = step(x64, jnp.asarray(
                    np.stack([sl, wd, lmd]).astype(np.int32)))
                for a in o[6:]:
                    a.copy_to_host_async()
                outs.append(o)
            return outs

        import time as _time
        prof = self.last_profile = {}
        _t0 = _time.perf_counter()
        st_l = np.concatenate([r["starts"][r["li"]] for r in per]) \
            if any(len(r["li"]) for r in per) else np.zeros(0, np.int64)
        wd_l = np.concatenate([r["wid"][r["li"]] for r in per]) \
            if any(len(r["li"]) for r in per) else None
        st_s = np.concatenate([r["starts"][r["si"]] for r in per]) \
            if any(len(r["si"]) for r in per) else np.zeros(0, np.int64)
        pa_l = run_probe(1, st_l, wd_l, lm_l, B_long)
        pa_s = run_probe(0, st_s, None, lm_s, B_short) if len(st_s) \
            else []
        prof["probe_dispatch"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # --- host mid-pass: scalar recurrences in stream order
        def fetch(outs, idx):
            if not outs:
                return np.zeros(0, np.float32)
            return np.concatenate([np.asarray(o[idx]) for o in outs])

        lam_l, hi_l = fetch(pa_l, 6), fetch(pa_l, 7)
        up_l, un_l = fetch(pa_l, 8), fetch(pa_l, 9)
        lam_s = fetch(pa_s, 6)
        prof["probe_wait"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        nlong = len(st_l)
        nshort = len(st_s)
        NLrows = len(pa_l) * B_long * ch
        zrow = NLrows + len(pa_s) * B_short * ch

        look_mnt = []
        for bt in range(4):
            bi = min(bt, len(self.setup.psy_params) - 1)
            pv = self.setup.psy_params[bi]
            mv = self.analysis.look.m_val
            look_mnt.append((mv, float(pv.get("normal_thresh", 1.0))))

        amp_l = np.full(nlong, -9999.0, np.float32)
        amp_s = np.full(nshort, -9999.0, np.float32)
        lc_l = np.full(nlong * ch, -1.0, np.float32)
        lc_s = np.full(nshort * ch, -1.0, np.float32)
        po_l = np.full(nlong * ch, -1.0, np.float32)
        prev_l = np.full(nlong * ch, zrow, np.int64)
        prev_s = np.full(nshort * ch, zrow, np.int64)
        m3_fields = dict(sw=np.zeros(nshort, bool),
                         noise_rate=np.zeros(nshort, np.float32),
                         noise_center=np.zeros(nshort, np.float32),
                         tone_rate=np.zeros(nshort, np.float32),
                         reset=np.zeros(nshort, bool),
                         impad_zero=np.ones(nshort, bool))
        toneatt1 = float(self.analysis.look.vi["tone_masteratt"][1])

        # padded (S, Fmax) / (S, ch, Fmax) layouts so ONE vectorized
        # recurrence covers every stream (ampmax/lowcomp lanes evolve
        # independently; pad frames trail the real ones and are never
        # read back)
        lam_p = np.full((S, Fmax), -9999.0, np.float32)
        hi_p = np.zeros((S, ch, Fmax), np.float32)
        up_p = np.zeros((S, ch, Fmax), np.float32)
        un_p = np.zeros((S, ch, Fmax), np.float32)
        gls, gss = [], []
        for sidx, (rec, ann) in enumerate(zip(per, anns)):
            li, si = rec["li"], rec["si"]
            lofs, sofs = rec["lofs"], rec["sofs"]
            F = len(rec["Ws"])
            # global row index per (frame, ch)
            rowf = np.empty((F, ch), np.int64)
            gl = lofs + np.arange(len(li))
            gs = sofs + np.arange(len(si))
            gls.append(gl)
            gss.append(gs)
            for c in range(ch):
                rowf[li, c] = gl * ch + c
                rowf[si, c] = NLrows + gs * ch + c
            prev = np.concatenate([[[zrow] * ch], rowf[:-1]])
            for c in range(ch):
                prev_l[gl * ch + c] = prev[li, c]
                prev_s[gs * ch + c] = prev[si, c]
            # lam per frame = max over channels
            lamf = np.empty(F, np.float32)
            lamf[li] = np.max(
                lam_l[(gl * ch)[:, None] + np.arange(ch)], -1) \
                if len(li) else 0
            if len(si):
                lamf[si] = np.max(
                    lam_s[(gs * ch)[:, None] + np.arange(ch)], -1)
            lam_p[sidx, :F] = lamf
            for c in range(ch):
                if len(li):
                    hi_p[sidx, c, li] = hi_l[gl * ch + c]
                    up_p[sidx, c, li] = up_l[gl * ch + c]
                    un_p[sidx, c, li] = un_l[gl * ch + c]
        amp_all = PD.ampmax_seq_nd(
            lam_p, Ws_p, self.vi.blocksizes, self.rate,
            self.setup.psy_global["ampmax_att_per_sec"])
        bm_r = np.repeat(ann_nd["bm"], ch, 0)        # (S*ch, Fmax)
        lWbm_r = np.repeat(ann_nd["lW_bm"], ch, 0)
        lc_all = PD.lowcomp_seq_nd(hi_p.reshape(S * ch, Fmax),
                                   bm_r, lWbm_r, look_mnt)
        po_all = PD.poste_seq(up_p.reshape(S * ch, Fmax),
                              un_p.reshape(S * ch, Fmax),
                              {"bm": bm_r, "lW_bm": lWbm_r}, self.n)
        for sidx, rec in enumerate(per):
            li, si = rec["li"], rec["si"]
            gl, gs = gls[sidx], gss[sidx]
            amp_l[gl] = amp_all[sidx, li]
            amp_s[gs] = amp_all[sidx, si]
            for c in range(ch):
                r = sidx * ch + c
                lc_l[gl * ch + c] = lc_all[r, li]
                lc_s[gs * ch + c] = lc_all[r, si]
                po_l[gl * ch + c] = po_all[r, li]
        # M3 params for all streams' short frames (global short order
        # IS stream order: gs = sofs + arange)
        if nshort and hsrate:
            sub = {k: np.concatenate(
                [a[k][r["si"]] for a, r in zip(anns, per)])
                for k in ("bm", "lW_bm", "lW_no", "impadnum")}
            pr = PD.m3_param_seq(sub, self.vi.blocksizes[0] // 2,
                                 toneatt1, True, managed=managed)
            m3_fields["sw"] = pr["sw"]
            m3_fields["noise_rate"] = pr["noise_rate"]
            m3_fields["noise_center"] = pr["noise_center"]
            m3_fields["tone_rate"] = pr["tone_rate"]
            m3_fields["reset"] = pr["reset"]
            m3_fields["impad_zero"] = sub["impadnum"] == 0

        # --- the global lastmdct-contribution buffer
        Ls = [o[5] for o in pa_l] + [o[5] for o in pa_s] \
            + [jnp.zeros((1, n2L), jnp.float32)]
        L_all = jnp.concatenate(Ls, 0) if len(Ls) > 1 else Ls[0]

        # --- phase B: finish all batches
        def run_finish(W, outs, B, amp, lc, po, tr, prevrows, wids,
                       m3):
            devW = self._dev_for(W)
            step = (self._managed_finish_step(W, B) if managed
                    else self._finish_step(W, B))
            wb = devW.plan.wb
            pend = []
            for bi, o in enumerate(outs):
                s = slice(bi * B, (bi + 1) * B)
                sr = slice(bi * B * ch, (bi + 1) * B * ch)
                lastm = (jnp.take(L_all, jnp.asarray(
                    self._pad_to(prevrows[sr], B * ch, zrow)
                    .astype(np.int32)), axis=0)
                    if (hsrate and W == 1) or (W == 0 and m3
                                               is not None)
                    else jnp.zeros((B * ch, n2L), jnp.float32))
                m3v = None
                if W == 0 and m3 is not None:
                    m3v = jnp.asarray(np.stack(
                        [self._pad_to(m3[k][s], B).astype(np.float32)
                         for k in ("sw", "noise_rate", "noise_center",
                                   "tone_rate", "reset",
                                   "impad_zero")]))
                wd = self._pad_to(
                    wids[s] if wids is not None
                    else np.zeros(B, np.int64), B, 3)
                fstate = jnp.asarray(np.concatenate([
                    self._pad_to(amp[s], B, -9999.0)
                    .astype(np.float32),
                    self._pad_to(lc[sr], B * ch, -1.0)
                    .astype(np.float32),
                    self._pad_to(po[sr], B * ch, -1.0)
                    .astype(np.float32),
                    (self._pad_to(tr[s], B, False) if tr is not None
                     else np.zeros(B, bool)).astype(np.float32),
                    wd.astype(np.float32)]))
                pk, nb = step(o[0], o[1], o[2], o[3], o[4], lastm,
                              o[6], fstate, m3v)
                if managed:
                    # keep the 15-blob packets on device; the
                    # reservoir/gather stage fetches 1/15th later
                    nb.copy_to_host_async()
                    pend.append((bi, pk, nb, lastm, m3v, fstate, o))
                    continue
                pk.copy_to_host_async()
                nb.copy_to_host_async()
                pend.append((bi, pk, nb, lastm, m3v, fstate))
            if managed:
                return pend
            # drain + oversized redo; host-compact each batch's rows
            # into the dense (blob, off) form downstream reads
            blobs, offs, nbs = [], [], []
            base = 0
            for bi, pk, nb, lastm, m3v, fstate in pend:
                nbb = np.asarray(nb)
                if (nbb > wb * 8).any():
                    big = self._finish_step(W, B,
                                            devW.plan.worst_bytes)
                    o = outs[bi]
                    pk, nb = big(o[0], o[1], o[2], o[3], o[4],
                                 lastm, o[6], fstate, m3v)
                    nbb = np.asarray(nb)
                blob_b, off_b = self._host_compact(
                    np.asarray(pk), (nbb + 7) >> 3)
                blobs.append(blob_b)
                offs.append(off_b + base)
                nbs.append(nbb)
                base += len(blob_b)
            F = len(amp)
            if not blobs:
                return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                        np.zeros(0, np.int64))
            return (np.concatenate(blobs),
                    np.concatenate(offs)[:F],
                    np.concatenate(nbs)[:F])

        prof["host_midpass"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        res_l = run_finish(1, pa_l, B_long, amp_l, lc_l,
                           po_l, tr_l, prev_l, wd_l, None)
        if nshort:
            # per-frame blocktype flag for shorts: padding (bm==1)
            # selects the alternate noise-bias curve
            pad_s = np.concatenate(
                [a["bm"][r["si"]] for a, r in zip(anns, per)]) == 1
            res_s = run_finish(
                0, pa_s, B_short, amp_s, lc_s,
                np.full(nshort * ch, -1.0, np.float32), pad_s, prev_s,
                None, m3_fields if hsrate else None)
        elif managed:
            res_s = []
        else:
            res_s = (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                     np.zeros(0, np.int64))
        prof["finish"] = _time.perf_counter() - _t0
        if managed:
            return (res_l, B_long), (res_s, B_short)
        return res_l, res_s

    def _run_gather_batches(self, W, x64d, starts, wids, B=1024):
        """Run the mode-W gather step over all frames (padded to B per
        dispatch); returns (blob uint8, off (F,) byte offsets,
        nbits (F,)) — packet i is blob[off[i]:off[i] +
        ((nbits[i]+7)>>3)]."""
        devW = self._dev_for(W)
        step = self._gather_step(W, B)
        F = len(starts)
        pend = []
        for b in range(0, max(F, 1), B):
            sl = starts[b:b + B]
            wd = wids[b:b + B] if wids is not None else None
            if len(sl) < B:
                sl = np.concatenate([sl, np.zeros(B - len(sl), np.int64)])
                if wd is not None:
                    wd = np.concatenate(
                        [wd, np.full(B - len(wd), 3, np.int64)])
            wdj = jnp.asarray((wd if wd is not None
                               else np.zeros(B)).astype(np.int32))
            pk, nb = step(x64d, jnp.asarray(sl.astype(np.int32)), wdj)
            pk.copy_to_host_async()
            nb.copy_to_host_async()
            pend.append((pk, nb))
        wb = devW.plan.wb
        blobs, offs, nbs = [], [], []
        base = 0
        for bi, (pk, nb) in enumerate(pend):
            nbb = np.asarray(nb)
            if (nbb > wb * 8).any():
                # oversized packet: redo this batch at the static
                # worst-case byte budget
                big = jax.jit(devW.make_gather_step(
                    B, devW.plan.worst_bytes))
                sl = starts[bi * B:bi * B + B]
                wd = wids[bi * B:bi * B + B] if wids is not None else None
                if len(sl) < B:
                    sl = np.concatenate(
                        [sl, np.zeros(B - len(sl), np.int64)])
                    if wd is not None:
                        wd = np.concatenate(
                            [wd, np.full(B - len(wd), 3, np.int64)])
                wdj = jnp.asarray((wd if wd is not None
                                   else np.zeros(B)).astype(np.int32))
                pk, nb = big(x64d, jnp.asarray(sl.astype(np.int32)),
                             wdj)
                nbb = np.asarray(nb)
            blob_b, off_b = self._host_compact(
                np.asarray(pk), (nbb + 7) >> 3)
            blobs.append(blob_b)
            offs.append(off_b + base)
            nbs.append(nbb)
            base += len(blob_b)
        if not blobs:
            return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                    np.zeros(0, np.int64))
        return (np.concatenate(blobs), np.concatenate(offs)[:F],
                np.concatenate(nbs)[:F])

    def _encode_switched(self, pcm, serialno, comments):
        return self.encode_batch([pcm], [serialno], comments,
                                 switching=True, B_long=1024)[0]

    def encode_batch(self, pcms, serialnos=None, comments=None,
                     switching=None, B_long=2048, B_short=256):
        """Encode S independent streams through ONE device pipeline.

        The chip-filling entry point behind the batched >500x
        throughput target (BASELINE.md north star): all streams'
        frames ride the same compiled gather steps — envelope chunks,
        long blocks, and short blocks each batch ACROSS streams — so
        device occupancy no longer depends on single-stream length,
        and the host does only per-stream Ogg paging (overlapped with
        device compute via async fetches).

        pcms: list of (ch, ns) int16/float32 arrays, host or
        device-resident; lengths may differ.  Returns a list of Ogg
        byte strings (one per stream)."""
        sw = self.switching if switching is None else switching
        if serialnos is None:
            serialnos = [778 + i for i in range(len(pcms))]
        x64, per = self._prepare_switched(pcms, sw)
        nshort = sum(len(r["si"]) for r in per)
        gl_st = [r["starts"][r["li"]] for r in per]
        gl_wd = [r["wid"][r["li"]] for r in per]
        gs_st = [r["starts"][r["si"]] for r in per]

        # 4) the batched device pipelines, ALL streams together
        if self.psy_state:
            (bl_l, of_l, nb_l), (bl_s, of_s, nb_s) = \
                self._run_two_phase(x64, per, B_long, B_short)
        else:
            bl_l, of_l, nb_l = self._run_gather_batches(
                1, x64, np.concatenate(gl_st) if gl_st else
                np.zeros(0, np.int64),
                np.concatenate(gl_wd) if gl_wd else None, B=B_long)
            if nshort:
                bl_s, of_s, nb_s = self._run_gather_batches(
                    0, x64, np.concatenate(gs_st), None, B=B_short)
            else:
                bl_s = np.zeros(0, np.uint8)
                of_s = np.zeros(0, np.int64)
                nb_s = np.zeros(0, np.int64)

        # 5) per-stream Ogg paging
        outs = []
        for rec, serialno in zip(per, serialnos):
            sizes = np.empty(len(rec["cs"]), np.int64)
            rows = rec["rows"]
            li, si = rec["li"], rec["si"]
            sizes[li] = (nb_l[rows[li]] + 7) >> 3
            if len(si):
                sizes[si] = (nb_s[rows[si]] + 7) >> 3
            ilk = np.zeros(len(rec["cs"]), np.int64)
            ilk[li] = of_l[rows[li]]
            if len(si):
                ilk[si] = of_s[rows[si]]
            outs.append(self._page_stream(rec, serialno, comments,
                                          bl_l, bl_s, ilk, sizes))
        return outs

    def _prepare_switched(self, pcms, sw):
        """encode_batch steps 1-3 (shared with the managed switched
        pipeline): concatenated padded 64-row device layout, batched
        envelope marks + exact stretch rescue, per-stream block
        schedules.  Returns (x64, per) where each per-stream record
        carries cs/Ws/li/si/starts/wid/impulse/rows and the global
        long/short offsets."""
        ch = self.ch
        hop = self.n // 2
        n0 = self.vi.blocksizes[0]
        # 1) concatenated padded 64-sample-row layout (per-stream
        # front/tail pads keep gathers from ever crossing streams)
        minS = (self._ENV_STEPS + 1) * 64 if sw else 0
        # prefetch every device-resident stream's edge slices BEFORE
        # draining any: the per-stream LPC pads then cost one
        # overlapped transfer wave instead of 2 round-trips each
        edge_srcs = []
        for pcm in pcms:
            if isinstance(pcm, jax.Array):
                ns = int(pcm.shape[1])
                w = int(min(ns, 4 * self.n))
                h = pcm[:, :w]
                t = pcm[:, ns - w:]
                h.copy_to_host_async()
                t.copy_to_host_async()
                edge_srcs.append((h, t))
            else:
                edge_srcs.append(None)
        metas, parts = [], []
        base = 0
        for pcm, esrc in zip(pcms, edge_srcs):
            assert pcm.shape[0] == ch
            ns = int(pcm.shape[1])
            Si = ((ns + hop + 4 * hop + 63) // 64) * 64 + 64
            Si = max(Si, minS)
            tail = Si - ns - hop
            if isinstance(pcm, jax.Array):
                front, tailbuf = self._edge_pads(pcm, hop, tail,
                                                 src=esrc)
                xd = jnp.concatenate(
                    [jax.device_put(front), pcm,
                     jax.device_put(tailbuf)], 1)
            else:
                if pcm.dtype != np.int16:
                    pcm = pcm.astype(np.float32, copy=False)
                front, tailbuf = self._edge_pads(pcm, hop, tail)
                # ship the big PCM body as-is (no host-side
                # concatenate copy) and join on device: each stream's
                # H2D dispatches async here, so later streams'
                # transfers overlap earlier streams' envelope compute
                xd = jnp.concatenate(
                    [jax.device_put(front), jax.device_put(pcm),
                     jax.device_put(tailbuf)], 1)
            parts.append(xd.reshape(ch, Si // 64, 64))
            metas.append((ns, base, Si))
            base += Si // 64
        if len({p.dtype for p in parts}) > 1:
            # mixed int16/float32 inputs: promote to the f32 domain the
            # gather step would produce anyway (x/32768)
            parts = [p.astype(jnp.float32) / np.float32(32768.0)
                     if p.dtype != jnp.float32 else p for p in parts]
        x64 = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)

        # 2) envelope marks (all streams batched) + exact-stretch
        # rescue around candidate clusters
        if sw:
            marks = self._envelope_marks_multi(x64, metas)
            self._stretch_rescue(x64, metas, marks)
        else:
            marks = [np.zeros(Si // 64 - 1, bool)
                     for (_, _, Si) in metas]

        # 3) per-stream block schedule -> global frame lists
        per = []
        nlong = nshort = 0
        for (ns, brow, Si), mk in zip(metas, marks):
            cs, Ws, impulse = self._schedule(mk, ns)
            lW = np.concatenate([[1], Ws[:-1]])
            nW = np.concatenate([Ws[1:], [Ws[-1]]])
            bsz = np.where(Ws == 1, self.n, n0)
            starts = cs - bsz // 2 + brow * 64
            wid = (lW * 2 + nW).astype(np.int64)
            li = np.where(Ws == 1)[0]
            si = np.where(Ws == 0)[0]
            rows = np.zeros(len(cs), np.int64)   # global packet rows
            rows[li] = nlong + np.arange(len(li))
            rows[si] = nshort + np.arange(len(si))
            per.append(dict(cs=cs, Ws=Ws, li=li, si=si, ns=ns,
                            lofs=nlong, sofs=nshort, starts=starts,
                            wid=wid, impulse=impulse, rows=rows))
            nlong += len(li)
            nshort += len(si)
        return x64, per

    def _page_stream(self, rec, serialno, comments, bl_l, bl_s, ilk,
                     sizes):
        """Assemble one stream's Ogg from dense packet blobs: ilk =
        per-packet byte offset into bl_l/bl_s (the native pager reads
        pk + ilk[i]*width, so width=1 + byte offsets address the blobs
        directly), sizes = final packet bytes."""
        cs, Ws, ns = rec["cs"], rec["Ws"], rec["ns"]
        hop = self.n // 2
        w = OggStreamWriter(serialno)
        h1, h2, h3 = self.enc.header_packets(comments)
        w.packetin(h1, 0)
        w.flush()
        w.packetin(h2, 0)
        w.packetin(h3, 0)
        w.flush()
        gps = cs - hop
        gps[-1] = ns

        from .. import native as VN
        res = VN.ogg_pages(bl_l, bl_s, ilk,
                           (Ws == 0).astype(np.uint8), sizes, gps,
                           serialno, w.pageno)
        if res is not None:
            blob, w.pageno = res
            w._pages.append(blob)
        else:
            def rows_for(i, Ws=Ws, ilk=ilk, sizes=sizes):
                bl = bl_l if Ws[i] == 1 else bl_s
                return bl[ilk[i]:ilk[i] + sizes[i]].tobytes()

            self._write_audio_pages(w, rows_for, sizes, gps)
        return w.pageout_all()

    # -- managed (ABR/CBR) path --------------------------------------------
    def encode_managed(self, pcm, serialno=778, comments=None,
                       chunk=256, switching=None) -> bytes:
        """Managed fast encode of one stream (see
        encode_managed_batch)."""
        return self.encode_managed_batch([pcm], [serialno], comments,
                                         chunk=chunk,
                                         switching=switching)[0]

    def _managed_dev_for(self, W):
        """DeviceManagedEncode per block mode (cached)."""
        from ..ops.managed import DeviceManagedEncode
        if W or self.W_main == 0:
            if self._managed_dev is None:
                self._managed_dev = DeviceManagedEncode(
                    self, W=self.W_main)
            return self._managed_dev
        if getattr(self, "_managed_dev_short", None) is None:
            self._managed_dev_short = DeviceManagedEncode(self, W=0)
        return self._managed_dev_short

    def _managed_finish_step(self, W, B, wb=None):
        if not hasattr(self, "_mfinish_cache"):
            self._mfinish_cache = {}
        key = (W, B, wb)
        if key not in self._mfinish_cache:
            self._mfinish_cache[key] = jax.jit(
                self._managed_dev_for(W).make_finish_step15(B, wb))
        return self._mfinish_cache[key]

    # frames budget per managed device wave: bounds live device memory
    # (probe spectra + the 15-blob packet buffers stay resident until
    # the wave's reservoir/gather drains them)
    _MANAGED_GROUP_FRAMES = 24576

    def encode_managed_batch(self, pcms, serialnos=None, comments=None,
                             chunk=256, switching=None,
                             B_long=256, B_short=256) -> list:
        """Managed (ABR/CBR) fast encode of MANY independent streams.

        With switching (the default when the template has two block
        sizes): the exact envelope schedule drives 256/2048 block
        selection, every frame runs the 15-packetblob stateful device
        pass (blob axis folded into the frame batch,
        ops/managed.make_finish_step15), the per-stream host reservoir
        floater (ReservoirChooser, an exact port of
        lib/bitrate.c:73-227, fed each packet's W) picks each packet,
        and a device gather fetches only the chosen blob's bytes —
        1/15th of the packet data crosses the host link.  Streams are
        processed in groups of ~_MANAGED_GROUP_FRAMES frames so live
        device memory stays bounded by the group, not the job.

        switching=False (or a single-blocksize template) selects the
        long-only framed pipeline."""
        assert self.managed, "construct FastEncoder(bitrate=...) first"
        if serialnos is None:
            serialnos = [778 + i for i in range(len(pcms))]
        assert len(serialnos) >= len(pcms), \
            f"{len(serialnos)} serialnos < {len(pcms)} streams"
        sw = self.switching if switching is None else switching
        if not sw:
            return self._encode_managed_long(pcms, serialnos, comments,
                                             chunk)
        hop = self.n // 2
        outs = []
        i = 0
        while i < len(pcms):
            j, acc = i, 0
            while j < len(pcms) and (
                    j == i or acc + pcms[j].shape[1] // hop + 4
                    <= self._MANAGED_GROUP_FRAMES):
                acc += pcms[j].shape[1] // hop + 4
                j += 1
            outs += self._encode_managed_switched(
                pcms[i:j], serialnos[i:j], comments, B_long, B_short)
            i = j
        return outs

    def _encode_managed_switched(self, pcms, serialnos, comments,
                                 B_long=256, B_short=256):
        """One device wave of the switched managed pipeline (see
        encode_managed_batch)."""
        from ..ops.managed import ReservoirChooser
        x64, per = self._prepare_switched(pcms, sw=True)
        (pend_l, BL), (pend_s, BS) = self._run_two_phase(
            x64, per, B_long, B_short, managed=True)
        nlong = sum(len(r["li"]) for r in per)
        nshort = sum(len(r["si"]) for r in per)

        # drain the (F, 15) bit counts
        def drain_nb(pend, total):
            if not pend:
                return np.zeros((0, 15), np.int64)
            return np.concatenate(
                [np.asarray(p[2]) for p in pend])[:total] \
                .astype(np.int64)

        nb_l = drain_nb(pend_l, nlong)
        nb_s = drain_nb(pend_s, nshort)

        # per-stream reservoir walk in frame order (mixing W groups;
        # vorbis_bitrate_addblock scales bitsper by each packet's W,
        # lib/bitrate.c:92-99)
        cho_l = np.zeros(nlong, np.int64)
        cho_s = np.zeros(nshort, np.int64)
        tp_l = np.zeros((nlong, 2), np.int64)     # (truncate, pad)
        tp_s = np.zeros((nshort, 2), np.int64)
        for rec in per:
            F = len(rec["Ws"])
            li, si = rec["li"], rec["si"]
            gl = rec["lofs"] + np.arange(len(li))
            gs = rec["sofs"] + np.arange(len(si))
            sizes = np.empty((F, 15), np.int64)
            sizes[li] = (nb_l[gl] + 7) >> 3
            if len(si):
                sizes[si] = (nb_s[gs] + 7) >> 3
            chooser = ReservoirChooser(self.setup, self.rate,
                                       self.vi.blocksizes)
            cf = np.empty(F, np.int64)
            tf = np.empty((F, 2), np.int64)
            Ws = rec["Ws"]
            for f in range(F):
                c, t, p = chooser.choose(sizes[f], int(Ws[f]))
                cf[f] = c
                tf[f] = (t, p)
            cho_l[gl] = cf[li]
            tp_l[gl] = tf[li]
            if len(si):
                cho_s[gs] = cf[si]
                tp_s[gs] = tf[si]

        # gather the chosen blob per batch, drain, apply truncate/pad
        # while compacting into the dense (blob, off) pager form
        def drain_sel(pend, B, W, choices, tps, nbW, total):
            mdev = self._managed_dev_for(W)
            gather = mdev.gather_step()
            wb = mdev.dev.plan.wb
            sel_pend = []
            for bi, pk, nb, lastm, m3v, fstate, o in pend:
                chb = self._pad_to(choices[bi * B:(bi + 1) * B], B)
                nbb = nbW[bi * B:min((bi + 1) * B, total)]
                sel_nb = nbb[np.arange(len(nbb)),
                             chb[:len(nbb)]] if len(nbb) else \
                    np.zeros(0, np.int64)
                if (sel_nb > wb * 8).any():
                    # oversized chosen packet: redo this batch at the
                    # static worst-case budget
                    big = self._managed_finish_step(
                        W, B, mdev.dev.plan.worst_bytes)
                    pk, _ = big(o[0], o[1], o[2], o[3], o[4], lastm,
                                o[6], fstate, m3v)
                sel = gather(pk, jnp.asarray(chb.astype(np.int32)))
                sel.copy_to_host_async()
                sel_pend.append(sel)
            # compact with final sizes (truncate cuts the tail,
            # zero-pad extends; bitrate.c:167-190)
            chosen = (np.take_along_axis(
                nbW, choices[:total, None], 1)[:, 0] + 7) >> 3 \
                if total else np.zeros(0, np.int64)
            keep = chosen - tps[:total, 0]
            fin = keep + tps[:total, 1]
            off = np.cumsum(fin) - fin
            blob = np.zeros(int(off[-1] + fin[-1]) if total else 0,
                            np.uint8)
            for bi, sel in enumerate(sel_pend):
                rows = np.asarray(sel)
                for f in range(min(B, total - bi * B)):
                    g = bi * B + f
                    blob[off[g]:off[g] + keep[g]] = rows[f, :keep[g]]
            return blob, off, fin

        bl_l, of_l, sz_l = drain_sel(pend_l, BL, 1, cho_l, tp_l,
                                     nb_l, nlong)
        bl_s, of_s, sz_s = drain_sel(pend_s, BS, 0, cho_s, tp_s,
                                     nb_s, nshort)

        # per-stream Ogg paging (same dense-blob pager as encode_batch)
        outs = []
        for rec, serialno in zip(per, serialnos):
            rows = rec["rows"]
            li, si = rec["li"], rec["si"]
            sizes = np.empty(len(rec["cs"]), np.int64)
            sizes[li] = sz_l[rows[li]]
            if len(si):
                sizes[si] = sz_s[rows[si]]
            ilk = np.zeros(len(rec["cs"]), np.int64)
            ilk[li] = of_l[rows[li]]
            if len(si):
                ilk[si] = of_s[rows[si]]
            outs.append(self._page_stream(rec, serialno, comments,
                                          bl_l, bl_s, ilk, sizes))
        return outs

    def _encode_managed_long(self, pcms, serialnos, comments,
                             chunk=256) -> list:
        """Long-only managed pipeline (switching=False and the
        single-blocksize templates): every chunk of frames runs the
        15-packetblob device pass in ONE jit, the host reservoir picks
        each packet, a device gather fetches only the chosen blob's
        bytes."""
        from ..ops.managed import DeviceManagedEncode, ReservoirChooser
        mdev = self._managed_dev_for(self.W_main)
        if serialnos is None:
            serialnos = [778 + i for i in range(len(pcms))]
        n, hop = self.n, self.n // 2
        ch = self.ch
        gather = mdev.gather_step()

        # ---- per-stream framing + the global (stream, chunk) list
        streams = []
        work = []                        # (sidx, frame offset o)
        for sidx, pcm in enumerate(pcms):
            assert pcm.shape[0] == ch
            frames = self._frame(np.asarray(pcm).astype(np.float32)
                                 / (32768.0 if pcm.dtype == np.int16
                                    else 1.0))       # (ch, F, n)
            F = frames.shape[1]
            streams.append(dict(frames=frames, F=F,
                                ns=int(pcm.shape[1]),
                                chooser=ReservoirChooser(
                                    self.setup, self.rate,
                                    self.vi.blocksizes)))
            for o in range(0, F, chunk):
                work.append((sidx, o))

        def chunk_frames_dev(sidx, o):
            frames = streams[sidx]["frames"]
            blk = frames[:, o:o + chunk]
            if blk.shape[1] < chunk:
                blk = np.concatenate(
                    [blk, np.zeros((ch, chunk - blk.shape[1], n),
                                   np.float32)], 1)
            return jnp.asarray(np.ascontiguousarray(
                blk.transpose(1, 0, 2)))

        # ---- dispatch all chunks, keep (pk_dev, nb) pairs; choose +
        # gather as results drain
        pend = []
        if self.psy_state:
            # two-phase: probe all chunks, replay the ampmax decay on
            # the host (each stream is an independent lane of
            # ampmax_seq_nd), finish with per-frame state (the managed
            # path is long-only: ampmax + M9 lastmdct are the live
            # states; lastmdct rows never cross a stream boundary)
            from ..ops import psydevice as PD
            probe = mdev.get_probe_step(chunk)
            finish = mdev.get_finish_step(chunk)
            probes = []
            for sidx, o in work:
                ob = probe(chunk_frames_dev(sidx, o))
                ob[5].copy_to_host_async()
                probes.append((sidx, o, ob))
            lam_rows = np.concatenate(
                [np.asarray(ob[5]) for _, _, ob in probes])
            lamf = lam_rows.reshape(-1, ch).max(-1)  # global frame order
            nfp = len(probes) * chunk
            # per-stream ampmax lanes over the padded (S, Fmax) layout
            S = len(streams)
            Fcmax = max(sum(chunk for w_s, _ in work if w_s == sidx)
                        for sidx in range(S))
            lam_p = np.full((S, Fcmax), -9999.0, np.float32)
            gbase = {}
            cur = {sidx: 0 for sidx in range(S)}
            for wi, (sidx, o) in enumerate(work):
                lam_p[sidx, cur[sidx]:cur[sidx] + chunk] = \
                    lamf[wi * chunk:(wi + 1) * chunk]
                gbase[wi] = cur[sidx]
                cur[sidx] += chunk
            amp_nd = PD.ampmax_seq_nd(
                lam_p, np.full((S, Fcmax), self.W_main, np.int64),
                self.vi.blocksizes, self.rate,
                self.setup.psy_global["ampmax_att_per_sec"]) \
                .astype(np.float32)
            hsrate = self.rate >= 26000
            n2L = mdev.n2
            if hsrate:
                L_all = jnp.concatenate(
                    [ob[1] for _, _, ob in probes]
                    + [jnp.zeros((1, n2L), jnp.float32)], 0)
                zrow = nfp * ch
            for wi, (sidx, o, ob) in enumerate(probes):
                if hsrate:
                    # previous frame's logmdct rows; the first frame
                    # of EACH STREAM reads the zero row
                    g = np.arange(chunk) + wi * chunk
                    within = np.arange(chunk) + gbase[wi]
                    rows = ((g - 1)[:, None] * ch
                            + np.arange(ch)[None, :])
                    rows = np.where(within[:, None] == 0, zrow, rows)
                    lastm = jnp.take(
                        L_all, jnp.asarray(
                            rows.reshape(-1).astype(np.int32)),
                        axis=0)
                else:
                    lastm = jnp.zeros((chunk * ch, n2L), jnp.float32)
                ampj = jnp.asarray(
                    amp_nd[sidx, gbase[wi]:gbase[wi] + chunk])
                pk, nb = finish(ob[0], ob[1], ob[2], ob[3], ob[4],
                                lastm, ob[5], ampj)
                nb.copy_to_host_async()
                pend.append((sidx, o, pk, nb))
        else:
            step = mdev.get_step(chunk)
            for sidx, o in work:
                pk, nb = step(chunk_frames_dev(sidx, o))
                nb.copy_to_host_async()
                pend.append((sidx, o, pk, nb))

        # ---- per-stream Ogg assembly (work is stream-major, so each
        # stream's chunks arrive in order)
        writers = []
        for serialno in serialnos[:len(streams)]:
            w = OggStreamWriter(serialno)
            h1, h2, h3 = self.enc.header_packets(comments)
            w.packetin(h1, 0)
            w.flush()
            w.packetin(h2, 0)
            w.packetin(h3, 0)
            w.flush()
            writers.append(w)
        gp_s = [0] * len(streams)
        fglob = [0] * len(streams)
        W = self.W_main
        for sidx, o, pk, nb in pend:
            st = streams[sidx]
            w = writers[sidx]
            chooser = st["chooser"]
            F, ns = st["F"], st["ns"]
            sizes = (np.asarray(nb) + 7) >> 3           # (chunk, 15)
            hi = min(chunk, F - o)
            choices = np.zeros(chunk, np.int64)
            trunc = np.zeros(chunk, np.int64)
            pads = np.zeros(chunk, np.int64)
            for f in range(hi):
                c, t, p = chooser.choose(sizes[f], W)
                choices[f], trunc[f], pads[f] = c, t, p
            sel = np.asarray(gather(pk, jnp.asarray(choices)))
            for f in range(hi):
                nbytes = int(sizes[f, choices[f]])
                data = sel[f, :nbytes].tobytes()
                if trunc[f]:
                    data = data[:nbytes - int(trunc[f])]
                if pads[f]:
                    data = data + b"\x00" * int(pads[f])
                gp_s[sidx] = 0 if fglob[sidx] == 0 else gp_s[sidx] + hop
                eos = fglob[sidx] == F - 1
                if eos:
                    gp_s[sidx] = ns
                w.packetin(data, gp_s[sidx] if fglob[sidx] > 0 else 0,
                           eos=eos)
                if fglob[sidx] % 16 == 0 or eos:
                    w.flush(eos=eos)
                fglob[sidx] += 1
        return [w.pageout_all() for w in writers]

    # -- host side ---------------------------------------------------------
    def _frame(self, pcm):
        ch, ns = pcm.shape
        n = self.n
        hop = n // 2
        # pad so the lapped stream covers all samples
        pad = np.zeros((ch, hop), np.float32)
        x = np.concatenate([pad, pcm.astype(np.float32), pad, pad], 1)
        nf = (x.shape[1] - n) // hop + 1
        idx = np.arange(nf)[:, None] * hop + np.arange(n)[None, :]
        return x[:, idx]                       # (ch, F, n)

    def encode(self, pcm, serialno=778, comments=None,
               max_in_flight=16, switching=None) -> bytes:
        """Full VBR fast encode of (ch, samples) -> Ogg bytes.

        The round-2 path: the entire per-packet pipeline (framing,
        masking, floor fit + wrap coding, residue VQ, Huffman codeword
        lookup, bit packing) runs on device in fixed-size chunks; the
        host only slices the packed packets and frames Ogg pages.
        Chunks are dispatched ahead and fetched asynchronously so the
        device compute, both transfer directions, and host paging all
        overlap.  pcm may be float32 (reference scale) or int16 (the
        encoder_example WAV path; converted on device as x/32768).

        With switching enabled (the default), an envelope pass drives
        256/2048 block selection and the stream mixes short/long
        packets like the reference encoder; switching=False forces the
        long-only pipeline."""
        if self.managed:
            return self.encode_managed(pcm, serialno, comments)
        sw = self.switching if switching is None else switching
        if sw:
            return self._encode_switched(pcm, serialno, comments)
        if self.psy_state:
            # the stateful pipeline runs through the batch path (an
            # all-long schedule when switching is off)
            return self.encode_batch([pcm], [serialno], comments,
                                     switching=False, B_long=1024)[0]
        is_dev = isinstance(pcm, jax.Array)
        ch, ns = pcm.shape
        assert ch == self.ch
        dev = self.dev
        n, hop = self.n, self.n // 2
        CF = dev.chunk_packets
        if is_dev:
            # PCM already resident in HBM (e.g. produced by a previous
            # device stage, or pre-staged by the caller): chunks come
            # from one compiled dynamic_slice, no host->device traffic
            # inside the encode loop
            zdt = pcm.dtype
            xd = self._device_pad(pcm)
            S = ns + 3 * hop
            slicer = self._get_slicer(zdt, S)
        else:
            if pcm.dtype == np.int16:
                zdt = np.int16
            else:
                pcm = pcm.astype(np.float32, copy=False)
                zdt = np.float32
            pad1 = np.zeros((ch, hop), zdt)
            pad2 = np.zeros((ch, 2 * hop), zdt)
            x = np.concatenate([pad1, pcm, pad2], 1)
        F = (ns + 3 * hop - n) // hop + 1          # packets total
        nchunks = (F + CF - 1) // CF
        step = dev.get_step()
        wb = dev.plan.wb

        w = OggStreamWriter(serialno)
        h1, h2, h3 = self.enc.header_packets(comments)
        w.packetin(h1, 0)
        w.flush()
        w.packetin(h2, 0)
        w.packetin(h3, 0)
        w.flush()

        def dispatch(c):
            s0 = c * CF * hop
            if is_dev:
                sl = slicer(xd, s0)
            else:
                sl = x[:, s0:s0 + dev.chunk_samples]
                if sl.shape[1] < dev.chunk_samples:
                    sl = np.concatenate(
                        [sl, np.zeros((ch, dev.chunk_samples
                                       - sl.shape[1]), zdt)], 1)
                sl = jax.device_put(np.ascontiguousarray(sl))
            pk, nb = step(sl)
            pk.copy_to_host_async()
            nb.copy_to_host_async()
            return pk, nb

        inflight = {}
        gp = 0
        fglobal = 0
        for c in range(nchunks):
            for cd in range(c, min(c + max_in_flight, nchunks)):
                if cd not in inflight:
                    inflight[cd] = dispatch(cd)
            pk, nb = inflight.pop(c)
            pkb = np.asarray(pk)
            nbb = np.asarray(nb)
            if (nbb > wb * 8).any():
                # rare oversized packet: redo the chunk with the
                # static worst-case byte budget (compiled lazily once)
                big = dev.get_step(dev.plan.worst_bytes)
                s0 = c * CF * hop
                if is_dev:
                    sl = slicer(xd, s0)
                else:
                    sl = x[:, s0:s0 + dev.chunk_samples]
                    if sl.shape[1] < dev.chunk_samples:
                        sl = np.concatenate(
                            [sl, np.zeros((ch, dev.chunk_samples
                                           - sl.shape[1]), zdt)], 1)
                    sl = jax.device_put(np.ascontiguousarray(sl))
                pk, nb = big(sl)
                pkb = np.asarray(pk)
                nbb = np.asarray(nb)
            hi = min(CF, F - c * CF)
            sizes = (nbb[:hi] + 7) >> 3
            for f in range(hi):
                pkt = pkb[f, :sizes[f]].tobytes()
                gp = 0 if fglobal == 0 else gp + hop
                eos = fglobal == F - 1
                if eos:
                    gp = ns
                w.packetin(pkt, gp if fglobal > 0 else 0, eos=eos)
                if fglobal % 16 == 0 or eos:
                    w.flush(eos=eos)
                fglobal += 1
        w.flush()
        return w.pageout_all()

    def encode_hostpack(self, pcm, serialno=778, comments=None) -> bytes:
        """Round-1 fast encode (device decisions, host bit-field
        construction).  Kept as the equivalence oracle for the fully
        on-device path and as a fallback.  Uncoupled layouts only."""
        assert self.res_type in (0, 1), \
            "host-pack path covers uncoupled residues only"
        ch, ns = pcm.shape
        assert ch == self.ch
        frames = self._frame(pcm)              # (ch, F, n)
        F = frames.shape[1]
        flat = frames.reshape(ch * F, self.n)
        # run the device step over FIXED-size chunks so one compiled
        # shape serves any input length (a fresh shape costs minutes
        # of XLA compile through the axon remote-compile path)
        CH = self.chunk_frames
        nb = flat.shape[0]
        outs = []
        for o in range(0, nb, CH):
            blk = flat[o:o + CH]
            if blk.shape[0] < CH:
                blk = np.concatenate(
                    [blk, np.zeros((CH - blk.shape[0], self.n),
                                   np.float32)])
            outs.append([np.asarray(x) if not isinstance(x, list)
                         else [np.asarray(e) for e in x]
                         for x in self._step(blk)])
        posts = np.concatenate([o[0] for o in outs])[:nb]
        used = np.concatenate([o[1] for o in outs])[:nb]
        pw = np.concatenate([o[2] for o in outs])[:nb]
        nst = len(outs[0][3])
        entries = [np.concatenate([o[3][s] for o in outs])[:nb]
                   for s in range(nst)]
        posts = posts.reshape(ch, F, -1)
        used = used.reshape(ch, F)
        pw = pw.reshape(ch, F, -1)
        entries = [e.reshape(ch, F, e.shape[1], e.shape[2])
                   for e in entries]

        w = OggStreamWriter(serialno)
        h1, h2, h3 = self.enc.header_packets(comments)
        w.packetin(h1, 0)
        w.flush()
        w.packetin(h2, 0)
        w.packetin(h3, 0)
        w.flush()

        n2 = self.n // 2
        hop = n2

        # batched field construction: every potential (value, nbits)
        # column across all frames, then ONE native pack per packet
        cols_v = [np.zeros((F, 1), np.uint64),
                  np.full((F, 1), self.mode_idx, np.uint64),
                  np.ones((F, 1), np.uint64),
                  np.ones((F, 1), np.uint64)]
        cols_l = [np.ones((F, 1), np.int64),
                  np.full((F, 1), self.modebits, np.int64),
                  np.ones((F, 1), np.int64),
                  np.ones((F, 1), np.int64)]
        for c in range(ch):
            fv, fl, fm = self._floor_fields(posts[c], used[c])
            cols_v.append(fv)
            cols_l.append(np.where(fm, fl, 0))
        rv, rl, rm = self._residue_fields(pw, entries, used)
        cols_v.append(rv)
        cols_l.append(np.where(rm, rl, 0))
        allv = np.ascontiguousarray(np.concatenate(cols_v, 1))
        alll = np.concatenate(cols_l, 1).astype(np.int32)

        from ..native import pack_bits_multi
        pkts = pack_bits_multi(allv, alll)
        if pkts is None:                      # no native lib: fallback
            pkts = []
            for f in range(F):
                bw = FieldWriter()
                nz = alll[f] > 0
                bw.write_array(allv[f][nz], alll[f][nz])
                pkts.append(bw.getvalue())
        gp = 0
        for f in range(F):
            pkt = pkts[f]
            gp = 0 if f == 0 else gp + hop
            eos = f == F - 1
            if eos:
                gp = ns  # trim to the true sample count
            w.packetin(pkt, gp if f > 0 else 0, eos=eos)
            if f % 16 == 0 or eos:
                w.flush(eos=eos)
        w.flush()
        return w.pageout_all()
