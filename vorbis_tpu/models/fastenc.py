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

Coupling is disabled (encode_ctl COUPLING_SET 0) so channels quantize
independently — the uncoupled residue layout is what the per-channel
device VQ produces."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..bitstream.bitpack import FieldWriter, ilog
from ..bitstream.oggfile import OggStreamWriter
from ..codec.encoder import Encoder
from ..codec.floor1_codec import floor1_encode, fromdB_lookup
from ..codec.residue_codec import res01_forward
from ..ops.floor_device import DeviceFloorFit
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


class FastEncoder:
    def __init__(self, ch: int, rate: int, quality: float):
        b = encsetup.setup_vbr_staged(ch, rate, quality)
        b.ctl_coupling_set(False)
        self.setup = b.init()
        self.enc = Encoder(self.setup)   # looks, books, header packing
        self.vi = self.setup.vi
        self.ch = ch
        self.rate = rate
        vi = self.vi
        self.n = vi.blocksizes[1]
        n2 = self.n // 2
        # long-block mode + its mapping
        self.mode_idx = next(i for i, m in enumerate(vi.modes)
                             if m.blockflag == 1)
        self.modebits = ilog(len(vi.modes) - 1)
        minfo = vi.modes[self.mode_idx]
        self.mapping = vi.maps[minfo.mapping]
        # device ops
        self.analysis = DeviceAnalysis(self.setup, blocktype=3,
                                       rate=rate)
        fl_idx = self.mapping.floorsubmap[self.mapping.chmuxlist[0]]
        self.fl_look = self.enc.floor_looks[fl_idx]
        self.floor = DeviceFloorFit(self.fl_look)
        self.fromdB = jnp.asarray(fromdB_lookup())
        res_idx = self.mapping.residuesubmap[self.mapping.chmuxlist[0]]
        self.res_look = self.enc.residue_looks[res_idx]
        self.res_type = vi.residue_types[res_idx]
        assert self.res_type in (0, 1), \
            "fast path expects an uncoupled residue"
        self.dvq = DeviceResidueVQ(self.res_look.info,
                                   self.res_look.books,
                                   self.res_look.partbooks)
        self._step = jax.jit(self._device_step)

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
        return posts, used, pw, entries

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

    def encode(self, pcm, serialno=778, comments=None) -> bytes:
        """Full VBR fast encode of (ch, samples) -> Ogg bytes."""
        ch, ns = pcm.shape
        assert ch == self.ch
        frames = self._frame(pcm)              # (ch, F, n)
        F = frames.shape[1]
        flat = frames.reshape(ch * F, self.n)
        posts, used, pw, entries = self._step(flat)
        posts = np.asarray(posts).reshape(ch, F, -1)
        used = np.asarray(used).reshape(ch, F)
        pw = np.asarray(pw).reshape(ch, F, -1)
        entries = [np.asarray(e).reshape(ch, F, e.shape[1], e.shape[2])
                   for e in entries]

        w = OggStreamWriter(serialno)
        h1, h2, h3 = self.enc.header_packets(comments)
        w.packetin(h1, 0)
        w.flush()
        w.packetin(h2, 0)
        w.packetin(h3, 0)
        w.flush()

        vi = self.vi
        n2 = self.n // 2
        hop = n2
        gp = 0
        for f in range(F):
            bw = FieldWriter()
            bw.write(0, 1)
            bw.write(self.mode_idx, self.modebits)
            bw.write(1, 1)   # prev window long
            bw.write(1, 1)   # next window long
            nz = []
            for c in range(ch):
                post = posts[c, f] if used[c, f] else None
                z, _ = floor1_encode(bw, self.fl_look, vi.books,
                                     vi.static_books,
                                     None if post is None
                                     else post.copy(), n2)
                nz.append(z)
            # uncoupled residue: one submap bundles all channels here
            chans = [c for c in range(ch) if nz[c]]
            if chans:
                res01_forward(
                    bw, self.res_look, None, len(chans),
                    [pw[c, f] for c in chans],
                    entries=[[entries[s][c, f] for s in
                              range(len(entries))] for c in chans])
            # granulepos: first packet primes the lap (no output)
            gp = 0 if f == 0 else gp + hop
            eos = f == F - 1
            if eos:
                gp = ns  # trim to the true sample count
            w.packetin(bw.getvalue(), gp if f > 0 else 0, eos=eos)
            if f % 16 == 0 or eos:
                w.flush(eos=eos)
        w.flush()
        return w.pageout_all()
