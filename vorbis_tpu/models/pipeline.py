"""TPU batched codec pipeline: the flagship device model.

The reference processes one block at a time through a frame-serial
loop (lib/block.c, lib/analysis.c).  Here the same dataflow is a single
jitted step over a (streams, frames, n) batch:

  analysis  : window -> forward MDCT -> log spectrum -> two-pass bark
              noise fit -> companded noise mask        (DeviceAnalysis)
  synthesis : IMDCT -> window -> overlap-add halo      (DeviceSynthesis)

Sharding model (SURVEY.md §7): streams ride the `dp` mesh axis, frames
within a stream ride `sp`.  Analysis is embarrassingly parallel; the
synthesis overlap-add is the one cross-frame dependency and lowers to a
collective-permute halo exchange along `sp`.  Host keeps only Huffman
coding + Ogg framing (bitstream/).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.jaxdsp import DeviceAnalysis, DeviceSynthesis
from . import encsetup

f32 = np.float32


class TpuCodecPipeline:
    """Batched long-block encode/decode compute spine for one codec
    config (channels/rate/quality)."""

    def __init__(self, ch=2, rate=44100, quality=0.4):
        self.setup = encsetup.setup_vbr(ch, rate, quality)
        self.n = self.setup.vi.blocksizes[1]
        self.analysis = DeviceAnalysis(self.setup, blocktype=3, rate=rate)
        self.synthesis = DeviceSynthesis(self.n)
        from ..codec import headers as H
        from ..codec.floor1_codec import Floor1Look, fromdB_lookup
        from ..ops.floor_device import DeviceFloorFit
        # long-block floor config (the encoder's floor for blocktype 3)
        fl = [f for f in self.setup.floor_full
              if f["postlist"][1] == self.n // 2]
        fd = (fl[-1] if fl else self.setup.floor_full[-1])
        info = H.Floor1Info(
            partitions=fd["partitions"],
            partitionclass=list(fd["partitionclass"]),
            class_dim=list(fd["class_dim"]),
            class_subs=list(fd["class_subs"]),
            class_book=list(fd["class_book"]),
            class_subbook=[list(r) for r in fd["class_subbook"]],
            mult=fd["mult"], rangebits=0,
            postlist=list(fd["postlist"]),
            maxover=fd["maxover"], maxunder=fd["maxunder"],
            maxerr=fd["maxerr"], twofitweight=fd["twofitweight"],
            twofitatten=fd["twofitatten"])
        self.floor_fit = DeviceFloorFit(Floor1Look(info))
        self.fromdB = jnp.asarray(fromdB_lookup())

    def frame(self, pcm):
        """Host-side framing: (ch, samples) -> (ch, F, n) overlapping
        long blocks advancing n/2 (lib/block.c centerW walk)."""
        ch, ns = pcm.shape
        n = self.n
        hop = n // 2
        nf = max(1, (ns - n) // hop + 1)
        idx = np.arange(nf)[:, None] * hop + np.arange(n)[None, :]
        return np.ascontiguousarray(
            pcm[:, np.clip(idx, 0, ns - 1)].astype(np.float32))

    def encode_step(self, frames):
        """frames: (..., n) -> (mdct, logmdct, noise_mask).  Jittable."""
        return self.analysis(frames)

    def mask_step(self, frames):
        """Full psy fast path: MDCT + FFT + noise fit + tone seeding +
        offset/mix -> (mdct, logmdct, final_mask)."""
        return self.analysis.full_mask(frames)

    def encode_quantize_step(self, frames):
        """Device encode through quantization: masking chain -> floor1
        fit -> stream post quantization -> rendered gain curve ->
        integer residues (reference: mapping0_forward through
        _vp_couple_quantize_normalize's uncoupled quantization).
        Returns (qposts (B, P) int32, residues (B, n/2) int32)."""
        md, logmdct, mask = self.analysis.full_mask(frames)
        posts, used = self.floor_fit(logmdct, mask)
        qposts = self.floor_fit.quantize_posts(posts)
        curve = self.floor_fit.render(qposts, self.fromdB)
        # rint quantization against the rendered floor; unused floors
        # (silent channels) produce zero residues
        r = md / curve
        res = jnp.where(used[:, None], jnp.rint(r).astype(jnp.int32), 0)
        return qposts, res

    def roundtrip_step(self, frames):
        """Full device step: analyze (complete masking chain), floor
        the spectrum against the mask (the quantization decision),
        resynthesize, and measure reconstruction error.  This is the
        codec equivalent of a train step — every hot op of encode AND
        decode in one jit."""
        md, logmdct, mask = self.analysis.full_mask(frames)
        # keep only components above the mask (the decision the
        # residue coder encodes; reference: _vp_couple_quantize_normalize)
        keep = logmdct >= mask
        quant = jnp.where(keep, md, 0.0)
        pcm = self.synthesis(quant)
        src = self.synthesis(md)
        err = jnp.sqrt(jnp.mean((pcm - src) ** 2))
        return pcm, err


def make_sharded_step(pipe: TpuCodecPipeline, mesh: Mesh):
    """Jit the full roundtrip step over a device mesh with
    streams->dp, frames->sp sharding (see parallel/mesh.py)."""
    from ..parallel.mesh import sharded_roundtrip_step
    return sharded_roundtrip_step(pipe, mesh)
