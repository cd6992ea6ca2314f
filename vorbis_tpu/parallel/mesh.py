"""Device-mesh construction and sharding for the batched codec.

The reference is strictly single-threaded frame-serial C; its only
parallelism is SIMD (SURVEY.md §2 items 22-23).  Here the scale-out
model is: independent audio streams ride a `dp` (data-parallel) mesh
axis, frames within a stream ride `sp` (sequence-parallel).  Encode
analysis is embarrassingly parallel; decode's overlap-add is the one
cross-frame dependency and lowers to a collective-permute halo
exchange along `sp` over ICI.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_codec_mesh(n_devices: int | None = None,
                    devices=None) -> Mesh:
    """Build a (dp, sp) mesh over the available devices, preferring the
    squarest factorization (dp x sp).  Falls back to the virtual host
    CPU pool when the default backend has fewer devices (single real
    chip + xla_force_host_platform_device_count)."""
    if devices is None:
        devices = jax.devices()
        want = n_devices or len(devices)
        if len(devices) < want:
            devices = jax.devices("cpu")
    n = n_devices or len(devices)
    assert len(devices) >= n, (len(devices), n)
    dp = 1
    for cand in range(int(n ** 0.5), 0, -1):
        if n % cand == 0:
            dp = cand
            break
    sp = n // dp
    return Mesh(np.array(devices[:n]).reshape(dp, sp), ("dp", "sp"))


def shard_frames(mesh: Mesh):
    """NamedSharding for a (streams, channels, frames, n) batch:
    streams->dp, frames->sp."""
    return NamedSharding(mesh, P("dp", None, "sp", None))


def sharded_roundtrip_step(pipe, mesh: Mesh):
    """Jit the pipeline's full roundtrip step over the mesh."""
    out_sharding = (NamedSharding(mesh, P("dp", None, None)),
                    NamedSharding(mesh, P()))

    @partial(jax.jit, in_shardings=(shard_frames(mesh),),
             out_shardings=out_sharding)
    def step(frames):
        return pipe.roundtrip_step(frames)

    return step


def sharded_encode_step(dev, mesh: Mesh, F: int):
    """Jit the REAL production encode step — the full DeviceFastEncode
    pipeline (masking -> floor1 fit -> post wrap coding -> residue VQ
    -> Huffman codeword lookup -> bit packing) — with the frame axis
    sharded over every mesh device (dp and sp both partition frames;
    per-frame math has no cross-frame dependency, so the sharded
    packets are bitwise identical to single-device output).

    dev: ops.encdevice.DeviceFastEncode.  F: frames per step, must be
    divisible by mesh.size.  Returns a jitted
    frames (F, ch, n) -> (packets (F, wb) uint8, nbits (F,) int32).
    """
    assert F % mesh.size == 0, (F, mesh.size)
    in_sh = NamedSharding(mesh, P(("dp", "sp"), None, None))
    out_sh = (NamedSharding(mesh, P(("dp", "sp"), None)),
              NamedSharding(mesh, P(("dp", "sp"))))
    return jax.jit(dev.make_framed_step(F), in_shardings=(in_sh,),
                   out_shardings=out_sh)
