#!/usr/bin/env python
"""Driver benchmark: batched TPU encode-analysis throughput.

Measures the device codec spine (window -> forward MDCT -> log
spectrum -> two-pass bark noise fit -> companded noise mask) on
batched 44.1 kHz stereo long blocks at q5, reported as x-realtime per
chip.  Baseline target (BASELINE.md): >500x realtime for the full
batched encode; vs_baseline is measured/500.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from vorbis_tpu.models.pipeline import TpuCodecPipeline

    pipe = TpuCodecPipeline(ch=2, rate=44100, quality=0.5)
    n = pipe.n
    hop = n // 2
    rate = 44100
    ch = 2

    # ~70 audio-seconds of stereo per step
    frames_per_step = 6144
    rng = np.random.RandomState(0)
    x = rng.randn(frames_per_step, n).astype(np.float32) * 0.3

    step = jax.jit(pipe.mask_step)
    dev = jax.devices()[0]
    xd = jax.device_put(x, dev)

    # warmup/compile
    out = step(xd)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(xd)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    total_frames = frames_per_step * iters
    audio_seconds = total_frames * hop / rate / ch  # stereo stream time
    xrt = audio_seconds / dt
    print(json.dumps({
        "metric": "tpu_batched_encode_psy_stereo_q5",
        "value": round(xrt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
