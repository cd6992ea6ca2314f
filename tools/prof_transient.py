#!/usr/bin/env python
"""Profile the transient-dense batched encode leg (bench.py's
encode_transient) to find where the click-train cliff goes: stretch
rescue, short-block dispatches, schedule, or paging."""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def click_train(secs, rate, seed):
    n = int(secs * rate)
    t = np.arange(n) / rate
    rng = np.random.RandomState(1000 + seed)
    x = 0.05 * np.sin(2 * np.pi * (330 + 11 * seed) * t)
    step = int(0.09 * rate)
    for o in range(step // 2, n - 400, step):
        dur = 256
        env = np.exp(-np.arange(dur) / 40.0)
        x[o:o + dur] += 0.75 * env * rng.randn(dur)
    pcmf = np.stack([x, np.roll(x, 7)])
    return np.clip(np.rint(pcmf * 32768.0), -32768, 32767).astype(np.int16)


def main():
    import jax
    from vorbis_tpu.models.fastenc import FastEncoder
    rate = 44100
    tsecs, tn = 30, 8
    fe = FastEncoder(2, rate, 0.5)
    tr = [jax.device_put(click_train(tsecs, rate, s)) for s in range(tn)]
    jax.block_until_ready(tr[-1])
    _ = fe.encode_batch(tr)  # warm
    t0 = time.perf_counter()
    _ = fe.encode_batch(tr)
    el = time.perf_counter() - t0
    print(f"warm encode_batch: {el:.2f}s = {tn*tsecs/el:.1f}x rt")
    print("profile:", dict(fe.last_profile))

    pr = cProfile.Profile()
    pr.enable()
    _ = fe.encode_batch(tr)
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(40)
    print(s.getvalue())


if __name__ == "__main__":
    main()
