#!/usr/bin/env python
"""Driver benchmark: FULL end-to-end codec throughput.

Primary metric (the BASELINE.md north star): complete PCM -> Ogg
Vorbis encode — framing, psy masking, floor1 fit, post wrap coding,
residue VQ, Huffman codeword lookup and bit packing all on device in
one jit; host slices packets and frames Ogg pages — measured as
x-realtime per chip on 44.1 kHz stereo q5.  Target >500x.

Secondary field: full Ogg -> PCM decode (native C packet parse +
bit-exact batched synthesis) vs the reference C decoder's measured
266x/core on this host class.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from vorbis_tpu.models.fastenc import FastEncoder

    rate = 44100
    secs = 60
    t = np.arange(secs * rate) / rate
    rng = np.random.RandomState(0)
    pcmf = (0.30 * np.sin(2 * np.pi * 440 * t)[None, :]
            + 0.10 * np.sin(2 * np.pi * 1873 * t)[None, :]
            + 0.02 * rng.randn(2, secs * rate))
    # 16-bit PCM: the reference encoder_example's WAV input format
    pcm = np.clip(np.rint(pcmf * 32768.0), -32768, 32767).astype(np.int16)

    fe = FastEncoder(2, 44100, 0.5)
    # headline: PCM resident in HBM (codec throughput per chip; the
    # encode loop moves no input over the host link)
    pcm_dev = jax.device_put(pcm)
    jax.block_until_ready(pcm_dev)
    ogg = fe.encode(pcm_dev)             # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        ogg = fe.encode(pcm_dev)
        best = min(best, time.perf_counter() - t0)
    enc_xrt = secs / best

    # secondary: PCM starting on host (adds the host->device link,
    # ~10-50 MB/s through this environment's TPU tunnel)
    _ = fe.encode(pcm)
    bhost = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = fe.encode(pcm)
        bhost = min(bhost, time.perf_counter() - t0)
    enc_host_xrt = secs / bhost

    dec_xrt = None
    try:
        from vorbis_tpu.models.fastdec import decode_ogg_fast
        out, _ = decode_ogg_fast(ogg)    # our stream decodes bit-clean
        bestd = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out, _ = decode_ogg_fast(ogg)
            bestd = min(bestd, time.perf_counter() - t0)
        dec_xrt = out.shape[1] / rate / bestd
    except Exception:
        pass

    rec = {
        "metric": "tpu_e2e_encode_pcm_to_ogg_q5_stereo",
        "value": round(enc_xrt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(enc_xrt / 500.0, 3),
        "encode_from_host_x_realtime": round(enc_host_xrt, 1),
    }
    if dec_xrt is not None:
        rec["decode_x_realtime"] = round(dec_xrt, 1)
        rec["decode_vs_c_core"] = round(dec_xrt / 266.0, 3)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
