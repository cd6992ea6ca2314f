#!/usr/bin/env python
"""Driver benchmark: FULL end-to-end codec throughput.

Primary metric (the BASELINE.md north star, explicitly a BATCHED
target): aggregate PCM -> Ogg Vorbis encode throughput per chip with a
batch of independent 44.1 kHz stereo q5 streams — framing, envelope
block switching, psy masking, floor1 fit (Pallas kernel), post wrap
coding, stereo coupling, residue VQ, Huffman codeword lookup and bit
packing all on device; the host only pages per-stream Ogg.  Target
>500x realtime per chip.

Secondary fields:
- encode_batched_from_host_x_realtime: the same batch fed from HOST
  int16 arrays (the transcode-farm ingestion path: H2D transfer and
  LPC edge pads inside the timed region).
- encode_transient_x_realtime: batched encode of click-train content
  (marks every few thousand samples), bounding the stretch-rescue and
  short-block dispatch overhead on transient-dense audio.
- full Ogg -> PCM decode via the fused native drain (vn_ogg_scan +
  vn_decode_stream: page walk, Huffman parse, residue accumulate,
  coupling, floor render, IMDCT and lap-add, single call per stream),
  single-stream and multi-stream batch.
- the system libvorbis C encoder/decoder measured ON THIS HOST for
  the same signal (re-measured every run instead of a hardcoded
  constant, so host drift cannot skew the comparison).
- profile: the encoder's two-phase stage timers for the batched run
  (device dispatch / probe drain / host mid-pass / finish), making
  the next bottleneck visible in the bench record itself.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _signal(secs, rate, seed):
    t = np.arange(secs * rate) / rate
    rng = np.random.RandomState(seed)
    pcmf = (0.30 * np.sin(2 * np.pi * (440 + 7 * seed) * t)[None, :]
            + 0.10 * np.sin(2 * np.pi * 1873 * t)[None, :]
            + 0.02 * rng.randn(2, int(secs * rate)))
    return np.clip(np.rint(pcmf * 32768.0), -32768,
                   32767).astype(np.int16)


def _click_train(secs, rate, seed):
    """Transient-dense: a decaying click every ~90 ms over a quiet
    tonal bed — every click lands an envelope mark, so the schedule
    mixes short/long blocks throughout."""
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
    return np.clip(np.rint(pcmf * 32768.0), -32768,
                   32767).astype(np.int16)


def _measure_c(pcm16, rate, secs):
    """System libvorbis encode/decode x-realtime on this host (single
    core, like the reference binaries)."""
    try:
        from tests import oracle
        pcmf = pcm16.astype(np.float32) / 32768.0
        t0 = time.perf_counter()
        oracle.encode_vbr(pcmf, rate, 0.5, "/tmp/_bench_c.ogg")
        c_enc = secs / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        oracle.decode_float("/tmp/_bench_c.ogg")
        c_dec = secs / (time.perf_counter() - t0)
        return round(c_enc, 1), round(c_dec, 1)
    except Exception:
        return None, None


def main():
    import jax

    from vorbis_tpu.models.fastenc import FastEncoder

    rate = 44100
    secs = 60
    nstreams = 16   # chip-filling batch; per-stream host work overlaps
    pcms = [_signal(secs, rate, s) for s in range(nstreams)]

    fe = FastEncoder(2, 44100, 0.5)

    # ---- single stream, PCM resident in HBM ----
    pcm_dev = jax.device_put(pcms[0])
    jax.block_until_ready(pcm_dev)
    ogg = fe.encode(pcm_dev)             # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        ogg = fe.encode(pcm_dev)
        best = min(best, time.perf_counter() - t0)
    enc_1_xrt = secs / best

    # ---- batched: nstreams independent streams in one pipeline ----
    pcms_dev = [jax.device_put(p) for p in pcms]
    jax.block_until_ready(pcms_dev[-1])
    oggs = fe.encode_batch(pcms_dev)     # warm
    bestb = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        oggs = fe.encode_batch(pcms_dev)
        bestb = min(bestb, time.perf_counter() - t0)
    enc_b_xrt = nstreams * secs / bestb
    profile = dict(getattr(fe, "last_profile", {}) or {})

    # ---- batched from HOST memory (transcode-farm ingestion) ----
    besth = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = fe.encode_batch(pcms)
        besth = min(besth, time.perf_counter() - t0)
    enc_bh_xrt = nstreams * secs / besth
    profile_host = dict(getattr(fe, "last_profile", {}) or {})

    # ---- H2D link bandwidth (sustained), the from-host bound ----
    # the tunnel link is burst-then-throttle; measure the SUSTAINED
    # rate right after the from-host legs drained the burst bucket, so
    # the bench record itself shows whether enc_bh is link-capped
    nbytes = sum(p.nbytes for p in pcms)
    t0 = time.perf_counter()
    _sink = [jax.device_put(p) for p in pcms]
    jax.block_until_ready(_sink)
    h2d_mb_s = nbytes / 1e6 / (time.perf_counter() - t0)
    del _sink
    link_cap_xrt = nstreams * secs / (nbytes / (h2d_mb_s * 1e6))

    # ---- single stream from host memory ----
    _ = fe.encode(pcms[0])
    bhost = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = fe.encode(pcms[0])
        bhost = min(bhost, time.perf_counter() - t0)
    enc_host_xrt = secs / bhost

    # ---- transient-dense batched encode (click trains) ----
    tsecs, tn = 30, 8
    tr_pcms = [jax.device_put(_click_train(tsecs, rate, s))
               for s in range(tn)]
    jax.block_until_ready(tr_pcms[-1])
    _ = fe.encode_batch(tr_pcms)         # warm (short-block graphs)
    bestt = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = fe.encode_batch(tr_pcms)
        bestt = min(bestt, time.perf_counter() - t0)
    enc_tr_xrt = tn * tsecs / bestt

    # ---- managed (ABR) transient encode (VERDICT r4 weak #4c) ----
    enc_mtr_xrt = None
    try:
        fem = FastEncoder(2, rate, bitrate=(-1, 128000, -1))
        _ = fem.encode_managed_batch(tr_pcms)   # warm
        bestmt = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            _ = fem.encode_managed_batch(tr_pcms)
            bestmt = min(bestmt, time.perf_counter() - t0)
        enc_mtr_xrt = tn * tsecs / bestmt
    except Exception:
        pass

    # ---- decode drain (fused native: vn_ogg_scan+vn_decode_stream) --
    dec_xrt = None
    dec_b_xrt = None
    try:
        from vorbis_tpu.models.fastdec import (decode_ogg_fast,
                                               decode_ogg_fast_batch)
        out, _ = decode_ogg_fast(ogg)    # our stream decodes bit-clean
        bestd = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out, _ = decode_ogg_fast(ogg)
            bestd = min(bestd, time.perf_counter() - t0)
        dec_xrt = out.shape[1] / rate / bestd
        # batched multi-stream drain (threaded; the per-stream native
        # calls drop the GIL) — the per-host aggregate figure the C
        # decoder would need one process per stream to match
        outs = decode_ogg_fast_batch(oggs)
        bestdb = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            outs = decode_ogg_fast_batch(oggs)
            bestdb = min(bestdb, time.perf_counter() - t0)
        dec_b_xrt = sum(o.shape[1] for o, _ in outs) / rate / bestdb
    except Exception:
        pass

    # ---- incremental decode: seek to the middle, stream the rest
    # through the chunked fast reader (vorbisfile.read_all_float over
    # FastStreamDecoder; VERDICT r4 missing #2) ----
    dec_seek_xrt = None
    try:
        from vorbis_tpu.vorbisfile import OggVorbisFile
        mid = secs * rate // 2
        vf = OggVorbisFile(ogg)
        vf.pcm_seek(mid)
        _ = vf.read_all_float()          # warm
        bests = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            vf = OggVorbisFile(ogg)
            vf.pcm_seek(mid)
            outp = vf.read_all_float()
            bests = min(bests, time.perf_counter() - t0)
        dec_seek_xrt = outp.shape[1] / rate / bests
    except Exception:
        pass

    c_enc, c_dec = _measure_c(pcms[0], rate, secs)

    rec = {
        "metric": "tpu_e2e_encode_pcm_to_ogg_q5_stereo_batched",
        "value": round(enc_b_xrt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(enc_b_xrt / 500.0, 3),
        "batch_streams": nstreams,
        "encode_single_stream_x_realtime": round(enc_1_xrt, 1),
        "encode_batched_from_host_x_realtime": round(enc_bh_xrt, 1),
        "encode_from_host_x_realtime": round(enc_host_xrt, 1),
        "encode_transient_x_realtime": round(enc_tr_xrt, 1),
        "h2d_sustained_mb_s": round(h2d_mb_s, 1),
        "from_host_link_cap_x_realtime": round(link_cap_xrt, 1),
        "from_host_vs_link_cap": round(enc_bh_xrt / link_cap_xrt, 3),
    }
    if enc_mtr_xrt is not None:
        rec["encode_managed_transient_x_realtime"] = round(
            enc_mtr_xrt, 1)
    if profile:
        tot = sum(profile.values()) or 1.0
        rec["profile_stage_seconds"] = {
            k: round(v, 4) for k, v in profile.items()}
        rec["profile_stage_share"] = {
            k: round(v / tot, 3) for k, v in profile.items()}
    if profile_host:
        rec["profile_stage_seconds_from_host"] = {
            k: round(v, 4) for k, v in profile_host.items()}
    if c_enc:
        rec["c_encoder_x_realtime_measured"] = c_enc
        rec["encode_vs_c_core"] = round(enc_b_xrt / c_enc, 1)
    if dec_xrt is not None:
        rec["decode_x_realtime"] = round(dec_xrt, 1)
        if dec_seek_xrt is not None:
            rec["decode_seek_then_read_x_realtime"] = round(
                dec_seek_xrt, 1)
        if dec_b_xrt is not None:
            rec["decode_batched_x_realtime"] = round(dec_b_xrt, 1)
        if c_dec:
            rec["c_decoder_x_realtime_measured"] = c_dec
            rec["decode_vs_c_core"] = round(dec_xrt / c_dec, 3)
            if dec_b_xrt is not None:
                rec["decode_batched_vs_c_core"] = round(
                    dec_b_xrt / c_dec, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
