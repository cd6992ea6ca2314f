"""Oversized-packet redo path (VERDICT r2 weak #8).

The device encode packs packets into a fixed per-frame byte budget
``plan.wb``; a frame whose packet overflows it triggers a redo of the
whole batch at the static worst case ``plan.worst_bytes``
(models/fastenc.py run_finish / _run_gather_batches).  These tests
force the redo by shrinking the budget below the typical packet size
and assert the emitted stream is byte-identical to the normal-budget
encode — proving the redo path emits correct packets, not just
non-crashing ones."""

import numpy as np

from vorbis_tpu.models.fastenc import FastEncoder


def _pcm(secs=3, rate=44100, seed=11):
    rng = np.random.RandomState(seed)
    t = np.arange(secs * rate) / rate
    x = (0.30 * np.sin(2 * np.pi * 440 * t)[None, :]
         + 0.10 * np.sin(2 * np.pi * 1873 * t)[None, :]
         + 0.05 * rng.randn(2, secs * rate))
    return np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)


def test_oversized_packet_redo_identical_stream():
    pcm = _pcm()
    ref = FastEncoder(2, 44100, 0.5).encode_batch(
        [pcm], B_long=128, B_short=64)[0]

    fe = FastEncoder(2, 44100, 0.5)
    # force every batch through the redo: q5 stereo packets average
    # ~420 bytes, far over a 96-byte budget
    fe.dev.plan.wb = 96
    assert fe.dev.plan.worst_bytes > 96
    ogg = fe.encode_batch([pcm], B_long=128, B_short=64)[0]
    assert ogg == ref


def test_oversized_packet_redo_stateless_path():
    pcm = _pcm(seed=12)
    ref = FastEncoder(2, 44100, 0.5, psy_state=False).encode_batch(
        [pcm], B_long=128, B_short=64)[0]
    fe = FastEncoder(2, 44100, 0.5, psy_state=False)
    fe.dev.plan.wb = 96
    ogg = fe.encode_batch([pcm], B_long=128, B_short=64)[0]
    assert ogg == ref
