"""TPU pipeline tests on the virtual CPU mesh (conftest forces
JAX_PLATFORMS=cpu with 8 host devices)."""

import numpy as np
import pytest

from tests import oracle
from vorbis_tpu.models.pipeline import TpuCodecPipeline, make_sharded_step
from vorbis_tpu.ops import psy as PSY
from vorbis_tpu.ops.mdct import mdct_forward
from vorbis_tpu.ops.window import hybrid_window
from vorbis_tpu.utils.scales import todB

f32 = np.float32


@pytest.fixture(scope="module")
def pipe():
    return TpuCodecPipeline(ch=2, rate=44100, quality=0.5)


def _frames(pipe, seconds=0.6):
    pcm = oracle.make_test_signal(seconds=seconds)
    return pipe.frame(pcm)[0]  # channel 0: (F, n)


def test_device_mdct_close(pipe):
    """The device window+MDCT fast path (MXU matmul basis at HIGHEST
    precision) matches the bit-exact butterfly kernel to ~1 ulp."""
    fr = _frames(pipe)
    md, logmdct, _ = map(np.asarray, pipe.encode_step(fr))
    w = fr * hybrid_window(pipe.setup.vi.blocksizes[0], pipe.n, 1, 1, 1)
    want = np.asarray(mdct_forward(w, pipe.n))
    scale = np.abs(want).max()
    assert np.abs(md - want).max() <= 2e-6 * scale
    want_log = todB(want) + f32(0.345)
    assert np.abs(logmdct - want_log).max() <= 1e-3


def test_device_noise_mask_close(pipe):
    """Device bark noise mask tracks the exact scalar noisemask within
    a small tolerance (fast path skips ntfix and reassociates float
    sums; it must not drift)."""
    fr = _frames(pipe)
    md, logmdct, noise = map(np.asarray, pipe.encode_step(fr))
    look = pipe.analysis.look
    noff = np.asarray(look.noiseoffset[1], np.float32)[:pipe.n // 2]
    for k in range(0, fr.shape[0], 7):
        exact, _, _ = PSY.noisemask(look, -1.0, logmdct[k],
                                    np.zeros(2048, np.float32), -1.0, 3)
        got = noise[k] - noff
        diff = np.abs(got - exact)
        # ntfix only edits the first tonefix_end bins; beyond it the
        # only differences are float reassociation
        nx = look.tonefix_end
        assert np.percentile(diff[nx:], 99) < 0.75, diff[nx:].max()
        assert diff.mean() < 1.0


def test_device_tonemask_tracks_exact(pipe):
    """Fast-path tone mask (segment seeding + sliding-max chase) stays
    within ~2 dB of the exact scalar tonemask at p95."""
    rng = np.random.RandomState(1)
    look = pipe.analysis.look
    lf = (rng.randn(6, 1024).astype(np.float32) * 12 - 40)
    gm = np.minimum(lf.max(-1), 0.0).astype(np.float32)
    import jax
    dev = np.asarray(jax.jit(pipe.analysis.tonemask)(lf, gm, gm))
    exact = np.stack([PSY.tonemask(look, lf[b], float(gm[b]),
                                   float(gm[b]))
                      for b in range(len(lf))])
    d = np.abs(dev - exact)
    assert d.mean() < 0.75, d.mean()
    assert np.percentile(d, 95) < 3.0


def test_mask_step_shapes(pipe):
    fr = _frames(pipe, seconds=0.3)
    md, logmdct, mask = map(np.asarray, pipe.mask_step(fr))
    assert md.shape == logmdct.shape == mask.shape \
        == (fr.shape[0], pipe.n // 2)
    assert np.isfinite(mask).all()
    # the mask must sit at/above the ATH floor everywhere
    att = max(float(np.minimum(logmdct.max(), 0.0))
              + pipe.analysis.look.vi["ath_adjatt"],
              pipe.analysis.look.vi["ath_maxatt"])
    assert mask.min() >= np.asarray(pipe.analysis.ath).min() + att - 1.0


def test_device_synthesis_overlap_add(pipe):
    """Overlap-add across the frame axis equals the serial lapping."""
    rng = np.random.RandomState(1)
    spec = rng.randn(5, pipe.n // 2).astype(np.float32)
    out = np.asarray(pipe.synthesis(spec))
    from vorbis_tpu.ops.mdct import imdct
    w = hybrid_window(pipe.n // 8, pipe.n, 1, 1, 1)
    pcm = np.asarray(imdct(spec, pipe.n)) * w
    n2 = pipe.n // 2
    want = pcm[:, :n2].copy()
    want[1:] += pcm[:-1, n2:]
    assert np.abs(out - want.reshape(-1)).max() <= 2e-6 * np.abs(
        want).max()


def test_sharded_step_matches_single_device(pipe):
    """The dp x sp sharded roundtrip step produces the same result as
    the unsharded step.  The input is scaled so every keep-mask
    decision (logmdct >= noise) sits far from the threshold — under
    that condition sharding must not change a single sample beyond
    float reassociation noise."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        devs = jax.devices("cpu")
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("dp", "sp"))
    rng = np.random.RandomState(0)
    # loud pure tones: their bins clear the mask by tens of dB, and the
    # masked-out bins sit tens of dB under it — no threshold flips
    t = np.arange(pipe.n)
    base = (0.5 * np.sin(2 * np.pi * 0.013 * t)
            + 0.25 * np.sin(2 * np.pi * 0.071 * t)).astype(np.float32)
    frames = np.broadcast_to(
        base, (4, 2, 8, pipe.n)).astype(np.float32).copy()
    frames *= (1.0 + 0.01 * rng.randn(4, 2, 8, 1).astype(np.float32))
    step = make_sharded_step(pipe, mesh)
    with mesh:
        pcm_sh, err_sh = map(np.asarray, step(frames))
    pcm, err = map(np.asarray, jax.jit(pipe.roundtrip_step)(frames))
    assert pcm_sh.shape == pcm.shape
    assert np.abs(err_sh - err) < 1e-6, (err_sh, err)
    scale = np.abs(pcm).max()
    assert np.abs(pcm_sh - pcm).max() <= 1e-5 * scale


def test_sharded_encode_packets_bitwise_identical():
    """The REAL production encode step (floor fit + wrap coding +
    residue VQ + Huffman + bit packing) sharded over the full mesh
    emits packets BITWISE IDENTICAL to the single-device step: the
    pipeline is per-frame, so sharding must not change one bit."""
    import jax
    from jax.sharding import Mesh

    from vorbis_tpu.models.fastenc import FastEncoder
    from vorbis_tpu.ops.encdevice import DeviceFastEncode
    from vorbis_tpu.parallel import sharded_encode_step

    devs = jax.devices()
    if len(devs) < 8:
        devs = jax.devices("cpu")
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("dp", "sp"))
    fe = FastEncoder(2, 44100, 0.5)
    F = 16
    dev = DeviceFastEncode(fe, chunk_packets=F)
    rng = np.random.RandomState(0)
    frames = (rng.randn(F, fe.ch, fe.n) * 0.1).astype(np.float32)
    step = sharded_encode_step(dev, mesh, F)
    with mesh:
        pk_sh, nb_sh = map(np.asarray, step(frames))
    pk, nb = map(np.asarray, jax.jit(dev.make_framed_step(F))(frames))
    assert np.array_equal(nb_sh, nb)
    assert np.array_equal(pk_sh, pk)
    assert (nb > 0).all()


def test_graft_entry_contracts():
    import __graft_entry__ as g
    import jax

    fn, args = g.entry()
    pk, nb = jax.jit(fn)(*args)
    pk, nb = np.asarray(pk), np.asarray(nb)
    assert pk.ndim == 2 and pk.dtype == np.uint8
    assert nb.shape == (pk.shape[0],) and (nb > 0).all()
    g.dryrun_multichip(8)


def test_fastpath_ampmax_drift_bounded(pipe):
    """The stateful fast path threads _vp_ampmax_decay exactly (a
    host scalar recurrence over the probe pass's per-frame peaks,
    ops/psydevice.ampmax_seq); with the true global cap the tone mask
    must track the exact stateful chain within 3 dB even on the first
    quiet frame after a loud one (psy.c:4504; VERDICT round-2 item
    4's done-criterion)."""
    import jax
    from vorbis_tpu.ops import psy as PSY2
    from vorbis_tpu.utils.scales import todB

    rate = 44100
    n = pipe.n
    rng = np.random.RandomState(0)
    # loud tonal frame followed by quiet frames
    t = np.arange(n)
    loud = (0.8 * np.sin(2 * np.pi * 0.021 * t)).astype(np.float32)
    quiet = (0.002 * np.sin(2 * np.pi * 0.021 * t)
             + 1e-4 * rng.randn(n)).astype(np.float32)
    frames = np.stack([loud] + [quiet] * 6)
    md, logmdct, mask_fast = map(np.asarray,
                                 jax.jit(pipe.analysis.full_mask)(frames))

    # exact stateful chain: ampmax decays from the loud frame
    look = pipe.analysis.look
    from vorbis_tpu.ops.window import hybrid_window
    w = frames * hybrid_window(pipe.setup.vi.blocksizes[0], n, 1, 1, 1)
    sp = np.fft.rfft(w, axis=-1)[..., :n // 2]
    power = (sp.real ** 2 + sp.imag ** 2).astype(np.float32)
    scale = np.float32(4.0 / n)
    logfft = (todB(power * (scale * scale)) * np.float32(0.5)
              + np.float32(0.69))
    from vorbis_tpu.ops import psydevice as PD
    F = len(frames)
    locals_ = np.minimum(logfft.max(-1), 0.0).astype(np.float32)
    amp_seq = PD.ampmax_seq(
        locals_, np.ones(F, np.int64), pipe.setup.vi.blocksizes,
        rate, pipe.setup.psy_global["ampmax_att_per_sec"])

    ampmax = -9999.0
    drift = []
    for k in range(F):
        ampmax = float(PSY2.ampmax_decay(
            np.float32(ampmax), rate, n // 2,
            np.float32(pipe.setup.psy_global["ampmax_att_per_sec"])))
        local = float(min(logfft[k].max(), 0.0))
        ampmax = max(ampmax, local)
        # the host recurrence reproduces the exact C sequence
        assert abs(amp_seq[k] - ampmax) < 1e-3, (k, amp_seq[k], ampmax)
        exact_tone = PSY2.tonemask(look, logfft[k], ampmax, local)
        fast_tone = np.asarray(jax.jit(pipe.analysis.tonemask)(
            logfft[k:k + 1],
            np.asarray([amp_seq[k]], np.float32),
            np.asarray([local], np.float32)))[0]
        d = np.abs(fast_tone - exact_tone)
        drift.append(float(np.mean(d)))
    # with the true global ampmax threaded, even the first quiet
    # frame after the loud one stays within 3 dB of the exact chain
    assert max(drift) < 3.0, drift
