"""Device (batched JAX) psy path vs the exact scalar port.

The exact port in ops/psy.py is itself oracle-tested bit-for-bit
against the compiled reference (tests/test_psy.py); these tests hold
the *device* fast path to it wherever the device path claims exact
semantics (long blocks have no M3 state, so offset_and_mix with
low_compand disabled must agree bitwise on the mask and to ~1 ulp on
the M1-scaled mdct)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vorbis_tpu.models import encsetup
from vorbis_tpu.ops import psy as P
from vorbis_tpu.ops.jaxdsp import DeviceAnalysis


@pytest.mark.parametrize("ch,rate,q", [(2, 44100, 0.4), (2, 48000, 0.8),
                                       (2, 32000, 0.1)])
def test_offset_and_mix_m1_m4_long_block(ch, rate, q):
    es = encsetup.setup_vbr(ch, rate, q)
    da = DeviceAnalysis(es, blocktype=3, rate=rate, W=1)
    look = da.look
    n = look.n
    vif_n = int(es.floor_full[1 if len(es.floor_full) > 1 else 0]["n"])
    rng = np.random.RandomState(11)
    for sel in (0, 1, 2):
        for _ in range(3):
            logmdct = (rng.rand(n) * 70 - 85).astype(np.float32)
            logmdct[100:130] += 40
            noise = (logmdct + rng.randn(n) * 6).astype(np.float32)
            tone = (logmdct + rng.randn(n) * 8).astype(np.float32)
            md = (rng.randn(n) * 0.2).astype(np.float32)

            md_exact = md.copy()
            lastm = np.zeros(2048, np.float32)
            tempm = np.zeros(2048, np.float32)
            npk = np.zeros(256, np.float32)
            # block_mode=3 (long): the reference's M3 path is inert and
            # lastmdct is write-only, so the scalar result is the
            # stateless core the device path implements
            mask = P.offset_and_mix(look, noise.copy(), tone.copy(),
                                    sel, 0, md_exact, logmdct, lastm,
                                    tempm, -1.0, npk, vif_n, 3, 1, 3,
                                    1, 0)
            dmd, dmask = da.offset_and_mix(
                jnp.asarray(md), jnp.asarray(logmdct),
                jnp.asarray(noise), jnp.asarray(tone), sel)
            assert np.array_equal(np.asarray(dmask), mask), (sel,)
            np.testing.assert_allclose(np.asarray(dmd), md_exact,
                                       rtol=3e-6, atol=1e-7)


def _exact_fit_inputs(look, logmdct):
    """The bark-fit intermediates exactly as _vp_noisemask computes
    them (including the double-subtraction float order)."""
    n = look.n
    fixed = int(look.vi["noisewindowfixed"])
    m1 = P.bark_noise_hybridmp(n, look.bark, logmdct, 140.0, -1)
    work = (logmdct - m1).astype(np.float32)
    m2 = P.bark_noise_hybridmp(n, look.bark, work, 0.0, fixed)
    fit1 = (logmdct - work).astype(np.float32)
    dB = (m2.astype(np.float64) + 0.5).astype(np.int64)
    np.clip(dB, 0, P.NOISE_COMPAND_LEVELS - 1, out=dB)
    return fit1, dB


def test_m3_impulse_run_matches_exact():
    """A run of consecutive impulse short blocks: the device tempmdct
    scan + elementwise M3 vs the exact sequential offset_and_mix.
    The only sanctioned deviation is the spread update's pre-update
    conditions, so bins are compared with a small flip allowance."""
    from vorbis_tpu.ops import psydevice as PD
    es = encsetup.setup_vbr(2, 44100, 0.5)
    da = DeviceAnalysis(es, blocktype=0, rate=44100, W=0)
    look = da.look
    n = look.n
    assert n == 128
    vif_n = int(es.floor_full[0]["n"])
    F = 6
    rng = np.random.RandomState(21)
    logmdct = (rng.rand(F, n).astype(np.float32) * 60 - 80
               ).astype(np.float32)
    logmdct[:, 10:20] += 35
    noise = (logmdct + rng.randn(F, n).astype(np.float32) * 6
             ).astype(np.float32)
    tone = (logmdct + rng.randn(F, n).astype(np.float32) * 8
            ).astype(np.float32)
    md = (rng.randn(F, n).astype(np.float32) * 0.3).astype(np.float32)

    ann = PD.annotate_frames(np.zeros(F, np.int64), np.ones(F, bool))
    toneatt1 = float(look.vi["tone_masteratt"][1])
    params = PD.m3_param_seq(ann, n, toneatt1, True)

    # exact sequential reference
    lastm = np.zeros(2048, np.float32)
    tempm = np.zeros(2048, np.float32)
    masks_e = []
    md_e = md.copy()
    npk_e = []
    nparts = max(n // (look.vi["normal_partition"]
                       if look.vi["normal_p"] else 16), 1)
    for f in range(F):
        npk = np.zeros(256, np.float32)
        m = P.offset_and_mix(look, noise[f].copy(), tone[f].copy(),
                             1, 0, md_e[f], logmdct[f], lastm, tempm,
                             -1.0, npk, vif_n, 0, 0,
                             int(ann["lW_bm"][f]),
                             int(ann["lW_no"][f]),
                             int(ann["impadnum"][f]))
        masks_e.append(m)
        npk_e.append(npk[:nparts].copy())

    # device: batched with the scan-provided tempmdct
    noff = np.asarray(look.noiseoffset, np.float32)[1][:n]
    val = np.minimum(noise + noff, np.float32(look.vi["noisemaxsupp"])
                     ).astype(np.float32)
    tval = (tone + np.float32(toneatt1)).astype(np.float32)
    lastrows = np.concatenate([np.zeros((1, n), np.float32),
                               logmdct[:-1]])  # identity resample
    shp = (F, 1, n)
    pj = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
          for k, v in params.items()}
    temps = PD.m3_tempmdct_scan(look, jnp.asarray(logmdct.reshape(shp)),
                                jnp.asarray(lastrows.reshape(shp)),
                                jnp.asarray(val.reshape(shp)),
                                jnp.asarray(tval.reshape(shp)), params)
    npk0 = jnp.zeros((F, 1, nparts), jnp.float32)
    v2, t2, npk2 = PD.m3_apply(look, jnp.asarray(val.reshape(shp)),
                               jnp.asarray(tval.reshape(shp)),
                               jnp.asarray(logmdct.reshape(shp)),
                               jnp.asarray(lastrows.reshape(shp)),
                               temps, npk0, params,
                               ann["impadnum"] == 0)
    dmd, dmask = da.mix_m4_m1(jnp.asarray(md.reshape(shp)),
                              jnp.asarray(logmdct.reshape(shp)),
                              v2, t2, 1)
    dmask = np.asarray(dmask).reshape(F, n)
    dmd = np.asarray(dmd).reshape(F, n)
    for f in range(F):
        close = np.isclose(dmask[f], masks_e[f], rtol=1e-4, atol=1e-3)
        frac = close.mean()
        assert frac >= 0.97, (f, frac)
        mclose = np.isclose(dmd[f], md_e[f], rtol=1e-3, atol=1e-5)
        assert mclose.mean() >= 0.97, (f, mclose.mean())
        nk = np.asarray(npk2)[f, 0]
        agree = (nk == npk_e[f]).mean()
        assert agree >= 0.85, (f, agree, nk, npk_e[f])


@pytest.mark.parametrize("blk,bm", [(3, 3), (3, 2), (2, 2), (0, 0),
                                    (1, 1)])
def test_noisemask_tail_matches_exact(blk, bm):
    from vorbis_tpu.ops import psydevice as PD
    es = encsetup.setup_vbr(2, 44100, 0.5)
    p_, g = es.psy_params[blk], es.psy_global
    n = es.vi.blocksizes[p_["blockflag"]] // 2
    look = P.PsyLook(p_, g, n, 44100)
    rng = np.random.RandomState(5)
    kind = "short" if bm <= 1 else "long"
    for ncl in (-1.0, 0.5):
        for poste in ((-1.0, 2.0, 40.0) if bm == 2 else (-1.0,)):
            logmdct = (rng.rand(n).astype(np.float32) * 70 - 85
                       ).astype(np.float32)
            logmdct[20:30] += 45
            logmdct[60:64] += 30
            lastmdct = (logmdct
                        + rng.randn(n).astype(np.float32) * 5
                        ).astype(np.float32)
            em, ee, en = P.noisemask(look, ncl, logmdct, lastmdct,
                                     poste, bm)
            fit1, dB = _exact_fit_inputs(look, logmdct)
            lm, ep, npk = PD.noisemask_tail(
                look, jnp.asarray(logmdct[None]),
                jnp.asarray(fit1[None]),
                jnp.asarray(dB.astype(np.int32)[None]),
                jnp.asarray(np.float32([ncl])),
                jnp.asarray(np.float32([poste])),
                jnp.asarray(lastmdct[None]), kind,
                trans_active=jnp.asarray([bm == 2]))
            np.testing.assert_allclose(np.asarray(lm)[0], em,
                                       rtol=2e-5, atol=2e-4,
                                       err_msg=f"{blk},{bm},{ncl}")
            np.testing.assert_allclose(np.asarray(ep)[0], ee,
                                       rtol=2e-5, atol=2e-4)
            np.testing.assert_allclose(np.asarray(npk)[0],
                                       en[:npk.shape[-1]],
                                       rtol=1e-5, atol=1e-5)
