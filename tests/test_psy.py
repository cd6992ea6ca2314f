import ctypes as C
import subprocess

import numpy as np
import pytest

from vorbis_tpu.models import encsetup
from vorbis_tpu.ops import psy as P


@pytest.fixture(scope="module", autouse=True)
def _reflib_built():
    subprocess.run(["sh", "tools/build_reflib.sh"], check=True,
                   capture_output=True)


CONFIGS = [(2, 44100, 0.5), (2, 44100, -0.1), (2, 48000, 1.0),
           (2, 22050, 0.0), (1, 11025, 0.3), (2, 32000, 0.6),
           (6, 48000, 0.4), (2, 44100, 0.27)]


@pytest.mark.parametrize("ch,rate,q", CONFIGS)
def test_psy_masks_bit_exact(ch, rate, q):
    from tests import psy_oracle
    es = encsetup.setup_vbr(ch, rate, q)
    for blk in range(len(es.psy_params)):
        p_, g = es.psy_params[blk], es.psy_global
        n = es.vi.blocksizes[p_["blockflag"]] // 2
        po = psy_oracle.PsyOracle(p_, g, n, rate)
        look = P.PsyLook(p_, g, n, rate)

        # bark/ath/octave tables must match the reference look exactly
        base = C.addressof(po.lk)
        addr = C.cast(C.c_void_p(base + 48),
                      C.POINTER(C.c_void_p)).contents.value
        refbark = np.ctypeslib.as_array(
            C.cast(C.c_void_p(addr), C.POINTER(C.c_long)), shape=(n,))
        assert np.array_equal(refbark, look.bark)

        postes = [-1.0] if blk != 2 else [-1.0, 2.0, 40.0]
        for ncl in [-1.0, 0.5, 0.9]:
            for poste in postes:
                rng = np.random.RandomState(abs(blk + int(ncl * 10)) + 7)
                logmdct = (rng.rand(n).astype(np.float32) * 70 - 85
                           ).astype(np.float32)
                logmdct[30:40] += 45
                lastmdct = (logmdct + rng.randn(n).astype(np.float32) * 3
                            ).astype(np.float32)
                rm, re_, rn = po.noisemask(logmdct, lastmdct, ncl, poste,
                                           blk)
                mm, me, mn = P.noisemask(look, ncl, logmdct, lastmdct,
                                         poste, blk)
                assert np.array_equal(rm, mm), (blk, ncl, poste)
                assert np.array_equal(re_, me)
                assert np.array_equal(rn[:len(mn)], mn)
        logfft = (rng.rand(n).astype(np.float32) * 70 - 85
                  ).astype(np.float32)
        logfft[50:53] += 55
        assert np.array_equal(po.tonemask(logfft, -5.0, -8.0),
                              P.tonemask(look, logfft, -5.0, -8.0))


def test_postnoise_and_loudnoise():
    from tests import psy_oracle
    es = encsetup.setup_vbr(2, 44100, 0.5)
    p_, g = es.psy_params[3], es.psy_global
    n = 1024
    po = psy_oracle.PsyOracle(p_, g, n, 44100)
    look = P.PsyLook(p_, g, n, 44100)
    rng = np.random.RandomState(3)
    pcm = (rng.randn(2048) * 0.2).astype(np.float32)
    pcm[1200:] *= 0.001
    for mode, lw in [(2, 0), (2, 1), (3, 0), (0, 0)]:
        assert po.postnoise_detection(pcm, mode, lw) == pytest.approx(
            P.postnoise_detection(pcm, len(pcm), mode, lw), rel=1e-6)
    logmdct = (rng.rand(n).astype(np.float32) * 70 - 85).astype(np.float32)
    for bm, lwbm in [(2, 3), (3, 2), (3, 3), (2, 2)]:
        assert po.loudnoise_fix(0.5, logmdct, bm, lwbm) == pytest.approx(
            P.lb_loudnoise_fix(look, 0.5, logmdct, bm, lwbm), abs=1e-6)


@pytest.mark.parametrize("ch,rate,q", [(2, 44100, 0.5), (2, 44100, -0.1),
                                       (6, 44100, 0.5)])
def test_offset_and_mix_bit_exact(ch, rate, q):
    from tests import psy_oracle
    es = encsetup.setup_vbr(ch, rate, q)
    for blk in range(len(es.psy_params)):
        p_, g = es.psy_params[blk], es.psy_global
        n = es.vi.blocksizes[p_["blockflag"]] // 2
        po = psy_oracle.PsyOracle(p_, g, n, rate)
        look = P.PsyLook(p_, g, n, rate)
        partition = p_["normal_partition"] if p_["normal_p"] else 16
        for osel, managed, lwbm, lwno, impad, nw in [
                (1, 0, 0, 1, 0, 0), (1, 0, 3, 3, 0, 1), (0, 1, 2, 1, 7, 0),
                (2, 1, 1, 9, 0, 0)]:
            rng = np.random.RandomState(blk * 10 + osel + 1)
            logmdct = (rng.rand(n).astype(np.float32) * 70 - 85
                       ).astype(np.float32)
            mdct = (rng.randn(n).astype(np.float32) * 0.01
                    ).astype(np.float32)
            noise = (rng.rand(n).astype(np.float32) * 30 - 60
                     ).astype(np.float32)
            tone = (rng.rand(n).astype(np.float32) * 30 - 70
                    ).astype(np.float32)
            lastbuf = np.full(2048, -90, np.float32)
            lastbuf[:n] = (logmdct + rng.randn(n).astype(np.float32) * 4)[:n]
            tempbuf = np.full(256, -90, np.float32)
            if n <= 256:
                tempbuf[:n] = logmdct[:n] - 3
            npk = np.zeros(max(n // partition, 1), np.float32)
            npk[::3] = 0.5
            eb = es.block_lowpassr[p_["blockflag"]]
            r_mask, r_mdct, r_last, r_temp, r_npk = po.offset_and_mix(
                noise, tone, osel, managed, mdct, logmdct, lastbuf,
                tempbuf, 0.5, npk, eb, blk, nw, lwbm, lwno, impad)
            my_mdct = mdct.copy()
            my_last = lastbuf.copy()
            my_temp = tempbuf.copy()
            my_npk = npk.copy()
            m_mask = P.offset_and_mix(look, noise, tone, osel, managed,
                                      my_mdct, logmdct, my_last, my_temp,
                                      0.5, my_npk, eb, blk, nw, lwbm,
                                      lwno, impad)
            assert np.array_equal(r_mask, m_mask)
            assert np.array_equal(r_mdct, my_mdct)
            assert np.array_equal(r_last, my_last)
            assert np.array_equal(r_temp[:256], my_temp[:256])
            assert np.array_equal(r_npk[:len(my_npk)], my_npk)


@pytest.mark.parametrize("ch,rate,q", [(2, 44100, 0.5), (6, 44100, 0.5),
                                       (1, 44100, 0.4)])
def test_couple_quantize_normalize_bit_exact(ch, rate, q):
    from tests import psy_oracle
    es = encsetup.setup_vbr(ch, rate, q)
    for bf in [0, 1]:
        psyidx = min(bf * 2 + 1, len(es.psy_params) - 1)
        p_, g = es.psy_params[psyidx], es.psy_global
        n = es.vi.blocksizes[p_["blockflag"]] // 2
        po = psy_oracle.PsyOracle(p_, g, n, rate)
        look = P.PsyLook(p_, g, n, rate)
        partition = p_["normal_partition"] if p_["normal_p"] else 16
        mp = es.vi.maps[min(p_["blockflag"], len(es.vi.maps) - 1)]
        for blobno in [7, 0, 14]:
            rng = np.random.RandomState(bf * 31 + blobno + 2)
            mdct = [(rng.randn(n).astype(np.float32) * 0.01
                     ).astype(np.float32) for _ in range(ch)]
            enpeak = [np.where(rng.rand(n) < 0.1, rng.rand(n) * 5, 0
                               ).astype(np.float32) for _ in range(ch)]
            nepk = [(rng.rand(max(n // partition, 1)).astype(np.float32)
                     * 1.2 - 0.1).astype(np.float32) for _ in range(ch)]
            iwk = [rng.randint(0, 256, size=n).astype(np.int32)
                   for _ in range(ch)]
            nzr = [1] * ch
            slp = g["sliding_lowpass"][p_["blockflag"]][blobno]
            lpr = es.block_lowpassr[p_["blockflag"]]
            if lpr % partition:
                lpr = (lpr // partition + 1) * partition
            r_iw, r_nz, r_nep = po.couple_quantize_normalize(
                blobno, mp, ch, mdct, enpeak, nepk, iwk, nzr, slp, lpr)
            my_iw = [w.astype(np.int64).copy() for w in iwk]
            my_nz = list(nzr)
            my_nep = [x.copy() for x in nepk]
            P.couple_quantize_normalize(
                blobno, g, look, mp, [m.copy() for m in mdct],
                [e.copy() for e in enpeak], my_nep, my_iw, my_nz, slp,
                ch, lpr)
            for a, b in zip(r_iw, my_iw):
                assert np.array_equal(a, b)
            assert list(r_nz) == my_nz
            for a, b in zip(r_nep, my_nep):
                assert np.array_equal(a, b)
