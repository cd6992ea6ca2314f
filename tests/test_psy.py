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
