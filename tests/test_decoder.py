import subprocess

import numpy as np
import pytest

from tests import oracle
from vorbis_tpu.bitstream import OggStreamReader
from vorbis_tpu.codec.decoder import decode_ogg


@pytest.fixture(scope="module", autouse=True)
def _reflib_built():
    subprocess.run(["sh", "tools/build_reflib.sh"], check=True,
                   capture_output=True)


def _roundtrip(q, rate, ch, seconds=0.5, managed=None, kind="mix"):
    pcm = oracle.make_test_signal(rate=rate, seconds=seconds, ch=ch, kind=kind)
    path = f"/tmp/_dec_{q}_{rate}_{ch}.ogg"
    data = oracle.encode_vbr(pcm, rate, q, path, managed_kbps=managed)
    pkts = list(OggStreamReader(data).packets())
    golden = oracle.reflib().decode_packets(pkts)
    mine, vi = decode_ogg(data)
    return golden, mine, vi


@pytest.mark.parametrize("q,rate,ch", [
    (0.3, 44100, 2),    # BASELINE config 1 (q3 44.1 stereo)
    (0.5, 44100, 2),    # q5
    (-0.1, 44100, 2),   # lowest quality, 512/4096 blocks
    (1.0, 44100, 2),    # highest quality
    (0.4, 48000, 6),    # 5.1 coupled surround
    (0.2, 8000, 1),     # low-rate mono
    (0.0, 22050, 2),
    (0.5, 96000, 2),
])
def test_decode_bit_exact_vs_reference(q, rate, ch):
    golden, mine, vi = _roundtrip(q, rate, ch)
    assert mine.shape == golden.shape
    assert np.array_equal(mine, golden), (
        f"decode not bit-exact: maxdiff={np.abs(mine-golden).max()}")


def test_decode_managed_bitrate_stream():
    golden, mine, vi = _roundtrip(0.0, 44100, 2, managed=128)
    assert np.array_equal(mine, golden)


def test_decode_close_to_system_libvorbis():
    # stock libvorbis differs from the aoTuV reference by ~1 ulp in the
    # scalar IMDCT; we match the reference exactly and stock within ulps
    pcm = oracle.make_test_signal(seconds=0.5)
    data = oracle.encode_vbr(pcm, 44100, 0.5, "/tmp/_dec_sys.ogg")
    golden_sys, _ = oracle.decode_float("/tmp/_dec_sys.ogg")
    mine, _ = decode_ogg(data)
    assert mine.shape == golden_sys.shape
    assert np.abs(mine - golden_sys).max() < 1e-6


def test_decode_truncated_and_corrupt_streams_dont_crash():
    pcm = oracle.make_test_signal(seconds=0.5)
    data = oracle.encode_vbr(pcm, 44100, 0.5, "/tmp/_dec_fuzz.ogg")
    for cut in [len(data) // 3, len(data) // 2, len(data) - 17]:
        decode_ogg(data[:cut])
    rng = np.random.RandomState(0)
    for _ in range(5):
        bad = bytearray(data)
        for _ in range(20):
            bad[rng.randint(200, len(bad))] ^= 1 << rng.randint(8)
        try:
            decode_ogg(bytes(bad))
        except (ValueError, KeyError, EOFError):
            pass  # typed codec errors are fine; anything else is a bug
