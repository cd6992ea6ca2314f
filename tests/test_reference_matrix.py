"""The reference acceptance test (test/test.c): windowed-sine round
trips across channels/qualities/rates must preserve peak amplitude
within .15 - .1*q of 0.95.  Run here in both directions: our encoder
-> our decoder, and our encoder -> stock libvorbis decoder."""

import numpy as np
import pytest

from tests import oracle
from vorbis_tpu.codec.encoder import encode_vbr_stream
from vorbis_tpu.vorbisfile import OggVorbisFile

DATA_LEN = 2048


def gen_windowed_sine(maximum=0.95):
    """test/util.c gen_windowed_sine."""
    data = np.zeros(DATA_LEN, np.float32)
    n = DATA_LEN // 2
    k = np.arange(n)
    s = np.sin(2.0 * k * np.pi / 32.0 + 0.4)
    s *= maximum * (0.5 - 0.5 * np.cos(2.0 * np.pi * k / (n - 1)))
    data[:n] = s
    return data


# a representative slice of the 528-case reference matrix (full sweep
# is minutes of pure-python encode; the golden-packet tests already pin
# byte-exactness across configs)
MATRIX = [
    (1, 44100, -0.05), (1, 22050, 0.45), (1, 16000, 0.15),
    (2, 44100, 0.45), (2, 48000, 0.75), (2, 32000, 0.05),
    (2, 44100, 0.95), (6, 44100, 0.45), (8, 44100, 0.45),
    (2, 96000, 0.45),
]


@pytest.mark.parametrize("ch,rate,q", MATRIX)
def test_windowed_sine_roundtrip(tmp_path, ch, rate, q):
    mono = gen_windowed_sine()
    pcm = np.tile(mono, (ch, 1))
    ogg = encode_vbr_stream(pcm, rate, q)
    allowable = 0.15 - 0.1 * q
    # direction 1: our decoder
    out = OggVorbisFile(ogg).read_all_float()
    assert out.shape[0] == ch
    max_abs = float(np.abs(out).max())
    assert 0.95 - allowable <= max_abs <= 0.95 + allowable, max_abs
    # direction 2: the stock system decoder (validates bit syntax and
    # the same amplitude contract)
    path = str(tmp_path / "t.ogg")
    with open(path, "wb") as f:
        f.write(ogg)
    got, r2 = oracle.decode_float(path)
    assert r2 == rate
    m2 = float(np.abs(got).max())
    assert 0.95 - allowable <= m2 <= 0.95 + allowable, m2
