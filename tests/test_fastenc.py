"""Fast batched encoder tests (models/fastenc.py): device decisions +
host pack must produce valid Vorbis streams."""

import numpy as np
import pytest

from tests import oracle
from vorbis_tpu.models.fastenc import FastEncoder


@pytest.fixture(scope="module")
def fe():
    return FastEncoder(2, 44100, 0.5)


def test_fast_stream_valid_and_exact_length(tmp_path, fe):
    pcm = oracle.make_test_signal(seconds=1.0)
    ogg = fe.encode(pcm)
    path = str(tmp_path / "fast.ogg")
    with open(path, "wb") as f:
        f.write(ogg)
    # the STOCK libvorbis must accept the stream bit syntax
    got, rate = oracle.decode_float(path)
    assert rate == 44100
    assert got.shape == pcm.shape
    assert np.isfinite(got).all()


def test_our_decoder_accepts_fast_stream(fe):
    from vorbis_tpu.vorbisfile import OggVorbisFile
    pcm = oracle.make_test_signal(seconds=0.6)
    vf = OggVorbisFile(fe.encode(pcm))
    out = vf.read_all_float()
    assert out.shape == pcm.shape


def test_fast_quality_on_tonal_content(tmp_path, fe):
    """On steady tonal content (no transients, where long-block-only
    coding is appropriate) the fast path must be competitive with the
    golden encoder."""
    from vorbis_tpu.codec.encoder import encode_vbr_stream
    t = np.arange(44100) / 44100
    pcm = np.stack([
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1873 * t),
        0.4 * np.sin(2 * np.pi * 523 * t)
        + 0.2 * np.sin(2 * np.pi * 2093 * t)]).astype(np.float32)
    pf = str(tmp_path / "f.ogg")
    pg = str(tmp_path / "g.ogg")
    with open(pf, "wb") as f:
        f.write(fe.encode(pcm))
    with open(pg, "wb") as f:
        f.write(encode_vbr_stream(pcm, 44100, 0.5))
    gf, _ = oracle.decode_float(pf)
    gg, _ = oracle.decode_float(pg)
    ef = np.sqrt(np.mean((gf - pcm[:, :gf.shape[1]]) ** 2))
    eg = np.sqrt(np.mean((gg - pcm[:, :gg.shape[1]]) ** 2))
    assert ef < 2.0 * eg, (ef, eg)


def test_fast_silence(fe):
    pcm = np.zeros((2, 22050), np.float32)
    ogg = fe.encode(pcm)
    from vorbis_tpu.vorbisfile import OggVorbisFile
    out = OggVorbisFile(ogg).read_all_float()
    assert out.shape == pcm.shape
    assert np.abs(out).max() < 1e-3
