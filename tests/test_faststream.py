"""Incremental chunked fast decode (models/fastdec.py
FastStreamDecoder + vorbisfile integration): ov_read-style streaming
reads, post-seek reads, and halfrate must ride the fused native drain
while staying bit-exact with the per-packet scalar path (reference
read loop: lib/vorbisfile.c:1680-1779,2252)."""

import numpy as np
import pytest

from tests import oracle
from vorbis_tpu.codec.encoder import encode_vbr_stream
from vorbis_tpu.vorbisfile import OggVorbisFile


@pytest.fixture(scope="module")
def stream():
    """A block-switching stream (clicks force short/long mixes, the
    hardest case for chunked lap state)."""
    rate = 44100
    t = np.arange(2 * rate) / rate
    mono = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    for k in range(16):
        mono[int((k + 0.5) * rate / 8)] = 0.9
    pcm = np.stack([mono, mono * 0.8])
    return pcm, encode_vbr_stream(pcm, rate, 0.4)


def _read_chunks(vf, sizes):
    out = []
    i = 0
    while True:
        c = vf.read_float(sizes[i % len(sizes)])
        i += 1
        if c.shape[1] == 0:
            break
        out.append(c)
    return (np.concatenate(out, 1) if out
            else np.zeros((vf.info().channels, 0), np.float32))


def test_incremental_reads_bitexact_vs_scalar(stream):
    _, ogg = stream
    sizes = [1000, 313, 4097, 64, 20000]
    vf = OggVorbisFile(ogg)
    assert vf._fast is not None          # the drain path is active
    fast = _read_chunks(vf, sizes)
    vs = OggVorbisFile(ogg)
    vs._fast = None                      # force the scalar path
    ref = _read_chunks(vs, sizes)
    assert fast.shape == ref.shape
    assert np.array_equal(fast, ref)     # bit-exact


def test_incremental_equals_whole_stream_drain(stream):
    _, ogg = stream
    from vorbis_tpu.models.fastdec import decode_ogg_fast
    whole, _ = decode_ogg_fast(ogg)
    vf = OggVorbisFile(ogg)
    inc = _read_chunks(vf, [8192])
    assert np.array_equal(inc, whole)


def test_post_seek_reads_bitexact(stream):
    pcm, ogg = stream
    from vorbis_tpu.models.fastdec import decode_ogg_fast
    whole, _ = decode_ogg_fast(ogg)
    for pos in (1, 4096, 30000, 44100 + 777, whole.shape[1] - 100):
        vf = OggVorbisFile(ogg)
        vf.pcm_seek(pos)
        assert vf._fast is not None
        got = _read_chunks(vf, [5000])
        assert np.array_equal(got, whole[:, pos:]), pos


def test_seek_read_uses_fast_path_not_scalar(stream):
    """The post-seek read must never fall back to per-packet scalar
    decode (the round-4 'orders of magnitude slower' cliff)."""
    _, ogg = stream
    vf = OggVorbisFile(ogg)
    vf.pcm_seek(30011)
    calls = {"n": 0}
    orig = vf._decoder.decode_packet

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    vf._decoder.decode_packet = spy
    out = vf.read_all_float()
    assert out.shape[1] > 0
    assert calls["n"] == 0               # scalar decoder untouched


def test_halfrate_incremental_bitexact(stream):
    _, ogg = stream
    vf = OggVorbisFile(ogg)
    vf.halfrate(True)
    assert vf._fast is not None and vf._fast.hs == 1
    fast = _read_chunks(vf, [3000])
    vs = OggVorbisFile(ogg)
    vs.halfrate(True)
    vs._fast = None
    ref = _read_chunks(vs, [3000])
    assert np.array_equal(fast, ref)


def test_halfrate_seek_incremental(stream):
    _, ogg = stream
    vf = OggVorbisFile(ogg)
    vf.halfrate(True)
    full = _read_chunks(vf, [10000])
    vf2 = OggVorbisFile(ogg)
    vf2.halfrate(True)
    vf2.pcm_seek(40000)                  # full-rate units
    got = _read_chunks(vf2, [10000])
    assert np.array_equal(got, full[:, 20000:])


def test_chained_stream_incremental(stream):
    pcm, ogg = stream
    pcm2 = oracle.make_test_signal(seconds=0.7, seed=5)
    ogg2 = encode_vbr_stream(pcm2, 44100, 0.5, serialno=99)
    chained = ogg + ogg2
    vf = OggVorbisFile(chained)
    fast = _read_chunks(vf, [7777])
    vs = OggVorbisFile(chained)
    vs._fast = None
    # keep the scalar path across link reopens
    orig = vs._open_link

    def open_scalar(link, from_off=None):
        orig(link, from_off)
        vs._fast = None

    vs._open_link = open_scalar
    ref = _read_chunks(vs, [7777])
    assert np.array_equal(fast, ref)
    assert fast.shape[1] == vf.pcm_total()


def test_incremental_damaged_page_resyncs(stream):
    """Bit flips mid-stream: the chunked path must resync (hole
    accounting) and keep producing finite PCM, like the scalar loop."""
    _, ogg = stream
    bad = bytearray(ogg)
    for off in range(len(bad) // 3, len(bad) // 3 + 40):
        bad[off] ^= 0xFF
    vf = OggVorbisFile(bytes(bad))
    out = _read_chunks(vf, [4096])
    assert np.isfinite(out).all()
    assert out.shape[1] > 0
    assert vf.hole_count >= 1


def test_incremental_read_int16(stream):
    """ov_read integer output rides the same chunked path."""
    _, ogg = stream
    vf = OggVorbisFile(ogg)
    a = vf.read(4096)
    assert a.dtype == np.int16 and a.shape[1] == 4096
    vs = OggVorbisFile(ogg)
    vs._fast = None
    chunks = []
    got = 0
    while got < 4096:                    # ov_read returns what is
        c = vs.read(4096 - got)          # conveniently available
        if c.shape[1] == 0:
            break
        chunks.append(c)
        got += c.shape[1]
    b = np.concatenate(chunks, 1)
    assert np.array_equal(a, b)
