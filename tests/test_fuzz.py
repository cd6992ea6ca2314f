"""Decoder robustness (reference: contrib/oss-fuzz/decode_fuzzer.cc):
mutated/truncated/garbage streams must never crash the decode stack —
clean errors (OVError) or partial output only."""

import numpy as np
import pytest

from tests import oracle
from vorbis_tpu.codec.decoder import decode_ogg
from vorbis_tpu.codec.headers import BadHeaderError
from vorbis_tpu.vorbisfile import OggVorbisFile, OVError


@pytest.fixture(scope="module")
def ogg():
    from vorbis_tpu.codec.encoder import encode_vbr_stream
    pcm = oracle.make_test_signal(seconds=0.4)
    return encode_vbr_stream(pcm, 44100, 0.4)


ACCEPTABLE = (OVError, BadHeaderError, ValueError)


def _try_decode(data):
    try:
        vf = OggVorbisFile(data)
        out = vf.read_all_float()
        assert np.isfinite(out).all() or out.size == 0
    except ACCEPTABLE:
        pass


def test_random_byte_flips(ogg):
    rng = np.random.RandomState(0)
    buf = bytearray(ogg)
    for trial in range(40):
        data = bytearray(buf)
        for _ in range(int(rng.randint(1, 8))):
            data[int(rng.randint(len(data)))] ^= int(rng.randint(1, 256))
        _try_decode(bytes(data))


def test_random_truncations(ogg):
    rng = np.random.RandomState(1)
    for _ in range(15):
        cut = int(rng.randint(1, len(ogg)))
        _try_decode(ogg[:cut])


def test_random_garbage_prefix_suffix(ogg):
    rng = np.random.RandomState(2)
    junk = rng.bytes(513)
    _try_decode(junk + ogg)
    _try_decode(ogg + junk)
    _try_decode(junk)


def test_header_mutations(ogg):
    """Target the three header packets specifically (the validation
    paths of info.c _vorbis_unpack_info/_books)."""
    rng = np.random.RandomState(3)
    for _ in range(40):
        data = bytearray(ogg)
        pos = int(rng.randint(0, min(4000, len(data))))
        data[pos] ^= int(rng.randint(1, 256))
        _try_decode(bytes(data))


def test_shuffled_pages(ogg):
    """Reordered pages: the reader must resync or fail cleanly."""
    # split at page boundaries
    idx = []
    off = 0
    while True:
        k = ogg.find(b"OggS", off + 1)
        if k < 0:
            break
        idx.append(k)
        off = k
    parts = []
    prev = 0
    for k in idx:
        parts.append(ogg[prev:k])
        prev = k
    parts.append(ogg[prev:])
    rng = np.random.RandomState(4)
    for _ in range(8):
        order = rng.permutation(len(parts))
        _try_decode(b"".join(parts[i] for i in order))


def test_decode_ogg_rejects_cleanly():
    with pytest.raises(Exception):
        decode_ogg(b"OggS" + b"\x00" * 100)
