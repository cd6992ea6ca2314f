"""Native C kernel tests (native/vorbisnative.c via vorbis_tpu.native):
the C paths must agree exactly with the pure-numpy/Python fallbacks."""

import numpy as np
import pytest

from vorbis_tpu import native
from vorbis_tpu.bitstream.bitpack import BitReader, BitWriter


@pytest.fixture(scope="module")
def lib():
    L = native._load()
    if L is None:
        pytest.skip("no C compiler / native lib unavailable")
    return L


def test_pack_bits_matches_bitwriter(lib):
    rng = np.random.RandomState(0)
    for _ in range(20):
        n = int(rng.randint(1, 2000))
        nbits = rng.randint(1, 33, n)
        values = np.array([rng.randint(0, 1 << b) for b in nbits],
                          np.uint64)
        got, total = native.pack_bits(values, nbits)
        w = BitWriter()
        for v, b in zip(values, nbits):
            w.write(int(v), int(b))
        assert total == int(nbits.sum())
        assert got == w.getvalue()


def test_read_fields(lib):
    import ctypes as C
    rng = np.random.RandomState(1)
    vals = rng.randint(0, 256, 500)
    w = BitWriter()
    for v in vals:
        w.write(int(v), 8)
    data = np.frombuffer(w.getvalue(), np.uint8)
    out = np.empty(500, np.int64)
    pos = C.c_long(0)
    got = lib.vn_read_fields(data, len(data) * 8, C.byref(pos), 8, out,
                             500)
    assert got == 500
    assert np.array_equal(out, vals)
    # EOP: reading past the end stops early and parks pos at the end
    pos = C.c_long(len(data) * 8 - 4)
    got = lib.vn_read_fields(data, len(data) * 8, C.byref(pos), 8, out, 5)
    assert got == 0 and pos.value == len(data) * 8


def test_huff_decode_matches_python(lib):
    """Two-level table decode == the Python Codebook decoder on real
    stream codebooks (incl. codes longer than the 10-bit first stage)."""
    from vorbis_tpu.codec import headers as H
    from vorbis_tpu.codec.encoder import Encoder
    from vorbis_tpu.models import encsetup

    setup = encsetup.setup_vbr(2, 44100, 0.4)
    enc = Encoder(setup)
    vi = H.parse_headers(list(enc.header_packets()))
    rng = np.random.RandomState(2)
    tested_long = 0
    for book in vi.books[:24]:
        used = [e for e in range(book.entries) if book.lengths[e] > 0]
        if not used:
            continue
        if int(book.lengths.max()) > 10:
            tested_long += 1
        entries = rng.choice(used, 300)
        w = BitWriter()
        for e in entries:
            w.write(int(book.codewords[e]), int(book.lengths[e]))
        data = np.frombuffer(w.getvalue(), np.uint8)
        total = w.bit_length() if hasattr(w, "bit_length") else len(
            data) * 8
        hd = native.HuffDecoder(book.codewords, book.lengths)
        out, newpos, got = hd.decode(data, total, 0, len(entries))
        assert got == len(entries)
        assert np.array_equal(out, entries)
        # python decoder agrees
        r = BitReader(bytes(data))
        py = [book.decode(r) for _ in range(len(entries))]
        assert np.array_equal(py, entries)
    assert tested_long >= 1, "matrix never exercised >10-bit codes"


def test_huff_decode_invalid_code_stops(lib):
    from vorbis_tpu.codec import headers as H
    from vorbis_tpu.codec.encoder import Encoder
    from vorbis_tpu.models import encsetup
    setup = encsetup.setup_vbr(2, 44100, 0.4)
    vi = H.parse_headers(list(Encoder(setup).header_packets()))
    book = next(b for b in vi.books if b.lengths.max() > 2)
    hd = native.HuffDecoder(book.codewords, book.lengths)
    data = np.zeros(4, np.uint8)  # likely-valid prefix, then EOP
    out, newpos, got = hd.decode(data, 10, 0, 50)
    assert got <= 50 and newpos <= 32
