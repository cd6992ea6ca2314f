import numpy as np
import pytest

from tests import oracle
from vorbis_tpu.bitstream import OggStreamReader
from vorbis_tpu.codec import headers as H
from vorbis_tpu.codec.codebook import (Codebook, StaticCodebook,
                                       float32_pack, float32_unpack,
                                       make_codewords, maptype1_quantvals)


def _get_header_packets(q=0.5, rate=44100, ch=2, tmp="/tmp/_hdr.ogg"):
    pcm = oracle.make_test_signal(rate=rate, seconds=0.3, ch=ch)
    data = oracle.encode_vbr(pcm, rate, q, tmp)
    rd = OggStreamReader(data)
    pkts = [p for p, gp, eos in rd.packets()]
    return pkts


def test_float32_pack_roundtrip():
    for v in [1.0, -1.0, 0.5, 7.3282e-2, 1024.0, -1e-4, 3.0517578125e-05]:
        raw = float32_pack(v)
        back = float(float32_unpack(raw))
        assert back == pytest.approx(v, rel=1e-6)


def test_maptype1_quantvals():
    # vals^dim <= entries < (vals+1)^dim
    for entries, dim in [(625, 4), (624, 4), (626, 4), (8, 3), (9, 2),
                         (1, 1), (100, 2), (121, 2)]:
        v = maptype1_quantvals(entries, dim)
        assert v ** dim <= entries
        assert (v + 1) ** dim > entries


def test_make_codewords_simple():
    # balanced tree of 4 x 2-bit codes
    cw = make_codewords(np.array([2, 2, 2, 2]))
    # canonical codes 00,01,10,11 -> transmitted LSB-first (reversed)
    assert list(cw) == [0b00, 0b10, 0b01, 0b11]
    # overpopulated rejected
    assert make_codewords(np.array([1, 1, 1])) is None
    # underpopulated rejected
    assert make_codewords(np.array([2, 2, 2])) is None
    # single-entry retcon allowed
    assert make_codewords(np.array([1])) is not None


def test_codebook_huffman_roundtrip():
    from vorbis_tpu.bitstream import BitReader, BitWriter
    rng = np.random.RandomState(3)
    # random complete Kraft tree
    lengths = [3, 3, 3, 3, 3, 3, 3, 4, 5, 5]  # sums to 1.0 exactly
    assert sum(2.0 ** -l for l in lengths) == 1.0
    sb = StaticCodebook(dim=1, entries=len(lengths),
                        lengthlist=np.array(lengths))
    book = Codebook(sb)
    syms = rng.randint(0, len(lengths), size=2000)
    w = BitWriter()
    for s in syms:
        book.encode(w, int(s))
    r = BitReader(w.getvalue())
    got = [book.decode(r) for _ in range(len(syms))]
    assert got == list(syms)


@pytest.mark.parametrize("q,rate,ch", [(0.5, 44100, 2), (0.3, 44100, 2),
                                       (-0.1, 8000, 1), (0.0, 22050, 2),
                                       (0.4, 48000, 6), (0.7, 32000, 2),
                                       (1.0, 44100, 2), (0.2, 16000, 1),
                                       (0.1, 11025, 2), (0.6, 96000, 2)])
def test_parse_real_setup_headers(q, rate, ch, tmp_path):
    pkts = _get_header_packets(q, rate, ch, str(tmp_path / "h.ogg"))
    vi = H.parse_headers(pkts[:3])
    assert vi.rate == rate and vi.channels == ch
    assert vi.blocksizes[0] in (64, 128, 256, 512, 1024, 2048)
    assert len(vi.books) > 0 and len(vi.modes) in (1, 2)
    assert "Xiph.Org" in vi.vendor or "libVorbis" in vi.vendor
    # every mode maps to a real mapping/floor/residue
    for m in vi.modes:
        mp = vi.maps[m.mapping]
        for s in range(mp.submaps):
            assert vi.floor_types[mp.floorsubmap[s]] in (0, 1)
            assert vi.residue_types[mp.residuesubmap[s]] in (0, 1, 2)


def test_setup_repack_reparse_stable(tmp_path):
    pkts = _get_header_packets(0.5, 44100, 2, str(tmp_path / "h.ogg"))
    vi = H.parse_headers(pkts[:3])
    rebuilt = H.pack_setup_header(vi)
    vi2 = H.VorbisInfo(channels=vi.channels, rate=vi.rate,
                       blocksizes=vi.blocksizes)
    H.parse_setup_header(rebuilt, vi2)
    assert len(vi2.books) == len(vi.books)
    for b1, b2 in zip(vi.books, vi2.books):
        assert b1.dim == b2.dim and b1.entries == b2.entries
        assert np.array_equal(b1.lengths, b2.lengths)
        assert np.array_equal(b1.codewords, b2.codewords)
        if b1.values is not None:
            assert np.array_equal(b1.values, b2.values)
    assert len(vi2.floors) == len(vi.floors)
    for f1, f2 in zip(vi.floors, vi2.floors):
        assert f1 == f2
    for r1, r2 in zip(vi.residues, vi2.residues):
        assert r1 == r2
    for m1, m2 in zip(vi.maps, vi2.maps):
        assert m1 == m2
    assert vi2.modes == vi.modes


def test_id_header_roundtrip():
    vi = H.VorbisInfo(channels=2, rate=44100, bitrate_nominal=128000,
                      blocksizes=(256, 2048))
    p = H.pack_id_header(vi)
    vi2 = H.parse_id_header(p)
    assert vi2.channels == 2 and vi2.rate == 44100
    assert vi2.blocksizes == (256, 2048)
    assert vi2.bitrate_nominal == 128000

    cp = H.pack_comment_header(vi)
    H.parse_comment_header(cp, vi2)
    assert vi2.vendor == H.VENDOR


def test_garbage_headers_rejected():
    import random
    rng = random.Random(5)
    for _ in range(50):
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 400)))
        with pytest.raises(Exception):
            H.parse_headers([junk, junk, junk])
