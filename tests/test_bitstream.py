import numpy as np
import pytest

from vorbis_tpu.bitstream import BitReader, BitWriter, EndOfPacket, ilog
from vorbis_tpu.bitstream.bitpack import pack_bits_array
from vorbis_tpu.bitstream.oggfile import (OggStreamReader, OggStreamWriter,
                                          ogg_crc, parse_page)


def test_bitpack_roundtrip_random():
    rng = np.random.RandomState(42)
    fields = []
    w = BitWriter()
    for _ in range(5000):
        n = int(rng.randint(1, 33))
        v = int(rng.randint(0, 2 ** n))
        fields.append((v, n))
        w.write(v, n)
    data = w.getvalue()
    r = BitReader(data)
    for v, n in fields:
        assert r.read(n) == v


def test_bitpack_lsb_first_convention():
    # Vorbis I spec worked example: writing 0b0 then 0b11 then 0b101
    w = BitWriter()
    w.write(0, 1)
    w.write(3, 2)
    w.write(5, 3)
    # bits (lsb first): 0,1,1,1,0,1 -> byte 0b..101110 = 0x2E
    assert w.getvalue() == bytes([0b101110])
    r = BitReader(w.getvalue())
    assert r.read(1) == 0 and r.read(2) == 3 and r.read(3) == 5


def test_bitreader_eop_and_look():
    r = BitReader(b"\xff")
    assert r.read(8) == 255
    with pytest.raises(EndOfPacket):
        r.read(1)
    r2 = BitReader(b"\x01")
    assert r2.look(16) == 1  # over-read pads with zeros
    r2.advance(8)
    assert r2.look(8) == 0


def test_ilog():
    assert ilog(0) == 0 and ilog(1) == 1 and ilog(2) == 2
    assert ilog(3) == 2 and ilog(4) == 3 and ilog(7) == 3 and ilog(8) == 4


def test_pack_bits_array_matches_bitwriter():
    rng = np.random.RandomState(1)
    nbits = rng.randint(1, 33, size=10000)
    vals = np.array([rng.randint(0, 2 ** n) for n in nbits], dtype=np.uint64)
    packed, total = pack_bits_array(vals, nbits)
    w = BitWriter()
    for v, n in zip(vals.tolist(), nbits.tolist()):
        w.write(int(v), int(n))
    assert total == sum(nbits)
    assert packed == w.getvalue()


def test_ogg_crc_known_vector():
    # CRC of empty buffer is 0; basic sanity plus self-consistency on a
    # synthetic page (parse_page verifies CRC internally).
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"\x00") == 0
    assert ogg_crc(b"\x01") == 0x04C11DB7


def test_ogg_writer_reader_roundtrip():
    rng = np.random.RandomState(7)
    packets = [bytes(rng.randint(0, 256, size=int(sz), dtype=np.uint8).tobytes())
               for sz in [1, 254, 255, 256, 510, 511, 4096, 70000, 3]]
    w = OggStreamWriter(serialno=424242)
    for i, p in enumerate(packets):
        w.packetin(p, granulepos=i * 1000, eos=(i == len(packets) - 1))
        if i == 0:
            w.flush()
    w.flush(eos=True)
    data = w.pageout_all()
    rd = OggStreamReader(data)
    got = [p for p, gp, eos in rd.packets()]
    assert got == packets


def test_ogg_reader_parses_system_encoder_output(tmp_path):
    from tests import oracle
    pcm = oracle.make_test_signal(seconds=0.5)
    path = str(tmp_path / "t.ogg")
    data = oracle.encode_vbr(pcm, 44100, 0.5, path)
    rd = OggStreamReader(data)
    pkts = [p for p, gp, eos in rd.packets()]
    # must at least contain the 3 headers and some audio packets
    assert len(pkts) > 10
    assert pkts[0][0] == 1 and pkts[0][1:7] == b"vorbis"
    assert pkts[1][0] == 3 and pkts[2][0] == 5
    # every page CRC validated during scan; EOS present
    assert rd.pages[-1].eos
