import subprocess

import pytest

from tests import oracle
from vorbis_tpu.codec import headers as H
from vorbis_tpu.models import encsetup


@pytest.fixture(scope="module", autouse=True)
def _reflib_built():
    subprocess.run(["sh", "tools/build_reflib.sh"], check=True,
                   capture_output=True)


VBR_CONFIGS = [
    (2, 44100, 0.5), (2, 44100, 0.3), (2, 44100, -0.1), (2, 44100, 1.0),
    (1, 44100, 0.4), (2, 48000, 0.5), (1, 8000, 0.2), (2, 8000, -0.1),
    (2, 11025, 0.0), (1, 16000, 0.5), (2, 22050, 0.3), (2, 32000, 0.6),
    (6, 44100, 0.5), (2, 96000, 0.4), (4, 44100, 0.3), (1, 12000, 0.1),
    (2, 24000, 0.7), (3, 44100, 0.2), (8, 48000, 0.5), (2, 44100, 0.05),
]


@pytest.mark.parametrize("ch,rate,q", VBR_CONFIGS)
def test_vbr_setup_headers_byte_identical(ch, rate, q):
    ref = oracle.reflib()
    sig = oracle.make_test_signal(rate=rate, seconds=0.05, ch=ch)
    hdrs, _ = ref.encode_packets(sig, rate, q)
    es = encsetup.setup_vbr(ch, rate, q)
    assert H.pack_id_header(es.vi) == hdrs[0]
    assert H.pack_setup_header(es.vi) == hdrs[2]


@pytest.mark.parametrize("ch,rate,kbps", [
    (2, 44100, 128), (2, 44100, 96), (1, 44100, 64), (2, 48000, 192)])
def test_managed_setup_headers_byte_identical(ch, rate, kbps):
    ref = oracle.reflib()
    sig = oracle.make_test_signal(rate=rate, seconds=0.05, ch=ch)
    hdrs, _ = ref.encode_packets(sig, rate, 0, managed_kbps=kbps)
    es = encsetup.setup_managed(ch, rate, kbps * 1000, kbps * 1000,
                                kbps * 1000)
    assert H.pack_id_header(es.vi) == hdrs[0]
    assert H.pack_setup_header(es.vi) == hdrs[2]


def test_unsupported_config_raises():
    with pytest.raises(ValueError):
        encsetup.setup_vbr(2, 300000, 0.5)  # beyond any template rate


def test_setup_decodes_own_headers():
    # our own decoder must accept a setup we synthesized
    es = encsetup.setup_vbr(2, 44100, 0.5)
    pkt = H.pack_setup_header(es.vi)
    vi2 = H.VorbisInfo(channels=2, rate=44100, blocksizes=es.vi.blocksizes)
    H.parse_setup_header(pkt, vi2)
    assert len(vi2.books) == len(es.vi.books)
