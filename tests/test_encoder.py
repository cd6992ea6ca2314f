"""Golden-packet encoder tests: every packet our encoder emits must be
byte-identical (payload, granulepos, EOS flag) to the reference
encoder's (lib/vorbisenc.c + lib/analysis.c + lib/bitrate.c drive path).

The reference runs in a CLEAN subprocess (tools/ref_encode.py): running
it in-process is unreliable because the host's FPU state (e.g. FTZ set
by ML runtimes) changes the LPC edge-extrapolation packets.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tests import oracle
from vorbis_tpu.codec.encoder import Encoder
from vorbis_tpu.models import encsetup

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")

needs_ref = pytest.mark.skipif(
    not os.path.isdir(os.environ.get("VORBIS_REF", "/root/reference")),
    reason="reference tree not available")


def _ref_encode(tmp_path, pcm, rate, quality, managed_kbps=0):
    oracle.build_reflib()
    pcm_path = tmp_path / "pcm.npy"
    out_path = tmp_path / "ref.pkl"
    np.save(pcm_path, pcm)
    cmd = [sys.executable, os.path.join(TOOLS, "ref_encode.py"),
           str(pcm_path), str(rate), str(quality), str(out_path)]
    if managed_kbps:
        cmd.append(str(managed_kbps))
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    with open(out_path, "rb") as f:
        return pickle.load(f)


def _my_encode(pcm, rate, quality, managed_kbps=0):
    ch = pcm.shape[0]
    if managed_kbps:
        setup = encsetup.setup_managed(ch, rate, managed_kbps * 1000,
                                       managed_kbps * 1000,
                                       managed_kbps * 1000)
    else:
        setup = encsetup.setup_vbr(ch, rate, quality)
    enc = Encoder(setup)
    enc.write(pcm)
    enc.end_of_stream()
    return enc, enc.pump()


def _assert_golden(tmp_path, pcm, rate, quality, managed_kbps=0):
    ref = _ref_encode(tmp_path, pcm, rate, quality, managed_kbps)
    enc, mine = _my_encode(pcm, rate, quality, managed_kbps)
    h1, h2, h3 = enc.header_packets()
    # h2 (comment header) carries the vendor string, which is ours by
    # design; id + setup must be byte-identical.
    assert h1 == ref["headers"][0], "id header differs"
    assert h3 == ref["headers"][2], "setup header differs"
    assert len(mine) == len(ref["packets"]), (
        f"packet count {len(mine)} != {len(ref['packets'])}")
    for i, (m, (rb, rgp, reos)) in enumerate(zip(mine, ref["packets"])):
        assert m.data == rb, f"packet {i} payload differs"
        assert m.granulepos == rgp, f"packet {i} granulepos differs"
        assert bool(m.eos) == bool(reos), f"packet {i} eos differs"


# (ch, rate, quality, managed_kbps, seconds) — spans block switching,
# mono/stereo/5.1 coupling, low/high rates, the full quality sweep's
# edges, and ABR reservoir management.
GOLDEN_MATRIX = [
    (2, 44100, 0.4, 0, 0.30),
    (2, 44100, -0.1, 0, 0.30),
    (2, 48000, 0.8, 0, 0.25),
    (1, 8000, 0.2, 0, 0.50),
    (1, 11025, 0.1, 0, 0.40),
    (1, 22050, 0.5, 0, 0.30),
    (2, 32000, 1.0, 0, 0.25),
    (6, 44100, 0.4, 0, 0.20),
    (6, 48000, 0.5, 0, 0.20),
    (2, 96000, 0.5, 0, 0.15),
    (2, 44100, 0.0, 128, 0.30),
]


@needs_ref
@pytest.mark.parametrize("ch,rate,q,kbps,secs", GOLDEN_MATRIX)
def test_golden_packets(tmp_path, ch, rate, q, kbps, secs):
    pcm = oracle.make_test_signal(rate=rate, seconds=secs, ch=ch)
    _assert_golden(tmp_path, pcm, rate, q, kbps)


CTL_MATRIX = [
    {"lowpass": 8.0},
    {"iblock": -10.0},
    {"coupling": 0},
    {"lowpass": 15.0, "iblock": -5.0},
]


@needs_ref
@pytest.mark.parametrize("ctl", CTL_MATRIX)
def test_golden_packets_with_ctl(tmp_path, ctl):
    """vorbis_encode_ctl paths (vorbisenc.c:1072-1274): lowpass,
    impulse noisetune, coupling toggle — applied between setup and
    init, still byte-identical."""
    import json
    oracle.build_reflib()
    pcm = oracle.make_test_signal(seconds=0.3)
    pcm_path = tmp_path / "pcm.npy"
    out_path = tmp_path / "ref.pkl"
    np.save(pcm_path, pcm)
    subprocess.run([sys.executable, os.path.join(TOOLS, "ref_encode.py"),
                    str(pcm_path), "44100", "0.4", str(out_path), "0",
                    json.dumps(ctl)], check=True, capture_output=True,
                   text=True)
    with open(out_path, "rb") as f:
        ref = pickle.load(f)
    b = encsetup.setup_vbr_staged(2, 44100, 0.4)
    if "lowpass" in ctl:
        b.ctl_lowpass_set(ctl["lowpass"])
    if "iblock" in ctl:
        b.ctl_iblock_set(ctl["iblock"])
    if "coupling" in ctl:
        b.ctl_coupling_set(bool(ctl["coupling"]))
    enc = Encoder(b.init())
    enc.write(pcm)
    enc.end_of_stream()
    mine = enc.pump()
    h = enc.header_packets()
    assert h[0] == ref["headers"][0] and h[2] == ref["headers"][2]
    assert len(mine) == len(ref["packets"])
    for i, (m, (rb, rgp, reos)) in enumerate(zip(mine, ref["packets"])):
        assert m.data == rb and m.granulepos == rgp \
            and bool(m.eos) == bool(reos), f"packet {i} differs"


def test_ctl_guards():
    b = encsetup.setup_vbr_staged(2, 44100, 0.4)
    b.ctl_lowpass_set(120.0)
    assert b.ctl_lowpass_get() == 99.0      # clamp (vorbisenc.c:1220)
    b.ctl_iblock_set(-99.0)
    assert b.ctl_iblock_get() == -15.0      # clamp (vorbisenc.c:1236)
    rm = b.ctl_ratemanage2_get()
    assert not rm["management_active"]
    with pytest.raises(ValueError):
        b.ctl_ratemanage2_set({"bitrate_limit_min_kbps": 200,
                               "bitrate_average_kbps": 100})
    b.init()
    with pytest.raises(ValueError):         # set_in_stone
        b.ctl_lowpass_set(10.0)


@needs_ref
def test_golden_packets_long_stream(tmp_path):
    """A longer managed encode: deeper psy history (lastmdct/tempmdct,
    impadnum, lW_no chains) and real bitrate-reservoir dynamics."""
    pcm = oracle.make_test_signal(seconds=1.5, seed=11)
    _assert_golden(tmp_path, pcm, 44100, 0.0, 128)


@needs_ref
def test_golden_packets_silence(tmp_path):
    """All-zero input exercises the dynamic-range floor and lossless
    promotion paths."""
    pcm = np.zeros((2, 12000), np.float32)
    _assert_golden(tmp_path, pcm, 44100, 0.4)


@needs_ref
def test_roundtrip_reference_decodes_us(tmp_path):
    """The reference decoder must accept our stream and produce PCM
    bit-identical to decoding the reference encoder's own stream."""
    rate, q = 44100, 0.4
    pcm = oracle.make_test_signal(rate=rate, seconds=0.3, ch=2)
    ref = _ref_encode(tmp_path, pcm, rate, q)
    enc, mine = _my_encode(pcm, rate, q)
    h = enc.header_packets()
    packets = ([(h[0], 0, False), (h[1], 0, False), (h[2], 0, False)]
               + [(m.data, m.granulepos, m.eos) for m in mine])
    reflib = oracle.RefLib()
    got = reflib.decode_packets(packets)
    want = reflib.decode_packets(
        [(p, 0, False) for p in ref["headers"]]
        + [(d, g, e) for d, g, e in ref["packets"]])
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_our_decoder_roundtrip():
    """Our encoder's stream decoded by OUR decoder reproduces the same
    PCM as the reference decode path (self-consistency, no reference
    needed beyond the compiled oracle)."""
    from vorbis_tpu.codec import headers as H
    from vorbis_tpu.codec.decoder import Decoder

    rate, q = 44100, 0.4
    pcm = oracle.make_test_signal(rate=rate, seconds=0.25, ch=2)
    setup = encsetup.setup_vbr(2, rate, q)
    enc = Encoder(setup)
    enc.write(pcm)
    enc.end_of_stream()
    mine = enc.pump()
    vi = H.parse_headers(list(enc.header_packets()))
    dec = Decoder(vi)
    out = []
    for m in mine:
        got = dec.decode_packet(m.data, granulepos=m.granulepos,
                                eos=m.eos)
        if got is not None and got.shape[1]:
            out.append(got)
    full = np.concatenate(out, axis=1)
    # encoder granulepos trimming must land exactly on the input length
    assert full.shape == pcm.shape
    # lossy codec: compare energy envelope, not samples
    err = np.sqrt(np.mean((full - pcm) ** 2))
    assert err < 0.05, f"roundtrip rms error too high: {err}"


def test_bit_usage_accounting():
    """glue/floor/res bit counters (reference codec.h:112-115) must
    agree exactly between our encoder and our decoder on the same
    stream."""
    from vorbis_tpu.codec.decoder import Decoder
    from vorbis_tpu.codec import headers as H
    from vorbis_tpu.codec.encoder import Encoder
    from vorbis_tpu.models import encsetup
    pcm = oracle.make_test_signal(seconds=0.3)
    setup = encsetup.setup_vbr(2, 44100, 0.4)
    enc = Encoder(setup)
    enc.write(pcm)
    enc.end_of_stream()
    pkts = enc.pump()
    st = enc.bit_stats
    assert st["packets"] == len(pkts)
    assert st["res_bits"] > st["floor_bits"] > 0
    total = st["glue_bits"] + st["floor_bits"] + st["res_bits"]
    assert total <= st["packet_bits"]
    h = enc.header_packets()
    dec = Decoder(H.parse_headers(list(h)))
    for p in pkts:
        dec.decode_packet(p.data, p.granulepos, p.eos)
    for k in ("packets", "glue_bits", "floor_bits", "res_bits"):
        assert dec.bit_stats[k] == st[k], k


@needs_ref
def test_golden_packets_ratemanage2_vbr_to_managed(tmp_path):
    """OV_ECTL_RATEMANAGE2_SET converting a VBR setup to managed
    (vorbisenc.c:1106-1171): the reservoir parameters land in the
    bitrate manager and the managed encode stays byte-identical to
    the reference."""
    import json
    oracle.build_reflib()
    pcm = oracle.make_test_signal(seconds=0.3)
    rm2 = {"management_active": 1, "min": -1, "max": -1,
           "reservoir": 131072, "bias": 0.2, "av": 128, "damp": 1.4}
    pcm_path = tmp_path / "pcm.npy"
    out_path = tmp_path / "ref.pkl"
    np.save(pcm_path, pcm)
    subprocess.run([sys.executable, os.path.join(TOOLS, "ref_encode.py"),
                    str(pcm_path), "44100", "0.4", str(out_path), "0",
                    json.dumps({"ratemanage2": rm2})], check=True,
                   capture_output=True, text=True)
    with open(out_path, "rb") as f:
        ref = pickle.load(f)
    b = encsetup.setup_vbr_staged(2, 44100, 0.4)
    b.ctl_ratemanage2_set({
        "management_active": True,
        "bitrate_limit_min_kbps": -1,
        "bitrate_limit_max_kbps": -1,
        "bitrate_average_kbps": 128,
        "bitrate_average_damping": 1.4,
        "bitrate_limit_reservoir_bits": 131072,
        "bitrate_limit_reservoir_bias": 0.2,
    })
    enc = Encoder(b.init())
    enc.write(pcm)
    enc.end_of_stream()
    mine = enc.pump()
    h = enc.header_packets()
    assert h[0] == ref["headers"][0] and h[2] == ref["headers"][2]
    assert len(mine) == len(ref["packets"])
    for i, (m, (rb, rgp, reos)) in enumerate(zip(mine, ref["packets"])):
        assert m.data == rb and m.granulepos == rgp \
            and bool(m.eos) == bool(reos), f"packet {i} differs"
