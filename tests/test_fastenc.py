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
    assert ef < 1.2 * eg, (ef, eg)


def test_fast_block_switching_on_click_train(tmp_path, fe):
    """Transient content must produce short blocks in the stream,
    reduce pre-echo vs the long-only pipeline, and stay competitive
    with the golden encoder (reference behavior: envelope.c-driven
    256/2048 switching)."""
    from vorbis_tpu.bitstream.oggfile import OggStreamReader
    from vorbis_tpu.codec import headers as H
    from vorbis_tpu.codec.decoder import decode_ogg, packet_blocksize
    from vorbis_tpu.codec.encoder import encode_vbr_stream
    rate = 44100
    t = np.arange(rate) / rate
    mono = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    clicks = [int((k + 0.5) * rate / 8) for k in range(8)]
    for c in clicks:
        mono[c] = 0.9
    pcm = np.stack([mono, mono])

    sw = fe.encode(pcm)
    lo = fe.encode(pcm, switching=False)
    g = encode_vbr_stream(pcm, 44100, 0.5)

    # short-block packets present and correctly flagged
    pkts = [p for p, _, _ in OggStreamReader(sw).packets()]
    vi = H.parse_headers(pkts[:3])
    sizes = [packet_blocksize(vi, p) for p in pkts[3:]]
    assert sizes.count(256) >= 8, sizes.count(256)
    assert sizes.count(2048) >= 8

    def decode_to(path, data):
        with open(path, "wb") as f:
            f.write(data)
        out, _ = oracle.decode_float(path)
        return out

    d_sw = decode_to(str(tmp_path / "sw.ogg"), sw)
    d_lo = decode_to(str(tmp_path / "lo.ogg"), lo)
    d_g = decode_to(str(tmp_path / "g.ogg"), g)
    assert d_sw.shape == pcm.shape

    def pre_echo(got):
        errs = []
        for c in clicks:
            a, b = c - 900, c - 20
            errs.append(np.sqrt(np.mean((got[:, a:b]
                                         - pcm[:, a:b]) ** 2)))
        return float(np.mean(errs))

    pe_sw, pe_lo, pe_g = map(pre_echo, (d_sw, d_lo, d_g))
    assert pe_sw < pe_lo, (pe_sw, pe_lo)          # shorts help
    assert pe_sw < 1.3 * pe_g, (pe_sw, pe_g)
    rms_sw = np.sqrt(np.mean((d_sw - pcm) ** 2))
    rms_g = np.sqrt(np.mean(
        (d_g[:, :pcm.shape[1]] - pcm[:, :d_g.shape[1]]) ** 2))
    assert rms_sw < 1.25 * rms_g, (rms_sw, rms_g)
    # switching prices transients properly: smaller than long-only
    assert len(sw) < len(lo)
    # and our decoder accepts the mixed stream bit-cleanly
    mine, _ = decode_ogg(sw)
    assert np.abs(mine - d_sw).max() < 1e-6


def test_fast_silence(fe):
    pcm = np.zeros((2, 22050), np.float32)
    ogg = fe.encode(pcm)
    from vorbis_tpu.vorbisfile import OggVorbisFile
    out = OggVorbisFile(ogg).read_all_float()
    assert out.shape == pcm.shape
    assert np.abs(out).max() < 1e-3


def test_fast_coupled_stream_size_near_golden(tmp_path, fe):
    """Coupled stereo (the default): point-stereo fold + lossless
    mag/ang + res2 interleaved VQ must price the stream like the
    golden encoder (within ~10-15%), and decode clean everywhere."""
    from vorbis_tpu.codec.encoder import encode_vbr_stream
    assert fe.res_type == 2          # coupling on by default
    pcm = oracle.make_test_signal(seconds=1.0)
    out = fe.encode(pcm, switching=False)
    g = encode_vbr_stream(pcm, 44100, 0.5)
    ratio = len(out) / len(g)
    assert 0.75 <= ratio <= 1.15, (len(out), len(g))
    pf = str(tmp_path / "cp.ogg")
    with open(pf, "wb") as f:
        f.write(out)
    got, rate = oracle.decode_float(pf)
    assert rate == 44100 and got.shape == pcm.shape
    assert np.isfinite(got).all()


def test_fast_single_blocksize_template(tmp_path):
    """8 kHz templates have ONE blocksize and a single mode (no window
    flag bits, modebits == 0): the fast path must still produce valid
    streams (regression: round-1 assumed a long mode exists)."""
    pcm = oracle.make_test_signal(rate=8000, seconds=0.5, ch=1)
    fe = FastEncoder(1, 8000, 0.3)
    assert fe.W_main == 0 and not fe.switching
    out = fe.encode(pcm)
    p = str(tmp_path / "nb.ogg")
    with open(p, "wb") as f:
        f.write(out)
    got, rate = oracle.decode_float(p)
    assert rate == 8000 and got.shape == pcm.shape
    assert np.isfinite(got).all()


def _golden_managed(pcm, rate, mx, nom, mn, serialno=777):
    from vorbis_tpu.bitstream.oggfile import OggStreamWriter
    from vorbis_tpu.codec.encoder import Encoder
    from vorbis_tpu.models import encsetup
    setup = encsetup.setup_managed(pcm.shape[0], rate, mx, nom, mn)
    enc = Encoder(setup)
    w = OggStreamWriter(serialno)
    h = enc.header_packets(None)
    w.packetin(h[0], 0)
    w.flush()
    w.packetin(h[1], 0)
    w.packetin(h[2], 0)
    w.flush()
    enc.write(pcm)
    enc.end_of_stream()
    for pkt in enc.pump():
        w.packetin(pkt.data, pkt.granulepos, eos=pkt.eos)
        if pkt.granulepos >= 0:
            w.flush(eos=pkt.eos)
    w.flush()
    return w.pageout_all()


def test_fast_managed_abr_rate_and_valid(tmp_path):
    """Managed ABR 128 kbps fast path (VERDICT r2 #2): the 15-packetblob
    device pass + host reservoir floater must converge on the nominal
    rate, the stream must decode clean under stock libvorbis, and the
    golden ABR encoder on the same input must land in the same size
    window."""
    pcm = oracle.make_test_signal(seconds=3.0, kind="mix")
    fe = FastEncoder(2, 44100, bitrate=(-1, 128000, -1))
    assert fe.managed
    ogg = fe.encode_managed(pcm, chunk=64)
    p = str(tmp_path / "abr.ogg")
    with open(p, "wb") as f:
        f.write(ogg)
    got, rate = oracle.decode_float(p)
    assert rate == 44100 and got.shape == pcm.shape
    assert np.isfinite(got).all()
    dur = pcm.shape[1] / 44100
    kbps = len(ogg) * 8 / dur / 1000
    # reservoir envelope: headers + reservoir slack on 3s of audio
    assert 100.0 < kbps < 165.0, kbps
    g = _golden_managed(pcm, 44100, -1, 128000, -1)
    ratio = len(ogg) / len(g)
    assert 0.7 <= ratio <= 1.35, (len(ogg), len(g))


def test_fast_managed_batch_matches_single():
    """encode_managed_batch must equal per-stream encode_managed
    byte-for-byte: the reservoir, ampmax lane, and lastmdct rows of
    each stream are independent, so batching across streams may not
    change any packet."""
    a = oracle.make_test_signal(seconds=1.2, kind="mix")
    b = oracle.make_test_signal(seconds=0.9, kind="tone")
    fe = FastEncoder(2, 44100, bitrate=(-1, 128000, -1))
    outs = fe.encode_managed_batch([a, b], serialnos=[11, 22],
                                   chunk=32)
    sa = fe.encode_managed(a, serialno=11, chunk=32)
    sb = fe.encode_managed(b, serialno=22, chunk=32)
    assert outs[0] == sa
    assert outs[1] == sb


def test_fast_managed_cbr_walls(tmp_path):
    """CBR (min == nominal == max): the hard reservoir walls must
    truncate/pad without breaking bit syntax — stock libvorbis still
    accepts every packet."""
    pcm = oracle.make_test_signal(seconds=1.5, kind="mix")
    fe = FastEncoder(2, 44100, bitrate=(128000, 128000, 128000))
    ogg = fe.encode_managed(pcm, chunk=64)
    p = str(tmp_path / "cbr.ogg")
    with open(p, "wb") as f:
        f.write(ogg)
    got, rate = oracle.decode_float(p)
    assert rate == 44100 and got.shape == pcm.shape
    assert np.isfinite(got).all()
    dur = pcm.shape[1] / 44100
    kbps = len(ogg) * 8 / dur / 1000
    assert 100.0 < kbps < 175.0, kbps


def test_fast_51_coupled(tmp_path):
    """5.1 fast path (VERDICT round-2 item 3): the multi-submap
    multi-step coupled pipeline (reference lib/modes/residue_44p51.h,
    psy.c coupling_steps loop) must price the stream near the golden
    encoder and decode clean under stock libvorbis."""
    from vorbis_tpu.codec.encoder import encode_vbr_stream
    rate = 48000
    N = int(0.7 * rate)
    t = np.arange(N) / rate
    rng = np.random.RandomState(5)
    chs = [0.3 * np.sin(2 * np.pi * (300 + 120 * c) * t)
           + 0.02 * rng.randn(N) for c in range(5)]
    chs.append(0.2 * np.sin(2 * np.pi * 50 * t))        # LFE
    pcm = np.clip(np.stack(chs), -1, 1).astype(np.float32)

    fe = FastEncoder(6, rate, 0.4)
    assert fe.res_type == 2 and fe.dev.multi        # coupled default
    assert [g.channels for g in fe.dev.groups] == [[0, 1, 2, 3, 4],
                                                   [5]]
    ogg = fe.encode(pcm)
    p = str(tmp_path / "51.ogg")
    with open(p, "wb") as f:
        f.write(ogg)
    got, r = oracle.decode_float(p)
    assert r == rate and got.shape == pcm.shape
    assert np.isfinite(got).all()
    rms = np.sqrt(np.mean((got - pcm) ** 2))
    assert rms < 0.08, rms
    g = encode_vbr_stream(pcm, rate, 0.4)
    ratio = len(ogg) / len(g)
    assert 0.75 <= ratio <= 1.2, (len(ogg), len(g))


def _seg_snr(ref, got, n=1024):
    m = min(ref.shape[1], got.shape[1])
    ref, got = ref[:, :m], got[:, :m]
    snrs = []
    for o in range(0, m - n, n):
        s = np.mean(ref[:, o:o + n] ** 2)
        e = np.mean((ref[:, o:o + n] - got[:, o:o + n]) ** 2)
        if s > 1e-8:
            snrs.append(10 * np.log10(max(s, 1e-12) / max(e, 1e-12)))
    return float(np.mean(snrs))


def test_fast_quality_corpus_vs_golden(tmp_path, fe):
    """VERDICT r2 item 5: real quality gates.  Across a mixed corpus
    (loud tones, click train, noise bursts, quiet-after-loud) the fast
    path must stay within 1.2x the golden encoder's RMS error, within
    2 dB of its segmental SNR, and not buy its (smaller) streams with
    quality: the size window is asserted jointly with the error
    bound."""
    from vorbis_tpu.codec.encoder import encode_vbr_stream
    rate = 44100
    t1 = np.arange(rate) / rate
    rng = np.random.RandomState(9)

    def clicks():
        m = (0.3 * np.sin(2 * np.pi * 440 * t1)).astype(np.float32)
        for k in range(8):
            m[int((k + 0.5) * rate / 8)] = 0.9
        return np.stack([m, m])

    def bursts():
        x = 0.01 * rng.randn(rate)
        for k in range(4):
            a = int((k + 0.3) * rate / 4)
            x[a:a + 3000] += 0.5 * rng.randn(3000)
        return np.clip(np.stack([x, x * 0.8]), -1, 1).astype(np.float32)

    def quiet_after_loud():
        x = np.concatenate([
            0.8 * np.sin(2 * np.pi * 600 * t1[:rate // 2]),
            0.02 * np.sin(2 * np.pi * 900 * t1[:rate // 2])])
        return np.stack([x, x]).astype(np.float32)

    for name, gen in (("clicks", clicks), ("bursts", bursts),
                      ("quiet_after_loud", quiet_after_loud)):
        pcm = gen()
        f = fe.encode(pcm)
        g = encode_vbr_stream(pcm, rate, 0.5)
        pf = str(tmp_path / "f.ogg")
        pg = str(tmp_path / "g.ogg")
        with open(pf, "wb") as fh:
            fh.write(f)
        with open(pg, "wb") as fh:
            fh.write(g)
        df, _ = oracle.decode_float(pf)
        dg, _ = oracle.decode_float(pg)
        m = min(df.shape[1], dg.shape[1], pcm.shape[1])
        ef = np.sqrt(np.mean((df[:, :m] - pcm[:, :m]) ** 2))
        eg = np.sqrt(np.mean((dg[:, :m] - pcm[:, :m]) ** 2))
        assert ef < 1.2 * eg, (name, ef, eg)
        sf = _seg_snr(pcm, df)
        sg = _seg_snr(pcm, dg)
        assert sf > sg - 2.0, (name, sf, sg)
        ratio = len(f) / len(g)
        assert 0.7 <= ratio <= 1.15, (name, len(f), len(g))


def test_rescue_lockstep_batch_equals_serial_walk():
    """The lockstep-vectorized stretch-rescue (_rescue_walk_batch) must
    be byte-identical to the per-cluster serial reference walk
    (_rescue_cluster_serial) on click-dense content, where hundreds of
    clusters exercise both the trigger tables and the retrig-tail
    fallback (reference walk: lib/envelope.c:569-681)."""
    rate = 44100

    def click_train(secs, seed):
        n = int(secs * rate)
        t = np.arange(n) / rate
        rng = np.random.RandomState(1000 + seed)
        x = 0.05 * np.sin(2 * np.pi * (330 + 11 * seed) * t)
        step = int(0.09 * rate)
        for o in range(step // 2, n - 400, step):
            env = np.exp(-np.arange(256) / 40.0)
            x[o:o + 256] += 0.75 * env * rng.randn(256)
        pcmf = np.stack([x, np.roll(x, 7)])
        return np.clip(np.rint(pcmf * 32768.0), -32768,
                       32767).astype(np.int16)

    for secs, seed in ((3, 0), (2, 7)):
        pcm = click_train(secs, seed)
        ser = FastEncoder(2, rate, 0.5)
        ser._rescue_force_serial = True
        a = ser.encode(pcm)
        b = FastEncoder(2, rate, 0.5).encode(pcm)
        assert a == b, (secs, seed, len(a), len(b))
