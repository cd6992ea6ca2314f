"""VQ training toolchain tests (reference: vq/ — vqgen.c,
huffbuild.c, latticebuild.c, latticetune.c)."""

import numpy as np
import pytest

from vorbis_tpu.codec.codebook import Codebook, make_codewords
from vorbis_tpu.vq import (huffbuild, latticebuild, latticetune,
                           lbg_train, occupancy_from_entries)
from vorbis_tpu.vq.huffbuild import lengths_to_bits


def test_lbg_train_converges():
    rng = np.random.RandomState(0)
    centers = rng.randn(8, 4).astype(np.float32) * 5
    pts = np.concatenate([c + rng.randn(200, 4).astype(np.float32) * 0.3
                          for c in centers])
    codes, assign, hist = lbg_train(pts, 8, iters=25, use_jax=False)
    assert hist[-1] < hist[0] * 0.2
    # every trained code lands near a true center
    d = np.sqrt(((codes[:, None, :] - centers[None]) ** 2).sum(-1))
    assert (d.min(1) < 1.0).all()


def test_lbg_train_jax_matches_numpy_quality():
    rng = np.random.RandomState(1)
    pts = rng.randn(1500, 2).astype(np.float32)
    c1, _, h1 = lbg_train(pts, 16, iters=15, use_jax=True)
    c2, _, h2 = lbg_train(pts, 16, iters=15, use_jax=False)
    assert abs(h1[-1] - h2[-1]) / h2[-1] < 0.25


def test_huffbuild_kraft_valid():
    """Length lists must form decodable prefix codes: make_codewords
    (the sharedbook _make_words equivalent) accepts them."""
    rng = np.random.RandomState(2)
    for _ in range(10):
        n = int(rng.randint(2, 300))
        hist = rng.randint(0, 1000, n)
        if (hist > 0).sum() < 2:
            hist[:2] = 1
        lengths = huffbuild(hist)
        assert (lengths[hist == 0] == 0).all()
        assert (lengths[hist > 0] > 0).all()
        assert make_codewords(lengths) is not None
        # optimality sanity: huffman beats fixed-width
        used = int((hist > 0).sum())
        fixed = int(np.ceil(np.log2(used))) * int(
            np.maximum(hist - 1, 0).sum())
        assert lengths_to_bits(lengths, hist) <= fixed + used


def test_occupancy_guard():
    h = occupancy_from_entries(np.array([0, 0, 3]), 5, guard=1)
    assert list(h) == [3, 1, 1, 2, 1]


def test_lattice_build_tune_roundtrip():
    """Build a lattice, tune lengths on training data, and use the
    result as a real codebook: encode + decode entries."""
    quantlist = np.array([0, 1, 2, 3, 4])
    sb = latticebuild(quantlist, dim=2, minval=-2.0, delta=1.0)
    assert sb.entries == 25 and sb.maptype == 1
    vals = sb.unquantize()
    assert vals is not None and vals.shape == (25, 2)
    # unquantized lattice spans [-2, 2]^2
    assert vals.min() == -2.0 and vals.max() == 2.0
    rng = np.random.RandomState(3)
    train = rng.randn(5000, 2).astype(np.float32)
    tuned = latticetune(sb, train)
    assert make_codewords(tuned.lengthlist) is not None
    book = Codebook(tuned)
    # frequent central entries get shorter codes than corner entries
    center = np.argmin((vals ** 2).sum(1))
    corner = np.argmax((vals ** 2).sum(1))
    assert tuned.lengthlist[center] <= tuned.lengthlist[corner]
    # encode/decode roundtrip through the bit layer
    from vorbis_tpu.bitstream.bitpack import BitReader, BitWriter
    w = BitWriter()
    entries = rng.randint(0, 25, 64)
    for e in entries:
        w.write(int(book.codewords[e]), int(book.lengths[e]))
    r = BitReader(w.getvalue())
    got = [book.decode(r) for _ in entries]
    assert np.array_equal(got, entries)


def test_training_loop_closure(tmp_path):
    """Close the encode->dump->retrain loop (reference TRAIN_RES/
    TRAIN_RESAUX hooks + vq/huffbuild + vq/metrics): capture training
    streams from our own encoder, regenerate a phrasebook Huffman
    length list from the dump, and verify the regenerated book (a)
    forms a valid canonical tree, (b) codes the captured stream at
    least as well as within 15% of the shipped book's cost."""
    import numpy as np
    from tests import oracle
    from vorbis_tpu.codec.encoder import Encoder
    from vorbis_tpu.models import encsetup
    from vorbis_tpu.vq import training as T
    from vorbis_tpu.vq.huffbuild import lengths_to_bits, \
        occupancy_from_entries
    from vorbis_tpu.codec.codebook import make_codewords

    pcm = oracle.make_test_signal(seconds=1.0, kind="mix")
    setup = encsetup.setup_vbr(2, 44100, 0.4)
    enc = Encoder(setup)
    T.TRAINER = T.TrainingCollector()
    try:
        enc.write(pcm)
        enc.end_of_stream()
        enc.pump()
    finally:
        col, T.TRAINER = T.TRAINER, None
    assert col.resaux and col.res and col.floor

    # .vqd dump round (the reference's file interchange)
    files = col.dump_vqd(str(tmp_path / "train"))
    assert files and all(len(open(f).read()) > 0 for f in files)

    # regenerate the phrasebook lengths from our own stream
    gkey, syms = max(col.resaux.items(), key=lambda kv: len(kv[1]))
    res_idx = int(gkey[1:])
    shipped = setup.vi.books[res_idx]
    lengths = T.regenerate_huff_lengths(syms, shipped.entries)
    assert make_codewords(lengths) is not None      # valid tree
    hist = occupancy_from_entries(np.asarray(syms, np.int64),
                                  shipped.entries, guard=0)
    cost_new = lengths_to_bits(lengths, hist)
    cost_shipped = int((np.asarray(shipped.lengths)[
        np.asarray(syms, np.int64)]).sum())
    assert cost_new <= 1.15 * cost_shipped, (cost_new, cost_shipped)

    # the rebuilt book is usable for encode (codewords present for
    # every symbol we emitted)
    nb = T.rebuild_book(shipped, lengths)
    assert all(nb.lengths[s] > 0 for s in set(syms))

    # metrics/distribution equivalents run over a residue book's dump
    rkey, vecs = max(col.res.items(), key=lambda kv: len(kv[1]))
    cls, st = (int(x[1:]) for x in rkey.split("_")[1:])
    from vorbis_tpu.codec.residue_codec import ResidueLook
    look = ResidueLook(setup.vi.residues[0], setup.vi.books)
    book = look.partbooks[cls][st]
    m = T.metrics(book, np.stack(vecs[:500]))
    assert m["count"] > 0 and np.isfinite(m["mse"])
    assert m["used_cells"] > 0
    d = T.distribution(np.stack(vecs[:500]))
    assert d["count"] > 0 and d["hist"].sum() == d["count"]
