"""Device residue VQ tests (ops/residue_device.py vs the exact
codec/residue_codec.py scalar path)."""

import numpy as np
import pytest

from tests import oracle
from vorbis_tpu.codec import residue_codec as RC
from vorbis_tpu.codec.encoder import Encoder
from vorbis_tpu.models import encsetup
from vorbis_tpu.ops.residue_device import DeviceResidueVQ


@pytest.fixture(scope="module")
def setup_look():
    setup = encsetup.setup_vbr(2, 44100, 0.5)
    enc = Encoder(setup)
    return enc.residue_looks[-1]   # long-block residue


def _random_residues(info, B=6, N=2048, seed=0):
    rng = np.random.RandomState(seed)
    res = rng.randint(-20, 21, (B, N)).astype(np.int64)
    res[:, N - 648:] = rng.randint(-2, 3, (B, 648))
    return res


def test_classify_matches_exact(setup_look):
    import jax
    look = setup_look
    dvq = DeviceResidueVQ(look.info, look.books, look.partbooks)
    res = _random_residues(look.info)
    want = np.stack([RC.res01_class(look, [r], 1)[0] for r in res])
    got = np.asarray(jax.jit(dvq.classify)(res))
    assert np.array_equal(want, got)


def test_vq_entries_and_remainder_match_exact(setup_look):
    """Lattice-path entries identical; miss-path entries metric-equal;
    remainders identical where entries agree."""
    import jax
    import jax.numpy as jnp
    look = setup_look
    info = look.info
    dvq = DeviceResidueVQ(info, look.books, look.partbooks)
    res = _random_residues(info)
    pw = np.asarray(jax.jit(dvq.classify)(res))
    spp = info.grouping
    partvals = (info.end - info.begin) // spp
    B = res.shape[0]
    ents_exact = {}
    rem_exact = res.astype(np.float64).copy()
    for b in range(B):
        vec = res[b].astype(np.float64).copy()
        for s in range(dvq.stages):
            for p in range(partvals):
                cls = pw[b, p]
                row = look.partbooks[cls]
                book = row[s] if s < len(row) else None
                if book is None:
                    continue
                off = info.begin + p * spp
                for t in range(spp // book.dim):
                    e = RC.local_book_besterror(book, vec,
                                                off + t * book.dim)
                    ents_exact[(s, b, p, t)] = e
        rem_exact[b] = vec
    ents_dev, rem_dev = jax.jit(
        lambda r, p: dvq.encode(r, p))(res.astype(np.float32),
                                       jnp.asarray(pw))
    total = agree = 0
    for (s, b, p, t), e in ents_exact.items():
        cls = pw[b, p]
        dim = look.partbooks[cls][s].dim
        got = int(np.asarray(ents_dev[s])[b, p, t * dim])
        total += 1
        agree += got == e
    # miss-path tie-breaking differs from C's value patterning; demand
    # near-total agreement
    assert agree / total > 0.98, (agree, total)
    want_rem = rem_exact[:, info.begin:info.begin + partvals * spp]
    got_rem = np.asarray(rem_dev).reshape(B, -1)
    match = np.isclose(got_rem, want_rem.reshape(B, -1), atol=1e-4)
    assert match.mean() > 0.98


def test_encoder_scale_residues_all_lattice_hits(setup_look):
    """Residues at real encoder magnitudes stay on the lattice fast
    path and match the exact entries one for one."""
    import jax
    import jax.numpy as jnp
    look = setup_look
    info = look.info
    dvq = DeviceResidueVQ(info, look.books, look.partbooks)
    rng = np.random.RandomState(7)
    res = rng.randint(-4, 5, (4, 2048)).astype(np.int64)
    pw = np.asarray(jax.jit(dvq.classify)(res))
    ents_dev, _ = jax.jit(
        lambda r, p: dvq.encode(r, p))(res.astype(np.float32),
                                       jnp.asarray(pw))
    spp = info.grouping
    partvals = (info.end - info.begin) // spp
    mism = 0
    checked = 0
    for b in range(res.shape[0]):
        vec = res[b].astype(np.float64).copy()
        for s in range(dvq.stages):
            for p in range(partvals):
                cls = pw[b, p]
                row = look.partbooks[cls]
                book = row[s] if s < len(row) else None
                if book is None:
                    continue
                off = info.begin + p * spp
                for t in range(spp // book.dim):
                    e = RC.local_book_besterror(book, vec,
                                                off + t * book.dim)
                    got = int(np.asarray(ents_dev[s])[b, p,
                                                      t * book.dim])
                    checked += 1
                    mism += got != e
    assert checked > 100 and mism == 0, (mism, checked)
