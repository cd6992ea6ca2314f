"""Fully-on-device fast encode step: raw PCM chunk -> packed packets.

This is the round-2 redesign of the TPU production encode path
(reference hot loop: lib/mapping0.c mapping0_forward + lib/floor1.c
floor1_encode + lib/res0.c _01forward + lib/codebook.c
vorbis_book_encode + libogg oggpack_write).  Round 1 ran the DSP
decisions on device but built the per-packet bit fields on host, which
capped end-to-end throughput at ~13x realtime.  Here EVERYTHING up to
the Ogg page framing runs in one jit:

  framing -> window/MDCT/FFT -> psy mask -> floor1 fit -> post wrap
  coding -> floor curve render -> residue quantization (lattice VQ)
  -> Huffman codeword lookup -> bit-field column assembly -> LSB-first
  bit packing

and the host receives only (packed packet bytes, bit counts).

TPU-specific design rules learned from profiling this chip:

  * XLA lowers big computed-index gathers to a ~10 ns/element serial
    loop.  Every lookup here is therefore either (a) in tiny (B, P)
    post space, (b) a STATIC-index gather (bin -> interval tables),
    (c) pure elementwise math (the residue books are exact zigzag
    lattices: codeword VALUES never need a table), or (d) a one-hot
    int8 matmul against stacked codeword tables (MXU does the lookup).
  * Bit packing is a byte-plane one-hot matmul: each (value, nbits)
    field contributes <=5 bytes; a (F, C, WB) one-hot of the field's
    byte offset times the 5 byte planes accumulates the packet on the
    MXU.  Disjoint bit ranges make integer addition equal bitwise OR.
  * Adjacent fields whose worst-case widths sum to <=32 bits are
    pre-merged by a static plan, shrinking the packed column count
    ~2x.

The emitted packets are byte-identical to the round-1 fast path (same
decisions, same codewords) and decode bit-clean under the reference
decoder; `tests/test_fastenc.py` checks both.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..bitstream.bitpack import ilog

f32 = np.float32
U32 = jnp.uint32


# ---------------------------------------------------------------------------
# small helpers

def _u32(x):
    return jnp.asarray(x).astype(jnp.uint32)


def _shl(v, s):
    """uint32 shift-left with s in [0, 32): XLA shifts are undefined at
    >=32, callers must bound s."""
    return _u32(v) << _u32(s)


def onehot_table_lookup(entries, cls, val_tabs, len_tabs, nbytes=4):
    """MXU-backed per-class table lookup.

    entries (..., ) int32 in [0, maxent); cls (...,) broadcastable
    int32 class ids; val_tabs (ncls, maxent) uint32 codewords;
    len_tabs (ncls, maxent) int32.  Returns (vals uint32, lens int32)
    shaped like entries.  One one-hot int8 matmul against the stacked
    byte planes of every class table, then a where-ladder class select
    (ncls is small); avoids XLA's serialized gather path entirely.
    """
    ncls, maxent = val_tabs.shape
    shape = entries.shape
    e = jnp.clip(entries, 0, maxent - 1).reshape(-1)
    oh = (e[:, None] == jnp.arange(maxent, dtype=jnp.int32)[None, :]) \
        .astype(jnp.int8)
    # W: (maxent, ncls*(nbytes+1)) int8 — nbytes value planes + length
    planes = []
    for c in range(ncls):
        for k in range(nbytes):
            planes.append(((val_tabs[c] >> np.uint32(8 * k)) & np.uint32(0xFF))
                          .astype(np.int8))
        planes.append(len_tabs[c].astype(np.int8))
    W = jnp.asarray(np.stack(planes, 1))
    prod = jax.lax.dot(oh, W, preferred_element_type=jnp.int32)
    prod = prod.reshape(shape + (ncls, nbytes + 1))
    clsb = jnp.broadcast_to(cls, shape)
    sel = prod[..., 0, :]
    for c in range(1, ncls):
        sel = jnp.where((clsb == c)[..., None], prod[..., c, :], sel)
    val = _u32(sel[..., 0] & 0xFF)
    for k in range(1, nbytes):
        val = val | _shl(sel[..., k] & 0xFF, 8 * k)
    return val, sel[..., nbytes]


def factored_planes_lookup(entries, planes_tab, lo=256):
    """entries (...,) int32 in [0, E); planes_tab (E, P) int8 ->
    (..., P) int32.  Two-level one-hot table lookup: the E-entry table
    re-tiles to (lo, nhi*P) so the MXU matmul's K dimension is `lo`
    (1-2 tiles) and N is nhi*P, then a small masked-sum picks the
    e // lo block.  A flat one-hot would cost R*E MACs — ruinous for
    the 3^8-entry dim-8 lattice books — this costs ~R*lo plus an
    R*nhi*P select."""
    E, P = planes_tab.shape
    nhi = -(-E // lo)
    pad = np.zeros((nhi * lo - E, P), planes_tab.dtype)
    t = np.concatenate([np.asarray(planes_tab, np.int8), pad], 0)
    W = jnp.asarray(t.reshape(nhi, lo, P).transpose(1, 0, 2)
                    .reshape(lo, nhi * P))
    shape = entries.shape
    e = jnp.clip(entries, 0, E - 1).reshape(-1)
    elo = e % lo
    ehi = e // lo
    oh = (elo[:, None] == jnp.arange(lo, dtype=jnp.int32)[None, :]) \
        .astype(jnp.int8)
    prod = jax.lax.dot(oh, W, preferred_element_type=jnp.int32) \
        .reshape(-1, nhi, P)
    hi_hit = (ehi[:, None]
              == jnp.arange(nhi, dtype=jnp.int32)[None, :])
    sel = jnp.sum(jnp.where(hi_hit[..., None], prod, 0), axis=1)
    return sel.reshape(shape + (P,))


def _val_from_planes(sel, nbytes):
    """(..., >=nbytes+1) int32 byte planes -> (val uint32, len int32)."""
    val = _u32(sel[..., 0] & 0xFF)
    for k in range(1, nbytes):
        val = val | _shl(sel[..., k] & 0xFF, 8 * k)
    return val, sel[..., nbytes]


def grouped_table_lookup(entries, cls, books):
    """Per-class codeword/length lookup via ONE flat factored lookup.

    books: list over class ids of None or (cw (E,) uint32,
    cl (E,) int32).  The class books concatenate into one flat table;
    a where-ladder turns (cls, entry) into a flat index, and
    factored_planes_lookup does the lookup with MXU tiles whose width
    is independent of the biggest book — the old stacked one-hot
    widened EVERY class to the 3^8-lattice width and was the single
    hottest op in the encode graph.  Byte planes are trimmed to the
    real max codeword length.  Rows whose class has no book return
    garbage — callers mask by the secondstages bit as before."""
    shape = entries.shape
    offs = np.zeros(len(books) + 1, np.int64)
    for c, b in enumerate(books):
        offs[c + 1] = offs[c] + (len(b[0]) if b is not None else 0)
    E = int(offs[-1])
    if E == 0:
        return jnp.zeros(shape, U32), jnp.zeros(shape, jnp.int32)
    maxlen = max(int(np.max(b[1])) for b in books if b is not None)
    nb = max(1, -(-maxlen // 8))
    cwf = np.concatenate([np.asarray(b[0], np.uint32)
                          for b in books if b is not None])
    clf = np.concatenate([np.asarray(b[1], np.int32)
                          for b in books if b is not None])
    planes = [((cwf >> np.uint32(8 * k)) & np.uint32(0xFF))
              .astype(np.int8) for k in range(nb)]
    planes.append(clf.astype(np.int8))     # codeword lengths <= 32
    tab = np.stack(planes, 1)
    clsb = jnp.broadcast_to(cls, shape)
    off = jnp.zeros(shape, jnp.int32)
    for c, b in enumerate(books):
        if b is None or offs[c] == 0:
            continue
        off = jnp.where(clsb == c, jnp.int32(offs[c]), off)
    idx = off + jnp.maximum(entries, 0)    # factored clips to [0, E)
    # balance the one-hot compare (R*lo) vs the block select
    # (R*(E/lo)*planes)
    lo = 256
    while lo * lo < E * (nb + 1) and lo < 2048:
        lo *= 2
    sel = factored_planes_lookup(idx, tab, lo=lo)
    return _val_from_planes(sel, nb)


def onehot_remap(entries, remap_digits, nd):
    """entries (...,) int32 -> remapped digits (..., nd) int32.
    Used by the rare lattice books whose unused entries redirect to a
    nearest used neighbour (res0.c local_book_besterror miss scan).
    Big tables (the 6561-entry lattices) route through the factored
    two-level lookup; small ones keep the flat one-hot int8 matmul."""
    maxent = remap_digits.shape[0]
    if maxent > 512:
        return factored_planes_lookup(entries,
                                      remap_digits.astype(np.int8))
    shape = entries.shape
    e = jnp.clip(entries, 0, maxent - 1).reshape(-1)
    oh = (e[:, None] == jnp.arange(maxent, dtype=jnp.int32)[None, :]) \
        .astype(jnp.int8)
    W = jnp.asarray(remap_digits.astype(np.int8))
    out = jax.lax.dot(oh, W, preferred_element_type=jnp.int32)
    return out.reshape(shape + (nd,))


# ---------------------------------------------------------------------------
# static column plan

@dataclass
class PackPlan:
    gidx: np.ndarray        # (C1, Gmax) int32 indices into columns, -1 pad
    n_cols: int             # raw column count C
    wb: int                 # packet byte budget
    worst_bytes: int        # true static worst case

    @staticmethod
    def build(maxbits, wb_cap=768):
        maxbits = np.asarray(maxbits, np.int64)
        C = len(maxbits)
        groups = []
        cur = []
        acc = 0
        for i in range(C):
            mb = int(maxbits[i])
            # 0-width columns are legal (e.g. modebits==0 for a
            # single-mode template, window flags on W=0 packets)
            assert 0 <= mb <= 32, mb
            if acc + mb > 32:
                groups.append(cur)
                cur = []
                acc = 0
            cur.append(i)
            acc += mb
        if cur:
            groups.append(cur)
        gmax = max(len(g) for g in groups)
        gidx = np.full((len(groups), gmax), -1, np.int32)
        for gi, g in enumerate(groups):
            gidx[gi, :len(g)] = g
        worst = (int(maxbits.sum()) + 7) // 8
        return PackPlan(gidx=gidx, n_cols=C,
                        wb=min(worst + 4, wb_cap), worst_bytes=worst + 4)


def merge_columns(vals, lens, plan: PackPlan):
    """(F, C) columns -> (F, C1) merged columns per the static plan."""
    F = vals.shape[0]
    zero_v = jnp.zeros((F, 1), U32)
    zero_l = jnp.zeros((F, 1), jnp.int32)
    v = jnp.concatenate([vals, zero_v], 1)
    l = jnp.concatenate([lens, zero_l], 1)
    gidx = np.where(plan.gidx < 0, plan.n_cols, plan.gidx)
    vg = v[:, gidx]                     # (F, C1, Gmax) static gather
    lg = l[:, gidx]
    # zero-length columns may carry stale values (masked lookups);
    # they must contribute no bits to the OR-merge
    vg = jnp.where(lg > 0, vg, jnp.uint32(0))
    acc_v = vg[..., 0]
    acc_l = lg[..., 0]
    for k in range(1, gidx.shape[1]):
        # plan guarantees acc_l <= 32 - maxbits_k < 32 whenever column
        # k can be non-empty, so the shift stays in range
        acc_v = acc_v | _shl(vg[..., k], jnp.minimum(acc_l, 31))
        acc_l = acc_l + lg[..., k]
    return acc_v, acc_l


def _merge_limb_pairs(limbs, lens, off):
    """One pairwise merge level for the device bit packer.

    limbs (F, C, nl) uint32 little-endian; lens (F, C) bit counts
    (<= 32*nl); off (F, C) absolute bit offsets.  Adjacent column
    pairs combine LSB-first: even | (odd << len_even).  Returns
    (limbs (F, C/2, 2*nl), lens, off) where off keeps the even
    column's offset (= the merged field's packet position)."""
    F, C, nl = limbs.shape
    if C % 2:
        limbs = jnp.concatenate(
            [limbs, jnp.zeros((F, 1, nl), limbs.dtype)], 1)
        lens = jnp.concatenate(
            [lens, jnp.zeros((F, 1), lens.dtype)], 1)
        off = jnp.concatenate(
            [off, off[:, -1:]], 1)
        C += 1
    a, la, off_a = limbs[:, 0::2], lens[:, 0::2], off[:, 0::2]
    b, lb = limbs[:, 1::2], lens[:, 1::2]
    nl2 = 2 * nl
    z = jnp.zeros(b.shape[:2] + (nl,), b.dtype)
    bl = jnp.concatenate([b, z], -1)             # (F, C2, nl2)
    s = (la & 31)[..., None]                     # sub-word shift
    w = (la >> 5)                                # word shift (0..nl)
    su = _u32(s)
    lo = _shl(bl, su)
    hi_src = jnp.concatenate([jnp.zeros_like(bl[..., :1]),
                              bl[..., :-1]], -1)
    carry = jnp.where(s > 0, hi_src >> _u32(32 - jnp.minimum(s, 31)),
                      jnp.uint32(0))
    bs = lo | carry
    shifted = bs
    for wv in range(1, nl + 1):
        rolled = jnp.concatenate(
            [jnp.zeros(bs.shape[:2] + (wv,), bs.dtype),
             bs[..., :nl2 - wv]], -1)
        shifted = jnp.where((w == wv)[..., None], rolled, shifted)
    a_ext = jnp.concatenate([a, z], -1)
    return a_ext | shifted, la + lb, off_a


def pack_bits_device(vals, lens, wb, merge_levels=2):
    """(F, C1) merged (value, nbits) columns -> (F, wb) packed bytes +
    (F,) total bit counts.  LSB-first like oggpack_write.

    Byte-plane formulation: field i spans a bounded byte window of
    the packet; plane_j = byte j of (value << (off&7)).  One one-hot
    int8 matmul per frame accumulates all planes onto the byte axis —
    the MXU replaces what XLA would otherwise lower as a serial
    scatter.  Before the matmul, `merge_levels` pairwise limb merges
    fold the <=32-bit columns into <=128-bit multi-limb columns: the
    one-hot operand (the bandwidth cost of this formulation) shrinks
    by 2^levels while the plane count only grows linearly."""
    F, C1 = vals.shape
    lens = lens.astype(jnp.int32)
    off = jnp.cumsum(lens, axis=1) - lens
    total = off[:, -1] + lens[:, -1]
    masked = jnp.where(lens > 0, _u32(vals), jnp.uint32(0))
    limbs = masked[..., None]
    L = lens
    for _ in range(merge_levels):
        limbs, L, off = _merge_limb_pairs(limbs, L, off)
    nl = limbs.shape[-1]
    base = (off >> 3).astype(jnp.int32)
    s7 = (off & 7)[..., None]
    su = _u32(s7)
    lo = _shl(limbs, su)
    hi_src = jnp.concatenate([jnp.zeros_like(limbs[..., :1]),
                              limbs[..., :-1]], -1)
    carry = jnp.where(s7 > 0,
                      hi_src >> _u32(32 - jnp.minimum(s7, 31)),
                      jnp.uint32(0))
    vs = lo | carry                              # (F, C, nl)
    top = jnp.where(s7[..., 0] > 0,
                    limbs[..., -1] >> _u32(32 - jnp.minimum(s7[..., 0],
                                                            31)),
                    jnp.uint32(0))
    nbytes = 4 * nl + 1                          # 32*nl + 7 bits
    planes = []
    for j in range(nbytes):
        k = j >> 2
        if k < nl:
            p = vs[..., k] >> _u32(8 * (j & 3))
        else:
            p = top >> _u32(8 * (j & 3))
        planes.append((p & jnp.uint32(0xFF)).astype(jnp.int8))
    planes = jnp.stack(planes, 1)                # (F, nbytes, C)
    oh = (base[:, :, None]
          == jnp.arange(wb, dtype=jnp.int32)[None, None, :]) \
        .astype(jnp.int8)                        # (F, C, wb)
    acc = jax.lax.dot_general(
        planes, oh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)        # (F, nbytes, wb)
    out = acc[:, 0, :]
    for j in range(1, nbytes):
        out = out + jnp.pad(acc[:, j, :-j], ((0, 0), (j, 0)))
    return out.astype(jnp.uint8), total


# ---------------------------------------------------------------------------
# the encoder step

class DeviceFastEncode:
    """One-jit PCM->packets step for the long-block fast path.

    Construction pulls every static table out of a FastEncoder's looks
    (floor neighbours, class/sub books, residue lattice parameters,
    codeword tables) and precomputes the column/merge/pack plan.
    """

    def __init__(self, fe, chunk_packets=1024, W=1):
        self.fe = fe
        self.ctx = fe.ctx(W) if hasattr(fe, "ctx") else fe
        self.W = W
        self.ch = fe.ch
        # residue-domain channel count: res2 codes ONE interleaved
        # vector over the coupled bundle
        self.res_type = getattr(self.ctx, "res_type", 1)
        self.res_ch = 1 if self.res_type == 2 else fe.ch
        self.n = self.ctx.n
        self.hop = self.n // 2
        self.chunk_packets = chunk_packets
        self.chunk_samples = chunk_packets * self.hop + self.hop
        mapping = getattr(self.ctx, "mapping", None)
        self.multi = mapping is not None and (
            mapping.submaps > 1 or mapping.coupling_steps > 1)
        if self.multi:
            self._prepare_multi(mapping)
        else:
            self._prepare_floor()
            self._prepare_residue()
            self._prepare_columns()
        self._step_cache = {}

    def _prepare_multi(self, mapping):
        """Multi-submap / multi-step coupling layout (e.g. the 5.1
        templates, reference lib/modes/residue_44p51.h: submap 0 =
        five coupled channels under res2 with four chained coupling
        steps, submap 1 = the LFE under res1).  Builds one
        floor+residue config namespace per submap plus the absolute
        coupling step list."""
        from types import SimpleNamespace
        from .residue_device import DeviceResidueVQ
        from .floor_pallas import make_floor_fit
        fe = self.fe
        vi = fe.vi
        self.mapping = mapping
        self.coupling = [(mapping.coupling_mag[s],
                          mapping.coupling_ang[s])
                         for s in range(mapping.coupling_steps)]
        self.groups = []
        for sm in range(mapping.submaps):
            chans = [c for c in range(self.ch)
                     if mapping.chmuxlist[c] == sm]
            assert chans == list(range(chans[0],
                                       chans[0] + len(chans))), \
                "submap channels must be contiguous"
            g = SimpleNamespace()
            g.channels = chans
            fl_idx = mapping.floorsubmap[sm]
            res_idx = mapping.residuesubmap[sm]
            g.fl_look = fe.enc.floor_looks[fl_idx]
            g.res_look = fe.enc.residue_looks[res_idx]
            g.res_type = vi.residue_types[res_idx]
            g.res_ch = 1 if g.res_type == 2 else len(chans)
            g.dvq = DeviceResidueVQ(g.res_look.info, g.res_look.books,
                                    g.res_look.partbooks)
            if (getattr(self.ctx, "fl_look", None) is g.fl_look
                    and getattr(self.ctx, "floor", None) is not None):
                g.floor = self.ctx.floor
            else:
                g.floor = make_floor_fit(g.fl_look)
            self._prepare_floor(look=g.fl_look, tgt=g)
            self._prepare_residue(look=g.res_look, dvq=g.dvq, tgt=g,
                                  res_ch=g.res_ch)
            self.groups.append(g)
        self._prepare_columns_multi()

    def _prepare_columns_multi(self):
        """Packet column plan for the multi-submap layout: header,
        then every channel's floor (its submap's config), then each
        submap's residue block (mapping0_forward emission order)."""
        fe = self.fe
        maxbits = [1, fe.modebits, 1, 1]
        self._g_fl_ncols = {}
        for g in self.groups:
            fl_bits = [1, g.qb, g.qb]
            for p in g.fl_parts:
                if p["csubbits"]:
                    fl_bits.append(int(np.max(p["classbook"].lengths)))
                for k in range(p["cdim"]):
                    ml = max((int(np.max(b.lengths))
                              for b in p["subbooks"] if b is not None),
                             default=1)
                    fl_bits.append(max(ml, 1))
            g.fl_bits = fl_bits
            g.fl_ncols = len(fl_bits)
        for c in range(self.ch):
            g = next(g for g in self.groups if c in g.channels)
            maxbits.extend(g.fl_bits)
        for g in self.groups:
            ph_maxlen = int(g.ph_cl.max())
            for s in range(g.stages):
                st = g.stage_tabs[s]
                ms = st["max_steps"]
                pos_ml = np.zeros(ms, np.int64)
                for cc, d in enumerate(g.res_books[s]):
                    if d is None:
                        continue
                    sc = g.spp // d["dim"]
                    ml = int(np.max(np.asarray(
                        g.res_look.partbooks[cc][s].lengths)))
                    pos_ml[:sc] = np.maximum(pos_ml[:sc], ml)
                pos_ml = np.maximum(pos_ml, 1)
                for c0 in range(g.nchunks):
                    if s == 0:
                        maxbits.extend([ph_maxlen] * g.res_ch)
                    for _ in range(g.ppw):
                        for _ in range(g.res_ch):
                            maxbits.extend(pos_ml.tolist())
        self.plan = PackPlan.build(maxbits, wb_cap=2048)

    # -- static preparation ------------------------------------------------
    def _prepare_floor(self, look=None, tgt=None):
        """Extract one floor config's static tables onto tgt (default:
        self — the single-submap fast path)."""
        fe = self.fe
        tgt = tgt if tgt is not None else self
        look = look if look is not None else self.ctx.fl_look
        self = tgt
        info = look.info
        self.fl = look
        self.P = look.posts
        self.quant_q = look.quant_q
        self.qb = ilog(look.quant_q - 1)
        self.lo_static = np.asarray(look.loneighbor, np.int64)
        self.hi_static = np.asarray(look.hineighbor, np.int64)
        self.postlist = np.asarray(info.postlist, np.int64)
        self.mult = info.mult
        # per-partition class metadata + codeword tables
        vb = fe.vi.books
        sb = fe.vi.static_books
        self.fl_parts = []
        for i in range(info.partitions):
            cls = info.partitionclass[i]
            cdim = info.class_dim[cls]
            csubbits = info.class_subs[cls]
            csub = 1 << csubbits
            subs = [info.class_subbook[cls][k] for k in range(csub)]
            maxval = np.asarray(
                [1 if s < 0 else sb[s].entries for s in subs], np.int64)
            cb = vb[info.class_book[cls]] if csubbits else None
            subbooks = [(None if s < 0 else vb[s]) for s in subs]
            self.fl_parts.append(dict(
                cls=cls, cdim=cdim, csubbits=csubbits, csub=csub,
                maxval=maxval, classbook=cb, subbooks=subbooks))

    def _prepare_residue(self, look=None, dvq=None, tgt=None,
                         res_ch=None):
        """Extract one residue config's static tables onto tgt
        (default: self)."""
        fe = self.fe
        tgt = tgt if tgt is not None else self
        look = look if look is not None else self.ctx.res_look
        dvq = dvq if dvq is not None else self.ctx.dvq
        self = tgt
        self.res_look_ = look
        self.dvq_ = dvq
        if res_ch is not None:
            self.res_ch = res_ch
        info = look.info
        self.ri = info
        self.spp = info.grouping
        self.partvals = (info.end - info.begin) // self.spp
        self.ppw = look.dim
        self.nchunks = (self.partvals + self.ppw - 1) // self.ppw
        self.parts_pad = self.nchunks * self.ppw
        self.possible = info.partitions
        self.stages = look.stages
        self.sec = np.asarray(info.secondstages, np.int64)
        self.phrasebook = look.phrasebook
        # per (stage, class): lattice params (books are exact zigzag
        # lattices: value(m) = delta * zz(m), verified at init)
        self.res_books = []          # [stage][class] dict or None
        for s in range(self.stages):
            row = []
            for c in range(self.possible):
                b = (dvq.books[c][s]
                     if s < len(dvq.books[c]) else None)
                if b is None or not (self.sec[c] >> s) & 1:
                    row.append(None)
                    continue
                vals_np = np.asarray(b.values, np.float64)
                qv, dim, E = b.qv, b.dim, b.entries
                assert qv ** dim == E, "expected a full lattice"
                # verify zigzag-separable values
                ok = True
                for k in range(dim):
                    vmap = vals_np[(np.arange(qv) * qv ** k), k]
                    zz = np.where(np.arange(qv) % 2,
                                  -((np.arange(qv) + 1) // 2),
                                  np.arange(qv) // 2)
                    if not np.array_equal(vmap, b.delta * zz):
                        ok = False
                    dig = (np.arange(E) // qv ** k) % qv
                    if not np.array_equal(vals_np[:, k], vmap[dig]):
                        ok = False
                assert ok, f"non-lattice residue book c{c} s{s}"
                # the exact-int32 trunc division in _vq_stages needs
                # integral lattice params
                assert float(b.delta).is_integer(), b.delta
                assert float(b.minval).is_integer(), b.minval
                remap = np.asarray(b.remap)
                ident = bool(np.all(remap == np.arange(E)))
                rdig = None
                if not ident:
                    rdig = np.stack(
                        [((remap // qv ** k) % qv) for k in range(dim)],
                        1).astype(np.int8)
                row.append(dict(book=b, qv=qv, dim=dim, entries=E,
                                minval=b.minval, delta=b.delta,
                                ident=ident, remap_digits=rdig))
            self.res_books.append(row)
        # per-stage codeword tables: per-class (cw, cl) pairs for the
        # width-grouped lookup plus the stacked padded form
        self.stage_tabs = []
        for s in range(self.stages):
            maxent = max((d["entries"] for d in self.res_books[s]
                          if d is not None), default=1)
            cw = np.zeros((self.possible, maxent), np.uint32)
            cl = np.zeros((self.possible, maxent), np.int32)
            steps = np.ones(self.possible, np.int64)
            cls_books = []
            for c, d in enumerate(self.res_books[s]):
                if d is None:
                    cls_books.append(None)
                    continue
                bk = look.partbooks[c][s]
                bcw = np.asarray(bk.codewords, np.uint64) \
                    .astype(np.uint32)
                bcl = np.asarray(bk.lengths, np.int32)
                cls_books.append((bcw, bcl))
                cw[c, :d["entries"]] = bcw
                cl[c, :d["entries"]] = bcl
                steps[c] = self.spp // d["dim"]
            max_steps = int(steps[[d is not None
                                   for d in self.res_books[s]]].max()
                            if any(d is not None
                                   for d in self.res_books[s]) else 1)
            self.stage_tabs.append(dict(
                cw=cw, cl=cl, steps=steps, max_steps=max_steps,
                maxent=maxent, cls_books=cls_books,
                maxlen=[int(cl[:, :].max())]))
        # phrase codewords
        ph = self.phrasebook
        self.ph_cw = np.asarray(ph.codewords, np.uint64) \
            .astype(np.uint32)
        self.ph_cl = np.asarray(ph.lengths, np.int32)

    def _prepare_columns(self):
        """Static per-column worst-case widths, in exact packet
        emission order (must mirror _assemble_columns)."""
        fe = self.fe
        maxbits = [1, fe.modebits, 1, 1]
        # floor per channel
        fl_bits = [1, self.qb, self.qb]
        for p in self.fl_parts:
            if p["csubbits"]:
                fl_bits.append(int(np.max(p["classbook"].lengths)))
            for k in range(p["cdim"]):
                ml = max((int(np.max(b.lengths))
                          for b in p["subbooks"] if b is not None),
                         default=1)
                fl_bits.append(max(ml, 1))
        for _ in range(self.ch):
            maxbits.extend(fl_bits)
        self.fl_ncols = len(fl_bits)
        # residue stages
        ph_maxlen = int(self.ph_cl.max())
        self.res_ncols = []
        for s in range(self.stages):
            st = self.stage_tabs[s]
            ms = st["max_steps"]
            # per step position: max codeword length over classes
            # whose stage-s book still has that step
            pos_ml = np.zeros(ms, np.int64)
            for c, d in enumerate(self.res_books[s]):
                if d is None:
                    continue
                sc = self.spp // d["dim"]
                ml = int(np.max(np.asarray(
                    self.ctx.res_look.partbooks[c][s].lengths)))
                pos_ml[:sc] = np.maximum(pos_ml[:sc], ml)
            pos_ml = np.maximum(pos_ml, 1)
            ncols = 0
            for c0 in range(self.nchunks):
                if s == 0:
                    maxbits.extend([ph_maxlen] * self.res_ch)
                    ncols += self.res_ch
                for _ in range(self.ppw):
                    for _ in range(self.res_ch):
                        maxbits.extend(pos_ml.tolist())
                        ncols += ms
            self.res_ncols.append(ncols)
        self.plan = PackPlan.build(maxbits)

    # -- device stages -------------------------------------------------------
    def _floor_wrap(self, posts, used, cfg=None):
        cfg = cfg if cfg is not None else self
        """Raw fit posts (B, P) -> (codes (B, P), qposts (B, P)) — the
        floor1_encode quantization + predictive wrap coding
        (floor1.c:774-935), vectorized over frames."""
        P = cfg.P
        post = posts.astype(jnp.int32)
        val = post & 0x7FFF
        m = cfg.mult
        val = (val >> 2 if m == 1 else val >> 3 if m == 2
               else val // 12 if m == 3 else val >> 4)
        post = val | (post & 0x8000)
        out0 = post[:, 0] & 0x7FFF
        out1 = post[:, 1] & 0x7FFF
        outs = [out0, out1]
        cols = [post[:, i] for i in range(P)]
        qq = cfg.quant_q
        for i in range(2, P):
            ln = int(cfg.lo_static[i - 2])
            hn = int(cfg.hi_static[i - 2])
            y0 = cols[ln] & 0x7FFF
            y1 = cols[hn] & 0x7FFF
            dy = y1 - y0
            adx = int(cfg.postlist[hn] - cfg.postlist[ln])
            err = jnp.abs(dy) * int(cfg.postlist[i]
                                    - cfg.postlist[ln])
            offp = err // adx
            predicted = jnp.where(dy < 0, y0 - offp, y0 + offp)
            flag = ((cols[i] & 0x8000) != 0) | (predicted == cols[i])
            headroom = jnp.minimum(qq - predicted, predicted)
            v = cols[i] - predicted
            vneg = jnp.where(v < -headroom, headroom - v - 1,
                             -1 - (v << 1))
            vpos = jnp.where(v >= headroom, v + headroom, v << 1)
            code = jnp.where(v < 0, vneg, vpos)
            outs.append(jnp.where(flag, 0, code))
            cols[i] = jnp.where(flag, predicted | 0x8000, cols[i])
            unflag = ~flag
            cols[ln] = jnp.where(unflag, cols[ln] & 0x7FFF, cols[ln])
            cols[hn] = jnp.where(unflag, cols[hn] & 0x7FFF, cols[hn])
        codes = jnp.stack(outs, 1)
        qposts = jnp.stack(cols, 1)
        return codes, qposts

    def _floor_fields(self, codes, used, cfg=None):
        cfg = cfg if cfg is not None else self
        """codes (B, P) + used (B,) -> (vals (B, FC) uint32,
        lens (B, FC) int32) for one batch of channels."""
        B = codes.shape[0]
        vals = [jnp.where(used, jnp.uint32(1), jnp.uint32(0))]
        lens = [jnp.ones((B,), jnp.int32)]
        qbl = jnp.where(used, jnp.int32(cfg.qb), 0)
        vals += [_u32(codes[:, 0]), _u32(codes[:, 1])]
        lens += [qbl, qbl]
        j = 2
        for p in cfg.fl_parts:
            cdim = p["cdim"]
            seg = codes[:, j:j + cdim]                 # (B, cdim)
            mv = jnp.asarray(p["maxval"].astype(np.int32))
            cond = seg[:, :, None] < mv[None, None, :]
            anyc = cond.any(-1)
            bookas = jnp.where(anyc, jnp.argmax(cond, -1), 0)
            if p["csubbits"]:
                shifts = np.arange(cdim) * p["csubbits"]
                cval = (bookas << jnp.asarray(shifts.astype(np.int32))
                        [None, :]).sum(-1)
                cb = p["classbook"]
                cwt = jnp.asarray(np.asarray(cb.codewords, np.uint64)
                                  .astype(np.uint32))
                clt = jnp.asarray(np.asarray(cb.lengths, np.int32))
                vals.append(jnp.take(cwt, cval, axis=0))
                lens.append(jnp.where(used,
                                      jnp.take(clt, cval, axis=0), 0))
            for k in range(cdim):
                v_k = jnp.zeros((B,), U32)
                l_k = jnp.zeros((B,), jnp.int32)
                ok = jnp.zeros((B,), bool)
                for l, bk in enumerate(p["subbooks"]):
                    if bk is None:
                        continue
                    cwt = jnp.asarray(np.asarray(bk.codewords,
                                                 np.uint64)
                                      .astype(np.uint32))
                    clt = jnp.asarray(np.asarray(bk.lengths,
                                                 np.int32))
                    idx = jnp.clip(seg[:, k], 0, bk.entries - 1)
                    sel = (bookas[:, k] == l) & (seg[:, k]
                                                 < bk.entries)
                    v_k = jnp.where(sel, jnp.take(cwt, idx, 0), v_k)
                    l_k = jnp.where(sel, jnp.take(clt, idx, 0), l_k)
                    ok = ok | sel
                vals.append(v_k)
                lens.append(jnp.where(ok & used, l_k, 0))
            j += cdim
        return jnp.stack(vals, 1), jnp.stack(lens, 1)

    def _classify(self, res, cfg=None):
        cfg = cfg if cfg is not None else self
        """res (B, n) float (already rint'ed) -> partword
        (B, partvals) int32 (res01_class)."""
        ri = cfg.ri
        spp = cfg.spp
        need = ri.begin + cfg.partvals * spp
        if need > res.shape[-1]:
            pad = jnp.zeros(res.shape[:-1]
                            + (need - res.shape[-1],), res.dtype)
            res = jnp.concatenate([res, pad], -1)
        seg = jnp.abs(res[..., ri.begin:need].astype(jnp.int32)) \
            .reshape(res.shape[:-1] + (cfg.partvals, spp))
        mx = seg.max(-1)
        scale = f32(f32(100.0) / f32(spp))
        ent = (seg.sum(-1).astype(jnp.float32) * scale) \
            .astype(jnp.int32)
        cm1 = np.asarray(ri.classmetric1, np.int64)
        cm2 = np.asarray(ri.classmetric2, np.int64)
        k = jnp.full(mx.shape, cfg.possible - 1, jnp.int32)
        for kk in range(cfg.possible - 2, -1, -1):
            okk = (mx <= int(cm1[kk])) & (
                True if cm2[kk] < 0 else (ent < int(cm2[kk])))
            k = jnp.where(okk, kk, k)
        return k

    def _vq_stages(self, res, pw, cfg=None):
        cfg = cfg if cfg is not None else self
        """res (B, n) float residuals, pw (B, partvals) -> per stage
        entries (B, partvals, max_steps) int32 (-1 where inactive).
        Pure elementwise zigzag-lattice math (res0.c _encodepart with
        the lattice fast path; value reconstruction is delta*zz(m))."""
        spp = cfg.spp
        need = cfg.ri.begin + cfg.partvals * spp
        if need > res.shape[-1]:
            pad = jnp.zeros(res.shape[:-1]
                            + (need - res.shape[-1],), res.dtype)
            res = jnp.concatenate([res, pad], -1)
        work = res[..., cfg.ri.begin:need].astype(jnp.float32) \
            .reshape(res.shape[:-1] + (cfg.partvals, spp))
        out = []
        for s in range(cfg.stages):
            st = cfg.stage_tabs[s]
            ents = jnp.full(work.shape[:-1] + (st["max_steps"],), -1,
                            jnp.int32)
            new_work = work
            dims = sorted({d["dim"] for d in cfg.res_books[s]
                           if d is not None})
            for dim in dims:
                steps = spp // dim
                a = work.reshape(work.shape[:-1] + (steps, dim))
                classes = [c for c, d in enumerate(cfg.res_books[s])
                           if d is not None and d["dim"] == dim]
                # per-partition scalar params via where-ladder
                mvv = jnp.zeros(pw.shape, jnp.float32)
                dl = jnp.ones(pw.shape, jnp.float32)
                addv = jnp.zeros(pw.shape, jnp.float32)
                qvv = jnp.ones(pw.shape, jnp.int32)
                act = jnp.zeros(pw.shape, bool)
                for c in classes:
                    d = cfg.res_books[s][c]
                    selc = pw == c
                    mvv = jnp.where(selc, f32(d["minval"]), mvv)
                    dl = jnp.where(selc, f32(d["delta"]), dl)
                    # C: +(delta>>1) before the divide, but only for
                    # delta != 1 (res0.c local_book_besterror)
                    addf = f32(d["delta"] >> 1) if d["delta"] != 1 \
                        else f32(0.0)
                    addv = jnp.where(selc, addf, addv)
                    qvv = jnp.where(selc, d["qv"], qvv)
                    act = act | selc
                mv4 = mvv[..., None, None]
                dl4 = dl[..., None, None]
                qv4 = qvv[..., None, None]
                ze4 = qv4 >> 1
                t = a - mv4 + addv[..., None, None]
                # trunc-toward-zero division.  The C computes an IEEE
                # f32 division and truncates; XLA strength-reduces
                # division by a compile-time constant into a
                # reciprocal multiply, which rounds differently
                # (1785/255 -> 6.9999995 -> 6, not 7).  Every residue
                # lattice delta is integral and t is integer-valued,
                # so exact int32 division (with C trunc semantics)
                # reproduces the reference bit-for-bit.
                ti = t.astype(jnp.int32)
                di = dl4.astype(jnp.int32)
                v = jnp.where(ti >= 0, ti // di, -((-ti) // di))
                m = jnp.where(v < ze4, ((ze4 - v) << 1) - 1,
                              (v - ze4) << 1)
                m = jnp.clip(m, 0, qv4 - 1)
                # entry index: digit o has significance qv^o
                idx = jnp.zeros(a.shape[:-1], jnp.int32)
                for o in range(dim - 1, -1, -1):
                    idx = idx * qv4[..., 0] + m[..., o]
                mdig = m
                # non-identity remaps (unused lattice entries)
                for c in classes:
                    d = cfg.res_books[s][c]
                    if d["ident"]:
                        continue
                    rd = onehot_remap(idx, d["remap_digits"], dim)
                    selc = (pw == c)[..., None, None]
                    mdig = jnp.where(selc, rd, mdig)
                    idx2 = jnp.zeros(a.shape[:-1], jnp.int32)
                    for o in range(dim - 1, -1, -1):
                        idx2 = idx2 * d["qv"] + rd[..., o]
                    idx = jnp.where(selc[..., 0], idx2, idx)
                zz = jnp.where((mdig & 1) == 1, -((mdig + 1) >> 1),
                               mdig >> 1)
                rec = dl4 * zz.astype(jnp.float32)
                sel = act[..., None]
                rem = (a - rec).reshape(work.shape)
                new_work = jnp.where(sel, rem, new_work)
                ents = ents.at[..., :steps].set(
                    jnp.where(sel, idx, ents[..., :steps]))
            work = new_work
            out.append(ents)
        return out

    def _residue_fields(self, pw, entries, used, cfg=None):
        cfg = cfg if cfg is not None else self
        """pw (F, ch, partvals), entries per stage
        (F, ch, partvals, max_steps), used (F, ch) -> (vals, lens)
        (F, RC) in res01_forward emission order."""
        F = pw.shape[0]
        ch = cfg.res_ch
        ppw = cfg.ppw
        nck = cfg.nchunks
        vals_blocks = []
        lens_blocks = []
        pwp = jnp.concatenate(
            [pw, jnp.zeros((F, ch, cfg.parts_pad - cfg.partvals),
                           jnp.int32)], -1) \
            if cfg.parts_pad != cfg.partvals else pw
        for s in range(cfg.stages):
            st = cfg.stage_tabs[s]
            ms = st["max_steps"]
            # entry codewords via one-hot matmul
            e = entries[s]
            ent_act = e >= 0
            secb = jnp.asarray(cfg.sec.astype(np.int32))
            act = (((jnp.take(secb, pw, axis=0) >> s) & 1) == 1) \
                & used[..., None]
            stepst = jnp.asarray(st["steps"].astype(np.int32))
            nsteps = jnp.take(stepst, pw, axis=0)     # (F, ch, parts)
            krange = jnp.arange(ms, dtype=jnp.int32)
            inr = (krange[None, None, None, :] < nsteps[..., None]) \
                & act[..., None] & ent_act
            # slot-range split: step slots >= k only belong to classes
            # with steps > k, so later slots look up in a table WITHOUT
            # the big low-step books (the 3^8 lattices all sit in the
            # first few slots) — 4x fewer rows against the big table
            e_in = jnp.where(inr, e, 0)
            stepv = [int(st["steps"][c]) for c in range(cfg.possible)]
            bounds = sorted({0, ms} | {v for c, v in enumerate(stepv)
                                       if v < ms
                                       and st["cls_books"][c]
                                       is not None})
            evs, els = [], []
            for k0, k1 in zip(bounds[:-1], bounds[1:]):
                books_k = [b if (b is not None and stepv[c] > k0)
                           else None
                           for c, b in enumerate(st["cls_books"])]
                ev_k, el_k = grouped_table_lookup(
                    e_in[..., k0:k1], pw[..., None], books_k)
                evs.append(ev_k)
                els.append(el_k)
            ev = jnp.concatenate(evs, -1) if len(evs) > 1 else evs[0]
            el = jnp.concatenate(els, -1) if len(els) > 1 else els[0]
            el = jnp.where(inr, el, 0)
            # pad partitions to nchunks*ppw
            if cfg.parts_pad != cfg.partvals:
                padn = cfg.parts_pad - cfg.partvals
                ev = jnp.concatenate(
                    [ev, jnp.zeros((F, ch, padn, ms), U32)], 2)
                el = jnp.concatenate(
                    [el, jnp.zeros((F, ch, padn, ms), jnp.int32)], 2)
            # (F, ch, nck, ppw, ms) -> (F, nck, ppw, ch, ms)
            ev = ev.reshape(F, ch, nck, ppw, ms) \
                .transpose(0, 2, 3, 1, 4)
            el = el.reshape(F, ch, nck, ppw, ms) \
                .transpose(0, 2, 3, 1, 4)
            if s == 0:
                # phrase words: digit-pack ppw partwords, MSB first
                ph_v = jnp.zeros((F, ch, nck), jnp.int32)
                for k in range(ppw):
                    ph_v = ph_v * cfg.possible \
                        + pwp[..., k::ppw][..., :nck]
                ph_ok = (ph_v < cfg.phrasebook.entries) \
                    & used[..., None]
                ph_idx = jnp.where(ph_ok, ph_v, 0)
                cwt = jnp.asarray(cfg.ph_cw)
                clt = jnp.asarray(cfg.ph_cl)
                ph_cw = jnp.take(cwt, ph_idx, axis=0)
                ph_cl = jnp.where(ph_ok,
                                  jnp.take(clt, ph_idx, axis=0), 0)
                # (F, ch, nck) -> (F, nck, ch, 1)
                ph_cw = ph_cw.transpose(0, 2, 1)[..., None]
                ph_cl = ph_cl.transpose(0, 2, 1)[..., None]
                blk_v = jnp.concatenate(
                    [ph_cw.reshape(F, nck, ch),
                     ev.reshape(F, nck, ppw * ch * ms)], -1)
                blk_l = jnp.concatenate(
                    [ph_cl.reshape(F, nck, ch),
                     el.reshape(F, nck, ppw * ch * ms)], -1)
            else:
                blk_v = ev.reshape(F, nck, ppw * ch * ms)
                blk_l = el.reshape(F, nck, ppw * ch * ms)
            vals_blocks.append(blk_v.reshape(F, -1))
            lens_blocks.append(blk_l.reshape(F, -1))
        return (jnp.concatenate(vals_blocks, 1),
                jnp.concatenate(lens_blocks, 1))


    # -- channel coupling (res2 / coupled stereo) ---------------------------
    def _classify2(self, absM, absA, cfg=None, nch=2):
        """res2 classification (_2class, res0.c:473): per interleaved
        partition, the magnitude channel's max and the angle channels'
        max walk the classmetric thresholds.  absM: (F, n2) channel-0
        abs ints; absA: (F, n2) the elementwise max over the other
        channels."""
        cfg = cfg if cfg is not None else self
        ri = cfg.ri
        spp = cfg.spp
        per = spp // nch
        b0 = ri.begin // nch
        need = b0 + cfg.partvals * per
        def seg(x):
            if need > x.shape[-1]:
                x = jnp.concatenate(
                    [x, jnp.zeros(x.shape[:-1] + (need - x.shape[-1],),
                                  x.dtype)], -1)
            return x[..., b0:need].reshape(
                x.shape[:-1] + (cfg.partvals, per))
        magmax = seg(absM).max(-1)
        angmax = seg(absA).max(-1)
        cm1 = np.asarray(ri.classmetric1, np.int64)
        cm2 = np.asarray(ri.classmetric2, np.int64)
        k = jnp.full(magmax.shape, cfg.possible - 1, jnp.int32)
        for kk in range(cfg.possible - 2, -1, -1):
            ok = (magmax <= int(cm1[kk])) & (angmax <= int(cm2[kk]))
            k = jnp.where(ok, kk, k)
        return k

    def _m6_promote(self, rM, rA, reM, reA, flagm1, F, prae=0.34,
                    couple=None):
        """aoTuV M6 dynamic lossless promotion (psy.c:5007-5047), one
        coupling step: per partition below tonefix_end, count
        sign-opposed vs parallel active bins and the mean |res|
        imbalance; an EMA of the imbalance across partitions (the
        side_resdef carry, a small lax.scan) promotes flag==-1 bins to
        lossless when the imbalance exceeds 1 or the opposed fraction
        exceeds prae (0.34 single-step, 0.825 multi-step).
        rM/rA: the pair's current residue values (F, n2); reM/reA the
        signed raw energies; flagm1: (F, n2) bins flagged -1 on either
        channel.  Returns promoted (F, n2)."""
        cp = couple if couple is not None else self.ctx.couple
        tfe = int(cp.get("tonefix_end", 0))
        n2 = rM.shape[-1]
        if tfe <= 0:
            return jnp.zeros((F, n2), bool)
        part = cp["partition"]
        npt = (n2 + part - 1) // part
        padn = npt * part - n2
        def p4(a):
            return jnp.pad(a, ((0, 0), (0, padn))) if padn else a
        active = (jnp.abs(rM) >= 0.5) | (jnp.abs(rA) >= 0.5)
        opposed = ((reM > 0) & (reA < 0)) | ((reA > 0) & (reM < 0))
        imb = jnp.abs(jnp.abs(rM) - jnp.abs(rA))
        act_p = p4(active.astype(jnp.float32)).reshape(F, npt, part)
        opp_p = p4((active & opposed).astype(jnp.float32)) \
            .reshape(F, npt, part)
        imb_p = p4(jnp.where(active, imb, f32(0.0))) \
            .reshape(F, npt, part)
        ap = act_p.sum(-1)
        rp = opp_p.sum(-1)
        rdsum = imb_p.sum(-1)
        temp_def = rdsum / jnp.maximum(ap, f32(1.0))
        ingate = jnp.asarray(np.arange(npt) * part < tfe)
        nz = (ap > 0) & ingate

        def scan_step(carry, x):
            td, on = x
            rdef = jnp.where(carry > 0,
                             td * f32(0.5) + carry * f32(0.5), td)
            new = jnp.where(on, td, f32(-1.0))
            return new, jnp.where(on, rdef, f32(0.0))

        _, rdef = jax.lax.scan(
            scan_step, jnp.full((F,), -1.0, jnp.float32),
            (temp_def.T, nz.T))
        rdef = rdef.T                                    # (F, npt)
        prae = f32(prae)
        c1 = nz & (rdef > 1.0)
        c2 = nz & (rp / jnp.maximum(ap, f32(1.0)) >= prae)
        c1b = jnp.repeat(c1, part, axis=-1)[:, :n2]
        c2b = jnp.repeat(c2, part, axis=-1)[:, :n2]
        return flagm1 & (c1b | (c2b & opposed))

    def _couple_quantize(self, md, curve, used, F, thr1=None,
                         threv=None, inlimit=None, epeak=None,
                         npeak=None):
        """Stereo channel coupling + quantization (reference:
        _vp_couple_quantize_normalize, psy.c:4858-5142), stateless fast
        path: per-bin lossless flags from the stereo point thresholds,
        integer mag/ang lossless transform, min_indemnity_dipole_hypot
        point fold with energy requantization.  Skips the M6/M9
        cross-frame history and (at rungs where normal_thresh disables
        it anyway) the noise-normalize promotion.  md/curve: (F*2, n2);
        returns integer-valued (F, 2, n2) float32 residues.

        thr1/threv/inlimit may override the single-blob static
        threshold profiles with per-frame (F, n2) arrays — the managed
        15-packetblob pass varies prepoint/postpoint/pointlimit per
        blob (psy.c blob loop, mapping0.c:1204-1313)."""
        cp = self.ctx.couple
        n2 = md.shape[-1]
        mdc = md.reshape(F, 2, n2)
        us = used.reshape(F, 2)
        cur = curve.reshape(F, 2, n2)
        cur = jnp.where(us[..., None], cur, f32(1e-10))
        res = jnp.where(us[..., None], mdc / cur, f32(0.0))
        if thr1 is None:
            thr1 = jnp.asarray(cp["thr1"][:n2])
        r = jnp.abs(res)
        if epeak is not None:
            # M9: the stored post-echo peaks lower the lossless
            # threshold per bin (flag_lossless's point1 -= enpeak,
            # clamped at prepoint)
            prep = f32(cp["prepoint"])
            ep = epeak.reshape(F, 2, n2)
            thrM = jnp.maximum(thr1 - ep[:, 0], prep)
            thrA = jnp.maximum(thr1 - ep[:, 1], prep)
        else:
            thrM = thrA = thr1
        f1M = r[:, 0] >= thrM
        f1A = r[:, 1] >= thrA
        lossless = f1M | f1A
        if epeak is not None and int(cp.get("tonefix_end", 0)) > 0:
            # flag -1 (point2 threshold) feeds the M6 promotion
            thr2 = jnp.asarray(cp["thr2"][:n2])
            flagm1 = ((~f1M) & (r[:, 0] >= thr2)) \
                | ((~f1A) & (r[:, 1] >= thr2))
            rawM = jnp.where(mdc[:, 0] < 0, -(mdc[:, 0] * mdc[:, 0]),
                             mdc[:, 0] * mdc[:, 0])
            rawA = jnp.where(mdc[:, 1] < 0, -(mdc[:, 1] * mdc[:, 1]),
                             mdc[:, 1] * mdc[:, 1])
            promoted = self._m6_promote(res[:, 0], res[:, 1], rawM,
                                        rawA, flagm1 & ~lossless, F)
            lossless = lossless | promoted
        qi = jnp.rint(res)
        qiM, qiA = qi[:, 0], qi[:, 1]
        # integer lossless mag/ang (psy.c lossless_coupling)
        c1 = jnp.abs(qiM) > jnp.abs(qiA)
        mag = jnp.where(c1, qiM, qiA)
        ang = jnp.where(c1,
                        jnp.where(qiM > 0, qiM - qiA, qiA - qiM),
                        jnp.where(qiA > 0, qiM - qiA, qiA - qiM))
        flip = ang >= jnp.abs(mag) * 2
        mag = jnp.where(flip, -mag, mag)
        ang = jnp.where(flip, -ang, ang)
        # point-stereo fold on the signed energy domain
        thnor = f32(0.94)
        mm = jnp.where(us[:, 0, None], mdc[:, 0], f32(0.0))
        ma = jnp.where(us[:, 1, None], mdc[:, 1], f32(0.0))
        rawM = jnp.where(mm < 0, -(mm * mm), mm * mm)
        rawA = jnp.where(ma < 0, -(ma * ma), ma * ma)
        if threv is None:
            threv = jnp.asarray(cp["threv"][:n2])
        a2 = jnp.abs(rawM * thnor)
        b2 = jnp.abs(rawA * thnor)
        hyp = jnp.where(
            rawM > 0,
            jnp.where(rawA > 0, a2 + b2,
                      jnp.where(mm > -ma, a2 - b2 * threv,
                                -(b2 - a2 * threv))),
            jnp.where(rawA < 0, -(a2 + b2),
                      jnp.where(-mm > ma, -(a2 - b2 * threv),
                                b2 - a2 * threv)))
        floorsum = cur[:, 0] * cur[:, 0] + cur[:, 1] * cur[:, 1]
        ve = jnp.abs(hyp) / floorsum
        mag_pt = jnp.rint(jnp.sqrt(ve))
        mag_pt = jnp.where(hyp < 0, -mag_pt, mag_pt)
        outM = jnp.where(lossless, mag, mag_pt)
        outA = jnp.where(lossless, ang, f32(0.0))
        any_used = us[:, 0] | us[:, 1]
        nm = getattr(self.ctx, "normal", None)
        if nm is not None and nm["thresh"] < 9000.0:
            bins = np.arange(n2)
            if inlimit is None:
                inlimit = jnp.asarray(bins >= cp["limit"])
            inreg = jnp.asarray(bins >= nm["start"]) & inlimit
            cand = (~lossless) & (ve < f32(0.25)) & inreg \
                & any_used[:, None]
            npk_m = None
            if npeak is not None:
                # point-coupled partitions take the pairwise npeak
                # merge (psy.c:1377-1381 of the port; negative wins)
                npk2 = npeak.reshape(F, 2, -1)
                neg = (npk2[:, 0] < -0.5) | (npk2[:, 1] < -0.5)
                npk_m = jnp.where(neg, f32(-1.0),
                                  jnp.minimum(npk2[:, 0], npk2[:, 1]))
            outM = self._normalize_promote(outM, ve, jnp.abs(hyp),
                                           cand, hyp, npeak=npk_m)
        outM = jnp.where(any_used[:, None], outM, f32(0.0))
        outA = jnp.where(any_used[:, None], outA, f32(0.0))
        return jnp.stack([outM, outA], 1), any_used


    def _couple_multi(self, md_g, curve_g, used_g, F, epeak=None,
                      npeak=None):
        """General multi-step channel coupling for the coupled submap
        (reference: the coupling_steps loop of
        _vp_couple_quantize_normalize, psy.c:4858-5142 — e.g. the 5.1
        templates couple five channels through FOUR chained steps:
        (0,2) (3,4) (0,1) (0,3), so later steps read the folded
        outputs of earlier ones).  md_g/curve_g: (F, C, n2);
        used_g: (F, C).  Returns (out (F, C, n2) integer-valued f32,
        used_out (F, C))."""
        cp = self.ctx.couple
        nsteps = len(self.coupling)
        prae = 0.34 if nsteps == 1 else 0.825
        n2 = md_g.shape[-1]
        C = md_g.shape[1]
        us = used_g
        cur = jnp.where(us[..., None], curve_g, f32(1e-10))
        res = jnp.where(us[..., None], md_g / cur, f32(0.0))
        r = jnp.abs(res)
        thr1 = jnp.asarray(cp["thr1"][:n2])
        thr2 = jnp.asarray(cp["thr2"][:n2])
        prep = f32(cp["prepoint"])
        if epeak is not None:
            thr_eff = jnp.maximum(thr1 - epeak, prep)
        else:
            thr_eff = jnp.broadcast_to(thr1, r.shape)
        tfe = int(cp.get("tonefix_end", 0))
        bins = np.arange(n2)
        limit = cp["limit"]
        nm = getattr(self.ctx, "normal", None)
        promote_on = nm is not None and nm["thresh"] < 9000.0

        # per-channel mutable state (python lists of (F, n2) arrays)
        f1 = [r[:, c] >= thr_eff[:, c] if epeak is not None
              else r[:, c] >= thr1 for c in range(C)]
        fm1 = [(~f1[c]) & (r[:, c] >= thr2) for c in range(C)]
        out = [jnp.rint(res[:, c]) for c in range(C)]
        raw0 = jnp.where(md_g < 0, -(md_g * md_g), md_g * md_g)
        raw0 = jnp.where(us[..., None], raw0, f32(0.0))
        re_ = [raw0[:, c] for c in range(C)]
        quant = [jnp.abs(raw0[:, c]) for c in range(C)]
        fl_e = [cur[:, c] * cur[:, c] for c in range(C)]
        rs = [res[:, c] for c in range(C)]
        usc = [us[:, c] for c in range(C)]
        if npeak is not None:
            npk = [npeak[:, c] for c in range(C)]
        thnor = f32(0.94)

        for si, (Mi, Ai) in enumerate(self.coupling):
            pair_used = usc[Mi] | usc[Ai]
            pu = pair_used[:, None]
            # M6 on the CURRENT residues/energies of the pair
            if tfe > 0:
                flagm1 = (fm1[Mi] | fm1[Ai]) & ~(f1[Mi] | f1[Ai])
                promoted = self._m6_promote(rs[Mi], rs[Ai], re_[Mi],
                                            re_[Ai], flagm1, F,
                                            prae=prae, couple=cp)
            else:
                promoted = jnp.zeros((F, n2), bool)
            lossless = (f1[Mi] | f1[Ai] | promoted) & pu
            point = (~lossless) & pu
            # point fold thresholds (psy.c: steps==1 or step==3 keep
            # the .12 high ratio, intermediate steps use .04)
            hpH = f32(0.12) if (nsteps == 1 or si == 3) else f32(0.04)
            threv = jnp.asarray(np.where(bins < limit, f32(0.18),
                                         hpH).astype(np.float32))
            a2 = jnp.abs(re_[Mi] * thnor)
            b2 = jnp.abs(re_[Ai] * thnor)
            rM, rA = re_[Mi], re_[Ai]
            hyp = jnp.where(
                rM > 0,
                jnp.where(rA > 0, a2 + b2,
                          jnp.where(rM > -rA, a2 - b2 * threv,
                                    -(b2 - a2 * threv))),
                jnp.where(rA < 0, -(a2 + b2),
                          jnp.where(-rM > rA, -(a2 - b2 * threv),
                                    b2 - a2 * threv)))
            floorsum = fl_e[Mi] + fl_e[Ai]
            ve = jnp.abs(hyp) / floorsum
            sq = jnp.sqrt(ve)
            mag_pt = jnp.where(hyp < 0, -jnp.rint(sq), jnp.rint(sq))
            # lossless integer mag/ang transform on the current ints
            qiM, qiA = out[Mi], out[Ai]
            c1 = jnp.abs(qiM) > jnp.abs(qiA)
            magi = jnp.where(c1, qiM, qiA)
            angi = jnp.where(c1,
                             jnp.where(qiM > 0, qiM - qiA, qiA - qiM),
                             jnp.where(qiA > 0, qiM - qiA, qiA - qiM))
            flip = angi >= jnp.abs(magi) * 2
            magi = jnp.where(flip, -magi, magi)
            angi = jnp.where(flip, -angi, angi)
            # float residue transform (feeds later steps' M6)
            cf = jnp.abs(rs[Mi]) > jnp.abs(rs[Ai])
            magf = jnp.where(cf, rs[Mi], rs[Ai])
            angf = jnp.where(cf,
                             jnp.where(rs[Mi] > 0, rs[Mi] - rs[Ai],
                                       rs[Ai] - rs[Mi]),
                             jnp.where(rs[Ai] > 0, rs[Mi] - rs[Ai],
                                       rs[Ai] - rs[Mi]))
            flipf = angf >= jnp.abs(magf) * 2
            magf = jnp.where(flipf, -magf, magf)
            angf = jnp.where(flipf, -angf, angf)
            sqs = jnp.where(hyp < 0, -sq, sq)
            # point-side promotion on the folded magnitude channel
            out_pt = mag_pt
            if promote_on:
                inreg = jnp.asarray((bins >= nm["start"])
                                    & (bins >= limit))
                cand = point & (ve < f32(0.25)) & inreg
                if npeak is not None:
                    neg = (npk[Mi] < -0.5) | (npk[Ai] < -0.5)
                    npk_m = jnp.where(neg, f32(-1.0),
                                      jnp.minimum(npk[Mi], npk[Ai]))
                    npk[Mi] = jnp.where(pair_used[:, None], npk_m,
                                        npk[Mi])
                else:
                    npk_m = None
                out_pt = self._normalize_promote(
                    mag_pt, ve, jnp.abs(hyp), cand, hyp, npeak=npk_m)
            # commit the pair's new state
            out[Mi] = jnp.where(lossless, magi,
                                jnp.where(point, out_pt, out[Mi]))
            out[Ai] = jnp.where(lossless, angi,
                                jnp.where(point, f32(0.0), out[Ai]))
            re_[Mi] = jnp.where(lossless,
                                jnp.abs(rM) + jnp.abs(rA),
                                jnp.where(point, hyp, re_[Mi]))
            quant[Mi] = jnp.where(lossless, quant[Mi] + quant[Ai],
                                  jnp.where(point, jnp.abs(hyp),
                                            quant[Mi]))
            rs[Mi] = jnp.where(lossless, magf,
                               jnp.where(point, sqs, rs[Mi]))
            rs[Ai] = jnp.where(lossless, angf,
                               jnp.where(point, f32(0.0), rs[Ai]))
            fsum = jnp.where(pu, fl_e[Mi] + fl_e[Ai], fl_e[Mi])
            fl_e[Ai] = jnp.where(pu, fsum, fl_e[Ai])
            fl_e[Mi] = fsum
            f1[Mi] = lossless | (f1[Mi] & ~pu)
            f1[Ai] = pu | f1[Ai]
            # point bins keep a -1 flag on the mag channel (the C only
            # sets fA=1 there), so later steps' M6 can still promote
            fm1[Mi] = fm1[Mi] & ~lossless
            fm1[Ai] = fm1[Ai] & ~pu
            both = usc[Mi] | usc[Ai]
            usc[Mi] = both
            usc[Ai] = both
        out_g = jnp.stack(out, 1)
        used_out = jnp.stack(usc, 1)
        out_g = jnp.where(used_out[..., None], out_g, f32(0.0))
        return out_g, used_out

    def _finish_multi(self, md, logmdct, mask, F, wb, wid=None,
                      epeak=None, npeak=None):
        """Multi-submap encode tail (5.1 layouts): per-group floor
        fit + wrap coding, the chained coupling on the coupled
        submap, per-submap residue VQ, one packet assembly."""
        fe = self.fe
        ch = self.ch
        n2 = md.shape[-1]
        md3 = md.reshape(F, ch, n2)
        lg3 = logmdct.reshape(F, ch, n2)
        mk3 = mask.reshape(F, ch, n2)
        ep3 = epeak.reshape(F, ch, n2) if epeak is not None else None
        npk3 = (npeak.reshape(F, ch, -1) if npeak is not None
                else None)
        fl_cols_v = [None] * ch
        fl_cols_l = [None] * ch
        res_blocks = []
        for g in self.groups:
            chans = g.channels
            nc = len(chans)
            rows = lambda a: a[:, chans[0]:chans[0] + nc].reshape(
                F * nc, n2)
            # the submap's floor may cover fewer bins than the block
            # (e.g. the LFE floor); fit/render at its width, zero the
            # residue above it (mapping0 codes nothing past floor n)
            fln = g.fl.n
            posts, used = g.floor(rows(lg3)[..., :fln],
                                  rows(mk3)[..., :fln])
            codes, qposts = self._floor_wrap(posts, used, cfg=g)
            curve = g.floor.render(qposts, self.ctx.fromdB)
            if fln < n2:
                curve = jnp.pad(curve, ((0, 0), (0, n2 - fln)),
                                constant_values=1e-10)
            inband = jnp.asarray(np.arange(n2) < fln)
            fv, fl = self._floor_fields(codes, used, cfg=g)
            fv = fv.reshape(F, nc, -1)
            fl = fl.reshape(F, nc, -1)
            for j, c in enumerate(chans):
                fl_cols_v[c] = fv[:, j]
                fl_cols_l[c] = fl[:, j]
            mdg = rows(md3).reshape(F, nc, n2)
            curg = curve.reshape(F, nc, n2)
            usedg = used.reshape(F, nc)
            if g.res_type == 2:
                out_g, used_o = self._couple_multi(
                    mdg, curg, usedg, F,
                    epeak=(rows(ep3).reshape(F, nc, n2)
                           if ep3 is not None else None),
                    npeak=(npk3[:, chans[0]:chans[0] + nc]
                           if npk3 is not None else None))
                out_g = jnp.where(inband, out_g, f32(0.0))
                inter = out_g.transpose(0, 2, 1).reshape(F, -1)
                absA = jnp.abs(out_g[:, 1]) if nc == 2 else \
                    jnp.abs(out_g[:, 1:]).max(1)
                pw = self._classify2(jnp.abs(out_g[:, 0]), absA,
                                     cfg=g, nch=nc)
                entries = self._vq_stages(inter, pw, cfg=g)
                used_r = used_o.any(-1)
                pw_p = pw.reshape(F, 1, -1)
                ent_p = [e.reshape(F, 1, g.partvals, -1)
                         for e in entries]
                used_p = used_r.reshape(F, 1)
            else:
                curg2 = jnp.where(usedg[..., None], curg, f32(1e-10))
                rr = mdg / curg2
                res = jnp.rint(rr)
                res = jnp.where(usedg[..., None] & inband, res, 0.0)
                nm = getattr(self.ctx, "normal", None)
                if nm is not None and nm["thresh"] < 9000.0:
                    ve = rr * rr
                    binsg = np.arange(n2)
                    inreg = jnp.asarray(binsg >= nm["start"])
                    cand = (ve < f32(0.25)) & inreg \
                        & usedg[..., None]
                    flatF = F * nc
                    npk_g = (npk3[:, chans[0]:chans[0] + nc]
                             .reshape(flatF, -1)
                             if npk3 is not None else None)
                    res = self._normalize_promote(
                        res.reshape(flatF, n2),
                        ve.reshape(flatF, n2),
                        jnp.abs(mdg * mdg).reshape(flatF, n2),
                        cand.reshape(flatF, n2),
                        rr.reshape(flatF, n2),
                        npeak=npk_g).reshape(F, nc, n2)
                pw = self._classify(res.reshape(F * nc, n2),
                                    cfg=g).reshape(F, nc, -1)
                entries = self._vq_stages(
                    res.reshape(F * nc, n2),
                    pw.reshape(F * nc, -1), cfg=g)
                pw_p = pw
                ent_p = [e.reshape(F, nc, g.partvals, -1)
                         for e in entries]
                used_p = usedg
            rv, rl = self._residue_fields(pw_p, ent_p, used_p, cfg=g)
            res_blocks.append((rv, rl))
        # header columns
        if self.W and wid is not None:
            wf = wid.reshape(F, ch)[:, 0].astype(jnp.uint32)
            lw_v = (wf >> 1) & 1
            nw_v = wf & 1
        else:
            lw_v = jnp.ones((F,), U32)
            nw_v = jnp.ones((F,), U32)
        hdr_v = jnp.concatenate([
            jnp.zeros((F, 1), U32),
            jnp.full((F, 1), self.ctx.mode_idx, U32),
            lw_v[:, None], nw_v[:, None]], 1)
        wbits = 1 if self.W else 0
        hdr_l = jnp.asarray(
            np.array([1, fe.modebits, wbits, wbits],
                     np.int32))[None, :].repeat(F, 0)
        vals = jnp.concatenate(
            [hdr_v] + [_u32(fl_cols_v[c]) for c in range(ch)]
            + [rv for rv, _ in res_blocks], 1)
        lens = jnp.concatenate(
            [hdr_l] + [fl_cols_l[c] for c in range(ch)]
            + [rl for _, rl in res_blocks], 1)
        mv, ml = merge_columns(vals, lens, self.plan)
        return pack_bits_device(mv, ml, wb)

    def _normalize_promote(self, out, ve, qe, cand, sgn, npeak=None):
        """noise_normalize's energy-budget promotion (psy.c:4732-4854),
        batched per partition: candidate bins (sub-unity energy) sort
        by raw energy descending; while the accumulated energy budget
        exceeds normal_thresh, the next-largest candidate becomes +-1
        (one unit of energy each); the rest stay 0.  Inert at rungs
        where normal_thresh disables it.  npeak (F, nparts): the M8
        per-partition store — negative disables the partition, positive
        boosts its budget (acc += acc*npeak^2)."""
        nm = self.ctx.normal
        thresh = f32(nm["thresh"])
        part = nm["partition"]
        F, n2 = out.shape
        npad = (-n2) % part
        if npad:
            pad = lambda a, v: jnp.concatenate(
                [a, jnp.full((F, npad), v, a.dtype)], -1)
            out2, ve2 = pad(out, 0), pad(ve, 0.0)
            qe2, c2 = pad(qe, 0.0), pad(cand, False)
            s2 = pad(sgn, 0.0)
        else:
            out2, ve2, qe2, c2, s2 = out, ve, qe, cand, sgn
        np_ = out2.shape[-1] // part
        if npeak is not None:
            npk = npeak[:, :np_]
            if npk.shape[-1] < np_:
                npk = jnp.pad(npk,
                              ((0, 0), (0, np_ - npk.shape[-1])))
            gate = jnp.repeat(npk > -0.5, part,
                              axis=-1)[:, :out2.shape[-1]]
            c2 = c2 & gate
        vp = jnp.where(c2, ve2, 0.0).reshape(F, np_, part)
        acc = vp.sum(-1)
        if npeak is not None:
            acc = acc + acc * npk * npk
        npro = jnp.where(acc >= thresh,
                         jnp.floor(acc - thresh).astype(jnp.int32) + 1,
                         0)
        npro = jnp.minimum(npro, acc.astype(jnp.int32) + 1)
        key = jnp.where(c2, qe2, -jnp.inf).reshape(F, np_, part)
        order = jnp.argsort(-key, axis=-1)
        rank = jnp.argsort(order, axis=-1)
        sel = (rank < npro[..., None]) & c2.reshape(F, np_, part)
        sel = sel.reshape(F, -1)[:, :n2]
        unit = jnp.where(s2[:, :n2] < 0, f32(-1.0), f32(1.0))
        return jnp.where(sel, unit, out)

    # -- the full step -------------------------------------------------------
    def encode_flat(self, flat, F, wb, wid=None):
        """The post-framing encode body: flat (F*ch, n) raw PCM frames
        in frame-major (F, ch) order -> (packets (F, wb) uint8,
        nbits (F,) int32).  Jittable; per-frame math only (no
        cross-frame dependency), so sharding the F axis over a device
        mesh is embarrassingly parallel and bitwise-identical to the
        single-device result."""
        ctx = self.ctx
        md, logmdct, mask = ctx.analysis.full_mask(flat, wid)
        if self.multi:
            return self._finish_multi(md, logmdct, mask, F, wb, wid)
        posts, used = ctx.floor(logmdct, mask)
        return self.finish_from_posts(md, posts, used, F, wb, wid)

    def finish_from_posts(self, md, posts, used, F, wb, wid=None,
                          thr1=None, threv=None, inlimit=None,
                          lowpass=None, epeak=None, npeak=None):
        """Post-fit encode body: raw fit posts -> packed packets.
        Shared by the single-blob fast path and the managed 15-blob
        pass (which feeds interpolated post ladders and per-blob
        coupling thresholds/lowpass).  epeak/npeak: the stateful
        path's M9 peak store (F*ch, n2) and M8 partition store
        (F*ch, nparts) feeding flag_lossless, M6 and the
        noise-normalize budget."""
        fe = self.fe
        ctx = self.ctx
        ch = self.ch
        codes, qposts = self._floor_wrap(posts, used)
        curve = ctx.floor.render(qposts, ctx.fromdB)
        if lowpass is not None:
            # per-frame sliding lowpass: zero residues above the
            # blob's bin limit (psy.c:5126-5131)
            bins = jnp.arange(md.shape[-1], dtype=jnp.int32)
            lpmask = bins[None, :] < lowpass[:, None]
            md = jnp.where(lpmask, md, f32(0.0))
        if self.res_type == 2:
            out2, any_used = self._couple_quantize(
                md, curve, used, F, thr1=thr1, threv=threv,
                inlimit=inlimit, epeak=epeak, npeak=npeak)
            # interleave the coupled pair: flat[i] = out2[:, i%2, i//2]
            inter = out2.transpose(0, 2, 1).reshape(F, -1)
            pw = self._classify2(jnp.abs(out2[:, 0]),
                                 jnp.abs(out2[:, 1]))
            entries = self._vq_stages(inter, pw)
            used_r = any_used
        else:
            rr = md / curve
            res = jnp.rint(rr)
            res = jnp.where(used[:, None], res, 0.0)
            nm = getattr(self.ctx, "normal", None)
            if nm is not None and nm["thresh"] < 9000.0:
                # per-channel noise_normalize promotion (active rungs)
                ve = rr * rr
                bins = np.arange(md.shape[-1])
                inreg = jnp.asarray(bins >= nm["start"])
                cand = (ve < f32(0.25)) & inreg & used[:, None]
                res = self._normalize_promote(res, ve, jnp.abs(md * md),
                                              cand, rr, npeak=npeak)
            pw = self._classify(res)
            entries = self._vq_stages(res, pw)
            used_r = None
        fv, fl = self._floor_fields(codes, used)
        # header columns
        # header: packet-type bit, mode, and (long blocks only) the
        # lW/nW window-shape flags — actual neighbor flags when the
        # switching path passes wid, else 1/1 (all-long stream)
        if self.W and wid is not None:
            wf = wid.reshape(F, ch)[:, 0].astype(jnp.uint32)
            lw_v = (wf >> 1) & 1
            nw_v = wf & 1
        else:
            lw_v = jnp.ones((F,), U32)
            nw_v = jnp.ones((F,), U32)
        hdr_v = jnp.concatenate([
            jnp.zeros((F, 1), U32),
            jnp.full((F, 1), ctx.mode_idx, U32),
            lw_v[:, None], nw_v[:, None]], 1)
        wbits = 1 if self.W else 0
        hdr_l = jnp.asarray(
            np.array([1, fe.modebits, wbits, wbits],
                     np.int32))[None, :].repeat(F, 0)
        fv = fv.reshape(F, ch, -1).reshape(F, -1)
        fl = fl.reshape(F, ch, -1).reshape(F, -1)
        rc = self.res_ch
        pw_p = pw.reshape(F, rc, -1)
        ent_p = [e.reshape(F, rc, self.partvals, -1)
                 for e in entries]
        if used_r is None:
            used_p = used.reshape(F, ch)
        else:
            used_p = used_r.reshape(F, 1)
        rv, rl = self._residue_fields(pw_p, ent_p, used_p)
        vals = jnp.concatenate([hdr_v, _u32(fv), rv], 1)
        lens = jnp.concatenate([hdr_l, fl, rl], 1)
        mv, ml = merge_columns(vals, lens, self.plan)
        return pack_bits_device(mv, ml, wb)

    def make_step(self, wb=None):
        """Returns a jittable pcm_chunk (ch, S) -> (packets (F, wb)
        uint8, nbits (F,) int32)."""
        wb = wb or self.plan.wb
        F = self.chunk_packets
        n, hop, ch = self.n, self.hop, self.ch
        fidx = (np.arange(F)[:, None] * hop
                + np.arange(n)[None, :]).astype(np.int32)

        def step(pcm):
            if pcm.dtype != jnp.float32:
                x = pcm.astype(jnp.float32) / f32(32768.0)
            else:
                x = pcm
            frames = x[:, fidx]                     # (ch, F, n) static
            flat = frames.transpose(1, 0, 2).reshape(F * ch, n)
            return self.encode_flat(flat, F, wb)

        return step

    # -- stateful two-phase pipeline (cross-frame psy state) ---------------
    def make_probe_step(self, F, n2L):
        """Phase A of the stateful fast path: frames -> spectra plus
        the per-frame reductions the host recurrences need and the
        frame's lastmdct contribution row (resampled per lmode:
        0 identity, 1 repeat x8 (short, nW long), 2 min-pool /8
        (long, nW short); psy.c:4462-4501).

        Returns (keep_on_device..., fetch_to_host...):
          md, logmdct, logfft, fit1, dB   (F*ch, n2)   device
          L                                (F*ch, n2L)  device
          lam, hi_th, upt, unt             (F*ch,)      host
        """
        n, ch = self.n, self.ch
        n2 = n // 2
        nr = n // 64
        da = self.ctx.analysis
        look = da.look

        def step(x64, svec):
            # svec (3, F) int32: one upload per batch instead of three
            starts, wid, lmode = svec[0], svec[1], svec[2]
            if x64.dtype != jnp.float32:
                x64 = x64.astype(jnp.float32) / f32(32768.0)
            rows = (starts[:, None] // 64
                    + jnp.arange(nr, dtype=jnp.int32)[None, :])
            fr = jnp.take(x64, rows, axis=1)
            flat = fr.reshape(ch, F, n).transpose(1, 0, 2) \
                .reshape(F * ch, n)
            w = jnp.repeat(wid, ch) if self.W else None
            md, logmdct, fit1, dB, logfft = da.spectra(
                flat, w, with_fft=True)
            lam = jnp.minimum(jnp.max(logfft, axis=-1), 0.0)
            # M5 probe: clamped band average (lb_loudnoise_fix)
            seg = logmdct[:, look.n25p:look.n75p]
            hi_th = jnp.maximum(seg, f32(-130.0)).sum(-1) \
                / f32(look.n)
            # M2 probe: |pcm| segment sums on the raw frames
            sn = n >> 2
            ab = jnp.abs(flat)
            upt = ab[:, sn:2 * sn].sum(-1)
            unt = ab[:, 2 * sn:sn + (n >> 1)].sum(-1)
            # lastmdct contribution row.  The reference resamples with
            # a FIXED mag=8 (psy.c:4462-4501) because the machinery is
            # gated to hsrate templates whose block ratio IS 8
            # (256/2048); low-rate templates (e.g. 512/1024 at 16 kHz)
            # never consume lastmdct, so their rows pass through as
            # identity.
            lm = jnp.repeat(lmode, ch)
            if not self.W and n2 * 8 == n2L:
                # short mode, ratio 8: identity | repeat x8
                ident = jnp.pad(logmdct, ((0, 0), (0, n2L - n2)))
                rep = jnp.repeat(logmdct, 8, axis=-1)
                L = jnp.where((lm == 1)[:, None], rep, ident)
            elif self.W and n2 == n2L and n2 % 8 == 0:
                # long mode: identity | min-pool /8
                n8 = n2 // 8
                minp = logmdct.reshape(-1, n8, 8).min(-1)
                minp = jnp.pad(minp, ((0, 0), (0, n2L - n8)))
                L = jnp.where((lm == 2)[:, None], minp, logmdct)
            else:
                # non-hsrate ratios: rows are never read back
                L = jnp.pad(logmdct, ((0, 0), (0, n2L - n2)))
            return md, logmdct, logfft, fit1, dB, L, lam, hi_th, \
                upt, unt

        return step

    def make_finish_step(self, F, wb=None):
        """Phase B of the stateful fast path: spectra + per-frame
        state -> packed packets.  Per-row inputs (F*ch): lastmdct
        (gathered from the global L buffer), lam, lowcomp, poste;
        per-frame: ampmax (F,), trans (F,) bool (block_mode==2, long
        mode), wid; m3 (dict of (F,) arrays, short mode only)."""
        wb = wb or self.plan.wb
        ch = self.ch
        da = self.ctx.analysis
        look = da.look
        from . import psydevice as PD

        def step(md, logmdct, logfft, fit1, dB, lastmdct, lam,
                 fstate, m3vec):
            # fstate packs [ampmax (F), lowcomp (F*ch), poste (F*ch),
            # trans (F), wid (F)] as ONE f32 upload per batch; m3vec
            # (6, F) likewise for the short-mode M3 fields
            o = 0
            ampmax = fstate[o:o + F]
            o += F
            lowcomp = fstate[o:o + F * ch]
            o += F * ch
            poste = fstate[o:o + F * ch]
            o += F * ch
            trans = fstate[o:o + F] > f32(0.5)
            o += F
            wid = fstate[o:o + F].astype(jnp.int32)
            m3 = None
            if m3vec is not None:
                m3 = dict(sw=m3vec[0] > f32(0.5), noise_rate=m3vec[1],
                          noise_center=m3vec[2], tone_rate=m3vec[3],
                          reset=m3vec[4] > f32(0.5),
                          impad_zero=m3vec[5] > f32(0.5))
            kind = "long" if self.W else "short"
            logmask, epeak, npeak = PD.noisemask_tail(
                look, logmdct, fit1, dB, lowcomp, poste, lastmdct,
                kind,
                trans_active=jnp.repeat(trans, ch) if self.W else None)
            amp_rows = jnp.repeat(ampmax, ch)
            tone = da.tonemask(logfft, amp_rows, lam)
            # per-frame blocktype: trans flags transitional longs
            # (blocktype 2 vs 3) / padding shorts (1 vs 0); the noise
            # bias curve is the only psy param that differs between
            # the paired blocktypes in every reference template
            alt = jnp.repeat(trans, ch)[:, None]
            noff = jnp.where(alt, da.noiseoffsets_alt[1],
                             da.noiseoffsets[1])
            val = jnp.minimum(logmask + noff, da.noisemaxsupp)
            tval = tone + da.toneatt1
            tval = PD.lowcompand_tval(look, tval, lowcomp, 1)
            if not self.W and m3 is not None:
                n2 = look.n
                shp = (F, ch, n2)
                temps = PD.m3_tempmdct_scan(
                    look, logmdct[:, :n2].reshape(shp),
                    lastmdct.reshape(F, ch, -1),
                    val.reshape(shp), tval.reshape(shp), m3)
                v2, t2, npk2 = PD.m3_apply(
                    look, val.reshape(shp), tval.reshape(shp),
                    logmdct[:, :n2].reshape(shp),
                    lastmdct.reshape(F, ch, -1), temps,
                    npeak.reshape((F, ch, -1)), m3, m3["impad_zero"])
                val = v2.reshape(F * ch, n2)
                tval = t2.reshape(F * ch, n2)
                npeak = npk2.reshape(F * ch, -1)
            md2, mask = da.mix_m4_m1(md, logmdct, val, tval, 1)
            w = jnp.repeat(wid, ch) if self.W else None
            if self.multi:
                return self._finish_multi(md2, logmdct, mask, F, wb,
                                          wid=w, epeak=epeak,
                                          npeak=npeak)
            posts, used = self.ctx.floor(logmdct, mask)
            return self.finish_from_posts(md2, posts, used, F, wb,
                                          wid=w, epeak=epeak,
                                          npeak=npeak)

        return step

    def make_gather_step(self, F, wb=None):
        """Returns a jittable (x64, starts, wid) -> (packets, nbits)
        step for the block-switching path: frames gathered at
        arbitrary 64-sample-aligned offsets from the device-resident
        stream.  x64: (ch, R, 64) PCM (f32 or i16/32768), starts:
        (F,) int32 sample offsets (64-aligned), wid: (F,) int32
        window-shape id (lW*2+nW, long mode only; ignored for
        short)."""
        wb = wb or self.plan.wb
        n, ch = self.n, self.ch
        nr = n // 64

        def step(x64, starts, wid):
            if x64.dtype != jnp.float32:
                x64 = x64.astype(jnp.float32) / f32(32768.0)
            rows = (starts[:, None] // 64
                    + jnp.arange(nr, dtype=jnp.int32)[None, :])
            fr = jnp.take(x64, rows, axis=1)       # (ch, F, nr, 64)
            flat = fr.reshape(ch, F, n).transpose(1, 0, 2) \
                .reshape(F * ch, n)
            w = jnp.repeat(wid, ch) if self.W else None
            return self.encode_flat(flat, F, wb, wid=w)

        return step

    def make_framed_step(self, F, wb=None):
        """Returns a jittable frames (F, ch, n) -> (packets, nbits)
        step for pre-framed input — the shardable entry point (frames
        ride the mesh; see parallel/mesh.sharded_encode_step)."""
        wb = wb or self.plan.wb
        n, ch = self.n, self.ch

        def step(frames):
            flat = frames.reshape(F * ch, n)
            return self.encode_flat(flat, F, wb)

        return step

    def get_step(self, wb=None):
        wb = wb or self.plan.wb
        if wb not in self._step_cache:
            self._step_cache[wb] = jax.jit(self.make_step(wb))
        return self._step_cache[wb]
