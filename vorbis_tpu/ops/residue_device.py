"""Batched residue VQ on device (reference: lib/res0.c
local_book_besterror / _encodepart; exact scalar path:
codec/residue_codec.py).

The reference's nearest-entry search has a lattice fast path (quantize
each dimension, form the zig-zag digit index) and a value-patterned
brute-force scan when the lattice index lands on an unused entry.
Device formulation:

  - the lattice path is pure elementwise math + a digit dot product
  - the miss fallback becomes a STATIC remap table (for every lattice
    cell with an unused entry, the nearest used entry is precomputed
    host-side with the same squared-error metric; C's value-patterning
    tie order is not reproduced — ties are broken by entry order)
  - error feed-forward across stages subtracts the gathered entry
    values (a static row gather)

Classification (res01_class) is a segment max/sum + threshold walk,
fully vectorized."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

f32 = np.float32


class DeviceLatticeBook:
    """One maptype-1 lattice book prepared for device encode."""

    def __init__(self, book):
        from ..codec.residue_codec import _enc_book_fields
        self.dim = int(book.dim)
        self.entries = int(book.entries)
        minval, delta, qv = _enc_book_fields(book)
        self.minval, self.delta, self.qv = minval, delta, qv
        values = book.values
        assert values is not None
        self.values = jnp.asarray(np.asarray(values, np.float32))
        # entry -> quantized per-dim reconstruction (the p[] the C code
        # subtracts): for lattice entries p = v*delta+minval per digit
        lengths = np.asarray(book.lengths)
        used = lengths > 0
        # static remap: unused lattice index -> nearest used entry
        vals_np = np.asarray(values, np.float64)
        remap = np.arange(self.entries, dtype=np.int64)
        if (~used).any():
            uidx = np.nonzero(used)[0]
            uv = vals_np[uidx]
            for e in np.nonzero(~used)[0]:
                d = ((uv - vals_np[e]) ** 2).sum(-1)
                remap[e] = uidx[int(np.argmin(d))]
        self.remap = jnp.asarray(remap)
        # the values actually subtracted after remap
        self.sub_values = jnp.asarray(
            vals_np[np.asarray(remap)].astype(np.float32))

    def encode(self, a):
        """a: (..., dim) float residuals -> (entry (...,) int32,
        remainder (..., dim))."""
        minval, delta, qv = self.minval, self.delta, self.qv
        ze = qv >> 1
        x = a.astype(jnp.float32)
        if delta != 1:
            # exact trunc division in int32: XLA rewrites float
            # division by a constant as a reciprocal multiply, which
            # can round the quotient just below an integer (the C
            # reference divides in IEEE f32); t is integer-valued and
            # delta integral for every lattice book
            t = (x - minval + (delta >> 1)).astype(jnp.int32)
            v = jnp.where(t >= 0, t // delta, -((-t) // delta))
        else:
            v = x - minval
        v = v.astype(jnp.int32)
        m = jnp.where(v < ze, ((ze - v) << 1) - 1, (v - ze) << 1)
        m = jnp.clip(m, 0, qv - 1)
        # index = sum over dims (reversed significance): C builds
        # index = index*qv + digit iterating o = dim-1 .. 0
        idx = jnp.zeros(a.shape[:-1], jnp.int32)
        for o in range(self.dim - 1, -1, -1):
            idx = idx * qv + m[..., o]
        entry = jnp.take(self.remap, jnp.clip(idx, 0,
                                              self.entries - 1))
        rec = jnp.take(self.sub_values, entry, axis=0)
        return entry.astype(jnp.int32), a - rec


class DeviceResidueVQ:
    """Multi-stage partitioned VQ over a flat residue vector
    (res01_forward's encodepart cascade, batched)."""

    def __init__(self, info, books, partbooks):
        """info: ResidueInfo; partbooks: [partition][stage] book or
        None (from ResidueLook.partbooks)."""
        self.info = info
        self.begin, self.end = info.begin, info.end
        self.grouping = info.grouping
        self.partitions = info.partitions
        self.cm1 = np.asarray(info.classmetric1, np.int64)
        self.cm2 = np.asarray(info.classmetric2, np.int64)
        self.stages = max((len(s) for s in partbooks), default=0)
        self.books = [[(DeviceLatticeBook(b) if b is not None else None)
                       for b in row] for row in partbooks]

    def classify(self, res):
        """res: (B, n) int residues -> partword (B, parts) int32
        (res01_class, vectorized threshold walk)."""
        spp = self.grouping
        n = self.end - self.begin
        partvals = n // spp
        seg = jnp.abs(res[..., self.begin:self.begin + partvals * spp]
                      .reshape(res.shape[:-1] + (partvals, spp)))
        mx = seg.max(-1)
        scale = f32(f32(100.0) / f32(spp))
        # C: ent = (int)(int_sum * (float)scale), truncating
        ent = (seg.sum(-1).astype(jnp.float32) * scale
               ).astype(jnp.int32)
        k = jnp.full(mx.shape, self.partitions - 1, jnp.int32)
        # C walks k upward and stops at the first class whose limits
        # hold; emulate by scanning downward and keeping the lowest
        for kk in range(self.partitions - 2, -1, -1):
            ok = (mx <= self.cm1[kk]) & ((self.cm2[kk] < 0)
                                         | (ent < self.cm2[kk]))
            k = jnp.where(ok, kk, k)
        return k

    def encode(self, res, partword):
        """res: (B, n) float residuals, partword: (B, parts) ->
        list over stages of (entries (B, parts, spp/dim) int32 or
        None) + final remainder.  Entries for partitions whose class
        has no book at that stage are -1."""
        spp = self.grouping
        n = self.end - self.begin
        partvals = n // spp
        work = res[..., self.begin:self.begin + partvals * spp] \
            .astype(jnp.float32) \
            .reshape(res.shape[:-1] + (partvals, spp))
        out_stages = []
        for s in range(self.stages):
            # candidate encodes per class (only classes with a book)
            stage_entries = jnp.full(
                work.shape[:-1] + (spp,), -1, jnp.int32)  # per value
            new_work = work
            wrote = jnp.zeros(work.shape[:-1], bool)
            for cls in range(self.partitions):
                book = (self.books[cls][s]
                        if s < len(self.books[cls]) else None)
                if book is None:
                    continue
                dim = book.dim
                steps = spp // dim
                a = work.reshape(work.shape[:-1] + (steps, dim))
                ent, rem = book.encode(a)
                rem = rem.reshape(work.shape)
                sel = (partword == cls)
                new_work = jnp.where(sel[..., None], rem, new_work)
                ent_full = jnp.repeat(ent, dim, axis=-1)
                stage_entries = jnp.where(sel[..., None], ent_full,
                                          stage_entries)
                wrote = wrote | sel
            work = new_work
            out_stages.append(stage_entries)
        return out_stages, work
