"""LBG (Linde-Buzo-Gray) vector-quantizer training (reference:
vq/vqgen.c _vqgen_seed/vqgen_iterate).

The reference iterates scalar nearest-entry scans with bias terms to
even out cell occupancy.  The TPU-native formulation is classic LBG
splitting + batched k-means: the (points x entries) distance matrix is
one matmul (|a-b|^2 = |a|^2 - 2ab + |b|^2) riding the MXU; codebook
growth doubles by perturbation, and the highest-distortion cells are
split preferentially when the target entry count is not a power of
two (this replaces vqgen.c's occupancy-bias trick)."""

from __future__ import annotations

import numpy as np


def _pairwise_sq(points, codes, xp):
    p2 = (points * points).sum(-1, keepdims=True)
    c2 = (codes * codes).sum(-1)
    return p2 - 2.0 * points @ codes.T + c2


def _make_step(use_jax: bool):
    if use_jax:
        try:
            import jax
            import jax.numpy as jnp

            @jax.jit
            def step(points, codes):
                d = _pairwise_sq(points, codes, jnp)
                a = jnp.argmin(d, axis=1)
                one = jax.nn.one_hot(a, codes.shape[0],
                                     dtype=jnp.float32)
                counts = one.sum(0)
                sums = one.T @ points
                newc = jnp.where(counts[:, None] > 0,
                                 sums / jnp.maximum(counts[:, None], 1),
                                 codes)
                mse = jnp.take_along_axis(d, a[:, None], axis=1).mean()
                # per-cell distortion for split selection
                dist = (one * jnp.take_along_axis(d, a[:, None], 1)
                        ).sum(0)
                return newc, a, counts, dist, mse

            def run(points, codes):
                c, a, n, dist, m = step(points, codes)
                return (np.array(c), np.asarray(a, np.int64),
                        np.asarray(n), np.asarray(dist), float(m))

            return run
        except Exception:
            pass

    def run(points, codes):
        d = _pairwise_sq(points, codes, np)
        a = np.argmin(d, axis=1)
        own = np.take_along_axis(d, a[:, None], 1)[:, 0]
        counts = np.bincount(a, minlength=len(codes)).astype(np.float32)
        sums = np.zeros_like(codes)
        np.add.at(sums, a, points)
        nz = counts > 0
        newc = codes.copy()
        newc[nz] = sums[nz] / counts[nz, None]
        dist = np.zeros(len(codes), np.float64)
        np.add.at(dist, a, own)
        return newc, a.astype(np.int64), counts, dist, float(own.mean())

    return run


def lbg_train(points: np.ndarray, entries: int, iters: int = 40,
              seed: int = 0, use_jax: bool = True,
              split_eps: float = 0.01, bias_strength: float = 0.0):
    """Train `entries` codewords on (N, dim) float32 points via LBG
    splitting.  Returns (codebook (entries, dim) float32,
    assignments (N,) int64, mse history list)."""
    points = np.asarray(points, np.float32)
    n, dim = points.shape
    rng = np.random.RandomState(seed)
    run = _make_step(use_jax)
    codes = points.mean(0, keepdims=True).astype(np.float32)
    history = []
    a = np.zeros(n, np.int64)

    def refine(codes, k):
        nonlocal a
        for _ in range(k):
            codes, a, counts, dist, mse = run(points, codes)
            history.append(mse)
            empty = np.nonzero(counts == 0)[0]
            if len(empty):
                worst = np.argsort(-((points - codes[a]) ** 2).sum(-1))
                codes[empty] = points[worst[:len(empty)]]
        return codes

    inner = max(3, iters // max(1, int(np.ceil(np.log2(entries))) + 1))
    while len(codes) < entries:
        grow = min(len(codes), entries - len(codes))
        # split the highest-distortion cells first
        _, a, counts, dist, _ = run(points, codes)
        order = np.argsort(-dist)[:grow]
        jitter = split_eps * points.std(0) * rng.randn(grow, dim)
        codes = np.concatenate(
            [codes, codes[order] + jitter.astype(np.float32)])
        codes = refine(codes, inner)
    codes = refine(codes, max(2, inner))
    # escape local minima: move the least-useful code into the
    # highest-distortion cell (split-and-merge), keep if it improves
    for _ in range(6):
        _, a, counts, dist, base_mse = run(points, codes)
        worst = int(np.argmax(dist))
        laziest = int(np.argmin(np.where(np.arange(len(codes)) == worst,
                                         np.inf, counts)))
        cand = codes.copy()
        members = points[a == worst]
        if len(members) < 2:
            break
        cand[laziest] = members[rng.randint(len(members))]
        cand[worst] = members.mean(0)
        cand = refine(cand, max(2, inner))
        _, _, _, _, new_mse = run(points, cand)
        if new_mse < base_mse:
            codes = cand
        else:
            break
    codes = refine(codes, 2)
    return codes.astype(np.float32), a, history
