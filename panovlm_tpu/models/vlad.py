"""VLAD image retrieval for loop-closure pair proposal.

Replaces sfm/VLAD.{h,cpp} (reference VLADMatcher): own k-means codebook
(128 centers by default) over sampled SIFT descriptors, VLAD embedding per
frame (sum of descriptor residuals to their assigned center), the
reference's three normalization schemes (VLAD.h:16-25): intra (per-center
L2), power ("signed sqrt"), and global L2 — then cosine-similarity KNN over
frames. Everything is batched matmul work on the MXU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_centers", "iters"))
def kmeans(desc, mask, key, n_centers: int = 128, iters: int = 15):
    """Lloyd k-means over masked descriptors (N, D). Returns (C, D)."""
    N, D = desc.shape
    idx = jax.random.choice(key, N, (n_centers,), replace=False,
                            p=mask / jnp.maximum(mask.sum(), 1))
    centers = desc[idx]

    def step(_, centers):
        sim = jnp.einsum("nd,kd->nk", desc, centers,
                         precision=jax.lax.Precision.HIGHEST)
        d2 = (jnp.sum(desc * desc, 1)[:, None]
              + jnp.sum(centers * centers, 1)[None, :] - 2 * sim)
        assign = jnp.argmin(jnp.where(mask[:, None], d2, jnp.inf), axis=1)
        w = mask.astype(desc.dtype)
        sums = jnp.zeros_like(centers).at[assign].add(desc * w[:, None])
        cnts = jnp.zeros((centers.shape[0],)).at[assign].add(w)
        new = sums / jnp.maximum(cnts, 1.0)[:, None]
        return jnp.where((cnts > 0)[:, None], new, centers)

    return jax.lax.fori_loop(0, iters, step, centers)


@jax.jit
def vlad_embedding(desc, mask, centers, intra_norm: bool = True,
                   power_norm: bool = True):
    """VLAD vector of one frame: desc (F, D), centers (K, D) -> (K*D,)."""
    d2 = (jnp.sum(desc * desc, 1)[:, None]
          + jnp.sum(centers * centers, 1)[None, :]
          - 2 * jnp.einsum("fd,kd->fk", desc, centers,
                           precision=jax.lax.Precision.HIGHEST))
    assign = jnp.argmin(d2, axis=1)
    resid = desc - centers[assign]
    resid = resid * mask[:, None]
    K = centers.shape[0]
    v = jnp.zeros_like(centers).at[assign].add(resid)  # (K, D)
    if intra_norm:
        v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
    v = v.reshape(-1)
    if power_norm:
        v = jnp.sign(v) * jnp.sqrt(jnp.abs(v))
    return v / (jnp.linalg.norm(v) + 1e-12)


def vlad_pairs(descs, fmasks, n_neighbors: int = 10, n_centers: int = 128,
               sample: int = 20000, seed: int = 0):
    """VLADMatcher::GenerateCodeBook + ComputeVLADEmbedding + FindNeighbors:
    returns (pi, pj) loop-closure candidate pairs by cosine similarity."""
    descs = jnp.asarray(descs)
    fmasks = jnp.asarray(fmasks)
    N, F, D = descs.shape
    flat = descs.reshape(-1, D)
    fmask = fmasks.reshape(-1)
    key = jax.random.PRNGKey(seed)
    if flat.shape[0] > sample:
        sel = jax.random.choice(key, flat.shape[0], (sample,), replace=False)
        flat, fmask = flat[sel], fmask[sel]
    centers = kmeans(flat, fmask.astype(flat.dtype), key, n_centers)
    emb = jax.vmap(lambda d, m: vlad_embedding(d, m, centers))(
        descs, fmasks.astype(descs.dtype))
    sim = np.array(jnp.einsum("ne,me->nm", emb, emb,
                              precision=jax.lax.Precision.HIGHEST))
    np.fill_diagonal(sim, -np.inf)
    pairs = set()
    for i in range(N):
        for j in np.argsort(-sim[i])[:n_neighbors]:
            pairs.add((min(i, int(j)), max(i, int(j))))
    ordered = sorted(pairs)
    return (np.array([p[0] for p in ordered], np.int32),
            np.array([p[1] for p in ordered], np.int32), np.asarray(emb))
