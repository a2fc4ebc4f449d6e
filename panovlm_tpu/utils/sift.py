"""SIFT extraction (host) + descriptor matching (TPU MXU).

Replaces util/SIFT.{h,cpp} (reference): OpenCV SIFT + RootSIFT (CVPR'12,
SIFT.cpp ComputeSIFTDescriptor), keypoint spatial distribution (the
reference uses an ORB-SLAM-style quadtree, SIFT.h:17-104; here a grid-cap
with per-cell strongest-response selection — same intent, vectorized), and
KNN ratio-test matching. The reference's optional CUDA brute-force matcher
(SIFT.h:125-128, sfm/SfM.cpp:235-264) maps to a batched matmul + top-2 on
the MXU, which is the TPU-native form of GPU brute-force KNN.

Extraction is host-side data prep (cv2), exactly like the reference's CPU
SIFT; matching is where the FLOPs are and runs on device.
"""

from __future__ import annotations

import functools

import numpy as np

# NOTE: no module-level jax import — the spawn-pool SIFT workers
# (hostpool.map_frames pickling _extract_one_padded) import this module,
# and their import path must stay cv2/numpy-only: a jax import in every
# worker costs seconds each and registers the PJRT TPU plugin near-fork
# (the hazard the spawn design avoids). Device-side matching imports jax
# lazily below.


def extract_sift(gray: np.ndarray, num_features: int = 8096,
                 root_sift: bool = True, mask: np.ndarray | None = None,
                 grid_distribute: bool = True, grid: tuple = (16, 32)):
    """Detect SIFT keypoints + descriptors on one grayscale image.

    Returns (uv (F,2) float32 pixel coords, desc (F,128) float32 L2-normed,
    response (F,)). F <= num_features.
    """
    import cv2
    sift = cv2.SIFT_create(nfeatures=num_features * 2 if grid_distribute else num_features)
    kps, desc = sift.detectAndCompute(gray, mask)
    if desc is None or len(kps) == 0:
        return (np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32),
                np.zeros((0,), np.float32))
    uv = np.array([k.pt for k in kps], np.float32)
    resp = np.array([k.response for k in kps], np.float32)
    desc = desc.astype(np.float32)

    if grid_distribute and len(kps) > num_features:
        # spatial distribution: strongest responses per grid cell first
        h, w = gray.shape[:2]
        gy, gx = grid
        cell = (np.minimum(uv[:, 1] * gy / h, gy - 1).astype(int) * gx
                + np.minimum(uv[:, 0] * gx / w, gx - 1).astype(int))
        order = np.lexsort((-resp, cell))
        cell_sorted = cell[order]
        rank_in_cell = np.zeros(len(order), int)
        counts: dict[int, int] = {}
        for pos, c in enumerate(cell_sorted):
            rank_in_cell[pos] = counts.get(c, 0)
            counts[c] = rank_in_cell[pos] + 1
        # round-robin by in-cell rank: every cell's strongest first
        sel = order[np.argsort(rank_in_cell, kind="stable")][:num_features]
        uv, desc, resp = uv[sel], desc[sel], resp[sel]

    if root_sift:
        # RootSIFT: L1 normalize then sqrt (Arandjelovic & Zisserman CVPR'12)
        desc = desc / (np.abs(desc).sum(axis=1, keepdims=True) + 1e-12)
        desc = np.sqrt(desc)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True) + 1e-12
    return uv, desc, resp


def _extract_one_padded(args):
    """Spawn-pool worker: one frame's SIFT, padded to cap. Module-level so
    it pickles; `args` = (gray_u8, cap, root_sift, mask_u8 | None)."""
    gray, cap, root_sift, mask = args
    u, d, _ = extract_sift(gray, num_features=cap, root_sift=root_sift,
                           mask=mask)
    return pad_features(u, d, cap)


def extract_sift_batch(grays_u8, cap: int, root_sift: bool = True,
                       mask: np.ndarray | None = None,
                       num_threads: int = -1, force_workers: int = 0):
    """SIFT over a frame stack with the host process pool — the parallel
    frontend the reference runs under OpenMP (sfm/SfM.cpp:23-36,
    num_threads from config). Returns (uv (N,cap,2), desc (N,cap,128),
    fmask (N,cap)) numpy."""
    from .hostpool import map_frames
    outs = map_frames(_extract_one_padded,
                      [(g, cap, root_sift, mask) for g in grays_u8],
                      num_threads=num_threads, force_workers=force_workers)
    uv = np.stack([o[0] for o in outs])
    desc = np.stack([o[1] for o in outs])
    fmask = np.stack([o[2] for o in outs])
    return uv, desc, fmask


def pad_features(uv, desc, cap: int):
    F = min(len(uv), cap)
    uv_p = np.zeros((cap, 2), np.float32)
    d_p = np.zeros((cap, 128), np.float32)
    m = np.zeros((cap,), bool)
    uv_p[:F] = uv[:F]
    d_p[:F] = desc[:F]
    m[:F] = True
    return uv_p, d_p, m


_match_descriptors_jit = None


def match_descriptors(*args, **kwargs):
    """Lazily-jitted wrapper over _match_descriptors (see its docstring):
    keeps this module importable without jax for the spawn-pool workers."""
    global _match_descriptors_jit
    if _match_descriptors_jit is None:
        import jax
        _match_descriptors_jit = functools.partial(
            jax.jit, static_argnames=("max_matches", "use_kernel"))(
            _match_descriptors)
    return _match_descriptors_jit(*args, **kwargs)


def _match_descriptors(d1, m1, d2, m2, ratio: float = 0.6,
                       max_dist_factor: float = 0.8, max_matches: int = 1024,
                       use_kernel: bool | None = None):
    """Brute-force KNN matching on the MXU.

    Mirrors MatchSIFT + the reference's pair filter (sfm/SfM.cpp:229-295):
    top-2 ratio test (config sift_match_dist_threshold = 0.6), mutual-best
    cross check, then drop matches with distance > 0.8 * max inlier distance.

    d1 (N1,128), d2 (N2,128) L2-normalized. Returns dict: idx (K,2) int32,
    mask (K,), dist (K,) — padded to max_matches.

    use_kernel: route the KNN through the fused Pallas tile kernel
    (ops/pallas/knn.py — the (N1,N2) distance matrix never touches HBM,
    replacing the reference's CUDA brute-force matcher, SfM.cpp:235-264).
    None = auto, currently OFF: measured on the v5e at the Room-profile
    descriptor count (8096x8096), the XLA matmul+top-2 path runs 75
    ms/pair vs 146 ms/pair through the kernel (round-4 _exp_match8096;
    the round-3 "1.5x over XLA at 4096^2" no longer reproduces) — the
    kernel stays available for re-measurement via use_kernel=True.
    """
    import jax
    import jax.numpy as jnp
    big = jnp.asarray(1e9, jnp.float32)
    if use_kernel is None:
        use_kernel = False
    if use_kernel:
        from ..ops.pallas.knn import knn_pallas
        d2_12, idx12 = knn_pallas(d1, m1, d2, m2, k=2)
        d2_21, idx21 = knn_pallas(d2, m2, d1, m1, k=1)
        best = jnp.minimum(d2_12[:, 0], big)
        second = jnp.minimum(d2_12[:, 1], big)
        idx = idx12
        mutual = idx21[idx12[:, 0], 0] == jnp.arange(d1.shape[0])
    else:
        sim = jnp.einsum("ik,jk->ij", d1, d2,
                         precision=jax.lax.Precision.HIGHEST)
        d2sq = jnp.maximum(2.0 - 2.0 * sim, 0.0)
        d2sq = jnp.where(m1[:, None] & m2[None, :], d2sq, big)
        # top-2 along axis 1 via two argmin sweeps: the ratio test needs
        # exactly the two smallest, and lax.top_k full-sorts each
        # N2-wide row (the dominant cost of the 8096-profile match program)
        j1 = jnp.argmin(d2sq, axis=1)
        best = jnp.take_along_axis(d2sq, j1[:, None], axis=1)[:, 0]
        knocked = jnp.where(
            jnp.arange(d2sq.shape[1])[None, :] == j1[:, None], big, d2sq)
        second = jnp.min(knocked, axis=1)
        idx = j1[:, None]
        # mutual best
        best2 = jnp.argmin(d2sq, axis=0)  # for each d2 col, best d1 row
        mutual = best2[j1] == jnp.arange(d1.shape[0])
    pass_ratio = best < (ratio ** 2) * second  # squared-distance ratio test
    ok = pass_ratio & mutual & m1 & (best < big)
    dist = jnp.sqrt(jnp.maximum(best, 0.0))
    # the 0.8*max-dist filter over accepted matches
    max_d = jnp.max(jnp.where(ok, dist, 0.0))
    ok = ok & (dist <= max_dist_factor * jnp.maximum(max_d, 1e-9))

    order = jnp.argsort(jnp.where(ok, dist, big))
    take = order[:max_matches]
    out_mask = ok[take]
    pairs = jnp.stack([take.astype(jnp.int32), idx[take, 0].astype(jnp.int32)], axis=1)
    return {"idx": jnp.where(out_mask[:, None], pairs, 0),
            "mask": out_mask, "dist": jnp.where(out_mask, dist[take], 0.0)}
