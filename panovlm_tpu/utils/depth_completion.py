"""Morphological depth completion (ip_basic) — fully batched JAX.

Replaces util/DepthCompletion.{h,cpp} (reference DepthCompletion,
:154-315): invert valid depths (max_depth - d), multi-scale dilation with
cross kernels chosen by range band (near<=15 m: cross7, med<=30: cross5,
far: cross3), 5x5 closing, median blur, sky-aware hole filling (top mask
from the first valid row per column), 6 rounds of 5x5 dilation into holes,
median + bilateral smoothing, invert back.

Morphology on TPU: flat structuring elements = max-filters implemented as
maxima over statically-unrolled kernel shifts (each a cheap fused VPU op);
median = jnp.median over the stacked 5x5 neighborhood.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _kernel_offsets(mask: np.ndarray):
    ys, xs = np.nonzero(mask)
    c = mask.shape[0] // 2
    return [(int(y - c), int(x - c)) for y, x in zip(ys, xs)]


FULL_3 = _kernel_offsets(np.ones((3, 3), bool))
FULL_5 = _kernel_offsets(np.ones((5, 5), bool))
FULL_9 = _kernel_offsets(np.ones((9, 9), bool))
CROSS_3 = _kernel_offsets(np.array(
    [[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool))
CROSS_5 = _kernel_offsets((lambda k: k)(np.array(
    [[0, 0, 1, 0, 0], [0, 0, 1, 0, 0], [1, 1, 1, 1, 1],
     [0, 0, 1, 0, 0], [0, 0, 1, 0, 0]], bool)))
_c7 = np.zeros((7, 7), bool)
_c7[3, :] = True
_c7[:, 3] = True
CROSS_7 = _kernel_offsets(_c7)


def _shift(img, dy, dx, fill):
    """out[y, x] = img[y - dy, x - dx], out-of-bounds -> fill."""
    return jnp.pad(img, ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))),
                   constant_values=fill)[
        max(-dy, 0):img.shape[0] + max(-dy, 0),
        max(-dx, 0):img.shape[1] + max(-dx, 0)]


def dilate(img, offsets):
    out = img
    for dy, dx in offsets:
        if dy == 0 and dx == 0:
            continue
        out = jnp.maximum(out, _shift(img, dy, dx, 0.0))
    return out


def erode(img, offsets):
    out = img
    big = jnp.asarray(jnp.inf, img.dtype)
    for dy, dx in offsets:
        if dy == 0 and dx == 0:
            continue
        out = jnp.minimum(out, _shift(img, dy, dx, jnp.inf))
    return out


def median5(img):
    stack = jnp.stack([_shift(img, dy, dx, 0.0) for dy, dx in FULL_5])
    return jnp.median(stack, axis=0)


def bilateral5(img, sigma_color: float = 0.5, sigma_space: float = 2.0):
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    for dy, dx in FULL_5:
        s = _shift(img, dy, dx, 0.0)
        w_s = np.exp(-(dy * dy + dx * dx) / (2 * sigma_space ** 2))
        w_c = jnp.exp(-((s - img) ** 2) / (2 * sigma_color ** 2))
        w = w_s * w_c * (s > 0)
        num = num + w * s
        den = den + w
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), img)


@functools.partial(jax.jit, static_argnames=("max_depth",))
def depth_completion(sparse_depth, max_depth: float = 20.0):
    """Dense depth from a sparse panorama depth (reference DepthCompletion).
    sparse_depth (H,W) float32 meters, 0 = empty. Returns (H,W) float32."""
    d0 = jnp.where(sparse_depth <= max_depth, sparse_depth, 0.0)
    valid = d0 > 0.1

    near = valid & (d0 <= 15.0)
    med = (d0 > 15.0) & (d0 <= 30.0)
    far = d0 > 30.0

    # invert
    s1 = jnp.where(valid, max_depth - d0, d0)

    dil_far = dilate(jnp.where(far, s1, 0.0), CROSS_3)
    dil_med = dilate(jnp.where(med, s1, 0.0), CROSS_5)
    dil_near = dilate(jnp.where(near, s1, 0.0), CROSS_7)
    s2 = s1
    s2 = jnp.where(dil_far > 0.1, dil_far, s2)
    s2 = jnp.where(dil_med > 0.1, dil_med, s2)
    s2 = jnp.where(dil_near > 0.1, dil_near, s2)

    # close small holes (5x5)
    s3 = erode(dilate(s2, FULL_5), FULL_5)

    # median blur where valid
    s4 = jnp.where(s3 > 0.1, median5(s3), s3)

    # sky mask: zero above the first valid row per column
    H = s4.shape[0]
    first_valid = jnp.argmax(s4 > 0.1, axis=0)
    has_any = jnp.any(s4 > 0.1, axis=0)
    rows = jnp.arange(H)[:, None]
    top_mask = (rows >= first_valid[None, :]) & has_any[None, :]

    empty = (~(s4 > 0.1)) & top_mask
    s5 = jnp.where(empty, dilate(s4, FULL_9), s4)

    first_valid2 = jnp.argmax(s5 > 0.1, axis=0)
    has_any2 = jnp.any(s5 > 0.1, axis=0)
    top_mask2 = (rows >= first_valid2[None, :]) & has_any2[None, :]

    s7 = s5
    for _ in range(6):
        empty = (s7 < 0.1) & top_mask2
        s7 = jnp.where(empty, dilate(s7, FULL_5), s7)

    vmask = (s7 > 0.1) & top_mask2
    s7 = jnp.where(vmask, median5(s7), s7)
    s7 = jnp.where(vmask, bilateral5(s7), s7)

    return jnp.where(s7 > 0.1, max_depth - s7, s7)


@functools.lru_cache(maxsize=8)
def _depth_images_program(rows, cols, max_depth, splat):
    """Jitted chunk program, cached per static config so repeated chunk
    calls hit one trace."""
    @jax.jit
    def run(p_c, m_c, T_c):
        def body(args):
            p, m, T = args
            return compute_depth_image(p, m, T, rows, cols,
                                       max_depth=max_depth, splat=splat)
        return jax.lax.map(body, (p_c, m_c, T_c))
    return run


def compute_depth_images(points_lidar, mask, T_cl, rows: int, cols: int,
                         max_depth: float = 20.0, splat: int | None = None,
                         chunk: int = 256):
    """All scans' completed depth panoramas, chunked into bounded HOST-
    DRIVEN device programs (the function itself is NOT jitted — the
    chunk loop pulls each chunk to host, which under an outer trace would
    fail on tracers): points_lidar (N, P, 3), mask (N, P), T_cl (4, 4) or
    (N, 4, 4) -> (N, rows, cols). lax.map inside each chunk keeps the
    splat/completion tensors one-frame sized without a dispatch+sync
    tunnel round trip per scan (~70 ms each); the host-level chunking
    bounds per-program duration (one unbounded program over a
    Floor/Campus-sized trajectory can trip the remote worker's watchdog,
    PERF.md) at one compile (the last chunk is padded)."""
    N = points_lidar.shape[0]
    if T_cl.ndim == 2:
        T_cl = jnp.broadcast_to(T_cl, (N, 4, 4))
    run = _depth_images_program(rows, cols, max_depth, splat)

    if N <= chunk:
        return run(points_lidar, mask, T_cl)
    outs = []
    for s in range(0, N, chunk):
        e = min(s + chunk, N)
        pad = chunk - (e - s)
        p_c = jnp.concatenate([points_lidar[s:e], points_lidar[:pad]]) \
            if pad else points_lidar[s:e]
        m_c = jnp.concatenate([mask[s:e], mask[:pad]]) if pad else mask[s:e]
        T_c = jnp.concatenate([T_cl[s:e], T_cl[:pad]]) if pad else T_cl[s:e]
        outs.append(np.asarray(run(p_c, m_c, T_c))[:e - s])
    return jnp.asarray(np.concatenate(outs))


@functools.partial(jax.jit, static_argnames=("rows", "cols", "max_depth", "splat"))
def compute_depth_image(points_lidar, mask, T_cl, rows: int, cols: int,
                        max_depth: float = 20.0, splat: int | None = None):
    """ComputeDepthImage for one scan (sfm/SfM.cpp:170-226): transform the
    cloud by T_cl, splat to a sparse panorama depth, complete it.

    The splat footprint scales with resolution: the reference's size=3 is
    tuned for half-res 1440x2880 panoramas; a fixed footprint at lower
    resolution covers several degrees and the scatter-min z-buffer then
    biases sampled depths low (measured ~13% at 256 wide)."""
    from ..ops import spherical
    if splat is None:
        splat = max(1, 3 * cols // 2880)
    R = T_cl[:3, :3]
    t = T_cl[:3, 3]
    p_cam = points_lidar @ R.T + t
    sparse = spherical.project_points_to_depth_pano(p_cam, mask, rows, cols,
                                                    size=splat)
    return depth_completion(sparse, max_depth=max_depth)
