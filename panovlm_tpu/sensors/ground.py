"""Linefit ground segmentation (polar bins x angular segments).

Replaces sensors/ground_segmentation.{h,cpp} (reference, from
lorenwel/linefit_ground_segmentation — "Fast Segmentation of 3D Point Clouds
for Ground Vehicles", IV'10): points are binned into (angular segment,
radial bin) cells, each segment fits a piecewise ground line over its bins'
lowest points, and points close to their segment's line are ground.

TPU re-design: the reference assigns bins with n_threads worker threads and
fits lines sequentially per segment; here the binning is one scatter-min,
the per-segment fit is a batched masked least-squares over all segments at
once, and classification is a gather + threshold — three fused kernels.
Operates in the camera convention (y DOWN = ground at +y).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_segments", "n_bins"))
def segment_ground_linefit(pts, mask, n_segments: int = 180, n_bins: int = 80,
                           r_min: float = 0.5, r_max: float = 50.0,
                           max_slope: float = 0.3,
                           sensor_height: float = 0.0,
                           dist_threshold: float = 0.15):
    """Classify ground points. pts (P,3) camera convention (y down).

    Returns (P,) bool ground mask."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    r = jnp.sqrt(x * x + z * z)
    seg = jnp.clip(((jnp.arctan2(x, z) + jnp.pi) / (2 * jnp.pi)
                    * n_segments).astype(jnp.int32), 0, n_segments - 1)
    # log-spaced radial bins resolve the near field
    log_r = jnp.log(jnp.clip(r, r_min, r_max) / r_min)
    log_max = jnp.log(r_max / r_min)
    binn = jnp.clip((log_r / log_max * n_bins).astype(jnp.int32), 0, n_bins - 1)
    cell = seg * n_bins + binn
    ok = mask & (r >= r_min) & (r <= r_max)

    # lowest point per cell (max y = lowest in camera convention)
    big = -1e9
    low_y = jnp.full((n_segments * n_bins,), big).at[cell].max(
        jnp.where(ok, y, big))
    low_r = jnp.zeros((n_segments * n_bins,)).at[cell].max(
        jnp.where(ok & (y >= low_y[cell] - 1e-4), r, 0.0))
    has = low_y > big + 1.0

    ys = low_y.reshape(n_segments, n_bins)
    rs = low_r.reshape(n_segments, n_bins)
    hs = has.reshape(n_segments, n_bins)
    # candidate ground seeds: lowest points near the expected ground height
    seed = hs & (ys > sensor_height - 0.5)
    w = seed.astype(pts.dtype)
    # per-segment least-squares line y = a*r + b over seed bins
    sw = jnp.sum(w, axis=1)
    sr = jnp.sum(w * rs, axis=1)
    sy = jnp.sum(w * ys, axis=1)
    srr = jnp.sum(w * rs * rs, axis=1)
    sry = jnp.sum(w * rs * ys, axis=1)
    det = sw * srr - sr * sr
    a = jnp.where(jnp.abs(det) > 1e-6, (sw * sry - sr * sy) / det, 0.0)
    b = jnp.where(jnp.abs(det) > 1e-6, (srr * sy - sr * sry) / det,
                  sy / jnp.maximum(sw, 1.0))
    # slope sanity (max_slope), like the reference's line acceptance
    a = jnp.clip(a, -max_slope, max_slope)
    line_ok = sw >= 3

    y_line = a[seg] * r + b[seg]
    ground = ok & line_ok[seg] & (jnp.abs(y - y_line) < dist_threshold)
    return ground
