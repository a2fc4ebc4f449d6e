"""Line Band Descriptor for panoramic line matching.

The reference describes image lines with OpenCV's LBD
(cv::line_descriptor::BinaryDescriptor, util/PanoramaLine.cpp:39-74) and
matches them with a Hamming matcher + ratio test
(PanoramaLineMatcher::MatchInitLine, joint_optimization/
PanoramaLineMatch.cpp:33-58). This module is the TPU-native equivalent:
a float band descriptor computed as one batched array program.

Design (follows Zhang & Koch's LBD construction): sample S points along
the line's great-circle arc, build a local line support region of
n_bands x band_width pixel rows parallel to the arc, project bilinear-
sampled image gradients onto the local tangent/normal directions,
half-wave rectify into 4 channels, and describe each band by the
Gaussian-weighted mean and std of those channels -> (8 * n_bands,)
floats, clipped and L2-normalized. Arcs on an equirectangular panorama
are curved in pixel space, so the tangent/normal frame is computed per
sample point from the projected arc (handles lon wrap), instead of
assuming a straight 2D segment like the reference's LSD keylines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import spherical


def _gradients(gray):
    """Central-difference image gradients (gx, gy), zero at borders."""
    gy, gx = jnp.gradient(gray)
    return gx, gy


def _bilinear(img, u, v):
    """Bilinear sample with lon wrap on u and clamp on v."""
    H, W = img.shape
    u = jnp.mod(u, W)
    v = jnp.clip(v, 0.0, H - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.mod(u0 + 1, W)
    v1 = jnp.minimum(v0 + 1, H - 1)
    fu = u - u0
    fv = v - v0
    return (img[v0, u0] * (1 - fu) * (1 - fv) + img[v0, u1] * fu * (1 - fv)
            + img[v1, u0] * (1 - fu) * fv + img[v1, u1] * fu * fv)


def _line_band_descriptors(gray, e1, e2, mask, n_bands: int = 9,
                           band_width: int = 7, n_samples: int = 24):
    H, W = gray.shape
    gx, gy = _gradients(gray)
    rows_total = n_bands * band_width
    # Gaussian weight across the support region (LBD's global weight)
    r_off = jnp.arange(rows_total, dtype=jnp.float32) - (rows_total - 1) / 2.0
    sigma_g = 0.5 * rows_total
    w_g = jnp.exp(-0.5 * (r_off / sigma_g) ** 2)

    t_s = jnp.linspace(0.0, 1.0, n_samples)

    def per_line(p1, p2):
        # slerp along the arc
        cosw = jnp.clip(jnp.dot(p1, p2), -1.0, 1.0)
        theta = jnp.arccos(cosw)
        sinw = jnp.maximum(jnp.sin(theta), 1e-6)
        pts = (jnp.sin((1 - t_s)[:, None] * theta) * p1[None]
               + jnp.sin(t_s[:, None] * theta) * p2[None]) / sinw
        pts = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-12)
        uv = spherical.cam_to_image(pts, H, W)            # (S, 2)
        # pixel-space tangent with lon wrap
        d_uv = jnp.roll(uv, -1, axis=0) - jnp.roll(uv, 1, axis=0)
        du = jnp.mod(d_uv[:, 0] + W / 2, W) - W / 2
        dv = d_uv[:, 1]
        tang = jnp.stack([du, dv], axis=-1)
        tang = tang / (jnp.linalg.norm(tang, axis=-1, keepdims=True) + 1e-9)
        nrml = jnp.stack([-tang[:, 1], tang[:, 0]], axis=-1)

        # support region: (rows_total, S) sample positions
        u_s = uv[None, :, 0] + r_off[:, None] * nrml[None, :, 0]
        v_s = uv[None, :, 1] + r_off[:, None] * nrml[None, :, 1]
        g_x = _bilinear(gx, u_s, v_s)
        g_y = _bilinear(gy, u_s, v_s)
        g_d = g_x * tang[None, :, 0] + g_y * tang[None, :, 1]
        g_n = g_x * nrml[None, :, 0] + g_y * nrml[None, :, 1]
        feat = jnp.stack([jnp.maximum(g_n, 0), jnp.maximum(-g_n, 0),
                          jnp.maximum(g_d, 0), jnp.maximum(-g_d, 0)],
                         axis=-1)                          # (R, S, 4)
        feat = feat * w_g[:, None, None]
        bands = feat.reshape(n_bands, band_width, n_samples, 4)
        mean = bands.mean(axis=(1, 2))                     # (B, 4)
        std = bands.std(axis=(1, 2))                       # (B, 4)
        desc = jnp.concatenate([mean, std], axis=-1).reshape(-1)
        desc = desc / (jnp.linalg.norm(desc) + 1e-12)
        desc = jnp.clip(desc, 0.0, 0.4)                    # SIFT-style hat
        return desc / (jnp.linalg.norm(desc) + 1e-12)

    desc = jax.vmap(per_line)(e1, e2)
    return jnp.where(mask[:, None], desc, 0.0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_bands", "band_width",
                                             "n_samples"))
def line_band_descriptors(gray, e1, e2, mask, n_bands: int = 9,
                          band_width: int = 7, n_samples: int = 24):
    """Descriptors for a batch of great-circle arcs.

    gray (H, W) float; e1/e2 (L, 3) unit endpoint rays; mask (L,).
    Returns (L, 8 * n_bands) float32, zero rows where mask is False.
    """
    return _line_band_descriptors(gray, e1, e2, mask, n_bands=n_bands,
                                  band_width=band_width, n_samples=n_samples)


@functools.partial(jax.jit, static_argnames=("n_bands", "band_width",
                                             "n_samples"))
def line_band_descriptors_batch(grays, e1, e2, mask, n_bands: int = 9,
                                band_width: int = 7, n_samples: int = 24):
    """All-frames LBD in ONE device program: grays (N, H, W) float,
    e1/e2 (N, L, 3), mask (N, L) -> (N, L, 8 * n_bands).

    lax.map (not vmap) over the frame axis so each image's gradient and
    support-region tensors stay one-frame sized — a per-frame host loop of
    line_band_descriptors costs a dispatch+sync round trip per frame
    through the remote-TPU tunnel (~2 s/frame observed at Room-454, 62%
    of the joint stage; PERF.md 'Room scale'), while this form uploads
    the stack once and runs N frames per dispatch."""
    def body(args):
        g, a, b, m = args
        return _line_band_descriptors(g, a, b, m, n_bands=n_bands,
                                      band_width=band_width,
                                      n_samples=n_samples)

    return jax.lax.map(body, (grays, e1, e2, mask))


def lbd_distance_matrix(desc_i, desc_j):
    """(Lj, Li) L2 distances (matmul form for the MXU)."""
    d2 = (jnp.sum(desc_j * desc_j, -1)[:, None]
          + jnp.sum(desc_i * desc_i, -1)[None, :]
          - 2 * jnp.einsum("jd,id->ji", desc_j, desc_i,
                           precision=jax.lax.Precision.HIGHEST))
    return jnp.sqrt(jnp.maximum(d2, 0.0))
