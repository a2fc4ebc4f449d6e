"""Closed-form 3D geometry, batched with validity masks.

TPU re-expression of base/Geometry.hpp (reference): PCA line fit
(FormLine, Geometry.hpp:221-260), LSQ plane fit (FormPlane, :346-404),
point/line/plane distances and projections (:21-211), plane intersections
(:494-522), angle helpers (:421-485), furthest-pair (:594-645).

All fitting functions take a (..., P, 3) point block plus a (..., P) bool
mask so ragged point sets ride fixed-shape arrays (masking+bucketing
discipline, SURVEY.md hard part #2).
"""

from __future__ import annotations

import jax.numpy as jnp

from .se3 import einsum

_EPS = 1e-12


def _masked_mean(pts, mask):
    w = mask.astype(pts.dtype)
    n = jnp.sum(w, axis=-1, keepdims=True).clip(1.0)
    mean = jnp.sum(pts * w[..., None], axis=-2) / n
    return mean, w, n


def _masked_cov(pts, mask):
    mean, w, n = _masked_mean(pts, mask)
    centered = (pts - mean[..., None, :]) * w[..., None]
    cov = einsum("...pi,...pj->...ij", centered, centered) / n[..., None]
    return mean, cov, n[..., 0]


def eigh3x3(A):
    """Analytic eigendecomposition of symmetric 3x3 matrices (batched).

    Closed-form trigonometric eigenvalues (Smith's method) + cross-product
    eigenvectors — pure elementwise VPU math, far faster on TPU than the
    iterative jnp.linalg.eigh for large batches of tiny matrices (the plane/
    line fits in association and MVS run thousands per step).
    Returns (eigvals ascending (...,3), eigvecs (...,3,3) columns).
    """
    dtype = A.dtype
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.clip(detB / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    eigvals = jnp.stack([e_lo, e_mid, e_hi], axis=-1)

    def eigvec(lam):
        # v = cross of two rows of (A - lam I); pick the largest of the three
        M = A - lam[..., None, None] * jnp.eye(3, dtype=dtype)
        c01 = jnp.cross(M[..., 0, :], M[..., 1, :])
        c02 = jnp.cross(M[..., 0, :], M[..., 2, :])
        c12 = jnp.cross(M[..., 1, :], M[..., 2, :])
        n01 = jnp.sum(c01 * c01, axis=-1)
        n02 = jnp.sum(c02 * c02, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
        v = jnp.take_along_axis(
            jnp.stack([c01, c02, c12], axis=-2), best[..., None, None].repeat(3, -1),
            axis=-2)[..., 0, :]
        # degenerate (repeated eigenvalue): fall back to any unit vector
        # orthogonalized later; normalize safely
        norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = jnp.where(norm > 1e-20, v / jnp.maximum(norm, 1e-20),
                      jnp.broadcast_to(jnp.array([1.0, 0, 0], dtype), v.shape))
        return v

    v_lo = eigvec(e_lo)
    v_hi = eigvec(e_hi)
    # enforce orthogonality for the middle one
    v_mid = jnp.cross(v_hi, v_lo)
    v_mid = v_mid / jnp.maximum(jnp.linalg.norm(v_mid, axis=-1, keepdims=True), 1e-20)
    eigvecs = jnp.stack([v_lo, v_mid, v_hi], axis=-1)
    return eigvals, eigvecs


def fit_line_pca(pts, mask):
    """PCA line fit (reference FormLine semantics).

    Returns dict with: point (...,3) centroid, dir (...,3) unit direction
    (largest principal axis), eigvals (...,3) ascending, ok (...,) bool
    (>=2 valid points and non-degenerate direction).
    """
    mean, cov, n = _masked_cov(pts, mask)
    eigvals, eigvecs = eigh3x3(cov)  # ascending
    direction = eigvecs[..., :, 2]
    # canonical sign: largest-|.| component positive
    idx = jnp.argmax(jnp.abs(direction), axis=-1, keepdims=True)
    sign = jnp.sign(jnp.take_along_axis(direction, idx, axis=-1))
    direction = direction * jnp.where(sign == 0, 1.0, sign)
    ok = (n >= 2) & (eigvals[..., 2] > _EPS)
    return {"point": mean, "dir": direction, "eigvals": eigvals, "ok": ok}


def line_straightness(eigvals):
    """Ratio lambda_max / (lambda_mid + eps): large => nearly collinear set."""
    return eigvals[..., 2] / (eigvals[..., 1] + 1e-9)


def fit_plane_lsq(pts, mask, tolerance=None):
    """LSQ plane fit (reference FormPlane semantics): n.x + d = 0, |n| = 1.

    Returns dict with: normal (...,3), d (...,), centroid (...,3),
    max_dist (...,) max |point-plane distance| over valid points,
    ok (...,) bool (>=3 points, and max_dist <= tolerance when given —
    mirroring the plane-tolerance acceptance used by point-to-plane
    association, lidar_mapping/LidarFeatureAssociate.cpp:550-629).
    """
    mean, cov, n = _masked_cov(pts, mask)
    eigvals, eigvecs = eigh3x3(cov)
    normal = eigvecs[..., :, 0]  # smallest principal axis
    d = -jnp.einsum("...i,...i->...", normal, mean)
    dist = jnp.abs(jnp.einsum("...pi,...i->...p", pts, normal) + d[..., None])
    dist = jnp.where(mask, dist, 0.0)
    max_dist = jnp.max(dist, axis=-1)
    ok = n >= 3
    if tolerance is not None:
        ok = ok & (max_dist <= tolerance)
    return {"normal": normal, "d": d, "centroid": mean, "max_dist": max_dist,
            "eigvals": eigvals, "ok": ok}


def point_to_line_distance(p, line_pt, line_dir):
    """Distance of points p (...,3) to line(point, unit dir)."""
    diff = p - line_pt
    proj = jnp.einsum("...i,...i->...", diff, line_dir)
    closest = diff - proj[..., None] * line_dir
    return jnp.linalg.norm(closest, axis=-1)


def project_point_to_line(p, line_pt, line_dir):
    diff = p - line_pt
    proj = jnp.einsum("...i,...i->...", diff, line_dir)
    return line_pt + proj[..., None] * line_dir


def point_to_plane_distance(p, normal, d):
    """Signed distance of p (...,3) to plane n.x + d = 0 (|n|=1)."""
    return jnp.einsum("...i,...i->...", p, normal) + d


def angle_between(v1, v2, degrees=False):
    """Unsigned angle between vectors in [0, pi]."""
    c = jnp.einsum("...i,...i->...", v1, v2) / (
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
    ).clip(_EPS)
    a = jnp.arccos(jnp.clip(c, -1.0, 1.0))
    return jnp.degrees(a) if degrees else a


def line_angle_between(v1, v2, degrees=False):
    """Angle between undirected lines in [0, pi/2]."""
    a = angle_between(v1, v2, degrees=False)
    a = jnp.minimum(a, jnp.pi - a)
    return jnp.degrees(a) if degrees else a


def plane_plane_angle(n1, n2, degrees=False):
    return line_angle_between(n1, n2, degrees)


def plane_plane_intersection(n1, d1, n2, d2):
    """Intersection line of two planes. Returns (point, dir, ok)."""
    direction = jnp.cross(n1, n2)
    norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    ok = norm[..., 0] > 1e-8
    dir_u = direction / norm.clip(_EPS)
    # solve for point: minimize |x| s.t. n1.x=-d1, n2.x=-d2 -> x = A^T (A A^T)^-1 b
    n1d2 = jnp.einsum("...i,...i->...", n1, n2)
    n11 = jnp.einsum("...i,...i->...", n1, n1)
    n22 = jnp.einsum("...i,...i->...", n2, n2)
    det = (n11 * n22 - n1d2 * n1d2).clip(_EPS)
    c1 = (-d1 * n22 + d2 * n1d2) / det
    c2 = (-d2 * n11 + d1 * n1d2) / det
    point = c1[..., None] * n1 + c2[..., None] * n2
    return point, dir_u, ok


def plane_line_intersection(normal, d, line_pt, line_dir):
    """Intersection of plane n.x+d=0 with line. Returns (point, ok)."""
    denom = jnp.einsum("...i,...i->...", normal, line_dir)
    ok = jnp.abs(denom) > 1e-9
    t = -(jnp.einsum("...i,...i->...", normal, line_pt) + d) / jnp.where(ok, denom, 1.0)
    return line_pt + t[..., None] * line_dir, ok


def furthest_pair_along_dir(pts, mask, direction):
    """Endpoints of a masked point set projected onto a direction.

    Replaces the furthest-pair endpoint extraction (Geometry.hpp:594-645) as
    used after line fitting (Velodyne::EdgeToLine): project all valid points
    onto the line direction, take min/max projections.
    Returns (p_min, p_max) each (...,3).
    """
    proj = jnp.einsum("...pi,...i->...p", pts, direction)
    big = jnp.asarray(1e30, pts.dtype)
    pmin_idx = jnp.argmin(jnp.where(mask, proj, big), axis=-1)
    pmax_idx = jnp.argmax(jnp.where(mask, proj, -big), axis=-1)
    p_min = jnp.take_along_axis(pts, pmin_idx[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    p_max = jnp.take_along_axis(pts, pmax_idx[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    return p_min, p_max


def project_endpoints_to_line(p_start, p_end, line_pt, line_dir):
    """Project raw endpoints onto the fitted line (reference EdgeToLine
    stores endpoints projected onto the line, Velodyne.h:91 comment)."""
    return (
        project_point_to_line(p_start, line_pt, line_dir),
        project_point_to_line(p_end, line_pt, line_dir),
    )
