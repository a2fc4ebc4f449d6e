"""Multi-view triangulation of bearing rays (batched).

Replaces sfm/Triangulate.{h,cpp} (reference): two-view midpoint lives in
ops/epipolar.py; this module adds the N-view least-squares point-to-rays
solve used by TriangulateTracks (sfm/Structure.cpp:8-85) plus viewing-angle
computation for the triangulation-angle filter
(config triangulate_angle_threshold, default 25 deg).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3


def rays_from_poses(poses_cw, bearings):
    """Camera-frame bearings -> world rays. poses_cw (...,6) [aa_cw, t_cw],
    bearings (...,3). Returns (origin (...,3), dir (...,3))."""
    R_cw = se3.exp_so3(poses_cw[..., :3])
    R_wc = jnp.swapaxes(R_cw, -1, -2)
    origin = -se3.einsum("...ij,...j->...i", R_wc, poses_cw[..., 3:])
    direction = se3.einsum("...ij,...j->...i", R_wc, bearings)
    return origin, direction


def triangulate_rays(origins, dirs, mask):
    """LSQ point closest to a masked bundle of rays.

    origins/dirs (..., L, 3), mask (..., L). X = (sum_i P_i)^-1 sum_i P_i c_i
    with P_i = I - d_i d_i^T. Returns (X (...,3), ok)."""
    w = mask.astype(origins.dtype)[..., None, None]
    eye = jnp.eye(3, dtype=origins.dtype)
    P = (eye - dirs[..., :, None] * dirs[..., None, :]) * w  # (...,L,3,3)
    A = jnp.sum(P, axis=-3)
    b = jnp.sum(se3.einsum("...lij,...lj->...li", P, origins), axis=-2)
    # regularize singular bundles (all-parallel rays)
    det_ok = jnp.linalg.det(A)
    A_safe = A + 1e-9 * eye
    X = jnp.linalg.solve(A_safe, b[..., None])[..., 0]
    ok = (jnp.sum(mask, axis=-1) >= 2) & (jnp.abs(det_ok) > 1e-9)
    return X, ok


def max_pairwise_ray_angle(dirs, mask):
    """Max angle (deg) between any two valid rays (..., L, 3) — the
    triangulation-angle criterion (Structure.cpp:8-85)."""
    cosm = se3.einsum("...li,...mi->...lm", dirs, dirs)
    valid = mask[..., :, None] & mask[..., None, :]
    cosm = jnp.where(valid, jnp.clip(cosm, -1.0, 1.0), 1.0)
    return jnp.degrees(jnp.arccos(jnp.min(cosm, axis=(-2, -1))))


def reprojection_angles(poses_cw, bearings, X, mask):
    """Angle (deg) between each observation ray and the triangulated point
    (..., L). Used by FilterTracksAngleResidual (Structure.cpp:159-194)."""
    R_cw = se3.exp_so3(poses_cw[..., :3])  # (..., L, 3, 3)
    p_c = se3.einsum("...lij,...j->...li", R_cw, X) + poses_cw[..., 3:]
    p_n = p_c / (jnp.linalg.norm(p_c, axis=-1, keepdims=True) + 1e-12)
    cosv = jnp.clip(jnp.sum(p_n * bearings, axis=-1), -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cosv))
    return jnp.where(mask, ang, 0.0)


def triangulate_two_view_idwm(R_21, t_21, b1, b2):
    """Inverse-depth-weighted midpoint two-view triangulation (Lee & Civera
    BMVC'19; Triangulate2ViewIDWM, sfm/Triangulate.cpp:84-112). Batched over
    leading axes of b1/b2 (..., 3); R_21 (3,3), t_21 (3,).

    Returns (X1 (...,3) in camera-1 frame, ok (...)) where ok is the paper's
    Eq.(9) cheirality/adequation test (failures are infinity in the
    reference; here a boolean)."""
    Rp1 = se3.einsum("ij,...j->...i", R_21, b1)
    p_norm = jnp.linalg.norm(jnp.cross(Rp1, b2), axis=-1)
    q_norm = jnp.linalg.norm(jnp.cross(Rp1, jnp.broadcast_to(t_21, Rp1.shape)),
                             axis=-1)
    r_norm = jnp.linalg.norm(jnp.cross(b2, jnp.broadcast_to(t_21, b2.shape)),
                             axis=-1)
    p_safe = jnp.where(p_norm < 1e-12, 1e-12, p_norm)
    lam0 = (r_norm / p_safe)[..., None] * Rp1
    lam1 = (q_norm / p_safe)[..., None] * b2
    X2 = (q_norm / jnp.maximum(q_norm + r_norm, 1e-12))[..., None] * (
        t_21 + (r_norm / p_safe)[..., None] * (Rp1 + b2))
    best = jnp.sum((t_21 + lam0 - lam1) ** 2, axis=-1)
    alts = jnp.stack([jnp.sum((t_21 + lam0 + lam1) ** 2, axis=-1),
                      jnp.sum((t_21 - lam0 - lam1) ** 2, axis=-1),
                      jnp.sum((t_21 - lam0 + lam1) ** 2, axis=-1)], axis=-1)
    ok = (best < jnp.min(alts, axis=-1)) & (p_norm > 1e-12)
    X1 = se3.einsum("ji,...j->...i", R_21, X2 - t_21)
    return X1, ok
