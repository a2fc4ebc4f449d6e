"""Batched SO(3)/SE(3) operations (quaternions, Rodrigues exp/log, slerp).

TPU-native replacement for the closed-form pose math used throughout the
reference (Eigen Quaterniond / AngleAxis in base/Geometry.hpp:545-583 and
ceres rotation.h usage in base/CostFunction.h). All functions broadcast
over arbitrary leading batch dimensions and are jit/vmap/grad friendly.

Conventions:
  * quaternions are (w, x, y, z), normalized, Hamilton convention;
  * rotation matrices act on column vectors: x_w = R_wl @ x_l + t_wl;
  * tangent vectors (so3) use the axis-angle (Rodrigues) chart.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

_EPS = 1e-12

# TPU MXU matmuls default to bf16 inputs; pose math needs full f32.
# (Measured: default-precision 3x3 products give |R^T R - I| ~ 1e-2 on v5e.)
_HI = jax.lax.Precision.HIGHEST


def matmul(a, b):
    """Full-precision matmul for small pose/geometry matrices."""
    return jnp.matmul(a, b, precision=_HI)


def einsum(subscripts, *operands):
    """Full-precision einsum for pose/point transforms."""
    return jnp.einsum(subscripts, *operands, precision=_HI)


# ----------------------------------------------------------------------------
# SO(3): axis-angle <-> rotation matrix (Rodrigues), robust near zero
# ----------------------------------------------------------------------------

def hat(w):
    """so(3) hat operator: (...,3) -> (...,3,3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w):
    """Rodrigues: axis-angle (...,3) -> rotation matrix (...,3,3).

    Taylor-safe at theta ~ 0 so that jacobians through here are exact.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    use_taylor = theta2 < 1e-8
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks. The un-taken branch
    # must use a SAFE denominator: reverse-mode AD propagates cotangents into
    # both branches of a where, and (1-cos 0)/0 = 0/0 would emit NaN
    # (the "double-where" trick).
    theta_s = jnp.where(use_taylor, 1.0, theta)
    theta2_s = jnp.where(use_taylor, 1.0, theta2)
    a = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(theta_s) / theta_s)
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta_s)) / theta2_s)
    W = hat(w)
    # W @ W == w w^T - theta^2 I (outer-product form avoids an MXU matmul,
    # which would otherwise run in bf16 by default on TPU).
    wwT = w[..., :, None] * w[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    WW = wwT - theta2[..., None, None] * eye
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def log_so3(R):
    """Rotation matrix (...,3,3) -> axis-angle (...,3). Safe near 0 and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # clip strictly inside (-1, 1): arccos' derivative is infinite at +-1 and
    # the resulting NaN would poison gradients through the Taylor branch
    # (theta^2 term -> 0 * inf). The value error is <= sqrt(2e-7) rad.
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    # vee of (R - R^T)/2 = sin(theta) * axis
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    ) * 0.5
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    near_pi = theta > jnp.pi - 1e-2
    # generic: w = theta/sin(theta) * v ; small: w ~ v * (1 + theta^2/6)
    scale = jnp.where(small, 1.0 + theta * theta / 6.0,
                      theta / jnp.where(jnp.abs(sin_theta) < _EPS, 1.0, sin_theta))
    w_generic = v * scale[..., None]
    # near pi: R + I ~ 2 a a^T (+ O(pi - theta)); take the column of (R + I)
    # with the largest diagonal as the (unnormalized) axis, then align its
    # global sign with v = sin(theta)*a (well-defined for theta < pi).
    A = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    diag = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    col_idx = jnp.argmax(diag, axis=-1)
    cols = jnp.swapaxes(A, -1, -2)  # (...,3(col),3)
    axis_raw = jnp.take_along_axis(cols, col_idx[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    axis = axis_raw / jnp.linalg.norm(axis_raw, axis=-1, keepdims=True).clip(_EPS)
    sign = jnp.sign(jnp.sum(axis * v, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    w_pi = theta[..., None] * axis * sign
    return jnp.where(near_pi[..., None], w_pi, w_generic)


# ----------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ----------------------------------------------------------------------------

def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_multiply(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v (...,3) by quaternions q (...,4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return m


def matrix_to_quat(R):
    """Rotation matrix (...,3,3) -> quaternion (...,4), w >= 0 branch-free.

    Uses the 4-branch numerically-stable construction selected by max
    diagonal element (Shepperd's method), implemented with where-selects so
    it is jit/vmap friendly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # candidate 0: w largest
    s0 = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # candidate 1: x largest
    s1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # candidate 2: y largest
    s2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # candidate 3: z largest
    s3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    # canonicalize sign (w >= 0)
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_slerp(q0, q1, t):
    """Spherical linear interpolation; t broadcasts over batch."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot).clip(max=1.0)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    t = jnp.asarray(t, q0.dtype)[..., None] if jnp.ndim(t) == jnp.ndim(q0) - 1 else jnp.asarray(t, q0.dtype)
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


# ----------------------------------------------------------------------------
# SE(3): (R, t) pairs
# ----------------------------------------------------------------------------

def transform_points(R, t, pts):
    """x' = R @ x + t. R (...,3,3), t (...,3), pts (...,P,3) or (...,3)."""
    if pts.ndim == R.ndim - 1:  # single point per batch element
        return einsum("...ij,...j->...i", R, pts) + t
    return einsum("...ij,...pj->...pi", R, pts) + t[..., None, :]


def invert_pose(R, t):
    """(R, t)^-1 = (R^T, -R^T t)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -einsum("...ij,...j->...i", Rt, t)


def compose_pose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): first apply b then a."""
    return matmul(Ra, Rb), einsum("...ij,...j->...i", Ra, tb) + ta


def relative_pose(R_w1, t_w1, R_w2, t_w2):
    """T_12 = T_w1^-1 ∘ T_w2 (frame 2 expressed in frame 1)."""
    R1i, t1i = invert_pose(R_w1, t_w1)
    return compose_pose(R1i, t1i, R_w2, t_w2)


def slerp_pose(R0, t0, R1, t1, alpha):
    """Pose interpolation: quaternion slerp on rotation, lerp on translation.

    Mirrors the semantics of the reference SlerpPose (base/Geometry.hpp:573-583):
    alpha = 0 -> pose0, alpha = 1 -> pose1.
    """
    q0 = matrix_to_quat(R0)
    q1 = matrix_to_quat(R1)
    q = quat_slerp(q0, q1, alpha)
    alpha_v = jnp.asarray(alpha, t0.dtype)
    t = (1.0 - alpha_v)[..., None] * t0 + alpha_v[..., None] * t1 \
        if jnp.ndim(alpha_v) == t0.ndim - 1 else (1.0 - alpha_v) * t0 + alpha_v * t1
    return quat_to_matrix(q), t


def retract(R, t, delta):
    """Right-multiplicative manifold retraction used by the GN/LM solver.

    delta (...,6) = (omega, dt):  R' = R @ Exp(omega),  t' = t + dt.
    Linearizing residuals at delta = 0 gives the tangent-space Jacobians.
    """
    omega, dt = delta[..., :3], delta[..., 3:]
    return matmul(R, exp_so3(omega)), t + dt


def pose_is_valid(R, t):
    """Validity sentinel mirroring reference IsPoseValid (Velodyne.cpp:1894-1899):
    invalid = infinite translation or all-zero rotation."""
    finite = jnp.all(jnp.isfinite(t), axis=-1) & jnp.all(jnp.isfinite(R), axis=(-2, -1))
    nonzero = jnp.sum(jnp.abs(R), axis=(-2, -1)) > 1e-9
    return finite & nonzero


def rotation_angle_deg(Ra, Rb):
    """Angle between two rotations, degrees (used by pair/triplet filters)."""
    Rrel = matmul(jnp.swapaxes(Ra, -1, -2), Rb)
    tr = Rrel[..., 0, 0] + Rrel[..., 1, 1] + Rrel[..., 2, 2]
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(c))
