"""Residual function library mirroring the reference's Ceres functors.

Each function here is the un-batched residual for ONE observation; the
solver vmaps it over the block's observation axis. Parameterization matches
the reference exactly: each frame contributes a 6-vector
``pose = [angleaxis_fw (3), t_fw (3)]`` — the **world-to-frame** transform —
optimized globally (base/CostFunction.h functors all take
``angleaxis_*w, t_*w`` pairs; see e.g. Point2Plane_Meter at
base/CostFunction.h:567, PanoramaReprojResidual_2Angle at :178).

Semantics parity notes (reference file:line in each docstring):
  * angle-based residuals use a deadband (<1e-3 -> 0) like the reference;
  * the ``normalize_distance`` trick re-centers the viewing sphere 1 m from
    the projected point (CostFunction.h:694-715) so angle ~ metric distance;
  * acos is computed via atan2(|cross|, dot) which is differentiable where
    ceres' raw acos jacobian blows up (the reference works around this with
    the same deadband).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import se3

# ----------------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------------


def split_pose(pose):
    return pose[..., :3], pose[..., 3:]


def transform_n_to_r(pose_r, pose_n, point_n):
    """P_r = R_rw * R_wn * P_n - R_rw * R_wn * t_nw + t_rw.

    pose_* = [aa_*w, t_*w] (world-to-frame). Mirrors the transform used by
    every pairwise LiDAR functor (e.g. base/CostFunction.h:585-607).
    """
    aa_r, t_r = split_pose(pose_r)
    aa_n, t_n = split_pose(pose_n)
    R_rw = se3.exp_so3(aa_r)
    R_wn = se3.exp_so3(-aa_n)  # = R_nw^T
    R_rn = se3.matmul(R_rw, R_wn)
    return R_rn @ point_n - R_rn @ t_n + t_r


def _safe_norm(x, eps: float = 1e-6):
    """sqrt(|x|^2 + eps^2): jnp.linalg.norm has a NaN gradient at exactly 0
    (0/0), which leaks through downstream clamps/wheres in reverse mode."""
    return jnp.sqrt(jnp.sum(x * x) + eps * eps)


def vector_angle(v1, v2):
    """Unsigned angle between vectors; atan2 form, stable near 0 and pi.

    The sqrt floor is 1e-12 (not tighter): reverse-mode partials scale as
    1/sin_n, and a 1e-20 floor lets degenerate (zero/parallel) inputs build
    1e10-scale cotangent products that overflow f32 into inf/NaN. 1e-12
    bounds partials at ~1e6 while costing only ~1e-6 rad of resolution,
    far below the reference's 1e-3 deadbands."""
    cross = jnp.cross(v1, v2)
    sin_n = jnp.sqrt(jnp.sum(cross * cross) + 1e-12)
    cos_d = jnp.sum(v1 * v2)
    return jnp.arctan2(sin_n, cos_d)


def plane_angle(v1, v2):
    """Angle folded to [0, pi/2] (reference PlaneAngle used for line dirs)."""
    a = vector_angle(v1, v2)
    return jnp.minimum(a, jnp.pi - a)


def _normalized_center_angle(point_proj, point_ref):
    """The reference's distance normalization (CostFunction.h:694-715):
    measure the angle from a center placed 1 m from the projected point
    (along the origin->projection ray), so the angle ~ metric distance.
    The norm is clamped to 1 cm: below that the construction is degenerate
    and a tiny eps would overflow reverse-mode partials (1/norm^2)."""
    norm = jnp.maximum(_safe_norm(point_proj), 1e-2)
    center = (norm - 1.0) / norm * point_proj
    return vector_angle(point_proj - center, point_ref - center)


# ----------------------------------------------------------------------------
# camera reprojection (base/CostFunction.h:178-292)
# ----------------------------------------------------------------------------


def reproj_chordal(pose_cw, point_3d, obs_ray):
    """Chordal reprojection residual (TPU-first default, not in the reference).

    r = normalize(R_cw X + t_cw) - obs_ray, the 3D chordal distance between
    unit rays; |r| ~ angle for small angles, so Huber scales in radians carry
    over. Unlike the reference's scalar-angle residual
    (PanoramaReprojResidual_1Angle, base/CostFunction.h:218-247) whose
    Gauss-Newton block is rank-1 (the curvature orthogonal to the current
    deviation is invisible, which measurably stalls LM), this is smooth and
    rank-2: the two-view BA test converges to machine precision in ~6
    iterations where the 1-angle form plateaus at ~0.01 rad. Same minimizer
    on noise-free data; near-identical weighting for small residuals. (3,)."""
    aa, t = split_pose(pose_cw)
    p_c = se3.exp_so3(aa) @ point_3d + t
    return p_c / (jnp.linalg.norm(p_c) + 1e-12) - obs_ray


def reproj_2angle(pose_cw, point_3d, obs_lonlat):
    """PanoramaReprojResidual_2Angle (base/CostFunction.h:178-213).

    Returns (2,) residual [d_lon, d_lat]. Deviation from the reference: the
    reference wraps lon to [0,2pi) (CostFunction.h:200-203), which merely
    moves the seam discontinuity from +-pi to 0 (straight ahead); we wrap the
    *difference* to (-pi, pi] via atan2, which equals the reference value
    whenever |d_lon| < pi and has no seam anywhere.
    """
    aa, t = split_pose(pose_cw)
    p_c = se3.exp_so3(aa) @ point_3d + t
    norm = jnp.linalg.norm(p_c) + 1e-12
    lon = jnp.arctan2(p_c[0], p_c[2])
    lat = -jnp.arcsin(jnp.clip(p_c[1] / norm, -1.0, 1.0))
    d = lon - obs_lonlat[0]
    d_lon = jnp.arctan2(jnp.sin(d), jnp.cos(d))
    return jnp.stack([d_lon, lat - obs_lonlat[1]])


def reproj_1angle(pose_cw, point_3d, obs_ray):
    """PanoramaReprojResidual_1Angle (base/CostFunction.h:218-247):
    angle between the projected ray and the observed unit ray. (1,)."""
    aa, t = split_pose(pose_cw)
    p_c = se3.exp_so3(aa) @ point_3d + t
    return vector_angle(p_c, obs_ray)[None]


def reproj_pixel(pose_cw, point_3d, obs_uv, rows, cols):
    """PanoramaReprojResidual_Pixel (base/CostFunction.h:249-292). (2,)."""
    aa, t = split_pose(pose_cw)
    p_c = se3.exp_so3(aa) @ point_3d + t
    norm = jnp.linalg.norm(p_c) + 1e-12
    lon = jnp.arctan2(p_c[0], p_c[2])
    lat = -jnp.arcsin(jnp.clip(p_c[1] / norm, -1.0, 1.0))
    u = cols * (0.5 + lon / (2 * jnp.pi))
    v = rows * (0.5 - lat / jnp.pi)
    # wrap the u difference across the lon seam (the reference's Ceres
    # functor does not, and mis-penalizes points near u=0/u=W)
    du = jnp.mod(u - obs_uv[0] + cols / 2, cols) - cols / 2
    return jnp.stack([du, v - obs_uv[1]])


# ----------------------------------------------------------------------------
# LiDAR point-to-plane (base/CostFunction.h:567-619 / :630-729)
# ----------------------------------------------------------------------------


def point2plane_meter(pose_r, pose_n, point_n, plane_r):
    """Point2Plane_Meter: signed point-plane distance after transforming the
    neighbor-frame point into the reference frame. plane_r = (nx,ny,nz,d)
    with |n|=1, in the reference frame. (1,)."""
    p_ref = transform_n_to_r(pose_r, pose_n, point_n)
    return (jnp.sum(plane_r[:3] * p_ref) + plane_r[3])[None]


def point2plane_angle(pose_r, pose_n, point_n, plane_r, normalize_distance=True):
    """Point2Plane_Angle (base/CostFunction.h:630-729): angle between the
    point and its in-plane projection, seen from the reference origin (or the
    1 m normalized center). Deadband: distance < 1e-3 -> 0. (1,)."""
    p_ref = transform_n_to_r(pose_r, pose_n, point_n)
    dis = jnp.sum(plane_r[:3] * p_ref) + plane_r[3]
    p_proj = p_ref - dis * plane_r[:3]
    if normalize_distance:
        ang = _normalized_center_angle(p_proj, p_ref)
    else:
        ang = vector_angle(p_ref, p_proj)
    return jnp.where(jnp.abs(dis) < 1e-3, 0.0, ang)[None]


def pairwise_point2plane_meter(pose_21, point_1, plane_2):
    """PairWisePoint2Plane_Meter (base/CostFunction.h:732-766): relative-pose
    variant; pose_21 = [aa_21, t_21]. (1,)."""
    aa, t = split_pose(pose_21)
    p2 = se3.exp_so3(aa) @ point_1 + t
    return (jnp.sum(plane_2[:3] * p2) + plane_2[3])[None]


# ----------------------------------------------------------------------------
# LiDAR point-to-line (base/CostFunction.h:769-933 / :939-981)
# ----------------------------------------------------------------------------


def _point_line_distance(p, line_pt, line_dir):
    diff = p - line_pt
    k = jnp.sum(diff * line_dir)
    closest = diff - k * line_dir
    return jnp.sqrt(jnp.sum(closest * closest) + 1e-12)


def point2line_meter(pose_r, pose_n, point_n, line_pt_r, line_dir_r):
    """Point2Line_Meter (base/CostFunction.h:769-833). (1,)."""
    p_ref = transform_n_to_r(pose_r, pose_n, point_n)
    return _point_line_distance(p_ref, line_pt_r, line_dir_r)[None]


def point2line_angle(pose_r, pose_n, point_n, line_pt_r, line_dir_r,
                     normalize_distance=True):
    """Point2Line_Angle (base/CostFunction.h:836-933). Deadband <1e-3. (1,)."""
    p_ref = transform_n_to_r(pose_r, pose_n, point_n)
    k = jnp.sum(line_dir_r * (p_ref - line_pt_r))
    p_proj = line_pt_r + k * line_dir_r
    dis = _safe_norm(p_ref - p_proj)
    if normalize_distance:
        ang = _normalized_center_angle(p_proj, p_ref)
    else:
        ang = vector_angle(p_ref, p_proj)
    return jnp.where(dis < 1e-3, 0.0, ang)[None]


def pairwise_point2line_meter(pose_21, point_1, line_pt_2, line_dir_2):
    """PairWisePoint2Line_Meter (base/CostFunction.h:939-981). (1,)."""
    aa, t = split_pose(pose_21)
    p2 = se3.exp_so3(aa) @ point_1 + t
    return _point_line_distance(p2, line_pt_2, line_dir_2)[None]


# ----------------------------------------------------------------------------
# LiDAR line-to-line (base/CostFunction.h:984-1022)
# ----------------------------------------------------------------------------


def line2line_angle(pose_r, pose_n, dir_r, dir_n):
    """Line2Line_Angle: fold-to-90deg angle between the neighbor line
    direction rotated into the reference frame and the reference line
    direction. Rotation-only residual; deadband <1e-3. (1,)."""
    aa_r, _ = split_pose(pose_r)
    aa_n, _ = split_pose(pose_n)
    d_world = se3.exp_so3(-aa_n) @ dir_n
    d_ref = se3.exp_so3(aa_r) @ d_world
    ang = plane_angle(d_ref, dir_r)
    return jnp.where(ang < 1e-3, 0.0, ang)[None]


# ----------------------------------------------------------------------------
# camera-LiDAR line residuals (base/CostFunction.h:294-564)
# ----------------------------------------------------------------------------


def _transform_pair(pose_r, pose_n, p):
    """neighbor local -> world -> reference local (the functors' transform)."""
    aa_n, t_n = split_pose(pose_n)
    aa_r, t_r = split_pose(pose_r)
    R_wn = se3.exp_so3(-aa_n)
    p_w = R_wn @ p - R_wn @ t_n
    return se3.exp_so3(aa_r) @ p_w + t_r


def plane2plane_global(pose_r, pose_n, plane_ref_n3, point_a_n, point_b_n):
    """Plane2Plane_Global (base/CostFunction.h:350-426): the camera-LiDAR
    line residual. plane_ref_n3: unit normal of the plane through the image
    line and the camera center, in the reference (camera) frame; point_a/b:
    LiDAR line endpoints in the neighbor (LiDAR) frame. Residual = fold-90
    angle between the image-line plane and the plane spanned by the
    transformed endpoints and the origin. (1,)."""
    a_ref = _transform_pair(pose_r, pose_n, point_a_n)
    b_ref = _transform_pair(pose_r, pose_n, point_b_n)
    n1 = jnp.cross(a_ref, b_ref)
    return plane_angle(plane_ref_n3, n1)[None]


def plane_iou(pose_r, pose_n, ref_plane4, middle_n, middle_ref, half_angle):
    """PlaneIOUResidual (base/CostFunction.h:433-506): hinge on the angular
    offset between the neighbor line's midpoint (projected into the
    reference-line plane) and the reference line's midpoint, beyond the
    reference line's half arc angle. (1,)."""
    m_ref = _transform_pair(pose_r, pose_n, middle_n)
    n = ref_plane4[:3]
    dis = jnp.sum(n * m_ref) + ref_plane4[3]
    m_proj = m_ref - dis * n
    ang = vector_angle(m_proj, middle_ref)
    return jnp.maximum(ang - half_angle, 0.0)[None]


def plane2plane_relative(pose_cl, plane_ref_n3, point_a_l, point_b_l):
    """Plane2Plane_Relative (base/CostFunction.h:294-348): calibration
    variant optimizing only T_cl. (1,)."""
    aa, t = split_pose(pose_cl)
    R = se3.exp_so3(aa)
    a_c = R @ point_a_l + t
    b_c = R @ point_b_l + t
    n1 = jnp.cross(a_c, b_c)
    return plane_angle(plane_ref_n3, n1)[None]


def plane_relative_iou(pose_cl, ref_plane4, middle_l, middle_ref, half_angle):
    """PlaneRelativeIOUResidual (base/CostFunction.h:509-564). (1,)."""
    aa, t = split_pose(pose_cl)
    m_c = se3.exp_so3(aa) @ middle_l + t
    n = ref_plane4[:3]
    dis = jnp.sum(n * m_c) + ref_plane4[3]
    m_proj = m_c - dis * n
    ang = vector_angle(m_proj, middle_ref)
    return jnp.maximum(ang - half_angle, 0.0)[None]


# ----------------------------------------------------------------------------
# pairwise pose-graph residuals (base/CostFunction.h:17-117)
# ----------------------------------------------------------------------------


def pairwise_rotation(aa_1w, aa_2w, aa_21_obs):
    """PairWiseRotationResidual (base/CostFunction.h:17-47): so3 log of the
    rotation cycle (R_2w * R_1w^T) * R_21_obs^T. Params are the two global
    angle-axis rotations (3,) each. (3,)."""
    R_1w = se3.exp_so3(aa_1w)
    R_2w = se3.exp_so3(aa_2w)
    R_21_obs = se3.exp_so3(aa_21_obs)
    cycle = se3.matmul(se3.matmul(R_2w, jnp.swapaxes(R_1w, -1, -2)),
                       jnp.swapaxes(R_21_obs, -1, -2))
    return se3.log_so3(cycle)


def pairwise_translation(t_1w, t_2w, scale, aa_21_obs, t_21_obs_unit):
    """PairWiseTranslationResidual (base/CostFunction.h:51-84):
    residual = t_2w - R_21_obs * t_1w - scale * t_21_obs (unit direction,
    measured R_21 held fixed, per-pair scale optimized). (3,)."""
    R_21 = se3.exp_so3(aa_21_obs)
    return t_2w - R_21 @ t_1w - scale[0] * t_21_obs_unit


def lud(t_w1, t_w2, scale, direction_w):
    """LUD center residual (base/CostFunction.h:89-117 objective):
    e = t_w1 - t_w2 - scale * dir, dir = normalize(R_w2 t_21). (3,).

    Reformulation note: the reference feeds sqrt(sqrt(|e|)) to Ceres to get
    an L1/2-robust norm; that scalar has infinite slope at e = 0 and a
    rank-1 GN block — hostile to any GN-family solver. We return the raw
    3-vector and let the solver's soft-L1/Cauchy loss provide the
    robustness (same M-estimator family, well-behaved Jacobians)."""
    return t_w1 - t_w2 - scale[0] * direction_w


def chordal(t_w1, t_w2, direction_w):
    """ChrodalResidual (base/CostFunction.h:149-176): chordal distance between
    the normalized baseline (C1-C2) and the measured world-frame direction
    of camera 1 seen from camera 2 (1DSfM, ECCV'14). (3,)."""
    base = t_w1 - t_w2
    base = base / (jnp.linalg.norm(base) + 1e-12)
    return base - direction_w


def scale_factor(scale, lower, upper):
    """ScaleFactor (base/CostFunction.h:119-147): hinge penalty keeping an
    optimized scale inside [lower, upper] (soft bound). (1,)."""
    below = jnp.maximum(lower - scale[0], 0.0)
    above = jnp.maximum(scale[0] - upper, 0.0)
    return (below + above).reshape(1)
