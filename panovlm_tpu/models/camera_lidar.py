"""Camera-LiDAR joint optimization — the reference's joint_optimization
stage and its CALIBRATION mode.

Replaces joint_optimization/CameraLidarOptimizer.{h,cpp} +
CameraLidarLineAssociate.{h,cpp} (reference):

  * associate_by_angle: image 2D line (= great-circle plane through the
    camera center) vs LiDAR 3D line segments. The reference loops image
    lines x LiDAR points with per-point angle tests
    (AssociateByAngle, CameraLidarLineAssociate.cpp:~330-475); here the
    (image line x LiDAR point) angle tests are one dense masked matrix and
    the per-segment vote is a scatter-add — a single fused device program.
    Acceptance mirrors the reference: point votes within 3 deg of the plane
    and inside the arc scope, segment accepted when more than half its
    points vote, gated by plane-plane angle <= 3 deg, projected midpoint
    inside the arc, midpoint off-plane <= 1.5 deg, one-to-one by votes.
  * joint_optimize (MAPPING, CameraLidarOptimizer.cpp:177-298): <=
    num_iteration_joint rounds of re-association + ONE LM problem =
    camera-LiDAR line residuals (Plane2Plane_Global + PlaneIOU, weight
    camera_lidar_weight) + camera reprojection (weight camera_weight) +
    LiDAR-LiDAR families (weight lidar_weight); first camera gauge-fixed
    (.cpp:490-491).
  * calibrate (CALIBRATION, .cpp:32-87): single relative pose T_cl from
    Plane2Plane_Relative + PlaneRelativeIOU.
"""

from __future__ import annotations

import logging
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import se3
from ..solver import (LMOptions, ResidualBlock, residuals, solve_lm,
                      solve_lm_chunked)
from . import association, lidar_odometry

log = logging.getLogger("panovlm")

OFF_PLANE_DEG = 3.0        # point voting gate
PLANE_PLANE_DEG = 3.0      # line-pair plane angle gate
MID_OFF_PLANE_DEG = 1.5    # midpoint off-plane gate
ARC_SLACK = 1.1            # arc-scope slack factor


def relative_cl(pose_c, pose_l):
    """T_cl from world poses: p_c = R_cw R_wl p_l + ... = (R, t) applied to
    LiDAR-local points. pose_* = [aa_*w, t_*w]."""
    R_cw = se3.exp_so3(pose_c[..., :3])
    R_lw = se3.exp_so3(pose_l[..., :3])
    R_cl = se3.matmul(R_cw, jnp.swapaxes(R_lw, -1, -2))
    t_cl = pose_c[..., 3:] - se3.einsum("...ij,...j->...i", R_cl, pose_l[..., 3:])
    return R_cl, t_cl


def associate_by_angle_pair(arcs, lidar_feats, R_cl, t_cl):
    """One (image, scan) association. arcs: padded arc dict (normal/e1/e2/
    mid/arc/mask, caps Li). lidar_feats: per-scan feature dict (less_sharp
    (P,3)+mask+point_to_segment, line_endpoints (Ls,2,3)+line_mask).

    Returns per-LiDAR-segment association (fixed Ls shapes): mask, img_line
    (Ls,), endpoints_l (Ls,2,3), votes."""
    n_img = arcs["normal"]           # (Li,3) camera frame
    Li = n_img.shape[0]
    pts_l = lidar_feats["less_sharp"]          # (P,3) lidar frame
    pmask = lidar_feats["less_sharp_mask"]
    seg = jnp.clip(lidar_feats["point_to_segment"], 0)
    seg_valid = lidar_feats["point_to_segment"] >= 0
    ends = lidar_feats["line_endpoints"]       # (Ls,2,3)
    lmask = lidar_feats["line_mask"]
    Ls = ends.shape[0]

    p_c = pts_l @ R_cl.T + t_cl                # (P,3) camera frame
    p_n = p_c / (jnp.linalg.norm(p_c, axis=1, keepdims=True) + 1e-12)

    # off-plane angle: |asin(n . p)| (n unit, p unit)
    ndp = se3.einsum("lk,pk->lp", n_img, p_n)
    off_plane = jnp.degrees(jnp.abs(jnp.arcsin(jnp.clip(ndp, -1, 1))))
    # arc scope: angle between in-plane projection and mid <= arc/2 * slack
    proj = p_n[None, :, :] - ndp[..., None] * n_img[:, None, :]
    proj = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-12)
    cos_mid = se3.einsum("lpk,lk->lp", proj, arcs["mid"])
    in_arc = jnp.arccos(jnp.clip(cos_mid, -1, 1)) <= \
        (arcs["arc"][:, None] / 2) * ARC_SLACK
    vote = ((off_plane <= OFF_PLANE_DEG) & in_arc
            & pmask[None, :] & seg_valid[None, :] & arcs["mask"][:, None])

    # votes per (image line, lidar segment)
    votes = jnp.zeros((Li, Ls), jnp.int32).at[:, seg].add(
        vote.astype(jnp.int32))
    seg_size = jnp.zeros((Ls,), jnp.int32).at[seg].add(
        (pmask & seg_valid).astype(jnp.int32))
    majority = votes * 2 > seg_size[None, :]

    # segment-level gates
    e_c = jnp.einsum("sek,ik->sei", ends, R_cl) + t_cl  # (Ls,2,3) camera
    n_lidar = jnp.cross(e_c[:, 0], e_c[:, 1])
    n_lidar = n_lidar / (jnp.linalg.norm(n_lidar, axis=1, keepdims=True) + 1e-12)
    pp_cos = jnp.abs(se3.einsum("lk,sk->ls", n_img, n_lidar))
    pp_ok = jnp.degrees(jnp.arccos(jnp.clip(pp_cos, -1, 1))) <= PLANE_PLANE_DEG
    m_c = 0.5 * (e_c[:, 0] + e_c[:, 1])
    m_n = m_c / (jnp.linalg.norm(m_c, axis=1, keepdims=True) + 1e-12)
    m_ndp = se3.einsum("lk,sk->ls", n_img, m_n)
    mid_off = jnp.degrees(jnp.abs(jnp.arcsin(jnp.clip(m_ndp, -1, 1)))) \
        <= MID_OFF_PLANE_DEG
    m_proj = m_n[None] - m_ndp[..., None] * n_img[:, None, :]
    m_proj = m_proj / (jnp.linalg.norm(m_proj, axis=-1, keepdims=True) + 1e-12)
    m_cos = se3.einsum("lsk,lk->ls", m_proj, arcs["mid"])
    mid_in_arc = jnp.arccos(jnp.clip(m_cos, -1, 1)) <= \
        (arcs["arc"][:, None] / 2) * ARC_SLACK

    ok = (majority & pp_ok & mid_off & mid_in_arc
          & lmask[None, :] & arcs["mask"][:, None])
    votes = jnp.where(ok, votes, 0)
    # one-to-one: for each lidar segment its best image line, and it must
    # win that image line's column
    best_img = jnp.argmax(votes, axis=0)       # (Ls,)
    best_v = jnp.max(votes, axis=0)
    col_best = jnp.argmax(votes, axis=1)       # (Li,) best segment per line
    accept = (best_v > 0) & (col_best[best_img] == jnp.arange(Ls))
    return {"mask": accept, "img_line": best_img.astype(jnp.int32),
            "endpoints_l": ends, "votes": best_v}


class JointConfig(NamedTuple):
    num_iteration_joint: int = 1
    neighbor_size_joint: int = 3
    camera_weight: float = 1.0
    lidar_weight: float = 1.0
    camera_lidar_weight: float = 1.0
    angle_residual: bool = True
    normalize_distance: bool = True
    ba_huber_deg: float = 4.0
    max_lm_iters: int = 30
    # restrict line association to lines on multi-view tracks
    # (AssociateLineMulti use_lidar_track / use_image_track flags +
    # LidarMaskByTrack / ImageMaskByTrack, CameraLidarOptimizer.cpp:331-671)
    use_image_track: bool = False
    use_lidar_track: bool = False
    min_track_length: int = 3
    # vote (image track, lidar track) pairs and redistribute validated
    # tracks' member lines to every pair (AssociateTrack,
    # CameraLidarTrackAssociate.cpp:103-204); needs both track kinds on
    use_track_associate: bool = False


def _field(batch, name):
    """Field access for either a ScanFeatures NamedTuple or a plain dict."""
    return getattr(batch, name) if hasattr(batch, name) else batch[name]


def _cl_pairs(n_frames, n_lidars, k):
    """Each image associates with its k temporal LiDAR neighbors
    (AssociateLineMulti, CameraLidarOptimizer.cpp:331-384)."""
    fi, li = [], []
    for f in range(n_frames):
        for d in range(-k // 2, k // 2 + 1):
            l = f + d
            if 0 <= l < n_lidars:
                fi.append(f)
                li.append(l)
    return np.asarray(fi, np.int32), np.asarray(li, np.int32)


def associate_all_cl(arc_batch, lidar_batch, cam_poses, lidar_poses, fi, li):
    """Associate every (frame, scan) pair. arc_batch: stacked arc dicts with
    frame axis; lidar_batch: stacked ScanFeatures dict."""

    @jax.jit
    def run(arc_batch, lidar_batch, cam_poses, lidar_poses, fi, li):
        def one(pair):
            f, l = pair
            arcs = jax.tree_util.tree_map(lambda a: a[f], arc_batch)
            feats = jax.tree_util.tree_map(lambda a: a[l], lidar_batch)
            R_cl, t_cl = relative_cl(cam_poses[f], lidar_poses[l])
            return associate_by_angle_pair(arcs, feats, R_cl, t_cl)
        return jax.lax.map(one, (fi, li), batch_size=8)

    return run(arc_batch, lidar_batch, cam_poses, lidar_poses,
               jnp.asarray(fi), jnp.asarray(li))


def build_cl_blocks(cl_assoc, arc_batch, fi, li, weight,
                    cam_group="cam", lidar_group="lidar"):
    """Camera-LiDAR residual blocks (AddCameraLidarResidual,
    util/Optimization.cpp:564-607): Plane2Plane_Global + PlaneIOU per
    accepted line pair, Huber(2 deg)."""
    P, Ls = np.asarray(cl_assoc["mask"]).shape
    f_flat = jnp.repeat(jnp.asarray(fi), Ls)
    l_flat = jnp.repeat(jnp.asarray(li), Ls)
    mask = cl_assoc["mask"].ravel()
    img_line = cl_assoc["img_line"]            # (P, Ls)
    # gather image arc data per association
    n_img = jnp.take_along_axis(
        arc_batch["normal"][jnp.asarray(fi)], img_line[..., None], axis=1)
    mid_img = jnp.take_along_axis(
        arc_batch["mid"][jnp.asarray(fi)], img_line[..., None], axis=1)
    arc_img = jnp.take_along_axis(
        arc_batch["arc"][jnp.asarray(fi)], img_line, axis=1)
    ends = cl_assoc["endpoints_l"]             # (P, Ls, 2, 3)
    mids_l = 0.5 * (ends[..., 0, :] + ends[..., 1, :])

    plane4 = jnp.concatenate([n_img, jnp.zeros(n_img.shape[:-1] + (1,))],
                             axis=-1)
    w = jnp.full((P * Ls,), weight, jnp.float32)
    blocks = (
        ResidualBlock(
            residuals.plane2plane_global, (cam_group, lidar_group),
            (f_flat, l_flat),
            (n_img.reshape(-1, 3), ends[..., 0, :].reshape(-1, 3),
             ends[..., 1, :].reshape(-1, 3)),
            w, mask, loss="huber", loss_scale=float(np.radians(2.0)),
            name="plane2plane"),
        ResidualBlock(
            residuals.plane_iou, (cam_group, lidar_group),
            (f_flat, l_flat),
            (plane4.reshape(-1, 4), mids_l.reshape(-1, 3),
             mid_img.reshape(-1, 3), arc_img.reshape(-1) / 2.0),
            w, mask, loss="huber", loss_scale=float(np.radians(2.0)),
            name="plane_iou"),
    )
    return blocks


def joint_optimize(arc_batch, lidar_batch, cam_poses0, lidar_poses0,
                   track_img, track_feat, track_mask, bearings, points0,
                   point_ok, cfg: JointConfig = JointConfig(),
                   lidar_valid=None, grays=None, mesh=None):
    """JointOptimize MAPPING mode (CameraLidarOptimizer.cpp:177-298).

    grays: optional per-frame grayscale images; when given, image-line
    track matches are filtered by LK optical flow (MatchPanoramaLine,
    PanoramaLineMatch.cpp:48-118). mesh: optional device mesh — shards
    the solve's observation axes over the attached chips."""
    n_frames = len(np.asarray(cam_poses0))
    n_lidars = len(np.asarray(lidar_poses0))
    if lidar_valid is None:
        lidar_valid = np.ones(n_lidars, bool)
    cam_poses = jnp.asarray(cam_poses0, jnp.float32)
    lidar_poses = jnp.asarray(lidar_poses0, jnp.float32)
    points = jnp.asarray(points0, jnp.float32)

    fi, li = _cl_pairs(n_frames, n_lidars, cfg.neighbor_size_joint)

    # camera reprojection block data (fixed across rounds)
    T, L = track_img.shape
    obs_t = np.repeat(np.arange(T), L)
    obs_img = np.asarray(track_img).ravel()
    obs_mask = np.asarray(track_mask).ravel() & np.asarray(point_ok)[obs_t]
    b_obs = np.asarray(bearings)[obs_img, np.asarray(track_feat).ravel()]
    cam_block = ResidualBlock(
        residuals.reproj_chordal, ("cam", "pts"),
        (jnp.asarray(obs_img, jnp.int32), jnp.asarray(obs_t, jnp.int32)),
        (jnp.asarray(b_obs),),
        jnp.full((len(obs_img),), cfg.camera_weight, jnp.float32),
        jnp.asarray(obs_mask),
        loss="huber", loss_scale=float(np.radians(cfg.ba_huber_deg)),
        name="cam_reproj")

    fixed = {
        "cam": jnp.asarray(np.eye(1, n_frames, 0, dtype=bool).T
                           .repeat(6, axis=1)),  # first camera fixed
        "lidar": jnp.zeros((n_lidars, 6), bool),
        "pts": jnp.asarray(~np.asarray(point_ok))[:, None].repeat(3, 1),
    }

    infos = []
    for it in range(cfg.num_iteration_joint):
        # lidar-lidar families (also feed the lidar line tracks)
        pr, pn = association.find_neighbors(lidar_poses, lidar_valid)
        pair_r, pair_n, pair_valid = lidar_odometry._pad_pairs(pr, pn)
        l_assoc = association.associate_all_pairs(
            lidar_batch, lidar_poses, pair_r, pair_n)

        ab, lb = arc_batch, lidar_batch
        if cfg.use_image_track:
            from .line_tracks import image_line_tracks
            tid_img = image_line_tracks(
                {k: np.asarray(v) for k, v in arc_batch.items()},
                cam_poses, window=cfg.neighbor_size_joint,
                min_length=cfg.min_track_length, grays=grays)
            ab = dict(arc_batch)
            gated = np.asarray(arc_batch["mask"]) & (tid_img >= 0)
            log.info("image track gate: %d of %d lines survive",
                     int(gated.sum()), int(np.asarray(arc_batch["mask"]).sum()))
            ab["mask"] = jnp.asarray(gated)
        if cfg.use_lidar_track:
            from .line_tracks import lidar_line_tracks
            n_lines = np.asarray(_field(lidar_batch, "line_mask")).shape[1]
            tid_l = lidar_line_tracks(l_assoc["l2l"], pair_r, pair_n,
                                      n_lidars, n_lines,
                                      min_length=cfg.min_track_length)
            lm_np = np.asarray(_field(lidar_batch, "line_mask")) & (tid_l >= 0)
            log.info("lidar track gate: %d of %d lines survive",
                     int(lm_np.sum()),
                     int(np.asarray(_field(lidar_batch, "line_mask")).sum()))
            lm = jnp.asarray(lm_np)
            lb = (lidar_batch._replace(line_mask=lm)
                  if hasattr(lidar_batch, "_replace")
                  else {**lidar_batch, "line_mask": lm})

        cl_assoc = associate_all_cl(ab, lb, cam_poses, lidar_poses, fi, li)
        if (cfg.use_track_associate and cfg.use_image_track
                and cfg.use_lidar_track):
            from .line_tracks import camera_lidar_track_associate
            m2, l2 = camera_lidar_track_associate(
                cl_assoc, fi, li, tid_img, tid_l)
            log.info("track associate: %d -> %d line pairs",
                     int(np.asarray(cl_assoc["mask"]).sum()), int(m2.sum()))
            cl_assoc = dict(cl_assoc, mask=jnp.asarray(m2),
                            img_line=jnp.asarray(l2))
        cl_blocks = build_cl_blocks(cl_assoc, ab, fi, li,
                                    cfg.camera_lidar_weight)
        l_blocks = lidar_odometry.build_blocks(
            l_assoc, pair_r, pair_n, pair_valid,
            angle_residual=cfg.angle_residual,
            normalize_distance=cfg.normalize_distance,
            weight=cfg.lidar_weight, group="lidar")

        groups = {"cam": cam_poses, "lidar": lidar_poses, "pts": points}
        all_blocks = cl_blocks + (cam_block,) + l_blocks
        opts = LMOptions(max_iters=cfg.max_lm_iters)
        fx = fixed
        if mesh is not None:
            # multi-chip: shard every residual family's observation axis
            # over the data mesh (SURVEY.md §2.8 / §5.7) and solve
            # matrix-free — JtJ/Jtr contractions psum over ICI. The Schur
            # scan is a single-chip program (its track-chunked scan would
            # serialize a sharded leading axis), so the sharded path takes
            # the PCG tier instead.
            from ..parallel import replicated, shard_blocks
            all_blocks = shard_blocks(all_blocks, mesh)
            groups = {k: replicated(v, mesh) for k, v in groups.items()}
            fx = {k: replicated(v, mesh) for k, v in fixed.items()}
            opts = opts._replace(obs_chunk=None, jac_chunk=None)
            spec, reasm = None, None
        else:
            # short/long track buckets: the padded (T, L) layout is sized
            # by the longest track; bucketing cuts the Schur passes' dead
            # slots (Room-454: L=213, mean length ~19)
            from ..solver import bucket_schur_points
            groups, all_blocks, fx, spec, reasm = bucket_schur_points(
                groups, all_blocks, fx, track_mask, "pts")
        # program-duration bound: the axon remote worker kills single
        # device programs that run multiple minutes; at Room-454 obs
        # counts one LM iteration is already a long program, so dispatch
        # one iteration per program there (identical trajectory)
        n_obs = sum(int(b.mask.shape[0]) for b in all_blocks)
        out, info = solve_lm_chunked(groups, all_blocks, fx, opts,
                                     chunk=5 if n_obs < 1_500_000 else 1,
                                     schur=spec)
        cam_poses, lidar_poses = out["cam"], out["lidar"]
        points = jnp.asarray(reasm(out)) if reasm is not None else out["pts"]
        infos.append({k: float(v) for k, v in info.items()})
    return cam_poses, lidar_poses, points, infos


def perturb_calibration_search(arcs, lidar_feats, T_cl0,
                               rot_step_deg: float = 0.5,
                               trans_step: float = 0.05,
                               max_iterations: int = 15):
    """Extrinsic grid search (AssociateRandomDisturbance, joint_optimization/
    CameraLidarLineAssociate.cpp:477-622): perturb T_cl over the 3^6 grid of
    {-step, 0, +step} per dof, re-associate under every candidate, and keep
    the one with (most pairs, then lowest mean plane-line misalignment).
    The reference walks the 729 candidates serially; here ONE batched
    program scores all of them (lax.map over candidate extrinsics). When the
    center wins, the step halves; two stalls end the search.

    Returns (T_cl (4,4), n_pairs)."""
    import itertools

    deltas = jnp.asarray(list(itertools.product((-1.0, 0.0, 1.0), repeat=6)),
                         jnp.float32)                        # (729, 6)

    @jax.jit
    def score_all(pose, steps):
        def one(d):
            p = pose + d * steps
            R = se3.exp_so3(p[:3])
            assoc = associate_by_angle_pair(arcs, lidar_feats, R, p[3:])
            n = jnp.sum(assoc["mask"])
            # plane-line misalignment of accepted pairs: the lidar direction
            # must lie in the image line's interpretation plane (angle to the
            # plane normal == 90 deg)
            n_img = jnp.take_along_axis(arcs["normal"],
                                        assoc["img_line"][:, None], axis=0)
            ends = assoc["endpoints_l"]
            dir_l = ends[:, 1] - ends[:, 0]
            dir_c = se3.einsum("ij,lj->li", R, dir_l)
            dir_c = dir_c / (jnp.linalg.norm(dir_c, axis=-1, keepdims=True)
                             + 1e-12)
            mis = jnp.abs(jnp.sum(n_img * dir_c, axis=-1))   # |cos| to normal
            mean_mis = jnp.sum(jnp.where(assoc["mask"], mis, 0.0)) / \
                jnp.maximum(n, 1)
            return n, mean_mis
        return jax.lax.map(one, deltas, batch_size=81)

    R0 = jnp.asarray(T_cl0[:3, :3], jnp.float32)
    pose = np.asarray(jnp.concatenate(
        [se3.log_so3(R0), jnp.asarray(T_cl0[:3, 3], jnp.float32)]))
    steps = np.array([np.radians(rot_step_deg)] * 3 + [trans_step] * 3,
                     np.float32)
    scale = 1.0
    best_n = -1
    for _ in range(max_iterations):
        ns, mis = score_all(jnp.asarray(pose), jnp.asarray(steps * scale))
        ns, mis = np.asarray(ns), np.asarray(mis)
        order = np.lexsort((mis, -ns))     # most pairs, then least misaligned
        k = int(order[0])
        center = int(np.nonzero((np.asarray(deltas) == 0).all(1))[0][0])
        if ns[k] > best_n or (ns[k] == best_n and k != center):
            improved = k != center and ns[k] >= best_n
            best_n = max(best_n, int(ns[k]))
            pose = pose + np.asarray(deltas)[k] * steps * scale
        else:
            improved = False
        if not improved:
            if scale < 1.0:
                break
            scale *= 0.5
    T = np.eye(4)
    T[:3, :3] = np.asarray(se3.exp_so3(jnp.asarray(pose[:3])))
    T[:3, 3] = pose[3:]
    return T, best_n


def calibrate(arcs, lidar_feats, T_cl0, max_iters: int = 30):
    """CALIBRATION mode (CameraLidarOptimizer.cpp:32-87 + :212-232): refine
    a single T_cl from one frame/scan pair's line associations."""
    R0 = jnp.asarray(T_cl0[:3, :3], jnp.float32)
    t0 = jnp.asarray(T_cl0[:3, 3], jnp.float32)
    pose0 = jnp.concatenate([se3.log_so3(R0), t0])

    assoc = associate_by_angle_pair(arcs, lidar_feats, R0, t0)
    Ls = assoc["mask"].shape[0]
    n_img = arc_gather = jnp.take_along_axis(
        arcs["normal"], assoc["img_line"][:, None], axis=0)
    mid_img = jnp.take_along_axis(arcs["mid"], assoc["img_line"][:, None], axis=0)
    arc_img = arcs["arc"][assoc["img_line"]]
    ends = assoc["endpoints_l"]
    mids_l = 0.5 * (ends[:, 0] + ends[:, 1])
    plane4 = jnp.concatenate([n_img, jnp.zeros((Ls, 1))], axis=1)
    w = jnp.ones((Ls,), jnp.float32)
    blocks = (
        ResidualBlock(
            residuals.plane2plane_relative, ("tcl",),
            (jnp.zeros((Ls,), jnp.int32),),
            (n_img, ends[:, 0], ends[:, 1]), w, assoc["mask"],
            loss="huber", loss_scale=float(np.radians(2.0))),
        ResidualBlock(
            residuals.plane_relative_iou, ("tcl",),
            (jnp.zeros((Ls,), jnp.int32),),
            (plane4, mids_l, mid_img, arc_img / 2.0), w, assoc["mask"],
            loss="huber", loss_scale=float(np.radians(2.0))),
    )
    out, info = solve_lm({"tcl": pose0[None]}, blocks, None,
                         LMOptions(max_iters=max_iters))
    pose = np.asarray(out["tcl"][0])
    from scipy.spatial.transform import Rotation as ScR
    T = np.eye(4)
    T[:3, :3] = ScR.from_rotvec(pose[:3]).as_matrix()
    T[:3, 3] = pose[3:]
    return T, info
