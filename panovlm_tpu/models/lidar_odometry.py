"""Multi-scan LiDAR odometry — the reference's init_lidar_pose stage.

Replaces lidar_mapping/LidarOdometry.{h,cpp}: joint refinement of ALL scan
poses at once ("LOAM without sequential tracking"). The reference's
EstimatePose (LidarOdometry.cpp:116-187) runs <= num_iteration_lidar outer
rounds of: find neighbor scans -> kd-tree associations -> one Ceres problem
with point-to-line + line-to-line + point-to-plane residuals over all scans
-> solve (SetOptionsLidar: LM, 20 iterations); early-stops when the cost
drops by <1% (:164-183). Point-to-line residuals only couple consecutive
scans (util/Optimization.cpp:475).

TPU design: features per scan live in fixed-cap arrays (ScanFeatures);
association is dense masked KNN per pair (association.py); the per-round
problem is three ResidualBlocks over the flattened (pair x point) axis and
one on-device LM solve (solver/lm.py). The pair list is padded to a bucket
size so re-association between rounds does not trigger recompilation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3
from ..solver import (LMOptions, ResidualBlock, residuals,
                      solve_lm_chunked)
from . import association


def stack_features(feats_list) -> dict:
    """Stack per-scan ScanFeatures into one batch dict with a scan axis."""
    keys = feats_list[0]._fields
    return {k: jnp.stack([getattr(f, k) for f in feats_list]) for k in keys}


def _pad_pairs(pair_r, pair_n, bucket: int = 64):
    m = len(pair_r)
    cap = max(bucket, ((m + bucket - 1) // bucket) * bucket)
    pr = np.zeros(cap, np.int32)
    pn = np.zeros(cap, np.int32)
    pv = np.zeros(cap, bool)
    pr[:m], pn[:m], pv[:m] = pair_r, pair_n, True
    return jnp.asarray(pr), jnp.asarray(pn), jnp.asarray(pv)


def build_blocks(assoc, pair_r, pair_n, pair_valid, *, angle_residual=True,
                 normalize_distance=True, weight=1.0,
                 point_to_line=True, line_to_line=True, point_to_plane=True,
                 group: str = "poses"):
    """Flatten per-pair association outputs into solver ResidualBlocks.

    Mirrors util/Optimization.cpp residual assembly: Huber(2 deg) for angle
    residuals / Huber(0.2 m) for metric (Optimization.cpp:451-455);
    point-to-line restricted to consecutive scans (:475)."""
    blocks = []
    loss_scale = np.radians(2.0) if angle_residual else 0.2
    M = pair_r.shape[0]

    def flat_idx(x, P):
        return jnp.repeat(x, P)

    if point_to_line:
        p2l = assoc["p2l"]
        P = p2l["mask"].shape[1]
        consecutive = jnp.abs(pair_r - pair_n) <= 1
        mask = (p2l["mask"] & (consecutive & pair_valid)[:, None]).ravel()
        fn = (functools.partial(residuals.point2line_angle,
                                normalize_distance=normalize_distance)
              if angle_residual else residuals.point2line_meter)
        blocks.append(ResidualBlock(
            fn, (group, group),
            (flat_idx(pair_r, P), flat_idx(pair_n, P)),
            (p2l["point"].reshape(-1, 3), p2l["line_pt"].reshape(-1, 3),
             p2l["line_dir"].reshape(-1, 3)),
            jnp.full((M * P,), weight, jnp.float32), mask,
            loss="huber", loss_scale=loss_scale, name="point2line",
            run_length=P))

    if point_to_plane:
        p2p = assoc["p2p"]
        Q = p2p["mask"].shape[1]
        mask = (p2p["mask"] & pair_valid[:, None]).ravel()
        fn = (functools.partial(residuals.point2plane_angle,
                                normalize_distance=normalize_distance)
              if angle_residual else residuals.point2plane_meter)
        blocks.append(ResidualBlock(
            fn, (group, group),
            (flat_idx(pair_r, Q), flat_idx(pair_n, Q)),
            (p2p["point"].reshape(-1, 3), p2p["plane"].reshape(-1, 4)),
            jnp.full((M * Q,), weight, jnp.float32), mask,
            loss="huber", loss_scale=loss_scale, name="point2plane",
            run_length=Q))

    if line_to_line:
        l2l = assoc["l2l"]
        L = l2l["mask"].shape[1]
        mask = (l2l["mask"] & pair_valid[:, None]).ravel()
        blocks.append(ResidualBlock(
            residuals.line2line_angle, (group, group),
            (flat_idx(pair_r, L), flat_idx(pair_n, L)),
            (l2l["dir_r"].reshape(-1, 3), l2l["dir_n"].reshape(-1, 3)),
            jnp.full((M * L,), weight, jnp.float32), mask,
            loss="huber", loss_scale=np.radians(2.0), name="line2line",
            run_length=L))
    return tuple(blocks)


class OdometryConfig(NamedTuple):
    num_iteration_lidar: int = 5      # Config.h num_iteration_lidar
    angle_residual: bool = True
    normalize_distance: bool = True
    point_to_line: bool = True
    line_to_line: bool = True
    point_to_plane: bool = True
    lidar_weight: float = 1.0
    neighbors_k: int = 6
    max_lm_iters: int = 20            # SetOptionsLidar max_num_iterations
    use_line_tracks: bool = True      # gate l2l by LineTracks (len >= 3),
                                      # AddLidarLineToLineResidual2


def _associate_round_sharded(batch, poses, pr, pn, mesh, window: int):
    """One association round with the scan axis sharded over the mesh.

    Temporal-window pairs (|n-r| <= window, both directions) run through the
    ppermute-ring halo program (parallel/halo.py, SURVEY §5.7) — each device
    touches only its own scans plus one window-sized halo block. The few
    remaining pairs (far KNN picks, loop closures) run through the
    replicated per-pair path. The combined observation set equals the
    single-device `associate_all_pairs(find_neighbors(...))` set exactly;
    only the observation ORDER differs.
    """
    from ..parallel import halo, pad_leading_to_multiple
    n_scans = poses.shape[0]
    n_dev = mesh.devices.size
    batch_p = pad_leading_to_multiple(batch, n_dev)
    n_loc = jax.tree_util.tree_leaves(batch_p)[0].shape[0] // n_dev
    window = min(window, n_loc)

    assoc, hpr, hpn, hpv = halo.associate_windowed_sharded(
        batch_p, poses, n_scans=n_scans, window=window, mesh=mesh,
        bidirectional=True)
    # keep only the halo pairs the neighbor graph actually selected
    wanted = set(zip(pr.tolist(), pn.tolist()))
    hpr_np, hpn_np = np.asarray(hpr), np.asarray(hpn)
    member = np.fromiter(
        ((int(a), int(b)) in wanted for a, b in zip(hpr_np, hpn_np)),
        bool, len(hpr_np))
    hpv = jnp.asarray(np.asarray(hpv) & member)

    # pairs beyond the window: replicated per-pair association
    far = np.abs(pr.astype(np.int64) - pn) > window
    if far.any():
        rpr, rpn, rpv = _pad_pairs(pr[far], pn[far])
        assoc_far = association.associate_all_pairs(batch, poses, rpr, rpn)
        assoc = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), assoc, assoc_far)
        hpr = jnp.concatenate([hpr, rpr])
        hpn = jnp.concatenate([hpn, rpn])
        hpv = jnp.concatenate([hpv, rpv])
    # invalid pairs must not feed the line-track builder either
    for fam in assoc.values():
        fam["mask"] = fam["mask"] & hpv[:, None]
    return assoc, hpr, hpn, hpv


def estimate_poses(batch, poses0, valid, cfg: OdometryConfig = OdometryConfig(),
                   mesh=None):
    """EstimatePose (LidarOdometry.cpp:116-187): outer re-association rounds
    around the on-device LM solve. poses0: (N,6) [aa_lw, t_lw]. Returns
    (poses, info_list).

    mesh: when a >1-device jax Mesh is given, each round's temporal-window
    association runs scan-sharded via the halo ring and the LM solve runs
    with its observation axis sharded (JtJ/Jtr reductions -> psum over ICI);
    poses replicate. Same observation set as single-device, so results agree
    to f32 reduction order (tests/test_parallel.py)."""
    use_mesh = mesh is not None and mesh.devices.size > 1
    poses = jnp.asarray(poses0, jnp.float32)
    fixed = np.zeros(poses.shape, bool)
    first_valid = int(np.argmax(np.asarray(valid)))
    fixed[first_valid] = True
    fixed = {"poses": jnp.asarray(fixed)}

    infos = []
    prev_cost = None
    for it in range(cfg.num_iteration_lidar):
        pr, pn = association.find_neighbors(poses, valid, k=cfg.neighbors_k)
        if use_mesh:
            assoc, pair_r, pair_n, pair_valid = _associate_round_sharded(
                batch, poses, pr, pn, mesh, window=max(cfg.neighbors_k // 2, 1))
        else:
            pair_r, pair_n, pair_valid = _pad_pairs(pr, pn)
            assoc = association.associate_all_pairs(batch, poses, pair_r, pair_n)
        if cfg.line_to_line and cfg.use_line_tracks:
            # track-gate line-to-line (LidarLineMatch::GenerateTracks +
            # AddLidarLineToLineResidual2: only lines tracked across >= 3
            # scans constrain rotations)
            from .line_tracks import l2l_track_gate, lidar_line_tracks
            n_scans = poses.shape[0]
            n_lines = batch["line_mask"].shape[1]
            tid = lidar_line_tracks(assoc["l2l"], pair_r, pair_n,
                                    n_scans, n_lines)
            gate = l2l_track_gate(assoc["l2l"], pair_r, pair_n, tid)
            assoc["l2l"]["mask"] = assoc["l2l"]["mask"] & jnp.asarray(gate)
        blocks = build_blocks(
            assoc, pair_r, pair_n, pair_valid,
            angle_residual=cfg.angle_residual,
            normalize_distance=cfg.normalize_distance,
            weight=cfg.lidar_weight,
            point_to_line=cfg.point_to_line,
            line_to_line=cfg.line_to_line,
            point_to_plane=cfg.point_to_plane)
        # chunked: several short device programs instead of one long one
        # (identical LM trajectory; long single programs can trip the
        # remote worker's watchdog)
        opts = LMOptions(max_iters=cfg.max_lm_iters)
        if use_mesh:
            from ..parallel import replicated, shard_blocks
            blocks = shard_blocks(blocks, mesh)
            poses = replicated(poses, mesh)
            fixed = replicated(fixed, mesh)
            # per-device slices are mesh-size smaller; lax.map over a
            # sharded axis would insert per-step collectives
            opts = opts._replace(obs_chunk=None, jac_chunk=None)
        out, info = solve_lm_chunked({"poses": poses}, blocks, fixed,
                                     opts, chunk=5)
        poses = out["poses"]
        cost = float(info["final_cost"])
        infos.append({k: float(v) for k, v in info.items()})
        # early stop: <1% relative cost improvement (LidarOdometry.cpp:164-183)
        if prev_cost is not None and prev_cost > 0 and (prev_cost - cost) / prev_cost < 0.01:
            break
        prev_cost = cost
    return poses, infos


@jax.jit
def undistort_scan(pts, frac, pose_i, pose_next):
    """Per-point slerp undistortion (UndistortLidars, LidarOdometry.cpp:
    189-263): interpolate the scan's world pose between its own and the next
    scan's, then re-express in the scan's own frame."""
    R_i_lw = se3.exp_so3(pose_i[:3])
    R_n_lw = se3.exp_so3(pose_next[:3])
    # world poses T_wl = (R_lw, t_lw)^-1
    R_i_wl, t_i_wl = se3.invert_pose(R_i_lw, pose_i[3:])
    R_n_wl, t_n_wl = se3.invert_pose(R_n_lw, pose_next[3:])
    q_i = se3.matrix_to_quat(R_i_wl)
    q_n = se3.matrix_to_quat(R_n_wl)
    q_t = se3.quat_slerp(q_i[None, :].repeat(len(pts), 0),
                         q_n[None, :].repeat(len(pts), 0), frac[:, None])
    R_t = se3.quat_to_matrix(q_t)
    t_t = (1 - frac)[:, None] * t_i_wl + frac[:, None] * t_n_wl
    p_w = jnp.einsum("nij,nj->ni", R_t, pts) + t_t
    # back to scan i's frame
    return jnp.einsum("ij,nj->ni", R_i_lw, p_w) + pose_i[3:]


def fuse_world(scans_pts, scans_mask, poses):
    """FuseLidar (LidarOdometry.cpp:323-348): accumulate all scans in the
    world frame. Returns (points (sum, 3), mask)."""
    pw = jax.vmap(association.to_world)(poses, scans_pts)
    return pw.reshape(-1, 3), scans_mask.reshape(-1)
