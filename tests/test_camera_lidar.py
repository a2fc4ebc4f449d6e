import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScR

from panovlm_tpu.models import camera_lidar as cl
from panovlm_tpu.ops import se3

LI_CAP = 32     # image line cap
LS_CAP = 16     # lidar segment cap
P_CAP = 256     # lidar edge point cap


def make_line_scene(rng, n_lines=10, pts_per_line=14):
    """3D segments in world + helpers to render image arcs / lidar features."""
    starts = rng.uniform(-3, 3, (n_lines, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_lines, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    lengths = rng.uniform(1.0, 2.5, n_lines).astype(np.float32)
    ends = starts + dirs * lengths[:, None]
    # keep lines away from the origin (cameras nearby)
    mids = 0.5 * (starts + ends)
    far = np.linalg.norm(mids, axis=1) > 1.5
    starts, ends = starts[far], ends[far]
    return starts, ends


def arcs_from_world_lines(starts, ends, pose_c):
    """Project world segments into a camera -> padded arc dict."""
    R = ScR.from_rotvec(pose_c[:3]).as_matrix().astype(np.float32)
    t = pose_c[3:]
    e1 = starts @ R.T + t
    e2 = ends @ R.T + t
    n = np.cross(e1, e2)
    n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-12
    e1n = e1 / np.linalg.norm(e1, axis=1, keepdims=True)
    e2n = e2 / np.linalg.norm(e2, axis=1, keepdims=True)
    mid = e1n + e2n
    mid /= np.linalg.norm(mid, axis=1, keepdims=True) + 1e-12
    arc = np.arccos(np.clip((e1n * e2n).sum(1), -1, 1))
    L = len(starts)
    out = {"normal": np.zeros((LI_CAP, 3), np.float32),
           "e1": np.zeros((LI_CAP, 3), np.float32),
           "e2": np.zeros((LI_CAP, 3), np.float32),
           "mid": np.zeros((LI_CAP, 3), np.float32),
           "arc": np.zeros((LI_CAP,), np.float32),
           "mask": np.zeros((LI_CAP,), bool)}
    out["normal"][:L] = n
    out["e1"][:L] = e1n
    out["e2"][:L] = e2n
    out["mid"][:L] = mid
    out["arc"][:L] = arc
    out["mask"][:L] = True
    return out


def lidar_feats_from_world_lines(starts, ends, pose_l, rng, pts_per_line=14,
                                 noise=0.003):
    """Sample lidar edge points along world segments, in the lidar frame."""
    R = ScR.from_rotvec(pose_l[:3]).as_matrix().astype(np.float32)
    t = pose_l[3:]
    L = len(starts)
    pts, labels = [], []
    for k in range(L):
        s = np.linspace(0.05, 0.95, pts_per_line)[:, None]
        p_w = starts[k] * (1 - s) + ends[k] * s
        p_l = p_w @ R.T + t + rng.normal(size=(pts_per_line, 3)).astype(np.float32) * noise
        pts.append(p_l)
        labels += [k] * pts_per_line
    pts = np.concatenate(pts).astype(np.float32)
    feats = {
        "less_sharp": np.zeros((P_CAP, 3), np.float32),
        "less_sharp_mask": np.zeros((P_CAP,), bool),
        "point_to_segment": np.full((P_CAP,), -1, np.int32),
        "line_endpoints": np.zeros((LS_CAP, 2, 3), np.float32),
        "line_mask": np.zeros((LS_CAP,), bool),
    }
    n = min(len(pts), P_CAP)
    feats["less_sharp"][:n] = pts[:n]
    feats["less_sharp_mask"][:n] = True
    feats["point_to_segment"][:n] = np.asarray(labels[:n])
    e_l1 = starts @ R.T + t
    e_l2 = ends @ R.T + t
    feats["line_endpoints"][:L, 0] = e_l1
    feats["line_endpoints"][:L, 1] = e_l2
    feats["line_mask"][:L] = True
    return feats


def test_associate_by_angle_exact(rng):
    starts, ends = make_line_scene(rng)
    pose_c = np.zeros(6, np.float32)
    pose_l = np.concatenate([np.array([0.01, -0.02, 0.005]),
                             np.array([0.1, 0.05, -0.08])]).astype(np.float32)
    arcs = arcs_from_world_lines(starts, ends, pose_c)
    feats = lidar_feats_from_world_lines(starts, ends, pose_l, rng)
    R_cl, t_cl = cl.relative_cl(jnp.asarray(pose_c), jnp.asarray(pose_l))
    out = cl.associate_by_angle_pair(
        {k: jnp.asarray(v) for k, v in arcs.items()},
        {k: jnp.asarray(v) for k, v in feats.items()}, R_cl, t_cl)
    m = np.asarray(out["mask"])
    L = len(starts)
    assert m[:L].sum() >= L - 1, m[:L]
    # each accepted lidar segment k matches image line k (same world line)
    il = np.asarray(out["img_line"])
    assert (il[:L][m[:L]] == np.nonzero(m[:L])[0]).all()


def test_associate_rejects_wrong_pose(rng):
    starts, ends = make_line_scene(rng)
    pose_c = np.zeros(6, np.float32)
    pose_l = np.zeros(6, np.float32)
    arcs = arcs_from_world_lines(starts, ends, pose_c)
    feats = lidar_feats_from_world_lines(starts, ends, pose_l, rng)
    # grossly wrong extrinsic: most associations must disappear
    R_bad = jnp.asarray(ScR.from_rotvec([0.4, 0.3, -0.5]).as_matrix(), jnp.float32)
    out = cl.associate_by_angle_pair(
        {k: jnp.asarray(v) for k, v in arcs.items()},
        {k: jnp.asarray(v) for k, v in feats.items()},
        R_bad, jnp.asarray([0.5, -0.4, 0.3]))
    assert np.asarray(out["mask"]).sum() <= 2


def test_calibrate_recovers_extrinsic(rng):
    starts, ends = make_line_scene(rng, n_lines=14)
    pose_c = np.zeros(6, np.float32)
    pose_l = np.zeros(6, np.float32)
    arcs = arcs_from_world_lines(starts, ends, pose_c)
    feats = lidar_feats_from_world_lines(starts, ends, pose_l, rng, noise=0.001)
    # true T_cl = identity; start from a perturbed guess
    T0 = np.eye(4)
    T0[:3, :3] = ScR.from_rotvec([0.02, -0.015, 0.01]).as_matrix()
    T0[:3, 3] = [0.03, -0.02, 0.04]
    T, info = cl.calibrate({k: jnp.asarray(v) for k, v in arcs.items()},
                           {k: jnp.asarray(v) for k, v in feats.items()}, T0)
    rot_err = np.degrees(np.linalg.norm(ScR.from_matrix(T[:3, :3]).as_rotvec()))
    assert rot_err < 0.2, rot_err
    # note: line-to-plane constraints weakly observe translation along lines;
    # the reference relies on many lines in general position
    assert np.abs(T[:3, 3]).max() < 0.04, T[:3, 3]


def make_joint_scene(rng):
    """Shared joint-optimize fixture: GT cam/lidar trajectories, line arcs,
    lidar features, point tracks, and a perturbed lidar init. Also used by
    test_parallel.py's sharded-vs-single production-path check."""
    starts, ends = make_line_scene(rng, n_lines=14)
    n_cam, n_lid = 3, 3
    cam_gt = np.zeros((n_cam, 6), np.float32)
    cam_gt[:, 3] = np.arange(n_cam) * 0.2
    lid_gt = np.zeros((n_lid, 6), np.float32)
    lid_gt[:, 3] = np.arange(n_lid) * 0.2 + 0.05

    arc_list = [arcs_from_world_lines(starts, ends, cam_gt[i]) for i in range(n_cam)]
    arc_batch = {k: jnp.asarray(np.stack([a[k] for a in arc_list]))
                 for k in arc_list[0]}
    feats_list = [lidar_feats_from_world_lines(starts, ends, lid_gt[i], rng)
                  for i in range(n_lid)]
    lidar_batch = {k: jnp.asarray(np.stack([f[k] for f in feats_list]))
                   for k in feats_list[0]}
    # minimal lidar ScanFeatures keys needed by the lidar-lidar association
    Z = np.zeros
    n_pts = 128
    for k, shape in [("flat", (n_lid, 64, 3)), ("flat_mask", (n_lid, 64)),
                     ("flat_ground", (n_lid, 64)), ("flat_row", (n_lid, 64)),
                     ("less_flat", (n_lid, 128, 3)), ("less_flat_mask", (n_lid, 128)),
                     ("less_flat_ground", (n_lid, 128)), ("less_flat_row", (n_lid, 128)),
                     ("less_sharp_row", (n_lid, P_CAP)),
                     ("line_points", (n_lid, LS_CAP, 3)),
                     ("line_dirs", (n_lid, LS_CAP, 3)),
                     ("sharp", (n_lid, 16, 3)), ("sharp_mask", (n_lid, 16))]:
        if k not in lidar_batch:
            dt = bool if k.endswith("mask") or k.endswith("ground") else (
                np.int32 if k.endswith("row") else np.float32)
            lidar_batch[k] = jnp.asarray(Z(shape, dt))

    # camera tracks: a handful of world points
    pts3d = rng.uniform(-3, 3, (60, 3)).astype(np.float32)
    pts3d[np.linalg.norm(pts3d, axis=1) < 1.0] += 2.0
    bearings = np.zeros((n_cam, 60, 3), np.float32)
    for i in range(n_cam):
        R = ScR.from_rotvec(cam_gt[i, :3]).as_matrix()
        pc = pts3d @ R.T + cam_gt[i, 3:]
        bearings[i] = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    timg = np.tile(np.arange(n_cam), (60, 1)).astype(np.int32)
    tfeat = np.tile(np.arange(60)[:, None], (1, n_cam)).astype(np.int32)
    tmask = np.ones((60, n_cam), bool)

    lid0 = lid_gt.copy()
    lid0[:, :3] += rng.normal(size=(n_lid, 3)).astype(np.float32) * 0.01
    lid0[:, 3:] += rng.normal(size=(n_lid, 3)).astype(np.float32) * 0.03
    return dict(arc_batch=arc_batch, lidar_batch=lidar_batch, cam_gt=cam_gt,
                lid_gt=lid_gt, lid0=lid0, timg=timg, tfeat=tfeat,
                tmask=tmask, bearings=bearings, pts3d=pts3d)


def test_joint_optimize_improves_lidar_poses(rng):
    s = make_joint_scene(rng)
    cfg = cl.JointConfig(num_iteration_joint=2, lidar_weight=0.01,
                         camera_lidar_weight=5.0)
    cam_out, lid_out, pts_out, infos = cl.joint_optimize(
        s["arc_batch"], s["lidar_batch"], s["cam_gt"], s["lid0"], s["timg"],
        s["tfeat"], s["tmask"], s["bearings"], s["pts3d"],
        np.ones(60, bool), cfg)
    lid_out = np.asarray(lid_out)
    err0 = np.abs(s["lid0"] - s["lid_gt"]).max()
    err1 = np.abs(lid_out - s["lid_gt"]).max()
    assert err1 < err0 * 0.5, (err0, err1)


def test_joint_optimize_with_track_masks(rng):
    """use_image_track / use_lidar_track (AssociateLineMulti flags +
    Image/LidarMaskByTrack): gating must run end-to-end and still converge
    on the synthetic line scene (tracked lines survive the masks here)."""
    starts, ends = make_line_scene(rng, n_lines=14)
    n_cam, n_lid = 3, 3
    cam_gt = np.zeros((n_cam, 6), np.float32)
    cam_gt[:, 3] = np.arange(n_cam) * 0.2
    lid_gt = np.zeros((n_lid, 6), np.float32)
    lid_gt[:, 3] = np.arange(n_lid) * 0.2 + 0.05

    arc_list = [arcs_from_world_lines(starts, ends, cam_gt[i]) for i in range(n_cam)]
    arc_batch = {k: jnp.asarray(np.stack([a[k] for a in arc_list]))
                 for k in arc_list[0]}
    feats_list = [lidar_feats_from_world_lines(starts, ends, lid_gt[i], rng)
                  for i in range(n_lid)]
    lidar_batch = {k: jnp.asarray(np.stack([f[k] for f in feats_list]))
                   for k in feats_list[0]}
    Z = np.zeros
    for k, shape in [("flat", (n_lid, 64, 3)), ("flat_mask", (n_lid, 64)),
                     ("flat_ground", (n_lid, 64)), ("flat_row", (n_lid, 64)),
                     ("less_flat", (n_lid, 128, 3)), ("less_flat_mask", (n_lid, 128)),
                     ("less_flat_ground", (n_lid, 128)), ("less_flat_row", (n_lid, 128)),
                     ("less_sharp_row", (n_lid, P_CAP)),
                     ("line_points", (n_lid, LS_CAP, 3)),
                     ("line_dirs", (n_lid, LS_CAP, 3)),
                     ("sharp", (n_lid, 16, 3)), ("sharp_mask", (n_lid, 16))]:
        if k not in lidar_batch:
            dt = bool if k.endswith("mask") or k.endswith("ground") else (
                np.int32 if k.endswith("row") else np.float32)
            lidar_batch[k] = jnp.asarray(Z(shape, dt))

    pts3d = rng.uniform(-3, 3, (60, 3)).astype(np.float32)
    pts3d[np.linalg.norm(pts3d, axis=1) < 1.0] += 2.0
    bearings = np.zeros((n_cam, 60, 3), np.float32)
    for i in range(n_cam):
        R = ScR.from_rotvec(cam_gt[i, :3]).as_matrix()
        pc = pts3d @ R.T + cam_gt[i, 3:]
        bearings[i] = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    timg = np.tile(np.arange(n_cam), (60, 1)).astype(np.int32)
    tfeat = np.tile(np.arange(60)[:, None], (1, n_cam)).astype(np.int32)
    tmask = np.ones((60, n_cam), bool)

    lid0 = lid_gt.copy()
    lid0[:, :3] += rng.normal(size=(n_lid, 3)).astype(np.float32) * 0.01
    lid0[:, 3:] += rng.normal(size=(n_lid, 3)).astype(np.float32) * 0.03

    cfg = cl.JointConfig(num_iteration_joint=1, lidar_weight=0.01,
                         camera_lidar_weight=5.0, use_image_track=True,
                         min_track_length=2)
    cam_out, lid_out, pts_out, infos = cl.joint_optimize(
        arc_batch, lidar_batch, cam_gt, lid0, timg, tfeat, tmask,
        bearings, pts3d, np.ones(60, bool), cfg)
    lid_out = np.asarray(lid_out)
    err0 = np.abs(lid0 - lid_gt).max()
    err1 = np.abs(lid_out - lid_gt).max()
    assert np.isfinite(lid_out).all()
    # image tracks keep most lines (8/13 here): still converges
    assert err1 < err0 * 0.7, (err0, err1)

    # lidar line tracks: this scene yields no l2l associations, so the gate
    # must mask ALL lidar lines -> no camera-lidar constraints -> no motion.
    cfg2 = cfg._replace(use_lidar_track=True)
    _, lid_out2, _, _ = cl.joint_optimize(
        arc_batch, lidar_batch, cam_gt, lid0, timg, tfeat, tmask,
        bearings, pts3d, np.ones(60, bool), cfg2)
    np.testing.assert_allclose(np.asarray(lid_out2), lid0, atol=1e-6)


def test_perturb_calibration_search(rng):
    """AssociateRandomDisturbance grid search: starting from a rotated-off
    extrinsic, the 3^6 sweep must move T_cl toward the truth (more pairs)."""
    starts, ends = make_line_scene(rng, n_lines=14)
    pose = np.zeros(6, np.float32)
    arcs = arcs_from_world_lines(starts, ends, pose)
    arcs = {k: jnp.asarray(v) for k, v in arcs.items()}
    feats = lidar_feats_from_world_lines(starts, ends, pose, rng)
    feats = {k: jnp.asarray(v) for k, v in feats.items()}

    T0 = np.eye(4)
    T0[:3, :3] = ScR.from_euler("xyz", [1.2, -0.9, 0.7], degrees=True).as_matrix()
    T0[:3, 3] = [0.06, -0.04, 0.05]

    from panovlm_tpu.models.camera_lidar import (associate_by_angle_pair,
                                                 perturb_calibration_search)
    n0 = int(np.asarray(associate_by_angle_pair(
        arcs, feats, jnp.asarray(T0[:3, :3], jnp.float32),
        jnp.asarray(T0[:3, 3], jnp.float32))["mask"]).sum())
    T, n_best = perturb_calibration_search(arcs, feats, T0, max_iterations=8)
    assert n_best >= n0, (n0, n_best)
    # rotation must move toward identity (the truth)
    ang0 = np.degrees(np.arccos(np.clip((np.trace(T0[:3, :3]) - 1) / 2, -1, 1)))
    ang1 = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3]) - 1) / 2, -1, 1)))
    assert ang1 <= ang0 + 1e-6, (ang0, ang1)


def test_segments_to_arcs_matches_spherical():
    """The host numpy mirror of image_to_cam inside segments_to_arcs must
    match ops.spherical exactly (it exists to avoid per-image recompiles
    from varying segment counts)."""
    import jax.numpy as jnp
    from panovlm_tpu.ops import spherical
    from panovlm_tpu.utils import panorama_line as pl
    rng = np.random.default_rng(7)
    uv = rng.uniform(0, 255, (200, 2)).astype(np.float32)
    a = pl._image_to_cam_np(uv, 256, 512)
    b = np.asarray(spherical.image_to_cam(jnp.asarray(uv), 256, 512))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_camera_lidar_track_associate_votes_and_distributes():
    """AssociateTrack (CameraLidarTrackAssociate.cpp:103-204): a validated
    (image track, lidar track) pair distributes its member lines to every
    (frame, lidar) pair; an under-voted pair is dropped entirely."""
    from panovlm_tpu.models.line_tracks import camera_lidar_track_associate
    P, Ls, Li = 4, 6, 5
    fi = np.array([0, 0, 1, 1], np.int32)   # pairs: (f0,l0),(f0,l1),(f1,l0),(f1,l1)
    li = np.array([0, 1, 0, 1], np.int32)
    mask = np.zeros((P, Ls), bool)
    img_line = np.zeros((P, Ls), np.int32)
    # pair (0,0): lidar seg 2 <-> image line 1  (track pair A, 1 vote)
    mask[0, 2] = True; img_line[0, 2] = 1
    # pair (0,0): lidar seg 4 <-> image line 3  (track pair B, 1 vote)
    mask[0, 4] = True; img_line[0, 4] = 3
    # image tracks: track 0 = {f0:line1, f1:line2} (size 2)
    #               track 1 = {f0:line3} + 4 more frames -> size 5
    img_track = np.full((2, Li), -1, np.int64)
    img_track[0, 1] = 0
    img_track[1, 2] = 0
    img_track[0, 3] = 1
    # lidar tracks: track 0 = {l0:seg2, l1:seg0} (size 2)
    #               track 1 = {l0:seg4} + 4 more -> size 5
    lid_track = np.full((2, Ls), -1, np.int64)
    lid_track[0, 2] = 0
    lid_track[1, 0] = 0
    lid_track[0, 4] = 1
    # inflate track-1 sizes via extra rows (frames/lidars outside pairs)
    img_track = np.vstack([img_track, np.full((3, Li), -1, np.int64)])
    img_track[2, 0] = 1; img_track[2, 1] = 1
    img_track[3, 0] = 1; img_track[4, 0] = 1   # img track 1 size = 5
    lid_track = np.vstack([lid_track, np.full((3, Ls), -1, np.int64)])
    lid_track[2, 0] = 1; lid_track[2, 1] = 1
    lid_track[3, 0] = 1; lid_track[4, 0] = 1   # lidar track 1 size = 5

    out_mask, out_line = camera_lidar_track_associate(
        {"mask": mask, "img_line": img_line}, fi, li, img_track, lid_track)
    # track pair A: votes=1 >= min(2,2)-2=0 -> validated, distributed:
    #   (f0,l0): seg2->line1 (kept), (f0,l1): seg0->line1,
    #   (f1,l0): seg2->line2, (f1,l1): seg0->line2
    assert out_mask[0, 2] and out_line[0, 2] == 1
    assert out_mask[1, 0] and out_line[1, 0] == 1
    assert out_mask[2, 2] and out_line[2, 2] == 2
    assert out_mask[3, 0] and out_line[3, 0] == 2
    # track pair B: votes=1 < min(5,5)-2=3 -> dropped (not redistributed)
    assert not out_mask[0, 4]
    assert out_mask.sum() == 4
