"""End-to-end synthetic SfM integration test (no images: descriptors are
synthesized per 3D point, shared across views — isolates the geometry/
matching/averaging/BA pipeline from cv2 SIFT)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScR

from panovlm_tpu.models import rotation_averaging as ra
from panovlm_tpu.models import translation_averaging as ta
from panovlm_tpu.models import sfm
from panovlm_tpu.ops import se3
from panovlm_tpu.utils import tracks as trk

ROWS, COLS = 256, 512
N_FRAMES = 8
N_POINTS = 300


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-4, 4, (N_POINTS, 3)).astype(np.float32)
    pts[:, 1] *= 0.4
    # camera trajectory
    aa = np.cumsum(rng.normal(size=(N_FRAMES, 3)) * 0.02, axis=0).astype(np.float32)
    aa[0] = 0
    C = np.cumsum(rng.normal(size=(N_FRAMES, 3)) * np.array([0.25, 0.05, 0.25]),
                  axis=0).astype(np.float32)
    C[0] = 0
    R = ScR.from_rotvec(aa).as_matrix().astype(np.float32)
    t = -np.einsum("nij,nj->ni", R, C)
    poses_gt = np.concatenate([aa, t], axis=1)  # [aa_cw, t_cw]

    # observations: bearings per frame with per-point shared descriptors
    desc_gt = rng.normal(size=(N_POINTS, 128)).astype(np.float32)
    desc_gt /= np.linalg.norm(desc_gt, axis=1, keepdims=True)
    bearings = np.zeros((N_FRAMES, N_POINTS, 3), np.float32)
    descs = np.zeros((N_FRAMES, N_POINTS, 128), np.float32)
    uv = np.zeros((N_FRAMES, N_POINTS, 2), np.float32)
    fmask = np.ones((N_FRAMES, N_POINTS), bool)
    from panovlm_tpu.ops import spherical
    for i in range(N_FRAMES):
        p_c = pts @ R[i].T + t[i]
        b = p_c / np.linalg.norm(p_c, axis=1, keepdims=True)
        b += rng.normal(size=b.shape) * 5e-4  # ~0.03 deg bearing noise
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        bearings[i] = b
        uv[i] = np.asarray(spherical.cam_to_image(jnp.asarray(b), ROWS, COLS))
        d = desc_gt + rng.normal(size=desc_gt.shape) * 0.01
        descs[i] = d / np.linalg.norm(d, axis=1, keepdims=True)
    return dict(pts=pts, poses_gt=poses_gt, C=C, bearings=bearings,
                descs=descs, uv=uv, fmask=fmask)


@pytest.fixture(scope="module")
def pipeline(scene):
    cfg = sfm.SfMConfig(contiguous_window=4, max_matches=512,
                        ransac_hypotheses=200, min_inliers=30,
                        # synthetic uniform-noise descriptors have no
                        # distance tail; the 0.8*maxdist filter would cut
                        # most true matches
                        match_max_dist_factor=10.0)
    pi, pj = sfm.init_image_pairs(N_FRAMES, cfg)
    matches = sfm.match_all_pairs(jnp.asarray(scene["descs"]),
                                  jnp.asarray(scene["fmask"]), pi, pj, cfg)
    rel = sfm.relative_poses(jnp.asarray(scene["bearings"]),
                             matches["idx"], matches["mask"], pi, pj, cfg)
    return cfg, pi, pj, matches, rel


def test_matching_recovers_identity(pipeline, scene):
    cfg, pi, pj, matches, rel = pipeline
    idx = np.asarray(matches["idx"])
    msk = np.asarray(matches["mask"])
    assert np.asarray(matches["pair_ok"]).all()
    # matched feature indices must be equal (same 3D point id)
    correct = (idx[..., 0] == idx[..., 1]) | ~msk
    assert correct.mean() > 0.99
    assert msk.sum(axis=1).min() > 100


def test_relative_poses_accurate(pipeline, scene):
    cfg, pi, pj, matches, rel = pipeline
    ok = np.asarray(rel["ok"])
    assert ok.all()
    R = ScR.from_rotvec(scene["poses_gt"][:, :3]).as_matrix()
    t = scene["poses_gt"][:, 3:]
    for k in range(len(pi)):
        i, j = int(pi[k]), int(pj[k])
        R_gt = R[j] @ R[i].T
        t_gt = t[j] - R_gt @ t[i]
        t_gt = t_gt / (np.linalg.norm(t_gt) + 1e-12)
        aa_est = np.asarray(rel["rel_aa"][k])
        R_est = ScR.from_rotvec(aa_est).as_matrix()
        ang = np.degrees(np.linalg.norm(
            ScR.from_matrix(R_est @ R_gt.T).as_rotvec()))
        assert ang < 0.5, (k, ang)
        t_est = np.asarray(rel["rel_t"][k])
        if np.dot(t_est, t_gt) < 0:
            t_est = -t_est
        assert np.abs(t_est - t_gt).max() < 0.05, (k, t_est, t_gt)


def test_full_sfm_to_ba(pipeline, scene):
    cfg, pi, pj, matches, rel = pipeline
    ok = np.asarray(rel["ok"])
    rel_aa = np.asarray(rel["rel_aa"])
    rel_t = np.asarray(rel["rel_t"])
    n_inl = np.asarray(rel["n_inliers"])

    keep = sfm.filter_by_triplet(pi, pj, rel_aa, ok)
    keep, frame_valid = sfm.largest_biconnected(pi, pj, keep, N_FRAMES)
    assert frame_valid.all()

    aa_glob, valid, ra_keep = ra.rotation_averaging_l1(
        N_FRAMES, pi[keep], pj[keep], rel_aa[keep], weights=n_inl[keep])

    # metric scales from GT relative translations (the LiDAR-depth path is
    # tested separately): |t_ji|
    R = ScR.from_rotvec(scene["poses_gt"][:, :3]).as_matrix()
    t = scene["poses_gt"][:, 3:]
    scale_gt = np.array([
        np.linalg.norm(t[j] - (R[j] @ R[i].T) @ t[i])
        for i, j in zip(pi[keep], pj[keep])], np.float32)
    t_glob, s = ta.translation_averaging(
        aa_glob, pi[keep], pj[keep], rel_aa[keep], rel_t[keep], scale_gt,
        method="softl1")

    # tracks from matches
    pair_matches = []
    idx = np.asarray(matches["idx"])
    msk = np.asarray(matches["mask"])
    for k in np.where(keep)[0]:
        pair_matches.append((int(pi[k]), int(pj[k]), idx[k][msk[k]]))
    timg, tfeat, tmask = trk.build_tracks(
        pair_matches, [N_POINTS] * N_FRAMES, min_length=cfg.min_track_length)
    assert len(timg) > 200

    poses0 = np.concatenate([aa_glob, t_glob], axis=1).astype(np.float32)
    X, x_ok = sfm.estimate_structure(poses0, scene["bearings"], timg, tfeat,
                                     tmask, cfg)
    assert int(np.asarray(x_ok).sum()) > 150

    poses_ba, pts_ba, info = sfm.global_ba(
        poses0, np.asarray(X), timg, tfeat, tmask, scene["bearings"],
        np.asarray(x_ok), frame_valid, cfg)

    # compare with GT: gauge = frame 0 (both at origin), scale is metric
    poses_fin = sfm.set_to_origin(poses_ba, frame_valid)
    gt_fin = sfm.set_to_origin(scene["poses_gt"], frame_valid)
    rot_err = np.degrees(np.abs(poses_fin[:, :3] - gt_fin[:, :3]).max())
    t_err = np.abs(poses_fin[:, 3:] - gt_fin[:, 3:]).max()
    assert rot_err < 0.5, rot_err
    # global scale is a BA gauge (only one camera is pinned), so the metric
    # error floats slightly around the TA scale anchors
    assert t_err < 0.08, t_err
    # up-to-scale accuracy must be much tighter
    s_opt = (poses_fin[:, 3:] * gt_fin[:, 3:]).sum() / ((poses_fin[:, 3:] ** 2).sum() + 1e-12)
    t_err_scaled = np.abs(poses_fin[:, 3:] * s_opt - gt_fin[:, 3:]).max()
    assert t_err_scaled < 0.02, t_err_scaled


def test_solver_chain_north_star():
    """North-star falsifiability (VERDICT r2 item 5 / r3 item 5): with
    INDEPENDENT per-view pixel noise on the keypoints (no common-mode SIFT
    drift — the documented accuracy ceiling of the rendered-texture e2e,
    PERF.md "Accuracy ceiling"), the full solver chain (pixel -> bearing
    via the production camera model -> matching -> relative poses ->
    triplet/biconnected filters -> L1 rotation averaging -> translation
    averaging -> triangulation -> global BA) must reach <1e-3 rad rotation
    and sub-cm sim3-aligned position error. If the chain itself carried a
    bias, this test — not the correlated-noise e2e — would catch it."""
    import synthetic
    from panovlm_tpu.ops import spherical

    n_frames, n_points = 10, 400
    scene_kp = synthetic.make_independent_noise_scene(
        n_frames=n_frames, n_points=n_points, sigma_px=0.05, seed=11)
    H, W = scene_kp["H"], scene_kp["W"]
    aa = scene_kp["poses_gt"][:, :3]
    t = scene_kp["poses_gt"][:, 3:]
    R = ScR.from_rotvec(aa).as_matrix().astype(np.float32)
    # the production pixel -> unit-bearing path (image_to_cam)
    bearings = np.asarray(spherical.image_to_cam(
        jnp.asarray(scene_kp["uv"]), H, W)).astype(np.float32)
    descs, fmask = scene_kp["descs"], scene_kp["fmask"]

    cfg = sfm.SfMConfig(contiguous_window=4, max_matches=512,
                        ransac_hypotheses=200, min_inliers=30,
                        match_max_dist_factor=10.0)
    pi, pj = sfm.init_image_pairs(n_frames, cfg)
    matches = sfm.match_all_pairs(jnp.asarray(descs), jnp.asarray(fmask),
                                  pi, pj, cfg)
    rel = sfm.relative_poses(jnp.asarray(bearings), matches["idx"],
                             matches["mask"], pi, pj, cfg)
    ok = np.asarray(rel["ok"])
    rel_aa = np.asarray(rel["rel_aa"])
    rel_t = np.asarray(rel["rel_t"])
    n_inl = np.asarray(rel["n_inliers"])
    keep = sfm.filter_by_triplet(pi, pj, rel_aa, ok)
    keep, frame_valid = sfm.largest_biconnected(pi, pj, keep, n_frames)
    assert frame_valid.all()
    aa_glob, valid, ra_keep = ra.rotation_averaging_l1(
        n_frames, pi[keep], pj[keep], rel_aa[keep], weights=n_inl[keep])
    scale_gt = np.array([
        np.linalg.norm(t[j] - (R[j] @ R[i].T) @ t[i])
        for i, j in zip(pi[keep], pj[keep])], np.float32)
    t_glob, s = ta.translation_averaging(
        aa_glob, pi[keep], pj[keep], rel_aa[keep], rel_t[keep], scale_gt,
        method="softl1")
    pair_matches = []
    idx = np.asarray(matches["idx"])
    msk = np.asarray(matches["mask"])
    for k in np.where(keep)[0]:
        pair_matches.append((int(pi[k]), int(pj[k]), idx[k][msk[k]]))
    timg, tfeat, tmask = trk.build_tracks(
        pair_matches, [n_points] * n_frames, min_length=cfg.min_track_length)
    poses0 = np.concatenate([aa_glob, t_glob], axis=1).astype(np.float32)
    X, x_ok = sfm.estimate_structure(poses0, bearings, timg, tfeat,
                                     tmask, cfg)
    poses_ba, pts_ba, info = sfm.global_ba(
        poses0, np.asarray(X), timg, tfeat, tmask, bearings,
        np.asarray(x_ok), frame_valid, cfg, max_iters=40)

    poses_gt = np.concatenate([aa, t], axis=1)
    poses_fin = sfm.set_to_origin(poses_ba, frame_valid)
    gt_fin = sfm.set_to_origin(poses_gt, frame_valid)
    rot_err_rad = np.abs(poses_fin[:, :3] - gt_fin[:, :3]).max()
    assert rot_err_rad < 1e-3, rot_err_rad

    # camera centers, sim3-aligned (BA pins one camera; global scale and
    # gauge come from TA anchors — align them out, then demand sub-cm)
    from panovlm_tpu.utils.gps import umeyama
    R_fin = ScR.from_rotvec(poses_fin[:, :3]).as_matrix()
    C_fin = -np.einsum("nij,ni->nj", R_fin, poses_fin[:, 3:])
    R_g = ScR.from_rotvec(gt_fin[:, :3]).as_matrix()
    C_g = -np.einsum("nij,ni->nj", R_g, gt_fin[:, 3:])
    s_al, R_al, t_al = umeyama(C_fin, C_g)
    resid = C_g - (s_al * C_fin @ R_al.T + t_al)
    pos_err = np.linalg.norm(resid, axis=1).max()
    assert pos_err < 0.01, pos_err
    # and the recovered metric scale itself stays within 1%
    assert abs(s_al - 1.0) < 0.01, s_al
