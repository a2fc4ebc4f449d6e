import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScR

from panovlm_tpu.models import rotation_averaging as ra
from panovlm_tpu.models import translation_averaging as ta
from panovlm_tpu.ops import triangulate as tri
from panovlm_tpu.utils import tracks as trk


def test_union_find_tracks():
    # 3 images; feature f of img0 matches img1 and img2 -> one track of 3
    matches = [
        (0, 1, np.array([[0, 5], [1, 6]])),
        (1, 2, np.array([[5, 2]])),
        (0, 2, np.array([[3, 9]])),
    ]
    img, feat, mask = trk.build_tracks(matches, [10, 10, 10], min_length=2)
    lens = mask.sum(1)
    assert sorted(lens.tolist()) == [2, 2, 3]
    # the 3-track is (0,0)-(1,5)-(2,2)
    k = int(np.argmax(lens))
    assert img[k].tolist() == [0, 1, 2]
    assert feat[k].tolist() == [0, 5, 2]


def test_tracks_inconsistent_dropped():
    # feature 0 and 1 of img0 both link to img1 feat 5 -> same track sees
    # img0 twice -> dropped
    matches = [(0, 1, np.array([[0, 5], [1, 5]]))]
    img, feat, mask = trk.build_tracks(matches, [4, 8], min_length=2)
    assert mask.sum() == 0


def _pose_graph(rng, n=12, rot_noise=0.01):
    aa_gt = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    aa_gt[0] = 0
    R = ScR.from_rotvec(aa_gt).as_matrix()
    pairs = [(i, i + 1) for i in range(n - 1)]
    pairs += [(i, i + 2) for i in range(n - 2)]
    pairs += [(0, n - 1)]
    pi = np.array([p[0] for p in pairs], np.int32)
    pj = np.array([p[1] for p in pairs], np.int32)
    rel = np.stack([
        ScR.from_matrix(R[j] @ R[i].T).as_rotvec() +
        rng.normal(size=3) * rot_noise
        for i, j in pairs
    ]).astype(np.float32)
    return aa_gt, R, pi, pj, rel


def test_spanning_tree_init(rng):
    aa_gt, R, pi, pj, rel = _pose_graph(rng, rot_noise=0.0)
    aa0, valid = ra.spanning_tree_init(len(aa_gt), pi, pj, rel)
    assert valid.all()
    R0 = ScR.from_rotvec(aa0).as_matrix()
    # up to global gauge: R0 R_gt^T should be constant
    G = np.einsum("nij,nkj->nik", R0, R)
    err = np.abs(G - G[0]).max()
    assert err < 1e-4, err


def test_rotation_averaging_with_outliers(rng):
    aa_gt, R, pi, pj, rel = _pose_graph(rng, n=12, rot_noise=0.005)
    # corrupt the loop-closure measurement badly (|i-j| > 3, so the
    # X84 filter may drop it without the temporal-connectivity exemption)
    rel[len(pi) - 1] += 1.0
    aa, valid, keep = ra.rotation_averaging_l1(len(aa_gt), pi, pj, rel)
    R_est = ScR.from_rotvec(aa).as_matrix()
    # gauge align via frame 0
    G = R_est[0] @ R[0].T
    R_aligned = np.einsum("ij,njk->nik", G.T, R_est)
    err = np.linalg.norm(
        ScR.from_matrix(np.einsum("nij,nkj->nik", R_aligned, R)).as_rotvec(),
        axis=1)
    assert err.max() < 0.025, err.max()


def _translation_graph(rng, n=10, noise=0.0):
    aa = rng.normal(size=(n, 3)).astype(np.float32) * 0.2
    aa[0] = 0
    R = ScR.from_rotvec(aa).as_matrix()
    C = rng.uniform(-3, 3, (n, 3)).astype(np.float32)  # centers
    C[0] = 0
    t = -np.einsum("nij,nj->ni", R, C)  # t_fw
    pairs = [(i, j) for i in range(n) for j in range(i + 1, min(i + 4, n))]
    pi = np.array([p[0] for p in pairs], np.int32)
    pj = np.array([p[1] for p in pairs], np.int32)
    rel_aa = np.stack([ScR.from_matrix(R[j] @ R[i].T).as_rotvec()
                       for i, j in pairs]).astype(np.float32)
    # t_ji = t_j - R_ji t_i ; unit dir + scale
    t_rel = np.stack([t[j] - (R[j] @ R[i].T) @ t[i] for i, j in pairs])
    scale = np.linalg.norm(t_rel, axis=1)
    u = t_rel / scale[:, None]
    if noise:
        u = u + rng.normal(size=u.shape) * noise
        u /= np.linalg.norm(u, axis=1, keepdims=True)
    return aa, t, C, pi, pj, rel_aa, u.astype(np.float32), scale.astype(np.float32)


def align_translations(t_est, t_gt):
    """Align up to global scale (gauge: t[0]=0 already)."""
    num = (t_est * t_gt).sum()
    den = (t_est * t_est).sum() + 1e-12
    return t_est * (num / den)


@pytest.mark.parametrize("method", ["dlt", "softl1", "l2irls", "lud"])
def test_translation_averaging_methods(rng, method):
    aa, t_gt, C, pi, pj, rel_aa, u, scale = _translation_graph(rng, noise=1e-4)
    scales = scale.copy()
    if method in ("lud",):
        scales = np.zeros_like(scale)  # LUD estimates its own scales
    t_est, s = ta.translation_averaging(aa, pi, pj, rel_aa, u, scales,
                                        method=method)
    t_al = align_translations(t_est, t_gt)
    err = np.abs(t_al - t_gt).max() / (np.abs(t_gt).max() + 1e-9)
    assert err < 0.05, (method, err)


def test_translation_averaging_softl1_outliers(rng):
    aa, t_gt, C, pi, pj, rel_aa, u, scale = _translation_graph(rng, noise=1e-4)
    u = u.copy()
    u[3] = np.array([0, 0, 1.0], np.float32)  # corrupt one direction
    t_est, s = ta.translation_averaging(aa, pi, pj, rel_aa, u, scale,
                                        method="softl1")
    t_al = align_translations(t_est, t_gt)
    err = np.abs(t_al - t_gt).max() / np.abs(t_gt).max()
    assert err < 0.1, err


def test_triangulate_rays(rng):
    X_gt = np.array([1.0, -0.5, 3.0], np.float32)
    origins = rng.uniform(-2, 2, (6, 3)).astype(np.float32)
    dirs = X_gt - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    mask = np.ones(6, bool)
    mask[-1] = False
    origins[-1] = 1e3  # garbage, masked
    X, ok = tri.triangulate_rays(jnp.asarray(origins), jnp.asarray(dirs),
                                 jnp.asarray(mask))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(X), X_gt, atol=1e-4)


def test_max_pairwise_angle():
    dirs = jnp.asarray(np.array([[1, 0, 0], [1, 0.02, 0], [0, 1, 0]], np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    a_all = tri.max_pairwise_ray_angle(dirs, jnp.ones(3, bool))
    np.testing.assert_allclose(float(a_all), 90.0, atol=0.5)
    a_two = tri.max_pairwise_ray_angle(dirs, jnp.asarray([True, True, False]))
    assert float(a_two) < 2.0


def test_init_image_pairs_bitmask(rng):
    from panovlm_tpu.models import sfm
    cfg = sfm.SfMConfig(contiguous_window=2)
    # exhaustive short-circuits
    pi, pj = sfm.init_image_pairs(6, cfg, methods=sfm.MATCH_EXHAUSTIVE)
    assert len(pi) == 15 and (pi < pj).all()
    # contiguous window
    pi, pj = sfm.init_image_pairs(6, cfg, methods=sfm.MATCH_CONTIGUOUS)
    assert (pj - pi).max() == 2
    # vlad unioned with contiguous: frames 0 and 5 share an embedding
    emb = np.eye(6, 8, dtype=np.float32)
    emb[5] = emb[0]
    pi, pj = sfm.init_image_pairs(
        6, cfg, embeddings=emb,
        methods=sfm.MATCH_CONTIGUOUS | sfm.MATCH_VLAD)
    assert (0, 5) in set(zip(pi.tolist(), pj.tolist()))
    # gps radius pairing
    g = np.zeros((6, 3))
    g[:, 0] = [0, 100, 200, 0.5, 300, 400]
    pi, pj = sfm.init_image_pairs(6, cfg, gps_xyz=g, methods=sfm.MATCH_GPS)
    s = set(zip(pi.tolist(), pj.tolist()))
    assert (0, 3) in s and (0, 1) not in s
    # gps_vlad: vlad neighbor (0,5) dropped when GPS says they are 400m apart
    pi, pj = sfm.init_image_pairs(
        6, cfg, embeddings=emb, gps_xyz=g, methods=sfm.MATCH_GPS_VLAD)
    assert (0, 5) not in set(zip(pi.tolist(), pj.tolist()))
    # requested source missing its input -> temporal fallback
    pi, pj = sfm.init_image_pairs(6, cfg, methods=sfm.MATCH_VLAD)
    assert len(pi) > 0


def test_read_gps(tmp_path):
    from panovlm_tpu.utils.gps import read_gps
    p = tmp_path / "gps.txt"
    p.write_text("a.jpg 1 2 3\nb.jpg 4 nan 6\n\n7 8 9\n")
    xyz, names = read_gps(str(p))
    assert xyz.shape == (3, 3)
    np.testing.assert_allclose(xyz[0], [1, 2, 3])
    assert np.isinf(xyz[1]).all()
    np.testing.assert_allclose(xyz[2], [7, 8, 9])
    assert names == ["a.jpg", "b.jpg"]


def test_idwm_triangulation(rng):
    """IDWM two-view triangulation (Triangulate2ViewIDWM) recovers points
    and rejects behind-camera configurations via the Eq.(9) test."""
    from panovlm_tpu.ops.triangulate import triangulate_two_view_idwm
    from scipy.spatial.transform import Rotation as ScR
    X = rng.uniform(-2, 2, (200, 3)).astype(np.float32)
    X[:, 2] += 4.0                                 # in front of both cameras
    R_21 = ScR.from_rotvec([0.02, 0.1, -0.03]).as_matrix().astype(np.float32)
    t_21 = np.float32([0.4, 0.05, -0.1])
    b1 = X / np.linalg.norm(X, axis=1, keepdims=True)
    X2 = X @ R_21.T + t_21
    b2 = X2 / np.linalg.norm(X2, axis=1, keepdims=True)
    Xt, ok = triangulate_two_view_idwm(jnp.asarray(R_21), jnp.asarray(t_21),
                                       jnp.asarray(b1), jnp.asarray(b2))
    ok = np.asarray(ok)
    assert ok.mean() > 0.95
    err = np.linalg.norm(np.asarray(Xt)[ok] - X[ok], axis=1)
    assert np.median(err) < 1e-3, np.median(err)
    # behind-camera: flip one bearing -> adequation test must reject
    _, bad = triangulate_two_view_idwm(jnp.asarray(R_21), jnp.asarray(t_21),
                                       jnp.asarray(-b1), jnp.asarray(b2))
    assert np.asarray(bad).mean() < 0.4


def test_track_filters(rng):
    from panovlm_tpu.models import sfm
    from scipy.spatial.transform import Rotation as ScR
    from panovlm_tpu.ops import spherical
    H, W = 256, 512
    n_cam, T = 4, 50
    poses = np.zeros((n_cam, 6), np.float32)
    poses[:, 3] = -np.arange(n_cam) * 0.5          # t_cw = -C, R = I
    X = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    X[:, 2] += 5.0
    X[0] *= 100.0                                   # far outlier point
    timg = np.tile(np.arange(n_cam), (T, 1)).astype(np.int32)
    tmask = np.ones((T, n_cam), bool)
    ok0 = np.ones(T, bool)
    ok = np.asarray(sfm.filter_tracks_too_far(poses, timg, tmask, X, ok0, 8.0))
    assert not ok[0] and ok[1:].mean() > 0.9

    # pixel-residual filter: project GT, perturb one observation by 60 px
    uv = np.zeros((n_cam, T, 2), np.float32)
    for i in range(n_cam):
        p_c = X + poses[i, 3:]
        uv[i] = np.asarray(spherical.cam_to_image(jnp.asarray(p_c), H, W))
    tfeat = np.tile(np.arange(T)[:, None], (1, n_cam)).astype(np.int32)
    uv_obs = np.transpose(uv, (0, 1, 2)).copy()
    uv_obs[2, 5, 0] += 60.0
    ok2 = np.asarray(sfm.filter_tracks_pixel_residual(
        poses, X, timg, tfeat, tmask, uv_obs, ok0, 40.0, H, W))
    assert not ok2[5] and ok2[np.arange(T) != 5].all()


def test_linf_lp_translation_averaging(rng):
    """Exact L-inf LP over triplets recovers translations up to gauge+scale."""
    from scipy.spatial.transform import Rotation as ScR
    from panovlm_tpu.models.translation_averaging import (
        translation_averaging_linf_lp)
    n = 6
    C = rng.uniform(-2, 2, (n, 3)).astype(np.float64)
    C[0] = 0
    aa = rng.normal(size=(n, 3)) * 0.1
    R = ScR.from_rotvec(aa).as_matrix()
    t_fw = -np.einsum("nij,nj->ni", R, C)
    pi, pj = [], []
    for i in range(n):
        for j in range(i + 1, min(i + 4, n)):
            pi.append(i); pj.append(j)
    pi, pj = np.asarray(pi), np.asarray(pj)
    R21 = np.einsum("mij,mkj->mik", R[pj], R[pi])     # R_j R_i^T
    rel_aa = ScR.from_matrix(R21).as_rotvec()
    rel_t = t_fw[pj] - np.einsum("mij,mj->mi", R21, t_fw[pi])
    rel_t /= np.linalg.norm(rel_t, axis=1, keepdims=True)
    t_lp, ok = translation_averaging_linf_lp(
        aa, pi, pj, rel_aa, rel_t, np.ones(len(pi), bool))
    assert ok
    # compare up to global scale (lambda >= 1 sets an arbitrary gauge)
    scale = np.linalg.norm(t_fw[1:]) / (np.linalg.norm(t_lp[1:]) + 1e-12)
    err = np.abs(t_lp * scale - t_fw).max()
    assert err < 1e-3, err
    # no triplets (a chain) -> clean refusal
    pi2 = np.arange(n - 1); pj2 = np.arange(1, n)
    _, ok2 = translation_averaging_linf_lp(
        aa, pi2, pj2, rel_aa[:n - 1], rel_t[:n - 1], np.ones(n - 1, bool))
    assert not ok2


def test_translation_averaging_gps_init(rng):
    """init_translation_GPS path (SfM.cpp:1218-1240): t_init replaces DLT."""
    from scipy.spatial.transform import Rotation as ScR
    from panovlm_tpu.models.translation_averaging import translation_averaging
    from panovlm_tpu.utils.gps import init_translation_gps, scale_from_gps
    n = 6
    C = rng.uniform(-3, 3, (n, 3)); C[0] = 0
    aa = rng.normal(size=(n, 3)) * 0.05
    R = ScR.from_rotvec(aa).as_matrix()
    t_fw = -np.einsum("nij,nj->ni", R, C)
    pi, pj = [], []
    for i in range(n):
        for j in range(i + 1, min(i + 4, n)):
            pi.append(i); pj.append(j)
    pi, pj = np.asarray(pi), np.asarray(pj)
    R21 = np.einsum("mij,mkj->mik", R[pj], R[pi])
    rel_aa = ScR.from_matrix(R21).as_rotvec()
    rel_t = t_fw[pj] - np.einsum("mij,mj->mi", R21, t_fw[pi])
    scales = scale_from_gps(C, pi, pj)
    rel_t = rel_t / np.linalg.norm(rel_t, axis=1, keepdims=True)
    t_init = init_translation_gps(C, aa)
    t, s = translation_averaging(aa, pi, pj, rel_aa, rel_t, scales,
                                 method="softl1", t_init=t_init)
    err = np.abs(t - t_fw).max()
    assert err < 0.02, err


def test_rotation_averaging_l2_method(rng):
    """Method 2 (plain Huber L2, sfm/SfM.h:67) recovers the same global
    rotations as L1 on a clean graph, through the enum dispatch."""
    n = 6
    gt = ScR.random(n, random_state=3)
    aa_gt = gt.as_rotvec().astype(np.float32)
    pi, pj, rel = [], [], []
    for i in range(n):
        for j in range(i + 1, min(i + 3, n)):
            R_ij = (gt[j] * gt[i].inv())
            pi.append(i); pj.append(j)
            rel.append(R_ij.as_rotvec())
    pi, pj = np.asarray(pi), np.asarray(pj)
    rel = np.asarray(rel, np.float32)
    for method in (1, 2):
        aa, valid, _ = ra.rotation_averaging(n, pi, pj, rel, method=method)
        # compare relative rotations (gauge-free)
        R_est = ScR.from_rotvec(aa)
        errs = []
        for k in range(len(pi)):
            R_ij = R_est[pj[k]] * R_est[pi[k]].inv()
            errs.append(np.degrees(np.linalg.norm(
                (R_ij * ScR.from_rotvec(rel[k]).inv()).as_rotvec())))
        assert np.median(errs) < 0.5, (method, np.median(errs))


def test_rotation_averaging_least_square(rng):
    """RotationAveragingLeastSquare (RotationAveraging.cpp:185-275): the
    spectral nullspace solve recovers global rotations up to gauge on a
    noisy connected graph, and camera 0 is gauge-fixed to identity."""
    aa_gt, R, pi, pj, rel = _pose_graph(rng, n=12, rot_noise=0.01)
    aa0, valid = ra.rotation_averaging_least_square(len(aa_gt), pi, pj, rel)
    assert valid.all()
    R0 = ScR.from_rotvec(aa0).as_matrix()
    np.testing.assert_allclose(R0[0], np.eye(3), atol=1e-6)
    G = R0[0] @ R[0].T
    R_aligned = np.einsum("ij,njk->nik", G.T, R0)
    err = np.linalg.norm(
        ScR.from_matrix(np.einsum("nij,nkj->nik", R_aligned, R)).as_rotvec(),
        axis=1)
    assert err.max() < 0.05, err.max()

    # disconnected graph: L2 path must fall back to the spanning tree
    # without blowing up (two components)
    pi2 = np.array([0, 1, 3, 4], np.int32)
    pj2 = np.array([1, 2, 4, 5], np.int32)
    rel2 = np.stack([ScR.from_matrix(R[j] @ R[i].T).as_rotvec()
                     for i, j in zip(pi2, pj2)]).astype(np.float32)
    aa2, valid2, _ = ra.rotation_averaging_l2(6, pi2, pj2, rel2, x84=False)
    assert np.isfinite(aa2).all()


def test_filter_tracks_too_far_chunked_matches(rng):
    """The track-chunked Gram-matrix FilterTracksToFar (the Room-454 HBM
    fix) must agree with itself across chunk sizes, including the padded
    last chunk."""
    from panovlm_tpu.models.sfm import filter_tracks_too_far
    n_f, T, L = 12, 777, 9
    poses = rng.normal(0, 0.5, (n_f, 6)).astype(np.float32)
    timg = rng.integers(0, n_f, (T, L)).astype(np.int32)
    tmask = rng.random((T, L)) < 0.8
    tmask[:, 0] = True
    X = rng.normal(0, 5.0, (T, 3)).astype(np.float32)
    ok = np.ones(T, bool)
    a = np.asarray(filter_tracks_too_far(poses, timg, tmask, X, ok, 8.0,
                                         chunk=10000))
    b = np.asarray(filter_tracks_too_far(poses, timg, tmask, X, ok, 8.0,
                                         chunk=64))
    np.testing.assert_array_equal(a, b)
    assert a.sum() < T  # the filter actually rejects something here


def test_structure_and_pixel_filter_chunked_match(rng):
    """estimate_structure and filter_tracks_pixel_residual must agree
    across chunk sizes (both hit (chunk, L, ...) blocks now — the
    Room-454 loop-trajectory HBM fix where track length L approaches the
    frame count)."""
    from panovlm_tpu.models import sfm
    from panovlm_tpu.ops import spherical
    n_f, n_feat, T, L = 8, 40, 533, 7
    H, W = 128, 256
    poses = np.zeros((n_f, 6), np.float32)
    poses[:, 3:] = rng.normal(0, 0.4, (n_f, 3))
    bearings = rng.normal(size=(n_f, n_feat, 3)).astype(np.float32)
    bearings /= np.linalg.norm(bearings, axis=-1, keepdims=True)
    timg = rng.integers(0, n_f, (T, L)).astype(np.int32)
    tfeat = rng.integers(0, n_feat, (T, L)).astype(np.int32)
    # front-packed masks of varying length >= 2
    lens = rng.integers(2, L + 1, T)
    tmask = np.arange(L)[None, :] < lens[:, None]
    cfg = sfm.SfMConfig()
    Xa, oka = sfm.estimate_structure(poses, bearings, timg, tfeat, tmask,
                                     cfg, chunk=10000)
    Xb, okb = sfm.estimate_structure(poses, bearings, timg, tfeat, tmask,
                                     cfg, chunk=100)
    np.testing.assert_array_equal(np.asarray(oka), np.asarray(okb))
    np.testing.assert_allclose(np.asarray(Xa), np.asarray(Xb), atol=1e-5)

    uv = np.zeros((n_f, n_feat, 2), np.float32)
    for i in range(n_f):
        uv[i] = np.asarray(spherical.cam_to_image(
            jnp.asarray(bearings[i] * 3.0 + poses[i, 3:]), H, W))
    ok0 = np.ones(T, bool)
    X = rng.normal(0, 3.0, (T, 3)).astype(np.float32)
    fa = np.asarray(sfm.filter_tracks_pixel_residual(
        poses, X, timg, tfeat, tmask, uv, ok0, 40.0, H, W, chunk=10000))
    fb = np.asarray(sfm.filter_tracks_pixel_residual(
        poses, X, timg, tfeat, tmask, uv, ok0, 40.0, H, W, chunk=128))
    np.testing.assert_array_equal(fa, fb)
    assert fa.any() and not fa.all()
