import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panovlm_tpu.models import mvs
from panovlm_tpu.ops import patchmatch, spherical
from panovlm_tpu.ops.patchmatch import PatchMatchConfig

from synthetic import render_panorama

H, W = 128, 256


@pytest.fixture(scope="module")
def views():
    centers = [np.array([0.0, 0.4, 0.0]),      # cam convention, y down
               np.array([0.7, 0.4, 0.2]),
               np.array([-0.5, 0.2, -0.4]),
               np.array([0.2, 0.6, -0.7])]
    grays, depths = [], []
    for c in centers:
        g, d = render_panorama(c, H, W)
        grays.append(g)
        depths.append(d)
    poses = np.zeros((len(centers), 6), np.float32)
    for i, c in enumerate(centers):
        poses[i, 3:] = -c  # R = I -> t_cw = -C
    return dict(grays=np.stack(grays), depths=np.stack(depths), poses=poses)


def test_render_sanity(views):
    d = views["depths"][0]
    assert (d > 0.4).all() and d.max() < 8.0
    g = views["grays"][0]
    assert 0.0 < g.min() and g.max() < 1.2
    assert g.std() > 0.05  # texture present


def test_ncc_cost_prefers_truth(views):
    rays = spherical.pixel_ray_grid(H, W)
    cfg = PatchMatchConfig(ncc_half_window=4, ncc_step=2, max_depth=10.0)
    R_nr, t_nr = mvs.relative_to_neighbors(views["poses"], 0, np.array([1], np.int32))
    d_gt = jnp.asarray(views["depths"][0])
    # normals: true geometry unknown per-pixel; use camera-facing -rays
    n0 = -rays
    c_gt = patchmatch.ncc_cost(jnp.asarray(views["grays"][0]),
                               jnp.asarray(views["grays"][1]), rays,
                               d_gt, n0, R_nr[0], t_nr[0], cfg)
    c_wrong = patchmatch.ncc_cost(jnp.asarray(views["grays"][0]),
                                  jnp.asarray(views["grays"][1]), rays,
                                  d_gt * 1.5, n0, R_nr[0], t_nr[0], cfg)
    # interior band (poles are degenerate for panoramas)
    band = slice(H // 4, 3 * H // 4)
    assert float(jnp.median(c_gt[band])) < float(jnp.median(c_wrong[band])) - 0.05


def test_patchmatch_converges_from_lidar_init(views):
    cfg = mvs.MVSConfig(
        pm=PatchMatchConfig(ncc_half_window=6, ncc_step=2, max_depth=10.0),
        n_iterations=6, n_neighbors=3)
    rays = spherical.pixel_ray_grid(H, W)
    key = jax.random.PRNGKey(0)
    # LiDAR-ish init: GT depth on a sparse grid (every 8th pixel), holes else
    sparse = np.zeros((H, W), np.float32)
    sparse[::8, ::8] = views["depths"][0][::8, ::8]
    d0, n0, fixed = mvs.init_depth_normal(key, rays, jnp.asarray(sparse), cfg)
    nei = np.array([1, 2, 3], np.int32)
    band = slice(H // 4, 3 * H // 4)
    gt = views["depths"][0]
    # pass 1: photometric
    depth, normal, conf = mvs.estimate_depth_map(
        jnp.asarray(views["grays"][0]), jnp.asarray(views["grays"][nei]),
        views["poses"], 0, nei, d0, n0, fixed, cfg)
    rel = np.abs(np.asarray(depth) - gt) / gt
    assert np.median(rel[band]) < 0.08, np.median(rel[band])
    # pass 2: + geometric consistency against (here: GT) neighbor depths
    nd = jnp.asarray(views["depths"][nei])
    depth2, _, conf2 = mvs.estimate_depth_map(
        jnp.asarray(views["grays"][0]), jnp.asarray(views["grays"][nei]),
        views["poses"], 0, nei, depth, normal, fixed, cfg, nei_depths=nd)
    rel2 = np.abs(np.asarray(depth2) - gt) / gt
    assert np.median(rel2[band]) < 0.03, np.median(rel2[band])
    assert (rel2[band] < 0.05).mean() > 0.75, (rel2[band] < 0.05).mean()


def test_remove_small_segments():
    d = np.full((40, 60), 2.0, np.float32)
    d[10:13, 10:13] = 5.0   # 9-pixel outlier island
    out = np.asarray(mvs.remove_small_segments(jnp.asarray(d), 0.01, 50))
    assert (out[10:13, 10:13] == 0).all()
    assert out[0, 0] == 2.0


def test_gap_interpolation():
    d = np.full((20, 30), 3.0, np.float32)
    d[8:10, 12:14] = 0.0
    out = np.asarray(mvs.gap_interpolation(jnp.asarray(d)))
    np.testing.assert_allclose(out[8:10, 12:14], 3.0, atol=1e-5)


def test_filter_and_fuse(views):
    # use ground-truth depths as the per-view estimates: filtering must keep
    # them, fusion must produce points on the room surfaces
    cfg = mvs.MVSConfig(n_neighbors=3)
    depths = jnp.asarray(views["depths"])
    confs = jnp.ones_like(depths) * 0.8
    nei = mvs.select_neighbor_views(views["poses"], 3)
    fd, fc = mvs.filter_depth_maps(depths, confs, views["poses"], nei, cfg)
    band = slice(H // 4, 3 * H // 4)
    kept = np.asarray(fd[0] > 0)[band]
    assert kept.mean() > 0.8, kept.mean()  # occlusion between views costs some support
    rel = np.abs(np.asarray(fd[0]) - views["depths"][0]) / views["depths"][0]
    assert np.median(rel[band][kept]) < 0.02

    pts, cols, msk = mvs.fuse_depth_maps(fd, fc, views["grays"], views["poses"], cfg)
    p = np.asarray(pts)[np.asarray(msk)]
    assert len(p) > 3000
    # points on the room walls: |x|<=3.05 etc in cam-convention world
    # (room half extents (3, 2, 1.5) lidar -> cam (3, 1.5, 2))
    assert (np.abs(p[:, 0]) < 3.2).mean() > 0.98


def test_colorize_and_fuse(views):
    from panovlm_tpu.models import texture
    from synthetic import _texture
    # lidar scan points = backprojected GT depth of view 0 (world frame since
    # pose 0 R=I t=-C); colorize from the cameras and compare with the
    # procedural texture value at the 3D point
    from panovlm_tpu.ops import spherical as sph
    rays = np.asarray(sph.pixel_ray_grid(H, W))
    C0 = -views["poses"][0, 3:]
    pts_local = (views["depths"][0][..., None] * rays).reshape(-1, 3)[::7]
    mask = np.ones(len(pts_local), bool)
    lidar_pose = np.zeros((1, 6), np.float32)
    lidar_pose[0, 3:] = views["poses"][0, 3:]  # same place as cam 0
    pw, col, ok = texture.colorize_lidar_map(
        pts_local[None], mask[None], lidar_pose, views["grays"], views["poses"])
    ok = np.asarray(ok)
    assert ok.mean() > 0.95
    # sampled gray close to the true texture (cam frame == lidar world here;
    # convert to the raycaster's z-up frame for _texture)
    S = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)
    tex = _texture(np.asarray(pw) @ S)
    sampled = np.asarray(col)[:, 0][ok]
    err = np.abs(sampled - tex[ok])
    # the texture has ~0.12 m wavelength components vs ~0.07 m pixel
    # footprint: bilinear sampling smooths them, so compare loosely + by
    # correlation
    assert np.median(err) < 0.12, np.median(err)
    assert np.corrcoef(sampled, tex[ok])[0, 1] > 0.85
    fused, fmask, fcol = texture.fuse_cloud(pw, col, jnp.asarray(ok))
    assert int(np.asarray(fmask).sum()) > 1000


def test_sequential_propagation_converges(views):
    """Propagate::SEQUENTIAL (MVS.cpp:682-720) as TPU log-shift sweeps:
    from a sparse LiDAR init it must reach checkerboard-level accuracy, and
    a good plane must travel far (whole-image reach per sweep)."""
    cfg = mvs.MVSConfig(
        pm=PatchMatchConfig(ncc_half_window=6, ncc_step=2, max_depth=10.0),
        n_iterations=6, n_neighbors=3, propagate=2)
    rays = spherical.pixel_ray_grid(H, W)
    key = jax.random.PRNGKey(0)
    sparse = np.zeros((H, W), np.float32)
    sparse[::16, ::16] = views["depths"][0][::16, ::16]  # sparser than the
    d0, n0, fixed = mvs.init_depth_normal(key, rays, jnp.asarray(sparse), cfg)
    nei = np.array([1, 2, 3], np.int32)
    band = slice(H // 4, 3 * H // 4)
    gt = views["depths"][0]
    depth, normal, conf = mvs.estimate_depth_map(
        jnp.asarray(views["grays"][0]), jnp.asarray(views["grays"][nei]),
        views["poses"], 0, nei, d0, n0, fixed, cfg)
    rel = np.abs(np.asarray(depth) - gt) / gt
    assert np.median(rel[band]) < 0.08, np.median(rel[band])


def test_sky_color_rejection():
    """FuseDepthImages drops sky-blue points (MVS.cpp:2311-2317)."""
    import cv2
    from panovlm_tpu.models.mvs import _is_sky_color
    # sky blue in HSV(OpenCV): H=110, S=120, V=220
    hsv = np.uint8([[[110, 120, 220]]])
    bgr = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0, 0]
    sky_rgb = np.float32([bgr[2], bgr[1], bgr[0]]) / 255.0
    grey = np.float32([0.5, 0.5, 0.5])
    red = np.float32([0.9, 0.1, 0.1])
    out = np.asarray(_is_sky_color(jnp.asarray(np.stack([sky_rgb, grey, red]))))
    assert out.tolist() == [True, False, False], out


def test_fuse_rgb_colors(views):
    """Fusion with (N,H,W,3) colors returns 3-channel colors."""
    cfg = mvs.MVSConfig(n_neighbors=3)
    depths = jnp.asarray(views["depths"])
    rgb = np.repeat(views["grays"][..., None], 3, axis=-1)
    pts, cols, msk = mvs.fuse_depth_maps(depths, jnp.ones_like(depths) * 0.8,
                                         jnp.asarray(rgb), views["poses"], cfg)
    assert cols.shape[-1] == 3
    assert int(np.asarray(msk).sum()) > 3000


def test_packed_ncc_matches_float_path(views):
    """ncc_cost with packed u8 neighbors tracks the float path (quantization
    noise only)."""
    rays = spherical.pixel_ray_grid(H, W)
    cfg = PatchMatchConfig(ncc_half_window=4, ncc_step=2, max_depth=10.0)
    R_nr, t_nr = mvs.relative_to_neighbors(views["poses"], 0,
                                           np.array([1], np.int32))
    d = jnp.asarray(views["depths"][0])
    n0 = -spherical.pixel_ray_grid(H, W)
    c_f32 = patchmatch.ncc_cost(jnp.asarray(views["grays"][0]),
                                jnp.asarray(views["grays"][1]), rays,
                                d, n0, R_nr[0], t_nr[0], cfg)
    pk = patchmatch.pack_views(views["grays"][1][None])
    c_pk = patchmatch.ncc_cost(jnp.asarray(views["grays"][0]),
                               pk.packed[0], rays, d, n0, R_nr[0], t_nr[0],
                               cfg, nei_scale=pk.scales[0])
    band = slice(H // 4, 3 * H // 4)
    diff = np.abs(np.asarray(c_f32 - c_pk))[band]
    assert np.median(diff) < 0.01, np.median(diff)
    assert np.mean(diff < 0.05) > 0.95


def test_prune_candidates_matches_exact(views):
    """Candidate pruning converges to the same depths as exact full scoring
    (both from the same LiDAR-ish init)."""
    rays = spherical.pixel_ray_grid(H, W)
    gt = views["depths"][0]
    sparse = np.zeros((H, W), np.float32)
    sparse[::8, ::8] = gt[::8, ::8]
    nei = np.array([1, 2, 3], np.int32)
    band = slice(H // 4, 3 * H // 4)
    meds = {}
    for prune in (0, 2):
        cfg = mvs.MVSConfig(
            pm=PatchMatchConfig(ncc_half_window=6, ncc_step=2,
                                max_depth=10.0, prune_candidates=prune),
            n_iterations=4, n_neighbors=3)
        d0, n0, fixed = mvs.init_depth_normal(
            jax.random.PRNGKey(0), rays, jnp.asarray(sparse), cfg)
        depth, _, _ = mvs.estimate_depth_map(
            jnp.asarray(views["grays"][0]), jnp.asarray(views["grays"][nei]),
            views["poses"], 0, nei, d0, n0, fixed, cfg)
        rel = np.abs(np.asarray(depth) - gt) / gt
        meds[prune] = np.median(rel[band])
    assert meds[2] < 0.08, meds
    assert abs(meds[2] - meds[0]) < 0.03, meds


def test_sweep_volume_matches_exact(views):
    """Plane-sweep volume scoring (sweep_slices=64, gather-free hot loop)
    converges like exact per-plane bilinear sampling, and the volume itself
    reproduces direct sampling at on-slice depths."""
    rays = spherical.pixel_ray_grid(H, W)
    gt = views["depths"][0]
    sparse = np.zeros((H, W), np.float32)
    sparse[::8, ::8] = gt[::8, ::8]
    nei = np.array([1, 2, 3], np.int32)
    band = slice(H // 4, 3 * H // 4)
    meds = {}
    for sweep in (0, 64):
        cfg = mvs.MVSConfig(
            pm=PatchMatchConfig(ncc_half_window=6, ncc_step=2,
                                min_depth=0.4, max_depth=10.0,
                                sweep_slices=sweep),
            n_iterations=4, n_neighbors=3)
        d0, n0, fixed = mvs.init_depth_normal(
            jax.random.PRNGKey(0), rays, jnp.asarray(sparse), cfg)
        depth, _, _ = mvs.estimate_depth_map(
            jnp.asarray(views["grays"][0]), jnp.asarray(views["grays"][nei]),
            views["poses"], 0, nei, d0, n0, fixed, cfg)
        rel = np.abs(np.asarray(depth) - gt) / gt
        meds[sweep] = np.median(rel[band])
    assert meds[64] < 0.08, meds
    assert abs(meds[64] - meds[0]) < 0.03, meds
    # volume slice s holds the neighbor sampled at exactly depth lambda_s
    pm_cfg = PatchMatchConfig(min_depth=0.4, max_depth=10.0, sweep_slices=16)
    R_nr, t_nr = mvs.relative_to_neighbors(views["poses"], 0, nei[:1])
    vol = patchmatch.build_sweep_volume(
        jnp.asarray(views["grays"][nei[:1]]), rays, R_nr, t_nr, pm_cfg)
    lam = 1.0 / patchmatch.sweep_inv_depths(pm_cfg)
    s = 7
    x_n = float(lam[s]) * jnp.einsum("ij,hwj->hwi", R_nr[0], rays) + t_nr[0]
    uv = spherical.cam_to_image(x_n, H, W)
    direct = spherical.bilinear_sample(jnp.asarray(views["grays"][nei[0]]), uv)
    diff = np.abs(np.asarray(vol[0, s], np.float32) - np.asarray(direct))
    assert np.median(diff) < 0.01, np.median(diff)


def test_volscore_kernel_matches_xla(views):
    """The Pallas volume-scoring kernel (interpret mode on CPU) must match
    the XLA hat-sum path bit-for-bit (same math, same wrap semantics)."""
    from panovlm_tpu.ops.pallas import volscore
    Hs, Ws, V, D, C = 32, 128, 2, 8, 3
    rng = np.random.default_rng(3)
    cfg = PatchMatchConfig(ncc_half_window=4, ncc_step=2, min_depth=0.5,
                           max_depth=10.0, sweep_slices=D)
    rays = spherical.pixel_ray_grid(Hs, Ws)
    vols = jnp.asarray(rng.uniform(size=(V, D, Hs, Ws)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    gray_ref = jnp.asarray(rng.uniform(size=(Hs, Ws)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1, 5, size=(C, Hs, Ws)).astype(np.float32))
    normals = jnp.stack([patchmatch.random_normals(jax.random.PRNGKey(i), rays)
                         for i in range(C)])
    offsets = tuple(patchmatch._patch_offsets(cfg))
    i_tab, w_tab = patchmatch.ref_tables(gray_ref, offsets, cfg)
    inv0 = 1.0 / cfg.max_depth
    inv_step = (1.0 / cfg.min_depth - inv0) / (D - 1)
    ref = jnp.stack([
        jnp.stack([patchmatch.ncc_cost(
            gray_ref, None, rays, depths[c], normals[c], jnp.eye(3),
            jnp.zeros(3), cfg, offsets=offsets, tabs=(i_tab, w_tab),
            vol=vols[v]) for c in range(C)])
        for v in range(V)])
    rho = depths * jnp.sum(normals * rays[None], axis=-1)
    nrm = jnp.moveaxis(normals, -1, 1)
    rays_cf = jnp.moveaxis(rays, -1, 0)
    out = volscore.score_candidates(vols, rho, nrm, rays_cf, i_tab, w_tab,
                                    offsets, inv0, inv_step, cfg.min_depth,
                                    cfg.max_depth, h_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_colorize_channel_consistency_far_scan():
    """A scan with no camera within nearest_dist must still produce colors
    with the same channel count as the colorized scans (RGB images)."""
    from panovlm_tpu.models import texture
    rng = np.random.default_rng(0)
    P = 64
    scans = rng.uniform(-1, 1, (2, P, 3)).astype(np.float32)
    masks = np.ones((2, P), bool)
    lidar_poses = np.zeros((2, 6), np.float32)
    lidar_poses[1, 3] = 50.0            # scan 1 far from every camera
    cam_poses = np.zeros((1, 6), np.float32)
    images = rng.uniform(size=(1, 16, 32, 3)).astype(np.float32)
    pts, cols, msk = texture.colorize_lidar_map(
        scans, masks, lidar_poses, images, cam_poses, nearest_dist=1.5)
    assert cols.shape == (2 * P, 3)
    assert not np.asarray(msk[P:]).any()        # far scan masked out
    assert np.asarray(msk[:P]).any()


def test_select_neighbor_sfm_beats_knn_on_loop():
    """SelectNeighborSFM (MVS.cpp:248-332): on a loopy trajectory the
    nearest camera by center distance shares no scene content; the
    SFM-point co-visibility score must pick the co-visible view instead."""
    # cam 0 and cam 1 nearly collocated but disjoint in content;
    # cam 2 farther away but sees the same points as cam 0
    poses = np.zeros((3, 6), np.float32)
    poses[0, 3:] = 0.0
    poses[1, 3:] = [-0.3, 0.0, 0.0]      # t_cw = -C -> C1 = (0.3, 0, 0)
    poses[2, 3:] = [-2.0, 0.0, 0.0]      # C2 = (2, 0, 0)
    rng = np.random.default_rng(0)
    pts = np.array([1.0, 0.0, 5.0]) + rng.normal(size=(30, 3)) * 0.3
    track_img = np.tile(np.array([0, 2], np.int32), (30, 1))
    track_mask = np.ones((30, 2), bool)

    knn = mvs.select_neighbor_views(poses, 1)
    sfm_sel = mvs.select_neighbor_sfm(poses, pts, track_img, track_mask, 1)
    assert knn[0, 0] == 1            # center-KNN picks the empty neighbor
    assert sfm_sel[0, 0] == 2        # co-visibility picks the right one
    assert sfm_sel[2, 0] == 0        # and symmetrically for view 2
    assert sfm_sel[1, 0] == -1       # view 1 shares nothing -> padded


def test_fit_sweep_range_constant_displacement_step():
    """fit_sweep_range keeps the displacement step (inverse-depth span per
    slice) no coarser than the configured one, clamps to the configured
    bounds, and refuses degenerate priors."""
    from panovlm_tpu.models.mvs import fit_sweep_range
    from panovlm_tpu.ops.patchmatch import PatchMatchConfig
    pm = PatchMatchConfig(min_depth=0.3, max_depth=10.0, sweep_slices=64)
    rng = np.random.default_rng(0)
    prior = rng.uniform(1.0, 4.0, (64, 64)).astype(np.float32)
    out = fit_sweep_range(pm, prior)
    assert pm.min_depth <= out.min_depth < out.max_depth <= pm.max_depth
    assert 16 <= out.sweep_slices < 64
    step_cfg = (1 / pm.min_depth - 1 / pm.max_depth) / pm.sweep_slices
    step_fit = (1 / out.min_depth - 1 / out.max_depth) / out.sweep_slices
    assert step_fit <= step_cfg * 1.01
    # margins cover the prior span
    assert out.min_depth <= 1.0 and out.max_depth >= 4.0
    # too few samples: no-op
    assert fit_sweep_range(pm, prior.ravel()[:100]) is pm
    # zeros/invalids ignored
    mixed = np.concatenate([prior.ravel(), np.zeros(5000, np.float32)])
    out2 = fit_sweep_range(pm, mixed)
    assert abs(out2.min_depth - out.min_depth) < 1e-6
    # sweep disabled: no-op
    pm0 = pm._replace(sweep_slices=0)
    assert fit_sweep_range(pm0, prior) is pm0
