"""Multi-device sharding tests (8 virtual CPU devices via conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panovlm_tpu.parallel import make_mesh, replicated, shard_leading_axis
from panovlm_tpu.solver import LMOptions, ResidualBlock, residuals, solve_lm


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert int(np.prod(list(mesh.shape.values()))) == 8


def test_sharded_solve_matches_unsharded(rng):
    """The LM solve over observation-sharded residual blocks must produce
    the same poses as the single-device solve (psum reductions are exact
    up to f32 reduction order)."""
    n_obs = 1024
    planes = np.array([[1, 0, 0, -2.0], [0, 1, 0, -1.5], [0, 0, 1, -3.0]],
                      np.float32)
    pl = planes[rng.integers(0, 3, n_obs)]
    pts_w = rng.uniform(-2, 2, (n_obs, 3)).astype(np.float32)
    pts_w -= ((pts_w * pl[:, :3]).sum(1) + pl[:, 3])[:, None] * pl[:, :3]
    gt = np.zeros((4, 6), np.float32)
    gt[:, 3] = np.arange(4) * 0.1
    pair_r = rng.integers(0, 4, n_obs).astype(np.int32)
    pair_n = ((pair_r + 1) % 4).astype(np.int32)
    pts_n = pts_w + gt[pair_n][:, 3:]
    pl_r = pl.copy()
    pl_r[:, 3] = pl[:, 3] - (pl[:, :3] * gt[pair_r][:, 3:]).sum(1)
    poses0 = gt + rng.normal(size=gt.shape).astype(np.float32) * 0.02
    poses0[0] = gt[0]
    fixed = np.zeros((4, 6), bool)
    fixed[0] = True

    def solve(pair_r, pair_n, pts_n, pl_r, poses0):
        block = ResidualBlock(
            residuals.point2plane_meter, ("poses", "poses"),
            (pair_r, pair_n), (pts_n, pl_r),
            jnp.ones((n_obs,), jnp.float32), jnp.ones((n_obs,), bool),
            loss="huber", loss_scale=0.2)
        out, info = solve_lm({"poses": jnp.asarray(poses0)}, (block,),
                             {"poses": jnp.asarray(fixed)},
                             LMOptions(max_iters=8, cg_iters=25))
        return out["poses"]

    plain = np.asarray(solve(jnp.asarray(pair_r), jnp.asarray(pair_n),
                             jnp.asarray(pts_n), jnp.asarray(pl_r), poses0))

    mesh = make_mesh()
    obs = shard_leading_axis((jnp.asarray(pair_r), jnp.asarray(pair_n),
                              jnp.asarray(pts_n), jnp.asarray(pl_r)), mesh)
    p0 = replicated(jnp.asarray(poses0), mesh)
    sharded = np.asarray(jax.jit(solve)(obs[0], obs[1], obs[2], obs[3], p0))

    np.testing.assert_allclose(sharded, plain, atol=5e-5)
    np.testing.assert_allclose(sharded[1:, :3], gt[1:, :3], atol=1e-3)


def test_halo_windowed_association_matches_replicated():
    """Time-axis-sharded association (ppermute ring halo, SURVEY §5.7) must
    reproduce the replicated associate_all_pairs on the same temporal pair
    list: 8 scans over the 8-device mesh (one scan per shard is the
    degenerate window=1 case that exercises every halo transfer)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import make_trajectory_scans
    from panovlm_tpu.models import association, lidar_odometry
    from panovlm_tpu.parallel import halo
    from panovlm_tpu.sensors import velodyne as vd

    scans, poses_gt = make_trajectory_scans(n_scans=8, step=(0.2, 0.05, 0.0),
                                            yaw_step=0.03, noise=0.002,
                                            h_steps=450)
    feats = []
    for pts_lidar in scans:
        pts, _ = vd.preprocess_cloud(pts_lidar)
        p, m = vd.pad_points(pts, 8192)
        f, _, _ = vd.extract_features(jnp.asarray(p), jnp.asarray(m))
        feats.append(f)
    batch = lidar_odometry.stack_features(feats)
    poses = np.zeros((8, 6), np.float32)
    poses[:, 3] = -np.arange(8) * 0.2  # rough t_lw for a +x walk

    mesh = make_mesh()
    window = 1
    assoc_s, pr, pn, pv = halo.associate_windowed_sharded(
        batch, poses, n_scans=8, window=window, mesh=mesh)
    pr, pn, pv = np.asarray(pr), np.asarray(pn), np.asarray(pv)
    assert pv.sum() == 7 and (pn[pv] == pr[pv] + 1).all()

    assoc_r = association.associate_all_pairs(
        batch, jnp.asarray(poses), jnp.asarray(pr % 8), jnp.asarray(pn % 8))
    for fam in ("p2l", "p2p", "l2l"):
        m_ref = np.asarray(assoc_r[fam]["mask"])[pv]
        for k in assoc_s[fam]:
            a = np.asarray(assoc_s[fam][k])[pv]
            b = np.asarray(assoc_r[fam][k])[pv]
            np.testing.assert_array_equal(
                a if a.dtype == bool else np.where(
                    m_ref.reshape(m_ref.shape + (1,) * (a.ndim - m_ref.ndim)),
                    a, 0),
                b if b.dtype == bool else np.where(
                    m_ref.reshape(m_ref.shape + (1,) * (b.ndim - m_ref.ndim)),
                    b, 0),
                err_msg=f"{fam}.{k}")


def test_production_odometry_sharded_matches_single(monkeypatch):
    """The PRODUCTION odometry entry (lidar_odometry.estimate_poses, the
    compute core of the init_lidar_pose CLI stage) must produce the same
    poses with a >1-device mesh (halo-ring windowed association + LM solve
    with the observation axis sharded) as single-device. Same observation
    set by construction; agreement to f32 reduction order."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import make_trajectory_scans
    from panovlm_tpu.models import lidar_odometry
    from panovlm_tpu.sensors import velodyne as vd

    scans, poses_gt = make_trajectory_scans(n_scans=8, step=(0.2, 0.05, 0.0),
                                            yaw_step=0.03, noise=0.002,
                                            h_steps=450)
    feats = []
    for pts_lidar in scans:
        pts, _ = vd.preprocess_cloud(pts_lidar)
        p, m = vd.pad_points(pts, 8192)
        f, _, _ = vd.extract_features(jnp.asarray(p), jnp.asarray(m))
        feats.append(f)
    batch = lidar_odometry.stack_features(feats)
    poses0 = np.zeros((8, 6), np.float32)
    poses0[:, 3] = -np.arange(8) * 0.2
    poses0[1:, :3] += 0.01   # perturb so the solve has real work
    valid = np.ones(8, bool)
    cfg = lidar_odometry.OdometryConfig(num_iteration_lidar=2, max_lm_iters=8)

    p_single, info_s = lidar_odometry.estimate_poses(batch, poses0, valid, cfg)
    p_shard, info_m = lidar_odometry.estimate_poses(batch, poses0, valid, cfg,
                                                    mesh=make_mesh())
    assert len(info_s) == len(info_m)   # same early-stop trajectory
    np.testing.assert_allclose(np.asarray(p_shard), np.asarray(p_single),
                               atol=2e-4)
    np.testing.assert_allclose(info_m[-1]["final_cost"],
                               info_s[-1]["final_cost"], rtol=1e-3)


def test_ground_linefit(rng):
    from panovlm_tpu.sensors.ground import segment_ground_linefit
    # ground plane at y=+1.2 (camera convention) + a wall at x=3
    n = 4000
    g = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    g[:, 1] = 1.2 + rng.normal(size=n).astype(np.float32) * 0.02
    w = rng.uniform(-2, 2, (1000, 3)).astype(np.float32)
    w[:, 0] = 3.0
    w[:, 1] = rng.uniform(-1.5, 1.0, 1000).astype(np.float32)
    pts = np.concatenate([g, w])
    mask = np.ones(len(pts), bool)
    ground = np.asarray(segment_ground_linefit(jnp.asarray(pts), jnp.asarray(mask)))
    assert ground[:n].mean() > 0.9, ground[:n].mean()
    assert ground[n:].mean() < 0.15, ground[n:].mean()


def test_fast_atan2(rng):
    from panovlm_tpu.ops.math import fast_atan2
    y = jnp.asarray(rng.normal(size=1000).astype(np.float32))
    x = jnp.asarray(rng.normal(size=1000).astype(np.float32))
    err = np.abs(np.asarray(fast_atan2(y, x)) - np.arctan2(y, x))
    assert err.max() < 0.006  # reference quotes ~0.3 deg


def test_mvs_batched_sharded_matches_unsharded():
    """The batched multi-image PatchMatch program must give identical
    results with the image axis sharded over the 8-device mesh (no
    cross-image communication) and must converge like the per-image path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import render_panorama
    from panovlm_tpu.models import mvs
    from panovlm_tpu.ops import spherical
    from panovlm_tpu.ops.patchmatch import PatchMatchConfig

    H, W = 64, 128
    centers = [np.array([0.0, 0.4, 0.0]), np.array([0.7, 0.4, 0.2]),
               np.array([-0.5, 0.2, -0.4]), np.array([0.2, 0.6, -0.7])]
    grays, depths = zip(*[render_panorama(c, H, W) for c in centers])
    poses = np.zeros((4, 6), np.float32)
    for i, c in enumerate(centers):
        poses[i, 3:] = -c
    # 8 refs = each view twice (pads the batch to the mesh size)
    refs = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    grays8 = np.stack([grays[r] for r in refs])
    nei_all = mvs.select_neighbor_views(poses, 3)
    nei8 = np.stack([nei_all[r] for r in refs])
    cfg = mvs.MVSConfig(pm=PatchMatchConfig(ncc_half_window=4, ncc_step=2,
                                            max_depth=10.0),
                        n_iterations=3, n_neighbors=3)
    rays = spherical.pixel_ray_grid(H, W)
    d0s, n0s, fxs = [], [], []
    for i, r in enumerate(refs):
        sparse = np.zeros((H, W), np.float32)
        sparse[::8, ::8] = depths[r][::8, ::8]
        d0, n0, fx = mvs.init_depth_normal(jax.random.PRNGKey(i), rays,
                                           jnp.asarray(sparse), cfg)
        d0s.append(d0); n0s.append(n0); fxs.append(fx)
    d0s, n0s, fxs = jnp.stack(d0s), jnp.stack(n0s), jnp.stack(fxs)
    # pose row per REF slot (refs 4..7 duplicate views 0..3); neighbor
    # indices stay 0..3 where grays8/poses8 coincide with the view set
    poses8 = np.stack([poses[r] for r in refs])

    out_plain = mvs.estimate_depth_maps_batched(
        grays8, poses8, nei8, d0s, n0s, fxs, cfg, seed=5)
    mesh = make_mesh()
    out_shard = mvs.estimate_depth_maps_batched(
        grays8, poses8, nei8, d0s, n0s, fxs, cfg, seed=5, mesh=mesh)
    for a, b in zip(out_plain, out_shard):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    # chunked refs (ref_idx path, as the pipeline drives it) == whole batch
    out_chunk = mvs.estimate_depth_maps_batched(
        grays8, poses8, nei8[4:], d0s[4:], n0s[4:], fxs[4:], cfg, seed=5,
        ref_idx=np.arange(4, 8))
    for a, b in zip(out_chunk, out_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b)[4:],
                                   atol=1e-5, rtol=1e-5)
    # convergence sanity on ref 0 (interior band): loose bound — 3 iters on
    # this wide-baseline scene lands ~0.13; unconverged random init is >0.5
    band = slice(H // 4, 3 * H // 4)
    rel = np.abs(np.asarray(out_plain[0][0]) - depths[0]) / depths[0]
    assert np.median(rel[band]) < 0.2, np.median(rel[band])


# ---------------------------------------------------------------------------
# Multi-host / DCN tier (parallel/multihost.py, SURVEY.md §5.8)
# ---------------------------------------------------------------------------

def test_process_slice_partition():
    """Balanced contiguous partition: covers all items exactly once, sizes
    differ by at most one, deterministic across hosts."""
    from panovlm_tpu.parallel.multihost import process_slice
    for n, k in [(454, 4), (24, 8), (7, 3), (3, 8), (0, 4), (1724, 16)]:
        slices = [process_slice(n, p, k) for p in range(k)]
        items = []
        for s in slices:
            items.extend(range(s.start, s.stop))
        assert items == list(range(n)), (n, k)
        sizes = [s.stop - s.start for s in slices]
        assert max(sizes) - min(sizes) <= 1, (n, k, sizes)


def test_process_slice_single_process_is_everything():
    from panovlm_tpu.parallel.multihost import process_slice
    s = process_slice(17)           # real jax.process_index/count (1 proc)
    assert (s.start, s.stop) == (0, 17)


def test_hybrid_mesh_single_host():
    """Degenerate (1, n) hybrid mesh: frame axis size 1, data axis all
    devices; a frame-sharded array placement still round-trips."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from panovlm_tpu.parallel.multihost import make_hybrid_mesh, FRAME_AXIS
    from panovlm_tpu.parallel.sharding import DATA_AXIS
    mesh = make_hybrid_mesh()
    assert mesh.shape[FRAME_AXIS] == 1
    assert mesh.shape[DATA_AXIS] == len(jax.devices())
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None)))
    np.testing.assert_array_equal(np.asarray(jax.jit(lambda a: a * 2)(xs)),
                                  x * 2)


def test_initialize_distributed_noop_single_process(monkeypatch):
    from panovlm_tpu.parallel import multihost
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize_distributed() is False


def test_production_joint_sharded_matches_single(rng):
    """The PRODUCTION joint-optimization entry (camera_lidar.joint_optimize,
    the compute core of the joint_optimization CLI stage) must converge to
    the same solution with a >1-device mesh (every residual family's
    observation axis sharded, matrix-free solve with psum'd contractions)
    as single-device. The single-device run takes the Schur/dense tier and
    the sharded run the PCG tier — same damped objective, different linear
    solver — so the comparison is convergence-level, not bitwise."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_camera_lidar import make_joint_scene
    from panovlm_tpu.models import camera_lidar as cl

    s = make_joint_scene(rng)
    cfg = cl.JointConfig(num_iteration_joint=2, lidar_weight=0.01,
                         camera_lidar_weight=5.0)
    args = (s["arc_batch"], s["lidar_batch"], s["cam_gt"], s["lid0"],
            s["timg"], s["tfeat"], s["tmask"], s["bearings"], s["pts3d"],
            np.ones(60, bool), cfg)
    cam1, lid1, _, info1 = cl.joint_optimize(*args)
    cam8, lid8, _, info8 = cl.joint_optimize(*args, mesh=make_mesh())
    err0 = np.abs(s["lid0"] - s["lid_gt"]).max()
    for lid in (lid1, lid8):
        err = np.abs(np.asarray(lid) - s["lid_gt"]).max()
        assert err < err0 * 0.5, (err0, err)
    np.testing.assert_allclose(np.asarray(lid8), np.asarray(lid1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(cam8), np.asarray(cam1), atol=2e-3)
