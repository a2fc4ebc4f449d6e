import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panovlm_tpu.ops import se3
from panovlm_tpu.solver import LMOptions, ResidualBlock, residuals, robust, solve_lm


def test_robust_losses_match_ceres_formulas():
    s = jnp.asarray(9.0)  # residual norm 3
    a = 2.0
    # huber: s > a^2 -> 2 a sqrt(s) - a^2 = 12 - 4 = 8
    np.testing.assert_allclose(float(robust.rho("huber", s, a)), 8.0, atol=1e-6)
    np.testing.assert_allclose(float(robust.rho_prime("huber", s, a)), 2.0 / 3.0, atol=1e-6)
    np.testing.assert_allclose(float(robust.rho("huber", jnp.asarray(1.0), a)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(robust.rho("soft_l1", s, a)),
                               2 * 4 * (np.sqrt(1 + 9 / 4) - 1), atol=1e-5)


def _make_two_view_problem(rng, n_pts=60, noise=0.0):
    """Ground-truth two-view geometry with angle-residual observations."""
    pts = rng.uniform(-3, 3, size=(n_pts, 3)).astype(np.float32)
    pts[:, 2] += 6.0  # in front
    aa1 = np.zeros(3, np.float32)
    t1 = np.zeros(3, np.float32)
    aa2 = np.array([0.02, -0.3, 0.01], np.float32)
    t2 = np.array([0.5, 0.1, -1.0], np.float32)

    def obs_rays(aa, t):
        R = np.asarray(se3.exp_so3(jnp.asarray(aa)))
        p_c = pts @ R.T + t
        rays = p_c / np.linalg.norm(p_c, axis=1, keepdims=True)
        if noise > 0:
            rays += rng.normal(size=rays.shape).astype(np.float32) * noise
            rays /= np.linalg.norm(rays, axis=1, keepdims=True)
        return rays.astype(np.float32)

    return pts, (aa1, t1), (aa2, t2), obs_rays(aa1, t1), obs_rays(aa2, t2)


def test_two_view_ba_recovers_pose(rng):
    """Analog of SfMLocalBA (util/Optimization.cpp:84-170): camera 1 fixed,
    camera 2 pose + structure refined from angle residuals."""
    pts, (aa1, t1), (aa2, t2), rays1, rays2 = _make_two_view_problem(rng)
    n = len(pts)

    poses0 = np.stack([
        np.concatenate([aa1, t1]),
        np.concatenate([aa2 + 0.05, t2 + np.array([0.1, -0.1, 0.2], np.float32)]),
    ]).astype(np.float32)
    pts0 = (pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05)

    groups = {"poses": jnp.asarray(poses0), "points": jnp.asarray(pts0)}
    fixed = {
        "poses": jnp.asarray(np.array([[True] * 6, [False] * 6])),
        "points": jnp.zeros((n, 3), bool),
    }
    blocks = []
    for cam, rays in [(0, rays1), (1, rays2)]:
        blocks.append(ResidualBlock(
            residuals.reproj_chordal,
            groups=("poses", "points"),
            indices=(jnp.full((n,), cam, jnp.int32), jnp.arange(n, dtype=jnp.int32)),
            data=(jnp.asarray(rays),),
            weight=jnp.ones((n,), jnp.float32),
            mask=jnp.ones((n,), bool),
            loss="huber", loss_scale=np.radians(4.0),
        ))
    out, info = solve_lm(groups, tuple(blocks), fixed, LMOptions(max_iters=30))
    assert float(info["final_cost"]) < float(info["initial_cost"]) * 1e-6
    pose2 = np.asarray(out["poses"][1])
    np.testing.assert_allclose(pose2[:3], aa2, atol=1e-4)
    # translation recovered up to the two-view scale gauge (the reference
    # renormalizes |t_21| = 1 after SfMLocalBA, util/Optimization.cpp:162-165)
    t_rec = pose2[3:]
    np.testing.assert_allclose(
        t_rec / np.linalg.norm(t_rec), t2 / np.linalg.norm(t2), atol=1e-4
    )


def test_two_view_ba_reference_angle_residual(rng):
    """The reference's scalar-angle residual (ANGLE_RESIDUAL_1) converges to
    the same basin but measurably slower (rank-1 GN blocks) — keep it honest
    at a loose tolerance so its parity path stays exercised."""
    pts, (aa1, t1), (aa2, t2), rays1, rays2 = _make_two_view_problem(rng)
    n = len(pts)
    poses0 = np.stack([
        np.concatenate([aa1, t1]),
        np.concatenate([aa2 + 0.02, t2 + 0.05]),
    ]).astype(np.float32)
    groups = {"poses": jnp.asarray(poses0), "points": jnp.asarray(pts)}
    fixed = {
        "poses": jnp.asarray(np.array([[True] * 6, [False] * 6])),
        "points": jnp.ones((n, 3), bool),  # structure fixed: well-posed
    }
    blocks = []
    for cam, rays in [(0, rays1), (1, rays2)]:
        blocks.append(ResidualBlock(
            residuals.reproj_1angle,
            groups=("poses", "points"),
            indices=(jnp.full((n,), cam, jnp.int32), jnp.arange(n, dtype=jnp.int32)),
            data=(jnp.asarray(rays),),
            weight=jnp.ones((n,), jnp.float32),
            mask=jnp.ones((n,), bool),
            loss="huber", loss_scale=np.radians(4.0),
        ))
    out, info = solve_lm(groups, tuple(blocks), fixed, LMOptions(max_iters=30))
    pose2 = np.asarray(out["poses"][1])
    np.testing.assert_allclose(pose2[:3], aa2, atol=1e-4)
    np.testing.assert_allclose(pose2[3:], t2, atol=1e-3)


def test_point2plane_pose_recovery(rng):
    """Pairwise scan alignment: solve scan2's world pose from point-to-plane
    residuals against scan1's planes (the lidar odometry core)."""
    # three orthogonal planes in scan1 frame (= world frame)
    planes = np.array([
        [1, 0, 0, -2.0],
        [0, 1, 0, -1.5],
        [0, 0, 1, -3.0],
    ], np.float32)
    per_plane = 40
    pts_w, plane_ids = [], []
    for k, pl in enumerate(planes):
        p = rng.uniform(-2, 2, size=(per_plane, 3)).astype(np.float32)
        p -= (p @ pl[:3] + pl[3])[:, None] * pl[:3][None]
        pts_w.append(p)
        plane_ids += [k] * per_plane
    pts_w = np.concatenate(pts_w)
    plane_data = planes[np.array(plane_ids)]

    # scan2's true pose (world->lidar2): a small motion
    aa2 = np.array([0.03, 0.05, -0.02], np.float32)
    t2 = np.array([0.2, -0.1, 0.15], np.float32)
    R2 = np.asarray(se3.exp_so3(jnp.asarray(aa2)))
    pts_l2 = pts_w @ R2.T + t2  # points observed in scan2's frame

    n = len(pts_w)
    poses0 = np.zeros((2, 6), np.float32)
    poses0[1, :3] = aa2 + np.array([0.05, -0.04, 0.03], np.float32)
    poses0[1, 3:] = t2 + np.array([-0.1, 0.15, -0.08], np.float32)

    groups = {"poses": jnp.asarray(poses0)}
    fixed = {"poses": jnp.asarray(np.array([[True] * 6, [False] * 6]))}
    block = ResidualBlock(
        residuals.point2plane_meter,
        groups=("poses", "poses"),
        indices=(jnp.zeros((n,), jnp.int32), jnp.ones((n,), jnp.int32)),
        data=(jnp.asarray(pts_l2), jnp.asarray(plane_data)),
        weight=jnp.ones((n,), jnp.float32),
        mask=jnp.ones((n,), bool),
        loss="huber", loss_scale=0.2,
    )
    out, info = solve_lm(groups, (block,), fixed, LMOptions(max_iters=20))
    pose2 = np.asarray(out["poses"][1])
    np.testing.assert_allclose(pose2[:3], aa2, atol=1e-4)
    np.testing.assert_allclose(pose2[3:], t2, atol=1e-4)


def test_rotation_averaging_chain(rng):
    """PairWiseRotationResidual over a noisy chain + loop closure."""
    n = 8
    true_aa = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    true_aa[0] = 0
    R = np.asarray(se3.exp_so3(jnp.asarray(true_aa)))
    pairs, rels = [], []
    for i in range(n - 1):
        R_rel = R[i + 1] @ R[i].T  # R_{i+1,w} R_{iw}^T = R_{i+1,i}
        pairs.append((i, i + 1))
        rels.append(np.asarray(se3.log_so3(jnp.asarray(R_rel))))
    # loop closure 0 <-> n-1
    pairs.append((0, n - 1))
    rels.append(np.asarray(se3.log_so3(jnp.asarray(R[n - 1] @ R[0].T))))
    m = len(pairs)
    idx1 = jnp.asarray([p[0] for p in pairs], jnp.int32)
    idx2 = jnp.asarray([p[1] for p in pairs], jnp.int32)

    def rot_res(rot1, rot2, aa_obs):
        return residuals.pairwise_rotation(rot1, rot2, aa_obs)

    aa0 = true_aa + rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    aa0[0] = 0
    groups = {"rot": jnp.asarray(aa0)}
    fixed = {"rot": jnp.asarray(np.array([[True] * 3] + [[False] * 3] * (n - 1)))}
    block = ResidualBlock(
        rot_res, groups=("rot", "rot"), indices=(idx1, idx2),
        data=(jnp.asarray(np.stack(rels), jnp.float32),),
        weight=jnp.ones((m,), jnp.float32), mask=jnp.ones((m,), bool),
    )
    out, info = solve_lm(groups, (block,), fixed, LMOptions(max_iters=30))
    err = np.abs(np.asarray(out["rot"]) - true_aa).max()
    assert err < 1e-3, err
    assert float(info["final_cost"]) < 1e-8


def test_masked_residuals_ignored(rng):
    """Garbage observations with mask=False must not affect the solution."""
    n = 30
    target = rng.normal(size=(1, 3)).astype(np.float32)

    def point_res(x, obs):
        return x - obs

    obs = np.tile(target, (n, 1)).astype(np.float32)
    obs[n // 2:] = 1e6  # garbage, masked out
    mask = np.arange(n) < n // 2
    groups = {"x": jnp.zeros((1, 3))}
    block = ResidualBlock(
        point_res, groups=("x",), indices=(jnp.zeros((n,), jnp.int32),),
        data=(jnp.asarray(obs),), weight=jnp.ones((n,)), mask=jnp.asarray(mask),
    )
    out, _ = solve_lm(groups, (block,), None, LMOptions(max_iters=10))
    np.testing.assert_allclose(np.asarray(out["x"][0]), target[0], atol=1e-4)


def test_scale_group_soft_bounds():
    """ScaleFactor keeps scales inside bounds (translation averaging)."""
    def anchored(scale, anchor):
        return scale - anchor

    groups = {"s": jnp.asarray([[5.0]])}
    b1 = ResidualBlock(
        anchored, groups=("s",), indices=(jnp.zeros((1,), jnp.int32),),
        data=(jnp.asarray([[10.0]]),), weight=jnp.ones((1,)) * 0.1,
        mask=jnp.ones((1,), bool),
    )
    b2 = ResidualBlock(
        functools.partial(residuals.scale_factor, lower=1.0, upper=2.0),
        groups=("s",), indices=(jnp.zeros((1,), jnp.int32),),
        data=(), weight=jnp.ones((1,)) * 10.0, mask=jnp.ones((1,), bool),
    )
    out, _ = solve_lm(groups, (b1, b2), None, LMOptions(max_iters=20))
    s = float(out["s"][0, 0])
    assert 1.9 < s < 2.2  # pulled to upper bound, slightly above by weak anchor


def test_solve_lm_chunked_matches_single(rng):
    """solve_lm_chunked carries (lambda, nu) across chunks, so its LM
    trajectory — and result — must equal one long solve_lm program."""
    from panovlm_tpu.solver import (LMOptions, ResidualBlock, residuals,
                                    solve_lm, solve_lm_chunked)
    n_obs = 256
    gt = np.zeros((3, 6), np.float32)
    gt[:, 3] = [0.0, 0.1, 0.2]
    pl = np.array([[1, 0, 0, -2.0], [0, 1, 0, -1.5], [0, 0, 1, -3.0]],
                  np.float32)
    pair_r = rng.integers(0, 3, n_obs).astype(np.int32)
    pair_n = (pair_r + 1) % 3
    pidx = rng.integers(0, 3, n_obs)
    p = pl[pidx]
    pts_w = rng.uniform(-2, 2, (n_obs, 3)).astype(np.float32)
    pts_w -= ((pts_w * p[:, :3]).sum(1) + p[:, 3])[:, None] * p[:, :3]
    pts_n = pts_w + gt[pair_n][:, 3:]
    pl_r = p.copy()
    pl_r[:, 3] = p[:, 3] - (p[:, :3] * gt[pair_r][:, 3:]).sum(1)
    poses0 = gt + rng.normal(size=gt.shape).astype(np.float32) * 0.05
    poses0[0] = gt[0]
    fixed = {"poses": jnp.asarray(
        np.array([[True] * 6, [False] * 6, [False] * 6]))}
    block = ResidualBlock(
        residuals.point2plane_meter, ("poses", "poses"),
        (jnp.asarray(pair_r), jnp.asarray(pair_n)),
        (jnp.asarray(pts_n), jnp.asarray(pl_r)),
        jnp.ones((n_obs,), jnp.float32), jnp.ones((n_obs,), bool),
        loss="huber", loss_scale=0.2)
    opts = LMOptions(max_iters=12, cg_iters=25)
    out1, info1 = solve_lm({"poses": jnp.asarray(poses0)}, (block,),
                           fixed, opts)
    out2, info2 = solve_lm_chunked({"poses": jnp.asarray(poses0)}, (block,),
                                   fixed, opts, chunk=4)
    np.testing.assert_allclose(np.asarray(out1["poses"]),
                               np.asarray(out2["poses"]), atol=1e-6)
    assert abs(float(info1["final_cost"]) - float(info2["final_cost"])) < 1e-6


def test_obs_chunked_solve_matches_unchunked(rng):
    """The observation-axis chunked evaluation (LMOptions.obs_chunk /
    jac_chunk — the HBM-bounding path for Room-scale problems) must
    reproduce the unchunked LM trajectory, including a non-multiple
    observation count (pad rows masked)."""
    n_obs = 1000          # not a multiple of the chunk
    gt = np.zeros((3, 6), np.float32)
    gt[:, 3] = [0.0, 0.1, 0.2]
    pl = np.array([[1, 0, 0, -2.0], [0, 1, 0, -1.5], [0, 0, 1, -3.0]],
                  np.float32)
    pair_r = rng.integers(0, 3, n_obs).astype(np.int32)
    pair_n = (pair_r + 1) % 3
    p = pl[rng.integers(0, 3, n_obs)]
    pts_w = rng.uniform(-2, 2, (n_obs, 3)).astype(np.float32)
    pts_w -= ((pts_w * p[:, :3]).sum(1) + p[:, 3])[:, None] * p[:, :3]
    pts_n = pts_w + gt[pair_n][:, 3:]
    pl_r = p.copy()
    pl_r[:, 3] = p[:, 3] - (p[:, :3] * gt[pair_r][:, 3:]).sum(1)
    poses0 = gt + rng.normal(size=gt.shape).astype(np.float32) * 0.05
    poses0[0] = gt[0]
    fixed = {"poses": jnp.asarray(
        np.array([[True] * 6, [False] * 6, [False] * 6]))}
    mask = np.ones(n_obs, bool)
    mask[::17] = False    # masked rows must stay ignored in both paths
    block = ResidualBlock(
        residuals.point2plane_meter, ("poses", "poses"),
        (jnp.asarray(pair_r), jnp.asarray(pair_n)),
        (jnp.asarray(pts_n), jnp.asarray(pl_r)),
        jnp.ones((n_obs,), jnp.float32), jnp.asarray(mask),
        loss="huber", loss_scale=0.2)
    base = LMOptions(max_iters=10, cg_iters=25,
                     obs_chunk=None, jac_chunk=None)
    chunked = base._replace(obs_chunk=256, jac_chunk=128)
    out1, info1 = solve_lm({"poses": jnp.asarray(poses0)}, (block,),
                           fixed, base)
    out2, info2 = solve_lm({"poses": jnp.asarray(poses0)}, (block,),
                           fixed, chunked)
    np.testing.assert_allclose(np.asarray(out2["poses"]),
                               np.asarray(out1["poses"]), atol=5e-6)
    np.testing.assert_allclose(float(info2["final_cost"]),
                               float(info1["final_cost"]),
                               rtol=1e-5, atol=1e-8)


def _ba_single_block(rng, n_pts=40, n_masked=5):
    """Two-view BA as ONE residual block in track-major layout
    (pts indices = repeat(arange(T), L)) — the Schur-eliminable structure."""
    pts, (aa1, t1), (aa2, t2), rays1, rays2 = _make_two_view_problem(rng, n_pts)
    T = n_pts
    poses0 = np.stack([
        np.concatenate([aa1, t1]),
        np.concatenate([aa2 + 0.03, t2 + np.array([0.05, -0.05, 0.1], np.float32)]),
    ]).astype(np.float32)
    pts0 = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.03
    cam_idx = np.tile(np.array([0, 1], np.int32), T)
    pt_idx = np.repeat(np.arange(T, dtype=np.int32), 2)
    rays = np.stack([rays1, rays2], axis=1).reshape(2 * T, 3)
    mask = np.ones(2 * T, bool)
    mask[rng.choice(2 * T, n_masked, replace=False)] = False
    block = ResidualBlock(
        residuals.reproj_chordal, ("poses", "pts"),
        (jnp.asarray(cam_idx), jnp.asarray(pt_idx)),
        (jnp.asarray(rays),),
        jnp.ones((2 * T,), jnp.float32), jnp.asarray(mask),
        loss="huber", loss_scale=np.radians(4.0))
    groups = {"poses": jnp.asarray(poses0), "pts": jnp.asarray(pts0)}
    fixed = {"poses": jnp.asarray(np.array([[True] * 6, [False] * 6])),
             "pts": jnp.zeros((T, 3), bool)}
    return groups, block, fixed, (aa2, t2)


def test_dense_and_schur_tiers_match_pcg(rng):
    """The three linear-solver tiers (matrix-free PCG, dense normal
    equations, Schur-eliminated dense) must agree: dense and Schur solve
    the SAME damped system exactly so their LM trajectories coincide
    tightly; PCG is inexact but must land in the same optimum."""
    from panovlm_tpu.solver import make_schur_spec
    groups, block, fixed, (aa2, t2) = _ba_single_block(rng)
    opts = LMOptions(max_iters=15)

    spec = make_schur_spec(groups, (block,), "pts")
    assert spec is not None and spec.T == 40 and spec.L == 2

    out_pcg, info_pcg = solve_lm(groups, (block,), fixed,
                                 opts._replace(dense_max_params=0))
    out_den, info_den = solve_lm(groups, (block,), fixed, opts)
    out_sch, info_sch = solve_lm(groups, (block,), fixed, opts, schur=spec)

    # dense vs schur: identical algorithm, different factorization order
    np.testing.assert_allclose(np.asarray(out_sch["poses"]),
                               np.asarray(out_den["poses"]), atol=2e-4)
    np.testing.assert_allclose(float(info_sch["final_cost"]),
                               float(info_den["final_cost"]),
                               rtol=1e-3, atol=1e-10)
    # all three recover the pose
    for out in (out_pcg, out_den, out_sch):
        pose2 = np.asarray(out["poses"][1])
        np.testing.assert_allclose(pose2[:3], aa2, atol=1e-3)
        np.testing.assert_allclose(pose2[3:] / np.linalg.norm(pose2[3:]),
                                   t2 / np.linalg.norm(t2), atol=1e-3)
    # and reach (near-)zero cost on this noiseless problem
    for info in (info_pcg, info_den, info_sch):
        assert float(info["final_cost"]) < float(info["initial_cost"]) * 1e-4


def test_schur_t_chunked_matches_unchunked(rng):
    """Track-axis chunking of the Schur passes (the HBM bound at Room
    scale) must not change the step."""
    from panovlm_tpu.solver import make_schur_spec
    groups, block, fixed, _ = _ba_single_block(rng, n_pts=50)
    spec = make_schur_spec(groups, (block,), "pts")
    opts = LMOptions(max_iters=8)
    out1, info1 = solve_lm(groups, (block,), fixed,
                           opts._replace(schur_t_chunk=1024), schur=spec)
    out2, info2 = solve_lm(groups, (block,), fixed,
                           opts._replace(schur_t_chunk=7), schur=spec)
    np.testing.assert_allclose(np.asarray(out1["poses"]),
                               np.asarray(out2["poses"]), atol=2e-4)
    # structure is compared loosely: chunk-order fp noise shifts weakly
    # constrained points along their rays without moving the poses
    np.testing.assert_allclose(np.asarray(out1["pts"]),
                               np.asarray(out2["pts"]), atol=5e-3)


def test_make_schur_spec_rejects_bad_layouts(rng):
    """Spec detection must refuse non-eliminable structures (group in two
    blocks, non-track-major index layout) so callers fall back safely."""
    from panovlm_tpu.solver import make_schur_spec
    groups, block, fixed, _ = _ba_single_block(rng)
    # two blocks referencing pts
    assert make_schur_spec(groups, (block, block), "pts") is None
    # shuffled (non repeat(arange)) layout
    perm = np.random.default_rng(0).permutation(block.mask.shape[0])
    bad = ResidualBlock(block.fn, block.groups,
                        tuple(i[perm] for i in block.indices),
                        tuple(d[perm] for d in block.data),
                        block.weight[perm], block.mask[perm],
                        loss=block.loss, loss_scale=block.loss_scale)
    assert make_schur_spec(groups, (bad,), "pts") is None
    # unknown group
    assert make_schur_spec(groups, (block,), "nope") is None


def _ba_mixed_length_block(rng, n_cam=5, T=36, L=8, short_cap=3):
    """Multi-view BA, ONE track-major block with FRONT-PACKED variable
    track lengths (mix of <=short_cap and full-L tracks) — the layout
    bucket_schur_points splits."""
    pts = rng.uniform(-3, 3, size=(T, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    aa = (rng.normal(size=(n_cam, 3)) * 0.05).astype(np.float32)
    tt = (rng.normal(size=(n_cam, 3)) * 0.3).astype(np.float32)
    lens = np.where(np.arange(T) % 3 == 0, L, 2 + (np.arange(T) % 2))
    cam_idx = np.zeros((T, L), np.int32)
    rays = np.zeros((T, L, 3), np.float32)
    mask = np.zeros((T, L), bool)
    for t in range(T):
        for sl in range(int(lens[t])):
            c = (t + sl) % n_cam
            R = np.asarray(se3.exp_so3(jnp.asarray(aa[c])))
            p_c = pts[t] @ R.T + tt[c]
            rays[t, sl] = p_c / np.linalg.norm(p_c)
            cam_idx[t, sl] = c
            mask[t, sl] = True
    pt_idx = np.repeat(np.arange(T, dtype=np.int32), L)
    block = ResidualBlock(
        residuals.reproj_chordal, ("poses", "pts"),
        (jnp.asarray(cam_idx.ravel()), jnp.asarray(pt_idx)),
        (jnp.asarray(rays.reshape(-1, 3)),),
        jnp.ones((T * L,), jnp.float32), jnp.asarray(mask.ravel()),
        loss="huber", loss_scale=np.radians(4.0))
    poses0 = np.concatenate([aa, tt], axis=1) \
        + rng.normal(size=(n_cam, 6)).astype(np.float32) * 0.02
    pts0 = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05
    # full 7-DoF gauge: camera 0 pose + camera 1 tz (chordal residuals are
    # scale-invariant; an unpinned scale leaves a solution MANIFOLD, and
    # two exact solvers may converge to different points on it)
    poses0[1, 5] = tt[1, 2]
    groups = {"poses": jnp.asarray(poses0, jnp.float32),
              "pts": jnp.asarray(pts0)}
    fx = np.zeros((n_cam, 6), bool)
    fx[0] = True  # gauge
    fx[1, 5] = True  # scale gauge
    fixed = {"poses": jnp.asarray(fx), "pts": jnp.zeros((T, 3), bool)}
    return groups, block, fixed, mask


def test_bucket_schur_matches_single_spec(rng):
    """Short/long track bucketing (bucket_schur_points) must reproduce the
    single-spec Schur solve: per-track elimination is exact, so splitting
    the track set into length buckets — truncating the short bucket's dead
    padding — may only change fp summation order."""
    from panovlm_tpu.solver import make_schur_spec, bucket_schur_points
    groups, block, fixed, tmask = _ba_mixed_length_block(rng)
    opts = LMOptions(max_iters=10)
    spec = make_schur_spec(groups, (block,), "pts")
    assert spec is not None
    out1, info1 = solve_lm(groups, (block,), fixed, opts, schur=spec)

    g2, b2, f2, specs, reasm = bucket_schur_points(
        groups, (block,), fixed, tmask, "pts", short_cap=3)
    assert reasm is not None and len(specs) == 2, "bucketing must engage"
    assert {s.group for s in specs} == {"pts_s", "pts_l"}
    # short bucket truncated: fewer padded slots than the full layout
    s_short = next(s for s in specs if s.group == "pts_s")
    assert s_short.L == 3
    out2, info2 = solve_lm(g2, b2, f2, opts, schur=specs)
    np.testing.assert_allclose(np.asarray(out1["poses"]),
                               np.asarray(out2["poses"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out1["pts"]), reasm(out2),
                               atol=5e-3)
    np.testing.assert_allclose(float(info1["final_cost"]),
                               float(info2["final_cost"]),
                               rtol=1e-3, atol=1e-10)


def test_bucket_schur_guard_rejects_unpacked(rng):
    """A live observation past short_cap (non-front-packed interior hole)
    must trip the lossless-truncation guard -> single-spec fallback."""
    from panovlm_tpu.solver import bucket_schur_points
    groups, block, fixed, tmask = _ba_mixed_length_block(rng)
    T, L = tmask.shape
    # claim track 1 is short while its block mask has a live slot at L-1
    bm = np.asarray(block.mask).reshape(T, L).copy()
    bm[1, L - 1] = True
    bad = ResidualBlock(block.fn, block.groups, block.indices, block.data,
                        block.weight, jnp.asarray(bm.ravel()),
                        loss=block.loss, loss_scale=block.loss_scale)
    g2, b2, f2, specs, reasm = bucket_schur_points(
        groups, (bad,), fixed, tmask, "pts", short_cap=3)
    assert reasm is None and len(specs) == 1  # fallback, unbucketed


def test_two_view_refine_matches_solve_lm(rng):
    """solver/two_view.py: the Schur-eliminated two-view specialization
    reaches the same optimum as the generic solve_lm on the identical
    problem (same residuals, Huber scale, damping rules)."""
    from panovlm_tpu.solver import two_view_refine
    pts, (aa1, t1), (aa2, t2), rays1, rays2 = _make_two_view_problem(
        rng, noise=2e-3)
    n = len(pts)
    pose0 = np.concatenate([aa2 + 0.03,
                            t2 + np.array([0.05, -0.08, 0.1], np.float32)])
    pts0 = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05
    good = np.ones(n, bool)
    good[::7] = False  # masked rows must not constrain anything

    poses_g = np.stack([np.concatenate([aa1, t1]), pose0]).astype(np.float32)
    groups = {"poses": jnp.asarray(poses_g), "points": jnp.asarray(pts0)}
    fixed = {"poses": jnp.asarray(np.array([[True] * 6, [False] * 6])),
             "points": jnp.zeros((n, 3), bool)}
    blocks = []
    for cam, rays in [(0, rays1), (1, rays2)]:
        blocks.append(ResidualBlock(
            residuals.reproj_chordal, ("poses", "points"),
            (jnp.full((n,), cam, jnp.int32), jnp.arange(n, dtype=jnp.int32)),
            (jnp.asarray(rays),), jnp.ones((n,), jnp.float32),
            jnp.asarray(good), loss="huber", loss_scale=np.radians(4.0)))
    ref, info = solve_lm(groups, tuple(blocks), fixed,
                         LMOptions(max_iters=30))

    pose_tv, pts_tv, cost_tv = two_view_refine(
        jnp.asarray(pose0), jnp.asarray(pts0), jnp.asarray(rays1),
        jnp.asarray(rays2), jnp.asarray(good), float(np.radians(4.0)),
        max_iters=30)
    np.testing.assert_allclose(np.asarray(pose_tv),
                               np.asarray(ref["poses"][1]), atol=2e-4)
    np.testing.assert_allclose(float(cost_tv), float(info["final_cost"]),
                               rtol=1e-3)
    # point coordinates only agree loosely: near-parallel-bearing points sit
    # in flat cost valleys where the two (equivalent) solvers may park at
    # different spots — the pose and the COST are the converged quantities
    np.testing.assert_allclose(np.asarray(pts_tv)[good],
                               np.asarray(ref["points"])[good], atol=2e-2)
