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
