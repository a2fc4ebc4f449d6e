import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScR

from panovlm_tpu.ops import epipolar, se3


def make_pair(rng, n=100, outlier_frac=0.0, noise=0.0):
    """Synthetic spherical two-view geometry. Returns bearings + GT pose."""
    R_21 = ScR.from_rotvec([0.05, -0.3, 0.02]).as_matrix()
    t_21 = np.array([0.4, 0.1, -0.8])
    t_21 /= np.linalg.norm(t_21)
    pts = rng.uniform(-4, 4, (n, 3))
    pts[:, 2] += 5.0
    b1 = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    p2 = pts @ R_21.T + t_21
    b2 = p2 / np.linalg.norm(p2, axis=1, keepdims=True)
    n_out = int(n * outlier_frac)
    if n_out:
        junk = rng.normal(size=(n_out, 3))
        b2[:n_out] = junk / np.linalg.norm(junk, axis=1, keepdims=True)
    if noise:
        b1 = b1 + rng.normal(size=b1.shape) * noise
        b2 = b2 + rng.normal(size=b2.shape) * noise
        b1 /= np.linalg.norm(b1, axis=1, keepdims=True)
        b2 /= np.linalg.norm(b2, axis=1, keepdims=True)
    return (jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32),
            R_21.astype(np.float32), t_21.astype(np.float32))


def essential_from_rt(R_21, t_21):
    tx = np.asarray(se3.hat(jnp.asarray(t_21)))
    return tx @ R_21


def test_eight_point_exact(rng):
    b1, b2, R, t = make_pair(rng, n=8)
    E = np.asarray(epipolar.eight_point(b1[None], b2[None]))[0]
    E_gt = essential_from_rt(R, t)
    E_gt /= np.linalg.norm(E_gt)
    E_n = E / np.linalg.norm(E)
    if np.sum(E_n * E_gt) < 0:
        E_n = -E_n
    np.testing.assert_allclose(E_n, E_gt, atol=1e-3)


def test_residuals_zero_at_gt(rng):
    b1, b2, R, t = make_pair(rng, n=50)
    E = jnp.asarray(essential_from_rt(R, t), jnp.float32)
    res = np.asarray(epipolar.epipolar_residuals(E, b1, b2))
    assert res.max() < 1e-6


def test_acransac_with_outliers(rng):
    b1, b2, R, t = make_pair(rng, n=200, outlier_frac=0.3, noise=1e-4)
    mask = jnp.ones(200, bool)
    out = epipolar.find_essential_acransac(b1, b2, mask, n_hyp=300)
    assert bool(out["ok"])
    inl = np.asarray(out["inliers"])
    # outliers are at the front
    assert inl[:60].sum() < 8
    assert inl[60:].sum() > 120
    # recovered E close to GT on inliers
    res = np.asarray(epipolar.epipolar_residuals(out["E"], b1, b2))
    assert np.median(res[inl]) < 1e-5


def test_decompose_and_checkrt_selects_gt(rng):
    b1, b2, R, t = make_pair(rng, n=150, noise=1e-4)
    E = jnp.asarray(essential_from_rt(R, t), jnp.float32)
    out = epipolar.best_pose_from_essential(E, b1, b2, jnp.ones(150, bool))
    R_rec = np.asarray(out["R_21"])
    t_rec = np.asarray(out["t_21"])
    np.testing.assert_allclose(R_rec, R, atol=5e-3)
    if np.dot(t_rec, t) < 0:
        t_rec = -t_rec
    np.testing.assert_allclose(t_rec, t, atol=5e-3)
    assert int(out["n_good"]) > 140
    assert float(out["parallax_deg"]) > 1.0


def test_triangulate_two_view(rng):
    b1, b2, R, t = make_pair(rng, n=50)
    pts_gt = None  # regenerate to compare
    R_j = jnp.asarray(R)
    t_j = jnp.asarray(t)
    pts = np.asarray(epipolar.triangulate_two_view(R_j, t_j, b1, b2))
    # reproject into both views and compare angles
    n1 = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    assert np.abs((n1 * np.asarray(b1)).sum(1) - 1).max() < 1e-5
    p2 = pts @ R.T + np.asarray(t_j)
    n2 = p2 / np.linalg.norm(p2, axis=1, keepdims=True)
    assert np.abs((n2 * np.asarray(b2)).sum(1) - 1).max() < 1e-4


def test_masked_matches_ignored(rng):
    b1, b2, R, t = make_pair(rng, n=100, noise=1e-4)
    # corrupt masked-out entries with garbage
    b1 = b1.at[:20].set(jnp.asarray(rng.normal(size=(20, 3)), jnp.float32))
    mask = jnp.arange(100) >= 20
    out = epipolar.find_essential_acransac(b1, b2, mask, n_hyp=200)
    assert bool(out["ok"])
    assert not np.asarray(out["inliers"])[:20].any()
