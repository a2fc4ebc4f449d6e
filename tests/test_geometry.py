import jax.numpy as jnp
import numpy as np

from panovlm_tpu.ops import geometry as geo


def test_fit_line_pca(rng):
    direction = np.array([1.0, 2.0, -0.5])
    direction /= np.linalg.norm(direction)
    t = np.linspace(-1, 1, 20)
    pts = np.array([3.0, -1.0, 2.0]) + t[:, None] * direction
    pts = np.concatenate([pts, np.zeros((12, 3))])  # padding
    mask = np.concatenate([np.ones(20, bool), np.zeros(12, bool)])
    out = geo.fit_line_pca(jnp.asarray(pts, jnp.float32), jnp.asarray(mask))
    d = np.asarray(out["dir"])
    assert abs(abs(d @ direction) - 1.0) < 1e-4
    assert bool(out["ok"])
    # straightness very high for exact line
    assert float(geo.line_straightness(out["eigvals"])) > 1e4


def test_fit_plane(rng):
    n = np.array([0.0, 1.0, 1.0]) / np.sqrt(2)
    # points on plane n.x = 2  =>  n.x + d = 0 with d = -2
    xs = rng.normal(size=(30, 3)).astype(np.float32)
    xs -= (xs @ n - 2.0)[:, None] * n
    mask = np.ones(30, bool)
    out = geo.fit_plane_lsq(jnp.asarray(xs), jnp.asarray(mask), tolerance=0.01)
    nn = np.asarray(out["normal"])
    assert abs(abs(nn @ n) - 1.0) < 1e-4
    assert float(out["max_dist"]) < 1e-4
    assert bool(out["ok"])
    # noisy points beyond tolerance -> not ok
    xs_noisy = xs + rng.normal(size=xs.shape).astype(np.float32) * 0.1
    out2 = geo.fit_plane_lsq(jnp.asarray(xs_noisy), jnp.asarray(mask), tolerance=0.01)
    assert not bool(out2["ok"])


def test_point_line_distance():
    d = geo.point_to_line_distance(
        jnp.array([0.0, 1.0, 0.0]), jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0])
    )
    np.testing.assert_allclose(float(d), 1.0, atol=1e-6)


def test_point_plane_distance():
    d = geo.point_to_plane_distance(
        jnp.array([0.0, 5.0, 0.0]), jnp.array([0.0, 1.0, 0.0]), jnp.asarray(-2.0)
    )
    np.testing.assert_allclose(float(d), 3.0, atol=1e-6)


def test_angles():
    a = geo.angle_between(jnp.array([1.0, 0, 0]), jnp.array([0.0, 1.0, 0]), degrees=True)
    np.testing.assert_allclose(float(a), 90.0, atol=1e-4)
    a2 = geo.line_angle_between(jnp.array([1.0, 0, 0]), jnp.array([-1.0, 0.1, 0]), degrees=True)
    assert float(a2) < 10.0  # undirected


def test_plane_plane_intersection():
    # z=0 plane and y=0 plane intersect along x axis
    p, d, ok = geo.plane_plane_intersection(
        jnp.array([0.0, 0, 1.0]), jnp.asarray(0.0), jnp.array([0.0, 1.0, 0.0]), jnp.asarray(0.0)
    )
    assert bool(ok)
    assert abs(abs(float(d[0])) - 1.0) < 1e-5
    np.testing.assert_allclose(np.asarray(p)[1:], [0, 0], atol=1e-5)


def test_plane_line_intersection():
    pt, ok = geo.plane_line_intersection(
        jnp.array([0.0, 0, 1.0]), jnp.asarray(-2.0),
        jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]),
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(pt), [0, 0, 2.0], atol=1e-5)


def test_furthest_pair(rng):
    direction = np.array([1.0, 0, 0], dtype=np.float32)
    t = np.linspace(-2, 3, 10).astype(np.float32)
    pts = t[:, None] * direction
    mask = np.ones(10, bool)
    mask[-1] = False  # exclude the max point
    pmin, pmax = geo.furthest_pair_along_dir(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(direction)
    )
    np.testing.assert_allclose(float(pmin[0]), -2.0, atol=1e-5)
    np.testing.assert_allclose(float(pmax[0]), t[-2], atol=1e-5)
