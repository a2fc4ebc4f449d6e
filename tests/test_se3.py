import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScR

from panovlm_tpu.ops import se3


def random_rotations(rng, n):
    return ScR.random(n, random_state=np.random.RandomState(0)).as_matrix().astype(np.float32)


def test_exp_log_roundtrip(rng):
    w = rng.normal(size=(64, 3)).astype(np.float32)
    R = se3.exp_so3(jnp.asarray(w))
    w2 = se3.log_so3(R)
    R2 = se3.exp_so3(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-5)


def test_exp_matches_scipy(rng):
    w = rng.normal(size=(32, 3)).astype(np.float64)
    R_ref = ScR.from_rotvec(w).as_matrix()
    R = se3.exp_so3(jnp.asarray(w, jnp.float32))
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)


def test_exp_zero():
    R = se3.exp_so3(jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
    # gradient finite at zero
    g = jax.jacfwd(se3.exp_so3)(jnp.zeros((3,)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_quat_matrix_roundtrip(rng):
    R = random_rotations(rng, 50)
    q = se3.matrix_to_quat(jnp.asarray(R))
    R2 = se3.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    assert np.all(np.asarray(q)[:, 0] >= 0)


def test_quat_rotate_consistency(rng):
    R = random_rotations(rng, 20)
    q = se3.matrix_to_quat(jnp.asarray(R))
    v = rng.normal(size=(20, 3)).astype(np.float32)
    out_q = se3.quat_rotate(q, jnp.asarray(v))
    out_m = jnp.einsum("nij,nj->ni", jnp.asarray(R), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_m), atol=1e-5)


def test_log_near_pi():
    axis = np.array([1.0, 0.3, -0.5])
    axis /= np.linalg.norm(axis)
    for theta in [np.pi - 1e-4, np.pi - 1e-2]:
        w = (axis * theta).astype(np.float32)
        R = ScR.from_rotvec(w).as_matrix().astype(np.float32)
        w2 = np.asarray(se3.log_so3(jnp.asarray(R)))
        R2 = ScR.from_rotvec(w2).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-3)


def test_slerp_endpoints(rng):
    R = random_rotations(rng, 2)
    q0 = se3.matrix_to_quat(jnp.asarray(R[0]))
    q1 = se3.matrix_to_quat(jnp.asarray(R[1]))
    np.testing.assert_allclose(np.asarray(se3.quat_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(
        np.abs(np.asarray(se3.quat_slerp(q0, q1, 1.0))), np.abs(np.asarray(q1)), atol=1e-5
    )


def test_slerp_pose_midpoint_matches_scipy(rng):
    R = random_rotations(rng, 2)
    t0 = jnp.asarray(rng.normal(size=3).astype(np.float32))
    t1 = jnp.asarray(rng.normal(size=3).astype(np.float32))
    Rm, tm = se3.slerp_pose(jnp.asarray(R[0]), t0, jnp.asarray(R[1]), t1, 0.5)
    # scipy slerp
    from scipy.spatial.transform import Slerp
    sl = Slerp([0, 1], ScR.from_matrix(R))
    np.testing.assert_allclose(np.asarray(Rm), sl(0.5).as_matrix(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tm), 0.5 * (np.asarray(t0) + np.asarray(t1)), atol=1e-6)


def test_pose_compose_invert(rng):
    R = jnp.asarray(random_rotations(rng, 10))
    t = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    Ri, ti = se3.invert_pose(R, t)
    Rc, tc = se3.compose_pose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), np.zeros((10, 3)), atol=1e-5)


def test_transform_points_batched(rng):
    R = jnp.asarray(random_rotations(rng, 4))
    t = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(4, 100, 3)).astype(np.float32))
    out = se3.transform_points(R, t, pts)
    ref = np.einsum("nij,npj->npi", np.asarray(R), np.asarray(pts)) + np.asarray(t)[:, None]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_retract_at_zero_is_identity(rng):
    R = jnp.asarray(random_rotations(rng, 5))
    t = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    R2, t2 = se3.retract(R, t, jnp.zeros((5, 6)))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-6)


def test_pose_is_valid():
    R = jnp.stack([jnp.eye(3), jnp.zeros((3, 3))])
    t = jnp.stack([jnp.zeros(3), jnp.zeros(3)])
    v = se3.pose_is_valid(R, t)
    assert bool(v[0]) and not bool(v[1])
    t_inf = jnp.stack([jnp.array([jnp.inf, 0, 0]), jnp.zeros(3)])
    v2 = se3.pose_is_valid(R, t_inf)
    assert not bool(v2[0])


def test_rotation_angle(rng):
    axis = np.array([0, 0, 1.0], dtype=np.float32)
    Ra = jnp.eye(3)
    Rb = se3.exp_so3(jnp.asarray(axis * np.radians(30)))
    a = se3.rotation_angle_deg(Ra, Rb)
    np.testing.assert_allclose(float(a), 30.0, atol=1e-3)
