"""Two-view chordal refinement — the SfMLocalBA specialization.

Replaces the general `solve_lm` call inside the per-pair relative-pose
refinement (reference: two-view Ceres problem of FilterImagePairs,
sfm/SfM.cpp:298-480 with SetOptionsSfM). The generic path materialized the
full dense (12+3K)^2 normal equations per pair (K = matches, ~3000^2 at
K=1024) and Cholesky-factored them every LM iteration — ~10 GFLOP per
iteration per pair for a problem whose coupling structure is one camera
against K independent 3-D points.

Here the structure is exploited exactly (the SCHUR trick of BA solvers,
Ceres SPARSE_SCHUR, util/Optimization.cpp:611): camera 0 is the gauge,
camera 1 is the only pose block, every point couples only to it. Per LM
iteration: K batched 3x3 point factors, one 6x6 reduced solve, K batched
back-substitutions — all vmap-friendly, no (P, P) matrix. The LM damping
rules (Nielsen), Huber-IRLS weighting, and Marquardt diag(JtJ) scaling
match solve_lm's, so the trajectory agrees with the generic solver to
floating-point roundoff (tests/test_solver.py::test_two_view_matches_lm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import robust
from ..ops import se3

_EPS = 1e-10


def _inv3(A):
    """Closed-form adjugate inverse of (..., 3, 3) SPD-damped blocks: pure
    elementwise arithmetic, no LU pivoting chain — the batched
    jnp.linalg.inv is a deep sequential program on TPU and dominated the
    refine iteration."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    adj = jnp.stack([jnp.stack([A00, A01, A02], -1),
                     jnp.stack([A10, A11, A12], -1),
                     jnp.stack([A20, A21, A22], -1)], -2)
    return adj * inv_det[..., None, None]


def _r0(X, b1):
    """Chordal residual in the gauge camera (identity pose)."""
    return X / (jnp.linalg.norm(X) + 1e-12) - b1


def _r1(pose, X, b2):
    """Chordal residual in camera 1: pose = [aa_cw, t_cw].

    The rotation applies via Precision.HIGHEST matmul: the raw `@` runs in
    bf16 on the MXU, which floors the refinement cost at ~1e-5 (observed on
    the v5e) — far above the <1e-3 rad pose-parity target."""
    p_c = se3.matmul(se3.exp_so3(pose[:3]), X[:, None])[:, 0] + pose[3:]
    return p_c / (jnp.linalg.norm(p_c) + 1e-12) - b2


@functools.partial(jax.jit, static_argnames=("max_iters", "loss"))
def two_view_refine(pose0, pts0, b1, b2, good, loss_scale,
                    max_iters: int = 10, loss: str = "huber"):
    """LM over (pose1 (6,), points (K,3)) with per-point Schur elimination.

    pose0: initial [aa_21, t_21]; pts0 (K,3) frame-1 (=world) points;
    b1/b2 (K,3) unit bearings; good (K,) mask. Returns (pose, pts, cost).
    """
    mask = good.astype(jnp.float32)

    def cost_irls(pose, pts):
        r0 = jax.vmap(_r0)(pts, b1)
        r1 = jax.vmap(_r1, in_axes=(None, 0, 0))(pose, pts, b2)
        s0 = jnp.sum(r0 * r0, -1)
        s1 = jnp.sum(r1 * r1, -1)
        cost = 0.5 * jnp.sum(
            mask * (robust.rho(loss, s0, loss_scale)
                    + robust.rho(loss, s1, loss_scale)))
        w0 = jnp.sqrt(robust.rho_prime(loss, s0, loss_scale)) * mask
        w1 = jnp.sqrt(robust.rho_prime(loss, s1, loss_scale)) * mask
        return cost, (r0, r1, w0, w1)

    def lm_iteration(pose, pts, lam):
        cost, (r0, r1, w0, w1) = cost_irls(pose, pts)
        # per-observation Jacobians (whitened by the frozen IRLS weights)
        J0x = jax.vmap(jax.jacfwd(_r0))(pts, b1) * w0[:, None, None]
        J1 = jax.vmap(jax.jacfwd(_r1, argnums=(0, 1)),
                      in_axes=(None, 0, 0))(pose, pts, b2)
        J1p = J1[0] * w1[:, None, None]                   # (K, 3, 6)
        J1x = J1[1] * w1[:, None, None]                   # (K, 3, 3)
        J0x = jnp.where(jnp.isfinite(J0x), J0x, 0.0)
        J1p = jnp.where(jnp.isfinite(J1p), J1p, 0.0)
        J1x = jnp.where(jnp.isfinite(J1x), J1x, 0.0)
        r0w = jnp.where(jnp.isfinite(r0), r0, 0.0) * w0[:, None]
        r1w = jnp.where(jnp.isfinite(r1), r1, 0.0) * w1[:, None]

        V = (se3.einsum("kri,krj->kij", J0x, J0x)
             + se3.einsum("kri,krj->kij", J1x, J1x))      # (K, 3, 3)
        U = se3.einsum("kri,krj->kij", J1p, J1x)          # (K, 6, 3)
        Hpp = se3.einsum("kri,krj->ij", J1p, J1p)         # (6, 6)
        g_p = se3.einsum("kri,kr->i", J1p, r1w)           # (6,)
        g_x = (se3.einsum("kri,kr->ki", J0x, r0w)
               + se3.einsum("kri,kr->ki", J1x, r1w))      # (K, 3)

        dVd = se3.einsum("kii->ki", V)                    # (K, 3)
        Vd = V + jax.vmap(jnp.diag)(lam * (dVd + _EPS)
                                    + (1.0 - mask)[:, None])
        Vinv = _inv3(Vd)
        Y = se3.einsum("kij,kjl->kil", U, Vinv)           # (K, 6, 3)
        D2p = jnp.diagonal(Hpp)
        S = (Hpp + jnp.diag(lam * (D2p + _EPS))
             - se3.einsum("kil,kjl->ij", Y, U))
        rhs = -g_p + se3.einsum("kil,kl->i", Y, g_x)
        dp = jnp.linalg.solve(S, rhs)                     # (6,)
        dx = se3.einsum("kij,kj->ki", Vinv,
                        -g_x - se3.einsum("krj,r->kj", U, dp))
        dx = dx * mask[:, None]

        pred = (0.5 * jnp.vdot(dp, lam * (D2p + _EPS) * dp - g_p)
                + 0.5 * jnp.sum(dx * (lam * (dVd + _EPS) * dx - g_x)))
        pose_new = pose + dp
        pts_new = pts + dx
        cost_new, _ = cost_irls(pose_new, pts_new)
        return pose_new, pts_new, cost, cost_new, pred

    def body(state):
        pose, pts, lam, it, done, nu = state
        pose_new, pts_new, cost, cost_new, pred = lm_iteration(pose, pts, lam)
        gain = (cost - cost_new) / jnp.maximum(pred, 1e-30)
        accept = (cost_new < cost) & (pred > 0)
        pose = jnp.where(accept, pose_new, pose)
        pts = jnp.where(accept, pts_new, pts)
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * gain - 1.0) ** 3)
        lam = jnp.clip(jnp.where(accept, lam_acc, lam * nu), 1e-12, 1e10)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        rel_drop = (cost - cost_new) / jnp.maximum(cost, 1e-30)
        done = accept & (rel_drop < 1e-9)
        return (pose, pts, lam, it + 1, done, nu)

    def cond(state):
        _, _, _, it, done, _ = state
        return (it < max_iters) & (~done)

    state = (jnp.asarray(pose0, jnp.float32), jnp.asarray(pts0, jnp.float32),
             jnp.asarray(1e-4), jnp.asarray(0), jnp.asarray(False),
             jnp.asarray(2.0))
    pose, pts, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    cost, _ = cost_irls(pose, pts)
    return pose, pts, cost
