"""Exact L1 solvers via ADMM, and the Chatterjee-Govindu L1RA-IRLS
rotation refinement built on them.

Replaces (reference):
  * sfm/l1_solver_admm.hpp:118-188 — Boyd-style ADMM for min ||Ax - b||_1:
    x-update through a prefactored Cholesky of A^T A, soft-threshold
    z-update, scaled dual u, primal/dual stopping tests.
  * sfm/RotationAveraging.cpp:428-505 (RotationAveragingRefineL1, L1 stage)
    — outer loop: b_k = log(R_jw^T R_ji R_iw) per pair, L1-ADMM solve for
    per-camera axis-angle updates, right-multiplicative rotation update.
  * sfm/RotationAveraging.cpp:506-582 (IRLS stage) — reweighted normal
    equations with |e|^-1.5 (weight_function=1) or Geman-McClure sigma=5deg
    (weight_function=2) weights.

TPU-first design: the rotation-averaging system matrix is
A = (signed incidence of the pair graph, start row deleted) (x) I_3, so
A^T A = (reduced graph Laplacian) (x) I_3 and the three coordinate
channels decouple. We therefore never materialize the 3M x 3N matrix:
  * A x    -> one gather-subtract over edge endpoints, (M, 3) at a time;
  * A^T v  -> two scatter-adds;
  * the unweighted ADMM x-update reuses ONE dense Cholesky factor of the
    (N-1)x(N-1) reduced Laplacian for every ADMM iteration and every outer
    rotation round (the reference refactors a sparse LLT per Solve());
  * the IRLS stage batches the three per-coordinate weighted Laplacians
    through jnp.linalg.solve.
Both refinement loops run as lax.while_loop device programs: no host
round-trip per iteration, matching the do/while semantics (iter caps 32,
tol 1e-5 / relative 1e-2) of the reference.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import se3


def _shrinkage(v, kappa):
    """Soft threshold (l1_solver_admm.hpp:205-213)."""
    return jnp.maximum(v - kappa, 0.0) - jnp.maximum(-v - kappa, 0.0)


# ---------------------------------------------------------------------------
# Generic dense ADMM: min ||A x - b||_1
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iters",))
def solve_l1_dense(A, b, x0=None, rho: float = 1.0, alpha: float = 1.0,
                   abs_tol: float = 1e-4, rel_tol: float = 1e-2,
                   max_iters: int = 1000):
    """Dense min_x ||Ax - b||_1 (l1_solver_admm.hpp Solve, same defaults).

    A (m, n) float, b (m,). Returns x (n,). One Cholesky of A^T A up
    front; the ADMM loop is a lax.while_loop of triangular solves.
    """
    A = jnp.asarray(A, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    m, n = A.shape
    AtA = A.T @ A + 1e-8 * jnp.eye(n, dtype=A.dtype)
    chol = jnp.linalg.cholesky(AtA)
    x = jnp.zeros((n,), A.dtype) if x0 is None else jnp.asarray(x0, A.dtype)
    z = jnp.zeros((m,), A.dtype)
    u = jnp.zeros((m,), A.dtype)
    b_norm = jnp.linalg.norm(b)
    pri_eps0 = np.sqrt(m) * abs_tol
    dua_eps0 = np.sqrt(n) * abs_tol

    def cho_solve(rhs):
        y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)

    def cond(st):
        _, _, _, it, done = st
        return (it < max_iters) & ~done

    def body(st):
        x, z, u, it, _ = st
        x = cho_solve(A.T @ (b + z - u))
        ax = A @ x
        ax_hat = alpha * ax + (1.0 - alpha) * (z + b)
        z_new = _shrinkage(ax_hat - b + u, 1.0 / rho)
        u = u + (ax_hat - z_new - b)
        r_norm = jnp.linalg.norm(ax - z_new - b)
        s_norm = jnp.linalg.norm(rho * (A.T @ (z_new - z)))
        max_norm = jnp.maximum(jnp.maximum(jnp.linalg.norm(ax),
                                           jnp.linalg.norm(z_new)), b_norm)
        pri_eps = pri_eps0 + rel_tol * max_norm
        dua_eps = dua_eps0 + rel_tol * jnp.linalg.norm(rho * (A.T @ u))
        done = (r_norm < pri_eps) & (s_norm < dua_eps)
        return x, z_new, u, it + 1, done

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, z, u, jnp.int32(0), jnp.bool_(False)))
    return x


# ---------------------------------------------------------------------------
# Graph-incidence structure shared by the rotation-averaging stages
# ---------------------------------------------------------------------------

def _reduced_graph(n: int, pair_i, pair_j, start_idx: int):
    """Host prep: reduced indices (start camera deleted) + endpoint masks."""
    pair_i = np.asarray(pair_i, np.int64)
    pair_j = np.asarray(pair_j, np.int64)
    gi = pair_i - (pair_i >= start_idx)
    gj = pair_j - (pair_j >= start_idx)
    mi = (pair_i != start_idx).astype(np.float32)
    mj = (pair_j != start_idx).astype(np.float32)
    gi = np.where(mi > 0, gi, 0)
    gj = np.where(mj > 0, gj, 0)
    return (jnp.asarray(gi, jnp.int32), jnp.asarray(gj, jnp.int32),
            jnp.asarray(mi), jnp.asarray(mj))


def _apply_A(x_r, gi, gj, mi, mj):
    """A x: residual row of edge k is x[j] - x[i] (deleted camera -> 0)."""
    return x_r[gj] * mj[:, None] - x_r[gi] * mi[:, None]


def _apply_At(v, gi, gj, mi, mj, n_red):
    """A^T v via two scatter-adds, (M, C) -> (n_red, C)."""
    out = jnp.zeros((n_red, v.shape[1]), v.dtype)
    out = out.at[gj].add(v * mj[:, None])
    out = out.at[gi].add(-v * mi[:, None])
    return out


def _laplacian(gi, gj, mi, mj, n_red, w=None):
    """Dense reduced Laplacian; per-channel weights w (M, C) -> (C, nr, nr).

    Unweighted (w=None) returns (nr, nr), shared by every ADMM solve.
    """
    if w is None:
        w = jnp.ones((gi.shape[0], 1), jnp.float32)
    w = jnp.moveaxis(w, -1, 0)                          # (C, M)
    C = w.shape[0]
    L = jnp.zeros((C, n_red, n_red), jnp.float32)
    wii = w * (mi * mi)[None]
    wjj = w * (mj * mj)[None]
    wij = w * (mi * mj)[None]
    L = L.at[:, gi, gi].add(wii)
    L = L.at[:, gj, gj].add(wjj)
    L = L.at[:, gi, gj].add(-wij)
    L = L.at[:, gj, gi].add(-wij)
    L = L + 1e-8 * jnp.eye(n_red)[None]
    return L[0] if C == 1 else L


def _pair_log_errors(R, gi_full, gj_full, R_rel):
    """b_k = log(R_jw^T R_ji R_iw) for every pair (RotationAveraging.cpp
    :468-482), batched matmuls + vmapped log map."""
    E = jnp.einsum("mab,mac,mcd->mbd", R[gj_full], R_rel, R[gi_full])
    return jax.vmap(se3.log_so3)(E)


def _scatter_update(R, x_r, start_idx):
    """R_cw <- R_cw exp(x_c) with x[start_idx] = 0 (right-multiplicative
    update, RotationAveraging.cpp:491-503)."""
    n = R.shape[0]
    full = jnp.zeros((n, 3), x_r.dtype)
    idx = jnp.asarray(
        [i - (i >= start_idx) if i != start_idx else 0 for i in range(n)],
        jnp.int32)
    keep = jnp.asarray([i != start_idx for i in range(n)], bool)
    full = jnp.where(keep[:, None], x_r[idx], 0.0)
    upd = jax.vmap(se3.exp_so3)(full)
    return jnp.einsum("nab,nbc->nac", R, upd)


@functools.partial(jax.jit,
                   static_argnames=("start_idx", "weight_function",
                                    "max_outer", "admm_iters"))
def refine_rotations_l1_irls(R0, pair_i_full, pair_j_full, R_rel,
                             gi, gj, mi, mj, start_idx: int,
                             weight_function: int = 1,
                             max_outer: int = 32, admm_iters: int = 400):
    """RotationAveragingRefineL1 (RotationAveraging.cpp:428-582), exact:
    L1-ADMM outer loop then IRLS, both as device while_loops.

    R0 (N, 3, 3) world->camera rotations (R[start_idx] must be identity),
    R_rel (M, 3, 3) measured R_ji for pairs (i, j). gi/gj/mi/mj from
    _reduced_graph. Returns refined R (N, 3, 3).
    """
    n = R0.shape[0]
    n_red = n - 1
    m = R_rel.shape[0]
    L = _laplacian(gi, gj, mi, mj, n_red)               # unweighted, shared
    chol = jnp.linalg.cholesky(L)

    def cho_solve(rhs):
        y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)

    pri_eps0 = np.sqrt(3 * m) * 1e-4
    dua_eps0 = np.sqrt(3 * n_red) * 1e-4

    def admm(b):
        """min ||A x - b||_1, rho = alpha = 1 (reference defaults)."""
        b_norm = jnp.linalg.norm(b)

        def cond(st):
            _, _, _, it, done = st
            return (it < admm_iters) & ~done

        def body(st):
            x, z, u, it, _ = st
            x = cho_solve(_apply_At(b + z - u, gi, gj, mi, mj, n_red))
            ax = _apply_A(x, gi, gj, mi, mj)
            z_new = _shrinkage(ax - b + u, 1.0)
            u = u + (ax - z_new - b)
            r_norm = jnp.linalg.norm(ax - z_new - b)
            s_norm = jnp.linalg.norm(
                _apply_At(z_new - z, gi, gj, mi, mj, n_red))
            max_norm = jnp.maximum(jnp.maximum(jnp.linalg.norm(ax),
                                               jnp.linalg.norm(z_new)),
                                   b_norm)
            done = ((r_norm < pri_eps0 + 1e-2 * max_norm) &
                    (s_norm < dua_eps0 + 1e-2 * jnp.linalg.norm(
                        _apply_At(u, gi, gj, mi, mj, n_red))))
            return x, z_new, u, it + 1, done

        x0 = jnp.zeros((n_red, 3), jnp.float32)
        z0 = jnp.zeros((m, 3), jnp.float32)
        x, _, _, _, _ = jax.lax.while_loop(
            cond, body, (x0, z0, z0, jnp.int32(0), jnp.bool_(False)))
        return x

    # ---- L1 stage (do/while, RotationAveraging.cpp:466-505) -------------
    def l1_cond(st):
        _, last_e, curr_e, it, stop = st
        return ((it < max_outer) & (curr_e > 1e-5) &
                ((last_e - curr_e) / curr_e > 1e-2) & ~stop) | (it == 0)

    def l1_body(st):
        R, _, curr_e, it, _ = st
        b = _pair_log_errors(R, pair_i_full, pair_j_full, R_rel)
        x = admm(b)
        last_e, new_e = curr_e, jnp.linalg.norm(x)
        stop = last_e < new_e                 # error grew: keep previous R
        R = jnp.where(stop, R, _scatter_update(R, x, start_idx))
        return R, last_e, new_e, it + 1, stop

    big = jnp.float32(np.finfo(np.float32).max)
    R, _, _, _, _ = jax.lax.while_loop(
        l1_cond, l1_body, (R0, big, big, jnp.int32(0), jnp.bool_(False)))

    # ---- IRLS stage (RotationAveraging.cpp:506-582) ----------------------
    sq_sigma = jnp.float32((5.0 * np.pi / 180.0) ** 2)

    def irls_cond(st):
        _, _, last_e, curr_e, it = st
        return ((it < max_outer) & (curr_e > 1e-5) &
                ((last_e - curr_e) / curr_e > 1e-2)) | (it == 0)

    def irls_body(st):
        R, x, _, curr_e, it = st
        b = _pair_log_errors(R, pair_i_full, pair_j_full, R_rel)
        e = _apply_A(x, gi, gj, mi, mj) - b
        if weight_function == 1:
            w = jnp.abs(e) ** -1.5            # reference: raw pow(-1.5)
            w = jnp.minimum(w, 1e6)           # guard exact zeros only
        else:
            w = sq_sigma / (e * e + sq_sigma) ** 2
        Lw = _laplacian(gi, gj, mi, mj, n_red, w)        # (3, nr, nr)
        rhs = _apply_At(w * b, gi, gj, mi, mj, n_red)    # (nr, 3)
        x_new = jnp.linalg.solve(Lw, rhs.T[..., None])[..., 0].T
        R = _scatter_update(R, x_new, start_idx)
        return R, x_new, curr_e, jnp.linalg.norm(x - x_new), it + 1

    x0 = jnp.zeros((n_red, 3), jnp.float32)
    R, _, _, _, _ = jax.lax.while_loop(
        irls_cond, irls_body, (R, x0, big, big, jnp.int32(0)))
    return R


def rotation_refine_l1_irls(n_frames, pair_i, pair_j, rel_aa, aa0,
                            start_idx: int = 0, weight_function: int = 1):
    """Convenience wrapper: axis-angle in/out around refine_rotations_l1_irls.

    aa0 (N, 3) world->camera axis-angle init (from the spanning tree);
    rel_aa (M, 3) measured relative rotations R_ji. The gauge camera
    start_idx is re-anchored to identity first (the reference asserts the
    tree root is identity, RotationAveraging.cpp:391)."""
    R0 = jax.vmap(se3.exp_so3)(jnp.asarray(aa0, jnp.float32))
    R0 = jnp.einsum("nab,cb->nac", R0, R0[start_idx])    # R_cw R_sw^T
    R_rel = jax.vmap(se3.exp_so3)(jnp.asarray(rel_aa, jnp.float32))
    gi, gj, mi, mj = _reduced_graph(n_frames, pair_i, pair_j, start_idx)
    R = refine_rotations_l1_irls(
        R0, jnp.asarray(pair_i, jnp.int32), jnp.asarray(pair_j, jnp.int32),
        R_rel, gi, gj, mi, mj, start_idx, weight_function)
    return np.asarray(jax.vmap(se3.log_so3)(R), np.float32)
