"""Levenberg-Marquardt on device: the Ceres replacement.

Replaces ceres::Solve as configured by the reference's SetOptionsSfM /
SetOptionsLidar (util/Optimization.cpp:611-666): trust-region LM with Jacobi
preconditioning, max 20-50 iterations, CG for the normal equations.

TPU-first design decisions (vs. Ceres' CPU sparse-matrix assembly):
  * residual families are ResidualBlocks — one vmapped residual function per
    family over fixed-shape observation arrays with validity masks — so the
    whole evaluation is a handful of fused batched kernels;
  * JtJ is never materialized: Hv products come from jvp+vjp through the
    stacked residual function (matrix-free CG);
  * the preconditioner is the block-Jacobi of JtJ (one WxW block per
    parameter block), built from per-observation Jacobians via vmapped
    jacfwd and scatter-add — the analog of Ceres' JACOBI/SCHUR_JACOBI
    preconditioner (util/Optimization.cpp:617,655);
  * robust losses enter as IRLS weights sqrt(rho'(s)) frozen per outer
    iteration (gradient-stopped), matching the Gauss-Newton approximation
    Ceres uses for robustified problems;
  * gauge fixing (SetParameterBlockConstant, Optimization.cpp:49-57) is a
    boolean fixed-mask projected out of gradient, CG space and preconditioner.

Everything runs inside one jit; the LM loop is a lax.while_loop, so a whole
solve is a single device program — no host round-trips per iteration.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from . import robust


@jax.tree_util.register_pytree_node_class
class ResidualBlock:
    """One residual family: fn vmapped over M observations.

    fn(*params, *data) -> (r_dim,) raw residual for one observation, where
    params are the gathered parameter rows (one (W_g,) vector per group in
    `groups`) and data are per-observation constant arrays.
    """

    def __init__(self, fn: Callable, groups: tuple, indices: tuple, data: tuple,
                 weight, mask, loss: str = robust.TRIVIAL, loss_scale: float = 1.0,
                 name: str = ""):
        self.fn = fn
        self.groups = tuple(groups)
        self.indices = tuple(indices)
        self.data = tuple(data)
        self.weight = weight
        self.mask = mask
        self.loss = loss
        self.loss_scale = float(loss_scale)
        self.name = name

    def tree_flatten(self):
        children = (self.indices, self.data, self.weight, self.mask)
        aux = (self.fn, self.groups, self.loss, self.loss_scale, self.name)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        indices, data, weight, mask = children
        fn, groups, loss, loss_scale, name = aux
        return cls(fn, groups, indices, data, weight, mask, loss, loss_scale, name)


class LMOptions(NamedTuple):
    max_iters: int = 20          # reference SetOptionsLidar: 20
    cg_iters: int = 100          # reference max_linear_solver_iterations: 100
    cg_tol: float = 1e-6
    ftol: float = 1e-9
    init_lambda: float = 1e-4    # ceres default initial trust-region radius^-1
    max_lambda: float = 1e10
    min_lambda: float = 1e-12
    # Observation-axis chunk for residual/Jacobian evaluation. Per-observation
    # temporaries carry trailing (3,3)/(3,) shapes that TPU tiling pads ~40-60x
    # (a (655360,3,3) f32 temp costs 1.25 GB of HBM for 22.5 MB of data); at
    # Room-scale observation counts the unchunked program exceeds HBM at
    # compile time. lax.map over obs_chunk-sized slices bounds the live
    # padded temporaries while computing identical sums. None disables.
    obs_chunk: int | None = 65536
    # jacfwd pushes W tangent copies of those temporaries, so the
    # preconditioner pass chunks W-times finer.
    jac_chunk: int | None = 8192


# ----------------------------------------------------------------------------


def _gather_params(block: ResidualBlock, groups: dict):
    return [groups[g][idx] for g, idx in zip(block.groups, block.indices)]


def _safe_data(block: ResidualBlock):
    """Replace masked-out observation rows with a copy of some valid row.

    Padded/invalid rows routinely carry degenerate data (zero endpoints,
    zero plane normals). Their residuals are masked to zero, but reverse-mode
    AD still propagates (zero) cotangents through the residual function,
    where a 0/0 in a local partial turns into NaN and poisons the whole
    gradient (0 * inf = NaN — masking the output does not mask the chain
    rule). Substituting a valid row's data keeps every partial finite while
    the mask still zeroes those rows' contributions exactly.
    """
    if not block.data:
        return block.data
    j = jnp.argmax(block.mask)  # first valid row (0 if none)
    out = []
    for d in block.data:
        m = block.mask.reshape((-1,) + (1,) * (d.ndim - 1))
        out.append(jnp.where(m, d, d[j]))
    return tuple(out)


def _chunk_arrays(tree, chunk: int):
    """Reshape every (M, ...) array in the pytree to (K, chunk, ...), padding
    M up with copies of row 0 (callers mask the pad rows out; row-0 copies
    keep every AD partial finite, same rationale as _safe_data)."""
    leaves = jax.tree_util.tree_leaves(tree)
    M = leaves[0].shape[0] if leaves else 0
    K = -(-M // chunk)
    pad = K * chunk - M

    def prep(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)
        return a.reshape((K, chunk) + a.shape[1:])

    return jax.tree_util.tree_map(prep, tree), K, pad


def _use_chunk(block: ResidualBlock, chunk):
    """Chunk only when the observation axis exceeds the chunk. Callers with
    mesh-sharded blocks pass obs_chunk=None (per-device temporaries are
    already mesh-size smaller, and lax.map over a sharded axis would insert
    collectives per step)."""
    return chunk is not None and block.mask.shape[0] > chunk


def _raw_residuals(block: ResidualBlock, groups: dict, chunk=None):
    data = _safe_data(block)

    def eval_rows(idxs, datas, w, m):
        params = [groups[g][i] for g, i in zip(block.groups, idxs)]
        r = jax.vmap(block.fn)(*params, *datas)  # (m, r_dim)
        r = r * w[:, None]
        # final safety net (Ceres drops residual blocks with invalid
        # jacobians; we zero non-finite residuals the same way)
        r = jnp.where(jnp.isfinite(r), r, 0.0)
        return jnp.where(m[:, None], r, 0.0)

    if not _use_chunk(block, chunk):
        return eval_rows(block.indices, data, block.weight, block.mask)
    M = block.mask.shape[0]
    (idxs, datas, w, m), K, pad = _chunk_arrays(
        (block.indices, data, block.weight, block.mask), chunk)
    body = jax.checkpoint(lambda args: eval_rows(*args))
    r = jax.lax.map(body, (idxs, datas, w, m))
    r = r.reshape((K * chunk,) + r.shape[2:])
    return r[:M] if pad else r


def _block_cost_and_irls(block: ResidualBlock, groups: dict, chunk=None):
    r = _raw_residuals(block, groups, chunk)
    s = jnp.sum(r * r, axis=-1)
    cost = 0.5 * jnp.sum(jnp.where(block.mask, robust.rho(block.loss, s, block.loss_scale), 0.0))
    w = jnp.sqrt(robust.rho_prime(block.loss, s, block.loss_scale))
    return cost, jax.lax.stop_gradient(w)


def _whitened_flat(groups: dict, blocks: tuple, irls: tuple, chunk=None):
    """Concatenated IRLS-weighted residual vector (the 'F(x)' of GN)."""
    outs = []
    for block, w in zip(blocks, irls):
        r = _raw_residuals(block, groups, chunk)
        outs.append((r * w[:, None]).ravel())
    return jnp.concatenate(outs) if outs else jnp.zeros((0,))


def _total_cost(groups: dict, blocks: tuple, chunk=None):
    total = 0.0
    for block in blocks:
        c, _ = _block_cost_and_irls(block, groups, chunk)
        total = total + c
    return total


def _precond_blocks(groups: dict, blocks: tuple, irls: tuple, free: dict,
                    chunk=None):
    """Block-diagonal JtJ: one (W,W) block per parameter row of each group."""
    out = {g: jnp.zeros(v.shape + (v.shape[-1],), v.dtype) for g, v in groups.items()}
    for block, w in zip(blocks, irls):
        data = _safe_data(block)
        scale = (block.weight * w * block.mask.astype(w.dtype))  # (M,)
        for k, (g, idx) in enumerate(zip(block.groups, block.indices)):
            jac_fn = jax.jacfwd(block.fn, argnums=k)

            def jtj_rows(idxs, datas, sc):
                params = [groups[gg][ii]
                          for gg, ii in zip(block.groups, idxs)]
                J = jax.vmap(jac_fn)(*params, *datas)  # (m, r_dim, W)
                J = jnp.where(jnp.isfinite(J), J, 0.0)
                J = J * sc[:, None, None]
                return jnp.einsum("mri,mrj->mij", J, J,
                                  precision=jax.lax.Precision.HIGHEST)

            if not _use_chunk(block, chunk):
                out[g] = out[g].at[idx].add(
                    jtj_rows(block.indices, data, scale))
            else:
                (idxs, datas, sc, idx_c), K, _ = _chunk_arrays(
                    (block.indices, data, scale, idx), chunk)
                # pad rows scatter with weight 0 (scale pads row 0's value
                # but _chunk_arrays pads every array with row 0, so the pad
                # rows duplicate row 0's contribution — mask it explicitly)
                row = jnp.arange(K * chunk).reshape(K, chunk)
                sc = jnp.where(row < block.mask.shape[0], sc, 0.0)

                def body(acc, args):
                    ii, dd, ss, ix = args
                    return acc.at[ix].add(jtj_rows(ii, dd, ss)), None

                out[g], _ = jax.lax.scan(body, out[g],
                                         (idxs, datas, sc, idx_c))
    # zero out fixed coordinates (identity on them)
    for g in out:
        f = free[g].astype(out[g].dtype)  # (N, W) 1=free
        out[g] = out[g] * f[..., :, None] * f[..., None, :]
    return out


def _tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(jax.tree_util.tree_leaves(a),
                                              jax.tree_util.tree_leaves(b)))


def _pcg(Hv, b, Minv, iters: int, tol: float):
    """Preconditioned conjugate gradient for H x = b."""
    x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
    r0 = b
    z0 = Minv(r0)
    p0 = z0
    rz0 = _tree_dot(r0, z0)
    bnorm = jnp.sqrt(_tree_dot(b, b)) + 1e-30

    def cond(state):
        _, r, _, _, k, _ = state
        rn = jnp.sqrt(_tree_dot(r, r))
        return (k < iters) & (rn > tol * bnorm)

    def body(state):
        x, r, z, p, k, rz = state
        Hp = Hv(p)
        alpha = rz / (_tree_dot(p, Hp) + 1e-30)
        x = jax.tree_util.tree_map(lambda a, q: a + alpha * q, x, p)
        r = jax.tree_util.tree_map(lambda a, q: a - alpha * q, r, Hp)
        z = Minv(r)
        rz_new = _tree_dot(r, z)
        beta = rz_new / (rz + 1e-30)
        p = jax.tree_util.tree_map(lambda zz, pp: zz + beta * pp, z, p)
        return (x, r, z, p, k + 1, rz_new)

    x, _, _, _, _, _ = jax.lax.while_loop(cond, body, (x0, r0, z0, p0, 0, rz0))
    return x


@functools.partial(jax.jit, static_argnames=("options",))
def solve_lm(groups: dict, blocks: tuple, fixed: dict | None = None,
             options: LMOptions = LMOptions(), lam0=None, nu0=None):
    """Run LM. groups: {name: (N, W) array}. fixed: {name: (N, W) bool}
    marking frozen coordinates (gauge fixing). lam0/nu0 optionally resume
    the damping state (solve_lm_chunked). Returns (groups, info)."""
    if fixed is None:
        fixed = {g: jnp.zeros(v.shape, bool) for g, v in groups.items()}
    free = {g: ~fixed[g] for g in groups}

    def project(tree):
        return {g: jnp.where(free[g], tree[g], 0.0) for g in tree}

    def lm_iteration(x, lam):
        # cost, IRLS weights, gradient, preconditioner at x
        irls = tuple(_block_cost_and_irls(b, x, options.obs_chunk)[1]
                     for b in blocks)
        cost = _total_cost(x, blocks, options.obs_chunk)

        F = lambda p: _whitened_flat(p, blocks, irls, options.obs_chunk)
        r, pullback = jax.vjp(F, x)
        g = project(pullback(r)[0])  # J^T r

        B = _precond_blocks(x, blocks, irls, free, options.jac_chunk)
        # Marquardt scaling: D^2 = diag(JtJ)
        D2 = {k: jnp.diagonal(v, axis1=-2, axis2=-1) for k, v in B.items()}
        eps = 1e-10

        def Hv(v):
            v = project(v)
            _, jvp_out = jax.jvp(F, (x,), (v,))
            hv = project(pullback(jvp_out)[0])
            return {k: hv[k] + lam * (D2[k] + eps) * v[k] for k in hv}

        # block-Jacobi preconditioner of (JtJ + lam D^2)
        W = {k: v.shape[-1] for k, v in x.items()}
        eye = {k: jnp.eye(W[k], dtype=v.dtype) for k, v in x.items()}
        Bd = {}
        for k, v in B.items():
            damped = v + (lam * (D2[k] + eps))[..., None] * eye[k]
            # fixed coords: put 1 on the diagonal so the block stays invertible
            fixed_diag = jnp.where(free[k], 0.0, 1.0)
            damped = damped + fixed_diag[..., None] * eye[k]
            Bd[k] = damped

        def Minv(rhs):
            return {k: jnp.where(
                free[k],
                jnp.linalg.solve(Bd[k], rhs[k][..., None])[..., 0],
                0.0) for k in rhs}

        neg_g = {k: -g[k] for k in g}
        delta = _pcg(Hv, neg_g, Minv, options.cg_iters, options.cg_tol)
        delta = project(delta)

        x_new = {k: x[k] + delta[k] for k in x}
        cost_new = _total_cost(x_new, blocks, options.obs_chunk)

        # predicted reduction: 0.5 * delta^T (lam D^2 delta - g)
        pred = 0.5 * (sum(jnp.vdot(delta[k], lam * (D2[k] + eps) * delta[k] - g[k])
                          for k in x))
        return x_new, cost, cost_new, pred

    def cond(state):
        _, _, it, done, _ = state
        return (it < options.max_iters) & (~done)

    def body(state):
        x, lam, it, done, nu = state
        x_new, cost, cost_new, pred = lm_iteration(x, lam)
        gain = (cost - cost_new) / jnp.maximum(pred, 1e-30)
        accept = (cost_new < cost) & (pred > 0)
        x = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), x, x_new)
        # Nielsen lambda update
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * gain - 1.0) ** 3)
        lam_rej = lam * nu
        lam = jnp.where(accept, lam_acc, lam_rej)
        lam = jnp.clip(lam, options.min_lambda, options.max_lambda)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        rel_drop = (cost - cost_new) / jnp.maximum(cost, 1e-30)
        done = accept & (rel_drop < options.ftol)
        return (x, lam, it + 1, done, nu)

    init_cost = _total_cost(groups, blocks, options.obs_chunk)
    lam_init = jnp.asarray(options.init_lambda, init_cost.dtype) \
        if lam0 is None else jnp.asarray(lam0, init_cost.dtype)
    nu_init = jnp.asarray(2.0, init_cost.dtype) \
        if nu0 is None else jnp.asarray(nu0, init_cost.dtype)
    state = (groups, lam_init, jnp.asarray(0), jnp.asarray(False), nu_init)
    x, lam, iters, done, nu = jax.lax.while_loop(cond, body, state)
    final_cost = _total_cost(x, blocks, options.obs_chunk)
    info = {"initial_cost": init_cost, "final_cost": final_cost,
            "iterations": iters, "lambda": lam, "nu": nu, "done": done}
    return x, info


def solve_lm_chunked(groups: dict, blocks: tuple, fixed: dict | None = None,
                     options: LMOptions = LMOptions(), chunk: int = 5):
    """solve_lm split into several shorter device programs (chunk LM
    iterations each), carrying the damping state (lambda, nu) across so
    the LM trajectory is identical to one long program. Bounds
    per-dispatch runtime — long single programs can trip remote-worker
    watchdogs — at the cost of one host sync per chunk."""
    x = groups
    done_iters = 0
    lam = nu = None
    info = None
    first = True
    while done_iters < options.max_iters:
        it_chunk = min(chunk, options.max_iters - done_iters)
        opts = options._replace(max_iters=it_chunk)
        if first:
            x, info_c = solve_lm(x, blocks, fixed, opts)
        else:
            x, info_c = solve_lm(x, blocks, fixed, opts, lam0=lam, nu0=nu)
        lam, nu = info_c["lambda"], info_c["nu"]
        done_iters += int(info_c["iterations"])
        if info is None:
            info = dict(info_c)
        info["final_cost"] = info_c["final_cost"]
        info["lambda"] = lam
        info["nu"] = nu
        info["done"] = info_c["done"]
        info["iterations"] = jnp.asarray(done_iters)
        first = False
        if bool(info_c["done"]) or int(info_c["iterations"]) < it_chunk:
            break
    return x, info
