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
import numpy as np

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
                 name: str = "", run_length: int = 1):
        self.fn = fn
        self.groups = tuple(groups)
        self.indices = tuple(indices)
        self.data = tuple(data)
        self.weight = weight
        self.mask = mask
        self.loss = loss
        self.loss_scale = float(loss_scale)
        self.name = name
        # Static structure hint: every index array is constant over
        # consecutive runs of this length (the pair x point layout of the
        # LiDAR blocks: indices = repeat(pair_ids, P)). JtJ assembly then
        # sums each run's outer-product blocks BEFORE the scatter-add — the
        # scatter (the slow per-element path on TPU, PERF.md gather rate)
        # shrinks by the run length. 1 = no structure.
        self.run_length = int(run_length)

    def tree_flatten(self):
        children = (self.indices, self.data, self.weight, self.mask)
        aux = (self.fn, self.groups, self.loss, self.loss_scale, self.name,
               self.run_length)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        indices, data, weight, mask = children
        fn, groups, loss, loss_scale, name, run_length = aux
        return cls(fn, groups, indices, data, weight, mask, loss, loss_scale,
                   name, run_length)


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
    # Track-axis chunk for the Schur elimination pass.
    schur_t_chunk: int = 1024
    # When the total free parameter dimension P = sum(N_g * W_g) is at most
    # this, materialize the full dense normal equations H = J^T J (one
    # chunked Jacobian pass scatter-added into a (P, P) matrix) and solve
    # (H + lam D^2) delta = -g with a single dense factorization on the MXU,
    # instead of matrix-free PCG. PCG costs 2 full residual passes per CG
    # iteration (~200 passes per LM iteration at cg_iters=100); dense-H costs
    # ~3 passes total per LM iteration. This mirrors Ceres' solver tiering
    # (SetOptionsLidar, util/Optimization.cpp:638-666: dense below 50 poses,
    # sparse below 2000, iterative Schur above) and bounds per-dispatch device
    # time, which the axon remote worker requires. 0 disables.
    dense_max_params: int = 6144


# ----------------------------------------------------------------------------


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


def _chunk_slices(tree, chunk: int):
    """Slice-based chunk access over a pytree of (M, ...) arrays: returns
    (K_full, rem, slice_k, tail) where slice_k(k) yields the k-th
    (chunk, ...) window via lax.dynamic_slice_in_dim and tail() the final
    (rem, ...) remainder (both static shapes).

    This replaces reshape-based chunking on purpose: reshaping a big
    (M, 3) array to (K, chunk, 3) — or even (K, chunk*3) — materializes a
    lane-padded relayout on TPU (a size-3 minor dim tiles up to the
    128-lane width: 42.7x HBM, 6.4 GB of temp at the Floor-1593 odometry
    shape, the compile-time OOM), while dynamic slices read the compact
    layout with ZERO temp (both measured via compile memory_analysis,
    PERF.md round-5). No padding rows exist, so no pad masking either."""
    leaves = jax.tree_util.tree_leaves(tree)
    M = leaves[0].shape[0] if leaves else 0
    K_full = M // chunk
    rem = M - K_full * chunk

    def slice_k(k):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, k * chunk, chunk, 0),
            tree)

    def tail():
        return jax.tree_util.tree_map(lambda a: a[K_full * chunk:], tree)

    return K_full, rem, slice_k, tail


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
    (idxs, datas, w, m), K, pad, restore = _chunk_arrays(
        (block.indices, data, block.weight, block.mask), chunk)
    # the stacked map OUTPUT flattens (chunk, r_dim) -> (chunk*r_dim,) for
    # the same lane-padding reason _chunk_arrays flattens its inputs
    body = jax.checkpoint(lambda args: eval_rows(*restore(args)).reshape(-1))
    r = jax.lax.map(body, (idxs, datas, w, m))
    r = r.reshape((K * chunk, -1))
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


def _res_dim(block: ResidualBlock, groups: dict) -> int:
    """Static residual dimension of one observation (shape-only trace)."""
    params = [jax.ShapeDtypeStruct(groups[g].shape[1:], groups[g].dtype)
              for g in block.groups]
    datas = [jax.ShapeDtypeStruct(d.shape[1:], d.dtype) for d in block.data]
    return jax.eval_shape(block.fn, *params, *datas).shape[0]


def _jac_fn(block: ResidualBlock, groups: dict, r_dim: int, argnums):
    """Per-observation Jacobian(s): reverse mode when the residual is
    lower-dimensional than the differentiated parameters (the LiDAR angle
    residuals are scalar, so ONE backward pass replaces W forward
    tangents), forward mode otherwise. Cost model: jacfwd ~ sum(Wk)
    tangent passes, jacrev ~ r_dim pullbacks."""
    ks = (argnums,) if isinstance(argnums, int) else argnums
    total_w = sum(groups[block.groups[k]].shape[-1] for k in ks)
    if r_dim * 2 <= total_w:
        return jax.jacrev(block.fn, argnums=argnums)
    return jax.jacfwd(block.fn, argnums=argnums)


def _run_length(block: ResidualBlock) -> int:
    """Effective run length (1 when the layout hint does not divide M)."""
    rl = block.run_length
    M = block.mask.shape[0]
    return rl if rl > 1 and M % rl == 0 else 1


def _run_chunk(chunk: int, rl: int) -> int:
    """Largest chunk <= `chunk` that is a multiple of the run length (so
    run reduction never straddles a chunk boundary)."""
    return max(rl, chunk // rl * rl)


def _precond_blocks(groups: dict, blocks: tuple, irls: tuple, free: dict,
                    chunk=None):
    """Block-diagonal JtJ: one (W,W) block per parameter row of each group."""
    out = {g: jnp.zeros(v.shape + (v.shape[-1],), v.dtype) for g, v in groups.items()}
    for block, w in zip(blocks, irls):
        data = _safe_data(block)
        scale = (block.weight * w * block.mask.astype(w.dtype))  # (M,)
        rd = _res_dim(block, groups)
        rl = _run_length(block)
        for k, (g, idx) in enumerate(zip(block.groups, block.indices)):
            jac_fn = _jac_fn(block, groups, rd, k)

            def jtj_rows(idxs, datas, sc):
                params = [groups[gg][ii]
                          for gg, ii in zip(block.groups, idxs)]
                J = jax.vmap(jac_fn)(*params, *datas)  # (m, r_dim, W)
                J = jnp.where(jnp.isfinite(J), J, 0.0)
                J = J * sc[:, None, None]
                blk = jnp.einsum("mri,mrj->mij", J, J,
                                 precision=jax.lax.Precision.HIGHEST)
                if rl > 1:  # sum each constant-index run before scattering
                    blk = blk.reshape((blk.shape[0] // rl, rl)
                                      + blk.shape[1:]).sum(1)
                return blk

            if not _use_chunk(block, chunk):
                out[g] = out[g].at[idx[::rl]].add(
                    jtj_rows(block.indices, data, scale))
            else:
                ck = _run_chunk(chunk, rl)
                (idxs, datas, sc, idx_c), K, _, restore = _chunk_arrays(
                    (block.indices, data, scale, idx), ck)
                # pad rows scatter with weight 0 (scale pads row 0's value
                # but _chunk_arrays pads every array with row 0, so the pad
                # rows duplicate row 0's contribution — mask it explicitly)
                row = jnp.arange(K * ck).reshape(K, ck)
                sc = jnp.where(row < block.mask.shape[0], sc, 0.0)

                def body(acc, args):
                    ii, dd, ss, ix = restore(args)
                    return acc.at[ix[::rl]].add(jtj_rows(ii, dd, ss)), None

                out[g], _ = jax.lax.scan(body, out[g],
                                         (idxs, datas, sc, idx_c))
    # zero out fixed coordinates (identity on them)
    for g in out:
        f = free[g].astype(out[g].dtype)  # (N, W) 1=free
        out[g] = out[g] * f[..., :, None] * f[..., None, :]
    return out


def _flat_layout(groups: dict):
    """Deterministic flattening of {g: (N, W)} into one P-vector."""
    keys = sorted(groups)
    offs, P = {}, 0
    for g in keys:
        N, W = groups[g].shape
        offs[g] = P
        P += N * W
    return keys, offs, P


def _flatten_tree(tree, keys):
    return jnp.concatenate([tree[g].reshape(-1) for g in keys])


def _unflatten_vec(v, groups, keys, offs):
    out = {}
    for g in keys:
        N, W = groups[g].shape
        out[g] = jax.lax.dynamic_slice_in_dim(v, offs[g], N * W).reshape(N, W)
    return out


def _dense_hessian(groups: dict, blocks: tuple, irls: tuple, offs: dict,
                   P: int, chunk=None, skip_groups: frozenset = frozenset()):
    """Materialize the full whitened J^T J as a dense (P, P) matrix.

    One chunked Jacobian pass per residual block: per-observation jacfwd
    w.r.t. every parameter argument, then W_a x W_b outer-product blocks
    scatter-added at flat (row, col) offsets. Equals what matrix-free CG
    applies implicitly; materializing it turns the linear solve into one
    MXU factorization instead of ~2*cg_iters residual passes.

    skip_groups: parameter arguments of these groups are excluded (their
    rows live in the eliminated half of a Schur split)."""
    Hf = jnp.zeros((P * P,), jnp.float32)
    for block, w in zip(blocks, irls):
        args_k = [k for k in range(len(block.groups))
                  if block.groups[k] not in skip_groups]
        if not args_k:
            continue
        data = _safe_data(block)
        scale = block.weight * w * block.mask.astype(w.dtype)
        rd = _res_dim(block, groups)
        rl = _run_length(block)
        jac_multi = _jac_fn(block, groups, rd, tuple(args_k))

        def hess_rows(idxs, datas, sc):
            params = [groups[g][i] for g, i in zip(block.groups, idxs)]
            Jt = jax.vmap(jac_multi)(*params, *datas)
            if not isinstance(Jt, (tuple, list)):
                Jt = (Jt,)
            Js, rows = {}, {}
            for k, J in zip(args_k, Jt):
                J = jnp.where(jnp.isfinite(J), J, 0.0) * sc[:, None, None]
                Js[k] = J                               # (m, r, Wk)
                Wk = J.shape[-1]
                # one flat row-id vector per RUN (indices constant inside)
                rows[k] = (offs[block.groups[k]]
                           + idxs[k][::rl, None] * Wk
                           + jnp.arange(Wk)[None, :])
            fidx, vals = [], []
            for a in args_k:
                for b in args_k:
                    blk = jnp.einsum("mra,mrb->mab", Js[a], Js[b],
                                     precision=jax.lax.Precision.HIGHEST)
                    if rl > 1:  # sum each run before the scatter-add
                        blk = blk.reshape((blk.shape[0] // rl, rl)
                                          + blk.shape[1:]).sum(1)
                    f = rows[a][:, :, None] * P + rows[b][:, None, :]
                    fidx.append(f.reshape(-1))
                    vals.append(blk.reshape(-1))
            return jnp.concatenate(fidx), jnp.concatenate(vals)

        if not _use_chunk(block, chunk):
            f, v = hess_rows(block.indices, data, scale)
            Hf = Hf.at[f].add(v)
        else:
            ck = _run_chunk(chunk, rl)
            (idxs, datas, sc), K, _, restore = _chunk_arrays(
                (block.indices, data, scale), ck)
            row = jnp.arange(K * ck).reshape(K, ck)
            sc = jnp.where(row < block.mask.shape[0], sc, 0.0)

            def body(acc, args):
                ii, dd, ss = restore(args)
                f, v = hess_rows(ii, dd, ss)
                return acc.at[f].add(v), None

            Hf, _ = jax.lax.scan(body, Hf, (idxs, datas, sc))
    return Hf.reshape(P, P)


class SchurSpec(NamedTuple):
    """Static description of a Schur elimination: `group` appears in exactly
    one residual block (index `block`), exactly once per observation, with
    the observation axis laid out as repeat(arange(T), L) — i.e. row t of
    the group owns observations [t*L, (t+1)*L). That makes H[group, group]
    block-diagonal (W_E x W_E per row), the classic BA structure Ceres
    exploits with SCHUR solvers (SetOptionsSfM, util/Optimization.cpp:611)."""
    group: str
    block: int
    T: int
    L: int


def make_schur_spec(groups: dict, blocks: tuple, group: str = "pts"):
    """Host-side layout check; returns a SchurSpec or None if the problem
    does not have the eliminable structure."""
    if group not in groups:
        return None
    refs = [i for i, b in enumerate(blocks) if group in b.groups]
    if len(refs) != 1:
        return None
    b = blocks[refs[0]]
    if sum(g == group for g in b.groups) != 1:
        return None
    if all(g == group for g in b.groups):  # no coupling to eliminate against
        return None
    idx = np.asarray(b.indices[b.groups.index(group)])
    T = groups[group].shape[0]
    if T == 0 or idx.shape[0] % T:
        return None
    L = idx.shape[0] // T
    if not np.array_equal(idx, np.repeat(np.arange(T), L)):
        return None
    return SchurSpec(group=group, block=refs[0], T=T, L=L)


def bucket_schur_points(groups: dict, blocks: tuple, fixed: dict,
                        track_mask, group: str = "pts",
                        short_cap: int = 48):
    """Split a Schur-eliminable track group into short/long length buckets.

    The padded (T, L) track layout is sized by the LONGEST track while the
    median is ~10x shorter (Room-454: L=213, mean 18.8 — 91% masked
    slots), and the Schur passes pay for every slot. Rewrites `group` into
    `<group>_s` (tracks with <= short_cap valid obs, truncated to
    short_cap columns — lossless, tracks are front-packed) and
    `<group>_l` (the rest at full L), each with its own residual block and
    SchurSpec; elimination stays exact because no block references both.

    track_mask: the (T, L) FRONT-PACKED track validity used for lengths
    (the block's own mask may carry interior holes from frame gating).
    Returns (groups, blocks, fixed, specs, reassemble) where
    reassemble(out_groups) -> full (T, W) array of the eliminated group;
    specs is () when the layout is not eliminable (callers fall back)."""
    spec = make_schur_spec(groups, blocks, group)
    if spec is None:
        return groups, blocks, fixed, (), None
    T, L = spec.T, spec.L
    tm = np.asarray(track_mask)
    assert tm.shape == (T, L), (tm.shape, T, L)
    lens = tm.sum(1)
    Lc = int(min(short_cap, L))
    idx_s = np.nonzero(lens <= Lc)[0]
    idx_l = np.nonzero(lens > Lc)[0]
    b = blocks[spec.block]
    ke = b.groups.index(group)
    # lossless-truncation guard: no live observation of a short track may
    # sit beyond the truncation point (holds when tracks are front-packed)
    bm = np.asarray(b.mask).reshape(T, L)
    if Lc < L and len(idx_s) and bm[idx_s, Lc:].any():
        return groups, blocks, fixed, (spec,), None

    def sub_block(bidx, Lc2, gname):
        def cut(a):
            a2 = np.asarray(a).reshape((T, L) + np.asarray(a).shape[1:])
            return jnp.asarray(
                a2[bidx][:, :Lc2].reshape((-1,) + a2.shape[2:]))

        idxs = tuple(
            jnp.asarray(np.repeat(np.arange(len(bidx), dtype=np.int32), Lc2))
            if k == ke else cut(ik)
            for k, ik in enumerate(b.indices))
        gnames = tuple(gname if k == ke else gk
                       for k, gk in enumerate(b.groups))
        return ResidualBlock(b.fn, gnames, idxs,
                             tuple(cut(d) for d in b.data),
                             cut(b.weight), cut(b.mask),
                             loss=b.loss, loss_scale=b.loss_scale,
                             name=f"{b.name}_{gname}")

    buckets = [(idx_s, Lc, f"{group}_s")] if len(idx_s) else []
    if len(idx_l):
        buckets.append((idx_l, L, f"{group}_l"))
    if len(buckets) < 2 and not (len(buckets) == 1 and buckets[0][1] < L):
        return groups, blocks, fixed, (spec,), None  # nothing to gain

    g2 = {k: v for k, v in groups.items() if k != group}
    f2 = {k: v for k, v in fixed.items() if k != group}
    b2 = [bb for i, bb in enumerate(blocks) if i != spec.block]
    specs = []
    for bidx, Lc2, gname in buckets:
        g2[gname] = jnp.asarray(np.asarray(groups[group])[bidx])
        f2[gname] = jnp.asarray(np.asarray(fixed[group])[bidx])
        specs.append(SchurSpec(group=gname, block=len(b2),
                               T=len(bidx), L=Lc2))
        b2.append(sub_block(bidx, Lc2, gname))

    W = np.asarray(groups[group]).shape[1]

    def reassemble(out: dict):
        full = np.zeros((T, W), np.asarray(groups[group]).dtype)
        for bidx, _, gname in buckets:
            full[bidx] = np.asarray(out[gname])
        return full

    return g2, tuple(b2), f2, tuple(specs), reassemble


def _schur_pass(groups: dict, block: ResidualBlock, w, free, spec,
                offs: dict, Pr: int, lam, gE, t_chunk: int, dxf=None):
    """Per-track elimination of the E-group from the one block referencing
    it (the RCS/Schur trick of BA solvers; Ceres SPARSE_SCHUR,
    util/Optimization.cpp:611).

    dxf=None (reduction pass): returns (S_corr (Pr,Pr), rhs_corr (Pr,),
    dV (T,WE)) where S_corr = U V'^-1 U^T and rhs_corr = U V'^-1 gE.
    dxf given (back-substitution pass): recomputes the per-track factors
    and returns dp = V'^-1 (-gE - U^T dxf), shape (T, WE).

    TPU design: never materialize per-observation-pair (L, L, Wa, Wb)
    blocks — with long tracks those tile-pad to tens of GB. Instead each
    track scatters its U and Y = U V'^-1 rows into a (WE, Pr) slab and the
    chunk's S contribution is ONE batched matmul sum_t Y_t U_t^T over the
    (track, WE) axes — MXU-shaped, O(Pr^2) memory. Back-substitution
    recomputes Jacobians in a second pass instead of storing (T, L, Wa, WE)
    coupling blocks (which would tile-pad ~40x)."""
    eps = 1e-10
    T, L = spec.T, spec.L
    data = _safe_data(block)
    scale = block.weight * w * block.mask.astype(w.dtype)
    nargs = len(block.groups)
    ke = block.groups.index(spec.group)
    ks = [k for k in range(nargs) if k != ke]
    jac_fns = {k: jax.jacfwd(block.fn, argnums=k) for k in range(nargs)}
    WE = groups[spec.group].shape[1]

    # bound per-chunk observation rows: tc*L <= ~32k keeps the padded
    # (rows, r, W) Jacobian temporaries in the low hundreds of MB
    t_chunk = max(1, min(t_chunk, 32768 // max(L, 1)))

    def tl(a):  # (T*L, ...) -> (T, L, ...)
        return a.reshape((T, L) + a.shape[1:])

    tree = (tuple(tl(i) for i in block.indices),
            tuple(tl(d) for d in data), tl(scale),
            free[spec.group].astype(jnp.float32), gE)
    K = -(-T // t_chunk)
    pad = K * t_chunk - T

    def prep(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)
        return a.reshape((K, t_chunk) + a.shape[1:])

    idxs_c, datas_c, sc_c, fE_c, gE_c = jax.tree_util.tree_map(prep, tree)
    if pad:  # pad tracks contribute nothing
        trow = jnp.arange(K * t_chunk).reshape(K, t_chunk)
        sc_c = jnp.where(trow[..., None] < T, sc_c, 0.0)
        gE_c = jnp.where(trow[..., None] < T, gE_c, 0.0)
    chunks = (idxs_c, datas_c, sc_c, fE_c, gE_c)

    def factors(ii, dd, ss, fE):
        """Per-chunk track factors: U rows concatenated over rest-args
        ((tc, R, WE) with R = L * sum(Wa)), their flat row ids (tc, R),
        V'^-1 (tc, WE, WE) and diag(V) (tc, WE)."""
        tc = ss.shape[0]
        flat = lambda a: a.reshape((tc * L,) + a.shape[2:])
        params = [groups[g][flat(i)] for g, i in zip(block.groups, ii)]
        datas = [flat(d) for d in dd]
        sflat = flat(ss)
        Js = {}
        for k in range(nargs):
            J = jax.vmap(jac_fns[k])(*params, *datas)
            J = jnp.where(jnp.isfinite(J), J, 0.0) * sflat[:, None, None]
            Js[k] = J.reshape((tc, L) + J.shape[1:])
        JE = Js[ke] * fE[:, None, None, :]               # (tc, L, r, WE)
        V = jnp.einsum("tlra,tlrb->tab", JE, JE,
                       precision=jax.lax.Precision.HIGHEST)
        dV = jnp.einsum("tii->ti", V)
        Vd = V + jax.vmap(jnp.diag)(lam * (dV + eps) + (1.0 - fE))
        Vinv = jnp.linalg.inv(Vd)
        Ucat, rowcat = [], []
        for a in ks:
            Ja = Js[a]                                    # (tc, L, r, Wa)
            Wa = Ja.shape[-1]
            # zero coupling into gauge-fixed rest coordinates (the dense
            # path zeroes those H rows; U must match)
            fa = free[block.groups[a]].astype(Ja.dtype)[ii[a]]  # (tc, L, Wa)
            Ja = Ja * fa[:, :, None, :]
            U = jnp.einsum("tlra,tlrb->tlab", Ja, JE,
                           precision=jax.lax.Precision.HIGHEST)
            ra = (offs[block.groups[a]] + ii[a][..., None] * Wa
                  + jnp.arange(Wa))                       # (tc, L, Wa)
            Ucat.append(U.reshape(tc, L * Wa, WE))
            rowcat.append(ra.reshape(tc, L * Wa))
        U = jnp.concatenate(Ucat, axis=1)
        rows = jnp.concatenate(rowcat, axis=1)
        return U, rows, Vinv, dV

    if dxf is not None:
        def body_bs(_, args):
            ii, dd, ss, fE, gg = args
            U, rows, Vinv, _ = factors(ii, dd, ss, fE)
            acc = -gg - jnp.einsum("tre,tr->te", U, dxf[rows],
                                    precision=jax.lax.Precision.HIGHEST)
            return None, jnp.einsum("tef,tf->te", Vinv, acc,
                                    precision=jax.lax.Precision.HIGHEST)

        _, dp = jax.lax.scan(body_bs, None, chunks)
        return dp.reshape(K * t_chunk, WE)[:T]

    def body(carry, args):
        Sf, rhs = carry
        ii, dd, ss, fE, gg = args
        U, rows, Vinv, dV = factors(ii, dd, ss, fE)
        Y = jnp.einsum("tre,tef->trf", U, Vinv,          # (tc, R, WE)
                       precision=jax.lax.Precision.HIGHEST)

        def scat(rows_t, M_t):  # (R,), (R, WE) -> (WE, Pr)
            return jnp.zeros((WE, Pr), jnp.float32).at[:, rows_t].add(M_t.T)

        Wt = jax.vmap(scat)(rows, Y)                     # (tc, WE, Pr)
        Ut = jax.vmap(scat)(rows, U)
        Sf = Sf + jnp.einsum("tep,teq->pq", Wt, Ut,
                             precision=jax.lax.Precision.HIGHEST)
        rhs = rhs + jnp.einsum("tep,te->p", Wt, gg,
                               precision=jax.lax.Precision.HIGHEST)
        return (Sf, rhs), dV

    (Sf, rhs), dV = jax.lax.scan(
        body, (jnp.zeros((Pr, Pr), jnp.float32), jnp.zeros((Pr,), jnp.float32)),
        chunks)
    return Sf, rhs, dV.reshape(K * t_chunk, WE)[:T]


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


@functools.partial(jax.jit, static_argnames=("options", "schur"))
def solve_lm(groups: dict, blocks: tuple, fixed: dict | None = None,
             options: LMOptions = LMOptions(), lam0=None, nu0=None,
             schur: SchurSpec | None = None):
    """Run LM. groups: {name: (N, W) array}. fixed: {name: (N, W) bool}
    marking frozen coordinates (gauge fixing). lam0/nu0 optionally resume
    the damping state (solve_lm_chunked). schur: optional SchurSpec — or
    tuple of specs over DISJOINT groups/blocks (e.g. short/long track
    buckets) — eliminating large block-diagonal groups (BA points) so the
    reduced system solves densely. Returns (groups, info)."""
    if fixed is None:
        fixed = {g: jnp.zeros(v.shape, bool) for g, v in groups.items()}
    free = {g: ~fixed[g] for g in groups}
    keys, offs, P = _flat_layout(groups)
    specs = (schur,) if isinstance(schur, SchurSpec) else tuple(schur or ())
    specs = tuple(s for s in specs if s is not None)
    if specs:
        sgroups = frozenset(s.group for s in specs)
        rest = {g: v for g, v in groups.items() if g not in sgroups}
        keys_r, offs_r, Pr = _flat_layout(rest)
        if not rest or not options.dense_max_params \
                or Pr > options.dense_max_params:
            specs = ()
    dense = (not specs and bool(options.dense_max_params)
             and P <= options.dense_max_params)

    def project(tree):
        return {g: jnp.where(free[g], tree[g], 0.0) for g in tree}

    def lm_iteration(x, lam):
        # cost + IRLS weights in ONE residual pass per block (a separate
        # _total_cost call would re-evaluate every residual)
        ci = [_block_cost_and_irls(b, x, options.obs_chunk) for b in blocks]
        irls = tuple(w for _, w in ci)
        cost = sum((c for c, _ in ci), jnp.asarray(0.0))

        F = lambda p: _whitened_flat(p, blocks, irls, options.obs_chunk)
        r, pullback = jax.vjp(F, x)
        g = project(pullback(r)[0])  # J^T r

        if specs:
            eps = 1e-10
            A = _dense_hessian(x, blocks, irls, offs_r, Pr,
                               options.jac_chunk, skip_groups=sgroups)
            fvec = _flatten_tree(
                {k: free[k].astype(jnp.float32) for k in keys_r}, keys_r)
            A = A * fvec[:, None] * fvec[None, :]
            grf = _flatten_tree({k: g[k] for k in keys_r}, keys_r)
            Sf_sum = jnp.zeros((Pr, Pr), jnp.float32)
            rhs_sum = jnp.zeros((Pr,), jnp.float32)
            dVs = {}
            for s in specs:
                Sf, rhs_c, dV = _schur_pass(
                    x, blocks[s.block], irls[s.block], free, s, offs_r,
                    Pr, lam, g[s.group], options.schur_t_chunk)
                Sf_sum += Sf
                rhs_sum += rhs_c
                dVs[s.group] = dV
            D2A = jnp.diagonal(A)
            Ad = A + jnp.diag(lam * (D2A + eps) + (1.0 - fvec))
            S = Ad - Sf_sum
            c, low = jax.scipy.linalg.cho_factor(S, lower=True)
            dxf = jax.scipy.linalg.cho_solve((c, low), -grf + rhs_sum)
            delta = _unflatten_vec(dxf, rest, keys_r, offs_r)
            pred = 0.5 * jnp.vdot(dxf, lam * (D2A + eps) * dxf - grf)
            for s in specs:
                # back-substitution: dp = V'^-1 (-gE - U^T dx)
                dp = _schur_pass(
                    x, blocks[s.block], irls[s.block], free, s, offs_r,
                    Pr, lam, g[s.group], options.schur_t_chunk, dxf=dxf)
                delta[s.group] = dp
                pred = pred + 0.5 * jnp.vdot(
                    dp, lam * (dVs[s.group] + eps) * dp - g[s.group])
            delta = project(delta)
            x_new = {k: x[k] + delta[k] for k in x}
            cost_new = _total_cost(x_new, blocks, options.obs_chunk)
            return x_new, cost, cost_new, pred

        if dense:
            eps = 1e-10
            H = _dense_hessian(x, blocks, irls, offs, P, options.jac_chunk)
            fvec = _flatten_tree(
                {k: free[k].astype(jnp.float32) for k in free}, keys)
            H = H * fvec[:, None] * fvec[None, :]
            gflat = _flatten_tree(g, keys)
            D2f = jnp.diagonal(H)
            A = H + jnp.diag(lam * (D2f + eps) + (1.0 - fvec))
            c, low = jax.scipy.linalg.cho_factor(A, lower=True)
            dflat = jax.scipy.linalg.cho_solve((c, low), -gflat)
            delta = project(_unflatten_vec(dflat, x, keys, offs))
            x_new = {k: x[k] + delta[k] for k in x}
            cost_new = _total_cost(x_new, blocks, options.obs_chunk)
            pred = 0.5 * jnp.vdot(dflat, lam * (D2f + eps) * dflat - gflat)
            return x_new, cost, cost_new, pred

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
                     options: LMOptions = LMOptions(), chunk: int = 5,
                     schur: SchurSpec | None = None):
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
            x, info_c = solve_lm(x, blocks, fixed, opts, schur=schur)
        else:
            x, info_c = solve_lm(x, blocks, fixed, opts, lam0=lam, nu0=nu,
                                 schur=schur)
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
