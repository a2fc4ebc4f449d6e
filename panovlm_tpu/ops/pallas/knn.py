"""Fused masked brute-force KNN — Pallas TPU kernel.

The KNN engine behind every association step (point->line 5-NN,
point->plane 10-NN, descriptor matching top-2; SURVEY.md §2.8 maps the
reference's pcl kd-trees / CUDA brute-force KNN to exactly this). The XLA
path materializes the full (Q, T) distance matrix in HBM and then runs
top_k over it; this kernel tiles both point sets through VMEM, forms each
distance block on the MXU (-2 q.t^T plus the norm terms), and maintains the
running per-query top-k in VMEM scratch across target tiles — the (Q, T)
matrix never exists.

Grid: (Q_tiles, T_tiles), T innermost; the top-k scratch persists across the
inner dimension (standard Pallas reduction pattern: init at j == 0, emit at
j == T_tiles-1). Top-k per tile is k rounds of (row-min, mask-out) on the
(TQ, TT) block — k <= 16 keeps that cheap on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _knn_kernel(q_ref, t_ref, qn_ref, tn_ref, dist_ref, idx_ref,
                best_d, best_i, *, k: int, tile_t: int, t_dim: int):
    j = pl.program_id(t_dim)
    n_j = pl.num_programs(t_dim)

    @pl.when(j == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, BIG)
        best_i[:] = jnp.zeros_like(best_i)

    q = q_ref[:]                                   # (TQ, 4) padded xyz
    t = t_ref[:]                                   # (TT, 4)
    qn = qn_ref[:, 0]                              # (TQ,)
    tn = tn_ref[:, 0]                              # (TT,)
    # d2 = |q|^2 + |t|^2 - 2 q.t  (masked entries carry |.|^2 = BIG)
    d2 = (qn[:, None] + tn[None, :]
          - 2.0 * jax.lax.dot_general(
              q, t, dimension_numbers=(((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST))
    d2 = jnp.maximum(d2, 0.0)
    d2 = jnp.where(tn[None, :] >= BIG, BIG, d2)
    d2 = jnp.where(qn[:, None] >= BIG, BIG, d2)
    _topk_update(d2, j, tile_t, k, best_d, best_i, dist_ref, idx_ref,
                 j == n_j - 1)


def _topk_update(d2, j, tile_t, k, best_d, best_i, dist_ref, idx_ref, emit):
    """Fold one (TQ, TT) distance tile into the running per-query top-k."""

    # top-k state as k separate column vectors: Mosaic cannot lower value
    # scatters (x.at[:, c].set), but per-column where/select is free
    bd = [best_d[:, c] for c in range(k)]
    bi = [best_i[:, c] for c in range(k)]
    d2_cur = d2
    for _ in range(k):
        vmin = jnp.min(d2_cur, axis=1)             # (TQ,)
        cmin = jnp.argmin(d2_cur, axis=1)          # (TQ,)
        gidx = cmin.astype(jnp.int32) + j * tile_t
        # insert into the sorted row top-k (single bubble pass: the list is
        # sorted and tile minima arrive in increasing order)
        better = vmin < bd[k - 1]
        bd[k - 1] = jnp.where(better, vmin, bd[k - 1])
        bi[k - 1] = jnp.where(better, gidx, bi[k - 1])
        for col in range(k - 1, 0, -1):
            swap = bd[col] < bd[col - 1]
            bd[col - 1], bd[col] = (jnp.where(swap, bd[col], bd[col - 1]),
                                    jnp.where(swap, bd[col - 1], bd[col]))
            bi[col - 1], bi[col] = (jnp.where(swap, bi[col], bi[col - 1]),
                                    jnp.where(swap, bi[col - 1], bi[col]))
        # mask the extracted entry out of the tile
        onehot = jax.lax.broadcasted_iota(jnp.int32, d2_cur.shape, 1) == \
            cmin[:, None]
        d2_cur = jnp.where(onehot, BIG, d2_cur)
    best_d[:] = jnp.stack(bd, axis=1)
    best_i[:] = jnp.stack(bi, axis=1)

    @pl.when(emit)
    def _():
        dist_ref[:] = best_d[:]
        idx_ref[:] = best_i[:]


def _knn_ring_kernel(q_ref, t_ref, qn_ref, tn_ref, qr_ref, tr_ref,
                     dist_ref, idx_ref, rd_ref, ri_ref,
                     best_d, best_i, ring_d, ring_i,
                     *, k: int, tile_t: int, t_dim: int, drs: tuple):
    """KNN + per-ring-offset nearest candidate, one fused pass.

    The point->plane association needs, besides the plain 10-NN, the
    nearest target on each of 4 adjacent scan rings (the cross-ring
    candidates that keep near-horizontal plane fits well-posed,
    models/association.py). The XLA path re-reads the full (Q, T) distance
    matrix once per ring offset; here each distance tile is already in
    VMEM, so the 4 masked row-mins ride along at register bandwidth."""
    j = pl.program_id(t_dim)
    n_j = pl.num_programs(t_dim)
    R = len(drs)

    @pl.when(j == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, BIG)
        best_i[:] = jnp.zeros_like(best_i)
        ring_d[:] = jnp.full_like(ring_d, BIG)
        ring_i[:] = jnp.zeros_like(ring_i)

    q = q_ref[:]
    t = t_ref[:]
    qn = qn_ref[:, 0]
    tn = tn_ref[:, 0]
    d2 = (qn[:, None] + tn[None, :]
          - 2.0 * jax.lax.dot_general(
              q, t, dimension_numbers=(((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST))
    d2 = jnp.maximum(d2, 0.0)
    d2 = jnp.where(tn[None, :] >= BIG, BIG, d2)
    d2 = jnp.where(qn[:, None] >= BIG, BIG, d2)

    qr = qr_ref[:, 0]                              # (TQ,) int32 ring ids
    tr = tr_ref[:, 0]                              # (TT,)
    rd = [ring_d[:, c] for c in range(R)]
    ri = [ring_i[:, c] for c in range(R)]
    for c, dr in enumerate(drs):
        same = tr[None, :] == (qr[:, None] + dr)
        d2r = jnp.where(same, d2, BIG)
        vmin = jnp.min(d2r, axis=1)
        gidx = jnp.argmin(d2r, axis=1).astype(jnp.int32) + j * tile_t
        better = vmin < rd[c]
        rd[c] = jnp.where(better, vmin, rd[c])
        ri[c] = jnp.where(better, gidx, ri[c])
    ring_d[:] = jnp.stack(rd, axis=1)
    ring_i[:] = jnp.stack(ri, axis=1)

    @pl.when(j == n_j - 1)
    def _():
        rd_ref[:] = ring_d[:]
        ri_ref[:] = ring_i[:]

    _topk_update(d2, j, tile_t, k, best_d, best_i, dist_ref, idx_ref,
                 j == n_j - 1)


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_q", "tile_t", "interpret"))
def knn_pallas_batched(q, q_mask, t, t_mask, k: int = 8, tile_q: int = 256,
                       tile_t: int = 512, interpret: bool = False):
    """Batched masked KNN: q (B,Q,D), t (B,T,D). Returns (d2 (B,Q,k),
    idx (B,Q,k)). The batch is a NATIVE leading grid dimension with
    squeezed (None) block axes — `jax.vmap` of a pallas_call instead
    multiplies the scratch reservation by the whole batched grid and
    overruns the 64M scoped-vmem budget (seen live at B=4, Q=T=2048:
    64.40M scoped stack regardless of vmem_limit_bytes)."""
    B, Q, D = q.shape
    T = t.shape[1]
    Qp = ((Q + tile_q - 1) // tile_q) * tile_q
    Tp = ((T + tile_t - 1) // tile_t) * tile_t
    # pad the feature dim to a clean MXU tile: 4 lanes for xyz-like inputs,
    # a 128-lane multiple for descriptor-sized ones
    Dp = 4 if D <= 4 else ((D + 127) // 128) * 128

    def pad_to(x, n, fill=0.0):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1]))
                       + ((0, 0),) * (x.ndim - 2), constant_values=fill)

    q4 = pad_to(jnp.pad(q.astype(jnp.float32), ((0, 0), (0, 0), (0, Dp - D))), Qp)
    t4 = pad_to(jnp.pad(t.astype(jnp.float32), ((0, 0), (0, 0), (0, Dp - D))), Tp)
    qn = pad_to(jnp.where(q_mask, jnp.sum(q * q, axis=2), BIG)[..., None], Qp, BIG)
    tn = pad_to(jnp.where(t_mask, jnp.sum(t * t, axis=2), BIG)[..., None], Tp, BIG)

    grid = (B, Qp // tile_q, Tp // tile_t)
    dist, idx = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tile_t=tile_t, t_dim=2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tile_q, Dp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_t, Dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_t, 1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, tile_q, k), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_q, k), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Qp, k), jnp.float32),
            jax.ShapeDtypeStruct((B, Qp, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q, k), jnp.float32),
            pltpu.VMEM((tile_q, k), jnp.int32),
        ],
        # Mosaic reserves a fixed 64.40M scoped-vmem stack for this kernel
        # (shape-independent: measured identical at B=1..4, Q=512..2048),
        # which overruns the 64M default budget by 412K the moment any
        # fusion surrounds the call. vmem_limit_bytes raises the budget;
        # 100M is still well under the v5e's 128M VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q4, t4, qn, tn)
    return dist[:, :Q], idx[:, :Q]


@functools.partial(jax.jit,
                   static_argnames=("k", "drs", "tile_q", "tile_t",
                                    "interpret"))
def knn_ring_pallas_batched(q, q_mask, t, t_mask, q_row, t_row, k: int = 10,
                            drs: tuple = (-2, -1, 1, 2), tile_q: int = 256,
                            tile_t: int = 512, interpret: bool = False):
    """Batched masked KNN + nearest-per-ring-offset, one fused pass.

    q (B,Q,D), t (B,T,D), q_row/t_row (B,Q)/(B,T) int32 scan-ring ids.
    Returns (d2 (B,Q,k), idx (B,Q,k), ring_d2 (B,Q,R), ring_idx (B,Q,R))
    where R = len(drs); ring column c holds the nearest target whose ring
    equals q_row + drs[c]. Masked/absent slots carry d2 >= 1e30."""
    B, Q, D = q.shape
    T = t.shape[1]
    R = len(drs)
    Qp = ((Q + tile_q - 1) // tile_q) * tile_q
    Tp = ((T + tile_t - 1) // tile_t) * tile_t
    Dp = 4 if D <= 4 else ((D + 127) // 128) * 128

    def pad_to(x, n, fill=0.0):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1]))
                       + ((0, 0),) * (x.ndim - 2), constant_values=fill)

    q4 = pad_to(jnp.pad(q.astype(jnp.float32), ((0, 0), (0, 0), (0, Dp - D))), Qp)
    t4 = pad_to(jnp.pad(t.astype(jnp.float32), ((0, 0), (0, 0), (0, Dp - D))), Tp)
    qn = pad_to(jnp.where(q_mask, jnp.sum(q * q, axis=2), BIG)[..., None], Qp, BIG)
    tn = pad_to(jnp.where(t_mask, jnp.sum(t * t, axis=2), BIG)[..., None], Tp, BIG)
    # ring ids; padded rows get -10000 so they never match qr + dr (their
    # d2 is already BIG via the norm masking — this is belt and braces)
    qr = pad_to(q_row.astype(jnp.int32)[..., None], Qp, -10000)
    tr = pad_to(t_row.astype(jnp.int32)[..., None], Tp, -10000)

    grid = (B, Qp // tile_q, Tp // tile_t)
    qspec = lambda w: pl.BlockSpec((None, tile_q, w), lambda b, i, j: (b, i, 0),
                                   memory_space=pltpu.VMEM)
    tspec = lambda w: pl.BlockSpec((None, tile_t, w), lambda b, i, j: (b, j, 0),
                                   memory_space=pltpu.VMEM)
    dist, idx, rd, ri = pl.pallas_call(
        functools.partial(_knn_ring_kernel, k=k, tile_t=tile_t, t_dim=2,
                          drs=drs),
        grid=grid,
        in_specs=[qspec(Dp), tspec(Dp), qspec(1), tspec(1), qspec(1),
                  tspec(1)],
        out_specs=(qspec(k), qspec(k), qspec(R), qspec(R)),
        out_shape=(
            jax.ShapeDtypeStruct((B, Qp, k), jnp.float32),
            jax.ShapeDtypeStruct((B, Qp, k), jnp.int32),
            jax.ShapeDtypeStruct((B, Qp, R), jnp.float32),
            jax.ShapeDtypeStruct((B, Qp, R), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q, k), jnp.float32),
            pltpu.VMEM((tile_q, k), jnp.int32),
            pltpu.VMEM((tile_q, R), jnp.float32),
            pltpu.VMEM((tile_q, R), jnp.int32),
        ],
        # the plain-KNN kernel's fixed 64.4M Mosaic scoped stack plus the
        # ring-candidate state measures 102.02M on the v5e (compile-time
        # "scoped allocation ... exceeded" at the 100M budget); 112M keeps
        # a margin under the chip's 128M VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(q4, t4, qn, tn, qr, tr)
    return dist[:, :Q], idx[:, :Q], rd[:, :Q], ri[:, :Q]


def knn_ring_pallas(q, q_mask, t, t_mask, q_row, t_row, k: int = 10,
                    drs: tuple = (-2, -1, 1, 2), tile_q: int = 256,
                    tile_t: int = 512, interpret: bool = False):
    """Unbatched knn_ring_pallas_batched; vmap-safe via custom_vmap
    rerouting to the native batched grid (see knn_pallas)."""

    @jax.custom_batching.custom_vmap
    def run(q, qm, t, tm, qr, tr):
        out = knn_ring_pallas_batched(
            q[None], qm[None], t[None], tm[None], qr[None], tr[None],
            k=k, drs=drs, tile_q=tile_q, tile_t=tile_t, interpret=interpret)
        return tuple(o[0] for o in out)

    @run.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        out = knn_ring_pallas_batched(
            *(bc(a, b) for a, b in zip(args, in_batched)),
            k=k, drs=drs, tile_q=tile_q, tile_t=tile_t, interpret=interpret)
        return out, (True,) * 4

    return run(q, q_mask, t, t_mask, q_row, t_row)


def knn_pallas(q, q_mask, t, t_mask, k: int = 8, tile_q: int = 256,
               tile_t: int = 512, interpret: bool = False):
    """Masked k-nearest-neighbors: q (Q,D), t (T,D), any feature dim D
    (3D points and 128-dim SIFT descriptors both route here). Returns
    (d2 (Q,k), idx (Q,k)); masked/overflow slots carry d2 >= 1e30.

    vmap-safe: a custom_vmap rule reroutes batching to the native batched
    grid of knn_pallas_batched (see its docstring for why the default
    pallas vmap lowering is unusable here)."""

    @jax.custom_batching.custom_vmap
    def run(q, qm, t, tm):
        d2, idx = knn_pallas_batched(q[None], qm[None], t[None], tm[None],
                                     k=k, tile_q=tile_q, tile_t=tile_t,
                                     interpret=interpret)
        return d2[0], idx[0]

    @run.def_vmap
    def _rule(axis_size, in_batched, q, qm, t, tm):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        out = knn_pallas_batched(
            bc(q, in_batched[0]), bc(qm, in_batched[1]),
            bc(t, in_batched[2]), bc(tm, in_batched[3]),
            k=k, tile_q=tile_q, tile_t=tile_t, interpret=interpret)
        return out, (True, True)

    return run(q, q_mask, t, t_mask)


def knn_reference(q, q_mask, t, t_mask, k: int = 8):
    """XLA reference implementation (materializes (Q,T))."""
    d2 = (jnp.sum(q * q, axis=1)[:, None] + jnp.sum(t * t, axis=1)[None, :]
          - 2.0 * jnp.einsum("qk,tk->qt", q, t,
                             precision=jax.lax.Precision.HIGHEST))
    d2 = jnp.maximum(d2, 0.0)
    d2 = jnp.where(q_mask[:, None] & t_mask[None, :], d2, BIG)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx
