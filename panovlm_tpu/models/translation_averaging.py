"""Global translation averaging (6 methods like the reference).

Replaces sfm/TranslationAveraging.{h,cpp} + sfm/BATA.{h,cpp} +
sfm/LinearProgramming.{h,cpp} (reference):
  * DLT init (:31-84): linear least squares over global translations and
    per-pair scales — here a closed-form normal-equation solve via CG
    (matrix-free, on device) instead of SuiteSparse QR;
  * L2 (:87-169) / SoftL1 (:171-204) / L2IRLS (:419-481): the
    PairWiseTranslationResidual + ScaleFactor soft bounds, solved by the
    on-device LM with trivial / soft-L1 / IRLS losses;
  * Chordal (1DSfM, :206-274): ChrodalResidual over normalized baselines;
  * LUD (CVPR'15, :527-660): sqrt-robust LUDResidual with scale >= lower
    bound (soft);
  * L1 (L-inf LP over triplets via COIN-Clp, :277-417): scipy.optimize
    linprog (HiGHS) on host — same LP, different solver;
  * BATA (CVPR'18, BATA.cpp): implemented as its IRLS form on device.

All device paths share one parameter layout: groups = {"t": (N,3) global
t_fw, "s": (M,1) per-pair scales}, rotations held fixed (the reference also
fixes rotations after RA).
"""

from __future__ import annotations

import functools
import logging

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import se3
from ..solver import LMOptions, ResidualBlock, residuals, solve_lm

log = logging.getLogger("panovlm")


def _measurement_dirs(aa_global, pair_i, pair_j, rel_aa, rel_t):
    """Per-pair unit translation t_ji (normalized) + world-frame baseline
    directions dir_w = normalize(R_wj t_ji) used by chordal/LUD."""
    from scipy.spatial.transform import Rotation as ScR
    rel_t_u = np.asarray(rel_t, np.float64)
    rel_t_u = rel_t_u / (np.linalg.norm(rel_t_u, axis=1, keepdims=True) + 1e-12)
    R_jw = ScR.from_rotvec(np.asarray(aa_global)[np.asarray(pair_j)]).as_matrix()
    dir_w = np.einsum("mji,mj->mi", R_jw, rel_t_u)  # R_wj = R_jw^T
    dir_w /= np.linalg.norm(dir_w, axis=1, keepdims=True) + 1e-12
    return rel_t_u.astype(np.float32), dir_w.astype(np.float32)


def translation_averaging_dlt(aa_global, pair_i, pair_j, rel_aa, rel_t,
                              mask=None, cg_iters: int = 200):
    """Linear init (TranslationAveragingDLT, :31-84): minimize
    sum || t_j - R_ji t_i - s_ij u_ij ||^2 with gauge t_0 = 0 and
    scale-sum gauge sum(s) = M. Matrix-free CG on the normal equations."""
    from scipy.spatial.transform import Rotation as ScR
    n = len(aa_global)
    m = len(pair_i)
    if mask is None:
        mask = np.ones(m, bool)
    rel_t_u, _ = _measurement_dirs(aa_global, pair_i, pair_j, rel_aa, rel_t)
    R_ji = ScR.from_rotvec(np.asarray(rel_aa)).as_matrix().astype(np.float32)
    pi = jnp.asarray(pair_i, jnp.int32)
    pj = jnp.asarray(pair_j, jnp.int32)
    Rji = jnp.asarray(R_ji)
    u = jnp.asarray(rel_t_u)
    w = jnp.asarray(mask, jnp.float32)

    def Ax(x):
        t, s = x
        r = (t[pj] - se3.einsum("mij,mj->mi", Rji, t[pi])
             - s[:, None] * u) * w[:, None]
        # A^T r
        gt = jnp.zeros((n, 3)).at[pj].add(r)
        gt = gt.at[pi].add(-se3.einsum("mji,mj->mi", Rji, r))
        gs = -jnp.sum(r * u, axis=1)
        # gauges: t_0 = 0, mean(s) = 1 handled by projection below
        gt = gt.at[0].set(0.0)
        return gt, gs

    # b for the affine part: residual at x=0 with s=1 baseline
    s1 = jnp.ones((m,))
    t0 = jnp.zeros((n, 3))

    def ATA(x):
        return Ax(x)

    # Solve A^T A x = -A^T r0 where r0 = residual at (t=0, s=1)
    r0 = (-s1[:, None] * u) * w[:, None]
    bt = -(jnp.zeros((n, 3)).at[pj].add(r0).at[pi].add(
        -se3.einsum("mji,mj->mi", Rji, r0)))
    bt = bt.at[0].set(0.0)
    bs = jnp.sum(r0 * u, axis=1)
    b = (bt, bs)

    def dot(a, c):
        return jnp.vdot(a[0], c[0]) + jnp.vdot(a[1], c[1])

    # Tikhonov damping: a chain-shaped pair graph leaves (t, s) directions
    # unconstrained (any scale works with translations following), and CG on
    # the singular normal equations diverges; the damping pins the min-norm
    # solution without measurably affecting well-posed graphs.
    lam = 1e-6
    x = (jnp.zeros((n, 3)), jnp.zeros((m,)))
    r = b
    p = r
    rs = dot(r, r)
    rs0 = rs
    for _ in range(cg_iters):
        Ap = ATA(p)
        Ap = (Ap[0] + lam * p[0], Ap[1] + lam * p[1])
        alpha = rs / (dot(p, Ap) + 1e-30)
        x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
        r = (r[0] - alpha * Ap[0], r[1] - alpha * Ap[1])
        rs_new = dot(r, r)
        beta = rs_new / (rs + 1e-30)
        p = (r[0] + beta * p[0], r[1] + beta * p[1])
        rs = rs_new
        if float(rs) < 1e-14 * float(rs0) + 1e-30:
            break
    t = np.asarray(x[0])
    s = np.asarray(x[1]) + 1.0
    # the homogeneous solution's global sign is arbitrary; canonicalize so
    # pair scales are positive (downstream methods clamp s > 0)
    if np.median(s[np.asarray(mask)]) < 0:
        t, s = -t, -s
    return t.astype(np.float32), s.astype(np.float32)


def _ta_solver(aa_global, pair_i, pair_j, rel_aa, rel_t, t0, s0, mask,
               loss, loss_scale, upper_scale_ratio=1.3, lower_scale_ratio=0.9,
               scale_weight=1.0, max_iters=40, use_lud=False, use_chordal=False):
    """Shared LM assembly for L2 / SoftL1 / L2IRLS / LUD / Chordal."""
    from scipy.spatial.transform import Rotation as ScR
    m = len(pair_i)
    rel_t_u, dir_w = _measurement_dirs(aa_global, pair_i, pair_j, rel_aa, rel_t)
    # chordal/LUD parameterize camera CENTERS C = -R_fw^T t_fw
    # (LUDResidual/ChrodalResidual take t_w*, base/CostFunction.h:89-176)
    R_fw = ScR.from_rotvec(np.asarray(aa_global)).as_matrix()
    to_center = lambda t: -np.einsum("nji,nj->ni", R_fw, np.asarray(t))
    from_center = lambda c: -np.einsum("nij,nj->ni", R_fw, np.asarray(c))
    param_t0 = to_center(t0) if (use_lud or use_chordal) else np.asarray(t0)
    groups = {"t": jnp.asarray(param_t0, jnp.float32),
              "s": jnp.asarray(s0, jnp.float32).reshape(-1, 1)}
    fixed_t = np.zeros((len(t0), 3), bool)
    fixed_t[0] = True
    fixed = {"t": jnp.asarray(fixed_t), "s": jnp.zeros((m, 1), bool)}
    pi = jnp.asarray(pair_i, jnp.int32)
    pj = jnp.asarray(pair_j, jnp.int32)
    msk = jnp.asarray(mask)
    blocks = []
    if use_chordal:
        blocks.append(ResidualBlock(
            residuals.chordal, ("t", "t"), (pi, pj), (jnp.asarray(dir_w),),
            jnp.ones((m,), jnp.float32), msk, loss=loss, loss_scale=loss_scale,
            name="chordal"))
    elif use_lud:
        blocks.append(ResidualBlock(
            residuals.lud, ("t", "t", "s"), (pi, pj, jnp.arange(m, dtype=jnp.int32)),
            (jnp.asarray(dir_w),),
            jnp.ones((m,), jnp.float32), msk, loss=loss, loss_scale=loss_scale,
            name="lud"))
        # LUD constrains s >= 1 (soft)
        blocks.append(ResidualBlock(
            functools.partial(residuals.scale_factor, lower=1.0, upper=1e6),
            ("s",), (jnp.arange(m, dtype=jnp.int32),), (),
            jnp.full((m,), 10.0, jnp.float32), msk, name="scale_lb"))
    else:
        blocks.append(ResidualBlock(
            residuals.pairwise_translation, ("t", "t", "s"),
            (pi, pj, jnp.arange(m, dtype=jnp.int32)),
            (jnp.asarray(rel_aa, jnp.float32), jnp.asarray(rel_t_u)),
            jnp.ones((m,), jnp.float32), msk, loss=loss, loss_scale=loss_scale,
            name="pairwise_t"))
        # soft scale bounds around the initial scales (ScaleFactor,
        # upper/lower_scale_ratio config defaults 1.3 / 0.9)
        lo = np.asarray(s0) * lower_scale_ratio
        hi = np.asarray(s0) * upper_scale_ratio

        def bounded_scale(s, lo_i, hi_i):
            below = jnp.maximum(lo_i - s[0], 0.0)
            above = jnp.maximum(s[0] - hi_i, 0.0)
            return (below + above).reshape(1)

        blocks.append(ResidualBlock(
            bounded_scale, ("s",), (jnp.arange(m, dtype=jnp.int32),),
            (jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)),
            jnp.full((m,), scale_weight, jnp.float32), msk, name="scale_bounds"))
    out, info = solve_lm(groups, tuple(blocks), fixed, LMOptions(max_iters=max_iters))
    t_out = np.asarray(out["t"])
    if use_lud or use_chordal:
        t_out = from_center(t_out)
    return t_out, np.asarray(out["s"])[:, 0], info


def translation_averaging_bata(aa_global, pair_i, pair_j, rel_aa, rel_t,
                               t0, mask, iters: int = 20, delta: float = 0.05):
    """BATA (Baseline-desensitized TA, CVPR'18; reference sfm/BATA.cpp):
    alternate the per-edge projective scale theta_ij = (d . dC)/|dC|^2 with
    a robustly-reweighted linear solve for the camera centers. The
    reference's sparse KKT splice + Eigen SparseLU becomes a matrix-free CG
    on device; robust weights are Geman-McClure as in its IRLS loop."""
    from scipy.spatial.transform import Rotation as ScR
    n = len(aa_global)
    m = len(pair_i)
    _, dir_w = _measurement_dirs(aa_global, pair_i, pair_j, rel_aa, rel_t)
    R_fw = ScR.from_rotvec(np.asarray(aa_global)).as_matrix()
    C = jnp.asarray(-np.einsum("nji,nj->ni", R_fw, np.asarray(t0)), jnp.float32)
    d = jnp.asarray(dir_w)
    pi_ = jnp.asarray(pair_i, jnp.int32)
    pj_ = jnp.asarray(pair_j, jnp.int32)
    msk = jnp.asarray(mask, jnp.float32)

    @jax.jit
    def iteration(C):
        dC = C[pi_] - C[pj_]
        nrm2 = jnp.sum(dC * dC, axis=1)
        theta = jnp.maximum(jnp.sum(d * dC, axis=1), 1e-6) / jnp.maximum(nrm2, 1e-9)
        e = d - theta[:, None] * dC
        w = msk / (jnp.sum(e * e, axis=1) + delta * delta)  # Geman-McClure

        def Ax(x):
            r = (x[pi_] - x[pj_]) * (w * theta * theta)[:, None]
            g = jnp.zeros((n, 3)).at[pi_].add(r).at[pj_].add(-r)
            return g.at[0].set(0.0)

        b = jnp.zeros((n, 3)).at[pi_].add((w * theta)[:, None] * d) \
            .at[pj_].add(-(w * theta)[:, None] * d)
        b = b.at[0].set(0.0)
        x = C.at[0].set(0.0)
        r = b - Ax(x)
        p = r
        rs = jnp.vdot(r, r)
        for _ in range(50):
            Ap = Ax(p)
            alpha = rs / (jnp.vdot(p, Ap) + 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.vdot(r, r)
            p = r + (rs_new / (rs + 1e-30)) * p
            rs = rs_new
        # normalize mean baseline to 1 (BATA's scale constraint)
        dC2 = x[pi_] - x[pj_]
        scale = jnp.sum(msk * jnp.sum(d * dC2, axis=1)) / jnp.maximum(msk.sum(), 1)
        return x / jnp.maximum(jnp.abs(scale), 1e-9)

    for _ in range(iters):
        C = iteration(C)
    C_np = np.asarray(C, np.float64)
    t = -np.einsum("nij,nj->ni", R_fw, C_np)
    s = np.linalg.norm(C_np[np.asarray(pair_j)] - C_np[np.asarray(pair_i)], axis=1)
    return t.astype(np.float32), s.astype(np.float32)


def translation_averaging_linf_lp(aa_global, pair_i, pair_j, rel_aa, rel_t,
                                  mask, origin_idx: int = 0,
                                  max_triplets: int = 20000):
    """Exact L-inf linear program over triplet-supported pairs
    (TranslationAveragingL1, sfm/TranslationAveraging.cpp:277-417):
    minimize gamma subject to |t_j - R_21 t_i - lambda t_21| <= gamma for
    every pair that belongs to at least one triplet, lambda >= 1, origin
    camera pinned at 0. The reference shares one lambda across a triplet's
    three pairs (which cannot represent unequal pair baselines and pushes
    the mismatch into gamma); this uses one lambda per pair — strictly more
    expressive, exact on clean input — while keeping the triplet-support
    robustness filter. Clp there, scipy HiGHS here.

    Returns (t (N,3), ok) or (None, False) when no triplets exist."""
    import networkx as nx
    from scipy.optimize import linprog
    from scipy.sparse import coo_matrix
    from scipy.spatial.transform import Rotation as ScR

    pi = np.asarray(pair_i)
    pj = np.asarray(pair_j)
    mask = np.asarray(mask)
    n = len(np.asarray(aa_global))
    g = nx.Graph()
    edge_of = {}
    for k in range(len(pi)):
        if mask[k]:
            a, b = int(pi[k]), int(pj[k])
            g.add_edge(a, b)
            edge_of[(a, b)] = k
    R = ScR.from_rotvec(np.asarray(rel_aa, np.float64)).as_matrix()
    t_u = np.asarray(rel_t, np.float64)
    t_u = t_u / (np.linalg.norm(t_u, axis=1, keepdims=True) + 1e-12)

    triplets = []
    for a, b in g.edges:
        for c in sorted(nx.common_neighbors(g, a, b)):
            if c > max(a, b):           # count each triangle once
                triplets.append(tuple(sorted((a, b, c))))
    if not triplets:
        return None, False
    if len(triplets) > max_triplets:
        sel = np.linspace(0, len(triplets) - 1, max_triplets).astype(int)
        triplets = [triplets[s] for s in sel]
        log.info("L-inf LP: sampled %d of %d triplets", max_triplets,
                 len(sel))

    # pairs with triplet support, each constrained once with its own lambda
    supported = sorted({edge_of[(i, j) if (i, j) in edge_of else (j, i)]
                        for (a, b, c) in triplets
                        for (i, j) in ((a, b), (b, c), (a, c))})
    n_lam = len(supported)
    lam0 = 3 * n
    gamma = lam0 + n_lam
    rows, cols, vals = [], [], []
    r = 0
    for lidx, k in enumerate(supported):
        i, j = int(pi[k]), int(pj[k])
        R21, u21 = R[k], t_u[k]
        for axis in range(3):
            for sign in (1.0, -1.0):
                rows += [r] * 6
                cols += [3 * j + axis,
                         3 * i + 0, 3 * i + 1, 3 * i + 2,
                         lam0 + lidx, gamma]
                vals += [sign,
                         -sign * R21[axis, 0], -sign * R21[axis, 1],
                         -sign * R21[axis, 2],
                         -sign * u21[axis], -1.0]
                r += 1
    A = coo_matrix((vals, (rows, cols)), shape=(r, gamma + 1))
    cost = np.zeros(gamma + 1)
    cost[gamma] = 1.0
    bounds = [(None, None)] * (3 * n)
    for axis in range(3):
        bounds[3 * origin_idx + axis] = (0.0, 0.0)
    bounds += [(1.0, None)] * n_lam + [(0.0, None)]
    res = linprog(cost, A_ub=A.tocsr(), b_ub=np.zeros(r), bounds=bounds,
                  method="highs")
    if not res.success:
        log.warning("L-inf LP failed: %s", res.message)
        return None, False
    t = res.x[:3 * n].reshape(n, 3).astype(np.float32)
    return t, True


def translation_averaging(aa_global, pair_i, pair_j, rel_aa, rel_t, scales,
                          mask=None, method: str = "softl1",
                          upper_scale_ratio=1.3, lower_scale_ratio=0.9,
                          t_init=None, irls_iters: int = 3):
    """EstimateGlobalTranslation (sfm/SfM.cpp:1047-1344): DLT init + one of
    the averaging methods. scales: per-pair metric scale estimates (from the
    LiDAR depth maps); pairs without scale get the DLT estimate.

    t_init: optional (N,3) t_fw initialization replacing the DLT init (the
    init_translation_GPS path, SfM.cpp:1218-1240).

    Returns (t_fw (N,3), s (M,)).
    """
    m = len(pair_i)
    if mask is None:
        mask = np.ones(m, bool)
    if t_init is not None:
        t0 = np.asarray(t_init, np.float32)
        sc = np.asarray(scales)
        fallback = float(np.median(sc[sc > 0])) if (sc > 0).any() else 1.0
        s_dlt = np.where(sc > 0, sc, fallback).astype(np.float32)
    else:
        t0, s_dlt = translation_averaging_dlt(aa_global, pair_i, pair_j,
                                              rel_aa, rel_t, mask)
    s0 = np.where(np.asarray(scales) > 0, np.asarray(scales), np.abs(s_dlt) + 1e-3)
    if method == "dlt":
        return t0, s_dlt
    common = dict(aa_global=aa_global, pair_i=pair_i, pair_j=pair_j,
                  rel_aa=rel_aa, rel_t=rel_t, t0=t0, s0=s0, mask=mask,
                  upper_scale_ratio=upper_scale_ratio,
                  lower_scale_ratio=lower_scale_ratio)
    if method == "l2":
        t, s, _ = _ta_solver(loss="trivial", loss_scale=1.0, **common)
    elif method == "softl1":
        t, s, _ = _ta_solver(loss="soft_l1", loss_scale=0.1, **common)
    elif method == "l2irls":
        # IRLS = repeated huber solves with shrinking scale; rounds =
        # config num_iteration_L2IRLS (SfM.cpp:1277)
        t, s = t0, s0
        for scale in np.geomspace(1.0, 0.1, max(int(irls_iters), 2)):
            common["t0"], common["s0"] = t, s
            t, s, _ = _ta_solver(loss="huber", loss_scale=float(scale),
                                 max_iters=15, **common)
    elif method == "chordal":
        t, s, _ = _ta_solver(loss="huber", loss_scale=0.1, use_chordal=True,
                             **common)
        s = s0
    elif method == "lud":
        # normalize scale init so the s >= 1 soft bound sets the gauge
        med = np.median(np.abs(s0)) + 1e-9
        common["s0"] = np.maximum(np.abs(s0) / med, 1.0)
        t, s, _ = _ta_solver(loss="soft_l1", loss_scale=0.05, use_lud=True,
                             **common)
    elif method == "bata":
        t, s = translation_averaging_bata(aa_global, pair_i, pair_j, rel_aa,
                                          rel_t, t0, mask)
    elif method == "l1":
        # exact L-inf LP over triplets (TranslationAveraging.cpp:277-417,
        # Clp there, scipy HiGHS here), then an IRLS polish with the LP
        # solution as init; falls back to pure IRLS when the pair graph has
        # no triplets or the LP fails
        t_lp, lp_ok = translation_averaging_linf_lp(
            aa_global, pair_i, pair_j, rel_aa, rel_t, mask)
        t, s = (t_lp, s0) if lp_ok else (t0, s0)
        for scale in (0.1, 0.03, 0.01):
            common["t0"], common["s0"] = t, s
            t, s, _ = _ta_solver(loss="huber", loss_scale=scale,
                                 max_iters=15, **common)
    else:
        raise ValueError(f"unknown method {method}")
    # Re-anchor the global scale gauge: direction noise exerts uniform
    # shrink pressure on a translation-averaging problem (cost ~ s^2), so
    # the solution slides to the soft lower bound (lower_scale_ratio * s0).
    # Rescaling the whole solution is a pure gauge transform; anchor it so
    # the measured metric scales hold on median.
    measured = np.asarray(scales) > 0
    if method != "dlt" and measured.any():
        ratio = s0[measured] / np.maximum(np.abs(s[measured]), 1e-9)
        alpha = float(np.median(ratio))
        t = t * alpha
        s = s * alpha
    return t.astype(np.float32), s.astype(np.float32)
