"""Global rotation averaging.

Replaces sfm/RotationAveraging.{h,cpp} (reference):
  * FilterPairs (:11-183): X84/MAD outlier rejection on pairwise rotation
    consistency + temporal-connectivity repair;
  * RotationAveragingSpanningTree (:278-315): maximum-spanning-tree
    propagation of relative rotations (host control plane, networkx);
  * RotationAveragingL1 (:376-582): spanning-tree init + robust refinement.
    Default path is the exact reference algorithm — L1-ADMM rounds then
    |e|^-1.5 IRLS — as a single device program exploiting the
    incidence (x) I_3 structure (solver/l1_admm.py); exact=False keeps the
    earlier soft-L1 LM reformulation of the same robust objective;
  * RotationAveragingL2 (:317-374): ceres pairwise-rotation refinement ->
    LM with trivial/huber loss.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..solver import LMOptions, ResidualBlock, residuals, solve_lm


def spanning_tree_init(n_frames, pair_i, pair_j, rel_aa, weights=None):
    """Maximum-spanning-tree rotation initialization (host, numpy/networkx).

    rel_aa (M,3): axis-angle of R_ji (frame i -> j) measurements.
    Returns aa_fw (n_frames, 3) global world->frame rotations with frame of
    the tree root = identity; unreachable frames get identity + invalid flag.
    """
    import networkx as nx
    from scipy.spatial.transform import Rotation as ScR

    g = nx.Graph()
    g.add_nodes_from(range(n_frames))
    if weights is None:
        # default: favor temporally-near pairs (they carry the most matches
        # in practice; the reference weights tree edges by inlier count)
        gap = np.abs(np.asarray(pair_i) - np.asarray(pair_j)).astype(np.float64)
        w = 1.0 / (1.0 + gap)
    else:
        w = np.asarray(weights)
    for k in range(len(pair_i)):
        i, j = int(pair_i[k]), int(pair_j[k])
        if g.has_edge(i, j):
            if g[i][j]["weight"] >= w[k]:
                continue
        g.add_edge(i, j, weight=float(w[k]), k=k)
    tree = nx.maximum_spanning_tree(g)
    R = np.tile(np.eye(3), (n_frames, 1, 1))
    valid = np.zeros(n_frames, bool)
    # BFS from the largest component's first node
    comps = sorted(nx.connected_components(tree), key=len, reverse=True)
    if not comps:
        return np.zeros((n_frames, 3)), valid
    root = min(comps[0])
    valid[root] = True
    for a, b in nx.bfs_edges(tree, root):
        k = tree[a][b]["k"]
        i, j = int(pair_i[k]), int(pair_j[k])
        R_ji = ScR.from_rotvec(np.asarray(rel_aa[k])).as_matrix()
        if b == j and a == i:       # R_jw = R_ji R_iw
            R[b] = R_ji @ R[a]
        else:                        # walking j -> i: R_iw = R_ji^T R_jw
            R[b] = R_ji.T @ R[a]
        valid[b] = True
    aa = ScR.from_matrix(R).as_rotvec()
    return aa.astype(np.float32), valid


def rotation_averaging_least_square(n_frames, pair_i, pair_j, rel_aa,
                                    weights=None):
    """RotationAveragingLeastSquare (sfm/RotationAveraging.cpp:185-275):
    closed-form spectral solve of the stacked constraints
    weight * (R_jw - R_ji R_iw) = 0. The three eigenvectors of A^T A with
    the smallest |eigenvalue| hold the rows of every camera's rotation;
    each 3x3 is projected to SO(3) (SVD, det > 0) and the gauge is fixed
    by right-multiplying R_0^T so camera 0 = identity.

    A^T A is assembled directly from its per-pair block structure
    (R_ji^T R_ji = I): +w^2 I at (i,i) and (j,j), -w^2 R_ji^T at (i,j).
    Host numpy dense eigh — solver init control plane (3N x 3N, N is
    hundreds), like the spanning-tree init.

    Returns (aa_fw (N,3) float32, valid (N,)) — cameras in no pair get
    identity and valid=False."""
    from scipy.spatial.transform import Rotation as ScR

    pair_i = np.asarray(pair_i)
    pair_j = np.asarray(pair_j)
    M = len(pair_i)
    w2 = (np.ones(M) if weights is None
          else np.asarray(weights, np.float64) ** 2)
    R_ji = ScR.from_rotvec(np.asarray(rel_aa)).as_matrix()
    AtA = np.zeros((3 * n_frames, 3 * n_frames))
    valid = np.zeros(n_frames, bool)
    for k in range(M):
        i, j = int(pair_i[k]), int(pair_j[k])
        AtA[3 * i:3 * i + 3, 3 * i:3 * i + 3] += w2[k] * np.eye(3)
        AtA[3 * j:3 * j + 3, 3 * j:3 * j + 3] += w2[k] * np.eye(3)
        AtA[3 * i:3 * i + 3, 3 * j:3 * j + 3] -= w2[k] * R_ji[k].T
        AtA[3 * j:3 * j + 3, 3 * i:3 * i + 3] -= w2[k] * R_ji[k]
        valid[i] = valid[j] = True
    evals, evecs = np.linalg.eigh(AtA)          # ascending; AtA is PSD
    V = evecs[:, :3]                             # (3N, 3) nullspace basis
    # each nullspace vector's i-th segment is R_iw g_c, so the segments
    # are the COLUMNS of X_i = R_iw G — exact recovery after the SO(3)
    # projection absorbs G (verified exact on noise-free graphs)
    rot = V.reshape(n_frames, 3, 3)
    U, _, Vt = np.linalg.svd(rot)
    R = U @ Vt
    det = np.linalg.det(R)
    R = R * np.sign(det)[:, None, None]
    anchor = int(np.argmax(valid)) if valid.any() else 0
    R = R @ R[anchor].T[None]
    R = np.where(valid[:, None, None], R, np.eye(3))
    aa = ScR.from_matrix(R).as_rotvec()
    return aa.astype(np.float32), valid


def filter_pairs_x84(pair_i, pair_j, rel_aa, aa_global, k_mad: float = 3.5):
    """X84 (MAD) rejection of rotation measurements inconsistent with the
    current global rotations (FilterPairs, RotationAveraging.cpp:11-183).
    Keeps temporal edges |i-j| <= 3 regardless (the reference repairs
    temporal connectivity). Returns keep mask (M,). Host numpy."""
    from scipy.spatial.transform import Rotation as ScR
    Ri = ScR.from_rotvec(np.asarray(aa_global)[np.asarray(pair_i)]).as_matrix()
    Rj = ScR.from_rotvec(np.asarray(aa_global)[np.asarray(pair_j)]).as_matrix()
    Rji = ScR.from_rotvec(np.asarray(rel_aa)).as_matrix()
    cycle = np.einsum("mij,mkj->mik", np.einsum("mij,mkj->mik", Rj, Ri), Rji)
    err = np.linalg.norm(ScR.from_matrix(cycle).as_rotvec(), axis=1)
    med = np.median(err)
    mad = np.median(np.abs(err - med)) + 1e-12
    keep = err <= med + k_mad * 1.4826 * mad
    temporal = np.abs(np.asarray(pair_i) - np.asarray(pair_j)) <= 3
    return keep | temporal


def _solve(aa0, pair_i, pair_j, rel_aa, mask, loss, loss_scale, max_iters,
           fixed_idx: int = 0):
    m = len(np.asarray(pair_i))
    groups = {"rot": jnp.asarray(aa0, jnp.float32)}
    fixed = np.zeros(groups["rot"].shape, bool)
    fixed[fixed_idx] = True
    block = ResidualBlock(
        residuals.pairwise_rotation, ("rot", "rot"),
        (jnp.asarray(pair_i, jnp.int32), jnp.asarray(pair_j, jnp.int32)),
        (jnp.asarray(rel_aa, jnp.float32),),
        jnp.ones((m,), jnp.float32), jnp.asarray(mask),
        loss=loss, loss_scale=loss_scale)
    out, info = solve_lm(groups, (block,), {"rot": jnp.asarray(fixed)},
                         LMOptions(max_iters=max_iters))
    return np.asarray(out["rot"]), info


def rotation_averaging_l1(n_frames, pair_i, pair_j, rel_aa, weights=None,
                          x84: bool = True, exact: bool = True):
    """L1-flavoured robust rotation averaging + L2 refinement
    (EstimateGlobalRotation flow, sfm/SfM.cpp:811-905). Returns
    (aa_fw (N,3), valid (N,), keep_mask (M,)).

    exact=True runs the reference's RotationAveragingRefineL1 exactly
    (L1-ADMM + |e|^-1.5 IRLS, RotationAveraging.cpp:428-582) as one
    device program (solver/l1_admm.py); exact=False keeps the soft-L1 LM
    reformulation of the same robust objective."""
    aa0, valid = spanning_tree_init(n_frames, pair_i, pair_j, rel_aa, weights)
    # pre-filter vs the tree estimate (reference runs FilterByTriplet /
    # FilterPairs before averaging, sfm/SfM.cpp:705-778)
    mask = filter_pairs_x84(pair_i, pair_j, rel_aa, aa0) if x84 \
        else np.ones(len(pair_i), bool)
    if exact:
        from ..solver.l1_admm import rotation_refine_l1_irls
        keep = np.asarray(mask)
        aa1 = rotation_refine_l1_irls(
            n_frames, np.asarray(pair_i)[keep], np.asarray(pair_j)[keep],
            np.asarray(rel_aa)[keep], aa0,
            start_idx=int(np.argmax(valid)), weight_function=1)
    else:
        # robust (soft-L1 ~ the reference's L1/IRLS stage)
        aa1, _ = _solve(aa0, pair_i, pair_j, rel_aa, jnp.asarray(mask),
                        "soft_l1", float(np.radians(1.0)), 40,
                        fixed_idx=int(np.argmax(valid)))
    if x84:
        mask = filter_pairs_x84(pair_i, pair_j, rel_aa, aa1)
    # L2 refinement on surviving pairs (RotationAveragingL2 uses Huber)
    aa2, info = _solve(aa1, pair_i, pair_j, rel_aa, jnp.asarray(mask),
                       "huber", float(np.radians(2.0)), 30,
                       fixed_idx=int(np.argmax(valid)))
    return aa2, valid, mask


def rotation_averaging_l2(n_frames, pair_i, pair_j, rel_aa, weights=None,
                          x84: bool = True):
    """ROTATION_AVERAGING_L2 (sfm/SfM.h:67; RotationAveragingL2,
    sfm/RotationAveraging.cpp:317-374): spanning-tree init + one Huber L2
    ceres-style solve, no robust L1 stage. Same return shape as the L1
    variant. Seeds from RotationAveragingLeastSquare (the reference's L2
    init, SfM.cpp:859-869); falls back to the weighted spanning tree when
    the pair graph leaves cameras unconstrained."""
    # the spectral solve needs ONE connected component covering every
    # camera — otherwise the nullspace is >3-dimensional and mixes them
    from ..utils.tracks import UnionFind
    uf = UnionFind(n_frames)
    for a, b in zip(np.asarray(pair_i), np.asarray(pair_j)):
        uf.union(int(a), int(b))
    connected = len({uf.find(i) for i in range(n_frames)}) == 1
    if connected:
        aa0, valid = rotation_averaging_least_square(
            n_frames, pair_i, pair_j, rel_aa, weights)
    else:
        aa0, valid = spanning_tree_init(n_frames, pair_i, pair_j, rel_aa,
                                        weights)
    mask = filter_pairs_x84(pair_i, pair_j, rel_aa, aa0) if x84 \
        else np.ones(len(pair_i), bool)
    aa1, _ = _solve(aa0, pair_i, pair_j, rel_aa, jnp.asarray(mask),
                    "huber", float(np.radians(2.0)), 40,
                    fixed_idx=int(np.argmax(valid)))
    return aa1, valid, mask


def rotation_averaging(n_frames, pair_i, pair_j, rel_aa, weights=None,
                       method: int = 1):
    """Dispatch on the reference's RotationAveragingMethod enum
    (sfm/SfM.h:65-68): 1 = L1 (robust + refine), 2 = plain L2."""
    fn = rotation_averaging_l2 if method == 2 else rotation_averaging_l1
    return fn(n_frames, pair_i, pair_j, rel_aa, weights)
