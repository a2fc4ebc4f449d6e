"""LiDAR feature association — batched world-frame matching.

Replaces lidar_mapping/LidarFeatureAssociate.{h,cpp} (reference), which runs
pcl kd-tree queries point-by-point. Here each scan pair is associated with
dense masked distance matrices (one fused kernel per pair, vmapped/lax.map
over the pair list) — the TPU-idiomatic "brute-force KNN on the MXU"
(SURVEY.md §2.8).

Semantics parity (reference file:line):
  * point->line (AssociatePoint2LineSegmentKNN, :238-317): all 5 nearest
    reference edge points within 0.3 m AND all on one segment; the
    association is that segment's fitted line, the residual point is kept in
    the neighbor's local frame.
  * point->plane (AssociatePoint2Plane, :550-629): the query scan's surfFlat
    points against the reference scan's surfLessFlat; 10-NN within 1 m, all
    of one ground class; plane fitted in the reference local frame with the
    0.03 m tolerance (FormPlane) and a non-collinearity check (FormLine).
  * line->line (FindAssociations, :120-197): point-vote matrix between
    segments, <=7 deg direction gate, one-to-one by best votes.
  * neighbor graph (FindNeighbors, :19-111): k nearest scan centers plus the
    forced temporal prev/next, plus loop-closure candidates (far in index,
    near in space).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3

P2L_KNN = 5
P2L_DIST = 0.3       # config point_to_line_dis_threshold default
P2P_KNN = 10
P2P_DIST = 1.0       # config point_to_plane_dis_threshold default
PLANE_TOL = 0.03     # config lidar_plane_tolerance default
L2L_ANGLE_DEG = 7.0  # FindAssociations direction gate
L2L_MIN_VOTES = 3


def to_world(pose, pts):
    """pose = [aa_lw, t_lw] (world->lidar); p_w = R_lw^T (p_l - t_lw)."""
    R_lw = se3.exp_so3(pose[..., :3])
    return se3.einsum("...ji,...pj->...pi", R_lw, pts - pose[..., None, 3:])


def scan_centers(poses):
    """World positions of the scan origins: t_wl = -R_lw^T t_lw."""
    R_lw = se3.exp_so3(poses[:, :3])
    return -se3.einsum("nji,nj->ni", R_lw, poses[:, 3:])


def find_neighbors(poses, valid, k: int = 6, loop_radius: float = 2.0,
                   loop_min_gap: int = 200, n_loop: int = 2):
    """Neighbor scan graph (FindNeighbors, LidarFeatureAssociate.cpp:19-111).

    Host-side control plane (numpy): k nearest scan centers + forced
    temporal prev/next + up to n_loop loop-closure candidates per scan
    (center distance < loop_radius, index gap > loop_min_gap).

    Returns (pair_r (M,), pair_n (M,)) unique directed pairs r != n.
    """
    from scipy.spatial import cKDTree
    centers = np.asarray(scan_centers(jnp.asarray(poses)))
    valid = np.asarray(valid)
    n = len(centers)
    vi = np.nonzero(valid)[0]
    pairs = set()
    if len(vi) >= 2:
        # KD-tree over the valid centers: O(n log n) instead of the n x n
        # distance matrix (610 MB + ~n python sorts at Campus-Large's 8730
        # scans, /root/reference/README.md:83)
        tree = cKDTree(centers[vi])
        kq = min(k + 1, len(vi))                  # +1: self comes back first
        dd, jj = tree.query(centers[vi], k=kq)
        dd, jj = np.atleast_2d(dd), np.atleast_2d(jj)
        # loop closures: far in time, close in space — one vectorized ball
        # query for all scans (a python-level query per scan costs ~9 s at
        # Campus-Large's 8730 scans), nearest n_loop beyond the index gap
        balls = tree.query_ball_point(centers[vi], loop_radius)
        for a, i in enumerate(vi):
            for b in range(kq):
                j = int(vi[jj[a, b]])
                if j != i and np.isfinite(dd[a, b]):
                    pairs.add((int(i), j))
            cand = [(np.linalg.norm(centers[int(vi[b])] - centers[i]),
                     int(vi[b])) for b in balls[a]
                    if abs(int(vi[b]) - int(i)) > loop_min_gap]
            for _, j in sorted(cand)[:n_loop]:
                pairs.add((int(i), j))
    for i in vi:
        for j in (i - 1, i + 1):  # forced temporal
            if 0 <= j < n and valid[j]:
                pairs.add((int(i), int(j)))
    pair_r = np.array([p[0] for p in sorted(pairs)], np.int32)
    pair_n = np.array([p[1] for p in sorted(pairs)], np.int32)
    return pair_r, pair_n


def _masked_cdist2(a, a_mask, b, b_mask):
    """Squared distances (A, B) with invalid entries +inf."""
    d2 = (jnp.sum(a * a, axis=-1)[:, None] + jnp.sum(b * b, axis=-1)[None, :]
          - 2.0 * se3.einsum("ak,bk->ab", a, b))
    return jnp.where(a_mask[:, None] & b_mask[None, :], jnp.maximum(d2, 0.0), jnp.inf)


def _pack_dist_keys(d2):
    """Monotone packed keys: f32 d2 >= 0 bitcast to int32 keeps order, so
    the low ceil(log2(T)) mantissa bits can carry the column index — one
    min-reduction then yields BOTH the (quantized) min distance and its
    argmin. Returns (key (Q,T) int32, low_mask int)."""
    T = d2.shape[1]
    nbits = max((T - 1).bit_length(), 1)
    low_mask = (1 << nbits) - 1
    bits = jax.lax.bitcast_convert_type(
        jnp.minimum(d2, jnp.float32(3e37)).astype(jnp.float32), jnp.int32)
    key = (bits & ~jnp.int32(low_mask)) \
        | jnp.arange(T, dtype=jnp.int32)[None, :]
    return key, low_mask


def _knn_small(d2, k: int):
    """k smallest entries per row of d2 (ascending), returned as
    (dist2 (Q,k), idx (Q,k)). k min-reductions over PACKED keys (index in
    the low mantissa bits) — one pass per extraction where argmin +
    take_along + knockout cost ~3, and lax.top_k lowers to a full per-row
    sort (measured 48 / 62 / 29 ms for sweep / top_k / packed at the p2p
    shape, PERF.md round-5). Selection order is exact up to ties within
    the dropped ~log2(T) mantissa bits (<0.03% relative distance);
    returned distances are exact (re-gathered from d2)."""
    Q, T = d2.shape
    key, low_mask = _pack_dist_keys(d2)
    cols = jnp.arange(T, dtype=jnp.int32)[None, :]
    outs_i = []
    for _ in range(k):
        kmin = jnp.min(key, axis=1)
        j = kmin & low_mask
        outs_i.append(j)
        key = jnp.where(cols == j[:, None], jnp.int32(2**31 - 1), key)
    idx = jnp.stack(outs_i, axis=1)
    return jnp.take_along_axis(d2, idx, axis=1), idx


def _use_knn_kernel() -> bool:
    """Whether to route the association KNN through the fused Pallas kernel
    (ops/pallas/knn.py) instead of the XLA matmul + argmin-sweep path.

    MEASURED OFF on the v5e at the production feature caps: the fused
    kernel ran the 16-scan temporal chain at 8.48 ms/pair vs 3.60 ms/pair
    for the XLA path (identical masks), because at CAP_EDGE=1024 /
    CAP_SURF=4096 the (Q,T) matrices are small enough that XLA's fused
    matmul+argmin passes beat the pallas_call's grid overhead and its
    102M scoped-VMEM reservation. The kernel wins only at descriptor-
    matching scale (4096^2, see utils/sift.py) — association stays on
    XLA; pass use_kernel=True to the pair functions to re-measure."""
    return False


def associate_point2line_pair(feats_r, feats_n, pose_r, pose_n,
                              dist_threshold: float = P2L_DIST,
                              use_kernel: bool | None = None):
    """Point->line for one (reference, neighbor) pair. Returns per-neighbor-
    edge-point association dict (fixed CAP_EDGE shapes)."""
    er_w = to_world(pose_r, feats_r["less_sharp"])
    en_w = to_world(pose_n, feats_n["less_sharp"])
    if use_kernel is None:
        use_kernel = _use_knn_kernel()
    if use_kernel:
        from ..ops.pallas.knn import knn_pallas
        knn_d2, idx = knn_pallas(en_w, feats_n["less_sharp_mask"],
                                 er_w, feats_r["less_sharp_mask"], k=P2L_KNN)
    else:
        d2 = _masked_cdist2(en_w, feats_n["less_sharp_mask"],
                            er_w, feats_r["less_sharp_mask"])
        knn_d2, idx = _knn_small(d2, P2L_KNN)       # (Pn, 5)
    labels = feats_r["point_to_segment"][idx]        # (Pn, 5)
    all_close = knn_d2[:, -1] <= dist_threshold ** 2
    same_seg = jnp.all(labels == labels[:, :1], axis=1) & (labels[:, 0] >= 0)
    ok = all_close & same_seg & feats_n["less_sharp_mask"]
    seg = jnp.clip(labels[:, 0], 0)
    line_pt = feats_r["line_points"][seg]            # reference local frame
    line_dir = feats_r["line_dirs"][seg]
    ok = ok & feats_r["line_mask"][seg]
    return {"mask": ok, "point": feats_n["less_sharp"],
            "line_pt": line_pt, "line_dir": line_dir, "seg_r": seg,
            "seg_n": jnp.clip(feats_n["point_to_segment"], 0),
            "seg_n_valid": feats_n["point_to_segment"] >= 0}


def associate_point2plane_pair(feats_r, feats_n, pose_r, pose_n,
                               dist_threshold: float = P2P_DIST,
                               plane_tolerance: float = PLANE_TOL,
                               use_kernel: bool | None = None):
    """Point->plane for one pair (query = neighbor surfFlat, targets =
    reference surfLessFlat). Plane fitted in the reference local frame.

    Cross-ring candidates (LOAM-style, a deliberate improvement over the
    reference's plain 10-NN): on near-horizontal surfaces a VLP scan's
    nearest neighbors all lie on ONE ring arc -> collinear -> the plane fit
    degenerates and the reference's FormLine check rejects it, silently
    dropping every floor/ceiling constraint. Adding the nearest point from
    each of the 4 adjacent rings makes those fits well-posed."""
    from ..ops import geometry
    q_local = feats_n["flat"]
    q_w = to_world(pose_n, q_local)
    t_local = feats_r["less_flat"]
    t_w = to_world(pose_r, t_local)
    q_row = feats_n["flat_row"]
    t_row = feats_r["less_flat_row"]
    if use_kernel is None:
        use_kernel = _use_knn_kernel()
    if use_kernel:
        # fused pass: 10-NN + the 4 ring candidates from the same VMEM tiles
        from ..ops.pallas.knn import knn_ring_pallas
        knn_d2, idx, ring_d2, ring_idx = knn_ring_pallas(
            q_w, feats_n["flat_mask"], t_w, feats_r["less_flat_mask"],
            q_row, t_row, k=P2P_KNN, drs=(-2, -1, 1, 2))
        idx_ext = jnp.concatenate([idx, ring_idx], axis=1)       # (Q, 14)
        d2_ext = jnp.concatenate([knn_d2, ring_d2], axis=1)
    else:
        d2 = _masked_cdist2(q_w, feats_n["flat_mask"], t_w,
                            feats_r["less_flat_mask"])
        knn_d2, idx = _knn_small(d2, P2P_KNN)        # (Q, 10)
        # per-ring nearest in ONE masked min-reduction each over the packed
        # keys (index rides in the low bits) instead of argmin + take_along
        key0, low_mask = _pack_dist_keys(d2)
        BIGKEY = jnp.int32(2**31 - 1)
        ring_idx = []
        ring_d2 = []
        for dr in (-2, -1, 1, 2):
            same = t_row[None, :] == (q_row[:, None] + dr)
            kmin = jnp.min(jnp.where(same, key0, BIGKEY), axis=1)
            j = jnp.where(kmin != BIGKEY, kmin & low_mask, 0)
            ring_idx.append(j)
            dval = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
            ring_d2.append(jnp.where(kmin != BIGKEY, dval, jnp.inf))
        idx_ext = jnp.concatenate([idx, jnp.stack(ring_idx, axis=1)], axis=1)
        d2_ext = jnp.concatenate([knn_d2, jnp.stack(ring_d2, axis=1)], axis=1)
    close = knn_d2[:, -1] <= dist_threshold ** 2
    # ground-class agreement over used candidates
    q_g = feats_n["flat_ground"]
    t_g = feats_r["less_flat_ground"][idx]
    same_class = jnp.all(t_g == q_g[:, None], axis=1)
    # plane fit in reference local coordinates over all in-range candidates
    nn_local = t_local[idx_ext]                      # (Q, 14, 3)
    nn_mask = d2_ext <= dist_threshold ** 2
    fit = jax.vmap(lambda p, m: geometry.fit_plane_lsq(p, m, tolerance=plane_tolerance))(
        nn_local, nn_mask)
    # non-collinearity (reference FormLine check): reject if the 10 points
    # are essentially a line (middle eigenvalue << largest)
    ev = fit["eigvals"]
    collinear = ev[..., 1] < 2.7e-3 * ev[..., 2]
    ok = (close & same_class & fit["ok"] & ~collinear & feats_n["flat_mask"])
    plane = jnp.concatenate([fit["normal"], fit["d"][:, None]], axis=1)
    return {"mask": ok, "point": q_local, "plane": plane}


def associate_line2line_pair(p2l, feats_r, feats_n,
                             angle_deg: float = L2L_ANGLE_DEG,
                             min_votes: int = L2L_MIN_VOTES):
    """Line->line via the point-vote matrix (FindAssociations,
    LidarFeatureAssociate.cpp:120-197): each point->line association votes
    (its own segment in n) -> (matched segment in r); one-to-one by max
    votes with a direction gate."""
    from ..ops import geometry
    L = feats_r["line_dirs"].shape[0]
    votes = jnp.zeros((L, L), jnp.int32)  # [seg_n, seg_r]
    vote_ok = p2l["mask"] & p2l["seg_n_valid"]
    votes = votes.at[p2l["seg_n"], p2l["seg_r"]].add(vote_ok.astype(jnp.int32))
    # direction gate
    ang = geometry.line_angle_between(
        feats_n["line_dirs"][:, None, :], feats_r["line_dirs"][None, :, :],
        degrees=True)
    gate = (ang <= angle_deg) & feats_n["line_mask"][:, None] & feats_r["line_mask"][None, :]
    votes = jnp.where(gate, votes, 0)
    best_r = jnp.argmax(votes, axis=1)               # (L,) for each seg_n
    best_v = jnp.take_along_axis(votes, best_r[:, None], axis=1)[:, 0]
    # one-to-one: seg_n keeps its match only if it wins the column
    col_best = jnp.argmax(votes, axis=0)
    ok = (best_v >= min_votes) & (col_best[best_r] == jnp.arange(L))
    return {"mask": ok, "dir_n": feats_n["line_dirs"],
            "dir_r": feats_r["line_dirs"][best_r], "seg_r": best_r}


@functools.partial(jax.jit, static_argnames=())
def associate_all_pairs(batch, poses, pair_r, pair_n):
    """Associate every pair in (pair_r, pair_n). batch = stacked per-scan
    feature dict (leading scan axis). Returns pytree with leading pair axis
    (lax.map over pairs keeps peak memory at one pair's matrices)."""

    def one(pair):
        r, n = pair
        fr = jax.tree_util.tree_map(lambda a: a[r], batch)
        fn = jax.tree_util.tree_map(lambda a: a[n], batch)
        p2l = associate_point2line_pair(fr, fn, poses[r], poses[n])
        p2p = associate_point2plane_pair(fr, fn, poses[r], poses[n])
        l2l = associate_line2line_pair(p2l, fr, fn)
        p2l.pop("seg_n"); p2l.pop("seg_n_valid"); p2l.pop("seg_r")
        return {"p2l": p2l, "p2p": p2p, "l2l": l2l}

    return jax.lax.map(one, (pair_r, pair_n), batch_size=8)
