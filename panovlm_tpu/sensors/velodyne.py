"""Velodyne VLP LiDAR frontend — range image, features, segmentation.

TPU re-design of sensors/Velodyne.{h,cpp} (reference). The reference builds a
16x1800 range image by sequentially walking the interleaved packet order
(ReOrderVLP, Velodyne.cpp:371-526), then runs per-scan sequential loops for
curvature (ExtractFeatures :531-769), greedy edge/plane picking
(ExtractEdgeFeatures2 :885-999, ExtractPlaneFeatures2 :1100-1189), BFS range-
image segmentation (Segmentation :1438-1595, from LeGO-LOAM) and per-point
slerp undistortion (UndistortCloud :1642-1674).

Here every stage is a fixed-shape batched array program over the
(N_SCANS, H) range image:

  * ring/column assignment is closed-form from elevation/azimuth (no
    sequential cross-z-axis state machine) with a scatter-min z-buffer;
  * rows are compacted (valid cells in column order) so the per-scan
    "sequence" adjacency matches the reference's reordered cloud exactly;
  * the adaptive curvature window is found with static-size offset scans +
    cumulative sums instead of while-loops;
  * greedy feature picking is a short lax.fori_loop: one masked argmax per
    (scan, sector) per step, suppression applied as vectorized masks —
    sector-parallel instead of sector-sequential (sectors are disjoint);
  * segmentation is label propagation: per-row segmented min-scans
    (associative_scan) alternating with 4-neighbor min steps, followed by
    scatter-based component statistics (size / distinct rows), instead of BFS;
  * undistortion is batched axis-angle scaling (slerp from identity).

Axis convention matches the reference (Velodyne.cpp:124-131): input clouds
are rotated lidar->camera (X right, Y down, Z front) before anything else,
points closer than 0.5 m dropped, scans with <4000 points flagged invalid.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# cloudState flags (reference sensors/Velodyne.h:55-66)
NORMAL, LESS_SHARP, SHARP, FLAT, GROUND, DISABLE, OCCLUDED = (
    1, 2, 4, 8, 16, 32, 64)

N_SCANS = 16
HORIZON = 1800
MIN_RANGE = 0.5
MIN_VALID_POINTS = 4000

AXIS_SWAP = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]], np.float32)


def preprocess_cloud(xyz: np.ndarray) -> tuple[np.ndarray, bool]:
    """Axis swap lidar->camera + min-range filter (Velodyne.cpp:124-140).
    Host-side data prep. Returns (points, valid_scan)."""
    pts = np.asarray(xyz[:, :3], np.float32)
    pts = pts[np.isfinite(pts).all(axis=1)]
    pts = pts @ AXIS_SWAP.T
    keep = (pts ** 2).sum(axis=1) >= MIN_RANGE * MIN_RANGE
    pts = pts[keep]
    return pts, len(pts) >= MIN_VALID_POINTS


def pad_points(pts: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    n = min(len(pts), cap)
    out = np.zeros((cap, 3), np.float32)
    out[:n] = pts[:n]
    mask = np.zeros((cap,), bool)
    mask[:n] = True
    return out, mask


# ----------------------------------------------------------------------------
# packet-order conflict repair (ReOrderVLP2)
# ----------------------------------------------------------------------------

# VLP-16 interleaved firing order (Velodyne.cpp:246-254): within one firing
# column the rings arrive as 0,8,1,9,...,7,15. SCAN_TO_ORDER[ring] = position
# in the firing sequence; ORDER_TO_SCAN is the canonical ring sequence.
_S2O = np.empty(16, np.int32)
_S2O[:8] = 2 * np.arange(8)
_S2O[8:] = 2 * np.arange(8, 16) - 15
_O2S = np.empty(16, np.int32)
_O2S[_S2O] = np.arange(16)


def _lcs_len(seq, seq_valid, ref):
    """Longest common subsequence length between a masked <=16 sequence and
    the fixed 16-element reference (LongestCommonSubsequence,
    Velodyne.cpp:188-211) as a 16x16 lax.scan DP."""
    R = ref.shape[0]

    def row(dp, sv):
        s, v = sv

        def cell(carry, k):
            left = carry            # new[k-1]
            diag = dp[k - 1]
            up = dp[k]
            val = jnp.where(ref[k - 1] == s, diag + 1, jnp.maximum(up, left))
            return val, val

        _, new_tail = jax.lax.scan(cell, jnp.int32(0), jnp.arange(1, R + 1))
        new = jnp.concatenate([jnp.zeros((1,), jnp.int32), new_tail])
        return jnp.where(v, new, dp), None

    dp0 = jnp.zeros((R + 1,), jnp.int32)
    dp, _ = jax.lax.scan(row, dp0, (seq, seq_valid))
    return dp[R]


@functools.partial(jax.jit, static_argnames=("n_scans", "max_cols"))
def repair_ring_conflicts(pts, mask, n_scans: int = N_SCANS,
                          max_cols: int = 4096):
    """ReOrderVLP2 (Velodyne.cpp:213-369): when two points of one firing
    column land on the same computed ring (elevation noise at a ring
    boundary), decide which is wrong by trying ring-1 for the first
    occurrence vs ring+1 for the second and keeping the assignment whose
    column ring-sequence has the longer LCS against the canonical
    interleave order. Returns a repaired per-point ring array (-1 invalid).

    TPU design: the reference's sequential packet walk becomes (1) firing
    columns from the wrap of the interleave order (cummax segmentation),
    (2) a (max_cols, 16) slot matrix by scatter, (3) conflict candidates
    scored by a vmapped 16x16 LCS DP over all columns at once. Like the
    reference, only the most-occupied conflict per column is repaired
    (Velodyne.cpp:283 handles conflicts pairwise under the same
    one-bad-point assumption)."""
    P = pts.shape[0]
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    vert_deg = jnp.degrees(jnp.arctan2(-y, jnp.sqrt(x * x + z * z)))
    ring = jnp.floor((vert_deg + 15.0) / 2.0 + 0.5).astype(jnp.int32)
    ok = mask & (ring >= 0) & (ring < n_scans)
    ring_c = jnp.clip(ring, 0, n_scans - 1)
    order = jnp.asarray(_S2O)[ring_c]

    # previous valid point's order: cummax of (valid ? i : -1) gives the
    # index of the last valid point at or before i
    idx = jnp.arange(P)
    pv = jax.lax.associative_scan(jnp.maximum, jnp.where(ok, idx, -1))
    prev_i = jnp.where(idx > 0, pv[jnp.maximum(idx - 1, 0)], -1)
    prev_order = jnp.where(prev_i >= 0, order[jnp.maximum(prev_i, 0)], -1)
    boundary = ok & (order < prev_order)          # new column starts here
    # column id = number of boundaries at or before i (the first column has
    # id 0: prev_order starts at -1 so it carries no boundary flag)
    col = jnp.cumsum(boundary.astype(jnp.int32))
    col = jnp.where(ok & (col < max_cols), col, -1)

    # slot within column: valid-prefix count minus the column's first count
    c = jnp.cumsum(ok.astype(jnp.int32))          # 1-indexed
    col_first = jnp.full((max_cols,), 2 ** 30, jnp.int32).at[col].min(
        jnp.where(ok, c, 2 ** 30), mode="drop")
    slot = jnp.where(ok, c - col_first[jnp.maximum(col, 0)], 16)
    in_col = ok & (slot < 16) & (col >= 0)

    # (max_cols, 16) matrices of ring and point index
    big = jnp.int32(-1)
    ring_m = jnp.full((max_cols, 16), big).at[col, slot].set(
        jnp.where(in_col, ring_c, big), mode="drop")
    pidx_m = jnp.full((max_cols, 16), big).at[col, slot].set(
        jnp.where(in_col, idx.astype(jnp.int32), big), mode="drop")
    valid_m = ring_m >= 0

    # conflicts: per-column ring occupation
    occ = jnp.zeros((max_cols, n_scans), jnp.int32).at[
        jnp.arange(max_cols)[:, None].repeat(16, 1), ring_m].add(
        valid_m.astype(jnp.int32), mode="drop")
    conflict_ring = jnp.argmax(occ, axis=1).astype(jnp.int32)  # most occupied
    has_conflict = jnp.take_along_axis(
        occ, conflict_ring[:, None], axis=1)[:, 0] >= 2

    # first / second occurrence slots of the conflicted ring
    is_conf = valid_m & (ring_m == conflict_ring[:, None])
    slot_iota = jnp.arange(16)[None, :]
    first_s = jnp.argmax(is_conf, axis=1)
    after = is_conf & (slot_iota > first_s[:, None])
    second_s = jnp.argmax(after, axis=1)

    o2s = jnp.asarray(_O2S)

    def score(col_rings, col_valid, cslot, new_ring):
        seq = col_rings.at[cslot].set(new_ring)
        return _lcs_len(seq, col_valid, o2s)

    s1 = jax.vmap(score)(ring_m, valid_m, first_s, conflict_ring - 1)
    s2 = jax.vmap(score)(ring_m, valid_m, second_s, conflict_ring + 1)
    s1 = jnp.where(conflict_ring - 1 >= 0, s1, 0)
    s2 = jnp.where(conflict_ring + 1 < n_scans, s2, 0)

    use_first = s1 > s2
    fix_slot = jnp.where(use_first, first_s, second_s)
    fix_ring = jnp.where(use_first, conflict_ring - 1, conflict_ring + 1)
    fix_pt = jnp.take_along_axis(pidx_m, fix_slot[:, None], axis=1)[:, 0]
    do_fix = (has_conflict & (fix_ring >= 0) & (fix_ring < n_scans)
              & (fix_pt >= 0))

    out = jnp.where(ok, ring_c, -1)
    out = out.at[jnp.where(do_fix, fix_pt, P)].set(
        jnp.where(do_fix, fix_ring, -1), mode="drop")
    return out


# ----------------------------------------------------------------------------
# range image
# ----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_scans", "horizon"))
def build_range_image(pts, mask, n_scans: int = N_SCANS, horizon: int = HORIZON,
                      ring: jnp.ndarray | None = None):
    """Scatter points into the (n_scans, horizon) range image.

    Ring id via the VLP-16 elevation formula (VerticalAngleToScanID,
    Velodyne.cpp:170-186); column from azimuth relative to the first valid
    point's azimuth (the reference's start_ori, Velodyne.cpp:398-400).
    Collisions keep the nearer return (the reference keeps the last write).

    Binning runs as two lax.sorts instead of a scatter-min + winner gather
    (both pay the ~131 M elem/s scatter/gather path; the TPU sort measures
    ~2x cheaper for the same exact result, PERF.md round-5): points sort by
    (cell, quantized range, point index) with xyz/rel_time as payloads, one
    sentinel entry per cell guarantees every cell has a segment, and the
    per-cell segment heads — the nearest return, ties to the lowest point
    index, exactly the scatter-min's packed-key order — are compacted back
    to the dense row-major image by a second sort on (head ? cell : big).
    rel_time in [0,1) is the azimuth sweep fraction, used for undistortion.
    """
    P = pts.shape[0]
    assert P <= 65536, "point index must fit the packed key's low 16 bits"
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rng = jnp.sqrt(x * x + y * y + z * z)
    if ring is None:
        vert_deg = jnp.degrees(jnp.arctan2(-y, jnp.sqrt(x * x + z * z)))
        ring = jnp.floor((vert_deg + 15.0) / 2.0 + 0.5).astype(jnp.int32)
    ring_ok = (ring >= 0) & (ring < n_scans)
    ring = jnp.clip(ring, 0, n_scans - 1)

    ori = jnp.arctan2(x, z)
    ori = jnp.where(ori < 0, ori + 2 * jnp.pi, ori)
    first = jnp.argmax(mask)  # index of first valid point
    start_ori = ori[first]
    rel = jnp.mod(ori - start_ori, 2 * jnp.pi)
    res = 2 * jnp.pi / horizon
    col = jnp.mod(jnp.round(rel / res).astype(jnp.int32), horizon)
    rel_time = rel / (2 * jnp.pi)

    ok = mask & ring_ok & (rng > 0)
    rq = jnp.clip(jnp.round(rng / 0.002), 0, 32766).astype(jnp.int32)
    SH = n_scans * horizon
    cell = ring * horizon + col
    k1 = jnp.where(ok, cell, SH)
    k2 = (rq << 16) | jnp.arange(P, dtype=jnp.int32)
    SENT2 = jnp.int32(0x7FFF << 16)      # above any real (rq<<16 | idx)
    k1_all = jnp.concatenate([k1, jnp.arange(SH, dtype=jnp.int32)])
    k2_all = jnp.concatenate([k2, jnp.full((SH,), SENT2)])
    zpad = jnp.zeros((SH,), pts.dtype)
    xs = jnp.concatenate([x, zpad])
    ys = jnp.concatenate([y, zpad])
    zs = jnp.concatenate([z, zpad])
    # rel_time and validity are NOT carried as sort payloads: both are
    # recomputed from the winner xyz after compaction (bit-exact — same
    # formula on the same stored values; an ok point has rng>0 so only
    # sentinel winners have |xyz|=0). Sorts go 6 -> 5 and 6 -> 4 operands.
    k1s, k2s, xs, ys, zs = jax.lax.sort(
        (k1_all, k2_all, xs, ys, zs), dimension=0, num_keys=2)
    is_head = jnp.concatenate([jnp.ones((1,), bool), k1s[1:] != k1s[:-1]])
    win = is_head & (k1s < SH)
    key_c = jnp.where(win, k1s, SH)
    _, xs, ys, zs = jax.lax.sort(
        (key_c, xs, ys, zs), dimension=0, num_keys=1)
    xyz_img = jnp.stack([xs[:SH], ys[:SH], zs[:SH]], -1).reshape(
        n_scans, horizon, 3)
    sq = jnp.sum(xyz_img * xyz_img, axis=-1)
    valid = sq > 0
    xyz_img = jnp.where(valid[..., None], xyz_img, 0.0)
    r_img = jnp.where(valid, jnp.sqrt(sq), 0.0)
    ori_w = jnp.arctan2(xyz_img[..., 0], xyz_img[..., 2])
    ori_w = jnp.where(ori_w < 0, ori_w + 2 * jnp.pi, ori_w)
    t_img = jnp.where(valid,
                      jnp.mod(ori_w - start_ori, 2 * jnp.pi) / (2 * jnp.pi),
                      0.0)
    return {"range": r_img, "xyz": xyz_img, "valid": valid, "rel_time": t_img}


@jax.jit
def compact_rows(img):
    """Per-row compaction: valid cells in column order, padded right.

    The compacted sequence reproduces the reference's reordered cloud_scan
    adjacency (consecutive points of one scan line), which the curvature and
    picking logic rely on (Velodyne.cpp:506-520).

    Compaction IS a per-row sort: key = col for valid cells, H + col for
    invalid, with the xyz channels riding as lax.sort payloads. XLA's TPU
    sort at this size measures ~free where the previous cumsum + scatter +
    winner-gather paid the ~131 M elem/s scatter/gather path twice
    (PERF.md round-5 probe: 1.1 -> ~0.1 ms/scan).
    """
    valid = img["valid"]
    S, H = valid.shape
    ground = img.get("ground", jnp.zeros((S, H), bool))
    col = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :], (S, H))
    # key: (invalid)<<13 | col<<1 | ground — cols are unique per row, so the
    # ground bit never affects ordering; invalid cells sort to the right
    key = ((~valid).astype(jnp.int32) << 13) | (col << 1) \
        | ground.astype(jnp.int32)
    xyz = img["xyz"]
    key_s, x_s, y_s, z_s = jax.lax.sort(
        (key, xyz[..., 0], xyz[..., 1], xyz[..., 2]),
        dimension=1, num_keys=1)
    out_valid = key_s < (1 << 13)
    xyz_s = jnp.where(out_valid[..., None],
                      jnp.stack([x_s, y_s, z_s], axis=-1), 0.0)
    return {
        "xyz": xyz_s,
        "range": jnp.where(out_valid, jnp.linalg.norm(xyz_s, axis=-1), 0.0),
        "col": jnp.where(out_valid, (key_s >> 1) & 0xFFF, 0),
        "valid": out_valid,
        "ground": out_valid & ((key_s & 1) != 0),
        "count": jnp.sum(valid, axis=1),
    }


# ----------------------------------------------------------------------------
# segmentation (LeGO-LOAM angle criterion, label propagation)
# ----------------------------------------------------------------------------

def _shift_fill(x, k: int, axis: int, fill):
    """out[i] = x[i - k] along `axis`; vacated slots get `fill`.
    Static offset -> slice + pad, pure memory ops (no gather)."""
    W = x.shape[axis]
    a = abs(k)
    if a == 0:
        return x
    if a >= W:
        return jnp.full_like(x, fill)
    pad = jnp.full_like(jax.lax.slice_in_dim(x, 0, a, axis=axis), fill)
    if k > 0:
        return jnp.concatenate(
            [pad, jax.lax.slice_in_dim(x, 0, W - a, axis=axis)], axis=axis)
    return jnp.concatenate(
        [jax.lax.slice_in_dim(x, a, W, axis=axis), pad], axis=axis)


def _seg_run_min(lab, conn, axis: int, big):
    """Broadcast the per-run minimum to every member: conn[i] True means
    element i is connected to i-1 along `axis`; runs are maximal conn
    chains. Bidirectional segmented Hillis-Steele doubling — log2(N) steps
    of static-shift elementwise ops (one loop covers both scan directions,
    replacing a forward + a reverse associative_scan), no transposes for
    column scans (axis handled natively)."""
    N = lab.shape[axis]
    cf = conn                                   # conn(i, i-d) accumulator
    cb = _shift_fill(conn, -1, axis, False)     # conn(i, i+d)
    d = 1
    while d < N:
        lab = jnp.where(cf, jnp.minimum(lab, _shift_fill(lab, d, axis, big)), lab)
        lab = jnp.where(cb, jnp.minimum(lab, _shift_fill(lab, -d, axis, big)), lab)
        cf = cf & _shift_fill(cf, d, axis, False)
        cb = cb & _shift_fill(cb, -d, axis, False)
        d *= 2
    return lab


def _segment_totals(x, is_start):
    """Per-segment totals broadcast to every member. Segments are maximal
    runs starting at is_start positions; x is summed within each segment
    and every member receives the segment total. Two associative scans of
    elementwise ops — no gathers, no scatters (the scatter/gather path on
    this chip costs ~131 M elem/s while fused elementwise scans are free,
    PERF.md calibration)."""
    def seg_sum(a, b):
        (s1, f1), (s2, f2) = a, b
        return jnp.where(f2, s2, s1 + s2), f1 | f2

    csum, _ = jax.lax.associative_scan(seg_sum, (x, is_start))
    is_end = jnp.concatenate([is_start[1:], jnp.ones((1,), bool)])

    def carry_last(a, b):
        (v1, f1), (v2, f2) = a, b
        return jnp.where(f2, v2, v1), f1 | f2

    rev, _ = jax.lax.associative_scan(
        carry_last, (jnp.flip(jnp.where(is_end, csum, 0)), jnp.flip(is_end)))
    return jnp.flip(rev)


@functools.partial(jax.jit, static_argnames=("iters",))
def segment_range_image(r_img, valid, iters: int = 4,
                        theta_deg: float = 20.0):
    """Connected-component segmentation over the range image
    (Segmentation, Velodyne.cpp:1438-1595 — Fast Range Image Segmentation,
    IROS'16): neighbors join a component when
    atan2(d2 sin(a), d1 - d2 cos(a)) > theta. Components keep their points
    when size >= 30, or size >= 5 spanning >= 3 scan rows.

    Returns (labels (S,H) int32, keep (S,H) bool).
    """
    S, H = r_img.shape
    alpha_x = jnp.float32(np.radians(0.2))
    alpha_y = jnp.float32(np.radians(2.0))
    theta = jnp.float32(np.radians(theta_deg))

    def connected(ra, rb, alpha):
        d1 = jnp.maximum(ra, rb)
        d2 = jnp.minimum(ra, rb)
        ang = jnp.arctan2(d2 * jnp.sin(alpha), d1 - d2 * jnp.cos(alpha))
        return ang > theta

    left = jnp.roll(r_img, 1, axis=1)
    left_ok = jnp.roll(valid, 1, axis=1)
    conn_left = connected(r_img, left, alpha_x) & valid & left_ok  # wraps
    up = jnp.concatenate([jnp.zeros_like(r_img[:1]), r_img[:-1]], axis=0)
    up_ok = jnp.concatenate([jnp.zeros_like(valid[:1]), valid[:-1]], axis=0)
    conn_up = connected(r_img, up, alpha_y) & valid & up_ok

    # the doubling scans are HBM-traffic bound; S*H < 32767, so the label
    # word is int16 for the whole propagation loop (half the bytes of the
    # int32 first version), widened only for the scatter reductions below
    lab_t = jnp.int16 if S * H < 32767 else jnp.int32
    lin = jnp.arange(S * H, dtype=lab_t).reshape(S, H)
    big = jnp.asarray(S * H, lab_t)
    labels = jnp.where(valid, lin, big)

    conn_row = conn_left.at[:, 0].set(False)

    def body(_, lab):
        # row runs (non-wrapping part)
        lab = _seg_run_min(lab, conn_row, axis=1, big=big)
        # wrap column 0 <-> H-1
        wrap = conn_left[:, 0]
        lab = lab.at[:, 0].min(jnp.where(wrap, lab[:, -1], big))
        lab = lab.at[:, -1].min(jnp.where(wrap, lab[:, 0], big))
        # vertical: full column runs (16-tall), so each iteration moves
        # labels across a whole row+column path, not one vertical step
        lab = _seg_run_min(lab, conn_up, axis=0, big=big)
        return jnp.where(valid, lab, big)

    labels = jax.lax.fori_loop(0, iters, body, labels)
    labels = labels.astype(jnp.int32)

    # Component stats without the big-table scatter/gather round trips
    # (measured ~1 ms/scan on the v5e — the largest single extraction cost):
    # sort cells by (label, linear index) — XLA's TPU sort measures ~free at
    # this size — compute per-segment size and distinct-row counts with
    # segmented scans, then a second sort by linear index restores cell
    # order with the keep bit riding in the key's LSB.
    assert S * H < (1 << 15), "packed sort key needs label and index in 15 bits"
    flat = labels.ravel()
    idx = jnp.arange(S * H, dtype=jnp.int32)
    k = jnp.sort((flat << 15) | idx)
    lab_s = k >> 15
    idx_s = k & 0x7FFF
    valid_s = lab_s < S * H            # invalid cells carry the big label
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), lab_s[1:] != lab_s[:-1]])
    row_s = idx_s // H                 # rows nondecreasing within a segment
    new_row = is_start | (row_s != jnp.concatenate([row_s[:1], row_s[:-1]]))
    size_of = _segment_totals(valid_s.astype(jnp.int32), is_start)
    rows_of = _segment_totals((new_row & valid_s).astype(jnp.int32), is_start)
    keep_s = valid_s & ((size_of >= 30) | ((size_of >= 5) & (rows_of >= 3)))
    k2 = jnp.sort((idx_s << 1) | keep_s.astype(jnp.int32))
    keep = ((k2 & 1) == 1).reshape(S, H) & valid
    return labels, keep


@functools.partial(jax.jit, static_argnames=("max_ground_ring", "slope_deg"))
def mark_ground(img, max_ground_ring: int = 8, slope_deg: float = 10.0):
    """Ground-cell detection on the range image.

    Vectorized analog of the reference's ground handling
    (sensors/ground_segmentation.{h,cpp} linefit / SegmentGround,
    Velodyne.cpp:1326-1401): for the downward-looking rings, the vector
    between vertically-adjacent cells of one azimuth column must be nearly
    horizontal (slope < slope_deg) for both cells to be ground. Ground cells
    are exempted from the component-size segmentation drop (LeGO-LOAM
    excludes ground before segmentation — otherwise isolated floor ring arcs
    form thin components and are discarded wholesale).
    Camera convention: y points DOWN, so ground height = +y.
    """
    xyz, valid = img["xyz"], img["valid"]
    S, H = valid.shape
    up = xyz[1:max_ground_ring + 1]      # (G, H, 3) the next ring up
    lo = xyz[:max_ground_ring]
    d = up - lo
    horiz = jnp.sqrt(d[..., 0] ** 2 + d[..., 2] ** 2)
    slope = jnp.degrees(jnp.arctan2(jnp.abs(d[..., 1]), horiz))
    both = valid[1:max_ground_ring + 1] & valid[:max_ground_ring]
    flat_step = (slope < slope_deg) & both
    ground = jnp.zeros((S, H), bool)
    ground = ground.at[:max_ground_ring].set(ground[:max_ground_ring] | flat_step)
    ground = ground.at[1:max_ground_ring + 1].set(ground[1:max_ground_ring + 1] | flat_step)
    return ground & valid


# ----------------------------------------------------------------------------
# curvature
# ----------------------------------------------------------------------------

def shift_clamp(x, k: int, axis: int = 1):
    """x shifted so out[i] = x[clamp(i + k)] along `axis`, edges clamped.

    Static-offset neighbor access compiles to slice + broadcast + concat —
    pure memory ops — where take_along_axis with an iota+k index lowers to
    XLA's per-element gather path (~131 M elem/s on this chip, PERF.md);
    every fixed-window neighborhood op below routes through this instead.
    """
    if k == 0:
        return x
    W = x.shape[axis]
    a = abs(k)
    if k > 0:
        body = jax.lax.slice_in_dim(x, a, W, axis=axis)
        edge = jax.lax.slice_in_dim(x, W - 1, W, axis=axis)
        parts = [body] + [edge] * a
    else:
        body = jax.lax.slice_in_dim(x, 0, W - a, axis=axis)
        edge = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        parts = [edge] * a + [body]
    return jnp.concatenate(parts, axis=axis)


@functools.partial(jax.jit, static_argnames=("max_window",))
def adaptive_curvature(seq, max_window: int = 16):
    """ADAPTIVE curvature (Velodyne.cpp:625-663): expand the window on each
    side until the point is >= 8 cm away, take the symmetric max window m,
    curvature = |sum(range[i-m..i+m]) - (2m+1) range[i]| / (2m).

    Returns (curvature (S,W), m (S,W) window radius, window_ok (S,W)).
    """
    xyz, rng, valid, count = seq["xyz"], seq["range"], seq["valid"], seq["count"]
    S, W = rng.shape
    idx = jnp.arange(W)[None, :]

    def side_k(direction):
        # smallest k with |p[i +- k] - p[i]| >= 8 cm, estimated from the
        # local point spacing (chord over a fixed +-4 window) instead of the
        # reference's per-point expansion walk: k = ceil(0.08 / spacing).
        # Equivalent wherever spacing is locally uniform (the usual case on
        # surfaces); at a range discontinuity the chord is large, so k -> 1,
        # matching the walk's immediate stop.
        p4 = shift_clamp(xyz, direction * 4)
        chord = jnp.linalg.norm(p4 - xyz, axis=-1)
        spacing = jnp.maximum(chord / 4.0, 1e-4)
        return jnp.clip(jnp.ceil(0.08 / spacing), 1, max_window).astype(jnp.int32)

    m = jnp.maximum(side_k(-1), side_k(+1))

    csum = jnp.cumsum(jnp.where(valid, rng, 0.0), axis=1)
    csum = jnp.concatenate([jnp.zeros((S, 1)), csum], axis=1)  # (S, W+1)
    # windowed sum for the per-point radius m: evaluate the static-shift
    # variant for every k in [1, max_window] and one-hot select by m —
    # max_window elementwise passes instead of two dynamic gathers
    win_sum = jnp.zeros((S, W), csum.dtype)
    for k in range(1, max_window + 1):
        wk = (shift_clamp(csum, k + 1) - shift_clamp(csum, -k))[:, :W]
        win_sum = jnp.where(m == k, wk, win_sum)
    n_win = (2 * m + 1).astype(rng.dtype)
    curv = jnp.abs(win_sum - n_win * rng) / jnp.maximum(2 * m, 1)

    # window must stay within [0, count): mirror of the reference's bounds
    # check (Velodyne.cpp:644-646, relative to scanStartInd-5 .. scanEndInd+5)
    window_ok = (idx - m >= 0) & (idx + m < count[:, None]) & valid
    curv = jnp.where(window_ok, curv, -1.0)
    return curv, m, window_ok


@jax.jit
def loam_curvature(seq):
    """LOAM/lego-loam curvature (Velodyne.cpp:608-623): squared sum of range
    differences over a fixed +-5 window."""
    rng, valid, count = seq["range"], seq["valid"], seq["count"]
    S, W = rng.shape
    idx = jnp.arange(W)[None, :]
    csum = jnp.concatenate([jnp.zeros((S, 1)), jnp.cumsum(jnp.where(valid, rng, 0.0), axis=1)], axis=1)
    m = 5
    win_sum = (shift_clamp(csum, m + 1) - shift_clamp(csum, -m))[:, :W]
    diff = win_sum - (2 * m + 1) * rng
    window_ok = (idx - m >= 0) & (idx + m < count[:, None]) & valid
    return jnp.where(window_ok, diff * diff, -1.0), jnp.full_like(rng, m, jnp.int32), window_ok


@jax.jit
def view_angles(seq, m):
    """Intersection angle (livox-loam eq. 4; Velodyne.cpp:803-812): the angle
    between the beam direction and the local surface chord, in degrees (0..90
    after the |dot|). The chord uses a fixed +-5 window (static shifts; the
    tangent direction is insensitive to the window radius), where the
    reference uses the adaptive radius m — kept in the signature for parity
    documentation."""
    del m
    xyz, rng = seq["xyz"], seq["range"]
    S, W = rng.shape
    idx = jnp.arange(W)[None, :]
    left = shift_clamp(xyz, -5)
    right = shift_clamp(xyz, 5)
    b = left - right
    bn = jnp.linalg.norm(b, axis=-1)
    dot = jnp.abs(jnp.sum(xyz * b, axis=-1))
    cosv = dot / jnp.maximum(rng * bn, 1e-9)
    return jnp.degrees(jnp.arccos(jnp.clip(cosv, -1.0, 1.0)))


# ----------------------------------------------------------------------------
# greedy feature picking
# ----------------------------------------------------------------------------

def _sector_ids(seq):
    """Six curvature sectors per scan over the interior [5, count-6]
    (Velodyne.cpp:700-712). Returns (sec (S,W) in 0..5 or -1, interior)."""
    count = seq["count"]
    W = seq["range"].shape[1]
    idx = jnp.arange(W)[None, :]
    length = count[:, None] - 11  # number of interior points
    interior = (idx >= 5) & (idx <= count[:, None] - 6) & seq["valid"] & (length >= 6)
    rel = idx - 5
    sec = jnp.clip(rel * 6 // jnp.maximum(length, 1), 0, 5)
    return jnp.where(interior, sec, -1), interior


def _suppression_extents(xyz, max_off: int = 16):
    """Per-point suppression extents (Velodyne.cpp:969-988): for a pick at
    column i, columns i+1..i+Rext[i] (and i-1..i-Lext[i]) get disabled.
    Offsets 1..5 stop at a >22.36 cm gap between consecutive points; offsets
    beyond 5 stop when >6 cm from the picked point. Both stop rules depend
    only on the pick location, so the extents are precomputed for every
    candidate column at once (2 x max_off vectorized steps) instead of being
    re-walked per pick.

    Returns (Lext, Rext), each (S, W) int32 in [0, max_off]."""
    S, W = xyz.shape[:2]
    idx = jnp.arange(W)[None, :]
    exts = []
    for direction in (-1, 1):
        stopped = jnp.zeros((S, W), bool)
        ext = jnp.zeros((S, W), jnp.int32)
        for l in range(1, max_off + 1):
            j = idx + direction * l
            oob = (j < 0) | (j >= W)
            pj = shift_clamp(xyz, direction * l)
            pj_prev = shift_clamp(xyz, direction * (l - 1))
            gap = jnp.sum((pj - pj_prev) ** 2, axis=-1)
            far = jnp.sum((pj - xyz) ** 2, axis=-1)
            brk = (gap > 0.05) if l <= 5 else (far > 0.0036)
            stopped = stopped | brk | oob
            ext = jnp.where(stopped, ext, l)
        exts.append(ext)
    return exts[0], exts[1]


@functools.partial(jax.jit, static_argnames=("n_picks", "pick_largest"))
def greedy_pick(seq, curv, eligible, n_picks: int,
                pick_largest: bool = True, extents=None):
    """Greedy per-(scan, sector) picking with neighbor suppression.

    Vectorized analog of the pick loops (Velodyne.cpp:905-989 edges,
    :1117-1160 planes): n_picks rounds; each round picks the extreme-curvature
    eligible point in every (scan, sector) simultaneously (sectors are
    disjoint column spans, so the 6 argmaxes are one batched reduce), then
    suppresses the picked points' neighbor intervals via the precomputed
    extents — a broadcast column compare, no scatters in the loop body.
    Returns (picked (S,W) bool, top_rank (S,W) int32 with the pick round or
    -1, disabled (S,W), pick_idx (n_picks,6,S) int32 column of each pick,
    pick_ok (n_picks,6,S) bool). The dense pick-index list lets callers
    gather the few picked points directly (round-major = best-curvature
    first) instead of compacting full (S,W) masks.
    """
    S, W = curv.shape
    sec, _ = _sector_ids(seq)
    sign = 1.0 if pick_largest else -1.0
    # extents depend only on the point sequence — callers running several
    # pick passes (edges + planes, double extraction) hoist them once
    Lext, Rext = _suppression_extents(seq["xyz"]) if extents is None \
        else extents
    colidx = jnp.arange(W)[None, None, :]
    sec_onehot = sec[None] == jnp.arange(6)[:, None, None]  # (6,S,W)
    Lf = Lext.astype(jnp.float32)[None]                     # (1,S,W)
    Rf = Rext.astype(jnp.float32)[None]

    # loop body is scatter/gather-free: the round's pick is expressed as a
    # one-hot (6,S,W) mask (argmax + equality), pick attributes (extents)
    # come back as masked max-reductions, and the per-round pick lists are
    # stacked by lax.scan instead of .at[t].set scatters — each removed op
    # paid a fixed ~15 us launch floor on this runtime (round-5 probes), and
    # what remains fuses.
    def body(state, t):
        picked, rank, disabled = state
        key = jnp.where(eligible & ~picked & ~disabled, sign * curv, -jnp.inf)
        key6 = jnp.where(sec_onehot, key[None], -jnp.inf)   # (6,S,W)
        idx6 = jnp.argmax(key6, axis=2)                     # (6,S)
        ok6 = jnp.max(key6, axis=2) > -jnp.inf
        pick6 = (colidx == idx6[..., None]) & ok6[..., None]  # one-hot (6,S,W)
        pick_any = jnp.any(pick6, axis=0)
        picked = picked | pick_any
        rank = jnp.where(pick_any, jnp.maximum(rank, t), rank)
        L6 = jnp.max(jnp.where(pick6, Lf, 0.0), axis=2).astype(jnp.int32)
        R6 = jnp.max(jnp.where(pick6, Rf, 0.0), axis=2).astype(jnp.int32)
        lo = (idx6 - L6)[..., None]                         # (6,S,1)
        hi = (idx6 + R6)[..., None]
        dis6 = (colidx >= lo) & (colidx <= hi) & ok6[..., None]
        disabled = disabled | jnp.any(dis6, axis=0)
        return (picked, rank, disabled), (idx6, ok6)

    state = (jnp.zeros((S, W), bool), jnp.full((S, W), -1, jnp.int32),
             jnp.zeros((S, W), bool))
    (picked, rank, disabled), (pidx, pok) = jax.lax.scan(
        body, state, jnp.arange(n_picks))
    return picked, rank, disabled, pidx, pok


def picks_to_buffer(seq, pidx, pok, cap: int, extra=None):
    """Gather picked points into a (cap, ...) buffer, round-major (pick round
    0 of every (sector, scan) first — i.e. strongest-curvature picks first
    when cap < total picks). Returns (pts (cap,3), mask (cap,), rows (cap,)
    scan ring, [extra channels gathered at the picks])."""
    n, _, S = pidx.shape
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, None, :], pidx.shape)
    flat_idx = pidx.reshape(-1)[:cap]
    flat_rows = rows.reshape(-1)[:cap]
    flat_ok = pok.reshape(-1)[:cap]
    if cap > n * 6 * S:  # pad
        pad = cap - n * 6 * S
        flat_idx = jnp.concatenate([flat_idx, jnp.zeros((pad,), jnp.int32)])
        flat_rows = jnp.concatenate([flat_rows, jnp.zeros((pad,), jnp.int32)])
        flat_ok = jnp.concatenate([flat_ok, jnp.zeros((pad,), bool)])
    pts = jnp.where(flat_ok[:, None], seq["xyz"][flat_rows, flat_idx], 0.0)
    out_rows = jnp.where(flat_ok, flat_rows, -1)
    outs = [pts, flat_ok, out_rows]
    if extra is not None:
        for ch in extra:
            outs.append(jnp.where(flat_ok, ch[flat_rows, flat_idx], 0))
    return tuple(outs)


# ----------------------------------------------------------------------------
# voxel downsample
# ----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("h_size", "v_size",
                                             "min_segment", "iters"))
def combine_edges_hysteresis(strict_img, loose_img, h_size: int = 3,
                             v_size: int = 2, min_segment: int = 5,
                             iters: int = 10):
    """CombineEdgeFeatures (Velodyne.cpp:1191-1267): canny-style
    hysteresis between a strict and a loose edge image. The reference
    BFS-floods from every strict cell through the (+-v_size, +-h_size)
    window over strict|loose cells and keeps segments with > 4 members.

    Batched equivalent: min-label flooding over the same window
    (each iteration is a stack of static-shift mins, so iters * window
    elementwise ops — no queue), then per-label size and
    contains-a-strict-seed tests via scatter reductions.

    Returns (keep (S,W) bool, labels (S,W) int32, S*W where dropped)."""
    S, W = strict_img.shape
    mask = strict_img | loose_img
    big = jnp.int32(S * W)
    lin = jnp.arange(S * W, dtype=jnp.int32).reshape(S, W)
    labels = jnp.where(mask, lin, big)

    shifts = [(dr, dc) for dr in range(-v_size, v_size + 1)
              for dc in range(-h_size, h_size + 1) if (dr, dc) != (0, 0)]

    def body(_, lab):
        m = lab
        for dr, dc in shifts:
            s = _shift_fill(lab, dr, axis=0, fill=big)
            s = _shift_fill(s, dc, axis=1, fill=big)
            m = jnp.minimum(m, s)
        return jnp.where(mask, m, big)

    labels = jax.lax.fori_loop(0, iters, body, labels)
    flat = labels.ravel()
    sizes = jnp.zeros((S * W + 1,), jnp.int32).at[flat].add(
        mask.ravel().astype(jnp.int32))
    seeded = jnp.zeros((S * W + 1,), jnp.int32).at[flat].max(
        strict_img.ravel().astype(jnp.int32))
    ok = (sizes >= min_segment) & (seeded > 0)
    keep = ok[flat].reshape(S, W) & mask
    return keep, jnp.where(keep, labels, big)


@functools.partial(jax.jit, static_argnames=("leaf", "return_counts"))
def voxel_downsample(pts, mask, aux=None, leaf: float = 0.2, weights=None,
                     return_counts: bool = False):
    """Centroid voxel-grid filter (pcl::VoxelGrid leaf 0.2, Velodyne.cpp:
    1076-1080). Returns (centroids (N,3), out_mask (N,)) — one entry per
    occupied voxel (first occurrence order after sort), padded with zeros.
    Optional aux (N,) channel is averaged per voxel too (returned third).
    `weights` (N,) makes the per-voxel mean weighted (e.g. point counts
    from a previous voxel_downsample pass, so a two-level chunked merge
    reproduces the global point-weighted centroid exactly);
    `return_counts` appends the per-voxel weight sums to the outputs."""
    n = pts.shape[0]
    vox = jnp.floor(pts / leaf).astype(jnp.int32)
    vmin = jnp.min(jnp.where(mask[:, None], vox, 2**30), axis=0)
    # 10-bit packed exact key (grid up to 1024 cells = 204 m per axis at the
    # default leaf; farther points clip into the boundary voxel)
    v = jnp.clip(vox - vmin, 0, 1023)
    key = (v[:, 0] << 20) | (v[:, 1] << 10) | v[:, 2]
    key = jnp.where(mask, key, jnp.int32(2**30))
    order = jnp.argsort(key)
    ks = key[order]
    ps = pts[order]
    ms = mask[order]
    if weights is None:
        ws = ms.astype(pts.dtype)
    else:
        ws = jnp.where(ms, jnp.asarray(weights, pts.dtype)[order], 0.0)
    uniq = jnp.concatenate([jnp.array([True]), ks[1:] != ks[:-1]]) & ms
    seg = jnp.cumsum(uniq) - 1  # segment id per sorted point
    sums = jnp.zeros((n, 3)).at[seg].add(ws[:, None] * ps)
    cnts = jnp.zeros((n,)).at[seg].add(ws)
    centroids = sums / jnp.maximum(cnts, 1e-9)[:, None]
    out_mask = jnp.arange(n) < jnp.sum(uniq)
    centroids = jnp.where(out_mask[:, None], centroids, 0.0)
    out_cnts = jnp.where(out_mask, cnts, 0.0)
    if aux is None:
        return (centroids, out_mask, out_cnts) if return_counts \
            else (centroids, out_mask)
    aux2 = jnp.asarray(aux, pts.dtype)
    squeeze = aux2.ndim == 1
    if squeeze:
        aux2 = aux2[:, None]
    aux_s = aux2[order]
    aux_sum = jnp.zeros((n, aux2.shape[1])).at[seg].add(ws[:, None] * aux_s)
    aux_out = jnp.where(out_mask[:, None],
                        aux_sum / jnp.maximum(cnts, 1e-9)[:, None], 0.0)
    aux_out = aux_out[:, 0] if squeeze else aux_out
    if return_counts:
        return centroids, out_mask, aux_out, out_cnts
    return centroids, out_mask, aux_out


# ----------------------------------------------------------------------------
# undistortion
# ----------------------------------------------------------------------------

@jax.jit
def sweep_fraction(pts, mask):
    """Per-point azimuth sweep fraction in [0,1) relative to the first valid
    point (the reference's start_ori convention, Velodyne.cpp:398-400);
    drives motion undistortion and time-colorized export."""
    start_ori = scan_start_ori(pts, mask)
    return sweep_fraction_from(pts, start_ori)


@jax.jit
def scan_start_ori(pts, mask):
    """Azimuth of the first valid point (the reference's start_ori,
    Velodyne.cpp:398-400). Split out so CAP-sized chunks of one oversized
    scan can all use the FIRST chunk's start (chunking must not reset the
    sweep origin)."""
    x, z = pts[:, 0], pts[:, 2]
    ori = jnp.arctan2(x, z)
    ori = jnp.where(ori < 0, ori + 2 * jnp.pi, ori)
    return ori[jnp.argmax(mask)]


@jax.jit
def sweep_fraction_from(pts, start_ori):
    """Sweep fraction in [0,1) measured from a given start azimuth."""
    x, z = pts[:, 0], pts[:, 2]
    ori = jnp.arctan2(x, z)
    ori = jnp.where(ori < 0, ori + 2 * jnp.pi, ori)
    return jnp.mod(ori - start_ori, 2 * jnp.pi) / (2 * jnp.pi)


@jax.jit
def undistort_points(pts, frac, R_end, t_end):
    """Motion undistortion (UndistortCloud, Velodyne.cpp:1642-1674): each
    point is moved by the pose interpolated between identity (scan start)
    and (R_end, t_end) at its sweep fraction: p' = Exp(s*log(R)) p + s*t."""
    from ..ops import se3
    w = se3.log_so3(R_end)
    R_i = se3.exp_so3(frac[:, None] * w[None, :])
    return jnp.einsum("nij,nj->ni", R_i, pts) + frac[:, None] * t_end[None, :]


# ----------------------------------------------------------------------------
# top-level feature extraction
# ----------------------------------------------------------------------------

class ScanFeatures(NamedTuple):
    """Fixed-shape feature sets of one scan (reference Velodyne.h:80-91)."""
    sharp: jnp.ndarray          # (CAP_SHARP, 3)
    sharp_mask: jnp.ndarray
    less_sharp: jnp.ndarray     # (CAP_EDGE, 3)
    less_sharp_mask: jnp.ndarray
    less_sharp_row: jnp.ndarray  # scan ring of each edge point
    point_to_segment: jnp.ndarray  # (CAP_EDGE,) line id or -1
    flat: jnp.ndarray           # (CAP_FLAT, 3)
    flat_mask: jnp.ndarray
    flat_ground: jnp.ndarray    # (CAP_FLAT,) bool ground class
    flat_row: jnp.ndarray       # (CAP_FLAT,) scan ring
    less_flat: jnp.ndarray      # (CAP_SURF, 3)
    less_flat_mask: jnp.ndarray
    less_flat_ground: jnp.ndarray
    less_flat_row: jnp.ndarray  # (CAP_SURF,) scan ring (voxel-averaged)
    line_points: jnp.ndarray    # (CAP_LINES, 3) point on line
    line_dirs: jnp.ndarray      # (CAP_LINES, 3) unit direction
    line_endpoints: jnp.ndarray  # (CAP_LINES, 2, 3)
    line_mask: jnp.ndarray      # (CAP_LINES,)


CAP_SHARP = 288       # 3 picks x 6 sectors x 16 scans
CAP_EDGE = 1024
CAP_FLAT = 512        # 4 picks x 6 sectors x 16 scans = 384
CAP_SURF = 4096
CAP_LINES = 64


def gather_masked(values, mask, cap: int, fill=0.0):
    """Compact masked rows of a (S,W,...) array into a (cap, ...) buffer.
    One lax.sort by (masked? order : N+order) with the channels as payloads,
    then slice the head — replacing the cumsum+scatter (big-table scatters
    pay the ~131 M elem/s path; the TPU sort measures ~free, PERF.md
    round-5). Overflow rows beyond cap are dropped; order is preserved."""
    flat_mask = mask.ravel()
    flat_vals = values.reshape((flat_mask.shape[0], -1))
    N = flat_mask.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(flat_mask, idx, N + idx)
    ops = (key,) + tuple(flat_vals[:, c] for c in range(flat_vals.shape[1]))
    sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=1)
    head = [o[:cap] for o in sorted_ops[1:]]
    out = jnp.stack(head, axis=-1)
    if cap > N:
        out = jnp.concatenate(
            [out, jnp.zeros((cap - N, out.shape[1]), out.dtype)])
    out_mask = jnp.arange(cap) < jnp.sum(flat_mask)
    out = jnp.where(out_mask[:, None], out, fill)
    out = out.reshape((cap,) + values.shape[2:])
    return out, out_mask


@functools.partial(jax.jit, static_argnames=("max_curvature", "intersect_angle_threshold", "segment", "method", "repair_rings"))
def extract_features(pts, mask, max_curvature: float = 5.0,
                     intersect_angle_threshold: float = 5.0,
                     segment: bool = True, method: int = 3,
                     repair_rings: bool = False):
    """Feature extraction pipeline (ExtractFeatures, Velodyne.cpp:531-769).

    method=3 ADAPTIVE (the Room/Floor config choice, config/Room.txt
    extraction_method=3). method=2 DOUBLE_EXTRACTION: the edge pick pass
    runs twice — strict (max_curvature/10, angle threshold x2) and loose —
    and the surviving edge set is the hysteresis combination
    (CombineEdgeFeatures, Velodyne.cpp:1191-1267). The 3D-line stage
    still runs on the combined set (the association contract needs
    per-segment line labels either way).

    Returns (ScanFeatures, seq, aux dict).
    """
    from . import lidar_lines

    # repair_rings: ReOrderVLP2's LCS conflict resolution (the robust
    # variant the reference uses where packet order may be corrupted,
    # mvs/MVS.cpp:518) instead of plain elevation binning (ReOrderVLP)
    ring = repair_ring_conflicts(pts, mask) if repair_rings else None
    img = build_range_image(pts, mask, ring=ring)
    ground = mark_ground(img)
    if segment:
        _, keep = segment_range_image(img["range"], img["valid"])
        keep = keep | ground  # ground is exempt from the component-size drop
        img = dict(img, valid=keep,
                   range=jnp.where(keep, img["range"], 0.0),
                   xyz=jnp.where(keep[..., None], img["xyz"], 0.0))
    img["ground"] = ground & img["valid"]
    seq = compact_rows(img)

    curv, m, window_ok = adaptive_curvature(seq)
    vang = view_angles(seq, m)
    _, interior = _sector_ids(seq)

    edge_eligible = (
        interior & window_ok & ~seq["ground"]
        & (curv > 0.1) & (curv <= max_curvature)
        & (vang >= intersect_angle_threshold)
        & (vang <= 180.0 - intersect_angle_threshold)
    )
    extents = _suppression_extents(seq["xyz"])
    picked_e, rank_e, disabled, eidx, eok = greedy_pick(
        seq, curv, edge_eligible, n_picks=30, extents=extents)

    hyst_keep = None
    if method == 2:
        strict_eligible = (
            interior & window_ok & ~seq["ground"]
            & (curv > 0.1) & (curv <= max_curvature / 10.0)
            & (vang >= 2.0 * intersect_angle_threshold)
            & (vang <= 180.0 - 2.0 * intersect_angle_threshold)
        )
        picked_s, _, _, _, _ = greedy_pick(seq, curv, strict_eligible,
                                           n_picks=30, extents=extents)
        S_, W_ = seq["valid"].shape
        rows_ = jnp.broadcast_to(jnp.arange(S_, dtype=jnp.int32)[:, None],
                                 (S_, W_))

        def to_image(picked):
            col = jnp.where(picked & seq["valid"], seq["col"], W_)
            return jnp.zeros((S_, W_), bool).at[rows_, col].max(
                picked, mode="drop")

        hyst_keep, _ = combine_edges_hysteresis(to_image(picked_s),
                                                to_image(picked_e))

    # planes: eligibility excludes anything picked/disabled by the edge pass
    plane_eligible = (
        interior & window_ok & (curv >= 0) & (curv <= 0.02)
        & ~picked_e & ~disabled
    )
    picked_f, _, disabled_f, fidx, fok = greedy_pick(
        seq, curv, plane_eligible, n_picks=4, pick_largest=False,
        extents=extents)
    all_disabled = disabled | disabled_f
    less_flat_sw = (interior & window_ok & (curv >= 0) & (curv < 0.3)
                    & ~picked_e & ~picked_f & ~all_disabled)

    # --- gather picked points straight from the recorded pick indices ---
    if hyst_keep is not None:
        # DOUBLE_EXTRACTION: the edge set is the hysteresis-validated
        # image cells (gathered from the image grid, not the pick list)
        S_, W_ = img["valid"].shape
        rows_img = jnp.broadcast_to(
            jnp.arange(S_, dtype=jnp.float32)[:, None] + 0.5, (S_, W_))
        pack = jnp.concatenate([img["xyz"], rows_img[..., None]], axis=-1)
        g, edge_mask = gather_masked(pack, hyst_keep & img["valid"],
                                     CAP_EDGE)
        edge_pts = g[:, :3]
        edge_rows = jnp.where(edge_mask, g[:, 3].astype(jnp.int32), -1)
    else:
        edge_pts, edge_mask, edge_rows = picks_to_buffer(
            seq, eidx, eok, CAP_EDGE)
    sharp_pts, sharp_mask, _ = picks_to_buffer(seq, eidx[:3], eok[:3], CAP_SHARP)
    flat_pts, flat_mask, flat_rows, flat_grd_i = picks_to_buffer(
        seq, fidx, fok, CAP_FLAT, extra=[seq["ground"].astype(jnp.int32)])
    flat_grd = flat_grd_i > 0

    # surf points: density-stratified decimation standing in for the
    # reference's 0.2 m pcl::VoxelGrid (Velodyne.cpp:1076-1080). The range
    # image is an angular grid, so cell footprint grows ~r^2; keeping each
    # cell with probability proportional to r^2 (deterministic per-cell hash)
    # yields the same uniform-spatial-density output on actual surface
    # points, with an elementwise test instead of a 28.8k-key sort. A second
    # pass rescales the keep probability to the CAP_SURF budget.
    S, W = seq["valid"].shape
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, W))
    r = seq["range"]
    # points per 0.2 m voxel at range r: (leaf/dA)*(leaf/dV), dA = r*2pi/1800,
    # dV = r*2deg -> keep prob = r^2 * 1.218e-4 / 0.04
    p_base = jnp.minimum(r * r * (1.218e-4 / 0.04), 1.0)
    expect = jnp.sum(jnp.where(less_flat_sw, p_base, 0.0))
    scale = (0.92 * CAP_SURF) / jnp.maximum(expect, 1.0)
    p = jnp.minimum(p_base * scale, 1.0)
    cell = rows * jnp.int32(W) + seq["col"]
    h01 = (cell.astype(jnp.uint32) * jnp.uint32(2654435761)).astype(
        jnp.float32) * jnp.float32(1.0 / 4294967296.0)
    keep_sw = less_flat_sw & (h01 < p)
    lf_pack = jnp.stack([
        seq["xyz"][..., 0], seq["xyz"][..., 1], seq["xyz"][..., 2],
        rows.astype(jnp.float32) + 0.5,
        seq["ground"].astype(jnp.float32)], axis=-1)
    lf_g, lf_ds_mask = gather_masked(lf_pack, keep_sw, CAP_SURF)
    lf_ds = lf_g[:, :3]
    lf_rows = jnp.where(lf_ds_mask, lf_g[:, 3].astype(jnp.int32), -1)
    lf_grd = lf_g[:, 4] > 0.5

    # 3D line segments from the edge points (EdgeToLine, Velodyne.cpp:1269+)
    lines = lidar_lines.extract_lines(edge_pts, edge_mask, edge_rows)

    # reference EdgeToLine keeps only edge points that belong to a line as
    # cornerLessSharp (Velodyne.cpp:1283-1308)
    on_line = lines["point_label"] >= 0
    feats = ScanFeatures(
        sharp=sharp_pts, sharp_mask=sharp_mask,
        less_sharp=edge_pts, less_sharp_mask=edge_mask & on_line,
        less_sharp_row=edge_rows,
        point_to_segment=lines["point_label"],
        flat=flat_pts, flat_mask=flat_mask,
        flat_ground=flat_grd,
        flat_row=flat_rows,
        less_flat=lf_ds, less_flat_mask=lf_ds_mask,
        less_flat_ground=lf_grd,
        less_flat_row=lf_rows,
        line_points=lines["points"], line_dirs=lines["dirs"],
        line_endpoints=lines["endpoints"], line_mask=lines["mask"],
    )
    return feats, seq, {"curvature": curv, "img": img}
