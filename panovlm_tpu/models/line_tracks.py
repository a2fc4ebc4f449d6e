"""Line tracks across scans/frames + track-level gating.

Replaces three reference components:
  * lidar_mapping/LidarLineMatch.{h,cpp}: LineTracks of LiDAR 3D lines
    across neighboring scans (min length 3), used to gate the line-to-line
    residuals (AddLidarLineToLineResidual2, util/Optimization.cpp:224-441);
  * joint_optimization/PanoramaLineMatch.{h,cpp}: image-line tracks across
    frames. The reference matches LBD descriptors + optical flow; OpenCV
    here ships no line_descriptor module, so matching is geometric — rotate
    great-circle normals through the relative pose, gate by normal angle +
    arc overlap, one-to-one — which is the same criterion the reference
    falls back to after LBD pruning;
  * joint_optimization/CameraLidarTrackAssociate.{h,cpp}: track-level
    image<->LiDAR association (vote per track pair, distribute back).

Track building is irregular small-graph work -> host union-find
(control plane); the pairwise matching math is batched on device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import se3
from ..utils.tracks import UnionFind


def _union_tracks(n_nodes, edges, min_length: int):
    """Union-find over node indices; returns (track_id (n_nodes,), lengths
    dict track -> size). Nodes not in a long-enough track get -1."""
    uf = UnionFind(n_nodes)
    for a, b in edges:
        uf.union(int(a), int(b))
    roots = np.array([uf.find(i) for i in range(n_nodes)])
    uniq, inv, counts = np.unique(roots, return_inverse=True,
                                  return_counts=True)
    track_id = np.where(counts[inv] >= min_length, inv, -1)
    return track_id.astype(np.int32), counts


def lidar_line_tracks(l2l_assoc, pair_r, pair_n, n_scans: int, n_lines: int,
                      min_length: int = 3):
    """LidarLineMatch::GenerateTracks: tracks of LiDAR lines from the
    pairwise line-to-line associations. Node = scan * n_lines + line.
    Returns track_id (n_scans, n_lines) int32 (-1 = untracked)."""
    mask = np.asarray(l2l_assoc["mask"])          # (P, L) for seg_n
    seg_r = np.asarray(l2l_assoc["seg_r"]) if "seg_r" in l2l_assoc else None
    edges = []
    pr = np.asarray(pair_r)
    pn = np.asarray(pair_n)
    for p in range(mask.shape[0]):
        for ln in np.nonzero(mask[p])[0]:
            r_line = seg_r[p, ln] if seg_r is not None else ln
            edges.append((pr[p] * n_lines + int(r_line),
                          pn[p] * n_lines + int(ln)))
    tid, _ = _union_tracks(n_scans * n_lines, edges, min_length)
    return tid.reshape(n_scans, n_lines)


def l2l_track_gate(l2l_assoc, pair_r, pair_n, track_id):
    """Gate for line-to-line residuals: both endpoints tracked in the same
    track of length >= 3 (the AddLidarLineToLineResidual2 criterion)."""
    mask = np.asarray(l2l_assoc["mask"])
    seg_r = np.asarray(l2l_assoc["seg_r"]) if "seg_r" in l2l_assoc else None
    P, L = mask.shape
    gate = np.zeros((P, L), bool)
    pr = np.asarray(pair_r)
    pn = np.asarray(pair_n)
    for p in range(P):
        for ln in np.nonzero(mask[p])[0]:
            r_line = int(seg_r[p, ln]) if seg_r is not None else ln
            t1 = track_id[pr[p], r_line]
            t2 = track_id[pn[p], ln]
            gate[p, ln] = (t1 >= 0) and (t1 == t2)
    return gate


def match_image_lines_pair(arcs_i, arcs_j, pose_i, pose_j,
                           angle_deg: float = 3.0, ratio: float = 0.9):
    """Arc matching between two frames: rotate frame j's great-circle
    normals into frame i, gate by normal angle and arc-midpoint proximity,
    one-to-one. When the arc dicts carry "desc" (the LBD-equivalent band
    descriptor, ops/lbd.py), candidates are scored by descriptor distance
    with the reference's ratio test (MatchInitLine KNN mode, joint_
    optimization/PanoramaLineMatch.cpp:37-46); otherwise by normal angle.
    Returns (match (Lj,) index into i or -1)."""
    aa_i, aa_j = pose_i[:3], pose_j[:3]
    R_iw = se3.exp_so3(aa_i)
    R_jw = se3.exp_so3(aa_j)
    R_ij = se3.matmul(R_iw, jnp.swapaxes(R_jw, -1, -2))
    n_j_in_i = arcs_j["normal"] @ R_ij.T
    mid_j_in_i = arcs_j["mid"] @ R_ij.T
    cosn = jnp.abs(se3.einsum("ik,jk->ji", arcs_i["normal"], n_j_in_i))
    ang = jnp.degrees(jnp.arccos(jnp.clip(cosn, -1, 1)))       # (Lj, Li)
    cosm = se3.einsum("ik,jk->ji", arcs_i["mid"], mid_j_in_i)
    mid_ang = jnp.arccos(jnp.clip(cosm, -1, 1))
    half_sum = 0.5 * (arcs_i["arc"][None, :] + arcs_j["arc"][:, None])
    ok = ((ang <= angle_deg) & (mid_ang <= half_sum * 1.5)
          & arcs_i["mask"][None, :] & arcs_j["mask"][:, None])
    if "desc" in arcs_i and "desc" in arcs_j:
        from ..ops import lbd
        dist = lbd.lbd_distance_matrix(arcs_i["desc"], arcs_j["desc"])
        score = jnp.where(ok, dist, jnp.inf)
        # ratio test over the geometric candidates (best < ratio * second)
        two = -jax.lax.top_k(-score, 2)[0] if score.shape[1] >= 2 else None
        ratio_ok = (two[:, 0] < ratio * two[:, 1]) if two is not None else True
    else:
        score = jnp.where(ok, ang, jnp.inf)
        ratio_ok = True
    best_i = jnp.argmin(score, axis=1)
    valid = jnp.isfinite(jnp.min(score, axis=1)) & ratio_ok
    # one-to-one: j must win the column of its chosen i
    col_best = jnp.argmin(score, axis=0)
    valid = valid & (col_best[best_i] == jnp.arange(score.shape[0]))
    return jnp.where(valid, best_i, -1)


def image_line_tracks(arc_batch, cam_poses, window: int = 3,
                      min_length: int = 3):
    """PanoramaLineMatcher::GenerateTracks: tracks of image lines across
    temporally-neighboring frames. Returns (n_frames, L) track ids."""
    poses = jnp.asarray(cam_poses)
    n = poses.shape[0]
    L = arc_batch["normal"].shape[1]
    edges = []
    for i in range(n):
        for j in range(i + 1, min(i + 1 + window, n)):
            ai = {k: arc_batch[k][i] for k in arc_batch}
            aj = {k: arc_batch[k][j] for k in arc_batch}
            m = np.asarray(match_image_lines_pair(ai, aj, poses[i], poses[j]))
            for lj, li in enumerate(m):
                if li >= 0:
                    edges.append((i * L + int(li), j * L + lj))
    tid, _ = _union_tracks(n * L, edges, min_length)
    return tid.reshape(n, L)


def camera_lidar_track_associate(cl_assoc, fi, li, img_track_id,
                                 lidar_track_id, min_votes: int = 2):
    """CameraLidarTrackAssociate::AssociateTrack: vote (image track, lidar
    track) pairs from the per-pair line associations; pairs of tracks with
    enough votes validate all their member line pairs (distribute back).
    Returns a boost mask with the same shape as cl_assoc['mask']."""
    mask = np.asarray(cl_assoc["mask"])           # (P, Ls)
    img_line = np.asarray(cl_assoc["img_line"])
    P, Ls = mask.shape
    votes: dict[tuple, int] = {}
    entries = []
    for p in range(P):
        f, l = int(np.asarray(fi)[p]), int(np.asarray(li)[p])
        for s in np.nonzero(mask[p])[0]:
            it = img_track_id[f, img_line[p, s]]
            lt = lidar_track_id[l, s]
            if it >= 0 and lt >= 0:
                votes[(it, lt)] = votes.get((it, lt), 0) + 1
                entries.append((p, s, it, lt))
    good = {k for k, v in votes.items() if v >= min_votes}
    out = np.zeros_like(mask)
    for p, s, it, lt in entries:
        if (it, lt) in good:
            out[p, s] = True
    return out
