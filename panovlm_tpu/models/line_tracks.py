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


def filter_matches_optical_flow(arcs_j, arcs_i, gray_j, gray_i, match,
                                n_samples: int = 10,
                                min_tracked: float = 0.8,
                                max_median_px: float = 60.0):
    """FilterLineMatchOpticalFlow (joint_optimization/PanoramaLineMatch.cpp:
    114-159): sample n points uniformly along each matched line of frame j,
    LK-track them into frame i, and keep a match only if >= 80% of its
    points track successfully AND the median distance from the tracked
    points to the matched line of frame i stays below 60 px (converted
    here to the equivalent great-circle angle, 60 px * 2pi/W — the arcs
    live on the sphere, so "distance to the 2D line" becomes the angular
    distance to its great-circle plane). Host OpenCV, like LSD/SIFT: flow
    is irregular data prep, not device compute.

    match: (Lj,) index into frame i's arcs or -1 (the output of
    match_image_lines_pair). Returns the filtered copy."""
    import cv2
    from ..utils.panorama_line import _cam_to_image_np, _image_to_cam_np

    m = np.array(np.asarray(match))
    rows_j = np.nonzero(m >= 0)[0]
    if not len(rows_j):
        return m
    H, W = gray_j.shape[:2]
    e1 = np.asarray(arcs_j["e1"])[rows_j]
    e2 = np.asarray(arcs_j["e2"])[rows_j]
    theta = np.arccos(np.clip((e1 * e2).sum(1), -1.0, 1.0))[:, None]
    t = (np.arange(n_samples, dtype=np.float32) / n_samples)[None, :]
    s = np.sin(np.maximum(theta, 1e-6))
    pts = (np.sin((1 - t) * theta)[..., None] * e1[:, None]
           + np.sin(t * theta)[..., None] * e2[:, None]) / s[..., None]
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True) + 1e-12
    uv_j = _cam_to_image_np(pts, H, W).reshape(-1, 2).astype(np.float32)

    to_u8 = lambda g: (g * 255).astype(np.uint8) if g.dtype != np.uint8 else g
    uv_i, status, _ = cv2.calcOpticalFlowPyrLK(
        to_u8(gray_j), to_u8(gray_i), uv_j.reshape(-1, 1, 2), None)
    uv_i = uv_i.reshape(len(rows_j), n_samples, 2)
    status = status.reshape(len(rows_j), n_samples).astype(bool)

    normals_i = np.asarray(arcs_i["normal"])[m[rows_j]]     # (Q, 3)
    rays = _image_to_cam_np(uv_i, H, W)                      # (Q, n, 3)
    ang = np.abs(np.arcsin(np.clip(
        np.einsum("qnk,qk->qn", rays, normals_i), -1.0, 1.0)))
    thresh = max_median_px * 2.0 * np.pi / W
    ang = np.where(status, ang, np.nan)
    with np.errstate(invalid="ignore"):
        med = np.nanmedian(ang, axis=1)
    ok = (status.mean(1) >= min_tracked) & (med <= thresh)
    m[rows_j[~ok]] = -1
    return m


def image_line_tracks(arc_batch, cam_poses, window: int = 3,
                      min_length: int = 3, grays=None):
    """PanoramaLineMatcher::GenerateTracks: tracks of image lines across
    temporally-neighboring frames. With `grays` (per-frame grayscale
    images), pairwise matches are additionally filtered by LK optical
    flow before track building, as the reference's MatchPanoramaLine
    does. Returns (n_frames, L) track ids."""
    poses = jnp.asarray(cam_poses)
    n = poses.shape[0]
    L = arc_batch["normal"].shape[1]
    edges = []
    for i in range(n):
        for j in range(i + 1, min(i + 1 + window, n)):
            ai = {k: arc_batch[k][i] for k in arc_batch}
            aj = {k: arc_batch[k][j] for k in arc_batch}
            m = np.asarray(match_image_lines_pair(ai, aj, poses[i], poses[j]))
            if grays is not None:
                m = filter_matches_optical_flow(aj, ai, grays[j], grays[i], m)
            for lj, li in enumerate(m):
                if li >= 0:
                    edges.append((i * L + int(li), j * L + lj))
    tid, _ = _union_tracks(n * L, edges, min_length)
    return tid.reshape(n, L)


def camera_lidar_track_associate(cl_assoc, fi, li, img_track_id,
                                 lidar_track_id):
    """AssociateTrack (joint_optimization/CameraLidarTrackAssociate.cpp:
    103-204): vote an (image track, lidar track) adjacency from the
    per-pair line associations; a track pair whose vote count reaches
    min(track sizes) - 2 validates, and its member lines are associated in
    EVERY (frame, lidar) pair both tracks touch — the reference's
    "distribute back to all member combinations" step, which adds pairs
    the per-pair angle association missed.

    cl_assoc: dict with mask/img_line (P, Ls); fi/li (P,) the frame/lidar
    of each pair; img_track_id (n_frames, Li), lidar_track_id (n_lidars,
    Ls), -1 = untracked. The reference emits every (img line, lidar line)
    combination per pair; here each lidar-line slot holds one image line,
    so an existing association is kept and empty slots take the track's
    first member line on that frame.

    Returns (mask, img_line) — the updated association arrays."""
    mask = np.array(np.asarray(cl_assoc["mask"]))  # (P, Ls), copy
    img_line = np.array(np.asarray(cl_assoc["img_line"]))
    fi = np.asarray(fi)
    li = np.asarray(li)
    P, Ls = mask.shape
    img_track_id = np.asarray(img_track_id)
    lidar_track_id = np.asarray(lidar_track_id)

    votes: dict[tuple, int] = {}
    for p in range(P):
        f, l = int(fi[p]), int(li[p])
        for s in np.nonzero(mask[p])[0]:
            it = int(img_track_id[f, img_line[p, s]])
            lt = int(lidar_track_id[l, s])
            if it >= 0 and lt >= 0:
                votes[(it, lt)] = votes.get((it, lt), 0) + 1

    # track sizes = number of member (view, line) features
    img_sizes = np.bincount(img_track_id[img_track_id >= 0].ravel(),
                            minlength=max(img_track_id.max() + 1, 1))
    lidar_sizes = np.bincount(lidar_track_id[lidar_track_id >= 0].ravel(),
                              minlength=max(lidar_track_id.max() + 1, 1))
    good = {(it, lt) for (it, lt), v in votes.items()
            if v >= min(img_sizes[it], lidar_sizes[lt]) - 2}
    if not good:
        return mask, img_line

    # distribute: members of a validated track pair associate in every
    # (frame, lidar) pair of the association graph that both tracks touch
    new_mask = np.zeros_like(mask)
    new_line = np.array(img_line)
    for it, lt in good:
        for p in range(P):
            f, l = int(fi[p]), int(li[p])
            img_members = np.nonzero(img_track_id[f] == it)[0]
            if not len(img_members):
                continue
            for s in np.nonzero(lidar_track_id[l] == lt)[0]:
                new_mask[p, s] = True
                # keep an existing association whose image line is already
                # a member of the validated track; fill others with the
                # track's first member on this frame
                if not (mask[p, s]
                        and img_track_id[f, img_line[p, s]] == it):
                    new_line[p, s] = img_members[0]
    return new_mask, new_line
