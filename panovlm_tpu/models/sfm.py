"""Global SfM orchestration — the reference's init_camera_pose stage.

Replaces sfm/SfM.{h,cpp} (reference, 2.7k LoC orchestrator) with batched
array programs per step (reference call stack: SURVEY.md §3.1):

  InitImagePairs    -> init_image_pairs (exhaustive / contiguous-20 / VLAD)
  MatchImagePairs   -> match_all_pairs (MXU matmul KNN, utils/sift.py)
  FilterImagePairs  -> relative_poses (batched AC-RANSAC -> decompose ->
                       CheckRT -> two-view chordal refinement)
  SetTranslationScaleDepthMap -> translation_scale_from_depth
  FilterByTriplet / LargestBiconnectedGraph -> host networkx (control plane)
  EstimateGlobalRotation -> models/rotation_averaging.py
  EstimateGlobalTranslation -> models/translation_averaging.py
  EstimateStructure -> estimate_structure (tracks + N-view triangulation)
  GlobalBundleAdjustment -> global_ba (device LM, Huber(4 deg))
  SetToOrigin -> set_to_origin

Pose convention everywhere: params [aa_cw, t_cw] (world->camera), first
valid camera gauge-fixed, exactly like the reference's Ceres problems.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import epipolar, se3, spherical, triangulate as tri_ops
from ..solver import (LMOptions, ResidualBlock, residuals, solve_lm,
                      solve_lm_chunked)
from ..utils.sift import match_descriptors


class SfMConfig(NamedTuple):
    num_sift: int = 4096
    sift_match_dist_threshold: float = 0.6
    sift_match_num_threshold: int = 40       # Config.h
    pair_method: str = "contiguous"          # exhaustive|contiguous|vlad
    contiguous_window: int = 20              # SfM.cpp:65
    ransac_hypotheses: int = 300             # SfM.cpp:338
    min_inliers: int = 30
    triangulate_angle_threshold: float = 25.0
    translation_method: str = "softl1"
    upper_scale_ratio: float = 1.3
    lower_scale_ratio: float = 0.9
    max_matches: int = 1024
    match_max_dist_factor: float = 0.8    # SfM.cpp MatchImagePairs filter
    ba_huber_deg: float = 4.0                # Optimization.cpp:104-110
    min_track_length: int = 3                # Structure.cpp:8-85
    # pairs solved concurrently inside one relative-pose device program
    # (vmap width of the lax.map body). MEASURED (round-4 _exp_relpose
    # sweep, post-QR/two-view): width 2 = 76 ms/pair, 8 = 90, 32 = 99 —
    # widening does NOT amortize (throughput-bound sort/score stages, and
    # vmapped while_loops run to max-lane convergence), so 2 stays the
    # default; the 32-pair chunk above it bounds program duration.
    pair_vmap_width: int = 2


# FrameMatchMethod bitmask (sfm/SfM.h:56-63)
MATCH_EXHAUSTIVE = 1
MATCH_CONTIGUOUS = 2
MATCH_VLAD = 4
MATCH_GPS = 8
MATCH_GPS_VLAD = 16


def init_image_pairs(n_frames: int, cfg: SfMConfig, embeddings=None,
                     gps_xyz=None, methods: int | None = None):
    """Pair proposal (InitImagePairs, sfm/SfM.cpp:49-168). Returns (pi, pj).

    `methods` is the combinable FrameMatchMethod bitmask; sources union with
    dedup like the reference. EXHAUSTIVE short-circuits everything else
    (SfM.cpp:52-59). VLAD uses `embeddings` (N,D) with the reference's
    neighbor count max(N/40, 15); GPS uses `gps_xyz` with radius 7 m / 15
    neighbors; GPS_VLAD takes the VLAD neighbors and drops pairs farther
    than 20 m in GPS (SfM.cpp:135-167). Missing inputs degrade to the
    temporal window."""
    if methods is None:
        methods = (MATCH_EXHAUSTIVE if cfg.pair_method == "exhaustive" else
                   MATCH_CONTIGUOUS | (MATCH_VLAD if cfg.pair_method == "vlad"
                                       else 0))
    if methods & MATCH_EXHAUSTIVE:
        pi, pj = np.triu_indices(n_frames, k=1)
        return pi.astype(np.int32), pj.astype(np.int32)
    def _contiguous():
        w = cfg.contiguous_window
        return {(i, j) for i in range(n_frames)
                for j in range(i + 1, min(i + 1 + w, n_frames))}

    pairs = _contiguous() if methods & MATCH_CONTIGUOUS else set()

    def _vlad_neighbors(k):
        e = np.asarray(embeddings)
        e = e / (np.linalg.norm(e, axis=1, keepdims=True) + 1e-12)
        sim = e @ e.T
        np.fill_diagonal(sim, -np.inf)
        return [np.argsort(-sim[i])[:k] for i in range(n_frames)]

    if methods & MATCH_VLAD and embeddings is not None:
        k = max(n_frames // 40, 15)
        for i, nbrs in enumerate(_vlad_neighbors(k)):
            for j in nbrs:
                if i != j:
                    pairs.add((min(i, int(j)), max(i, int(j))))
    if methods & MATCH_GPS and gps_xyz is not None:
        from ..utils.gps import gps_pairs
        gi, gj = gps_pairs(gps_xyz, radius=7.0, max_per_frame=15)
        pairs |= set(zip(gi.tolist(), gj.tolist()))
    if methods & MATCH_GPS_VLAD and embeddings is not None \
            and gps_xyz is not None:
        g = np.asarray(gps_xyz)
        k = max(n_frames // 40, 1)
        for i, nbrs in enumerate(_vlad_neighbors(k)):
            for j in nbrs:
                if i != j and np.linalg.norm(g[i] - g[int(j)]) <= 20.0:
                    pairs.add((min(i, int(j)), max(i, int(j))))
    if not pairs:  # requested sources had no inputs: temporal fallback
        pairs = _contiguous()
    ordered = sorted(pairs)
    return (np.array([p[0] for p in ordered], np.int32),
            np.array([p[1] for p in ordered], np.int32))


@functools.partial(jax.jit,
                   static_argnames=("ratio", "max_dist_factor", "max_matches"))
def _match_one(desc, fmask, i, j, ratio, max_dist_factor, max_matches):
    """One pair's descriptor match with the pair gather inside the program
    (see match_all_pairs)."""
    return match_descriptors(desc[i], fmask[i], desc[j], fmask[j],
                             ratio=ratio, max_dist_factor=max_dist_factor,
                             max_matches=max_matches)


def match_all_pairs(desc, fmask, pi, pj, cfg: SfMConfig):
    """Match every proposed pair (MatchImagePairs, SfM.cpp:229-295).
    desc (N,F,128), fmask (N,F). Returns dict idx (P,K,2), mask (P,K)."""

    # Pipelined host loop over pairs, ONE single-pair program per step: at
    # the Room-profile descriptor count a single-pair match_descriptors
    # runs 73 ms on the v5e, while the same work under lax.map measured
    # 150 ms/pair (batch_size=1) and 254 ms/pair (batch_size=4) — the
    # top-2 sort tiles worse inside the loop/batched forms. The pair's
    # descriptor gather happens INSIDE the program (host-side desc[i] on a
    # device array costs extra dispatches per pair); dispatches pipeline
    # (~5 ms floor) and the host syncs once per collection chunk.
    desc = jnp.asarray(desc)
    fmask = jnp.asarray(fmask)
    P = len(pi)
    pi_np, pj_np = np.asarray(pi), np.asarray(pj)
    pend, outs = [], []

    def _collect():
        # stack on DEVICE, one transfer per field per chunk: a per-pair
        # np.asarray costs a ~28 ms device->host round trip per FIELD
        # (3/pair), which tripled the per-pair wall when collected naively
        if pend:
            outs.append({k: np.asarray(jnp.stack([o[k] for o in pend]))
                         for k in pend[0]})
        pend.clear()

    for k in range(P):
        pend.append(_match_one(
            desc, fmask, pi_np[k], pj_np[k],
            cfg.sift_match_dist_threshold, cfg.match_max_dist_factor,
            cfg.max_matches))
        if len(pend) >= 128:
            _collect()
    _collect()
    out = {k: jnp.asarray(np.concatenate([o[k] for o in outs]))
           for k in outs[0]} if outs else {
        "idx": jnp.zeros((0, cfg.max_matches, 2), jnp.int32),
        "mask": jnp.zeros((0, cfg.max_matches), bool),
        "dist": jnp.zeros((0, cfg.max_matches), jnp.float32)}
    # pair acceptance: enough matches (sift_match_num_threshold)
    n_m = np.asarray(out["mask"].sum(axis=1))
    out["pair_ok"] = jnp.asarray(n_m >= cfg.sift_match_num_threshold)
    return out


def relative_poses(bearings, matches_idx, matches_mask, pi, pj, cfg: SfMConfig,
                   keys=None):
    """Relative pose per pair (FilterImagePairs, SfM.cpp:298-480):
    AC-RANSAC essential -> decompose -> CheckRT best-of-4 -> two-view
    refinement with the chordal residual (SfMLocalBA analog), |t| renormalized.

    keys: optional (P,) int32 per-pair RNG folds (defaults to the row
    index; the pipeline's relative-pose cache passes the full-run row ids
    so a partial recompute draws the same hypotheses a full run would).

    Returns dict with per-pair: rel_aa (P,3), rel_t (P,3) unit, n_inliers,
    ok, tri_points (P,K,3) (frame-i coords), tri_mask (P,K).
    """
    K = matches_idx.shape[1]

    @functools.partial(jax.jit, static_argnames=())
    def run(bearings, matches_idx, matches_mask, pi, pj, keys):
        def one(args):
            i, j, midx, mmask, key = args
            b1 = bearings[i][midx[:, 0]]
            b2 = bearings[j][midx[:, 1]]
            # per-pair independent hypothesis draws: the pair id is folded
            # into the rng (deterministic across runs, uncorrelated across
            # pairs)
            ransac = epipolar.find_essential_acransac(
                b1, b2, mmask, n_hyp=cfg.ransac_hypotheses, seed=0, fold=key)
            pose = epipolar.best_pose_from_essential(
                ransac["E"], b1, b2, ransac["inliers"])
            # two-view refinement on triangulated inliers (chordal), pose 1
            # fixed, then renormalize |t| (Optimization.cpp:160-169).
            # Specialized Schur-eliminated solver: the generic dense path
            # factored a (12+3K)^2 system per pair per LM iteration — the
            # measured 0.22 s/pair wall of the Room-454 relative-pose phase
            # (solver/two_view.py)
            from ..solver import two_view_refine
            n_inl = jnp.sum(pose["good"])
            aa0 = se3.log_so3(pose["R_21"])
            pose_tv, pts_tv, _ = two_view_refine(
                jnp.concatenate([aa0, pose["t_21"]]), pose["points"],
                b1, b2, pose["good"],
                float(np.radians(cfg.ba_huber_deg)), max_iters=10)
            aa = pose_tv[:3]
            t = pose_tv[3:]
            t_norm = jnp.linalg.norm(t) + 1e-12
            pts = pts_tv / t_norm
            ok = ransac["ok"] & (n_inl >= cfg.min_inliers)
            return {"rel_aa": aa, "rel_t": t / t_norm, "n_inliers": n_inl,
                    "ok": ok, "tri_points": pts,
                    "tri_mask": pose["good"]}

        return jax.lax.map(one, (pi, pj, matches_idx, matches_mask, keys),
                           batch_size=max(1, int(cfg.pair_vmap_width)))

    # host-level pair chunking: one bounded device program per chunk (one
    # long program over hundreds of pairs can trip the remote worker's
    # watchdog); identical results, one compile (last chunk padded)
    P = len(pi)
    chunk = 32
    keys = (jnp.arange(P, dtype=jnp.int32) if keys is None
            else jnp.asarray(keys, jnp.int32))
    if P <= chunk:
        return run(bearings, jnp.asarray(matches_idx),
                   jnp.asarray(matches_mask), jnp.asarray(pi),
                   jnp.asarray(pj), keys)
    outs = []
    for s in range(0, P, chunk):
        sl = np.arange(s, min(s + chunk, P))
        pad = chunk - len(sl)
        sl = np.concatenate([sl, np.zeros(pad, int)]) if pad else sl
        o = run(bearings, jnp.asarray(matches_idx)[sl],
                jnp.asarray(matches_mask)[sl],
                jnp.asarray(np.asarray(pi)[sl]),
                jnp.asarray(np.asarray(pj)[sl]), keys[sl])
        outs.append({k: np.asarray(v)[:chunk - pad] for k, v in o.items()})
    return {k: jnp.asarray(np.concatenate([o[k] for o in outs]))
            for k in outs[0]}


def translation_scale_from_depth(depth_maps, frame_rows, frame_cols,
                                 rel, matches_idx, uv, pi, cfg: SfMConfig,
                                 min_votes: int = 10):
    """Metric scale per pair from LiDAR depth maps
    (SetTranslationScaleDepthMap, SfM.cpp:487-679): compare each
    two-view-triangulated inlier's depth in frame i against the (completed)
    LiDAR depth panorama at its pixel; the pair scale is the robust median of
    the ratios after MAD filtering (the reference's histogram filter).

    depth_maps: (N, H, W) float32, 0 = no depth. Returns scales (P,) with
    -1 where undetermined.
    """
    tri = np.asarray(rel["tri_points"])           # (P, K, 3) frame-i coords
    tmask = np.asarray(rel["tri_mask"])
    midx = np.asarray(matches_idx)
    H, W = depth_maps.shape[1:]
    # only trust depth where it is locally smooth: SIFT features concentrate
    # on edges, and completed depth bleeds the (nearer) foreground across
    # discontinuities, which biases the scale low (measured -13% at low res)
    dm = np.asarray(depth_maps)
    from scipy.ndimage import grey_dilation, grey_erosion
    local_max = np.stack([grey_dilation(d, size=3) for d in dm])
    local_min = np.stack([grey_erosion(np.where(d > 0, d, np.inf), size=3)
                          for d in dm])
    smooth = (local_max - local_min) < 0.1 * np.maximum(dm, 1e-6)
    scales = np.full(len(pi), -1.0, np.float32)
    for p in range(len(pi)):
        if not tmask[p].any():
            continue
        i = int(pi[p])
        uv_i = np.asarray(uv[i])[midx[p, :, 0]]   # (K,2) pixels in frame i
        d_tri = np.linalg.norm(tri[p], axis=1)
        px = np.clip(uv_i[:, 0].astype(int), 0, W - 1)
        py = np.clip(uv_i[:, 1].astype(int), 0, H - 1)
        d_lidar = dm[i][py, px]
        ok = (tmask[p] & (d_lidar > 0.1) & (d_tri > 1e-6)
              & smooth[i][py, px])
        if ok.sum() < min_votes:
            continue
        ratio = d_lidar[ok] / d_tri[ok]
        med = np.median(ratio)
        mad = np.median(np.abs(ratio - med)) + 1e-9
        inl = np.abs(ratio - med) < 3 * 1.4826 * mad
        if inl.sum() < min_votes:
            continue
        scales[p] = float(np.median(ratio[inl]))
    return scales


def filter_by_triplet(pi, pj, rel_aa, ok, angle_threshold_deg: float = 5.0):
    """Triplet rotation-consistency filter (FilterByTriplet, SfM.cpp:705-778)
    (host, networkx): a pair survives if it belongs to at least one triangle
    whose composed rotation is within the threshold of identity."""
    import networkx as nx
    from scipy.spatial.transform import Rotation as ScR
    g = nx.Graph()
    edge_of = {}
    for k in range(len(pi)):
        if not ok[k]:
            continue
        g.add_edge(int(pi[k]), int(pj[k]))
        edge_of[(int(pi[k]), int(pj[k]))] = k
    R = ScR.from_rotvec(np.asarray(rel_aa)).as_matrix()

    def rel_R(a, b):
        if (a, b) in edge_of:
            return R[edge_of[(a, b)]]
        return R[edge_of[(b, a)]].T

    keep = np.zeros(len(pi), bool)
    for a, b in g.edges:
        common = set(g.adj[a]) & set(g.adj[b])
        for c in common:
            cyc = rel_R(a, b) @ rel_R(c, a) @ rel_R(b, c)
            ang = np.degrees(np.linalg.norm(ScR.from_matrix(cyc).as_rotvec()))
            if ang < angle_threshold_deg:
                for e in ((a, b), (min(c, a), max(c, a)), (min(b, c), max(b, c))):
                    if e in edge_of:
                        keep[edge_of[e]] = True
                break
    return keep & np.asarray(ok)


def largest_biconnected(pi, pj, ok, n_frames):
    """Largest bi-edge-connected subgraph (LargestBiconnectedGraph,
    SfM.cpp:780-799; lemon -> networkx). Returns (pair keep, frame valid)."""
    import networkx as nx
    g = nx.Graph()
    for k in range(len(pi)):
        if ok[k]:
            g.add_edge(int(pi[k]), int(pj[k]))
    if g.number_of_edges() == 0:
        return np.zeros(len(pi), bool), np.zeros(n_frames, bool)
    # remove bridges, take the largest remaining component
    bridges = set(nx.bridges(g))
    g2 = g.copy()
    g2.remove_edges_from(bridges)
    comps = sorted(nx.connected_components(g2), key=len, reverse=True)
    nodes = comps[0] if comps else set()
    frame_valid = np.zeros(n_frames, bool)
    for v in nodes:
        frame_valid[v] = True
    keep = np.array([
        ok[k] and frame_valid[int(pi[k])] and frame_valid[int(pj[k])]
        for k in range(len(pi))])
    return keep, frame_valid


def _map_tracks_chunked(body, arrays, chunk):
    """Run `body` over the leading track axis in fixed-size chunks via
    lax.map, padding the last chunk with row 0 and trimming the result —
    bounds any (chunk, L, ...) intermediate instead of materializing the
    full (T, L, ...) tensor. `arrays`: tuple of (T, ...) arrays; `body`
    maps the tuple of (chunk, ...) blocks to an array or pytree of arrays
    with a leading chunk axis."""
    T = arrays[0].shape[0]
    if T <= chunk:
        return body(arrays)
    K = -(-T // chunk)
    pad = K * chunk - T

    def prep(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], 0)
        return a.reshape((K, chunk) + a.shape[1:])

    out = jax.lax.map(body, tuple(prep(a) for a in arrays))
    return jax.tree.map(
        lambda o: o.reshape((K * chunk,) + o.shape[2:])[:T], out)


def estimate_structure(poses_cw, bearings, track_img, track_feat, track_mask,
                       cfg: SfMConfig, chunk: int = 256):
    """TriangulateTracks (sfm/Structure.cpp:8-85): N-view triangulation of
    tracks with the viewing-angle criterion. Returns (points (T,3),
    ok (T,)).

    Chunked over tracks: the angle criterion's (T, L, L) pairwise-cosine
    tensor is unbounded when loop closures make track length L approach
    the frame count (Room-454 loop trajectory: ~18 GB), so tracks are
    processed in (chunk, L, L) blocks like filter_tracks_too_far."""
    poses_j = jnp.asarray(poses_cw)
    bear_j = jnp.asarray(bearings)

    def body(args):
        ti, tf, m = args
        b_obs = bear_j[ti, tf]                              # (c, L, 3)
        p_obs = poses_j[ti]                                 # (c, L, 6)
        origins, dirs = tri_ops.rays_from_poses(p_obs, b_obs)
        X, ok = tri_ops.triangulate_rays(origins, dirs, m)
        ang = tri_ops.max_pairwise_ray_angle(dirs, m)
        # reprojection sanity (FilterTracksAngleResidual)
        rep = tri_ops.reprojection_angles(p_obs, b_obs, X, m)
        ok = ok & (ang <= cfg.triangulate_angle_threshold) & \
            (jnp.max(rep, axis=-1) < 5.0) & (ang > 1.0)
        return X, ok

    return _map_tracks_chunked(
        body, (jnp.asarray(track_img), jnp.asarray(track_feat),
               jnp.asarray(track_mask)), chunk)


def filter_tracks_too_far(poses_cw, track_img, track_mask, X, ok,
                          threshold: float = 8.0, chunk: int = 512):
    """FilterTracksToFar (sfm/Structure.cpp:87-119): drop points whose mean
    distance to their observing cameras exceeds threshold x the track's
    baseline (furthest camera-center pair). Returns updated ok.

    The pairwise center distances use the Gram identity |a-b|^2 =
    |a|^2+|b|^2-2ab (one MXU matmul per track chunk) instead of a
    (T, L, L, 3) difference tensor — at Room-454 track lengths that
    tensor exceeds HBM outright. Chunked over tracks to bound the
    (chunk, L, L) Gram blocks."""
    poses_j = jnp.asarray(poses_cw)
    R_cw = se3.exp_so3(poses_j[:, :3])
    C = -se3.einsum("nji,nj->ni", R_cw, poses_j[:, 3:])     # camera centers

    def body(args):
        ti, m, x = args
        c_obs = C[ti]                                       # (c, L, 3)
        # center per track before the Gram identity: with raw coordinates
        # |a|^2+|b|^2-2ab cancels catastrophically in f32 when the baseline
        # is small relative to the distance from the world origin
        w = m.astype(c_obs.dtype)
        mean_c = (jnp.sum(c_obs * w[..., None], axis=1)
                  / jnp.maximum(jnp.sum(w, axis=1), 1.0)[:, None])
        c_obs = c_obs - mean_c[:, None, :]
        sq = jnp.sum(c_obs * c_obs, axis=-1)                # (c, L)
        G = se3.einsum("tla,tma->tlm", c_obs, c_obs)
        d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * G
        pair_ok = m[:, :, None] & m[:, None, :]
        baseline = jnp.sqrt(jnp.maximum(
            jnp.max(jnp.where(pair_ok, d2, 0.0), axis=(1, 2)), 0.0))
        dist = jnp.linalg.norm((x - mean_c)[:, None] - c_obs, axis=-1)
        mean_d = jnp.sum(jnp.where(m, dist, 0.0), axis=1) / \
            jnp.maximum(jnp.sum(m, axis=1), 1)
        return mean_d <= threshold * baseline

    good = _map_tracks_chunked(
        body, (jnp.asarray(track_img), jnp.asarray(track_mask),
               jnp.asarray(X)), chunk)
    return jnp.asarray(ok) & good


def filter_tracks_pixel_residual(poses_cw, X, track_img, track_feat,
                                 track_mask, uv, ok, threshold: float,
                                 rows: int, cols: int, chunk: int = 4096):
    """FilterTracksPixelResidual (sfm/Structure.cpp:121-157): drop points
    whose projection misses ANY of their observations by > threshold px
    (u wrapped across the lon seam). Returns updated ok. Chunked over
    tracks: the (T, L, 3, 3) rotation gather is GBs at Room-454 loop
    track lengths."""
    from ..ops import spherical
    poses_j = jnp.asarray(poses_cw)
    R_all = se3.exp_so3(poses_j[:, :3])                     # (N,3,3)
    t_all = poses_j[:, 3:]
    uv_j = jnp.asarray(uv)

    def body(args):
        ti, tf, m, x = args
        p_c = se3.einsum("tlij,tj->tli", R_all[ti], x) + t_all[ti]
        uv_proj = spherical.cam_to_image(p_c, rows, cols)
        uv_obs = uv_j[ti, tf]
        du = jnp.mod(uv_proj[..., 0] - uv_obs[..., 0] + cols / 2,
                     cols) - cols / 2
        dv = uv_proj[..., 1] - uv_obs[..., 1]
        sq = du ** 2 + dv ** 2
        return jnp.max(jnp.where(m, sq, 0.0), axis=1)

    worst = _map_tracks_chunked(
        body, (jnp.asarray(track_img), jnp.asarray(track_feat),
               jnp.asarray(track_mask), jnp.asarray(X)), chunk)
    return jnp.asarray(ok) & (worst <= threshold ** 2)


def global_ba(poses_cw, points, track_img, track_feat, track_mask, bearings,
              point_ok, frame_valid, cfg: SfMConfig,
              refine_rotation=True, refine_translation=True,
              refine_structure=True, max_iters: int = 50,
              residual: str = "chordal", uv=None, rows: int = 0,
              cols: int = 0):
    """SfMGlobalBA (util/Optimization.cpp:10-82): one LM problem over all
    camera poses + structure with Huber(4 deg) chordal reprojection.
    residual="pixel" uses the pixel functor at (rows, cols) resolution with
    uv (N,F,2) observations and Huber(4 px) instead (PIXEL_RESIDUAL mode,
    used by MVS::RefineCameraPose, mvs/MVS.cpp:383-428)."""
    T, L = track_img.shape
    obs_t = np.repeat(np.arange(T), L)
    obs_img = np.asarray(track_img).ravel()
    obs_feat = np.asarray(track_feat).ravel()
    obs_mask = (np.asarray(track_mask).ravel()
                & np.asarray(point_ok)[obs_t]
                & np.asarray(frame_valid)[obs_img])
    b_obs = np.asarray(bearings)[obs_img, obs_feat]

    groups = {"poses": jnp.asarray(poses_cw, jnp.float32),
              "pts": jnp.asarray(points, jnp.float32)}
    fixed_p = np.zeros(groups["poses"].shape, bool)
    if not refine_rotation:
        fixed_p[:, :3] = True
    if not refine_translation:
        fixed_p[:, 3:] = True
    fixed_p[~np.asarray(frame_valid)] = True
    first = int(np.argmax(np.asarray(frame_valid)))
    fixed_p[first] = True  # gauge
    fixed_x = np.zeros(groups["pts"].shape, bool)
    if not refine_structure:
        fixed_x[:] = True
    fixed_x[~np.asarray(point_ok)] = True
    if residual == "pixel":
        uv_obs = np.asarray(uv)[obs_img, obs_feat]
        fn = functools.partial(residuals.reproj_pixel, rows=rows, cols=cols)
        block = ResidualBlock(
            fn, ("poses", "pts"),
            (jnp.asarray(obs_img, jnp.int32), jnp.asarray(obs_t, jnp.int32)),
            (jnp.asarray(uv_obs),),
            jnp.ones((len(obs_img),), jnp.float32), jnp.asarray(obs_mask),
            loss="huber", loss_scale=4.0, name="reproj_px")
    else:
        block = ResidualBlock(
            residuals.reproj_chordal, ("poses", "pts"),
            (jnp.asarray(obs_img, jnp.int32), jnp.asarray(obs_t, jnp.int32)),
            (jnp.asarray(b_obs),),
            jnp.ones((len(obs_img),), jnp.float32), jnp.asarray(obs_mask),
            loss="huber", loss_scale=float(np.radians(cfg.ba_huber_deg)),
            name="reproj")
    # Schur-eliminate the structure; short/long track buckets avoid paying
    # the longest track's padding in every elimination pass
    from ..solver import bucket_schur_points
    g2, blocks2, fx2, spec, reasm = bucket_schur_points(
        groups, (block,),
        {"poses": jnp.asarray(fixed_p), "pts": jnp.asarray(fixed_x)},
        track_mask, "pts")
    out, info = solve_lm_chunked(
        g2, blocks2, fx2, LMOptions(max_iters=max_iters), chunk=10,
        schur=spec)
    pts = reasm(out) if reasm is not None else np.asarray(out["pts"])
    return np.asarray(out["poses"]), pts, info


def set_to_origin(poses_cw, frame_valid):
    """SetToOrigin (SfM.cpp:1385-1421): move the first valid camera to the
    world origin with identity rotation."""
    from scipy.spatial.transform import Rotation as ScR
    first = int(np.argmax(np.asarray(frame_valid)))
    aa0 = np.asarray(poses_cw)[first, :3]
    t0 = np.asarray(poses_cw)[first, 3:]
    R0 = ScR.from_rotvec(aa0).as_matrix()
    out = np.array(poses_cw, np.float64).copy()
    for i in range(len(out)):
        if not frame_valid[i]:
            continue
        Ri = ScR.from_rotvec(out[i, :3]).as_matrix()
        ti = out[i, 3:]
        # T_iw' = T_iw * T_w0 (new world = old frame 'first')
        R_new = Ri @ R0.T
        t_new = ti - R_new @ t0
        out[i, :3] = ScR.from_matrix(R_new).as_rotvec()
        out[i, 3:] = t_new
    return out.astype(np.float32)
