"""Panoramic 2D line detection + great-circle fusion.

Replaces util/PanoramaLine.{h,cpp} (reference, 1474 LoC): LSD detection in
the usable latitude band (PanoramaLine.cpp:34-101), then fusion of fragments
of the same physical edge (FuseNearLines/FuseFarLines/FuseOverlapLines/
FuseBoundaryLines + NCC split test, PanoramaLine.h:54-94) and length/arc
filters (:103-160).

TPU-first reformulation: a 2D segment on an equirectangular image is an arc
of a great circle — fully described by the unit normal of the plane through
its endpoint rays and the camera center. Fragment fusion then becomes a
single vectorized criterion (normal-normal angle + arc adjacency/overlap +
optional gray NCC along the arc) and a connected-component merge, instead of
the reference's four pairwise fusion passes over pixel-space polylines.
Detection itself (LSD) runs on host like SIFT — it is data prep.
"""

from __future__ import annotations

import numpy as np


def detect_lsd(gray: np.ndarray, lat_band_deg: float = 70.0,
               mask: np.ndarray | None = None, min_pixel_len: float = 20.0):
    """LSD segments on a panorama, restricted to |lat| <= lat_band_deg
    (the reference detects in the +-45..70 deg band / under a user mask,
    PanoramaLine.cpp:34-101). Returns (L, 4) [u1 v1 u2 v2] float32."""
    import cv2
    H, W = gray.shape[:2]
    lsd = cv2.createLineSegmentDetector()
    out = lsd.detect(gray)[0]
    if out is None:
        return np.zeros((0, 4), np.float32)
    segs = out.reshape(-1, 4).astype(np.float32)
    v_lo = H * (0.5 - lat_band_deg / 180.0)
    v_hi = H * (0.5 + lat_band_deg / 180.0)
    keep = ((segs[:, 1] > v_lo) & (segs[:, 1] < v_hi)
            & (segs[:, 3] > v_lo) & (segs[:, 3] < v_hi))
    length = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
    keep &= length >= min_pixel_len
    if mask is not None:
        my = np.clip(segs[:, 1].astype(int), 0, H - 1)
        mx = np.clip(segs[:, 0].astype(int), 0, W - 1)
        keep &= mask[my, mx] > 0
    return segs[keep]


def _image_to_cam_np(uv, rows, cols):
    """Numpy mirror of ops.spherical.image_to_cam (exactness tested by
    test_segments_to_arcs_matches_spherical)."""
    u, v = uv[..., 0], uv[..., 1]
    lon = (2.0 * u / cols - 1.0) * np.pi
    lat = (0.5 - v / rows) * np.pi
    cy = np.cos(lat)
    return np.stack([cy * np.sin(lon), -np.sin(lat), cy * np.cos(lon)],
                    axis=-1)


def segments_to_arcs(segs: np.ndarray, rows: int, cols: int):
    """2D segments -> great-circle arcs.

    Returns dict of numpy arrays: normal (L,3) unit plane normals, e1/e2
    (L,3) endpoint rays, mid (L,3) midpoint rays, arc (L,) arc angle rad."""
    if len(segs) == 0:
        z = np.zeros((0, 3), np.float32)
        return {"normal": z, "e1": z, "e2": z, "mid": z,
                "arc": np.zeros((0,), np.float32)}
    # host numpy mirror of spherical.image_to_cam (a jnp call here would
    # recompile per image: the segment count varies per panorama, and a
    # tiny compile per distinct shape dominated the whole joint stage)
    e1 = _image_to_cam_np(segs[:, :2], rows, cols)
    e2 = _image_to_cam_np(segs[:, 2:], rows, cols)
    n = np.cross(e1, e2)
    nn = np.linalg.norm(n, axis=1, keepdims=True)
    ok = nn[:, 0] > 1e-9
    n = np.where(ok[:, None], n / np.maximum(nn, 1e-12), 0.0)
    mid = e1 + e2
    mid /= np.linalg.norm(mid, axis=1, keepdims=True) + 1e-12
    arc = np.arccos(np.clip((e1 * e2).sum(1), -1.0, 1.0))
    return {"normal": n.astype(np.float32), "e1": e1.astype(np.float32),
            "e2": e2.astype(np.float32), "mid": mid.astype(np.float32),
            "arc": arc.astype(np.float32)}


def _cam_to_image_np(xyz, rows, cols):
    """Inverse of _image_to_cam_np: unit rays -> pixel (u, v)."""
    lat = np.arcsin(np.clip(-xyz[..., 1], -1.0, 1.0))
    lon = np.arctan2(xyz[..., 0], xyz[..., 2])
    u = (lon / np.pi + 1.0) * cols / 2.0
    v = (0.5 - lat / np.pi) * rows
    return np.stack([u, v], axis=-1)


def endpoint_ncc(gray: np.ndarray, uv1: np.ndarray, uv2: np.ndarray,
                 half_window: int = 21):
    """Batched ComputeNCC (util/PanoramaLine.h:96-97, the colmap-style
    patch NCC): zero-mean normalized correlation of the (2w+1)^2 patches
    around each point pair, border-clamped. uv1/uv2 (Q, 2) -> (Q,)."""
    H, W = gray.shape[:2]
    g = gray.astype(np.float32)
    w = half_window
    dy, dx = np.mgrid[-w:w + 1, -w:w + 1]

    def patches(uv):
        yy = np.clip(np.round(uv[:, 1]).astype(np.int64)[:, None, None] + dy,
                     0, H - 1)
        # longitude wraps on a panorama
        xx = np.mod(np.round(uv[:, 0]).astype(np.int64)[:, None, None] + dx, W)
        return g[yy, xx].reshape(len(uv), -1)

    p1 = patches(np.atleast_2d(uv1))
    p2 = patches(np.atleast_2d(uv2))
    p1 = p1 - p1.mean(1, keepdims=True)
    p2 = p2 - p2.mean(1, keepdims=True)
    den = np.sqrt((p1 * p1).sum(1) * (p2 * p2).sum(1))
    return (p1 * p2).sum(1) / np.maximum(den, 1e-9)


def fuse_arcs(arcs: dict, angle_thresh_deg: float = 2.0,
              gap_deg: float = 4.0, gray: np.ndarray | None = None,
              ncc_gap_deg: float = 12.0, ncc_threshold: float = -0.2,
              ncc_floor: float = -0.4, ncc_half_window: int = 21):
    """Merge fragments on the same great circle with adjacent/overlapping
    arcs (the reference's Fuse* family). Host numpy (few hundred lines).

    With `gray`, disjoint fragments (a gap between the arcs) must ALSO pass
    the photometric endpoint test of FuseFarLines
    (util/PanoramaLine.cpp:661-703): of the 4 endpoint-pair patch NCCs,
    the max must reach ncc_threshold and the min must stay above
    ncc_floor — distinct collinear edges split by an occlusion look
    different at their endpoints and are NOT fused. NCC-verified merges
    are allowed a wider gap (12 deg, matching the reference's relaxed
    far-fusion radius); overlapping fragments fuse geometrically, like
    FuseOverlapLines. (The reference's FilterByNCC split pass is disabled
    in its own default Fuse flow, PanoramaLine.cpp:449.)

    Returns fused dict (same keys as segments_to_arcs)."""
    n = arcs["normal"]
    L = len(n)
    if L == 0:
        return arcs
    cos_t = np.cos(np.radians(angle_thresh_deg))
    nn = np.abs(n @ n.T)
    same_plane = nn >= cos_t
    # arc adjacency: min endpoint-pair angle <= gap OR midpoints closer than
    # the sum of half arcs (overlap)
    E = np.stack([arcs["e1"], arcs["e2"]], axis=1)  # (L,2,3)
    dots = np.einsum("iak,jbk->iajb", E, E).reshape(L, 2, L, 2)
    min_gap = np.arccos(np.clip(dots, -1, 1)).min(axis=(1, 3))
    mid_dot = np.einsum("ik,jk->ij", arcs["mid"], arcs["mid"])
    mid_ang = np.arccos(np.clip(mid_dot, -1, 1))
    half_sum = 0.5 * (arcs["arc"][:, None] + arcs["arc"][None, :])
    overlap = mid_ang <= half_sum
    if gray is None:
        adjacent = (min_gap <= np.radians(gap_deg)) | overlap
        connect = same_plane & adjacent
    else:
        near = min_gap <= np.radians(max(gap_deg, ncc_gap_deg))
        cand = same_plane & near & ~overlap
        ii, jj = np.nonzero(np.triu(cand, 1))
        ncc_ok = np.zeros((L, L), bool)
        if len(ii):
            H, W = gray.shape[:2]
            uv = _cam_to_image_np(E, rows=H, cols=W)     # (L, 2, 2)
            a = np.repeat(uv[ii], 2, axis=1).reshape(-1, 2)   # i e1,e1,e2,e2
            b = np.tile(uv[jj], (1, 2, 1)).reshape(-1, 2)     # j e1,e2,e1,e2
            s = endpoint_ncc(gray, a, b, ncc_half_window).reshape(-1, 4)
            good = (s.max(1) >= ncc_threshold) & (s.min(1) >= ncc_floor)
            ncc_ok[ii[good], jj[good]] = True
            ncc_ok |= ncc_ok.T
        connect = (same_plane & overlap) | ncc_ok
    # connected components (host union-find)
    from .tracks import UnionFind
    uf = UnionFind(L)
    ii, jj = np.nonzero(connect)
    for a, b in zip(ii, jj):
        if a < b:
            uf.union(int(a), int(b))
    roots = np.array([uf.find(i) for i in range(L)])
    out = {k: [] for k in ("normal", "e1", "e2", "mid", "arc")}
    for r in np.unique(roots):
        grp = np.nonzero(roots == r)[0]
        if len(grp) == 1:
            for k in ("normal", "e1", "e2", "mid", "arc"):
                out[k].append(arcs[k][grp[0]])
            continue
        # refit plane: smallest eigenvector of endpoint scatter (weighted by arc)
        pts = E[grp].reshape(-1, 3)
        w = np.repeat(arcs["arc"][grp], 2)[:, None]
        A = (pts * w).T @ pts
        evals, evecs = np.linalg.eigh(A)
        nrm = evecs[:, 0]
        nrm /= np.linalg.norm(nrm) + 1e-12
        # endpoints: extreme angular positions along the circle
        ref = pts[0] - (pts[0] @ nrm) * nrm
        ref /= np.linalg.norm(ref) + 1e-12
        t2 = np.cross(nrm, ref)
        proj = pts - (pts @ nrm)[:, None] * nrm
        proj /= np.linalg.norm(proj, axis=1, keepdims=True) + 1e-12
        ang = np.arctan2(proj @ t2, proj @ ref)
        a_lo, a_hi = ang.min(), ang.max()
        e1 = np.cos(a_lo) * ref + np.sin(a_lo) * t2
        e2 = np.cos(a_hi) * ref + np.sin(a_hi) * t2
        mid = e1 + e2
        mid /= np.linalg.norm(mid) + 1e-12
        out["normal"].append(nrm.astype(np.float32))
        out["e1"].append(e1.astype(np.float32))
        out["e2"].append(e2.astype(np.float32))
        out["mid"].append(mid.astype(np.float32))
        out["arc"].append(np.float32(a_hi - a_lo))
    return {k: np.stack(v) if v else np.zeros((0, 3) if k != "arc" else (0,),
                                              np.float32)
            for k, v in out.items()}


def filter_arcs(arcs: dict, min_arc_deg: float = 3.0):
    """Length/arc filter (PanoramaLine.cpp:103-160)."""
    keep = arcs["arc"] >= np.radians(min_arc_deg)
    return {k: v[keep] for k, v in arcs.items()}


def pad_arcs(arcs: dict, cap: int):
    """Pad to fixed shapes for device consumption. Returns dict + mask."""
    L = min(len(arcs["arc"]), cap)
    out = {}
    for k in ("normal", "e1", "e2", "mid"):
        buf = np.zeros((cap, 3), np.float32)
        buf[:L] = arcs[k][:L]
        out[k] = buf
    arc = np.zeros((cap,), np.float32)
    arc[:L] = arcs["arc"][:L]
    out["arc"] = arc
    mask = np.zeros((cap,), bool)
    mask[:L] = True
    out["mask"] = mask
    return out


def _lines_worker(args):
    """Spawn-pool worker: one frame's LSD+fuse (no descriptors — those run
    batched on device afterwards). Module-level so it pickles."""
    gu8, cap, mask = args
    return extract_panorama_lines(gu8, cap=cap, mask=mask,
                                  with_descriptors=False)


def extract_panorama_lines_batch(grays, cap: int = 128,
                                 mask: np.ndarray | None = None,
                                 with_descriptors: bool = True,
                                 num_threads: int = -1):
    """Detect+Fuse for a whole image stack, descriptors in ONE device
    program. `grays`: iterable of (H, W) uint8 (or float 0..1) panoramas,
    all the same shape. Host LSD + fusion is frame-parallel over the host
    process pool (the reference's OpenMP image-line loop,
    joint_optimization/CameraLidarOptimizer.cpp:89-149 at config
    num_threads), then one batched `lbd.line_band_descriptors_batch` call
    instead of a dispatch+sync round trip per frame. Returns dict of
    stacked arrays: normal/e1/e2/mid (N, cap, 3), arc/mask (N, cap),
    desc (N, cap, 72)."""
    import logging
    import time as _time
    from .hostpool import map_frames
    gray_u8 = []
    gray_f = []
    t0 = _time.time()
    for g in grays:
        if g.dtype != np.uint8:
            gu8 = (np.clip(g, 0.0, 1.0) * 255).astype(np.uint8)
        else:
            gu8 = g
        gray_u8.append(gu8)
        if with_descriptors:
            gray_f.append(gu8.astype(np.float32) / 255.0)
    arc_list = map_frames(_lines_worker,
                          [(g, cap, mask) for g in gray_u8],
                          num_threads=num_threads)
    out = {k: np.stack([a[k] for a in arc_list]) for k in arc_list[0]}
    t1 = _time.time()
    if with_descriptors:
        import jax.numpy as jnp
        from ..ops import lbd
        out["desc"] = np.asarray(lbd.line_band_descriptors_batch(
            jnp.asarray(np.stack(gray_f)), jnp.asarray(out["e1"]),
            jnp.asarray(out["e2"]), jnp.asarray(out["mask"])))
    logging.getLogger("panovlm").info(
        "image lines: host LSD+fuse %.1f s, LBD device program %.1f s",
        t1 - t0, _time.time() - t1)
    return out


def extract_panorama_lines(gray: np.ndarray, cap: int = 128,
                           mask: np.ndarray | None = None,
                           with_descriptors: bool = True):
    """Full Detect+Fuse pipeline for one panorama (PanoramaLine::Detect/Fuse).
    Returns padded arc dict; with_descriptors adds the LBD-equivalent band
    descriptor per arc (ops/lbd.py, replacing the reference's OpenCV LBD,
    util/PanoramaLine.cpp:39-74) under key "desc"."""
    H, W = gray.shape[:2]
    segs = detect_lsd(gray, mask=mask)
    arcs = segments_to_arcs(segs, H, W)
    arcs = fuse_arcs(arcs, gray=gray)
    arcs = filter_arcs(arcs)
    # strongest (longest) first
    order = np.argsort(-arcs["arc"])
    arcs = {k: v[order] for k, v in arcs.items()}
    out = pad_arcs(arcs, cap)
    if with_descriptors:
        import jax.numpy as jnp
        from ..ops import lbd
        gf = gray.astype(np.float32)
        if gray.dtype == np.uint8:
            gf /= 255.0
        out["desc"] = np.asarray(lbd.line_band_descriptors(
            jnp.asarray(gf), jnp.asarray(out["e1"]), jnp.asarray(out["e2"]),
            jnp.asarray(out["mask"])))
    return out
