"""Five-stage pipeline drivers — the reference's main.cpp stage functions.

Mirrors the CLI contract (main.cpp:41-84): each stage reads a config txt,
consumes the previous stage's artifacts from disk and writes its own
(checkpoint/resume by stage files, SURVEY.md §5.4):

  init_camera_pose   (InitCameraPose,  main.cpp:91-370)  -> result/sfm/
  init_lidar_pose    (InitLidarPose,   main.cpp:372-452) -> result/odometry/
  joint_optimization (JointOptimization, main.cpp:454-522) -> result/joint/
  colorize_lidar_map (ColorizeLidarMap, main.cpp:524-551) -> result/texture/
  joint_mvs          (JointMVS,        main.cpp:553-678) -> result/mvs/
"""

from __future__ import annotations

import glob
import logging
import os

import numpy as np

from .config import Config
from .io import artifacts, pointcloud
from .utils import poses as pose_util
from .utils.timing import TimeReport

log = logging.getLogger("panovlm")


def _list_files(path, exts):
    out = []
    for e in exts:
        out += glob.glob(os.path.join(path, f"*.{e}"))
    return sorted(out)


def _data_mesh():
    """1-D data mesh over the attached devices, or None on a single chip.
    Production stages pass this into their solves/associations so the CLI
    engages the multi-chip path whenever >1 device is attached (the
    multi-chip form of the reference's OpenMP loops, SURVEY.md §2.8)."""
    import jax
    if len(jax.devices()) <= 1:
        return None
    from .parallel import make_mesh
    return make_mesh()


def load_images(cfg: Config, scale_override=None, color: bool = False):
    """Load panoramas as float [0,1] (+ names): grayscale (H,W) by default,
    RGB (H,W,3) with color=True (Frame::GetImageColor). Applies the config
    'scale' pyramid factor (Frame.cpp:18-44)."""
    import cv2
    files = _list_files(cfg.image_path, ("jpg", "jpeg", "png"))
    scale = cfg.scale if scale_override is None else scale_override
    grays = []
    for f in files:
        if color:
            g = cv2.cvtColor(cv2.imread(f, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
        else:
            g = cv2.imread(f, cv2.IMREAD_GRAYSCALE)
        if scale < 0:
            for _ in range(-scale):
                g = cv2.pyrDown(g)
        elif scale > 0:
            for _ in range(scale):
                g = cv2.pyrUp(g)
        grays.append(g.astype(np.float32) / 255.0)
    return grays, [os.path.basename(f) for f in files]


def load_mask(cfg: Config, H: int, W: int):
    """Static panorama mask (cfg.mask_path, main.cpp:102-104/610-612):
    u8 image, >0 = usable pixel. Resized to (H, W); None when unset."""
    import cv2
    if not cfg.mask_path or not os.path.exists(cfg.mask_path):
        return None
    m = cv2.imread(cfg.mask_path, cv2.IMREAD_GRAYSCALE)
    if m is None:
        log.error("Fail to read mask %s", cfg.mask_path)
        return None
    if m.shape != (H, W):
        m = cv2.resize(m, (W, H), interpolation=cv2.INTER_NEAREST)
    return m > 0


def load_scans(cfg: Config, path: str | None = None):
    """Load + preprocess all scans. File IO overlaps preprocessing via the
    native threaded prefetcher (replacing the reference's OpenMP load loops,
    e.g. LidarOdometry.cpp:130-148); falls back to synchronous reads when
    the native library is unavailable. `path` overrides cfg.lidar_path
    (e.g. the undistorted-cloud directory, main.cpp:432-434)."""
    from .native import ScanPrefetcher
    from .sensors import velodyne as vd
    files = _list_files(path or cfg.lidar_path, ("pcd", "ply"))
    if not files and path:   # undistort dir empty/missing: raw clouds
        files = _list_files(cfg.lidar_path, ("pcd", "ply"))
    scans, valid, names = [], [], []
    pf = ScanPrefetcher(files, n_threads=4)
    try:
        for f, raw in zip(files, pf):
            if raw is None:  # native read failed; retry with the numpy path
                raw = pointcloud.load_cloud(f)
            pts, ok = vd.preprocess_cloud(raw)
            scans.append(pts)
            valid.append(ok)
            names.append(os.path.basename(f))
    finally:
        pf.close()
    return scans, np.asarray(valid), names


def _scan_cap(scans, quantum: int = 8192, max_cap: int = 32768) -> int:
    """Static per-dataset point cap: the longest scan rounded up to a
    quantum (at most 4 distinct program shapes across datasets). VLP-16
    scans at test horizon counts are ~14k points; padding them to the full
    32k cap doubles every per-point program for no information."""
    longest = max((len(s) for s in scans), default=max_cap)
    return int(min(max_cap, max(quantum, -(-longest // quantum) * quantum)))


def extract_all_features(scans, cap: int = 32768, cfg: Config = None,
                         chunk: int = 32):
    """Batched feature extraction: one vmapped device program per CHUNK of
    scans instead of one dispatch+sync per scan — per-call overhead through
    the remote runtime dominates at per-scan granularity (PERF.md device
    calibration: ~28 ms sync round-trip vs ~2 ms/scan of extraction work in
    the batched program). The scan count is padded to a chunk multiple so
    exactly one program shape compiles regardless of dataset size."""
    import jax
    import jax.numpy as jnp
    from .sensors import velodyne as vd

    kw = dict(
        max_curvature=cfg.max_curvature if cfg else 5.0,
        intersect_angle_threshold=cfg.intersection_angle_threshold if cfg else 5.0,
        segment=cfg.lidar_segmentation if cfg else True,
        method=cfg.extraction_method if cfg else 3,
        repair_rings=cfg.lidar_ring_repair if cfg else False)
    n = len(scans)
    chunk = min(chunk, max(n, 1))
    extract = jax.jit(jax.vmap(lambda p, m: vd.extract_features(p, m, **kw)[0]))
    pads = [vd.pad_points(p, cap) for p in scans]
    outs = []
    for c0 in range(0, n, chunk):
        sel = pads[c0:c0 + chunk]
        sel = sel + [sel[-1]] * (chunk - len(sel))  # pad last chunk: one shape
        pts = jnp.asarray(np.stack([p for p, _ in sel]))
        msk = jnp.asarray(np.stack([m for _, m in sel]))
        outs.append(extract(pts, msk))
    return {k: jnp.concatenate([getattr(o, k) for o in outs])[:n]
            for k in outs[0]._fields}


# ----------------------------------------------------------------------------


def _sfm_config(cfg: Config, cap: int):
    from .models import sfm as sfm_mod
    return sfm_mod.SfMConfig(
        num_sift=cap, sift_match_dist_threshold=cfg.sift_match_dist_threshold,
        sift_match_num_threshold=cfg.sift_match_num_threshold,
        triangulate_angle_threshold=cfg.triangulate_angle_threshold,
        upper_scale_ratio=cfg.upper_scale_ratio,
        lower_scale_ratio=cfg.lower_scale_ratio)


def _match_pairs_cached(cfg: Config, scfg, cap: int, desc, fmask, pi, pj):
    """Row-based match-pair cache (main.cpp:194-248, plus the pair-surgery
    contract of SfM_test.cpp): rows in cfg.match_pair_path whose (i, j) key
    is in the proposed pair set are reused, missing rows are matched fresh,
    and cached rows flagged `extra` (written by pair_surgery.add_pair /
    recompute_pairs) are appended even though the proposer would not
    regenerate them. Returns (pi, pj, matches) with the possibly-extended
    pair list."""
    import jax.numpy as jnp
    from .models import sfm as sfm_mod

    mcache = os.path.join(cfg.match_pair_path, "match_pairs.npz") \
        if cfg.match_pair_path else ""
    K = min(int(scfg.max_matches), cap)  # match_descriptors pads to this
    mc = artifacts.load_npz_or_none(mcache) if mcache else None
    if mc is not None:
        if int(mc["num_sift"]) != cap or mc["idx"].shape[1] != K \
                or mc["idx"].shape[0] != mc["pi"].shape[0]:
            log.info("cached match pairs are stale, re-matching")
            mc = None

    cpi = mc["pi"] if mc is not None else np.zeros((0,), np.int32)
    cpj = mc["pj"] if mc is not None else np.zeros((0,), np.int32)
    rowmap = {(int(a), int(b)): r for r, (a, b) in enumerate(zip(cpi, cpj))}
    cextra = (mc["extra"].astype(bool) if mc is not None and "extra" in mc
              else np.zeros(len(cpi), bool))
    gen = set(zip(pi.tolist(), pj.tolist()))
    keep_extra = [r for r in range(len(cpi))
                  if cextra[r] and (int(cpi[r]), int(cpj[r])) not in gen]
    pi = np.concatenate([pi, cpi[keep_extra].astype(pi.dtype)])
    pj = np.concatenate([pj, cpj[keep_extra].astype(pj.dtype)])
    hit = np.asarray([rowmap.get((int(a), int(b)), -1)
                      for a, b in zip(pi, pj)], np.int64)
    have = hit >= 0
    P = len(pi)
    idx = np.zeros((P, K, 2), np.int32)
    msk = np.zeros((P, K), bool)
    pok = np.zeros((P,), bool)
    if have.any():
        idx[have] = mc["idx"][hit[have]]
        msk[have] = mc["mask"][hit[have]]
        pok[have] = mc["pair_ok"][hit[have]]
    miss = np.nonzero(~have)[0]
    extra = np.asarray([(int(a), int(b)) not in gen
                        for a, b in zip(pi, pj)], bool)

    def _save(done_mask):
        if not mcache:
            return
        os.makedirs(cfg.match_pair_path, exist_ok=True)
        artifacts.save_npz(mcache, pi=pi[done_mask], pj=pj[done_mask],
                           num_sift=cap, idx=idx[done_mask],
                           mask=msk[done_mask], pair_ok=pok[done_mask],
                           extra=extra[done_mask])

    if len(miss):
        if len(cpi):
            log.info("match-pair cache: %d/%d rows reused, %d re-matched",
                     int(have.sum()), P, len(miss))
        # incremental checkpoints: a long matching phase (thousands of
        # pairs on a Floor/Campus-sized trajectory) must survive a stage
        # timeout/crash — only COMPLETED rows are persisted, so a rerun
        # resumes where this one stopped (§5.4 checkpoint contract)
        desc_j, fmask_j = jnp.asarray(desc), jnp.asarray(fmask)
        done = have.copy()
        save_every = 1024
        for s in range(0, len(miss), save_every):
            part = miss[s:s + save_every]
            mm = sfm_mod.match_all_pairs(desc_j, fmask_j, pi[part], pj[part],
                                         scfg)
            idx[part] = np.asarray(mm["idx"])
            msk[part] = np.asarray(mm["mask"])
            pok[part] = np.asarray(mm["pair_ok"])
            done[part] = True
            if s + save_every < len(miss):
                _save(done)
                log.info("match-pair cache: checkpoint %d/%d rows",
                         int(done.sum()), P)
        _save(np.ones(P, bool))
    else:
        if len(cpi):
            log.info("Use existing match pairs in %s", cfg.match_pair_path)
        if len(keep_extra) != int(cextra.sum()) or len(pi) != len(cpi):
            _save(np.ones(P, bool))
    matches = {"idx": jnp.asarray(idx), "mask": jnp.asarray(msk),
               "pair_ok": jnp.asarray(pok)}
    return pi, pj, matches


def _match_row_fp(idx, mask):
    """Per-row fingerprint of a pair's match set — the invalidation key for
    the relative-pose cache (a cached pose is only valid for the exact
    correspondences it was estimated from). blake2b over the row's raw
    (idx, mask) bytes: no structured-collision surface, unlike a linear
    position-weighted sum (a swap of two entries must change the key)."""
    import hashlib
    idx = np.ascontiguousarray(np.asarray(idx, np.int64))
    mask = np.ascontiguousarray(np.asarray(mask, bool))
    out = np.empty(len(idx), np.int64)
    for r in range(len(idx)):
        h = hashlib.blake2b(idx[r].tobytes() + mask[r].tobytes(),
                            digest_size=8).digest()
        out[r] = np.int64(int.from_bytes(h, "little", signed=True))
    return out


def _relative_poses_cached(cfg: Config, scfg, bearings, matches, pi, pj):
    """Row-cached relative poses — the resume artifact the reference
    persists as the pairs_after_relative_pose binary dir (main.cpp:221-248):
    the most expensive SfM phase (AC-RANSAC + two-view refinement per pair)
    is reused across reruns. Rows keyed by (i, j) AND a fingerprint of the
    pair's matches, so pair surgery / re-matching invalidates exactly the
    rows it touched. Cache lives beside the match cache in
    cfg.match_pair_path."""
    import jax.numpy as jnp
    from .models import sfm as sfm_mod

    rcache = os.path.join(cfg.match_pair_path, "rel_poses.npz") \
        if cfg.match_pair_path else ""
    fp = _match_row_fp(matches["idx"], matches["mask"])
    P = len(pi)
    rc = artifacts.load_npz_or_none(rcache) if rcache else None
    if rc is not None:
        if rc["tri_points"].shape[1] != matches["idx"].shape[1]:
            log.info("cached relative poses are stale, re-estimating")
            rc = None
    if rc is not None:
        rowmap = {(int(a), int(b), int(f)): r for r, (a, b, f) in
                  enumerate(zip(rc["pi"], rc["pj"], rc["fp"]))}
        hit = np.asarray([rowmap.get((int(a), int(b), int(f)), -1)
                          for a, b, f in zip(pi, pj, fp)], np.int64)
        have = hit >= 0
    else:
        hit = np.full(P, -1, np.int64)
        have = hit >= 0
    K = matches["idx"].shape[1]
    out = {"rel_aa": np.zeros((P, 3), np.float32),
           "rel_t": np.zeros((P, 3), np.float32),
           "n_inliers": np.zeros((P,), np.int32),
           "ok": np.zeros((P,), bool),
           "tri_points": np.zeros((P, K, 3), np.float32),
           "tri_mask": np.zeros((P, K), bool)}
    if have.any():
        for k in out:
            out[k][have] = np.asarray(rc[k])[hit[have]]
    miss = np.nonzero(~have)[0]
    if len(miss):
        if have.any():
            log.info("relative-pose cache: %d/%d rows reused, %d estimated",
                     int(have.sum()), P, len(miss))

        def _save(done_rows):
            # incremental checkpoints, same §5.4 contract as the match
            # cache: only COMPLETED rows are persisted (keyed (i,j,fp)),
            # so a stage timeout mid-phase on a Floor/Campus-sized pair
            # list (61k+ pairs measured at Floor-1593) resumes where it
            # stopped instead of losing the whole most-expensive phase
            os.makedirs(cfg.match_pair_path, exist_ok=True)
            artifacts.save_npz(
                rcache, pi=np.asarray(pi)[done_rows],
                pj=np.asarray(pj)[done_rows], fp=fp[done_rows],
                **{k: v[done_rows] for k, v in out.items()})

        bearings_j = jnp.asarray(bearings)
        done = have.copy()
        save_every = 4096
        for s in range(0, len(miss), save_every):
            part = miss[s:s + save_every]
            rel = sfm_mod.relative_poses(
                bearings_j, jnp.asarray(np.asarray(matches["idx"])[part]),
                jnp.asarray(np.asarray(matches["mask"])[part]),
                np.asarray(pi)[part], np.asarray(pj)[part], scfg,
                keys=np.asarray(part, np.int32))
            for k in out:
                out[k][part] = np.asarray(rel[k])
            done[part] = True
            if rcache and s + save_every < len(miss):
                _save(done)
                log.info("relative-pose cache: checkpoint %d/%d rows",
                         int(done.sum()), P)
        if rcache:
            _save(np.ones(P, bool))
    elif rc is not None:
        log.info("Use existing relative poses in %s", cfg.match_pair_path)
    return {k: jnp.asarray(v) for k, v in out.items()}


def init_camera_pose(cfg: Config, tr: TimeReport | None = None):
    """LiDAR-assisted global SfM (InitCameraPose, main.cpp:91-370)."""
    import jax.numpy as jnp
    from .models import rotation_averaging as ra
    from .models import sfm as sfm_mod
    from .models import translation_averaging as ta
    from .ops import spherical
    from .utils import sift as sift_mod
    from .utils import tracks as trk
    from .utils.depth_completion import compute_depth_image
    from .sensors import velodyne as vd

    tr = tr or TimeReport()
    os.makedirs(cfg.sfm_result_path, exist_ok=True)
    grays, names = load_images(cfg)
    n = len(grays)
    H, W = grays[0].shape

    with tr.phase("extract sift"):
        # frame cache (main.cpp:138-163): reuse cfg.frame_path features when
        # the cached frame count matches; recompute + re-export otherwise
        cap = int(cfg.num_sift)
        if cap > 16384:
            # hard device-memory ceiling: the full descriptor stack
            # (N, cap, 128) f32 is shipped to the device for matching
            log.error("num_sift = %d exceeds the 16384 feature ceiling; "
                      "capping (matching memory scales with N*num_sift*128)",
                      cap)
            cap = 16384
        # host plan for the stage's dominant arrays (utils/membudget):
        # the descriptor stack is the big one at num_sift x N
        from .utils.membudget import assert_host_budget
        assert_host_budget("init_camera_pose", {
            "grays": ((n, H, W), np.float32),
            "desc stack": ((n, cap, 128), np.float32),
            "uv+mask": ((n, cap, 3), np.float32),
            "depth maps": ((n, H, W), np.float32),
        })
        cache = os.path.join(cfg.frame_path, "frames_sift.npz") \
            if cfg.frame_path else ""
        cached = None
        if cache and os.path.exists(cache):
            cached = artifacts.load_npz(cache)
            if len(cached["uv"]) != n or cached["uv"].shape[1] != cap:
                log.info("number of cached frames != images, re-extracting")
                cached = None
            else:
                log.info("Use existing frame data in %s", cfg.frame_path)
        if cached is not None:
            uv, desc, fmask = cached["uv"], cached["desc"], cached["fmask"]
        else:
            import time as _time
            t0 = _time.time()
            sift_mask = load_mask(cfg, H, W)
            if cfg.sift_device:
                # on-device DoG SIFT (config extension; ops/sift_device.py)
                from .ops import sift_device as sd
                mask_j = None if sift_mask is None else jnp.asarray(sift_mask)
                uv, desc, fmask = sd.extract_sift_device_batch(
                    np.stack(grays).astype(np.float32), num_features=cap,
                    root_sift=cfg.root_sift, mask=mask_j)
            else:
                sift_mask = None if sift_mask is None else \
                    (sift_mask.astype(np.uint8) * 255)
                # frame-parallel host pool (the reference's OpenMP loop,
                # sfm/SfM.cpp:23-36 at config num_threads)
                uv, desc, fmask = sift_mod.extract_sift_batch(
                    [(g * 255).astype(np.uint8) for g in grays], cap,
                    root_sift=cfg.root_sift, mask=sift_mask,
                    num_threads=cfg.num_threads)
            t1 = _time.time()
            if cache:
                os.makedirs(cfg.frame_path, exist_ok=True)
                artifacts.save_npz_raw(cache, uv=uv, desc=desc, fmask=fmask)
            log.info("sift: detect %.1f s, cache write %.1f s",
                     t1 - t0, _time.time() - t1)
        bearings = np.asarray(spherical.image_to_cam(jnp.asarray(uv), H, W))

    with tr.phase("compute depth images"):
        from .utils.depth_completion import compute_depth_images
        scans, lidar_valid, _ = load_scans(cfg)
        dcap = _scan_cap(scans)
        pm = [vd.pad_points(pts, dcap) for pts in scans[:n]]
        stack = np.asarray(compute_depth_images(
            jnp.asarray(np.stack([p for p, _ in pm])),
            jnp.asarray(np.stack([m for _, m in pm])),
            jnp.asarray(cfg.T_cl, jnp.float32), H, W,
            max_depth=cfg.max_depth))
        depth_maps = list(stack)
        while len(depth_maps) < n:
            depth_maps.append(np.zeros((H, W), np.float32))
        depth_maps = np.stack(depth_maps)
        # depth visualizations + u16 exports (SfM.cpp:210-221)
        import cv2
        from .utils.visualization import depth_to_color
        viz_dir = os.path.join(cfg.sfm_result_path, "depth_visualize")
        os.makedirs(viz_dir, exist_ok=True)
        for i in range(n):
            color = depth_to_color(depth_maps[i], cfg.max_depth_visual)
            blend = (0.5 * color + 0.5 * (grays[i][..., None] * 255)) \
                .astype(np.uint8)
            cv2.imwrite(os.path.join(viz_dir, f"depth_{i}.jpg"), blend)
            if cfg.depth_path:
                os.makedirs(cfg.depth_path, exist_ok=True)
                artifacts.export_depth_u16(
                    os.path.join(cfg.depth_path, f"{i}.npy"), depth_maps[i])

    scfg = _sfm_config(cfg, cap)
    with tr.phase("match pairs"):
        # FrameMatchMethod bitmask (sfm/SfM.h:56-63; main.cpp:202 uses
        # VLAD|CONTIGUOUS). VLAD embeddings come from the SIFT descriptors
        # already on device; GPS positions from cfg.gps_path when present.
        fm = cfg.frame_match_method
        embeddings = None
        if fm & (sfm_mod.MATCH_VLAD | sfm_mod.MATCH_GPS_VLAD) and n > 2:
            from .models import vlad
            _, _, embeddings = vlad.vlad_pairs(
                jnp.asarray(desc), jnp.asarray(fmask),
                n_centers=min(64, cap))
        gps_xyz = None
        if fm & (sfm_mod.MATCH_GPS | sfm_mod.MATCH_GPS_VLAD) and \
                cfg.gps_path and os.path.exists(cfg.gps_path):
            from .utils.gps import read_gps
            gps_xyz, _ = read_gps(cfg.gps_path)
            if len(gps_xyz) != n:
                log.error("GPS count %d != frames %d; skipping GPS pairs",
                          len(gps_xyz), n)
                gps_xyz = None
        pi, pj = sfm_mod.init_image_pairs(n, scfg, embeddings=embeddings,
                                          gps_xyz=gps_xyz, methods=fm)
        pi, pj, matches = _match_pairs_cached(cfg, scfg, cap, desc, fmask,
                                              pi, pj)
        with open(os.path.join(cfg.sfm_result_path,
                               "after_sift_match.txt"), "w") as f:
            for k in range(len(pi)):
                if bool(np.asarray(matches["pair_ok"])[k]):
                    f.write(f"{int(pi[k])} {int(pj[k])}\n")
    with tr.phase("relative poses"):
        rel = _relative_poses_cached(cfg, scfg, bearings, matches, pi, pj)
        ok = np.asarray(rel["ok"]) & np.asarray(matches["pair_ok"])
        # match_pair.txt (ExportMatchPairTXT, SfM.cpp:1568-1584)
        R21 = np.asarray(rel["rel_aa"])
        from scipy.spatial.transform import Rotation as _ScR
        Rm = _ScR.from_rotvec(R21).as_matrix()
        t21 = np.asarray(rel["rel_t"])
        with open(os.path.join(cfg.sfm_result_path, "match_pair.txt"),
                  "w") as f:
            for k in range(len(pi)):
                if not ok[k]:
                    continue
                f.write(f"{int(pi[k])} {int(pj[k])}\n")
                f.write(" ".join(
                    f"{Rm[k][r, c]:.9g}" if c < 3 else f"{t21[k][r]:.9g}"
                    for r in range(3) for c in range(4)) + "\n")
                f.write(f"points with depth: "
                        f"{int(np.asarray(rel['n_inliers'])[k])}\n")
    with tr.phase("translation scale from depth"):
        scales = sfm_mod.translation_scale_from_depth(
            depth_maps, H, W, rel, np.asarray(matches["idx"]), uv, pi, scfg)
    with tr.phase("graph filters"):
        has_scale = np.asarray(scales) >= 0
        if not cfg.keep_pairs_no_scale:
            # FilterImagePairs(keep_no_scale=false): drop undetermined-scale
            # pairs before the graph filters (SfM.cpp:451-452)
            ok = ok & has_scale
        keep = sfm_mod.filter_by_triplet(pi, pj, np.asarray(rel["rel_aa"]), ok)
        keep, frame_valid = sfm_mod.largest_biconnected(pi, pj, keep, n)
    with tr.phase("rotation averaging"):
        # use_all_pairs_ra=false: rotation averaging over with-scale pairs
        # only (SfM.cpp:820-831)
        ra_keep = keep if cfg.use_all_pairs_ra else (keep & has_scale)
        # RotationAveragingMethod enum (sfm/SfM.h:65-68): 1 L1, 2 L2
        aa_glob, valid_r, _ = ra.rotation_averaging(
            n, pi[ra_keep], pj[ra_keep], np.asarray(rel["rel_aa"])[ra_keep],
            weights=np.asarray(rel["n_inliers"])[ra_keep],
            method=cfg.rotation_averaging_method)
        # rotation snapshot (RotationAveraging.cpp:399-405)
        from .ops import se3
        artifacts.export_pose_t(
            os.path.join(cfg.sfm_result_path, "rotations_after_L1.txt"),
            np.asarray(se3.exp_so3(jnp.asarray(aa_glob))),
            np.zeros((n, 3)), names)
    with tr.phase("translation averaging"):
        # reference enum (sfm/SfM.h:70-77): 1 SOFTL1, 2 L1, 3 CHORDAL,
        # 4 L2IRLS, 5 BATA, 6 LUD
        ta_method = {1: "softl1", 2: "l1", 3: "chordal", 4: "l2irls",
                     5: "bata", 6: "lud"}.get(cfg.translation_averaging_method,
                                              "softl1")
        # use_all_pairs_ta=false: only with-scale pairs constrain the
        # global translation (SfM.cpp:1090-1110)
        ta_keep = keep if cfg.use_all_pairs_ta else (keep & has_scale)
        # GPS hooks (SfM.cpp:1051-1052, 1218-1240): pair scales from GPS
        # distances; optional GPS translation init replacing DLT
        pair_scales = scales[ta_keep]
        t_init = None
        if cfg.gps_path and os.path.exists(cfg.gps_path):
            from .utils.gps import init_translation_gps, read_gps, \
                scale_from_gps
            g_xyz, _ = read_gps(cfg.gps_path)
            if len(g_xyz) == n and np.isfinite(g_xyz).all():
                pair_scales = scale_from_gps(g_xyz, pi[ta_keep], pj[ta_keep])
                if cfg.init_translation_GPS and not cfg.init_translation_DLT:
                    t_init = init_translation_gps(g_xyz, aa_glob)
        t_glob, s = ta.translation_averaging(
            aa_glob, pi[ta_keep], pj[ta_keep],
            np.asarray(rel["rel_aa"])[ta_keep],
            np.asarray(rel["rel_t"])[ta_keep], pair_scales,
            method=ta_method, upper_scale_ratio=cfg.upper_scale_ratio,
            lower_scale_ratio=cfg.lower_scale_ratio, t_init=t_init,
            irls_iters=cfg.num_iteration_L2IRLS)
    with tr.phase("structure + BA"):
        # pre-BA pose snapshot (main.cpp:259-262: camera_pose_beforeBA.txt +
        # .ply + camera_center_beforeBA.pcd right after translation
        # averaging) — the observability surface for debugging scale issues
        # between TA and the BA rounds
        from .utils import visualization as viz
        poses_ta = np.concatenate([aa_glob, t_glob], axis=1).astype(np.float32)
        R_ta, t_ta = pose_util.params_to_world(poses_ta)
        R_ta[~frame_valid] = np.eye(3)
        t_ta[~frame_valid] = np.inf
        artifacts.export_pose_t(
            os.path.join(cfg.sfm_result_path, "camera_pose_beforeBA.txt"),
            R_ta, t_ta, names)
        viz.camera_pose_ply(
            os.path.join(cfg.sfm_result_path, "camera_pose_beforeBA.ply"),
            poses_ta, frame_valid)
        viz.camera_centers_pcd(
            os.path.join(cfg.sfm_result_path, "camera_center_beforeBA.pcd"),
            poses_ta, frame_valid)
        pair_matches = []
        midx = np.asarray(matches["idx"])
        mmask = np.asarray(matches["mask"])
        for k in np.where(keep)[0]:
            pair_matches.append((int(pi[k]), int(pj[k]), midx[k][mmask[k]]))
        timg, tfeat, tmask = trk.build_tracks(pair_matches, [cap] * n,
                                              min_length=scfg.min_track_length)
        poses0 = np.concatenate([aa_glob, t_glob], axis=1).astype(np.float32)
        X, x_ok = sfm_mod.estimate_structure(poses0, bearings, timg, tfeat,
                                             tmask, scfg)
        poses_ba, pts_ba, info = sfm_mod.global_ba(
            poses0, np.asarray(X), timg, tfeat, tmask, bearings,
            np.asarray(x_ok), frame_valid, scfg)
        # first-refinement snapshot (main.cpp:291: camera_pose_refine.txt —
        # the reference's own export sits in an `#if 0` BA-1 block, so this
        # file is the live analog written after our first BA round)
        R_rf, t_rf = pose_util.params_to_world(poses_ba)
        R_rf[~frame_valid] = np.eye(3)
        t_rf[~frame_valid] = np.inf
        artifacts.export_pose_t(
            os.path.join(cfg.sfm_result_path, "camera_pose_refine.txt"),
            R_rf, t_rf, names)
        # filter at 40 px, re-BA, then filter at 10 px (main.cpp:299-300 runs
        # GlobalBundleAdjustment(PIXEL_RESIDUAL, 40) then (PIXEL_RESIDUAL, 10),
        # each followed by FilterTracksPixelResidual, SfM.cpp:1362-1383)
        x_ok = np.asarray(sfm_mod.filter_tracks_pixel_residual(
            poses_ba, pts_ba, timg, tfeat, tmask, uv, np.asarray(x_ok),
            40.0, H, W))
        poses_ba, pts_ba, info = sfm_mod.global_ba(
            poses_ba, pts_ba, timg, tfeat, tmask, bearings,
            x_ok, frame_valid, scfg)
        x_ok = np.asarray(sfm_mod.filter_tracks_pixel_residual(
            poses_ba, pts_ba, timg, tfeat, tmask, uv, x_ok, 10.0, H, W))
        poses_fin = sfm_mod.set_to_origin(poses_ba, frame_valid)

    with tr.phase("export"):
        R_wc, t_wc = pose_util.params_to_world(poses_fin)
        R_wc[~frame_valid] = np.eye(3)
        t_wc[~frame_valid] = np.inf
        artifacts.export_pose_t(
            os.path.join(cfg.sfm_result_path, "camera_pose_final.txt"),
            R_wc, t_wc, names)
        n_l = len(scans)
        R_wl, t_wl, l_ok = pose_util.set_lidar_pose(
            R_wc, t_wc, frame_valid, cfg.T_cl, n_l,
            cfg.data_gap_time or 0.1, cfg.time_offset)
        artifacts.export_pose_t(
            os.path.join(cfg.sfm_result_path, "lidar_pose.txt"), R_wl, t_wl)
        artifacts.export_point_tracks(
            os.path.join(cfg.sfm_result_path, "points.npz"),
            timg, tfeat, tmask, pts_ba, np.asarray(x_ok))
        artifacts.save_npz(os.path.join(cfg.sfm_result_path, "frames.npz"),
                           uv=uv, fmask=fmask, bearings=bearings,
                           poses=poses_fin, frame_valid=frame_valid,
                           rows=np.asarray([H]), cols=np.asarray([W]))
        # pose visualizations + colorized structure (main.cpp:301-312)
        from .utils import visualization as viz
        viz.camera_centers_pcd(
            os.path.join(cfg.sfm_result_path, "camera_center_final.pcd"),
            poses_fin, frame_valid)
        viz.camera_pose_ply(
            os.path.join(cfg.sfm_result_path, "camera_pose_final.ply"),
            poses_fin, frame_valid)
        ok_pts = np.asarray(x_ok)
        if cfg.colorize_structure and ok_pts.any():
            from .models import texture
            import jax.numpy as _jnp
            col, cok = texture.colorize_points(
                _jnp.asarray(pts_ba), _jnp.asarray(ok_pts),
                _jnp.asarray(grays[0]), _jnp.asarray(poses_fin[0]))
            keep = ok_pts & np.asarray(cok)
            pointcloud.write_pcd(
                os.path.join(cfg.sfm_result_path, "structure.pcd"),
                pts_ba[keep], intensity=np.asarray(col)[keep, 0])
        else:
            pointcloud.write_pcd(
                os.path.join(cfg.sfm_result_path, "structure.pcd"),
                pts_ba[ok_pts])
    return poses_fin, frame_valid


def init_lidar_pose(cfg: Config, tr: TimeReport | None = None):
    """LiDAR odometry + undistortion (InitLidarPose, main.cpp:372-452)."""
    import jax.numpy as jnp
    from .models import lidar_odometry
    from .sensors import velodyne as vd

    tr = tr or TimeReport()
    os.makedirs(cfg.odo_result_path, exist_ok=True)
    scans, valid, names = load_scans(cfg)
    with tr.phase("load sfm-seeded lidar poses"):
        R_wl, t_wl, _, pose_ok = artifacts.read_pose_t(
            os.path.join(cfg.sfm_result_path, "lidar_pose.txt"))
        valid = valid & pose_ok[:len(valid)]
        poses0 = pose_util.world_to_params(
            np.where(pose_ok[:, None, None], R_wl, np.eye(3)),
            np.where(pose_ok[:, None], t_wl, 0.0))
    with tr.phase("extract features"):
        batch = extract_all_features(scans, cap=_scan_cap(scans), cfg=cfg)
    with tr.phase("estimate poses"):
        ocfg = lidar_odometry.OdometryConfig(
            num_iteration_lidar=cfg.num_iteration_lidar,
            angle_residual=cfg.angle_residual,
            normalize_distance=cfg.normalize_distance,
            point_to_line=cfg.point_to_line_residual,
            line_to_line=cfg.line_to_line_residual,
            point_to_plane=cfg.point_to_plane_residual)
        poses, infos = lidar_odometry.estimate_poses(batch, poses0, valid, ocfg,
                                                     mesh=_data_mesh())
    with tr.phase("export"):
        from .utils import visualization as viz
        R, t = pose_util.params_to_world(np.asarray(poses))
        artifacts.export_pose_t(
            os.path.join(cfg.odo_result_path, "lidar_pose_refined.txt"),
            R, t, names)
        viz.camera_centers_pcd(
            os.path.join(cfg.odo_result_path, "lidar_center_refined.pcd"),
            np.asarray(poses), valid)
        viz.camera_pose_ply(
            os.path.join(cfg.odo_result_path, "lidar_pose_refined.ply"),
            np.asarray(poses), valid)

    # undistort with the solved poses, re-estimate, export the undistorted
    # clouds + poses (main.cpp:414-448, max_iter = 1)
    if cfg.lidar_path_undistort:
        with tr.phase("undistort + re-estimate"):
            poses, valid = _undistort_round(cfg, tr, scans, valid, names,
                                            np.asarray(poses))
    return np.asarray(poses), valid


def _undistort_round(cfg: Config, tr: TimeReport, scans, valid, names, poses):
    """One undistort->re-estimate round (main.cpp:414-448 with max_iter=1):
    slerp each point's pose between its scan's and the next valid scan's
    (LidarOdometry::UndistortLidars, lidar_mapping/LidarOdometry.cpp:189-263),
    write the undistorted clouds to cfg.lidar_path_undistort (original z-up
    frame, intensity = sweep time like ColorizeCloudByTime), then rerun the
    odometry on them."""
    import jax.numpy as jnp
    from .models import lidar_odometry
    from .sensors import velodyne as vd
    from .utils import visualization as viz

    import jax

    os.makedirs(cfg.lidar_path_undistort, exist_ok=True)
    n = len(scans)
    valid_ids = [i for i in range(n) if valid[i]]
    CAP = _scan_cap(scans)

    # Chunk table: raw scan lengths vary, so every scan is split into
    # fixed-CAP padded chunks (oversized 32+ beam scans get several; no
    # points are dropped — reference UndistortLidars processes every point,
    # LidarOdometry.cpp:189-263). All chunks of all scans are stacked and
    # the whole round runs as THREE vmapped device programs (start oris,
    # sweep fractions, undistort) instead of 3 dispatch+sync round-trips
    # per scan.
    chunk_pts, chunk_msk, chunk_scan, chunk_len = [], [], [], []
    for i, pts in enumerate(scans):
        for c0 in range(0, max(len(pts), 1), CAP):
            pc = pts[c0:c0 + CAP]
            pp, mm = vd.pad_points(pc, CAP)
            chunk_pts.append(pp)
            chunk_msk.append(mm)
            chunk_scan.append(i)
            chunk_len.append(len(pc))
    T = len(chunk_pts)
    bucket = 32  # pad the chunk axis so one program shape serves any dataset
    T_pad = ((T + bucket - 1) // bucket) * bucket
    chunk_pts += [chunk_pts[-1]] * (T_pad - T)
    chunk_msk += [chunk_msk[-1]] * (T_pad - T)
    chunk_scan_np = np.asarray(chunk_scan + [chunk_scan[-1]] * (T_pad - T))
    pts_b = jnp.asarray(np.stack(chunk_pts))
    msk_b = jnp.asarray(np.stack(chunk_msk))

    # per-chunk azimuth origin, overridden by the scan's FIRST chunk's
    # (chunking must not reset the sweep origin)
    oris = np.asarray(jax.jit(jax.vmap(vd.scan_start_ori))(pts_b, msk_b))
    first_chunk = {}
    for t in range(T - 1, -1, -1):
        first_chunk[chunk_scan[t]] = t
    start = oris[[first_chunk[i] for i in chunk_scan_np]]
    frac_b = np.asarray(jax.jit(jax.vmap(vd.sweep_fraction_from))(
        pts_b, jnp.asarray(start)))

    # host: per-scan interpolation target + sweep scale. The next valid
    # scan's pose; the last scan extrapolates backwards assuming constant
    # relative motion (LidarOdometry.cpp:210-236). A gap of (j - i) scans
    # scales the sweep: the scan-end pose sits at alpha = duration /
    # ((j-i)*(duration+gap)) along the geodesic toward pose_j, so scaling
    # frac by alpha is equivalent (slerp is a geodesic).
    duration = 0.1
    alphas = np.zeros(n, np.float32)
    pose_next = np.array(poses, np.float32, copy=True)
    for i in range(n):
        if not (valid[i] and len(valid_ids) > 1):
            continue  # alpha 0 -> undistort is the identity
        later = [j for j in valid_ids if j > i]
        if later:
            j = later[0]
            pose_next[i] = poses[j]
            alphas[i] = duration / ((j - i) * (duration + cfg.data_gap_time))
        else:
            prev = [j for j in valid_ids if j < i][-1]
            p_prev, p_i = poses[prev], poses[i]
            pose_next[i] = p_i + (p_i - p_prev) / (i - prev)
            alphas[i] = duration / (duration + cfg.data_gap_time)

    und_b = np.asarray(jax.jit(jax.vmap(lidar_odometry.undistort_scan))(
        pts_b, jnp.asarray(frac_b * alphas[chunk_scan_np][:, None]),
        jnp.asarray(poses[chunk_scan_np]),
        jnp.asarray(pose_next[chunk_scan_np])))

    # host: reassemble per scan, export (z-up sensor frame, intensity =
    # sweep time like ColorizeCloudByTime)
    undist = []
    for i, pts in enumerate(scans):
        rows = [t for t in range(T) if chunk_scan[t] == i]
        p = (np.concatenate([und_b[t][:chunk_len[t]] for t in rows])
             if len(pts) else pts)
        frac = (np.concatenate([frac_b[t][:chunk_len[t]] for t in rows])
                if len(pts) else np.zeros((0,), np.float32))
        undist.append(p.astype(np.float32))
        raw = p @ vd.AXIS_SWAP  # back to the sensor's z-up frame (S^-1 = S^T)
        pointcloud.write_pcd(os.path.join(cfg.lidar_path_undistort, names[i]),
                             raw if len(raw) else np.zeros((1, 3), np.float32),
                             intensity=frac if len(raw) else
                             np.zeros(1, np.float32), binary=True)

    batch = extract_all_features(undist, cap=_scan_cap(undist), cfg=cfg)
    ocfg = lidar_odometry.OdometryConfig(
        num_iteration_lidar=cfg.num_iteration_lidar,
        angle_residual=cfg.angle_residual,
        normalize_distance=cfg.normalize_distance,
        point_to_line=cfg.point_to_line_residual,
        line_to_line=cfg.line_to_line_residual,
        point_to_plane=cfg.point_to_plane_residual)
    poses2, _ = lidar_odometry.estimate_poses(batch, poses, valid, ocfg,
                                              mesh=_data_mesh())
    R, t = pose_util.params_to_world(np.asarray(poses2))
    artifacts.export_pose_t(
        os.path.join(cfg.odo_result_path, "lidar_pose_undis_refined.txt"),
        R, t, names)
    viz.camera_centers_pcd(
        os.path.join(cfg.odo_result_path, "lidar_center_undis_refined.pcd"),
        np.asarray(poses2), valid)
    return np.asarray(poses2), valid


def joint_optimization(cfg: Config, tr: TimeReport | None = None):
    """Camera-LiDAR joint refinement (JointOptimization, main.cpp:454-522)."""
    import jax.numpy as jnp
    from .models import camera_lidar as cl
    from .utils import panorama_line as pl

    tr = tr or TimeReport()
    os.makedirs(cfg.joint_result_path, exist_ok=True)
    grays, names = load_images(cfg)
    n = len(grays)
    frames = artifacts.load_npz(os.path.join(cfg.sfm_result_path, "frames.npz"))
    tracks = artifacts.read_point_tracks(
        os.path.join(cfg.sfm_result_path, "points.npz"))
    # prefer the undistortion round's output — clouds AND poses together
    # (main.cpp:469-472: LoadLidarPose tries lidar_pose_undis_refined.txt
    # first, whose names point into lidar_path_undistort; falls back to the
    # raw clouds + lidar_pose_refined.txt)
    undis_pose = os.path.join(cfg.odo_result_path,
                              "lidar_pose_undis_refined.txt")
    use_undis = (os.path.exists(undis_pose) and cfg.lidar_path_undistort
                 and os.path.isdir(cfg.lidar_path_undistort)
                 and _list_files(cfg.lidar_path_undistort, ("pcd", "ply")))
    scans, lidar_valid, lidar_names = load_scans(
        cfg, path=cfg.lidar_path_undistort if use_undis else None)
    with tr.phase("extract image lines"):
        line_mask = load_mask(cfg, *grays[0].shape[:2])
        arc_batch = {k: jnp.asarray(v) for k, v in
                     pl.extract_panorama_lines_batch(
                         grays, mask=line_mask,
                         num_threads=cfg.num_threads).items()}
    with tr.phase("extract lidar features"):
        lidar_batch = extract_all_features(scans, cap=_scan_cap(scans), cfg=cfg)
    with tr.phase("load poses"):
        odo = undis_pose if use_undis else os.path.join(
            cfg.odo_result_path, "lidar_pose_refined.txt")
        R_wl, t_wl, _, pose_ok = artifacts.read_pose_t(odo)
        lidar_poses0 = pose_util.world_to_params(
            np.where(pose_ok[:, None, None], R_wl, np.eye(3)),
            np.where(pose_ok[:, None], t_wl, 0.0))
        cam_poses0 = frames["poses"]
    with tr.phase("joint optimize"):
        jcfg = cl.JointConfig(
            num_iteration_joint=cfg.num_iteration_joint,
            neighbor_size_joint=cfg.neighbor_size_joint,
            camera_weight=cfg.camera_weight,
            lidar_weight=cfg.lidar_weight,
            camera_lidar_weight=cfg.camera_lidar_weight,
            angle_residual=cfg.angle_residual,
            normalize_distance=cfg.normalize_distance,
            use_image_track=cfg.use_image_track,
            use_lidar_track=cfg.use_lidar_track,
            use_track_associate=cfg.use_track_associate,
            min_track_length=cfg.min_track_length)
        # baseline-ratio structure filter (EstimateStructure ->
        # FilterTracksToFar(8), CameraLidarOptimizer.cpp:720-729)
        from .models import sfm as sfm_mod
        point_ok = np.asarray(sfm_mod.filter_tracks_too_far(
            cam_poses0, tracks["track_img"], tracks["track_mask"],
            tracks["points"], tracks["point_ok"], 8.0))
        cam_poses, lidar_poses, points, infos = cl.joint_optimize(
            arc_batch, lidar_batch, cam_poses0, lidar_poses0,
            tracks["track_img"], tracks["track_feat"], tracks["track_mask"],
            frames["bearings"], tracks["points"], point_ok, jcfg,
            lidar_valid=lidar_valid & pose_ok[:len(lidar_valid)],
            grays=grays, mesh=_data_mesh())
    with tr.phase("export"):
        R_c, t_c = pose_util.params_to_world(np.asarray(cam_poses))
        artifacts.export_pose_t(
            os.path.join(cfg.joint_result_path, "camera_pose_joint.txt"),
            R_c, t_c, names)
        R_l, t_l = pose_util.params_to_world(np.asarray(lidar_poses))
        artifacts.export_pose_t(
            os.path.join(cfg.joint_result_path, "lidar_pose_joint.txt"),
            R_l, t_l, lidar_names)
        artifacts.export_point_tracks(
            os.path.join(cfg.joint_result_path, "points.npz"),
            tracks["track_img"], tracks["track_feat"], tracks["track_mask"],
            np.asarray(points), point_ok)
        # per-run center/pose visualizations (JointOptimize loop,
        # CameraLidarOptimizer.cpp:265-270)
        from .utils import visualization as viz
        viz.camera_centers_pcd(
            os.path.join(cfg.joint_result_path, "camera_center_joint.pcd"),
            np.asarray(cam_poses))
        viz.camera_centers_pcd(
            os.path.join(cfg.joint_result_path, "lidar_center_joint.pcd"),
            np.asarray(lidar_poses))
        viz.camera_pose_ply(
            os.path.join(cfg.joint_result_path, "camera_pose_joint.ply"),
            np.asarray(cam_poses))
        viz.camera_pose_ply(
            os.path.join(cfg.joint_result_path, "lidar_pose_joint.ply"),
            np.asarray(lidar_poses))
    return np.asarray(cam_poses), np.asarray(lidar_poses)


def colorize_lidar_map(cfg: Config, tr: TimeReport | None = None):
    """ColorizeLidarMap (main.cpp:524-551)."""
    import jax.numpy as jnp
    from .models import texture
    from .sensors import velodyne as vd

    tr = tr or TimeReport()
    os.makedirs(cfg.texture_result_path, exist_ok=True)
    grays, _ = load_images(cfg, color=True)   # reference samples RGB
    # joint poses correspond to the undistorted clouds when the
    # undistort round ran (main.cpp:432-434 name replacement)
    scans, valid, _ = load_scans(cfg, path=cfg.lidar_path_undistort)
    R_l, t_l, _, l_ok = artifacts.read_pose_t(
        os.path.join(cfg.joint_result_path, "lidar_pose_joint.txt"))
    R_c, t_c, _, c_ok = artifacts.read_pose_t(
        os.path.join(cfg.joint_result_path, "camera_pose_joint.txt"))
    lidar_params = pose_util.world_to_params(R_l, t_l)
    cam_params = pose_util.world_to_params(R_c, t_c)
    cap = _scan_cap(scans)
    pts = np.zeros((len(scans), cap, 3), np.float32)
    msk = np.zeros((len(scans), cap), bool)
    for i, s in enumerate(scans):
        p, m = vd.pad_points(s, cap)
        pts[i], msk[i] = p, m & valid[i] & l_ok[i]
    with tr.phase("colorize"):
        pw, col, ok = texture.colorize_lidar_map(
            pts, msk, lidar_params, np.stack(grays), cam_params)
        fused, fmask, fcol = texture.fuse_cloud(pw, col, ok)
    with tr.phase("export"):
        f = np.asarray(fmask)
        rgb = np.clip(np.asarray(fcol)[f] * 255, 0, 255)
        pointcloud.write_pcd(
            os.path.join(cfg.texture_result_path, "colorized_map.pcd"),
            np.asarray(fused)[f],
            rgb=rgb if rgb.shape[1] == 3 else None,
            intensity=None if rgb.shape[1] == 3 else rgb[:, 0] / 255)
    return np.asarray(fused), np.asarray(fmask)


def joint_mvs(cfg: Config, tr: TimeReport | None = None):
    """Panoramic PatchMatch MVS (JointMVS, main.cpp:553-678)."""
    import jax
    import jax.numpy as jnp
    from .models import mvs as mvs_mod
    from .ops import spherical
    from .utils.depth_completion import compute_depth_image
    from .sensors import velodyne as vd

    tr = tr or TimeReport()
    for d in (cfg.mvs_result_path, cfg.mvs_depth_path, cfg.mvs_normal_path,
              cfg.mvs_conf_path):
        os.makedirs(d, exist_ok=True)
    grays, names = load_images(cfg)
    n = len(grays)
    H, W = grays[0].shape
    # host plan for the stage's dominant arrays (utils/membudget): images +
    # per-frame depth/normal/conf stacks + the filter in/out pairs. The
    # first profile-454 run discovered its 82.6 GB peak at hour two; this
    # fails in seconds instead.
    from .utils.membudget import assert_host_budget
    assert_host_budget("joint_mvs", {
        "grays": ((n, H, W), np.float32),
        "depths+confs": ((2, n, H, W), np.float32),
        "normals": ((n, H, W, 3), np.float32),
        "filtered d+c": ((2, n, H, W), np.float32),
        "colors (fuse)": ((n, H, W), np.float32),
        "packed stacks (host staging)": ((2, n, H, W), np.uint32),
    })
    R_c, t_c, _, c_ok = artifacts.read_pose_t(
        os.path.join(cfg.joint_result_path, "camera_pose_joint.txt"))
    poses = pose_util.world_to_params(R_c, t_c)

    with tr.phase("refine camera pose"):
        # MVS::RefineCameraPose (mvs/MVS.cpp:383-428): preserve each frame's
        # T_cl, rerun global BA with PIXEL residuals at the working image
        # resolution, then move the lidar poses rigidly with their frames.
        frames_npz = os.path.join(cfg.sfm_result_path, "frames.npz")
        points_npz = os.path.join(cfg.sfm_result_path, "points.npz")
        joint_lidar = os.path.join(cfg.joint_result_path,
                                   "lidar_pose_joint.txt")
        refine_txt = os.path.join(cfg.mvs_result_path,
                                  "camera_pose_after_refine.txt")
        R_l = t_l = l_ok = None
        if os.path.exists(refine_txt):
            # stage-internal resume (same contract as the cross-stage result
            # files, SURVEY.md §5.4): a prior run already refined the poses;
            # re-derive the rigid lidar move from the SAVED refine result
            R_c2, t_c2, _, c_ok2 = artifacts.read_pose_t(refine_txt)
            if os.path.exists(joint_lidar):
                R_l, t_l, _, l_ok = artifacts.read_pose_t(joint_lidar)
                for i in range(min(len(R_l), n)):
                    T_wc = np.eye(4)
                    T_wc[:3, :3], T_wc[:3, 3] = R_c[i], t_c[i]
                    T_wl = np.eye(4)
                    T_wl[:3, :3], T_wl[:3, 3] = R_l[i], t_l[i]
                    T_wc2 = np.eye(4)
                    T_wc2[:3, :3], T_wc2[:3, 3] = R_c2[i], t_c2[i]
                    T_wl2 = T_wc2 @ np.linalg.inv(T_wc) @ T_wl
                    R_l[i], t_l[i] = T_wl2[:3, :3], T_wl2[:3, 3]
            R_c, t_c = R_c2, t_c2
            poses = pose_util.world_to_params(R_c, t_c)
        elif os.path.exists(frames_npz) and os.path.exists(points_npz):
            from .models import sfm as sfm_mod
            frames = artifacts.load_npz(frames_npz)
            tracks = artifacts.read_point_tracks(points_npz)
            if os.path.exists(joint_lidar):
                R_l, t_l, _, l_ok = artifacts.read_pose_t(joint_lidar)
                n_cl = min(len(R_l), n)
                T_cl_list = np.tile(np.eye(4), (len(R_l), 1, 1))
                for i in range(n_cl):
                    T_wc = np.eye(4)
                    T_wc[:3, :3], T_wc[:3, 3] = R_c[i], t_c[i]
                    T_wl = np.eye(4)
                    T_wl[:3, :3], T_wl[:3, 3] = R_l[i], t_l[i]
                    T_cl_list[i] = np.linalg.inv(T_wc) @ T_wl
            poses, pts_ba, _ = sfm_mod.global_ba(
                poses, tracks["points"], tracks["track_img"],
                tracks["track_feat"], tracks["track_mask"],
                frames["bearings"], tracks["point_ok"], c_ok,
                sfm_mod.SfMConfig(), residual="pixel", uv=frames["uv"],
                rows=H, cols=W)
            R_c, t_c = pose_util.params_to_world(poses)
            if R_l is not None:
                for i in range(n_cl):
                    T_wc = np.eye(4)
                    T_wc[:3, :3], T_wc[:3, 3] = R_c[i], t_c[i]
                    T_wl = T_wc @ T_cl_list[i]
                    R_l[i], t_l[i] = T_wl[:3, :3], T_wl[:3, 3]
            artifacts.export_pose_t(
                os.path.join(cfg.mvs_result_path,
                             "camera_pose_after_refine.txt"),
                R_c, t_c, names)

    mcfg = mvs_mod.MVSConfig(
        pm=mvs_mod.PatchMatchConfig(
            ncc_half_window=cfg.ncc_half_window, ncc_step=cfg.ncc_step,
            min_depth=cfg.min_depth, max_depth=cfg.max_depth,
            sweep_slices=cfg.mvs_sweep_slices),
        n_iterations=cfg.mvs_num_iterations,
        propagate=cfg.propagate_strategy,
        keep_lidar_constant=cfg.keep_lidar_constant,
        mvs_use_geometric=cfg.mvs_use_geometric,
        depth_diff_threshold=cfg.depth_diff_threshold,
        min_segment=cfg.min_segment)
    rays = spherical.pixel_ray_grid(H, W)
    nei_table = mvs_mod.select_neighbor_views(poses, mcfg.n_neighbors, c_ok)
    if cfg.mvs_neighbor_selection == 1:  # SFM_POINTS (MVS.h:34)
        points_npz = os.path.join(cfg.sfm_result_path, "points.npz")
        if os.path.exists(points_npz):
            tr_pts = artifacts.read_point_tracks(points_npz)
            sfm_table = mvs_mod.select_neighbor_sfm(
                poses, tr_pts["points"], tr_pts["track_img"],
                tr_pts["track_mask"], mcfg.n_neighbors)
            # rows short on co-visibility fall back to their KNN picks
            nei_table = np.where(sfm_table >= 0, sfm_table, nei_table)
        else:
            log.warning("SFM_POINTS neighbor selection requested but %s "
                        "missing; using KNN", points_npz)

    # pass-level resume: if every frame already has final-pass depth+conf
    # artifacts (u16, the same quantization the stage exports and the
    # reference stores on disk), skip LiDAR init + both PatchMatch passes
    # and go straight to filter/fuse — rescues a Room-scale run that died
    # downstream of the ~20-min depth computation
    pass_suffix = "geo" if cfg.mvs_use_geometric else "pho"
    resume_pass = n > 0 and all(
        os.path.exists(os.path.join(cfg.mvs_depth_path,
                                    f"{i:06d}_{pass_suffix}.npy"))
        and os.path.exists(os.path.join(cfg.mvs_conf_path,
                                        f"{i:06d}_{pass_suffix}.npy"))
        for i in range(n))
    if resume_pass:
        log.info("MVS resume: all %d _%s depth/conf artifacts present; "
                 "skipping PatchMatch passes", n, pass_suffix)

    with tr.phase("lidar depth init"):
        lidar_depths = []
        if resume_pass:
            lidar_depths = [None] * n
        elif cfg.mvs_use_lidar:
            scans, _, _ = load_scans(cfg, path=cfg.lidar_path_undistort)
            if R_l is None:  # no refine round: read the joint lidar poses
                R_l, t_l, _, l_ok = artifacts.read_pose_t(
                    os.path.join(cfg.joint_result_path,
                                 "lidar_pose_joint.txt"))
            from .utils.depth_completion import compute_depth_images
            scap = _scan_cap(scans)
            pms, Ts = [], []
            for i in range(n):
                # Frame i <-> scan i, the reference's own mapping: its MVS
                # LiDAR depth init reads lidars[ref_id] with the per-frame
                # T_cl = frame.pose^-1 * lidar.pose (mvs/MVS.cpp:502-512),
                # and the SfM depth stage hard-errors when counts diverge
                # (sfm/SfM.cpp:174-178). We clamp instead of erroring so a
                # trailing frame without a scan still gets an init.
                j = min(i, len(scans) - 1)
                pms.append(vd.pad_points(scans[j], scap))
                T_wl = np.eye(4)
                T_wl[:3, :3], T_wl[:3, 3] = R_l[j], t_l[j]
                T_wc = np.eye(4)
                T_wc[:3, :3], T_wc[:3, 3] = R_c[i], t_c[i]
                Ts.append(np.linalg.inv(T_wc) @ T_wl)
            lidar_depths = list(np.asarray(compute_depth_images(
                jnp.asarray(np.stack([p for p, _ in pms])),
                jnp.asarray(np.stack([m for _, m in pms])),
                jnp.asarray(np.stack(Ts), jnp.float32), H, W,
                max_depth=cfg.max_depth)))
        else:
            lidar_depths = [None] * n

    if cfg.mvs_fit_sweep_range and mcfg.pm.sweep_slices \
            and lidar_depths[0] is not None:
        # one global fit (per-frame ranges would recompile per frame);
        # subsampled — the percentiles don't need every texel
        samples = np.stack([d[::4, ::4] for d in lidar_depths])
        pm_fit = mvs_mod.fit_sweep_range(mcfg.pm, samples)
        if pm_fit is not mcfg.pm:
            log.info("sweep range fit: [%.2f, %.2f] m -> [%.2f, %.2f] m, "
                     "%d -> %d slices", mcfg.pm.min_depth, mcfg.pm.max_depth,
                     pm_fit.min_depth, pm_fit.max_depth,
                     mcfg.pm.sweep_slices, pm_fit.sweep_slices)
            mcfg = mcfg._replace(pm=pm_fit)

    depths = np.zeros((n, H, W), np.float32)
    normals = np.zeros((n, H, W, 3), np.float32)
    confs = np.zeros((n, H, W), np.float32)
    # Batched MVS execution: a device-count-sized batch of reference images
    # per jitted program (whole PatchMatch in one program each), sharded
    # over the data mesh when >1 chip is attached — the multi-chip form of
    # the reference's per-image OpenMP loop (mvs/MVS.cpp:93-117).
    grays_all = np.stack(grays)
    n_dev = len(jax.devices())
    mvs_mesh = None
    if n_dev > 1:
        from .parallel import make_mesh
        mvs_mesh = make_mesh(n_dev)
    chunk = max(1, n_dev)
    if (chunk == 1 and mcfg.pm.sweep_slices
            and jax.default_backend() == "tpu"):
        # single-chip: score with the Pallas volume kernel (no vmap in the
        # B=1 path, so pallas_call is legal inside the program)
        mcfg = mcfg._replace(
            pm=mcfg.pm._replace(use_volscore_kernel=True))

    # DCN tier (SURVEY.md §5.8): per-frame fan-out across hosts — each
    # process computes a contiguous frame slice on its own devices; depth
    # artifacts are the merge channel (exactly how the reference's stages
    # communicate through result/ directories). Single-process: the slice
    # is everything and the barrier below is a no-op.
    from .parallel.multihost import process_slice
    my = process_slice(n)
    multi_proc = jax.process_count() > 1

    def _merge_pass(suffix):
        """After a cross-host barrier, pull the frames other hosts computed
        back from their exported artifacts so every process holds the full
        stack (needed as geometric-pass neighbor inputs / for fusion)."""
        if not multi_proc:
            return
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"mvs_{suffix}")
        for i in range(n):
            if my.start <= i < my.stop:
                continue
            depths[i] = artifacts.read_depth_u16(
                os.path.join(cfg.mvs_depth_path, f"{i:06d}_{suffix}.npy"))
            confs[i] = artifacts.read_conf_u16(
                os.path.join(cfg.mvs_conf_path, f"{i:06d}_{suffix}.npy"))

    def batched_pass(init_for, nei_depths, seed, suffix=None):
        # image residency: only the chunk's refs + their neighbor views are
        # shipped to the device per program (host gather + local re-index),
        # never the full image stack — the Room-scale (454+ frame) memory
        # plan standing in for the reference's mutex+refcount image cache
        # (mvs/MVS.h:89-101). Seeds fold global ids, so results are
        # identical to full-stack execution. init_for(i) -> (d0, n0, fixed)
        # is called lazily per chunk so the full-resolution init stacks are
        # never materialized for the whole trajectory at once.
        nei_depths_np = None if nei_depths is None else np.asarray(nei_depths)
        poses_np = np.asarray(poses)

        def _paths(i):
            return (os.path.join(cfg.mvs_depth_path, f"{i:06d}_{suffix}.npy"),
                    os.path.join(cfg.mvs_conf_path, f"{i:06d}_{suffix}.npy"),
                    os.path.join(cfg.mvs_normal_path, f"{i:06d}_{suffix}.npy"))

        n_resumed = 0
        for s in range(my.start, my.stop, chunk):
            live = list(range(s, min(s + chunk, my.stop)))
            # frame-level resume: a pass interrupted mid-way (stage timeout,
            # worker crash) restarts at the first frame whose per-frame
            # artifacts are missing — at profile resolution a pass is 454
            # sequential programs / ~30 min, too much to lose to a crash
            if suffix and all(os.path.exists(p) for i in live
                              for p in _paths(i)):
                for i in live:
                    dp, cp, npth = _paths(i)
                    depths[i] = artifacts.read_depth_u16(dp)
                    confs[i] = artifacts.read_conf_u16(cp)
                    normals[i] = np.load(npth)
                n_resumed += len(live)
                continue
            idx = live + [live[-1]] * (chunk - len(live))  # pad last chunk
            used = sorted(set(idx) | set(nei_table[idx].ravel().tolist()))
            lut = np.full(n, -1, np.int32)
            lut[used] = np.arange(len(used), dtype=np.int32)
            inits = [init_for(i) for i in idx]
            d, nm, cf = mvs_mod.estimate_depth_maps_batched(
                grays_all[used], poses_np[used], lut[nei_table[idx]],
                jnp.asarray(np.stack([d0 for d0, _, _ in inits])),
                jnp.asarray(np.stack([n0 for _, n0, _ in inits])),
                jnp.asarray(np.stack([fx for _, _, fx in inits])),
                mcfg,
                nei_depths=None if nei_depths_np is None
                else nei_depths_np[used],
                seed=seed, mesh=mvs_mesh,
                ref_idx=lut[np.asarray(idx)], key_idx=np.asarray(idx))
            d, nm, cf = np.asarray(d), np.asarray(nm), np.asarray(cf)
            for b, i in enumerate(live):
                depths[i], normals[i], confs[i] = d[b], nm[b], cf[b]
                if suffix:
                    dp, cp, npth = _paths(i)
                    artifacts.export_depth_u16(dp, depths[i])
                    artifacts.export_conf_u16(cp, confs[i])
                    np.save(npth, normals[i])
            del d, nm, cf, inits
            if (s - my.start) % (chunk * 25) == 0:
                log.info("mvs pass: %d/%d frames", s + len(live) - my.start,
                         my.stop - my.start)
        if n_resumed:
            log.info("mvs pass %s: resumed %d frames from per-frame artifacts",
                     suffix, n_resumed)

    if resume_pass:
        with tr.phase("load cached depth maps"):
            for i in range(n):
                depths[i] = artifacts.read_depth_u16(os.path.join(
                    cfg.mvs_depth_path, f"{i:06d}_{pass_suffix}.npy"))
                confs[i] = artifacts.read_conf_u16(os.path.join(
                    cfg.mvs_conf_path, f"{i:06d}_{pass_suffix}.npy"))
    if not resume_pass:
        with tr.phase("photometric pass"):
            def pho_init(i):
                d0, n0, fixed = mvs_mod.init_depth_normal(
                    jax.random.PRNGKey(i), rays,
                    None if lidar_depths[i] is None
                    else jnp.asarray(lidar_depths[i]),
                    mcfg)
                return np.asarray(d0), np.asarray(n0), np.asarray(fixed)
            # per-pass artifacts, _pho suffix (MVS.cpp:185-189), written
            # per frame inside the pass (frame-level resume)
            batched_pass(pho_init, None, seed=0, suffix="pho")
            _merge_pass("pho")  # geometric pass reads every frame's depth
    if cfg.mvs_use_geometric and not resume_pass:
        with tr.phase("geometric pass"):
            depths_pho = depths.copy()
            normals_pho = normals.copy()
            zeros = np.zeros((H, W), bool)
            batched_pass(lambda i: (depths_pho[i], normals_pho[i], zeros),
                         jnp.asarray(depths_pho), seed=100, suffix="geo")
            _merge_pass("geo")  # filter/fuse need the full stack
    with tr.phase("post + filter"):
        from .models.mvs import gap_interpolation, remove_small_segments
        mvs_mask = load_mask(cfg, H, W)
        if mvs_mask is not None:     # masked pixels get no depth (main.cpp:610)
            depths *= mvs_mask[None].astype(np.float32)
        for i in range(n):
            d = remove_small_segments(jnp.asarray(depths[i]),
                                      cfg.depth_diff_threshold, cfg.min_segment)
            depths[i] = np.asarray(gap_interpolation(d))
        fd, fc = mvs_mod.filter_depth_maps(depths, confs, poses, nei_table, mcfg)
        for i in range(n):
            # post-filter artifacts, _filter suffix (MVS.cpp:1890)
            artifacts.export_depth_u16(
                os.path.join(cfg.mvs_depth_path, f"{i:06d}_filter.npy"),
                np.asarray(fd[i]))
    with tr.phase("fuse + export"):
        colors, _ = load_images(cfg, color=True)  # RGB for fusion + sky gate
        pts, cols, msk = mvs_mod.fuse_depth_maps(fd, fc, np.stack(colors),
                                                 poses, mcfg)
        f = np.asarray(msk)
        rgb = np.clip(np.asarray(cols)[f] * 255, 0, 255)
        pointcloud.write_pcd(os.path.join(cfg.mvs_result_path, "mvs_fused.pcd"),
                             np.asarray(pts)[f],
                             rgb=rgb if rgb.shape[1] == 3 else None,
                             intensity=None if rgb.shape[1] == 3
                             else rgb[:, 0] / 255)
        # raw _geo depth/conf/normal artifacts were exported per frame by
        # the pass itself — re-exporting the post-processed maps here would
        # clobber the resume contract (a rerun would double-apply segment
        # removal / gap interpolation).
    return depths, confs


STAGES = {
    "init_camera_pose": init_camera_pose,
    "init_lidar_pose": init_lidar_pose,
    "joint_optimization": joint_optimization,
    "colorize_lidar_map": colorize_lidar_map,
    "joint_mvs": joint_mvs,
}
