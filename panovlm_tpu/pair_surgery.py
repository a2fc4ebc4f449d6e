"""Pair-set surgery: patch the persisted match-pair artifact in place.

Operator tools for rescuing long runs without recomputing a whole stage —
the reference's SfM test harness exposes the same two operations
(ReComputePairs, sfm/SfM_test.cpp:7-41: replace every pair inside a frame
range with the freshly-matched full quadratic set; AddPair,
SfM_test.cpp:155-249: match one extra pair and append it).

Both operate on ``result/pairs/match_pairs.npz`` (the SoA pair cache
written by init_camera_pose) using the SIFT features persisted in
``result/frames/frames_sift.npz`` — the analog of the reference reloading
images and recomputing descriptors for the touched frames
(SfM_test.cpp:23-27). Rows that the stage's pair proposer would not
regenerate are flagged ``extra`` so the row-based cache merge
(pipeline._match_pairs_cached) keeps them on the next stage run.

CLI:  python -m panovlm_tpu add_pair <config.txt> <i> <j>
      python -m panovlm_tpu recompute_pairs <config.txt> <i1> <i2>
"""

from __future__ import annotations

import logging
import os

import numpy as np

from .config import Config
from .io import artifacts

log = logging.getLogger("panovlm")


def _load_state(cfg: Config):
    """The persisted artifacts surgery operates on. Both must exist —
    surgery patches a completed (or partially completed) stage run."""
    mpath = os.path.join(cfg.match_pair_path, "match_pairs.npz")
    fpath = os.path.join(cfg.frame_path, "frames_sift.npz")
    for p in (mpath, fpath):
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"{p} not found — run init_camera_pose first; pair surgery "
                f"patches its persisted artifacts")
    mc = artifacts.load_npz(mpath)
    fs = artifacts.load_npz(fpath)
    if int(mc["num_sift"]) != fs["uv"].shape[1]:
        raise ValueError("match_pairs.npz and frames_sift.npz disagree on "
                         "the feature cap — stale artifacts")
    return mpath, mc, fs


def _match_rows(cfg: Config, fs: dict, pi, pj, max_matches: int):
    import jax.numpy as jnp

    from .models import sfm as sfm_mod
    from .pipeline import _sfm_config

    scfg = _sfm_config(cfg, int(fs["uv"].shape[1]))._replace(
        max_matches=max_matches)
    return sfm_mod.match_all_pairs(jnp.asarray(fs["desc"]),
                                   jnp.asarray(fs["fmask"]),
                                   np.asarray(pi, np.int32),
                                   np.asarray(pj, np.int32), scfg)


def _upsert(mc: dict, pi_new, pj_new, mm, extra_new, drop=None):
    """Replace/append rows keyed by (i, j); optionally drop rows first."""
    keep = np.ones(len(mc["pi"]), bool) if drop is None else ~drop
    newkey = {(int(a), int(b)): r for r, (a, b) in enumerate(zip(pi_new, pj_new))}
    for r in np.nonzero(keep)[0]:
        if (int(mc["pi"][r]), int(mc["pj"][r])) in newkey:
            keep[r] = False  # replaced by the recomputed row
    cextra = mc["extra"].astype(bool) if "extra" in mc \
        else np.zeros(len(mc["pi"]), bool)
    return dict(
        pi=np.concatenate([mc["pi"][keep], np.asarray(pi_new, mc["pi"].dtype)]),
        pj=np.concatenate([mc["pj"][keep], np.asarray(pj_new, mc["pj"].dtype)]),
        num_sift=mc["num_sift"],
        idx=np.concatenate([mc["idx"][keep], np.asarray(mm["idx"])]),
        mask=np.concatenate([mc["mask"][keep], np.asarray(mm["mask"])]),
        pair_ok=np.concatenate([mc["pair_ok"][keep],
                                np.asarray(mm["pair_ok"])]),
        extra=np.concatenate([cextra[keep], np.asarray(extra_new, bool)]))


def add_pair(cfg: Config, i: int, j: int):
    """AddPair (SfM_test.cpp:155-249): SIFT-match one extra image pair and
    upsert it into the persisted pair set, flagged `extra` so the next
    stage run keeps it even though the proposer would not emit it."""
    if i == j:
        raise ValueError("add_pair needs two distinct frames")
    i, j = (int(i), int(j)) if i < j else (int(j), int(i))
    mpath, mc, fs = _load_state(cfg)
    n = len(fs["uv"])
    if not (0 <= i < n and 0 <= j < n):
        raise ValueError(f"frame ids must be in [0, {n})")
    mm = _match_rows(cfg, fs, [i], [j], int(mc["idx"].shape[1]))
    out = _upsert(mc, [i], [j], mm, [True])
    artifacts.save_npz(mpath, **out)
    log.info("add_pair(%d, %d): %d matches, pair_ok=%s — %d pairs total",
             i, j, int(np.asarray(mm["mask"]).sum()),
             bool(np.asarray(mm["pair_ok"])[0]), len(out["pi"]))
    return out


def recompute_pairs(cfg: Config, idx1: int, idx2: int):
    """ReComputePairs (SfM_test.cpp:7-41): drop every persisted pair whose
    two frames both lie in [idx1, idx2] and replace them with the freshly
    SIFT-matched full quadratic pair set over that range."""
    mpath, mc, fs = _load_state(cfg)
    n = len(fs["uv"])
    idx1, idx2 = int(idx1), min(int(idx2), n - 1)
    if idx1 < 0:
        raise ValueError(f"frame ids must be in [0, {n})")
    if idx1 > idx2:
        raise ValueError("need idx1 <= idx2")
    inside = ((mc["pi"] >= idx1) & (mc["pi"] <= idx2)
              & (mc["pj"] >= idx1) & (mc["pj"] <= idx2))
    a, b = np.triu_indices(idx2 - idx1 + 1, k=1)
    pi_new = (a + idx1).astype(np.int32)
    pj_new = (b + idx1).astype(np.int32)
    mm = _match_rows(cfg, fs, pi_new, pj_new, int(mc["idx"].shape[1]))
    # the quadratic set exceeds what the proposer generates; keep it all
    out = _upsert(mc, pi_new, pj_new, mm, np.ones(len(pi_new), bool),
                  drop=inside)
    artifacts.save_npz(mpath, **out)
    log.info("recompute_pairs(%d, %d): dropped %d rows, rematched %d — "
             "%d pairs total", idx1, idx2, int(inside.sum()), len(pi_new),
             len(out["pi"]))
    return out


def set_straight_motion(cfg: Config, start: int, end: int, length: int):
    """SetToStraightMotion (SfM_test.cpp:83-153): replace every persisted
    pair whose two frames both lie in [start, end] with forced straight-
    motion pairs — identity relative rotation, translation along +z of the
    first frame — for idx1 in [start, end), idx2 in (idx1, idx1+length].
    Matches are freshly SIFT-matched; the relative-pose cache rows for the
    touched pairs are overwritten with the forced pose (R = I, unit
    t_21 = -z) and CheckRT-triangulated points, so the next stage run
    consumes them instead of re-estimating (the reference writes R_21 /
    t_21 / E_21 / triangulated into the pair itself)."""
    import jax.numpy as jnp

    from .ops import epipolar, spherical
    from .pipeline import _match_row_fp

    mpath, mc, fs = _load_state(cfg)
    n = len(fs["uv"])
    start, end = int(start), min(int(end), n - 1)
    length = int(length)
    if not (0 <= start < end and length >= 1):
        raise ValueError("need 0 <= start < end and length >= 1")
    pi_new, pj_new = [], []
    for i1 in range(start, end):
        for i2 in range(i1 + 1, min(i1 + length, end) + 1):
            pi_new.append(i1)
            pj_new.append(i2)
    pi_new = np.asarray(pi_new, np.int32)
    pj_new = np.asarray(pj_new, np.int32)
    inside = ((mc["pi"] >= start) & (mc["pi"] <= end)
              & (mc["pj"] >= start) & (mc["pj"] <= end))
    mm = _match_rows(cfg, fs, pi_new, pj_new, int(mc["idx"].shape[1]))
    out = _upsert(mc, pi_new, pj_new, mm, np.ones(len(pi_new), bool),
                  drop=inside)
    artifacts.save_npz(mpath, **out)

    # forced relative poses for the new rows (keyed by the fresh match
    # fingerprints, so _relative_poses_cached reuses them verbatim).
    # H, W must be the WORKING resolution the persisted uv coordinates are
    # in (config `scale` pyramid applies — e.g. Room runs at scale -2 of
    # the 5.7K capture), so derive it from the raw image shape exactly the
    # way load_images does (cv2.pyrDown halves with ceil rounding).
    import cv2
    from .pipeline import _list_files
    img0 = cv2.imread(_list_files(cfg.image_path,
                                  ("jpg", "jpeg", "png"))[0], 0)
    H, W = img0.shape
    for _ in range(-cfg.scale if cfg.scale < 0 else 0):
        H, W = (H + 1) // 2, (W + 1) // 2
    for _ in range(cfg.scale if cfg.scale > 0 else 0):
        H, W = H * 2, W * 2
    uv = jnp.asarray(fs["uv"])
    bearings = spherical.image_to_cam(uv, H, W)
    aa = np.zeros((len(pi_new), 3), np.float32)
    t21 = np.tile(np.asarray([[0.0, 0.0, -1.0]], np.float32),
                  (len(pi_new), 1))
    K = int(mc["idx"].shape[1])
    tri_p = np.zeros((len(pi_new), K, 3), np.float32)
    tri_m = np.zeros((len(pi_new), K), bool)
    n_inl = np.zeros((len(pi_new),), np.int32)
    R_I = jnp.eye(3)
    t_u = jnp.asarray([0.0, 0.0, -1.0])
    midx = np.asarray(mm["idx"])
    mmask = np.asarray(mm["mask"])
    for r in range(len(pi_new)):
        b1 = bearings[pi_new[r]][jnp.asarray(midx[r, :, 0])]
        b2 = bearings[pj_new[r]][jnp.asarray(midx[r, :, 1])]
        chk = epipolar.check_rt(R_I, t_u, b1, b2, jnp.asarray(mmask[r]))
        good = np.asarray(chk["good"])
        tri_p[r] = np.where(good[:, None], np.asarray(chk["points"]), 0.0)
        tri_m[r] = good
        n_inl[r] = int(np.asarray(chk["n_good"]))
    rcache = os.path.join(cfg.match_pair_path, "rel_poses.npz")
    fp_new = _match_row_fp(midx, mmask)
    rows = dict(pi=pi_new, pj=pj_new, fp=fp_new, rel_aa=aa, rel_t=t21,
                n_inliers=n_inl, ok=np.ones(len(pi_new), bool),
                tri_points=tri_p, tri_mask=tri_m)
    if os.path.exists(rcache):
        rc = {k: np.asarray(v) for k, v in artifacts.load_npz(rcache).items()}
        if rc["tri_points"].shape[1] == K:
            newkey = {(int(a), int(b)) for a, b in zip(pi_new, pj_new)}
            keep = np.asarray([(int(a), int(b)) not in newkey
                               for a, b in zip(rc["pi"], rc["pj"])])
            rows = {k: np.concatenate([rc[k][keep], rows[k]])
                    for k in rows}
    artifacts.save_npz(rcache, **rows)
    log.info("set_straight_motion(%d, %d, %d): %d forced pairs (dropped "
             "%d), rel-pose rows written", start, end, length, len(pi_new),
             int(inside.sum()))
    return out


def dump_relative_poses(cfg: Config, out_path: str | None = None):
    """PrintRelativePose (SfM_test.cpp:251-269): dump every persisted
    pair's relative pose as t_12 and the axis-angle of R_12 (degrees)."""
    from scipy.spatial.transform import Rotation as ScR
    rcache = os.path.join(cfg.match_pair_path, "rel_poses.npz")
    if not os.path.exists(rcache):
        raise FileNotFoundError(f"{rcache} not found — run init_camera_pose")
    rc = artifacts.load_npz(rcache)
    out_path = out_path or os.path.join(cfg.sfm_result_path,
                                        "relative_poses.txt")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        for r in range(len(rc["pi"])):
            R_21 = ScR.from_rotvec(np.asarray(rc["rel_aa"][r],
                                              np.float64)).as_matrix()
            t_21 = np.asarray(rc["rel_t"][r], np.float64)
            t_12 = -R_21.T @ t_21
            f.write(f"pair : {int(rc['pi'][r])} {int(rc['pj'][r])} "
                    f"{'good' if bool(rc['ok'][r]) else 'bad'}\n")
            f.write(f"{t_12[0]} {t_12[1]} {t_12[2]}\n")
            rv = ScR.from_matrix(R_21.T).as_rotvec()
            ang = np.linalg.norm(rv)
            ax = rv / ang if ang > 1e-12 else np.array([1.0, 0, 0])
            f.write(f"{ax[0]} {ax[1]} {ax[2]} {np.degrees(ang)}\n")
    log.info("dump_relative_poses: %d pairs -> %s", len(rc["pi"]), out_path)
    return out_path


def dump_global_poses(cfg: Config, out_path: str | None = None):
    """PrintGlobalPose (SfM_test.cpp:272-292): dump each frame's rotation
    relative to frame 0's gauge as axis-angle (degrees)."""
    from scipy.spatial.transform import Rotation as ScR
    pose_txt = os.path.join(cfg.sfm_result_path, "camera_pose_final.txt")
    if not os.path.exists(pose_txt):
        raise FileNotFoundError(f"{pose_txt} not found — run init_camera_pose")
    R_wc, _, _, ok = artifacts.read_pose_t(pose_txt)
    out_path = out_path or os.path.join(cfg.sfm_result_path,
                                        "global_poses.txt")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    R_w0 = R_wc[int(np.argmax(ok))]
    with open(out_path, "w") as f:
        for i in range(len(R_wc)):
            R_ci = (R_wc[i].T @ R_w0).T
            rv = ScR.from_matrix(R_ci).as_rotvec()
            ang = np.linalg.norm(rv)
            ax = rv / ang if ang > 1e-12 else np.array([1.0, 0, 0])
            f.write(f"frame : {i}, rotation : {ax[0]} {ax[1]} {ax[2]} "
                    f"{np.degrees(ang)}\n")
    log.info("dump_global_poses: %d frames -> %s", len(R_wc), out_path)
    return out_path
