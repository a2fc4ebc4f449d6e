"""Stage-file persistence — the checkpoint/resume contract.

Replaces util/FileIO.{h,cpp} (reference): every pipeline stage communicates
through durable artifacts so each stage is independently restartable
(SURVEY.md §5.4). Formats kept byte/line-compatible where text
(pose txt = `[name] r00 r01 r02 tx r10 ... tz` storing T_wc rows,
FileIO.cpp:11-191; GPS txt `name x y z`), and replaced with npz for the
boost-binary blobs (frames, match pairs, tracks) — same content, portable
format. Depth/normal/conf maps use .npy with the reference's quantization
conventions (depth x256 uint16, conf mapped [-1,1] -> [0, 65534] uint16,
FileIO.h:101-131).
"""

from __future__ import annotations

import os

import numpy as np


# ----------------------------------------------------------------------------
# pose txt (T_wc rows)
# ----------------------------------------------------------------------------

def export_pose_t(path, R_wc_list, t_wc_list, names=None):
    """ExportPoseT (FileIO.cpp:168-191)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i in range(len(R_wc_list)):
            R = np.asarray(R_wc_list[i], np.float64)
            t = np.asarray(t_wc_list[i], np.float64)
            row = []
            if names is not None:
                row.append(str(names[i]))
            for r in range(3):
                row += [f"{R[r, 0]:.17g}", f"{R[r, 1]:.17g}",
                        f"{R[r, 2]:.17g}", f"{t[r]:.17g}"]
            f.write(" ".join(row) + "\n")


def read_pose_t(path, with_invalid: bool = True):
    """ReadPoseT (FileIO.cpp:11-90). Returns (R (N,3,3), t (N,3), names,
    valid (N,)); invalid rows (inf/nan) give identity R, inf t."""
    Rs, ts, names, valid = [], [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            name = ""
            if len(parts) == 13:
                name = parts[0]
                parts = parts[1:]
            if len(parts) != 12:
                continue
            ok = not any(("inf" in p or "nan" in p) for p in parts)
            if ok:
                vals = np.array([float(p) for p in parts]).reshape(3, 4)
                Rs.append(vals[:, :3])
                ts.append(vals[:, 3])
            else:
                Rs.append(np.zeros((3, 3)))
                ts.append(np.full(3, np.inf))
                if not with_invalid:
                    Rs.pop(); ts.pop()
                    continue
            names.append(name)
            valid.append(ok)
    return (np.asarray(Rs), np.asarray(ts), names, np.asarray(valid, bool))


def read_gps(path):
    """ReadGPS: lines `name x y z` (already in a metric local frame)."""
    names, xyz = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 4:
                names.append(parts[0])
                xyz.append([float(x) for x in parts[1:4]])
    return names, np.asarray(xyz, np.float64)


# ----------------------------------------------------------------------------
# depth / normal / conf maps (reference quantization conventions)
# ----------------------------------------------------------------------------

def export_depth_u16(path, depth, scale: float = 256.0):
    """CV_16U fixed-point x256 depth (sfm/SfM.cpp:216-220)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    q = np.clip(np.asarray(depth, np.float64) * scale, 0, 65535).astype(np.uint16)
    np.save(path, q)


def read_depth_u16(path, scale: float = 256.0):
    return np.load(path).astype(np.float32) / scale


def export_conf_u16(path, conf):
    """conf [-1,1] -> uint16 (FileIO.h ExportConfMap)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    q = np.clip((np.asarray(conf, np.float64) + 1.0) * 32767, 0, 65535)
    np.save(path, q.astype(np.uint16))


def read_conf_u16(path):
    return np.load(path).astype(np.float32) / 32767.0 - 1.0


# ----------------------------------------------------------------------------
# npz blobs (frames / match pairs / tracks — replaces boost binary)
# ----------------------------------------------------------------------------

def save_npz(path, **arrays):
    """Atomic write (tmp + rename): cache/checkpoint files are rewritten
    mid-run (incremental match-cache checkpoints, rel-pose cache) and a
    kill during the write must never leave a truncated zip behind."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def save_npz_raw(path, **arrays):
    """Uncompressed npz for the large float caches (SIFT descriptors, depth
    panoramas): zlib on hundreds of MB costs ~5x the write wall on the
    single-core host for <10% size (measured: 9.5 s vs 1.9 s at the
    Room-100 descriptor-cache shape) — the reference stores these raw too
    (boost binary, util/FileIO.h:62-65). load_npz reads both formats.
    Atomic like save_npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_npz(path) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def load_npz_or_none(path):
    """Cache-tolerant load: a missing or unreadable (e.g. truncated by a
    crash predating atomic writes) cache is simply a cache miss, never an
    abort — the caller recomputes."""
    import logging
    if not os.path.exists(path):
        return None
    try:
        return load_npz(path)
    except Exception as e:  # zipfile.BadZipFile, OSError, ValueError
        logging.getLogger("panovlm").warning(
            "unreadable cache %s (%s) — recomputing", path, e)
        return None


def export_match_pairs(folder, pairs: dict):
    """ExportMatchPair analog: one npz with all pair arrays."""
    save_npz(os.path.join(folder, "pairs.npz"), **pairs)


def read_match_pairs(folder) -> dict:
    return load_npz(os.path.join(folder, "pairs.npz"))


def export_point_tracks(path, track_img, track_feat, track_mask, points,
                        point_ok, colors=None):
    """ExportPointTracks analog (points.bin -> points.npz)."""
    arrays = dict(track_img=track_img, track_feat=track_feat,
                  track_mask=track_mask, points=points, point_ok=point_ok)
    if colors is not None:
        arrays["colors"] = colors
    save_npz(path, **arrays)


def read_point_tracks(path) -> dict:
    return load_npz(path)
