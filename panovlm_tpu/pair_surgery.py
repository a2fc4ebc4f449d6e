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
