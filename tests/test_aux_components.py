"""Tests for VLAD, GPS utils, visualization, line tracks, extra TA methods,
plain RANSAC."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScR

from panovlm_tpu.models import line_tracks, vlad
from panovlm_tpu.models import translation_averaging as ta
from panovlm_tpu.ops import epipolar
from panovlm_tpu.utils import gps as gps_util
from panovlm_tpu.utils import visualization as viz


def test_vlad_pairs_find_similar_frames(rng):
    # frames 0/5 share descriptors (loop closure), others are random
    N, F, D = 6, 64, 32
    descs = rng.normal(size=(N, F, D)).astype(np.float32)
    descs[5] = descs[0] + rng.normal(size=(F, D)).astype(np.float32) * 0.05
    descs /= np.linalg.norm(descs, axis=2, keepdims=True)
    fmask = np.ones((N, F), bool)
    pi, pj, emb = vlad.vlad_pairs(descs, fmask, n_neighbors=1, n_centers=8,
                                  sample=300)
    assert (0, 5) in set(zip(pi.tolist(), pj.tolist()))


def test_gps_scale_and_umeyama(rng):
    g = rng.normal(size=(10, 3)) * 5
    pi = np.array([0, 1, 2]); pj = np.array([1, 2, 3])
    s = gps_util.scale_from_gps(g, pi, pj)
    np.testing.assert_allclose(s[0], np.linalg.norm(g[1] - g[0]), rtol=1e-5)
    # umeyama: known similarity
    R = ScR.from_rotvec([0.1, -0.2, 0.3]).as_matrix()
    dst = 2.5 * g @ R.T + np.array([1.0, -2.0, 3.0])
    s_est, R_est, t_est = gps_util.umeyama(g, dst)
    np.testing.assert_allclose(s_est, 2.5, rtol=1e-6)
    np.testing.assert_allclose(R_est, R, atol=1e-8)


def test_visualization_artifacts(tmp_path, rng):
    d = (rng.random((32, 64)) * 10).astype(np.float32)
    c = viz.depth_to_color(d, 10.0)
    assert c.shape == (32, 64, 3) and c.dtype == np.uint8
    poses = np.zeros((4, 6), np.float32)
    poses[:, 3] = np.arange(4)
    viz.camera_centers_pcd(str(tmp_path / "c.pcd"), poses)
    viz.camera_pose_ply(str(tmp_path / "p.ply"), poses)
    from panovlm_tpu.io.pointcloud import load_cloud
    pc = load_cloud(str(tmp_path / "c.pcd"))
    assert len(pc) == 4
    gray = rng.random((32, 64)).astype(np.float32)
    pts = rng.normal(size=(100, 3)).astype(np.float32) + [0, 0, 3]
    img = viz.project_cloud_overlay(gray, pts, np.ones(100, bool))
    assert img.shape == (32, 64, 3)
    img2 = viz.draw_panorama_line(img.copy(), np.array([1.0, 0, 1]),
                                  np.array([-0.3, 0.2, 1]))
    assert (img2 != img).any()


def test_ta_bata_and_l1(rng):
    import sys
    sys.path.insert(0, "tests")
    from test_sfm_core import _translation_graph, align_translations
    aa, t_gt, C, pi, pj, rel_aa, u, scale = _translation_graph(rng, noise=1e-4)
    for method in ("bata", "l1"):
        t_est, s = ta.translation_averaging(aa, pi, pj, rel_aa, u, scale,
                                            method=method)
        t_al = align_translations(t_est, t_gt)
        err = np.abs(t_al - t_gt).max() / np.abs(t_gt).max()
        assert err < 0.08, (method, err)


def test_plain_ransac(rng):
    import sys
    sys.path.insert(0, "tests")
    from test_epipolar import make_pair
    b1, b2, R, t = make_pair(rng, n=200, outlier_frac=0.3, noise=1e-4)
    out = epipolar.find_essential_ransac(b1, b2, jnp.ones(200, bool))
    assert bool(out["ok"])
    inl = np.asarray(out["inliers"])
    assert inl[:60].sum() < 10 and inl[60:].sum() > 100
    res = np.asarray(epipolar.epipolar_residuals(out["E"], b1, b2))
    assert np.median(res[inl]) < 1e-5


def test_lidar_line_tracks_and_gate():
    # 3 scans, 4 line slots; lines 0 of each scan chain into one track
    P = 2  # pairs: (0,1), (1,2)
    L = 4
    mask = np.zeros((P, L), bool)
    seg_r = np.zeros((P, L), np.int32)
    mask[0, 0] = True; seg_r[0, 0] = 0   # scan0 line0 <-> scan1 line0
    mask[1, 0] = True; seg_r[1, 0] = 0   # scan1 line0 <-> scan2 line0
    mask[1, 2] = True; seg_r[1, 2] = 3   # isolated 2-line track
    assoc = {"mask": jnp.asarray(mask), "seg_r": jnp.asarray(seg_r)}
    tid = line_tracks.lidar_line_tracks(assoc, np.array([0, 1]),
                                        np.array([1, 2]), 3, L, min_length=3)
    assert tid[0, 0] >= 0 and tid[0, 0] == tid[1, 0] == tid[2, 0]
    assert tid[1, 3] == -1 and tid[2, 2] == -1  # short track filtered
    gate = line_tracks.l2l_track_gate(assoc, np.array([0, 1]),
                                      np.array([1, 2]), tid)
    assert gate[0, 0] and gate[1, 0] and not gate[1, 2]


def test_image_line_tracks(rng):
    # two frames, same world lines, small rotation between
    from test_camera_lidar import make_line_scene, arcs_from_world_lines
    starts, ends = make_line_scene(rng, n_lines=8)
    pose0 = np.zeros(6, np.float32)
    pose1 = np.zeros(6, np.float32)
    pose1[:3] = [0.02, -0.03, 0.01]
    a0 = arcs_from_world_lines(starts, ends, pose0)
    a1 = arcs_from_world_lines(starts, ends, pose1)
    batch = {k: jnp.asarray(np.stack([a0[k], a1[k]])) for k in a0}
    m = np.asarray(line_tracks.match_image_lines_pair(
        {k: jnp.asarray(a0[k]) for k in a0},
        {k: jnp.asarray(a1[k]) for k in a1},
        jnp.asarray(pose0), jnp.asarray(pose1)))
    L = len(starts)
    assert (m[:L] == np.arange(L)).mean() > 0.8
    tid = line_tracks.image_line_tracks(batch, np.stack([pose0, pose1]),
                                        min_length=2)
    assert (tid[0, :L] >= 0).mean() > 0.8
    assert (tid[0, :L] == tid[1, :L])[tid[0, :L] >= 0].all()


def test_extract_panorama_lines_batch_matches_per_frame():
    """extract_panorama_lines_batch (one lax.map device program for all
    frames' LBD descriptors) must reproduce the per-frame path exactly —
    it replaces 454 dispatch+sync tunnel round trips in the joint stage."""
    from synthetic import render_panorama
    from panovlm_tpu.utils import panorama_line as pl

    H, W = 256, 512
    gs = [render_panorama(np.array([x, 0.4, 0.05 * i]), H, W)[0]
          for i, x in enumerate((0.0, 0.2))]
    batch = pl.extract_panorama_lines_batch(
        [(g * 255).astype(np.uint8) for g in gs], cap=64)
    for i, g in enumerate(gs):
        single = pl.extract_panorama_lines((g * 255).astype(np.uint8), cap=64)
        for k in single:
            np.testing.assert_allclose(batch[k][i], single[k],
                                       rtol=1e-5, atol=1e-6, err_msg=k)


def test_host_pool_matches_serial():
    """The spawn process pool (utils/hostpool.py — the reference's OpenMP
    frontend loops, sfm/SfM.cpp:23-36) must return the same ordered results
    as the serial loop; forced to 2 workers so the pool path actually runs
    on this 1-core host."""
    from synthetic import render_panorama
    from panovlm_tpu.utils import hostpool, sift as sift_mod

    assert hostpool.pool_workers(-1) >= 1
    assert hostpool.pool_workers(25) <= (__import__("os").cpu_count() or 1)
    gs = [(render_panorama(np.array([x, 0.4, 0.0]), 128, 256)[0]
           * 255).astype(np.uint8) for x in (0.0, 0.15, 0.3)]
    uv_s, d_s, m_s = sift_mod.extract_sift_batch(gs, cap=128,
                                                 force_workers=1)
    uv_p, d_p, m_p = sift_mod.extract_sift_batch(gs, cap=128,
                                                 force_workers=2)
    np.testing.assert_array_equal(m_p, m_s)
    np.testing.assert_allclose(uv_p, uv_s, atol=1e-6)
    np.testing.assert_allclose(d_p, d_s, atol=1e-6)


def test_lbd_descriptor_discriminates(rng):
    """The LBD-equivalent band descriptor (ops/lbd.py) must place the same
    physical line closer across viewpoints than different lines."""
    import jax.numpy as jnp
    from synthetic import render_panorama
    from panovlm_tpu.utils import panorama_line as pl
    from panovlm_tpu.models.line_tracks import match_image_lines_pair

    H, W = 256, 512
    g1, _ = render_panorama(np.array([0.0, 0.4, 0.0]), H, W)
    g2, _ = render_panorama(np.array([0.15, 0.4, 0.05]), H, W)
    a1 = pl.extract_panorama_lines((g1 * 255).astype(np.uint8), cap=64)
    a2 = pl.extract_panorama_lines((g2 * 255).astype(np.uint8), cap=64)
    assert "desc" in a1 and a1["desc"].shape == (64, 72)
    n1, n2 = int(a1["mask"].sum()), int(a2["mask"].sum())
    assert n1 > 4 and n2 > 4, (n1, n2)
    # valid descriptors are unit-norm, padded rows zero
    norms = np.linalg.norm(a1["desc"], axis=1)
    np.testing.assert_allclose(norms[a1["mask"]], 1.0, atol=1e-4)
    assert (norms[~a1["mask"]] == 0).all()

    poses = np.zeros((2, 6), np.float32)
    poses[0, 3:] = [0.0, -0.4, 0.0]
    poses[1, 3:] = [-0.15, -0.4, -0.05]
    m_desc = np.asarray(match_image_lines_pair(
        {k: jnp.asarray(v) for k, v in a1.items()},
        {k: jnp.asarray(v) for k, v in a2.items()},
        jnp.asarray(poses[0]), jnp.asarray(poses[1])))
    matched = m_desc[m_desc >= 0]
    assert len(matched) >= 3, len(matched)
    # matches must agree geometrically: rotated normals within 4 deg (R=I here)
    ni = a1["normal"][matched]
    nj = a2["normal"][np.nonzero(m_desc >= 0)[0]]
    cos = np.abs((ni * nj).sum(1))
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))).max() < 4.0


def test_mask_path_restricts_sift(tmp_path, rng):
    """cfg.mask_path (main.cpp:102-104): SIFT keypoints only inside the
    mask; load_mask resizes and returns None when unset/unreadable."""
    import cv2
    from panovlm_tpu.pipeline import load_mask
    from panovlm_tpu.config import Config
    from panovlm_tpu.utils import sift as sift_mod
    from synthetic import render_panorama

    H, W = 128, 256
    g, _ = render_panorama(np.array([0.0, 0.4, 0.0]), H, W)
    img = (g * 255).astype(np.uint8)
    mask = np.zeros((H, W), np.uint8)
    mask[:, : W // 2] = 255                  # left half only
    mp = str(tmp_path / "mask.png")
    cv2.imwrite(mp, mask)

    cfg = Config(mask_path=mp)
    m = load_mask(cfg, H, W)
    assert m is not None and m[:, : W // 2].all() and not m[:, W // 2:].any()
    # resize path
    m2 = load_mask(cfg, H // 2, W // 2)
    assert m2.shape == (H // 2, W // 2)
    assert load_mask(Config(), H, W) is None
    assert load_mask(Config(mask_path="/nonexistent.png"), H, W) is None

    uv, desc, _ = sift_mod.extract_sift(img, num_features=512,
                                        mask=(m.astype(np.uint8) * 255))
    assert len(uv) > 10
    assert (uv[:, 0] < W // 2 + 1).all(), uv[:, 0].max()


def test_fuse_arcs_ncc_rejects_distinct_collinear_edges():
    """FuseFarLines NCC gate (util/PanoramaLine.cpp:661-703): two distinct
    physical edges that happen to be collinear (e.g. split by an occlusion,
    opposite photometric polarity) must NOT fuse when the image is given;
    fragments of the SAME edge must still fuse across the gap."""
    from panovlm_tpu.utils import panorama_line as pl

    H, W = 256, 512
    v0 = 128

    def edge_image(invert_second: bool):
        g = np.full((H, W), 0.5, np.float32)
        for (u_lo, u_hi), inv in (((100, 160), False),
                                  ((165, 225), invert_second)):
            hi, lo = (0.0, 1.0) if inv else (1.0, 0.0)
            g[v0 - 16:v0, u_lo:u_hi] = hi
            g[v0:v0 + 16, u_lo:u_hi] = lo
        return g

    # both fragments on the equator great circle, 5 px (~3.5 deg) gap
    segs = np.array([[100, v0, 160, v0], [165, v0, 225, v0]], np.float32)
    arcs = pl.segments_to_arcs(segs, H, W)

    geo = pl.fuse_arcs(arcs)
    assert len(geo["arc"]) == 1          # geometry alone fuses them

    distinct = pl.fuse_arcs(arcs, gray=edge_image(True),
                            ncc_half_window=8)
    assert len(distinct["arc"]) == 2     # opposite polarity: NOT fused

    same = pl.fuse_arcs(arcs, gray=edge_image(False), ncc_half_window=8)
    assert len(same["arc"]) == 1         # same edge: still fused


def test_optical_flow_filter_rejects_wrong_line_match():
    """FilterLineMatchOpticalFlow (PanoramaLineMatch.cpp:114-159): LK flow
    keeps geometrically-correct matches and kills a deliberately corrupted
    one (points tracked from line A land nowhere near line B)."""
    from synthetic import render_panorama
    from panovlm_tpu.utils import panorama_line as pl
    from panovlm_tpu.models import line_tracks

    H, W = 256, 512
    g1, _ = render_panorama(np.array([0.0, 0.4, 0.0]), H, W)
    g2, _ = render_panorama(np.array([0.05, 0.4, 0.02]), H, W)
    a1 = pl.extract_panorama_lines((g1 * 255).astype(np.uint8), cap=64,
                                   with_descriptors=False)
    a2 = pl.extract_panorama_lines((g2 * 255).astype(np.uint8), cap=64,
                                   with_descriptors=False)
    import jax.numpy as jnp
    pose = np.zeros(6, np.float32)
    m = np.asarray(line_tracks.match_image_lines_pair(
        {k: jnp.asarray(v) for k, v in a1.items()},
        {k: jnp.asarray(v) for k, v in a2.items()},
        jnp.asarray(pose), jnp.asarray(pose)))
    good_rows = np.nonzero(m >= 0)[0]
    assert len(good_rows) >= 3
    # 60 px of the reference's full-res panoramas ~= 20 px at this W=512
    kept = line_tracks.filter_matches_optical_flow(a2, a1, g2, g1, m,
                                                   max_median_px=20.0)
    assert (kept[good_rows] >= 0).mean() > 0.5   # real matches survive

    # corrupt one surviving match to a non-collinear partner line
    surv = np.nonzero(kept >= 0)[0]
    normals = a1["normal"]
    row = None
    for r in surv:
        others = [i for i in np.nonzero(a1["mask"])[0]
                  if abs(normals[i] @ normals[kept[r]]) < 0.7]
        if others:
            row = r
            wrong = others[0]
            break
    assert row is not None
    bad = kept.copy()
    bad[row] = wrong
    out = line_tracks.filter_matches_optical_flow(a2, a1, g2, g1, bad,
                                                  max_median_px=20.0)
    assert out[row] == -1                         # corrupted match rejected


def test_time_report_total_counts_top_level_only():
    """The CLI wraps a stage phase around the stage's own sub-phases;
    'total' must equal the top-level time, not double-count the nesting."""
    import time
    from panovlm_tpu.utils.timing import TimeReport
    tr = TimeReport()
    with tr.phase("stage"):
        with tr.phase("inner_a"):
            time.sleep(0.01)
        with tr.phase("inner_b"):
            time.sleep(0.01)
    total = float(tr.report().splitlines()[-1].split()[-2])
    assert abs(total - tr.time_spent["stage"]) < 0.005
    # flat usage (library callers without an outer phase) sums every phase
    tr2 = TimeReport()
    with tr2.phase("a"):
        time.sleep(0.01)
    with tr2.phase("b"):
        time.sleep(0.01)
    t2 = float(tr2.report().splitlines()[-1].split()[-2])
    assert abs(t2 - sum(tr2.time_spent.values())) < 0.02


def test_sift_module_imports_without_jax():
    """The spawn-pool worker import path (panovlm_tpu.utils.sift) must not
    pull in jax — hostpool's design contract (each worker would pay a
    multi-second jax import and register the PJRT plugin near-fork)."""
    import subprocess, sys
    # this image's sitecustomize pre-imports jax into every interpreter, so
    # the assertion is "importing the worker modules must not ADD jax",
    # not "jax is absent"
    code = ("import sys\n"
            "pre = 'jax' in sys.modules\n"
            "import panovlm_tpu.utils.sift\n"
            "import panovlm_tpu.utils.hostpool\n"
            "post = 'jax' in sys.modules\n"
            "print('PRELOADED' if pre else ('ADDED' if post else 'clean'))\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    assert "ADDED" not in r.stdout, "worker import path pulls in jax"


def test_memory_budgets_raise_on_oversized_plans(monkeypatch):
    """Host and device budget assertions (§5.3 failure detection): an
    oversized plan fails at stage start with an itemized message; a small
    plan passes and returns the planned byte total."""
    import numpy as np
    import pytest
    from panovlm_tpu.utils import membudget

    small = membudget.assert_host_budget(
        "t", {"a": ((4, 4), np.float32)})
    assert small == 64
    with pytest.raises(MemoryError, match="Itemized plan"):
        membudget.assert_host_budget(
            "t", {"huge": ((1 << 22, 1 << 22), np.float32)})

    assert membudget.assert_device_budget(
        "t", {"a": ((8,), np.int32)}) == 32
    with pytest.raises(MemoryError, match="HBM"):
        membudget.assert_device_budget(
            "t", {"quads": ((1593, 720, 1440, 2), np.int32),
                  "quads2": ((1593, 720, 1440, 2), np.int32)})
    # operator override downgrades to a warning
    monkeypatch.setenv("PANOVLM_IGNORE_DEVICE_BUDGET", "1")
    membudget.assert_device_budget(
        "t", {"quads": ((1593, 720, 1440, 2), np.int32),
              "quads2": ((1593, 720, 1440, 2), np.int32)})
