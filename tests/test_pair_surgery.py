"""Pair-surgery round trip (ReComputePairs / AddPair,
sfm/SfM_test.cpp:7-41,155-249): patch a persisted pair set on disk, then
verify the stage-side row-based cache merge reuses / keeps / rematches
the right rows."""

import numpy as np
import pytest

from panovlm_tpu import pair_surgery
from panovlm_tpu.config import Config
from panovlm_tpu.io import artifacts
from panovlm_tpu.pipeline import _match_pairs_cached, _sfm_config


N, CAP = 6, 64


def _features(rng):
    """Frames with planted correspondences: frame k's descriptors are a
    shared dictionary plus noise, so SIFT ratio-matching finds them."""
    base = rng.normal(size=(CAP, 128)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    desc = np.stack([base + 0.02 * rng.normal(size=base.shape).astype(np.float32)
                     for _ in range(N)])
    desc /= np.linalg.norm(desc, axis=2, keepdims=True)
    uv = rng.uniform(0, 256, (N, CAP, 2)).astype(np.float32)
    fmask = np.ones((N, CAP), bool)
    return uv, desc, fmask


@pytest.fixture
def setup(tmp_path, rng):
    cfg = Config(frame_path=str(tmp_path / "frames"),
                 match_pair_path=str(tmp_path / "pairs"),
                 num_sift=CAP)
    uv, desc, fmask = _features(rng)
    artifacts.save_npz(str(tmp_path / "frames" / "frames_sift.npz"),
                       uv=uv, desc=desc, fmask=fmask)
    # contiguous-window pair proposal, as the stage would generate
    pi, pj = [], []
    for i in range(N):
        for j in range(i + 1, min(i + 3, N)):
            pi.append(i)
            pj.append(j)
    pi = np.asarray(pi, np.int32)
    pj = np.asarray(pj, np.int32)
    scfg = _sfm_config(cfg, CAP)
    pi0, pj0, matches = _match_pairs_cached(cfg, scfg, CAP, desc, fmask,
                                            pi, pj)
    assert len(pi0) == len(pi)
    return cfg, scfg, desc, fmask, pi, pj, matches


def test_add_pair_roundtrip(setup):
    cfg, scfg, desc, fmask, pi, pj, _ = setup
    out = pair_surgery.add_pair(cfg, 5, 0)  # reversed ids get sorted
    assert (int(out["pi"][-1]), int(out["pj"][-1])) == (0, 5)
    assert bool(out["extra"][-1])
    assert len(out["pi"]) == len(pi) + 1
    # the stage merge keeps the surgical pair and reuses every cached row
    pi2, pj2, m2 = _match_pairs_cached(cfg, scfg, CAP, desc, fmask, pi, pj)
    assert len(pi2) == len(pi) + 1
    assert (int(pi2[-1]), int(pj2[-1])) == (0, 5)
    # idempotent across another run
    pi3, pj3, m3 = _match_pairs_cached(cfg, scfg, CAP, desc, fmask, pi, pj)
    np.testing.assert_array_equal(pi2, pi3)
    np.testing.assert_array_equal(np.asarray(m2["idx"]), np.asarray(m3["idx"]))


def test_recompute_pairs_roundtrip(setup):
    cfg, scfg, desc, fmask, pi, pj, matches = setup
    before = artifacts.load_npz(f"{cfg.match_pair_path}/match_pairs.npz")
    out = pair_surgery.recompute_pairs(cfg, 1, 4)
    # quadratic set over [1,4] = 6 pairs; window rows inside were replaced
    inside = [(int(a), int(b)) for a, b in zip(out["pi"], out["pj"])
              if 1 <= a <= 4 and 1 <= b <= 4]
    assert sorted(inside) == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    # rows outside the range are byte-identical to before
    keymap = {(int(a), int(b)): r
              for r, (a, b) in enumerate(zip(before["pi"], before["pj"]))}
    for r, (a, b) in enumerate(zip(out["pi"], out["pj"])):
        if (int(a), int(b)) in keymap and not (1 <= a <= 4 and 1 <= b <= 4):
            np.testing.assert_array_equal(out["idx"][r],
                                          before["idx"][keymap[(a, b)]])
    # merge: proposer pairs all hit the cache; extras (1,3),(1,4),(2,4) kept
    pi2, pj2, _ = _match_pairs_cached(cfg, scfg, CAP, desc, fmask, pi, pj)
    got = set(zip(pi2.tolist(), pj2.tolist()))
    assert {(1, 3), (1, 4), (2, 4)} <= got


def test_relative_pose_cache_roundtrip(tmp_path, rng):
    """The relative-pose resume artifact (reference pairs_after_relative_pose,
    main.cpp:221-248): rows are reused across reruns and invalidated exactly
    when a pair's matches change."""
    import jax.numpy as jnp
    from panovlm_tpu.pipeline import _relative_poses_cached

    n_f, K = 4, 48
    pts = rng.uniform(-3, 3, (K, 3)).astype(np.float32)
    C = np.cumsum(rng.normal(size=(n_f, 3)).astype(np.float32) * 0.2, 0)
    bearings = np.zeros((n_f, K, 3), np.float32)
    for i in range(n_f):
        pc = pts - C[i]
        bearings[i] = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    pi = np.asarray([0, 1, 2], np.int32)
    pj = np.asarray([1, 2, 3], np.int32)
    midx = np.tile(np.arange(K, dtype=np.int32)[None, :, None], (3, 1, 2))
    mmask = np.ones((3, K), bool)
    matches = {"idx": midx, "mask": mmask}
    cfg = Config(match_pair_path=str(tmp_path / "pairs"), num_sift=K)
    scfg = _sfm_config(cfg, K)._replace(ransac_hypotheses=60, max_matches=K,
                                        min_inliers=10)

    out1 = _relative_poses_cached(cfg, scfg, jnp.asarray(bearings), matches,
                                  pi, pj)
    path = tmp_path / "pairs" / "rel_poses.npz"
    assert path.exists()

    # tamper with the cache: a rerun must read rows back verbatim
    z = dict(np.load(path))
    z["rel_aa"] = z["rel_aa"] + 1.0
    np.savez(path, **z)
    out2 = _relative_poses_cached(cfg, scfg, jnp.asarray(bearings), matches,
                                  pi, pj)
    np.testing.assert_allclose(np.asarray(out2["rel_aa"]),
                               np.asarray(out1["rel_aa"]) + 1.0)

    # change ONE pair's matches: exactly that row is re-estimated
    midx2 = midx.copy()
    midx2[1, 0, 0] = (midx2[1, 0, 0] + 1) % K
    out3 = _relative_poses_cached(cfg, scfg, jnp.asarray(bearings),
                                  {"idx": midx2, "mask": mmask}, pi, pj)
    aa3 = np.asarray(out3["rel_aa"])
    np.testing.assert_allclose(aa3[[0, 2]],
                               np.asarray(out1["rel_aa"])[[0, 2]] + 1.0)
    assert np.abs(aa3[1] - (np.asarray(out1["rel_aa"])[1] + 1.0)).max() > 0.5


def test_surgery_requires_artifacts(tmp_path):
    cfg = Config(frame_path=str(tmp_path / "nope"),
                 match_pair_path=str(tmp_path / "nope2"))
    with pytest.raises(FileNotFoundError):
        pair_surgery.add_pair(cfg, 0, 1)


def test_set_straight_motion_and_dumps(setup, tmp_path):
    """SetToStraightMotion (SfM_test.cpp:83-153) + the pose dump helpers
    (:251-292): forced pairs land in both the match cache and the
    relative-pose cache with R = I / unit -z translation; dumps write the
    reference's text formats."""
    import dataclasses
    import cv2
    cfg, scfg, desc, fmask, pi, pj, _ = setup
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "000000.png"),
                np.zeros((64, 128), np.uint8))
    cfg = dataclasses.replace(cfg, image_path=str(img_dir),
                              result_path=str(tmp_path))
    out = pair_surgery.set_straight_motion(cfg, 0, 3, 2)
    # forced pairs (0,1),(0,2),(1,2),(1,3),(2,3) present and flagged extra
    keys = set(zip(out["pi"].tolist(), out["pj"].tolist()))
    for want in ((0, 1), (0, 2), (1, 2), (1, 3), (2, 3)):
        assert want in keys
    rc = artifacts.load_npz(str(tmp_path / "pairs" / "rel_poses.npz"))
    row = {(int(a), int(b)): r for r, (a, b) in
           enumerate(zip(rc["pi"], rc["pj"]))}
    r01 = row[(0, 1)]
    np.testing.assert_allclose(rc["rel_aa"][r01], 0.0)
    np.testing.assert_allclose(rc["rel_t"][r01], [0.0, 0.0, -1.0])
    assert bool(rc["ok"][r01])

    outp = pair_surgery.dump_relative_poses(
        cfg, str(tmp_path / "rel_dump.txt"))
    txt = open(outp).read()
    assert "pair : 0 1" in txt and "good" in txt

    # global dump needs a final pose file
    from panovlm_tpu.io.artifacts import export_pose_t
    from scipy.spatial.transform import Rotation as ScR
    R = np.stack([ScR.from_euler("y", 10 * i, degrees=True).as_matrix()
                  for i in range(N)])
    t = np.zeros((N, 3))
    export_pose_t(str(tmp_path / "sfm" / "camera_pose_final.txt"), R, t)
    outg = pair_surgery.dump_global_poses(
        cfg, str(tmp_path / "glob_dump.txt"))
    lines = open(outg).read().strip().splitlines()
    assert len(lines) == N and lines[0].startswith("frame : 0")
    # frame 1 is 10 deg from frame 0's gauge
    ang1 = float(lines[1].split()[-1])
    assert abs(ang1 - 10.0) < 1e-3, ang1
