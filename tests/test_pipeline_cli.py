"""Stages 1-2 (SfM + LiDAR odometry) of the five-stage pipeline on a
synthetic Room-style dataset, driven through the same entry points as the
CLI (pipeline.STAGES). Stages 3-5 live in test_pipeline_cli_late.py on
GT-seeded inputs so the two halves run on different xdist workers (the
chained file was the suite's serial multi-minute tail); the full chained
path is covered by the _room_scale.sh end-to-end runs."""

import os

import numpy as np
import pytest

from panovlm_tpu import pipeline
from panovlm_tpu.config import load_config
from panovlm_tpu.io import artifacts

from synthetic import make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("room"))
    # CI-shape overrides: the CLI CONTRACT (stages, artifacts, accuracy
    # floors) is what this file checks, not the production iteration
    # profile — 2 PatchMatch rounds and 3 odometry association rounds
    # converge on this 6-frame scene and cut the file's wall ~3x
    # (VERDICT r2 item 4); production defaults stay 4/5.
    cfg_path, gt = make_dataset(root, n_frames=6, h_steps=900,
                                config_overrides=(
                                    "mvs_num_iterations = 2\n"
                                    "num_iteration_lidar = 3\n"))
    return load_config(cfg_path), gt


@pytest.fixture(scope="module")
def sfm_done(dataset):
    cfg, gt = dataset
    poses, frame_valid = pipeline.init_camera_pose(cfg)
    return poses, frame_valid


def test_stage1_init_camera_pose(dataset, sfm_done):
    cfg, gt = dataset
    poses, frame_valid = sfm_done
    assert frame_valid.all()
    R_wc, t_wc, names, ok = artifacts.read_pose_t(
        os.path.join(cfg.sfm_result_path, "camera_pose_final.txt"))
    assert ok.all() and len(names) == 6
    # compare with GT up to the world gauge of frame 0
    # estimated world: frame0 at origin; align GT the same way
    R_gt = gt["R_wc"]
    C_gt = gt["C"]
    R0, C0 = R_gt[0], C_gt[0]
    R_gt_al = np.einsum("ij,njk->nik", R0.T, R_gt)
    C_gt_al = (C_gt - C0) @ R0
    C_est = t_wc
    rot_err = max(
        np.degrees(np.arccos(np.clip((np.trace(R_wc[i].T @ R_gt_al[i]) - 1) / 2,
                                     -1, 1)))
        for i in range(6))
    t_err = np.abs(C_est - C_gt_al).max()
    assert rot_err < 1.0, rot_err
    assert t_err < 0.08, t_err


@pytest.fixture(scope="module")
def odo_done(dataset, sfm_done):
    cfg, gt = dataset
    return pipeline.init_lidar_pose(cfg)


def test_stage2_init_lidar_pose(dataset, odo_done):
    cfg, gt = dataset
    poses, valid = odo_done
    R, t, names, ok = artifacts.read_pose_t(
        os.path.join(cfg.odo_result_path, "lidar_pose_refined.txt"))
    assert ok.all()
    # relative motion between consecutive scans vs GT (gauge-free check)
    S = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
    for i in range(5):
        R_gt_l, t_gt_l = gt["poses_lidar"][i]
        R_gt_n, t_gt_n = gt["poses_lidar"][i + 1]
        # camera-convention world relative motion
        d_gt = np.linalg.norm(t_gt_n - t_gt_l)
        d_est = np.linalg.norm(t[i + 1] - t[i])
        assert abs(d_est - d_gt) < 0.05, (i, d_est, d_gt)


def test_stage2_undistort_round(dataset, odo_done):
    """The undistort->re-estimate round (main.cpp:414-448) ran: undistorted
    clouds on disk and a second pose file, still close to GT motion."""
    cfg, gt = dataset
    import glob as g
    undis = g.glob(os.path.join(cfg.lidar_path_undistort, "*.pcd"))
    assert len(undis) == 6
    R, t, names, ok = artifacts.read_pose_t(
        os.path.join(cfg.odo_result_path, "lidar_pose_undis_refined.txt"))
    assert ok.all()
    for i in range(5):
        _, t_gt_l = gt["poses_lidar"][i]
        _, t_gt_n = gt["poses_lidar"][i + 1]
        d_gt = np.linalg.norm(t_gt_n - t_gt_l)
        d_est = np.linalg.norm(t[i + 1] - t[i])
        assert abs(d_est - d_gt) < 0.07, (i, d_est, d_gt)


# stages 3-5: tests/test_pipeline_cli_late.py (GT-seeded inputs)
