"""Stages 3-5 (joint optimization, colorize, MVS) on GT-seeded stage-1/2
artifacts — the second half of the five-stage CLI contract, split into its
own file so xdist schedules it on a different worker than the stage-1/2
file (the chained file was the suite's serial multi-minute tail). The
seeded state is geometrically exact (synthetic.seed_sfm_state), so these
tests check each late stage's own contract against known-good inputs;
the full chained path stays covered by tests/test_pipeline_cli.py's
stages 1-2 plus the _room_scale.sh end-to-end runs."""

import os

import numpy as np
import pytest

from panovlm_tpu import pipeline
from panovlm_tpu.config import load_config
from panovlm_tpu.io import artifacts

from synthetic import make_dataset, seed_sfm_state, render_panorama


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("room_late"))
    cfg_path, gt = make_dataset(root, n_frames=6, h_steps=900,
                                config_overrides=(
                                    "mvs_num_iterations = 2\n"
                                    "num_iteration_lidar = 3\n"))
    cfg = load_config(cfg_path)
    seed_sfm_state(cfg, gt)
    return cfg, gt


@pytest.fixture(scope="module")
def joint_done(dataset):
    cfg, gt = dataset
    return pipeline.joint_optimization(cfg)


def test_stage3_joint_optimization(dataset, joint_done):
    cfg, gt = dataset
    cam_poses, lidar_poses = joint_done
    assert np.isfinite(cam_poses).all() and np.isfinite(lidar_poses).all()
    assert os.path.exists(os.path.join(cfg.joint_result_path,
                                       "camera_pose_joint.txt"))
    # the seeded poses are GT: the joint solve must not walk away from them
    R, t, _, ok = artifacts.read_pose_t(
        os.path.join(cfg.joint_result_path, "camera_pose_joint.txt"))
    assert ok.all()
    err = np.abs(t - gt["C"]).max()
    assert err < 0.08, err


def test_stage4_colorize(dataset, joint_done):
    cfg, gt = dataset
    fused, fmask = pipeline.colorize_lidar_map(cfg)
    assert int(fmask.sum()) > 5000
    assert os.path.exists(os.path.join(cfg.texture_result_path,
                                       "colorized_map.pcd"))


def test_stage5_joint_mvs(dataset, joint_done):
    cfg, gt = dataset
    depths, confs = pipeline.joint_mvs(cfg)
    assert os.path.exists(os.path.join(cfg.mvs_result_path, "mvs_fused.pcd"))
    # depth quality vs GT render for frame 0
    _, d_gt = render_panorama(gt["C"][0], depths.shape[1], depths.shape[2],
                              R_wc=gt["R_wc"][0])
    have = depths[0] > 0
    rel = np.abs(depths[0] - d_gt)[have & np.isfinite(d_gt)] / \
        d_gt[have & np.isfinite(d_gt)]
    assert np.median(rel) < 0.08, np.median(rel)
