"""Evaluate a room-scale synthetic run against its ground-truth trajectory.

Usage: python _eval_room.py <dataset_root> [step_x,step_y,step_z] [yaw_step]

Preferred GT source: <root>/gt_poses.npz, written by
tests/synthetic.make_dataset (handles both world-frame-step and body-frame
loop trajectories). Fallback for datasets generated before that existed:
recompute the closed-form world-frame-step GT (R_i = yaw(yaw_step*i),
t_i = step*i + origin, origin=(0,0,-1)). Reports sim3 / se3 RMSE for every
stage pose artifact present under <root>/result.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from panovlm_tpu.io import artifacts          # noqa: E402
from panovlm_tpu.utils.gps import umeyama     # noqa: E402

root = sys.argv[1]
S = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])

gt_npz = os.path.join(root, "gt_poses.npz")
if os.path.exists(gt_npz):
    gt = np.load(gt_npz)
    Cg_all = gt["C"]                      # camera-convention centers
else:
    step = np.array([float(x) for x in (sys.argv[2] if len(sys.argv) > 2
                                        else "0.04,0.01,0.0").split(",")])
    n_max = len([f for f in os.listdir(os.path.join(root, "images"))
                 if f.endswith(".png")])
    tg = step[None, :] * np.arange(n_max)[:, None] + np.array([0., 0., -1.])
    Cg_all = (S @ tg.T).T

CANDIDATES = [
    ("sfm cam", "sfm/camera_pose_sfm.txt", False),
    ("sfm cam final", "sfm/camera_pose_final.txt", False),
    ("odometry lidar", "odometry/lidar_pose_undis_refined.txt", True),
    ("joint cam", "joint/camera_pose_joint.txt", False),
    ("joint lidar", "joint/lidar_pose_joint.txt", True),
    ("mvs refined cam", "mvs/camera_pose_after_refine.txt", False),
]

for name, rel, is_lidar in CANDIDATES:
    path = os.path.join(root, "result", rel)
    if not os.path.exists(path):
        continue
    R, t, names, ok = artifacts.read_pose_t(path)
    n = len(R)
    # pose txt stores [R_wc | C]: the t column IS the world position
    # (export_pose_t receives params_to_world output, pipeline.py)
    C = t[ok]
    if is_lidar:
        C = (S @ C.T).T
    Cg = Cg_all[:n][ok]
    s, Ra, ta = umeyama(C, Cg)
    err = np.linalg.norm((s * (Ra @ C.T).T + ta) - Cg, axis=1)
    s1, R1, t1 = umeyama(C, Cg, with_scale=False)
    err1 = np.linalg.norm((R1 @ C.T).T + t1 - Cg, axis=1)
    print(f"{name}: n={n} sim3 RMSE {np.sqrt((err**2).mean()):.4f} m "
          f"(scale {s:.4f}); se3 RMSE {np.sqrt((err1**2).mean()):.4f} m",
          flush=True)
