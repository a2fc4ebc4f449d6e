#!/bin/bash
# Clean-trajectory end-to-end accuracy run (VERDICT r1 item 5): 24 frames,
# physically consistent sweep-motion distortion (sweep_alpha = 0.5 matches
# data_gap_time = 0.1 via alpha = duration/(duration+gap)), with asserted
# accuracy thresholds at the end — camera sim3 RMSE < 12 cm, sim3 scales
# within 2.5% of metric for both camera and lidar trajectories.
# The thresholds pin the measured REGRESSION level, not an aspiration:
# the scene/step geometry is measurement-limited at ~8.7 cm by correlated
# SIFT localization drift amplified by the 0.1 m / 2.5 m baseline-to-depth
# ratio (full chain of evidence in PERF.md "Accuracy ceiling"); rotations
# are at 0.01 deg rms and scales at <2.5%.
set -u
cd /root/repo
python - <<'PYEOF'
import sys, os, shutil, time
sys.path.insert(0, "tests")
from synthetic import make_dataset
root = "/tmp/e2e_room2"
shutil.rmtree(root, ignore_errors=True)
os.makedirs(root)
make_dataset(root, n_frames=24, H=256, W=512, h_steps=1800,
             step=(0.1, 0.025, 0.0), yaw_step=0.02, sweep_alpha=0.5)
print("dataset ok", flush=True)
PYEOF
for stage in init_camera_pose init_lidar_pose joint_optimization colorize_lidar_map joint_mvs; do
  t0=$SECONDS
  timeout 4000 python -m panovlm_tpu $stage /tmp/e2e_room2/config.txt > /tmp/e2e2_$stage.log 2>&1
  echo "STAGE $stage: rc=$? $((SECONDS-t0))s"
done
python - <<'PYEOF'
import sys, numpy as np
sys.path.insert(0, "tests")
from synthetic import make_dataset
_, gt = make_dataset("/tmp/e2e_room2_gt", n_frames=24, H=64, W=128,
                     h_steps=1800, step=(0.1, 0.025, 0.0), yaw_step=0.02)
from panovlm_tpu.io import artifacts
from panovlm_tpu.utils.gps import umeyama
Cg = np.asarray(gt["C"])
S = np.array([[1.,0,0],[0,0,-1],[0,1,0]])
failures = []
for name, path, is_lidar in (
    ("joint cam", "/tmp/e2e_room2/result/joint/camera_pose_joint.txt", False),
    ("joint lidar", "/tmp/e2e_room2/result/joint/lidar_pose_joint.txt", True)):
    R, t, names, ok = artifacts.read_pose_t(path)
    C = t.copy()  # pose txt stores [R_wc | C]: t IS the world position
    if is_lidar: C = (S @ C.T).T
    n = min(len(C), len(Cg))
    s, Ra, ta = umeyama(C[:n], Cg[:n])
    err = np.linalg.norm((s*(Ra@C[:n].T).T + ta) - Cg[:n], axis=1)
    s1, R1, t1 = umeyama(C[:n], Cg[:n], with_scale=False)
    err1 = np.linalg.norm((R1@C[:n].T).T + t1 - Cg[:n], axis=1)
    rmse = np.sqrt((err**2).mean())
    print(f"{name}: sim3 RMSE {rmse:.4f} m (scale {s:.3f}); se3 RMSE {np.sqrt((err1**2).mean()):.4f} m", flush=True)
    if abs(s - 1.0) > 0.025:
        failures.append(f"{name}: sim3 scale {s:.4f} off metric by >2.5%")
    if not is_lidar and rmse > 0.12:
        failures.append(f"{name}: sim3 RMSE {rmse:.4f} m > 0.12 m")
if failures:
    print("ACCURACY FAIL:\n  " + "\n  ".join(failures), flush=True)
    sys.exit(1)
print("ACCURACY OK", flush=True)
PYEOF
# North-star falsifiability (VERDICT r3 item 5): independent per-view pixel
# noise (tests/synthetic.py make_independent_noise_scene) breaks the
# correlated-drift ceiling above; the solver chain itself must then deliver
# <1e-3 rad rotation and sub-cm sim3 position (asserted in the test).
timeout 600 python -m pytest tests/test_sfm_pipeline.py::test_solver_chain_north_star -q || {
  echo "NORTH-STAR FAIL"; exit 1; }
echo "NORTH-STAR OK (<1e-3 rad / sub-cm on independent-noise keypoints)"
