#!/bin/bash
cd /root/repo
python - <<'PYEOF'
import sys, os, shutil, time
sys.path.insert(0, "tests")
from synthetic import make_dataset
root = "/tmp/e2e_room"
shutil.rmtree(root, ignore_errors=True)
os.makedirs(root)
t0 = time.time()
make_dataset(root, n_frames=24, H=256, W=512, h_steps=1800)
print("dataset gen: %.0fs" % (time.time()-t0), flush=True)
PYEOF
for stage in init_camera_pose init_lidar_pose joint_optimization colorize_lidar_map joint_mvs; do
  t0=$SECONDS
  timeout 3000 python -m panovlm_tpu $stage /tmp/e2e_room/config.txt > /tmp/e2e_$stage.log 2>&1
  rc=$?
  echo "STAGE $stage: rc=$rc $((SECONDS-t0))s"
done
python - <<'PYEOF'
import sys, os, numpy as np
sys.path.insert(0, "tests")
from synthetic import make_dataset
_, gt = make_dataset("/tmp/e2e_room_gt", n_frames=24, H=64, W=128, h_steps=1800)
from panovlm_tpu.io import artifacts
from panovlm_tpu.utils.gps import umeyama
R, t, names, ok = artifacts.read_pose_t("/tmp/e2e_room/result/joint/camera_pose_joint.txt")
C = np.stack([-R[i].T @ t[i] for i in range(len(R))])
Cg = np.asarray(gt["C"])[:len(C)]
s, Ra, ta = umeyama(C, Cg)
err = np.linalg.norm((s * (Ra @ C.T).T + ta) - Cg, axis=1)
print("camera center RMSE vs GT (sim3): %.4f m" % float(np.sqrt((err**2).mean())), flush=True)
PYEOF
