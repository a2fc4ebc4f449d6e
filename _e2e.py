"""Integration-scale TPU run: 24 frames at 256x512, all five stages."""
import sys, os, time, shutil
sys.path.insert(0, "tests")
from synthetic import make_dataset
root = "/tmp/e2e_room"
t0 = time.time()
os.makedirs(root, exist_ok=True)
# deterministic: rewrites identical inputs, leaves result/ intact (resume)
cfg_path, gt = make_dataset(root, n_frames=24, H=256, W=512, h_steps=1800)
print("dataset gen: %.0fs" % (time.time() - t0), flush=True)
from panovlm_tpu import pipeline
from panovlm_tpu.config import load_config
cfg = load_config(cfg_path)
import jax
print("backend:", jax.default_backend(), flush=True)
for stage in ("init_lidar_pose", "joint_optimization",
              "colorize_lidar_map", "joint_mvs"):
    t0 = time.time()
    pipeline.STAGES[stage](cfg)
    print(f"STAGE {stage}: {time.time()-t0:.0f}s", flush=True)
# GT pose error
import numpy as np
from panovlm_tpu.io import artifacts
R, t, names, ok = artifacts.read_pose_t(os.path.join(cfg.joint_result_path, "camera_pose_joint.txt"))
C = np.stack([-R[i].T @ t[i] for i in range(len(R))])
Cg = np.asarray(gt["C"])[:len(C)]
# similarity align (scale+R+t) then RMSE
from panovlm_tpu.utils.gps import umeyama
s, Ra, ta = umeyama(C, Cg)
err = np.linalg.norm((s * (Ra @ C.T).T + ta) - Cg, axis=1)
print("camera center RMSE vs GT after sim3 align: %.4f m (traj %.1f m)" %
      (float(np.sqrt((err**2).mean())), float(np.linalg.norm(np.diff(Cg,axis=0),axis=1).sum())), flush=True)
