#!/bin/bash
# Floor-scale validation run (VERDICT r4 item 6): 1593 synthetic frames —
# the reference Floor dataset's frame count (/root/reference/README.md:80)
# — at 256x512 through all five stages, recording per-stage wall and peak
# RSS. The point is the operating envelope at 3.5x Room-454: pair graph,
# VLAD loop selection, track builder, match/rel-pose caches, residency
# plan, and the host-memory budget all exercised past their largest
# previous run. Trajectory: the Room loop generator with revolutions
# scaled to keep Room-454's inter-frame spacing (2.5 rev * n/454), so
# per-pair baselines and association locality stay comparable and loop
# closures span ~9 revolutions.
set -u
cd /root/repo
N=${1:-1593}
ROOT=/tmp/floor_scale_$N
IMG_H=256; IMG_W=512
python - <<PYEOF
import sys, os, shutil, math
sys.path.insert(0, "tests")
from synthetic import make_dataset
root = "$ROOT"
n = $N
if not os.path.exists(os.path.join(root, "config.txt")):
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    revs = 2.5 * n / 454.0
    yaw = revs * 2 * math.pi / n
    make_dataset(root, n_frames=n, H=$IMG_H, W=$IMG_W, h_steps=1800,
                 step=(0.8 * yaw, 0.0, 0.0), yaw_step=yaw,
                 sweep_alpha=0.5, body_step=True)
print("dataset ok", flush=True)
PYEOF
for stage in init_camera_pose init_lidar_pose joint_optimization colorize_lidar_map joint_mvs; do
  t0=$SECONDS
  python - "$stage" "$ROOT/config.txt" <<'PYEOF'
import resource, subprocess, sys
stage, cfg = sys.argv[1], sys.argv[2]
with open(f"/tmp/floor_{stage}.log", "w") as f:
    rc = subprocess.run([sys.executable, "-m", "panovlm_tpu", stage, cfg],
                        stdout=f, stderr=subprocess.STDOUT,
                        timeout=14000).returncode
rss_mb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss // 1024
print(f"rc={rc} peakRSS={rss_mb}MB", flush=True)
PYEOF
  echo "STAGE $stage: $((SECONDS-t0))s"
done
