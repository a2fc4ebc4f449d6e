#!/bin/bash
# Room-scale validation run (VERDICT r1 item 4): 100 synthetic frames at
# 256x512 through all five stages, recording per-stage wall and peak RSS.
# Exercises the image-residency plan (per-chunk ref+neighbor gathers),
# the scan prefetcher, and the host-side pair loops at ~2k pairs.
set -u
cd /root/repo
N=${1:-100}
# PROFILE=1: run at the reference Room operating point (VERDICT r3 item 3)
# — MVS working resolution 720x1440 (config/Room.txt:24 scale -2 of 5.7K;
# images here are RENDERED at that resolution and scale stays 0) and
# num_sift = 8096 (config/Room.txt:42).
PROFILE=${PROFILE:-0}
if [ "$PROFILE" = "1" ]; then
  ROOT=/tmp/room_profile_$N
  IMG_H=720; IMG_W=1440; NUM_SIFT=8096
else
  ROOT=/tmp/room_scale_$N
  IMG_H=256; IMG_W=512; NUM_SIFT=2048
fi
python - <<PYEOF
import sys, os, shutil
sys.path.insert(0, "tests")
from synthetic import make_dataset
root = "$ROOT"
n = $N
# guard on config.txt (NOT gt_poses.npz): pre-existing datasets carry
# completed stage results; rm -rf the root manually to force regeneration
if not os.path.exists(os.path.join(root, "config.txt")):
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    if n > 120:
        # Long runs must LOOP inside the 6x4 m room: body-frame steps on a
        # radius-0.8 m circle (clears the y=2 wall by 0.4 m and the column
        # at (1.5,0.8) by ~0.35 m), 2.5 revolutions over n frames.
        import math
        yaw = 2.5 * 2 * math.pi / n
        make_dataset(root, n_frames=n, H=$IMG_H, W=$IMG_W, h_steps=1800,
                     step=(0.8 * yaw, 0.0, 0.0), yaw_step=yaw,
                     sweep_alpha=0.5, body_step=True)
    else:
        make_dataset(root, n_frames=n, H=$IMG_H, W=$IMG_W, h_steps=1800,
                     step=(0.04, 0.01, 0.0), yaw_step=0.01, sweep_alpha=0.5)
    # profile overrides (reference config/Room.txt keys)
    cfgp = os.path.join(root, "config.txt")
    txt = open(cfgp).read().replace("num_sift = 2048",
                                    "num_sift = $NUM_SIFT")
    open(cfgp, "w").write(txt)
print("dataset ok", flush=True)
PYEOF
for stage in init_camera_pose init_lidar_pose joint_optimization colorize_lidar_map joint_mvs; do
  t0=$SECONDS
  python - "$stage" "$ROOT/config.txt" <<'PYEOF'
import resource, subprocess, sys
stage, cfg = sys.argv[1], sys.argv[2]
with open(f"/tmp/room_{stage}.log", "w") as f:
    rc = subprocess.run([sys.executable, "-m", "panovlm_tpu", stage, cfg],
                        stdout=f, stderr=subprocess.STDOUT,
                        timeout=7000).returncode
rss_mb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss // 1024
print(f"rc={rc} peakRSS={rss_mb}MB", flush=True)
PYEOF
  echo "STAGE $stage: $((SECONDS-t0))s"
done
