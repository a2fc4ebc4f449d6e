"""On-chip experiment: where the odometry solve wall lives (VERDICT r3 #2).

Room-100 init_lidar_pose spent 659 s in estimate_poses (5 association
rounds x solve_lm_chunked). This builds ONE production-shaped round
(N scans, real extracted features, real neighbor graph + association)
and times its pieces separately:
  * association program (all pairs)
  * solve_lm_chunked (20 LM iters, chunk=5) — the dense-tier solve
  * per-chunk split, so tunnel dispatch vs device time is attributable

Run on the real chip when it is otherwise idle:
    python _exp_odom.py [n_scans]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "tests")
import synthetic  # noqa: E402

from panovlm_tpu import pipeline  # noqa: E402
from panovlm_tpu.models import association, lidar_odometry  # noqa: E402
from panovlm_tpu.solver import LMOptions, solve_lm_chunked  # noqa: E402


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
print("backend:", jax.default_backend(), flush=True)

scans, gt = synthetic.make_trajectory_scans(
    n_scans=n, step=(0.04, 0.01, 0.0), yaw_step=0.01, sweep_alpha=0.0,
    h_steps=1800)
t0 = time.time()
batch = pipeline.extract_all_features(scans, cap=pipeline._scan_cap(scans))
sync(batch)
print(f"extract: {time.time() - t0:.1f} s ({n} scans)", flush=True)

# noisy init (the sfm seed the production stage starts from)
rng = np.random.default_rng(0)
poses0 = np.zeros((n, 6), np.float32)
from scipy.spatial.transform import Rotation as ScR  # noqa: E402
for i, (R_wl_i, t_wl_i) in enumerate(gt):
    R_lw = np.asarray(R_wl_i).T
    poses0[i, :3] = ScR.from_matrix(R_lw).as_rotvec()
    poses0[i, 3:] = -R_lw @ np.asarray(t_wl_i)
poses0[:, :3] += rng.normal(size=(n, 3)).astype(np.float32) * 0.01
poses0[:, 3:] += rng.normal(size=(n, 3)).astype(np.float32) * 0.03
valid = np.ones(n, bool)

poses = jnp.asarray(poses0)
t0 = time.time()
pr, pn = association.find_neighbors(poses, valid, k=6)
print(f"find_neighbors: {time.time() - t0:.2f} s ({len(pr)} pairs)",
      flush=True)

pair_r, pair_n, pair_valid = lidar_odometry._pad_pairs(pr, pn)
t0 = time.time()
assoc = association.associate_all_pairs(batch, poses, pair_r, pair_n)
sync(assoc)
t_compile = time.time() - t0
t0 = time.time()
assoc = association.associate_all_pairs(batch, poses, pair_r, pair_n)
sync(assoc)
t_assoc = time.time() - t0
print(f"associate_all_pairs: compile+run {t_compile:.1f} s, "
      f"warm {t_assoc:.1f} s ({pair_r.shape[0]} padded pairs)", flush=True)

blocks = lidar_odometry.build_blocks(assoc, pair_r, pair_n, pair_valid)
M = sum(b.mask.shape[0] for b in blocks)
print(f"blocks: {[b.mask.shape[0] for b in blocks]} obs rows (total {M})",
      flush=True)

fixed = {"poses": jnp.zeros((n, 6), bool).at[0].set(True)}
opts = LMOptions(max_iters=20)
t0 = time.time()
out, info = solve_lm_chunked({"poses": poses}, blocks, fixed, opts, chunk=5)
t_first = time.time() - t0
print(f"solve_lm_chunked 20 iters: first (incl compile) {t_first:.1f} s, "
      f"iters={int(info['iterations'])} cost {float(info['initial_cost']):.4f}"
      f" -> {float(info['final_cost']):.4f}", flush=True)

# warm repeat: per-chunk wall
t0 = time.time()
out, info = solve_lm_chunked({"poses": poses}, blocks, fixed, opts, chunk=5)
t_warm = time.time() - t0
it = max(int(info["iterations"]), 1)
print(f"warm solve: {t_warm:.1f} s total, {it} iters "
      f"-> {t_warm / it * 1000:.0f} ms/LM-iter", flush=True)

# Co-residency alternation (VERDICT r3 weak #4): the production round runs
# association and the LM solve programs alternately in ONE process. Re-time
# association now that the solve executables are resident, and the solve
# again after association — if the axon runtime thrashes co-resident
# executables (extract 0.3 -> 89 ms documented in bench.py), these walls
# will differ from the one-resident measurements above.
t0 = time.time()
assoc = association.associate_all_pairs(batch, poses, pair_r, pair_n)
sync(assoc)
t_assoc2 = time.time() - t0
print(f"assoc co-resident (after solve): {t_assoc2:.1f} s "
      f"(one-resident was {t_assoc:.1f} s)", flush=True)
t0 = time.time()
out, info = solve_lm_chunked({"poses": poses}, blocks, fixed, opts, chunk=5)
t_warm2 = time.time() - t0
print(f"solve co-resident (after assoc): {t_warm2:.1f} s "
      f"(one-resident was {t_warm:.1f} s)", flush=True)
