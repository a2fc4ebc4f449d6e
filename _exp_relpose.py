"""On-chip experiment: relative_poses pair_vmap_width sweep.

The Room-454 sfm profile spends 866 s in the relative-poses phase
(~0.22 s/pair of device time at 32-pair chunks). The per-pair RANSAC+LM
ops are tiny and latency-bound; this measures wall per pair vs the vmap
width of the lax.map body to pick a production default.

Run on the real chip when it is otherwise idle:
    python _exp_relpose.py [widths...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from scipy.spatial.transform import Rotation as ScR

from panovlm_tpu.models import sfm

rng = np.random.default_rng(3)
n_frames, n_points = 33, 1024          # one 32-pair chunk of consecutive pairs
pts = rng.uniform(-3, 3, (n_points, 3)).astype(np.float32)
aa = (rng.normal(size=(n_frames, 3)) * 0.05).astype(np.float32)
aa[0] = 0
C = np.cumsum(rng.normal(size=(n_frames, 3)) * 0.1, 0).astype(np.float32)
C[0] = 0
R = ScR.from_rotvec(aa).as_matrix().astype(np.float32)
t = -np.einsum("nij,nj->ni", R, C)
bearings = np.zeros((n_frames, n_points, 3), np.float32)
for i in range(n_frames):
    pc = pts @ R[i].T + t[i]
    b = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    b += rng.normal(size=b.shape).astype(np.float32) * 2e-4
    bearings[i] = b / np.linalg.norm(b, axis=1, keepdims=True)
pi = np.arange(32, dtype=np.int32)
pj = pi + 1
midx = np.tile(np.arange(n_points, dtype=np.int32)[None, :, None], (32, 1, 2))
mmask = np.ones((32, n_points), bool)

print("backend:", jax.default_backend(), flush=True)
widths = [int(w) for w in sys.argv[1:]] or [2, 8, 16, 32]
base = None
for w in widths:
    cfg = sfm.SfMConfig(ransac_hypotheses=300, max_matches=n_points,
                        pair_vmap_width=w)
    walls = []
    for rep in range(3):
        t0 = time.time()
        out = sfm.relative_poses(jnp.asarray(bearings), jnp.asarray(midx),
                                 jnp.asarray(mmask), jnp.asarray(pi),
                                 jnp.asarray(pj), cfg)
        # sync: device->host of a result-dependent element (bench.py:_sync)
        ok = np.asarray(out["ok"])
        aa_out = np.asarray(out["rel_aa"])
        walls.append(time.time() - t0)
    med = sorted(walls)[1]
    print(f"width {w:3d}: walls {['%.2f' % x for x in walls]} "
          f"median {med:.2f}s = {med / 32 * 1000:.0f} ms/pair  ok={ok.sum()}/32",
          flush=True)
    if base is None:
        base = aa_out
    else:
        print(f"   max |d rel_aa| vs width {widths[0]}: "
              f"{np.abs(aa_out - base).max():.2e}", flush=True)
