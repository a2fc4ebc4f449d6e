"""Bisect the relative-pose per-pair wall: AC-RANSAC vs CheckRT/decompose
vs two-view refinement, 32-pair batches on the real chip."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScR
from panovlm_tpu.ops import epipolar, se3
from panovlm_tpu.solver import two_view_refine

rng = np.random.default_rng(3)
n_frames, M = 33, 1024
pts = rng.uniform(-3, 3, (M, 3)).astype(np.float32)
aa = (rng.normal(size=(n_frames, 3)) * 0.05).astype(np.float32); aa[0] = 0
C = np.cumsum(rng.normal(size=(n_frames, 3)) * 0.1, 0).astype(np.float32); C[0] = 0
R = ScR.from_rotvec(aa).as_matrix().astype(np.float32)
t = -np.einsum("nij,nj->ni", R, C)
bear = np.zeros((n_frames, M, 3), np.float32)
for i in range(n_frames):
    pc = pts @ R[i].T + t[i]
    b = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    b += rng.normal(size=b.shape).astype(np.float32) * 2e-4
    bear[i] = b / np.linalg.norm(b, axis=1, keepdims=True)
b1 = jnp.asarray(bear[:32]); b2 = jnp.asarray(bear[1:33])
mask = jnp.ones((32, M), bool)

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

def timed(name, fn, *args):
    out = fn(*args); sync(out)
    walls = []
    for _ in range(3):
        t0 = time.time(); out = fn(*args); sync(out); walls.append(time.time() - t0)
    med = sorted(walls)[1]
    print(f"{name}: {med*1000:.0f} ms / 32 pairs = {med/32*1000:.1f} ms/pair", flush=True)
    return out

print("backend:", jax.default_backend(), flush=True)

ransac = jax.jit(jax.vmap(lambda a, b, m, f: epipolar.find_essential_acransac(
    a, b, m, n_hyp=300, fold=f)))
folds = jnp.arange(32, dtype=jnp.int32)
r = timed("acransac", ransac, b1, b2, mask, folds)

bestpose = jax.jit(jax.vmap(lambda E, a, b, i: epipolar.best_pose_from_essential(E, a, b, i)))
p = timed("decompose+check_rt", bestpose, r["E"], b1, b2, r["inliers"])

def tv(aa0, t0, ptsi, a, b, good):
    pose, pts_o, cost = two_view_refine(jnp.concatenate([aa0, t0]), ptsi, a, b,
                                        good, float(np.radians(1.0)), max_iters=10)
    return pose, cost
tvj = jax.jit(jax.vmap(tv))
aa0 = jax.vmap(se3.log_so3)(p["R_21"])
timed("two_view_refine", tvj, aa0, p["t_21"], p["points"], b1, b2, p["good"])

# sub-bisect ransac: residuals only vs +nfa
res_only = jax.jit(jax.vmap(lambda a, b, m, f: epipolar.epipolar_residuals(
    epipolar.eight_point(a[epipolar_samples(f)], b[epipolar_samples(f)]),
    a[None], b[None]).sum()))
def epipolar_samples(f):
    key = jax.random.fold_in(jax.random.PRNGKey(0), f)
    return jax.random.randint(key, (300, 8), 0, M)
timed("8pt+residuals only", res_only, b1, b2, mask, folds)

nfa_only = jax.jit(jax.vmap(lambda r_, m: jax.vmap(
    lambda rr: epipolar.acransac_nfa(rr, m))(r_)))
res = jax.vmap(lambda a, b, f: epipolar.epipolar_residuals(
    epipolar.eight_point(a[epipolar_samples(f)], b[epipolar_samples(f)]),
    a[None], b[None]))(b1, b2, folds)
res = jax.device_put(res)
timed("nfa (sort) only", nfa_only, res, mask)
