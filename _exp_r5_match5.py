"""match_descriptors at the 8096 profile count: argmin-sweep vs old top_k."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from panovlm_tpu.utils import sift

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

def timed(name, f, *a, reps=7):
    out = f(*a); sync(out)
    walls = []
    for _ in range(reps):
        t0 = time.time(); out = f(*a); sync(out); walls.append(time.time()-t0)
    med = sorted(walls)[len(walls)//2]
    print(f"{name}: {med*1000:.1f} ms", flush=True)
    return out

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
N = 8096
d1 = rng.normal(size=(N,128)).astype(np.float32); d1 /= np.linalg.norm(d1,axis=1,keepdims=True)
d2 = np.concatenate([d1[:3000] + rng.normal(size=(3000,128)).astype(np.float32)*0.08,
                     rng.normal(size=(N-3000,128)).astype(np.float32)])
d2 /= np.linalg.norm(d2,axis=1,keepdims=True)
m = np.ones(N,bool)
d1j, d2j, mj = jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m)

def old_match(d1, m1, d2, m2, ratio=0.6, max_dist_factor=0.8, max_matches=1024):
    big = jnp.asarray(1e9, jnp.float32)
    sim = jnp.einsum("ik,jk->ij", d1, d2, precision=jax.lax.Precision.HIGHEST)
    d2sq = jnp.maximum(2.0 - 2.0 * sim, 0.0)
    d2sq = jnp.where(m1[:, None] & m2[None, :], d2sq, big)
    neg, idx = jax.lax.top_k(-d2sq, 2)
    best, second = -neg[:, 0], -neg[:, 1]
    best2 = jnp.argmin(d2sq, axis=0)
    mutual = best2[idx[:, 0]] == jnp.arange(d1.shape[0])
    pass_ratio = best < (ratio ** 2) * second
    ok = pass_ratio & mutual & m1 & (best < big)
    dist = jnp.sqrt(jnp.maximum(best, 0.0))
    max_d = jnp.max(jnp.where(ok, dist, 0.0))
    ok = ok & (dist <= max_dist_factor * jnp.maximum(max_d, 1e-9))
    order = jnp.argsort(jnp.where(ok, dist, big))
    take = order[:max_matches]
    out_mask = ok[take]
    pairs = jnp.stack([take.astype(jnp.int32), idx[take, 0].astype(jnp.int32)], axis=1)
    return {"idx": jnp.where(out_mask[:, None], pairs, 0),
            "mask": out_mask, "dist": jnp.where(out_mask, dist[take], 0.0)}

f_old = jax.jit(old_match)
f_new = jax.jit(lambda a,b,c,d: sift.match_descriptors(a,b,c,d))
o = timed("old top_k match", f_old, d1j, mj, d2j, mj)
n = timed("new argmin match", f_new, d1j, mj, d2j, mj)
print("idx equal:", np.array_equal(np.asarray(o["idx"]), np.asarray(n["idx"])),
      "mask equal:", np.array_equal(np.asarray(o["mask"]), np.asarray(n["mask"])), flush=True)
