import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import synthetic
from panovlm_tpu.sensors import velodyne as vd
from panovlm_tpu.models import association

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

def timed(name, f, *a, reps=7):
    out = f(*a); sync(out)
    walls = []
    for _ in range(reps):
        t0 = time.time(); out = f(*a); sync(out); walls.append(time.time()-t0)
    med = sorted(walls)[len(walls)//2]
    print(f"{name}: {med*1000:.1f} ms = {med/32*1000:.2f} ms/scan", flush=True)
    return out

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
B = 32
scans = [synthetic.make_scan(origin=(0.05*i, 0.01*i, -1.0), noise=0.004, rng=rng)
         for i in range(B)]
padded = [vd.pad_points(vd.preprocess_cloud(s)[0], 32768) for s in scans]
pts = jnp.asarray(np.stack([p for p, _ in padded]))
msk = jnp.asarray(np.stack([m for _, m in padded]))
full = jax.jit(jax.vmap(lambda p, m: vd.extract_features(p, m)[0]))
feats = timed("FULL extract", full, pts, msk)
batch = {k: getattr(feats, k) for k in feats._fields}
poses = jnp.zeros((B, 6)).at[:, 3].set(jnp.arange(B) * 0.15)
pair_r = jnp.asarray(np.arange(B - 1), jnp.int32)
pair_n = jnp.asarray(np.arange(1, B), jnp.int32)
f_all = jax.jit(lambda b, p: association.associate_all_pairs(b, p, pair_r, pair_n))
timed("associate_all_pairs", f_all, batch, poses)
