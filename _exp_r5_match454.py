"""Production-shaped match phase at Room-454 profile scale (VERDICT r4
item 3 'Done' condition): N=454 frames x 8096 features, the same
match_all_pairs chunking the pipeline's _match_pairs_cached runs, over a
pair list the size of the round-4 production run (~5000 pairs: temporal
window + VLAD loop pairs). Round 4 measured this phase at 782 s
(156 ms/pair); the argmin-sweep top-2 rewrite projected ~350 s."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from panovlm_tpu.models import sfm

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
N, F = 454, 8096
# correlated descriptors: each frame perturbs a shared base so the ratio
# test does real work (matches + rejections both exercised)
base = rng.normal(size=(F, 128)).astype(np.float32)
desc = np.empty((N, F, 128), np.float32)
for i in range(N):
    d = base + 0.35 * rng.normal(size=base.shape).astype(np.float32)
    desc[i] = d / np.linalg.norm(d, axis=1, keepdims=True)
fmask = np.ones((N, F), bool)

# pair graph at the production scale: +/-1..5 temporal window + loop pairs
pairs = set()
for i in range(N):
    for d in range(1, 6):
        if i + d < N:
            pairs.add((i, i + d))
# loop closures across revolutions (181 frames/rev)
for i in range(N):
    for d in (179, 180, 181, 182, 362, 363):
        if i + d < N:
            pairs.add((i, i + d))
pi = np.asarray(sorted(p[0] for p in pairs), np.int32)
pj = np.asarray([p[1] for p in sorted(pairs)], np.int32)
print(f"pairs: {len(pi)}", flush=True)

scfg = sfm.SfMConfig(max_matches=1024)
desc_j, fmask_j = jnp.asarray(desc), jnp.asarray(fmask)

# warm the program on a small slice first (compile excluded from the wall)
mm = sfm.match_all_pairs(desc_j, fmask_j, pi[:32], pj[:32], scfg)
sync(mm)
t0 = time.time()
done = 0
for s in range(0, len(pi), 1024):
    mm = sfm.match_all_pairs(desc_j, fmask_j, pi[s:s+1024], pj[s:s+1024], scfg)
    sync(mm)
    done += len(pi[s:s+1024])
    print(f"  {done}/{len(pi)} pairs, {time.time()-t0:.1f} s", flush=True)
wall = time.time() - t0
print(f"match phase: {wall:.1f} s for {len(pi)} pairs = "
      f"{wall/len(pi)*1000:.1f} ms/pair "
      f"(round-4 production: 782 s / 156 ms/pair)", flush=True)
