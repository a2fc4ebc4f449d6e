"""match_descriptors at the profile scale (8096 features): kernel vs XLA
on the real chip, plus the production match_all_pairs chunk wall."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from panovlm_tpu.utils import sift as hs

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
F = 8096
base = rng.normal(size=(F, 128)).astype(np.float32)
base /= np.linalg.norm(base, axis=1, keepdims=True)
d2_ = base + 0.05 * rng.normal(size=base.shape).astype(np.float32)
d2_ /= np.linalg.norm(d2_, axis=1, keepdims=True)
d1 = jnp.asarray(base); d2 = jnp.asarray(d2_)
m = jnp.ones((F,), bool)

for uk in (True, False):
    f = lambda: hs.match_descriptors(d1, m, d2, m, max_matches=1024,
                                     use_kernel=uk)
    out = f(); sync(out)
    walls = []
    for _ in range(5):
        t0 = time.time(); out = f(); sync(out); walls.append(time.time()-t0)
    med = sorted(walls)[2]
    print(f"match 8096 use_kernel={uk}: {med*1000:.1f} ms/pair "
          f"(matches={int(np.asarray(out['mask']).sum())})", flush=True)

# batched production shape: match_all_pairs on a 16-frame window
from panovlm_tpu.models import sfm
desc = np.stack([base + 0.05*rng.normal(size=base.shape).astype(np.float32)
                 for _ in range(16)])
desc /= np.linalg.norm(desc, axis=2, keepdims=True)
fmask = np.ones((16, F), bool)
cfg = sfm.SfMConfig(max_matches=1024)
pi = np.arange(15, dtype=np.int32); pj = pi + 1
t0 = time.time()
out = sfm.match_all_pairs(jnp.asarray(desc), jnp.asarray(fmask), pi, pj, cfg)
sync(out)
t1 = time.time()
out = sfm.match_all_pairs(jnp.asarray(desc), jnp.asarray(fmask), pi, pj, cfg)
sync(out)
print(f"match_all_pairs 15 pairs: first {t1-t0:.1f} s, warm {time.time()-t1:.1f} s"
      f" = {(time.time()-t1)/15*1000:.0f} ms/pair", flush=True)
