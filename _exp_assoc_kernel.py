"""Drive the Pallas association-KNN path on the real TPU: parity vs the XLA
path on the same chip + warm timing of both (B=16 temporal chain)."""
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

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
scans = [synthetic.make_scan(origin=(0.1*i, 0.02*i, -1.0), noise=0.004, rng=rng)
         for i in range(16)]
padded = [vd.pad_points(vd.preprocess_cloud(s)[0], 32768) for s in scans]
pts = jnp.asarray(np.stack([p for p, _ in padded]))
msk = jnp.asarray(np.stack([m for _, m in padded]))
extract = jax.jit(jax.vmap(lambda p, m: vd.extract_features(p, m)[0]))
feats = extract(pts, msk); sync(feats)
batch = {k: getattr(feats, k) for k in feats._fields}
n = 16
poses = jnp.zeros((n, 6)).at[:, 3].set(jnp.arange(n) * 0.15)
pair_r = jnp.asarray(np.arange(n - 1), jnp.int32)
pair_n = jnp.asarray(np.arange(1, n), jnp.int32)

def run(use_kernel):
    def one(pair):
        r, nn = pair
        fr = jax.tree_util.tree_map(lambda a: a[r], batch)
        fn = jax.tree_util.tree_map(lambda a: a[nn], batch)
        p2l = association.associate_point2line_pair(fr, fn, poses[r], poses[nn],
                                                    use_kernel=use_kernel)
        p2p = association.associate_point2plane_pair(fr, fn, poses[r], poses[nn],
                                                     use_kernel=use_kernel)
        l2l = association.associate_line2line_pair(p2l, fr, fn)
        return {"p2l": {"mask": p2l["mask"], "line_pt": p2l["line_pt"]},
                "p2p": p2p, "l2l": l2l}
    return jax.jit(lambda: jax.lax.map(one, (pair_r, pair_n), batch_size=8))

for name, uk in (("xla", False), ("kernel", True)):
    f = run(uk)
    out = f(); sync(out)
    walls = []
    for _ in range(5):
        t0 = time.time(); out = f(); sync(out); walls.append(time.time() - t0)
    med = sorted(walls)[2]
    print(f"assoc {name}: median {med*1000:.1f} ms / 15 pairs "
          f"({med/15*1000:.2f} ms/pair)", flush=True)
    if uk:
        k_out = jax.tree_util.tree_map(np.asarray, out)
    else:
        x_out = jax.tree_util.tree_map(np.asarray, out)

# parity on-chip
m_x, m_k = x_out["p2l"]["mask"], k_out["p2l"]["mask"]
print("p2l mask equal frac:", (m_x == m_k).mean())
p_x, p_k = x_out["p2p"]["mask"], k_out["p2p"]["mask"]
print("p2p mask equal frac:", (p_x == p_k).mean())
both = p_x & p_k
dpl = np.abs(x_out["p2p"]["plane"][both] - k_out["p2p"]["plane"][both]).max() if both.any() else 0
print("p2p plane max |d| on common:", dpl)
l_x, l_k = x_out["l2l"]["mask"], k_out["l2l"]["mask"]
print("l2l mask equal frac:", (l_x == l_k).mean())
