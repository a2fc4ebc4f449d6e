"""Extract/assoc batch-width sweep: latency-bound loops should amortize
with B. Run on the real chip."""
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
N = 64
scans = [synthetic.make_scan(origin=(0.05*i, 0.01*i, -1.0), noise=0.004, rng=rng)
         for i in range(N)]
padded = [vd.pad_points(vd.preprocess_cloud(s)[0], 32768) for s in scans]
pts_all = np.stack([p for p, _ in padded]); msk_all = np.stack([m for _, m in padded])
extract = jax.jit(jax.vmap(lambda p, m: vd.extract_features(p, m)[0]))

for B in (16, 32, 64):
    pts = jnp.asarray(pts_all[:B]); msk = jnp.asarray(msk_all[:B])
    out = extract(pts, msk); sync(out)
    walls = []
    for _ in range(5):
        t0 = time.time(); out = extract(pts, msk); sync(out)
        walls.append(time.time() - t0)
    med = sorted(walls)[2]
    print(f"extract B={B:3d}: {med*1000:.1f} ms = {med/B*1000:.2f} ms/scan", flush=True)
feats = extract(jnp.asarray(pts_all), jnp.asarray(msk_all))
batch = {k: getattr(feats, k) for k in feats._fields}

for W in (8, 16, 32):
    n = 33
    poses = jnp.zeros((n, 6)).at[:, 3].set(jnp.arange(n) * 0.15)
    pair_r = jnp.asarray(np.arange(n - 1), jnp.int32)
    pair_n = jnp.asarray(np.arange(1, n), jnp.int32)
    bt = jax.tree_util.tree_map(lambda a: a[:n], batch)
    f = jax.jit(lambda: jax.lax.map(
        lambda pr: association.associate_all_pairs_body(bt, poses, pr),
        (pair_r, pair_n), batch_size=W)) if hasattr(association, "associate_all_pairs_body") else None
    # use the public API with monkeypatched batch size via direct lax.map
    def one(pair):
        r, nn = pair
        fr = jax.tree_util.tree_map(lambda a: a[r], bt)
        fn = jax.tree_util.tree_map(lambda a: a[nn], bt)
        p2l = association.associate_point2line_pair(fr, fn, poses[r], poses[nn])
        p2p = association.associate_point2plane_pair(fr, fn, poses[r], poses[nn])
        l2l = association.associate_line2line_pair(p2l, fr, fn)
        return {"p2l": {"mask": p2l["mask"]}, "p2p": {"mask": p2p["mask"]},
                "l2l": {"mask": l2l["mask"]}}
    g = jax.jit(lambda: jax.lax.map(one, (pair_r, pair_n), batch_size=W))
    out = g(); sync(out)
    walls = []
    for _ in range(5):
        t0 = time.time(); out = g(); sync(out); walls.append(time.time() - t0)
    med = sorted(walls)[2]
    print(f"assoc W={W:3d}: {med*1000:.1f} ms / 32 pairs = {med/32*1000:.2f} ms/pair", flush=True)
