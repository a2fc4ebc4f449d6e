"""Association bisect: where do the 1.9 ms/pair go?"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import synthetic
from panovlm_tpu.sensors import velodyne as vd
from panovlm_tpu.models import association as assoc

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
B = 32
scans = [synthetic.make_scan(origin=(0.05*i, 0.01*i, -1.0), noise=0.004, rng=rng)
         for i in range(B)]
padded = [vd.pad_points(vd.preprocess_cloud(s)[0], 32768) for s in scans]
pts = jnp.asarray(np.stack([p for p, _ in padded]))
msk = jnp.asarray(np.stack([m for _, m in padded]))
extract = jax.jit(jax.vmap(lambda p, m: vd.extract_features(p, m)[0]))
feats = extract(pts, msk); sync(feats)
batch = {k: getattr(feats, k) for k in feats._fields}
n = B
poses = jnp.zeros((n, 6)).at[:, 3].set(jnp.arange(n) * 0.15)
pair_r = jnp.asarray(np.arange(n - 1), jnp.int32)
pair_n = jnp.asarray(np.arange(1, n), jnp.int32)

f_all = jax.jit(lambda b, p: assoc.associate_all_pairs(b, p, pair_r, pair_n))
timed("associate_all_pairs (31 pairs)", f_all, batch, poses)

# individual pieces, vmapped over all pairs at once
def take(i):
    return jax.tree_util.tree_map(lambda a: a[i], batch)
def p2l_only(b, poses):
    def one(r, nn):
        fr = jax.tree_util.tree_map(lambda a: a[r], b)
        fn = jax.tree_util.tree_map(lambda a: a[nn], b)
        return assoc.associate_point2line_pair(fr, fn, poses[r], poses[nn])
    return jax.lax.map(lambda p: one(p[0], p[1]), (pair_r, pair_n), batch_size=8)
timed("p2l only", jax.jit(p2l_only), batch, poses)

def p2p_only(b, poses):
    def one(r, nn):
        fr = jax.tree_util.tree_map(lambda a: a[r], b)
        fn = jax.tree_util.tree_map(lambda a: a[nn], b)
        return assoc.associate_point2plane_pair(fr, fn, poses[r], poses[nn])
    return jax.lax.map(lambda p: one(p[0], p[1]), (pair_r, pair_n), batch_size=8)
timed("p2p only", jax.jit(p2p_only), batch, poses)

# p2p internals: cdist (512x4096) + knn10 vs plane fits
def p2p_knn(b, poses):
    def one(r, nn):
        fr = jax.tree_util.tree_map(lambda a: a[r], b)
        fn = jax.tree_util.tree_map(lambda a: a[nn], b)
        q_w = assoc.to_world(poses[nn], fn["flat"])
        t_w = assoc.to_world(poses[r], fr["less_flat"])
        d2 = assoc._masked_cdist2(q_w, fn["flat_mask"], t_w, fr["less_flat_mask"])
        return assoc._knn_small(d2, 10)
    return jax.lax.map(lambda p: one(p[0], p[1]), (pair_r, pair_n), batch_size=8)
timed("p2p cdist+knn10", jax.jit(p2p_knn), batch, poses)

def p2p_fits(b, poses):
    from panovlm_tpu.ops import geometry
    def one(r, nn):
        fr = jax.tree_util.tree_map(lambda a: a[r], b)
        fn = jax.tree_util.tree_map(lambda a: a[nn], b)
        nn_local = fr["less_flat"][jnp.zeros((512, 14), jnp.int32)]
        nn_mask = jnp.ones((512, 14), bool)
        fit = jax.vmap(lambda p, m: geometry.fit_plane_lsq(p, m, tolerance=0.03))(nn_local, nn_mask)
        return fit["normal"]
    return jax.lax.map(lambda p: one(p[0], p[1]), (pair_r, pair_n), batch_size=8)
timed("p2p plane fits (512x14)", jax.jit(p2p_fits), batch, poses)

def p2l_knn(b, poses):
    def one(r, nn):
        fr = jax.tree_util.tree_map(lambda a: a[r], b)
        fn = jax.tree_util.tree_map(lambda a: a[nn], b)
        er_w = assoc.to_world(poses[r], fr["less_sharp"])
        en_w = assoc.to_world(poses[nn], fn["less_sharp"])
        d2 = assoc._masked_cdist2(en_w, fn["less_sharp_mask"], er_w, fr["less_sharp_mask"])
        return assoc._knn_small(d2, 5)
    return jax.lax.map(lambda p: one(p[0], p[1]), (pair_r, pair_n), batch_size=8)
timed("p2l cdist+knn5", jax.jit(p2l_knn), batch, poses)
