"""Probe: sort-based range-image binning vs scatter-min+gather."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import synthetic
from panovlm_tpu.sensors import velodyne as vd

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

def build_range_image_sort(pts, mask, n_scans=16, horizon=1800, ring=None):
    P = pts.shape[0]
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rng = jnp.sqrt(x*x + y*y + z*z)
    if ring is None:
        vert_deg = jnp.degrees(jnp.arctan2(-y, jnp.sqrt(x*x + z*z)))
        ring = jnp.floor((vert_deg + 15.0) / 2.0 + 0.5).astype(jnp.int32)
    ring_ok = (ring >= 0) & (ring < n_scans)
    ring = jnp.clip(ring, 0, n_scans - 1)
    ori = jnp.arctan2(x, z)
    ori = jnp.where(ori < 0, ori + 2*jnp.pi, ori)
    first = jnp.argmax(mask)
    start_ori = ori[first]
    rel = jnp.mod(ori - start_ori, 2*jnp.pi)
    res = 2*jnp.pi / horizon
    col = jnp.mod(jnp.round(rel / res).astype(jnp.int32), horizon)
    rel_time = rel / (2*jnp.pi)
    ok = mask & ring_ok & (rng > 0)
    rq = jnp.clip(jnp.round(rng / 0.002), 0, 32766).astype(jnp.int32)
    SH = n_scans * horizon
    cell = ring * horizon + col
    k1 = jnp.where(ok, cell, SH)
    k2 = (rq << 16) | jnp.arange(P, dtype=jnp.int32)
    SENT2 = jnp.int32(0x7FFF << 16)
    k1_all = jnp.concatenate([k1, jnp.arange(SH, dtype=jnp.int32)])
    k2_all = jnp.concatenate([k2, jnp.full((SH,), SENT2)])
    zpad = jnp.zeros((SH,), pts.dtype)
    xs = jnp.concatenate([x, zpad]); ys = jnp.concatenate([y, zpad])
    zs = jnp.concatenate([z, zpad]); ts = jnp.concatenate([rel_time, zpad])
    k1s, k2s, xs, ys, zs, ts = jax.lax.sort(
        (k1_all, k2_all, xs, ys, zs, ts), dimension=0, num_keys=2)
    is_start = jnp.concatenate([jnp.ones((1,), bool), k1s[1:] != k1s[:-1]])
    win = is_start & (k1s < SH)
    key_c = jnp.where(win, k1s, SH)
    real = (k2s < SENT2).astype(pts.dtype)
    kc, xs, ys, zs, ts, rl = jax.lax.sort(
        (key_c, xs, ys, zs, ts, real), dimension=0, num_keys=1)
    valid = (rl[:SH] > 0.5).reshape(n_scans, horizon)
    xyz_img = jnp.where(valid[..., None],
                        jnp.stack([xs[:SH], ys[:SH], zs[:SH]], -1).reshape(n_scans, horizon, 3), 0.0)
    r_img = jnp.where(valid, jnp.linalg.norm(xyz_img, axis=-1), 0.0)
    t_img = jnp.where(valid, ts[:SH].reshape(n_scans, horizon), 0.0)
    return {"range": r_img, "xyz": xyz_img, "valid": valid, "rel_time": t_img}

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
B = 32
scans = [synthetic.make_scan(origin=(0.05*i, 0.01*i, -1.0), noise=0.004, rng=rng)
         for i in range(B)]
padded = [vd.pad_points(vd.preprocess_cloud(s)[0], 32768) for s in scans]
pts = jnp.asarray(np.stack([p for p, _ in padded]))
msk = jnp.asarray(np.stack([m for _, m in padded]))

f_old = jax.jit(jax.vmap(lambda p, m: vd.build_range_image(p, m)))
f_new = jax.jit(jax.vmap(lambda p, m: build_range_image_sort(p, m)))
o = timed("build scatter-min", f_old, pts, msk)
n = timed("build sort-based ", f_new, pts, msk)
for k in ("range", "valid", "rel_time"):
    a, b = np.asarray(o[k]), np.asarray(n[k])
    print(k, "equal:", np.array_equal(a, b))
a, b = np.asarray(o["xyz"]), np.asarray(n["xyz"])
print("xyz equal:", np.array_equal(a, b))
