"""Bisect extract_features stages on the real chip (B=32)."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import synthetic
from panovlm_tpu.sensors import velodyne as vd
from panovlm_tpu.sensors import lidar_lines

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

def timed(name, f, *a):
    out = f(*a); sync(out)
    walls = []
    for _ in range(5):
        t0 = time.time(); out = f(*a); sync(out); walls.append(time.time()-t0)
    med = sorted(walls)[2]
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

def stage_img(p, m):
    img = vd.build_range_image(p, m)
    ground = vd.mark_ground(img)
    _, keep = vd.segment_range_image(img["range"], img["valid"])
    keep = keep | ground
    img = dict(img, valid=keep, range=jnp.where(keep, img["range"], 0.0),
               xyz=jnp.where(keep[..., None], img["xyz"], 0.0))
    img["ground"] = ground & img["valid"]
    return img

f1 = jax.jit(jax.vmap(stage_img))
img = timed("range+ground+segment", f1, pts, msk)

f2 = jax.jit(jax.vmap(vd.compact_rows))
seq = timed("compact_rows", f2, img)

def stage_curv(seq):
    curv, m, wok = vd.adaptive_curvature(seq)
    vang = vd.view_angles(seq, m)
    return curv, m, wok, vang
f3 = jax.jit(jax.vmap(stage_curv))
cmv = timed("curvature+view_angles", f3, seq)

def stage_picks(seq, curv, wok, vang):
    sec, interior = vd._sector_ids(seq)
    edge_eligible = (interior & wok & ~seq["ground"] & (curv > 0.1)
                     & (curv <= 5.0) & (vang >= 5.0) & (vang <= 175.0))
    return vd.greedy_pick(seq, curv, edge_eligible, n_picks=30)
f4 = jax.jit(jax.vmap(lambda seq, c: stage_picks(seq, c[0], c[2], c[3])))
picks = timed("greedy_pick(edges,30)", f4, seq, cmv)

def stage_lines(seq, picks):
    picked, rank, disabled, eidx, eok = picks
    ep, em, erow = vd.picks_to_buffer(seq, eidx, eok, vd.CAP_EDGE)[:3]
    return lidar_lines.extract_lines(ep, em)
f5 = jax.jit(jax.vmap(stage_lines))
lines = timed("line growth", f5, seq, picks)

full = jax.jit(jax.vmap(lambda p, m: vd.extract_features(p, m)[0]))
timed("FULL extract", full, pts, msk)
