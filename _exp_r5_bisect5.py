"""Round-5 finer bisect: propagation vs stats vs picks vs lines (B=32)."""
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
    for _ in range(7):
        t0 = time.time(); out = f(*a); sync(out); walls.append(time.time()-t0)
    med = sorted(walls)[3]
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

f0 = jax.jit(jax.vmap(lambda p, m: vd.build_range_image(p, m)))
img0 = timed("build_range_image", f0, pts, msk)
fg = jax.jit(jax.vmap(vd.mark_ground))
timed("mark_ground", fg, img0)

# segmentation split: propagation only vs stats only
import functools
def seg_prop(r_img, valid, iters=4, theta_deg=20.0):
    S, H = r_img.shape
    alpha_x = jnp.float32(np.radians(0.2)); alpha_y = jnp.float32(np.radians(2.0))
    theta = jnp.float32(np.radians(theta_deg))
    def connected(ra, rb, alpha):
        d1 = jnp.maximum(ra, rb); d2 = jnp.minimum(ra, rb)
        return jnp.arctan2(d2*jnp.sin(alpha), d1-d2*jnp.cos(alpha)) > theta
    left = jnp.roll(r_img, 1, axis=1); left_ok = jnp.roll(valid, 1, axis=1)
    conn_left = connected(r_img, left, alpha_x) & valid & left_ok
    up = jnp.concatenate([jnp.zeros_like(r_img[:1]), r_img[:-1]], axis=0)
    up_ok = jnp.concatenate([jnp.zeros_like(valid[:1]), valid[:-1]], axis=0)
    conn_up = connected(r_img, up, alpha_y) & valid & up_ok
    lab_t = jnp.int16
    lin = jnp.arange(S*H, dtype=lab_t).reshape(S, H)
    big = jnp.asarray(S*H, lab_t)
    labels = jnp.where(valid, lin, big)
    conn_row = conn_left.at[:, 0].set(False)
    def body(_, lab):
        lab = vd._seg_run_min(lab, conn_row, axis=1, big=big)
        wrap = conn_left[:, 0]
        lab = lab.at[:, 0].min(jnp.where(wrap, lab[:, -1], big))
        lab = lab.at[:, -1].min(jnp.where(wrap, lab[:, 0], big))
        lab = vd._seg_run_min(lab, conn_up, axis=0, big=big)
        return jnp.where(valid, lab, big)
    labels = jax.lax.fori_loop(0, iters, body, labels)
    return labels.astype(jnp.int32)

fp = jax.jit(jax.vmap(lambda img: seg_prop(img["range"], img["valid"])))
labels = timed("seg propagation only", fp, img0)

def seg_stats(labels, valid):
    S, H = valid.shape
    flat = labels.ravel()
    sizes = jnp.zeros((S*H+1,), jnp.int32).at[flat].add(valid.ravel())
    rows_present = jnp.zeros((S*H+1,), jnp.int32)
    for r in range(S):
        pres = jnp.zeros((S*H+1,), jnp.int32).at[labels[r]].max(valid[r].astype(jnp.int32))
        rows_present = rows_present + pres
    size_of = sizes[flat].reshape(S, H)
    rows_of = rows_present[flat].reshape(S, H)
    return valid & ((size_of >= 30) | ((size_of >= 5) & (rows_of >= 3)))
fs = jax.jit(jax.vmap(lambda l, img: seg_stats(l, img["valid"])))
timed("seg stats (17 scatters)", fs, labels, img0)

def seg_stats2(labels, valid):
    S, H = valid.shape
    flat = labels.ravel()
    sizes = jnp.zeros((S*H+1,), jnp.int32).at[flat].add(valid.ravel())
    rowm = jnp.zeros((S*H+1,), jnp.int32).at[flat].max(
        jnp.where(valid, jnp.broadcast_to(jnp.arange(S)[:,None],(S,H)), -1).ravel() + 1)
    # distinct-rows != max-row... placeholder to time ONE scatter-pair shape
    size_of = sizes[flat].reshape(S, H)
    return valid & (size_of >= 30) & (rowm[flat].reshape(S,H) >= 0)
fs2 = jax.jit(jax.vmap(lambda l, img: seg_stats2(l, img["valid"])))
timed("seg stats (2 scatters, timing probe)", fs2, labels, img0)

f2 = jax.jit(jax.vmap(vd.compact_rows))
def full_img(p, m):
    img = vd.build_range_image(p, m)
    ground = vd.mark_ground(img)
    _, keep = vd.segment_range_image(img["range"], img["valid"])
    keep = keep | ground
    img = dict(img, valid=keep, range=jnp.where(keep, img["range"], 0.0),
               xyz=jnp.where(keep[..., None], img["xyz"], 0.0))
    img["ground"] = ground & img["valid"]
    return img
fim = jax.jit(jax.vmap(full_img))
img = fim(pts, msk); sync(img)
seq = timed("compact_rows", f2, img)

def stage_curv(seq):
    curv, m, wok = vd.adaptive_curvature(seq)
    vang = vd.view_angles(seq, m)
    return curv, m, wok, vang
f3 = jax.jit(jax.vmap(stage_curv))
cmv = timed("curvature+view_angles", f3, seq)

fse = jax.jit(jax.vmap(lambda seq: vd._suppression_extents(seq["xyz"])))
timed("suppression extents", fse, seq)

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
    return lidar_lines.extract_lines(ep, em, erow)
f5 = jax.jit(jax.vmap(stage_lines))
lines = timed("line growth", f5, seq, picks)

full = jax.jit(jax.vmap(lambda p, m: vd.extract_features(p, m)[0]))
timed("FULL extract", full, pts, msk)
