"""Line growth: round counts + slimming probes."""
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

# get edge buffers
def edges(p, m):
    feats, seq, aux = vd.extract_features(p, m)
    return feats.less_sharp, feats.less_sharp_mask, feats.less_sharp_row
# need the raw pick buffers (before on_line relabel) — recompute directly
def edge_bufs(p, m):
    img = vd.build_range_image(p, m)
    ground = vd.mark_ground(img)
    _, keep = vd.segment_range_image(img["range"], img["valid"])
    keep = keep | ground
    img = dict(img, valid=keep, range=jnp.where(keep, img["range"], 0.0),
               xyz=jnp.where(keep[..., None], img["xyz"], 0.0))
    img["ground"] = ground & img["valid"]
    seq = vd.compact_rows(img)
    curv, mw, wok = vd.adaptive_curvature(seq)
    vang = vd.view_angles(seq, mw)
    sec, interior = vd._sector_ids(seq)
    elig = (interior & wok & ~seq["ground"] & (curv > 0.1) & (curv <= 5.0)
            & (vang >= 5.0) & (vang <= 175.0))
    _, _, _, eidx, eok = vd.greedy_pick(seq, curv, elig, n_picks=30)
    ep, em, erow = vd.picks_to_buffer(seq, eidx, eok, vd.CAP_EDGE)[:3]
    return ep, em, erow
fb = jax.jit(jax.vmap(edge_bufs))
ep, em, erow = fb(pts, msk); sync(ep)
print("edge counts:", np.asarray(em.sum(1))[:8], flush=True)

# instrument round count: wrap while loop state... just count accepted lines + streak end
f_lines = jax.jit(jax.vmap(lambda p, m, r: lidar_lines.extract_lines(p, m, r)))
out = f_lines(ep, em, erow); sync(out)
nlines = np.asarray(out["mask"].sum(1))
print("accepted lines per scan:", nlines[:8], "max", nlines.max(), flush=True)
timed("extract_lines current", f_lines, ep, em, erow)
