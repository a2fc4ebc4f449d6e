"""Probe: lax.top_k / approx_min_k vs argmin sweeps for p2p KNN."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from panovlm_tpu.models import association as assoc

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

def timed(name, f, *a, reps=7):
    try:
        out = f(*a); sync(out)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    walls = []
    for _ in range(reps):
        t0 = time.time(); out = f(*a); sync(out); walls.append(time.time()-t0)
    med = sorted(walls)[len(walls)//2]
    print(f"{name}: {med*1000:.1f} ms", flush=True)
    return out

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
B, Q, T = 31, 512, 4096
qs = jnp.asarray(rng.normal(size=(B, Q, 3)).astype(np.float32))
ts = jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32))
qm = jnp.asarray(rng.random((B, Q)) < 0.8)
tm = jnp.asarray(rng.random((B, T)) < 0.8)

def base(q, qm, t, tm):
    def one(q, qm, t, tm):
        d2 = assoc._masked_cdist2(q, qm, t, tm)
        return assoc._knn_small(d2, 10)
    return jax.lax.map(lambda a: one(*a), (qs_ for qs_ in ()) or (q, qm, t, tm), batch_size=8)
def mk(fn):
    return jax.jit(lambda q, qm, t, tm: jax.lax.map(
        lambda a: fn(*a), (q, qm, t, tm), batch_size=8))

o = timed("argmin sweep k=10", mk(lambda q,qm,t,tm: assoc._knn_small(assoc._masked_cdist2(q,qm,t,tm), 10)), qs, qm, ts, tm)

def knn_topk(q, qm, t, tm):
    d2 = assoc._masked_cdist2(q, qm, t, tm)
    neg, idx = jax.lax.top_k(-d2, 10)
    return -neg, idx
n1 = timed("lax.top_k k=10", mk(knn_topk), qs, qm, ts, tm)

def knn_approx(q, qm, t, tm):
    d2 = assoc._masked_cdist2(q, qm, t, tm)
    d, i = jax.lax.approx_min_k(d2, 10, recall_target=0.99)
    return d, i
n2 = timed("approx_min_k r=.99", mk(knn_approx), qs, qm, ts, tm)

def knn_approx_exact(q, qm, t, tm):
    d2 = assoc._masked_cdist2(q, qm, t, tm)
    d, i = jax.lax.approx_min_k(d2, 10, recall_target=1.0)
    return d, i
n3 = timed("approx_min_k r=1.0", mk(knn_approx_exact), qs, qm, ts, tm)

# packed int single-argmin-per-k (monotone f32->i32 bitcast, idx in low bits)
def knn_packed(q, qm, t, tm):
    d2 = assoc._masked_cdist2(q, qm, t, tm)
    d2 = jnp.minimum(d2, 3e37)
    bits = jax.lax.bitcast_convert_type(d2, jnp.int32)  # d2>=0 -> monotone
    key = (bits & ~jnp.int32(0xFFF)) | jnp.arange(T, dtype=jnp.int32)[None, :]
    outs_d, outs_i = [], []
    rows = jnp.arange(Q)
    for _ in range(10):
        kmin = jnp.min(key, axis=1)
        idx = kmin & 0xFFF
        d = jax.lax.bitcast_convert_type(kmin & ~jnp.int32(0xFFF), jnp.float32)
        outs_d.append(d); outs_i.append(idx)
        key = jnp.where(jnp.arange(T)[None, :] == idx[:, None], jnp.int32(2**31 - 1), key)
    return jnp.stack(outs_d, 1), jnp.stack(outs_i, 1)
n4 = timed("packed-key min sweep", mk(knn_packed), qs, qm, ts, tm)

for nm, n in (("top_k", n1), ("approx.99", n2), ("approx1.0", n3), ("packed", n4)):
    if n is None or o is None: continue
    i_o, i_n = np.asarray(o[1]), np.asarray(n[1])
    fin = np.asarray(o[0]) < 1e29
    print(f"  {nm} idx match frac: {float((i_o == i_n)[fin].mean()):.4f}", flush=True)
