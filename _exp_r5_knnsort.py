"""Probe: sort-based KNN + per-ring nearest vs argmin sweeps."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
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
NP_, Q, T = 31, 512, 4096
qs = jnp.asarray(rng.normal(size=(NP_, Q, 3)).astype(np.float32))
ts = jnp.asarray(rng.normal(size=(NP_, T, 3)).astype(np.float32))
qm = jnp.asarray(rng.random((NP_, Q)) < 0.8)
tm = jnp.asarray(rng.random((NP_, T)) < 0.8)
qrow = jnp.asarray(rng.integers(0, 16, (NP_, Q)), jnp.int32)
trow = jnp.asarray(rng.integers(0, 16, (NP_, T)), jnp.int32)

def knn_old(q, qm, t, tm):
    d2 = assoc._masked_cdist2(q, qm, t, tm)
    return assoc._knn_small(d2, 10)
f_old = jax.jit(lambda qs, qm, ts, tm: jax.lax.map(
    lambda a: knn_old(*a), (qs, qm, ts, tm), batch_size=8))
o = timed("knn10 argmin-sweep", f_old, qs, qm, ts, tm)

def knn_sort(q, qm, t, tm, k=10):
    d2 = assoc._masked_cdist2(q, qm, t, tm)
    idx = jnp.broadcast_to(jnp.arange(t.shape[0], dtype=jnp.int32)[None, :], d2.shape)
    d2s, idxs = jax.lax.sort((d2, idx), dimension=1, num_keys=1, is_stable=True)
    return d2s[:, :k], idxs[:, :k]
f_new = jax.jit(lambda qs, qm, ts, tm: jax.lax.map(
    lambda a: knn_sort(*a), (qs, qm, ts, tm), batch_size=8))
n = timed("knn10 sort", f_new, qs, qm, ts, tm)
print("knn parity:", np.array_equal(np.asarray(o[1]), np.asarray(n[1])),
      np.allclose(np.asarray(o[0]), np.asarray(n[0]), atol=1e-5), flush=True)

# rings: old masked argmin x4
def rings_old(q, qm, t, tm, qr, tr):
    d2 = assoc._masked_cdist2(q, qm, t, tm)
    outs = []
    for dr in (-2, -1, 1, 2):
        same = tr[None, :] == (qr[:, None] + dr)
        d2r = jnp.where(same, d2, jnp.inf)
        j = jnp.argmin(d2r, axis=1)
        outs.append((jnp.take_along_axis(d2r, j[:, None], axis=1)[:, 0], j))
    return outs
f_ro = jax.jit(lambda qs, qm, ts, tm, qr, tr: jax.lax.map(
    lambda a: rings_old(*a), (qs, qm, ts, tm, qr, tr), batch_size=8))
ro = timed("rings argmin x4", f_ro, qs, qm, ts, tm, qrow, trow)

# rings via (ring, d2) sort + sentinel compaction -> (Q, 16) ring-min table
def rings_sort(q, qm, t, tm, qr, tr):
    d2 = assoc._masked_cdist2(q, qm, t, tm)            # (Q, T)
    T_ = t.shape[0]
    ridx = jnp.broadcast_to(tr[None, :], d2.shape)
    idx = jnp.broadcast_to(jnp.arange(T_, dtype=jnp.int32)[None, :], d2.shape)
    # sentinels: one per ring, d2=inf
    sent_r = jnp.broadcast_to(jnp.arange(16, dtype=jnp.int32)[None, :], (d2.shape[0], 16))
    k1 = jnp.concatenate([ridx, sent_r], axis=1)
    k2 = jnp.concatenate([d2, jnp.full((d2.shape[0], 16), jnp.inf)], axis=1)
    k3 = jnp.concatenate([idx, jnp.zeros((d2.shape[0], 16), jnp.int32)], axis=1)
    k1s, k2s, k3s = jax.lax.sort((k1, k2, k3), dimension=1, num_keys=2, is_stable=True)
    is_start = jnp.concatenate([jnp.ones((d2.shape[0], 1), bool),
                                k1s[:, 1:] != k1s[:, :-1]], axis=1)
    keyc = jnp.where(is_start, k1s, 16)
    _, d2m, idxm = jax.lax.sort((keyc, k2s, k3s), dimension=1, num_keys=1, is_stable=True)
    ring_d2 = d2m[:, :16]                               # (Q, 16) per-ring min
    ring_idx = idxm[:, :16]
    outs = []
    for dr in (-2, -1, 1, 2):
        tgt = jnp.clip(qr + dr, -1, 16)
        oh = jnp.arange(16)[None, :] == tgt[:, None]
        d = jnp.min(jnp.where(oh, ring_d2, jnp.inf), axis=1)
        j = jnp.max(jnp.where(oh, ring_idx, 0), axis=1)
        outs.append((d, j))
    return outs
f_rs = jax.jit(lambda qs, qm, ts, tm, qr, tr: jax.lax.map(
    lambda a: rings_sort(*a), (qs, qm, ts, tm, qr, tr), batch_size=8))
rs = timed("rings sort+table", f_rs, qs, qm, ts, tm, qrow, trow)
ok = True
for a, b in zip(ro, rs):
    da, ja = np.asarray(a[0]), np.asarray(a[1])
    db, jb = np.asarray(b[0]), np.asarray(b[1])
    fin = np.isfinite(da)
    ok &= np.array_equal(fin, np.isfinite(db)) and np.array_equal(ja[fin], jb[fin]) \
        and np.allclose(da[fin], db[fin], atol=1e-5)
print("ring parity:", ok, flush=True)

# combined: one sort serving BOTH knn10 and rings? different orders; do 2 sorts total
def p2p_sorted(q, qm, t, tm, qr, tr):
    a = knn_sort(q, qm, t, tm)
    b = rings_sort(q, qm, t, tm, qr, tr)
    return a, b
f_c = jax.jit(lambda qs, qm, ts, tm, qr, tr: jax.lax.map(
    lambda a: p2p_sorted(*a), (qs, qm, ts, tm, qr, tr), batch_size=8))
timed("knn10+rings both-sort", f_c, qs, qm, ts, tm, qrow, trow)
