"""Probe: XLA sort cost, one-hot matmul histograms, argmax-sampling — the
scatter-free building blocks for the extraction redesign."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

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
B, S, H = 32, 16, 1800
labels = jnp.asarray(rng.integers(0, S*H, (B, S*H)), jnp.int32)
valid = jnp.asarray(rng.random((B, S*H)) < 0.9)

# 1. XLA sort of labels per scan
f_sort = jax.jit(lambda l: jnp.sort(l, axis=1))
timed("jnp.sort (32, 28800) i32", f_sort, labels)

# 1b. argsort
f_asort = jax.jit(lambda l: jnp.argsort(l, axis=1))
timed("jnp.argsort (32, 28800)", f_asort, labels)

# 2. one-hot matmul histogram at line-growth scale: tbin (1024,) -> hist(128)
tbin = jnp.asarray(rng.integers(0, 128, (B, 1024)), jnp.int32)
m1 = jnp.asarray(rng.random((B, 1024)) < 0.5)
def hist_scatter(tb, m):
    return jax.vmap(lambda t, mm: jnp.zeros((128,), jnp.int32).at[t].add(mm.astype(jnp.int32)))(tb, m)
def hist_onehot(tb, m):
    oh = (tb[:, None, :] == jnp.arange(128)[None, :, None])  # (B,128,1024)
    return jnp.sum(jnp.where(oh, m[:, None, :], False).astype(jnp.int32), axis=2)
timed("hist128 scatter x64rounds", jax.jit(lambda tb, m: [hist_scatter(tb, m) for _ in range(64)]), tbin, m1)
timed("hist128 onehot x64rounds", jax.jit(lambda tb, m: [hist_onehot(tb, m) for _ in range(64)]), tbin, m1)

# 3. slot_to_idx scatter vs hash-argmax sampling (line growth, 64 rounds)
P, NH = 1024, 256
rem = jnp.asarray(rng.random((B, P)) < 0.3)
def sample_scatter(rem, l):
    pos = jnp.cumsum(rem, axis=1) - 1
    s2i = jnp.zeros((B, P), jnp.int32).at[
        jnp.arange(B)[:, None], jnp.where(rem, pos, P)].set(
        jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (B, P)), mode="drop")
    n_rem = jnp.maximum(jnp.sum(rem, axis=1), 1)
    ua = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(0), l), (B, NH))
    ia = jnp.take_along_axis(s2i, jnp.minimum((ua*n_rem[:,None]).astype(jnp.int32), n_rem[:,None]-1), axis=1)
    return ia
def sample_hash(rem, l):
    # priority = hash(i, h, l); argmax over masked priorities -> uniform over remaining
    i = jnp.arange(P, dtype=jnp.uint32)[None, None, :]
    h = jnp.arange(NH, dtype=jnp.uint32)[None, :, None]
    x = (i * jnp.uint32(2654435761) ^ (h * jnp.uint32(40503) + jnp.uint32(l) * jnp.uint32(69069)))
    x = x * jnp.uint32(2246822519)
    pri = jnp.where(rem[:, None, :], x, jnp.uint32(0))
    return jnp.argmax(pri, axis=2).astype(jnp.int32)  # (B, NH)
timed("sample scatter x64", jax.jit(lambda r: [sample_scatter(r, l) for l in range(64)]), rem)
timed("sample hash-argmax x64", jax.jit(lambda r: [sample_hash(r, l) for l in range(64)]), rem)

# 4. eigh cost in plane fits (association probe): (1024, 3, 3)
covs = jnp.asarray(rng.random((1024, 3, 3)).astype(np.float32))
covs = covs @ jnp.swapaxes(covs, -1, -2)
timed("eigh (1024,3,3)", jax.jit(lambda c: jnp.linalg.eigh(c)[0]), covs)

# 5. gather_masked cost: scatter 28800 -> 4096, x32 scans, 5 channels packed
vals = jnp.asarray(rng.random((B, S, H, 5)).astype(np.float32))
km = jnp.asarray(rng.random((B, S, H)) < 0.1)
def gm(v, m):
    def one(vv, mm):
        fm = mm.ravel(); fv = vv.reshape(-1, 5)
        pos = jnp.cumsum(fm) - 1
        tgt = jnp.where(fm, pos, 4096)
        out = jnp.zeros((4096, 5), jnp.float32).at[tgt].set(fv, mode="drop")
        return out
    return jax.vmap(one)(v, m)
timed("gather_masked 28800->4096 x5ch", jax.jit(gm), vals, km)
