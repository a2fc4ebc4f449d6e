"""Benchmark: the two BASELINE.json metrics on the available backend.

1. LiDAR scans/sec reprojected + associated — the hot path of the
   init_lidar_pose stage: VLP-16 scan -> range image -> ground marking ->
   segmentation -> adaptive curvature -> sector-greedy edge/plane picks ->
   3D line extraction, then pairwise association (point->line 5-NN +
   segment vote, point->plane 10-NN + plane fits with cross-ring
   candidates, line->line votes) across the temporal pair chain.
2. MVS depth maps/min — PatchMatch panoramic depth estimation at the Room
   run profile (config/Room.txt scale -2: 1440x720 equirect), photometric
   pass + geometric pass, the per-image loop of mvs/MVS.cpp:81-166.

vs_baseline: single-thread numpy/scipy implementations of the SAME
per-scan / per-map work (standing in for the C++ reference, which
publishes no numbers and cannot be built here — BASELINE.md). The CPU
LiDAR baseline implements every stage the device path runs (segmentation
via scipy connected components, sequential sector picks with suppression
walks as in Velodyne.cpp:905-989, kd-tree line growth, kd-tree
5/10-NN association with vectorized plane fits) — not a subset. The CPU
MVS baseline times the per-pixel-candidate NCC scoring work of
ProcessPixel (mvs/MVS.cpp:719) on a crop and scales by the exact
pixel-candidate count of a full map (the work is embarrassingly uniform
per pixel, so the extrapolation is exact up to cache effects that favor
the crop).

Timing: medians over repeated sweeps (the axon TPU tunnel has high
run-to-run variance); extract and associate phases are measured
separately, matching how the pipeline actually executes them.

Prints ONE JSON line: value/vs_baseline carry the LiDAR metric (the
first-listed BASELINE metric); mvs_* fields carry the second.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "tests")

# B=32: measured 4.83 ms/scan vs 5.71 at B=16 on the v5e (batch-width
# sweep, PERF.md round-4); B=64 showed no further gain
N_BENCH_SCANS = 32
ROT = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)  # cam axes

_NATIVE = None


def _native_mod():
    """panovlm_tpu.native if its C++ lib builds/loads, else None — gives the
    CPU baseline's sequential inner loops (sector picks, line growth) a
    reference-speed C++ implementation instead of interpreter-bound python."""
    global _NATIVE
    if _NATIVE is None:
        try:
            from panovlm_tpu import native
            _NATIVE = native if native.get() is not None else False
        except Exception:
            _NATIVE = False
    return _NATIVE or None


def _enable_compile_cache():
    """Persistent XLA compile cache (repo-local, survives across bench
    runs/rounds): the Room-profile MVS program compiles in ~3 min through
    the axon tunnel; cached it loads in seconds."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(out):
    """Force completion: device->host transfer of one result element.
    (jax.block_until_ready is not a reliable barrier on the axon remote
    backend — it can return before the dispatched program finishes.)"""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def _median_time(fn, reps: int = 5, inner: int = 8):
    # inner chains dependent dispatches with ONE sync: the production
    # stages stream hundreds of batches back to back, so steady-state
    # throughput (sync RTT amortized over the chain) is the honest number;
    # the per-call floors are recorded separately in the calibration fields
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = fn()
        _sync(out)  # device stream is in-order: last done => all done
        ts.append((time.time() - t0) / inner)
    return statistics.median(ts)


def device_calibration():
    """Regime calibration recorded next to every metric (VERDICT r4 weak
    #4: the tunnel has day-scale throughput regimes — same binary measured
    453 and 157 scans/s in different sessions — so a bench number without
    the regime's per-op floors is not comparable across rounds). Measures:
      dispatch_floor_ms  — pipelined per-call floor (chained dependent jit
                           calls, one sync)
      sync_rtt_ms        — dispatch + host sync round trip
      gather_meps        — random-gather rate, M elem/s (the scatter/gather
                           path that bounds every indexed op, PERF.md)
    """
    import jax
    import jax.numpy as jnp
    out = {}
    f = jax.jit(lambda x: x * 1.0000001 + 1.0)
    x = jnp.ones((256, 256), jnp.float32)
    x = f(x)
    _sync(x)
    t0 = time.time()
    y = x
    n = 40
    for _ in range(n):
        y = f(y)
    _sync(y)
    out["dispatch_floor_ms"] = round((time.time() - t0) / n * 1e3, 2)
    ts = []
    for _ in range(5):
        t0 = time.time()
        _sync(f(x))
        ts.append(time.time() - t0)
    out["sync_rtt_ms"] = round(statistics.median(ts) * 1e3, 1)
    tbl = jnp.arange(1 << 20, dtype=jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 20, 1 << 23), jnp.int32)
    g = jax.jit(lambda t, i: t[i].sum())
    _sync(g(tbl, idx))
    t0 = time.time()
    for _ in range(3):
        o = g(tbl, idx)
    _sync(o)
    out["gather_meps"] = round((1 << 23) * 3 / (time.time() - t0) / 1e6, 1)
    return out


# ---------------------------------------------------------------------------
# TPU: LiDAR scans/sec
# ---------------------------------------------------------------------------

def tpu_lidar(scans_np):
    import jax
    import jax.numpy as jnp
    from panovlm_tpu.models import association
    from panovlm_tpu.sensors import velodyne as vd

    padded = [vd.pad_points(vd.preprocess_cloud(s)[0], 32768) for s in scans_np]
    pts = jnp.asarray(np.stack([p for p, _ in padded]))
    msk = jnp.asarray(np.stack([m for _, m in padded]))

    extract = jax.jit(jax.vmap(lambda p, m: vd.extract_features(p, m)[0]))
    n = len(scans_np)
    poses = jnp.zeros((n, 6)).at[:, 3].set(jnp.arange(n) * 0.15)
    pair_r = jnp.asarray(np.arange(n - 1), jnp.int32)
    pair_n = jnp.asarray(np.arange(1, n), jnp.int32)
    assoc_j = jax.jit(lambda feats, poses: association.associate_all_pairs(
        {k: getattr(feats, k) for k in feats._fields}, poses, pair_r, pair_n))

    # Measure in the CO-RESIDENT regime the production stage actually runs
    # in (VERDICT r3 weak #4): extract, association, and the LM solve all
    # live in one process there. Round-4 on-chip measurement (_exp_odom):
    # association and solve walls are IDENTICAL one-resident vs
    # co-resident (4.2/4.2 s and 6.0/6.0 s), so the round-3 eviction
    # precaution (extract 0.3 -> 89 ms with assoc resident, one observed
    # degraded session) is dropped; extract is measured both before and
    # after the association executable loads and the co-resident number is
    # the headline.
    feats = extract(pts, msk)               # compile
    _sync(feats)
    t_extract_solo = _median_time(lambda: extract(pts, msk))
    out = assoc_j(feats, poses)
    _sync(out)
    t_assoc = _median_time(lambda: assoc_j(feats, poses))
    t_extract = _median_time(lambda: extract(pts, msk))  # co-resident
    print(f"lidar: extract {t_extract*1e3:.1f} ms (solo {t_extract_solo*1e3:.1f}),"
          f" assoc {t_assoc*1e3:.1f} ms (B={n})", file=sys.stderr, flush=True)
    return n / (t_extract + t_assoc), t_extract, t_assoc


# ---------------------------------------------------------------------------
# CPU: single-thread equivalent of the SAME LiDAR work
# ---------------------------------------------------------------------------

def _cpu_extract(raw):
    """Single-thread numpy/scipy feature extraction doing the same stages as
    velodyne.extract_features (= the reference ExtractFeatures ADAPTIVE path,
    Velodyne.cpp:531-769)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    from scipy.spatial import cKDTree

    S, W = 16, 1800
    pts = raw.astype(np.float32) @ ROT.T
    pts = pts[(pts ** 2).sum(1) >= 0.25]
    x, y, z = pts.T
    rng = np.sqrt(x * x + y * y + z * z)
    va = np.degrees(np.arctan2(-y, np.sqrt(x * x + z * z)))
    ring = np.floor((va + 15) / 2 + 0.5).astype(np.int64)
    ori = np.arctan2(x, z)
    first = np.argmax(rng > 0)
    rel = np.mod(ori - ori[first], 2 * np.pi)
    col = np.minimum((rel / (2 * np.pi) * W).astype(np.int64), W - 1)
    ok = (ring >= 0) & (ring < S)

    # range image, nearest return wins per cell
    cell = ring * W + col
    order = np.argsort(rng[ok])[::-1]          # farthest first, nearest last
    src = np.full(S * W, -1, np.int64)
    src[cell[ok][order]] = np.nonzero(ok)[0][order]
    valid = src >= 0
    r_img = np.zeros(S * W, np.float32)
    r_img[valid] = rng[src[valid]]
    xyz_img = np.zeros((S * W, 3), np.float32)
    xyz_img[valid] = pts[src[valid]]
    r_img = r_img.reshape(S, W)
    xyz_img = xyz_img.reshape(S, W, 3)
    valid = valid.reshape(S, W)

    # ground: vertical-step slope test on the downward rings
    d = xyz_img[1:9] - xyz_img[:8]
    horiz = np.sqrt(d[..., 0] ** 2 + d[..., 2] ** 2)
    slope = np.degrees(np.arctan2(np.abs(d[..., 1]), horiz))
    flat_step = (slope < 10.0) & valid[1:9] & valid[:8]
    ground = np.zeros((S, W), bool)
    ground[:8] |= flat_step
    ground[1:9] |= flat_step
    ground &= valid

    # segmentation: angle criterion -> connected components (LeGO-LOAM)
    def connected(ra, rb, alpha):
        d1 = np.maximum(ra, rb)
        d2 = np.minimum(ra, rb)
        ang = np.arctan2(d2 * np.sin(alpha), d1 - d2 * np.cos(alpha))
        return ang > np.radians(20.0)

    lin = np.arange(S * W).reshape(S, W)
    conn_l = connected(r_img, np.roll(r_img, 1, axis=1), np.radians(0.2)) \
        & valid & np.roll(valid, 1, axis=1)
    conn_u = np.zeros((S, W), bool)
    conn_u[1:] = connected(r_img[1:], r_img[:-1], np.radians(2.0)) \
        & valid[1:] & valid[:-1]
    ii = np.concatenate([lin[conn_l].ravel(), lin[conn_u].ravel()])
    jj = np.concatenate([np.roll(lin, 1, axis=1)[conn_l].ravel(),
                         (lin - W)[conn_u].ravel()])
    g = coo_matrix((np.ones(len(ii), np.int8), (ii, jj)), shape=(S * W, S * W))
    _, labels = connected_components(g, directed=False)
    sizes = np.bincount(labels.ravel(), weights=valid.ravel().astype(np.float64),
                        minlength=S * W)
    lab_img = labels.reshape(S, W)
    rows_of = np.zeros(labels.max() + 1, np.int64)
    for r in range(S):
        rows_of[np.unique(lab_img[r][valid[r]])] += 1
    keep = valid & ((sizes[lab_img] >= 30)
                    | ((sizes[lab_img] >= 5) & (rows_of[lab_img] >= 3)))
    keep |= ground
    valid = keep
    r_img = np.where(valid, r_img, 0.0)

    # per-row compaction + adaptive curvature + view angle
    feats = {"edge": [], "edge_row": [], "sharp": [], "flat": [],
             "flat_row": [], "flat_g": [], "surf": [], "surf_row": [],
             "surf_g": []}
    for r in range(S):
        cols = np.nonzero(valid[r])[0]
        n = len(cols)
        if n < 24:
            continue
        P = xyz_img[r, cols]
        R = r_img[r, cols]
        G = ground[r, cols]
        # adaptive window radius from local spacing (chord over +-4)
        i4p = np.minimum(np.arange(n) + 4, n - 1)
        i4m = np.maximum(np.arange(n) - 4, 0)
        sp = np.maximum(np.maximum(
            np.linalg.norm(P[i4p] - P, axis=1),
            np.linalg.norm(P[i4m] - P, axis=1)) / 4.0, 1e-4)
        m = np.clip(np.ceil(0.08 / sp), 1, 16).astype(np.int64)
        cs = np.concatenate([[0.0], np.cumsum(R)])
        hi = np.clip(np.arange(n) + m + 1, 0, n)
        lo = np.clip(np.arange(n) - m, 0, n)
        curv = np.abs(cs[hi] - cs[lo] - (2 * m + 1) * R) / np.maximum(2 * m, 1)
        wok = (np.arange(n) - m >= 0) & (np.arange(n) + m < n)
        # view angle over +-5 chord
        l5 = np.maximum(np.arange(n) - 5, 0)
        r5 = np.minimum(np.arange(n) + 5, n - 1)
        b = P[l5] - P[r5]
        bn = np.linalg.norm(b, axis=1)
        cosv = np.abs((P * b).sum(1)) / np.maximum(R * bn, 1e-9)
        vang = np.degrees(np.arccos(np.clip(cosv, -1, 1)))

        interior = (np.arange(n) >= 5) & (np.arange(n) <= n - 6)
        edge_elig = interior & wok & ~G & (curv > 0.1) & (curv <= 5.0) \
            & (vang >= 5.0) & (vang <= 175.0)
        flat_base = interior & wok & (curv >= 0) & (curv <= 0.02)
        # six sectors, sequential greedy picks with suppression walks
        # (Velodyne.cpp:905-989) — native single-thread C++ when available
        # (the honest reference-speed baseline), python loops otherwise
        native_picks = _native_mod() and _native_mod().sector_picks(
            P, curv, edge_elig, flat_base)
        if native_picks is not None:
            picked, fpicked, disabled = native_picks
        else:
            picked = np.zeros(n, bool)
            disabled = np.zeros(n, bool)

            def suppress(i0):
                for direction in (-1, 1):
                    for l in range(1, 17):
                        j = i0 + direction * l
                        if j < 0 or j >= n:
                            break
                        gap = ((P[j] - P[j - direction]) ** 2).sum()
                        far = ((P[j] - P[i0]) ** 2).sum()
                        if (l <= 5 and gap > 0.05) or (l > 5 and far > 0.0036):
                            break
                        disabled[j] = True

            for s6 in range(6):
                a, b6 = s6 * n // 6, (s6 + 1) * n // 6
                sl = np.arange(a, b6)
                order = sl[np.argsort(-curv[a:b6])]
                cnt = 0
                for i0 in order:
                    if cnt >= 30:
                        break
                    if not edge_elig[i0] or picked[i0] or disabled[i0]:
                        continue
                    picked[i0] = True
                    cnt += 1
                    suppress(i0)
            flat_elig = flat_base & ~picked & ~disabled
            fpicked = np.zeros(n, bool)
            for s6 in range(6):
                a, b6 = s6 * n // 6, (s6 + 1) * n // 6
                sl = np.arange(a, b6)
                order = sl[np.argsort(curv[a:b6])]
                cnt = 0
                for i0 in order:
                    if cnt >= 4:
                        break
                    if not flat_elig[i0] or fpicked[i0] or disabled[i0]:
                        continue
                    fpicked[i0] = True
                    cnt += 1
                    suppress(i0)
        feats["edge"].append(P[picked])
        feats["edge_row"].append(np.full(picked.sum(), r))
        feats["sharp"].append(P[picked][:3])
        feats["flat"].append(P[fpicked])
        feats["flat_row"].append(np.full(fpicked.sum(), r))
        feats["flat_g"].append(G[fpicked])
        lf = interior & wok & (curv >= 0) & (curv < 0.3) & ~picked & ~fpicked \
            & ~disabled
        feats["surf"].append(P[lf])
        feats["surf_row"].append(np.full(lf.sum(), r))
        feats["surf_g"].append(G[lf])

    out = {k: (np.concatenate(v) if v else np.zeros((0,)))
           for k, v in feats.items()}
    # less-flat voxel downsample (0.2 m leaf, centroid-free keep-first)
    if len(out["surf"]):
        key = np.floor(out["surf"] / 0.2).astype(np.int64)
        _, first_idx = np.unique(key[:, 0] * 73856093 ^ key[:, 1] * 19349663
                                 ^ key[:, 2] * 83492791, return_index=True)
        out["surf"] = out["surf"][first_idx]
        out["surf_row"] = out["surf_row"][first_idx]
        out["surf_g"] = out["surf_g"][first_idx]

    # 3D line extraction: kd-tree seeded growth (EdgeToLine,
    # Velodyne.cpp:1269+) — native C++ when available
    E = out["edge"]
    seg_label = np.full(len(E), -1, np.int64)
    grown = _native_mod() and len(E) >= 5 and _native_mod().grow_lines(E)
    if grown:
        seg_label = grown[0]
    elif len(E) >= 5:
        tree = cKDTree(E)
        used = np.zeros(len(E), bool)
        n_lines = 0
        for seed in range(len(E)):
            if used[seed] or n_lines >= 64:
                continue
            dd, nn = tree.query(E[seed], k=min(8, len(E)))
            nn = np.atleast_1d(nn)[np.atleast_1d(dd) < 2.0]
            if len(nn) < 3:
                continue
            c = E[nn].mean(0)
            u, sv, _ = np.linalg.svd(E[nn] - c, full_matrices=False)
            direc = _[0]
            d_perp = np.linalg.norm(np.cross(E - c, direc), axis=1)
            inl = (d_perp < 0.05) & ~used
            if inl.sum() < 5:
                continue
            t = (E[inl] - c) @ direc
            srt = np.sort(t)
            brk = np.nonzero(np.diff(srt) > 0.5)[0]
            # longest contiguous run
            bounds = np.concatenate([[-1], brk, [len(srt) - 1]])
            runs = np.diff(bounds)
            bi = np.argmax(runs)
            lo_t, hi_t = srt[bounds[bi] + 1], srt[bounds[bi + 1]]
            mem = inl & ((E - c) @ direc >= lo_t) & ((E - c) @ direc <= hi_t)
            if mem.sum() < 5 or hi_t - lo_t < 0.3:
                used |= mem
                continue
            seg_label[mem] = n_lines
            used |= mem
            n_lines += 1
    out["edge_seg"] = seg_label
    return out


def _cpu_associate(fr, fn):
    """Same pairwise association work as models/association.py."""
    from scipy.spatial import cKDTree
    # point->line: 5-NN among ref edges, all within 0.3 m on one segment
    if len(fr["edge"]) >= 5 and len(fn["edge"]):
        tree = cKDTree(fr["edge"])
        dd, ii = tree.query(fn["edge"], k=5)
        lab = fr["edge_seg"][ii]
        okl = (dd[:, -1] <= 0.3) & (lab == lab[:, :1]).all(1) & (lab[:, 0] >= 0)
        votes = np.zeros((64, 64), np.int64)
        qseg = fn["edge_seg"]
        vv = okl & (qseg >= 0)
        np.add.at(votes, (qseg[vv], lab[vv, 0]), 1)  # line->line votes
    # point->plane: 10-NN + 4 cross-ring candidates + plane fits
    if len(fr["surf"]) >= 10 and len(fn["flat"]):
        tree = cKDTree(fr["surf"])
        dd, ii = tree.query(fn["flat"], k=10)
        cand = [ii]
        for dr in (-2, -1, 1, 2):
            want = fn["flat_row"] + dr
            ring_pts = {r: np.nonzero(fr["surf_row"] == r)[0]
                        for r in np.unique(want)}
            jj = np.zeros(len(fn["flat"]), np.int64)
            for q, r in enumerate(want):
                sel = ring_pts.get(r, None)
                if sel is not None and len(sel):
                    d2 = ((fr["surf"][sel] - fn["flat"][q]) ** 2).sum(1)
                    jj[q] = sel[np.argmin(d2)]
            cand.append(jj[:, None])
        idx = np.concatenate(cand, axis=1)            # (Q, 14)
        nn = fr["surf"][idx]
        c = nn - nn.mean(axis=1, keepdims=True)
        cov = np.einsum("qki,qkj->qij", c, c)
        w, v = np.linalg.eigh(cov)
        normal = v[..., 0]
        dist = np.abs(np.einsum("qki,qi->qk", c, normal))
        _ = (dist < 0.03).all(1) & (w[:, 1] >= 2.7e-3 * w[:, 2])


def cpu_lidar(scans_np, n_sample: int = 4, reps: int = 3):
    """Single-thread CPU rate for the same extract + associate work."""
    ts = []
    for _ in range(reps):
        t0 = time.time()
        prev = None
        for raw in scans_np[:n_sample]:
            f = _cpu_extract(raw)
            if prev is not None:
                _cpu_associate(prev, f)
            prev = f
        ts.append((time.time() - t0) / n_sample)
    return 1.0 / statistics.median(ts)


# ---------------------------------------------------------------------------
# MVS: depth maps/min at the Room profile (scale -2)
# ---------------------------------------------------------------------------

MVS_H, MVS_W = 720, 1440     # 5.7K Insta360 equirect at scale -2
MVS_VIEWS = 4                # Room-profile neighbor count
N_ITER_PHOTO = 9             # init + 8 half-iterations (n_iterations=4)
N_ITER_GEOM = 8


def _mvs_views():
    """Synthetic room panoramas + cam-convention (aa, t) poses at Room res.

    Rendered at half res and bilinearly upsampled (render cost only; the
    timed device work depends on the DEPTH-MAP resolution, not on image
    frequency content), cached in /tmp across bench runs."""
    import os
    import synthetic
    centers = [np.array([0.0, 0.4, 0.0]), np.array([0.7, 0.4, 0.2]),
               np.array([-0.5, 0.2, -0.4]), np.array([0.2, 0.6, -0.7]),
               np.array([-0.3, 0.5, 0.5])]
    cache = f"/tmp/panovlm_bench_mvs2_{MVS_H}x{MVS_W}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["grays"], z["poses"], z["prior"]
    grays = []
    prior = None
    for c in centers:
        g, d = synthetic.render_panorama(c, MVS_H // 2, MVS_W // 2)
        up = np.repeat(np.repeat(g, 2, axis=0), 2, axis=1)
        grays.append(up.astype(np.float32))
        if prior is None:
            prior = d.astype(np.float32)   # depth prior (stands in for the
                                           # production LiDAR projection)
    poses = np.zeros((len(centers), 6), np.float32)
    for i, c in enumerate(centers):
        poses[i, 3:] = -c    # R = I -> t_cw = -C
    grays = np.stack(grays)
    try:
        np.savez(cache, grays=grays, poses=poses, prior=prior)
    except OSError:
        pass
    return grays, poses, prior


def tpu_mvs(grays_np, poses_np, prior_np=None):
    """Depth maps/min: photometric + geometric PatchMatch per reference
    image with the production Room-profile config (plane-sweep volumes +
    the Pallas volume-scoring kernel + the LiDAR-prior sweep-range fit,
    as pipeline.joint_mvs configures on single-chip TPU; prior_np stands
    in for the LiDAR depth projection the production stage fits from)."""
    import jax
    import jax.numpy as jnp
    from panovlm_tpu.models import mvs as mvs_mod
    from panovlm_tpu.ops import spherical
    from panovlm_tpu.ops.patchmatch import PatchMatchConfig

    use_kernel = jax.default_backend() == "tpu"
    pm = PatchMatchConfig(min_depth=0.3, max_depth=10.0, sweep_slices=64,
                          use_volscore_kernel=use_kernel)
    if prior_np is not None:
        pm = mvs_mod.fit_sweep_range(pm, prior_np[::4, ::4])
    cfg = mvs_mod.MVSConfig(pm=pm, n_iterations=4, n_neighbors=MVS_VIEWS)
    grays = jnp.asarray(grays_np)
    poses = jnp.asarray(poses_np)
    rays = spherical.pixel_ray_grid(MVS_H, MVS_W)
    key = jax.random.PRNGKey(0)
    d0, n0, fixed = mvs_mod.init_depth_normal(key, rays, None, cfg)

    def one_map(ref, nei, nei_depths=None):
        return mvs_mod.estimate_depth_map(
            grays[ref], grays[jnp.asarray(nei)], poses, ref, nei,
            d0, n0, fixed, cfg, nei_depths=nei_depths, seed=ref)

    n = len(grays_np)
    nei0 = np.array([j for j in range(n) if j != 0][:MVS_VIEWS], np.int32)
    out = one_map(0, nei0)                       # compile photometric
    _sync(out)
    nd = jnp.stack([out[0]] * MVS_VIEWS)
    outg = one_map(0, nei0, nei_depths=nd)       # compile geometric
    _sync(outg)

    t0 = time.time()
    n_timed = 2
    for ref in range(1, 1 + n_timed):
        nei = np.array([j for j in range(n) if j != ref][:MVS_VIEWS], np.int32)
        d, _, _ = one_map(ref, nei)
        nd = jnp.stack([d] * MVS_VIEWS)          # stand-in neighbor depths
        outg = one_map(ref, nei, nei_depths=nd)
        _sync(outg)
    dt = time.time() - t0
    return n_timed / dt * 60.0                   # depth maps per minute


def cpu_mvs_rate():
    """Single-thread numpy rate for the same per-pixel PatchMatch work.

    Times the uniform per-pixel-candidate NCC scoring (warp + bilinear
    sample + 36-texel ZNCC against MVS_VIEWS neighbors, ProcessPixel,
    mvs/MVS.cpp:719) on a crop, then scales by the full map's
    pixel x candidate x iteration count. Work per pixel-candidate is
    identical across the image, so the scaling is exact.
    """
    import synthetic
    crop_h, crop_w = 45, 90
    H, W = 180, 360
    centers = [np.array([0.0, 0.4, 0.0]), np.array([0.7, 0.4, 0.2]),
               np.array([-0.5, 0.2, -0.4]), np.array([0.2, 0.6, -0.7]),
               np.array([-0.3, 0.5, 0.5])]
    grays = np.stack([synthetic.render_panorama(c, H, W)[0]
                      for c in centers]).astype(np.float32)
    Rts = [(np.eye(3, dtype=np.float32), (-c).astype(np.float32))
           for c in centers]
    n_cand = 13
    rng = np.random.default_rng(0)
    depths = rng.uniform(1.0, 8.0, (crop_h, crop_w, n_cand)).astype(np.float32)

    yy, xx = np.meshgrid(np.arange(crop_h) + 60, np.arange(crop_w) + 100,
                         indexing="ij")
    theta = (yy + 0.5) / H * np.pi
    phi = (xx + 0.5) / W * 2 * np.pi - np.pi
    rays = np.stack([np.sin(theta) * np.sin(phi), -np.cos(theta),
                     np.sin(theta) * np.cos(phi)], -1)

    offs = [(dy, dx) for dy in (-2, -1, 0, 1, 2) for dx in (-2, -1, 0, 1, 2)
            if abs(dy) + abs(dx) <= 3][:36]

    t0 = time.time()
    for v in range(MVS_VIEWS):
        Rcw, tcw = Rts[v + 1]
        for k in range(n_cand):
            pw = rays * depths[..., k:k + 1]
            pc = pw @ Rcw.T + tcw
            r = np.linalg.norm(pc, axis=-1)
            th = np.arccos(np.clip(-pc[..., 1] / np.maximum(r, 1e-9), -1, 1))
            ph = np.arctan2(pc[..., 0], pc[..., 2])
            u = (ph + np.pi) / (2 * np.pi) * W - 0.5
            vv_ = th / np.pi * H - 0.5
            acc = np.zeros((crop_h, crop_w), np.float32)
            ref_acc = np.zeros((crop_h, crop_w), np.float32)
            for dy, dx in offs:
                uu = np.clip(u + dx, 0, W - 2)
                vv2 = np.clip(vv_ + dy, 0, H - 2)
                x0 = uu.astype(np.int64)
                y0 = vv2.astype(np.int64)
                fx_ = uu - x0
                fy = vv2 - y0
                g = grays[v + 1]
                s = (g[y0, x0] * (1 - fx_) * (1 - fy) + g[y0, x0 + 1] * fx_ * (1 - fy)
                     + g[y0 + 1, x0] * (1 - fx_) * fy + g[y0 + 1, x0 + 1] * fx_ * fy)
                acc += s
                ref_acc += grays[0][np.clip(yy + dy, 0, H - 1),
                                    np.clip(xx + dx, 0, W - 1)]
            # ZNCC reduction stand-in (means already accumulated)
            _ = acc / len(offs) - ref_acc / len(offs)
    dt = time.time() - t0
    per_px_cand_view = dt / (crop_h * crop_w * n_cand * MVS_VIEWS)
    # photometric iterations + geometric pass (same scoring + one extra
    # bilinear depth tap per candidate-view: 37/36 of the 36-texel work)
    iters = N_ITER_PHOTO + N_ITER_GEOM * 37.0 / 36.0
    full = per_px_cand_view * MVS_H * MVS_W * n_cand * MVS_VIEWS * iters
    return 60.0 / full       # maps per minute


def mvs_main():
    """Subprocess entry: print the MVS metric pair as one JSON line."""
    _enable_compile_cache()
    grays_np, poses_np, prior_np = _mvs_views()
    mvs_tpu = tpu_mvs(grays_np, poses_np, prior_np)
    mvs_cpu = cpu_mvs_rate()
    print(json.dumps({"mvs_depth_maps_per_min": round(mvs_tpu, 2),
                      "mvs_vs_baseline": round(mvs_tpu / mvs_cpu, 2)}))


def lidar_main():
    """Subprocess entry: print the LiDAR metric pair as one JSON line."""
    import synthetic

    _enable_compile_cache()
    rng = np.random.default_rng(0)
    scans = [synthetic.make_scan(origin=(0.1 * i, 0.02 * i, -1.0),
                                 noise=0.004, rng=rng)
             for i in range(N_BENCH_SCANS)]
    print("lidar: calibration...", file=sys.stderr, flush=True)
    calib = device_calibration()
    print("lidar: tpu half...", file=sys.stderr, flush=True)
    tpu_rate, t_extract, t_assoc = tpu_lidar(scans)
    print("lidar: cpu half...", file=sys.stderr, flush=True)
    cpu_rate = cpu_lidar(scans)
    # extract/assoc split recorded in the JSON (VERDICT r3 weak #1: the
    # split only went to stderr, which the driver drops) — per-scan ms;
    # calibration fields make the number regime-attributable (r4 weak #4)
    print(json.dumps({
        "value": round(tpu_rate, 2),
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
        "extract_ms_per_scan": round(t_extract / N_BENCH_SCANS * 1e3, 3),
        "assoc_ms_per_scan": round(t_assoc / N_BENCH_SCANS * 1e3, 3),
        "cpu_baseline_scans_per_sec": round(cpu_rate, 3),
        **calib,
    }))


def _run_half(flag: str, timeout_s: int, attempts: int):
    """Run one metric half in a bounded subprocess, retrying in a FRESH
    process on hang/crash: the axon tunnel intermittently wedges a process
    (compiles that never return, even with a warm persistent cache) and a
    new process reliably recovers — a hang in one half must never lose
    the other's number."""
    import subprocess
    err = "no attempts"
    for k in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, flag], capture_output=True,
                text=True, timeout=timeout_s, cwd="/root/repo")
            lines = proc.stdout.strip().splitlines()
            if lines:
                return json.loads(lines[-1]), None
            err = f"exit={proc.returncode}; stderr: {proc.stderr[-160:]}"
        except Exception as e:
            err = f"{type(e).__name__}: {e}"[:160]
        print(f"bench {flag} attempt {k + 1}/{attempts} failed: {err}",
              file=sys.stderr, flush=True)
    return None, err


def _probe_device(timeout_s: int = 300):
    """Fast tunnel-health probe in a bounded subprocess: distinguishes a
    DEAD tunnel (relay process gone — clients hang in the dial loop
    forever; observed for hours in round 5) from a merely degraded one.
    Returns (ok, seconds or error string)."""
    import subprocess
    code = ("import time,sys; t0=time.time()\n"
            "import jax, jax.numpy as jnp, numpy as np\n"
            "np.asarray(jnp.sum(jnp.ones((8,128))).ravel()[:1])\n"
            "print('PROBE_OK', time.time()-t0)\n")
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s, cwd="/root/repo")
        for line in p.stdout.splitlines():
            if line.startswith("PROBE_OK"):
                return True, float(line.split()[1])
        return False, f"exit={p.returncode}: {p.stderr[-120:]}"
    except Exception as e:
        return False, f"{type(e).__name__}"


def main():
    result = {
        "metric": "lidar_scans_per_sec_reproject_associate",
        "value": 0.0,
        "unit": "scans/sec",
        "vs_baseline": 0.0,
    }
    ok, info = _probe_device()
    result["device_probe"] = info if ok else f"unhealthy: {info}"
    if not ok:
        # one short attempt each (the long windows only help when the
        # device eventually answers); the probe result is in the JSON
        lid, err = _run_half("--lidar", timeout_s=300, attempts=1)
        if lid is not None:
            result.update(lid)
        else:
            result["lidar_error"] = err
        mvs, err = _run_half("--mvs", timeout_s=300, attempts=1)
        if mvs is not None:
            result.update(mvs)
        else:
            result["mvs_error"] = err
        print(json.dumps(result))
        return
    # generous windows: the axon tunnel's degraded regime stretches a
    # trivial first op to 200+ s and compiles to tens of minutes; a fresh
    # process + the persistent cache usually recovers, so the retries keep
    # their own budgets (round-5 session: the tunnel stayed wedged for
    # hours — a short timeout would record 0 for reasons the calibration
    # fields exist to distinguish)
    lid, err = _run_half("--lidar", timeout_s=900, attempts=3)
    if lid is not None:
        result.update(lid)
    else:
        result["lidar_error"] = err
    mvs, err = _run_half("--mvs", timeout_s=900, attempts=2)
    if mvs is not None:
        result.update(mvs)
    else:
        result["mvs_error"] = err
    print(json.dumps(result))


if __name__ == "__main__":
    if "--mvs" in sys.argv:
        mvs_main()
    elif "--lidar" in sys.argv:
        lidar_main()
    else:
        main()
