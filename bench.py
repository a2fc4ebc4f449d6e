"""Benchmark: LiDAR scans/sec reprojected + associated (BASELINE.json metric).

Measures the hot path of the init_lidar_pose stage on the available backend
(real TPU under the driver): VLP-16 scan -> range image -> ground marking ->
segmentation -> curvature -> edge/plane/line features, then pairwise KNN
association (point->line 5-NN + segment vote, point->plane 10-NN + masked
plane fits, line->line votes) across the temporal neighbor graph.

vs_baseline: a single-thread numpy/scipy implementation of the equivalent
per-scan work (range image binning, adaptive curvature, sector picking,
cKDTree 5/10-NN queries with per-query plane fits) — standing in for the
C++ reference, which publishes no numbers (BASELINE.md) and cannot be built
here (no PCL/Ceres). Both sides process identical synthetic Room scans.

Timing: medians over repeated sweeps (the axon TPU tunnel has high
run-to-run variance); extract and associate phases are measured separately,
matching how the pipeline actually executes them.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "tests")

N_BENCH_SCANS = 16


def _sync(out):
    """Force completion: device->host transfer of one result element.
    (jax.block_until_ready is not a reliable barrier on the axon remote
    backend — it can return before the dispatched program finishes.)"""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def _median_time(fn, reps: int = 5, inner: int = 3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = fn()
        _sync(out)  # device stream is in-order: last done => all done
        ts.append((time.time() - t0) / inner)
    return statistics.median(ts)


def tpu_pipeline(scans_np):
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

    # NOTE: measure extract BEFORE the association program ever compiles.
    # The axon remote runtime thrashes when two large executables alternate
    # (a compiled program measured at ~1 ms/batch degrades to ~370 ms once a
    # second big program is resident); the real pipeline runs each program
    # in long homogeneous phases, which this ordering reproduces.
    feats = extract(pts, msk)               # compile
    _sync(feats)
    t_extract = _median_time(lambda: extract(pts, msk))

    out = assoc_j(feats, poses)
    _sync(out)
    t_assoc = _median_time(lambda: assoc_j(feats, poses))
    return n / (t_extract + t_assoc)


def cpu_baseline(scans_np, n_sample: int = 2):
    """Single-thread numpy/scipy equivalent of extract + associate."""
    from scipy.spatial import cKDTree

    def extract(raw):
        pts = raw @ np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32).T
        pts = pts[(pts ** 2).sum(1) >= 0.25]
        x, y, z = pts.T
        rng = np.sqrt(x * x + y * y + z * z)
        va = np.degrees(np.arctan2(-y, np.sqrt(x * x + z * z)))
        ring = np.floor((va + 15) / 2 + 0.5).astype(int)
        ori = np.arctan2(x, z)
        col = np.mod(np.round(ori / (2 * np.pi / 1800)).astype(int), 1800)
        ok = (ring >= 0) & (ring < 16)
        img = np.zeros((16, 1800), np.float32)
        xyz_img = np.zeros((16, 1800, 3), np.float32)
        img[ring[ok], col[ok]] = rng[ok]
        xyz_img[ring[ok], col[ok]] = pts[ok]
        edges, flats = [], []
        for r in range(16):
            valid = img[r] > 0
            cols = np.nonzero(valid)[0]
            seq = img[r, cols]
            if len(seq) < 24:
                continue
            # adaptive-ish curvature: +-5 window mean difference
            k = np.ones(11, np.float32)
            conv = np.convolve(seq, k, mode="same")
            curv = np.abs(conv - 11 * seq) / 10
            order = np.argsort(curv)
            flats.append(xyz_img[r, cols[order[:400]]])
            edges.append(xyz_img[r, cols[order[-30:]]])
        return (pts, np.concatenate(edges) if edges else pts[:0],
                np.concatenate(flats) if flats else pts[:0])

    t0 = time.time()
    prev = None
    for raw in scans_np[:n_sample]:
        pts, edges, flats = extract(raw)
        if prev is not None:
            p_pts, p_edges, p_flats = prev
            # point->line: 5-NN of every edge point among prev edges
            if len(p_edges) > 5 and len(edges) > 0:
                cKDTree(p_edges).query(edges, k=5)
            # point->plane: 10-NN + per-query plane fit (eigh of 3x3)
            if len(p_flats) > 10 and len(flats) > 0:
                d, idx = cKDTree(p_flats).query(flats[:384], k=10)
                nn = p_flats[idx]                     # (Q,10,3)
                c = nn - nn.mean(axis=1, keepdims=True)
                cov = np.einsum("qki,qkj->qij", c, c)
                np.linalg.eigh(cov)
        prev = (pts, edges, flats)
    dt = (time.time() - t0) / n_sample
    return 1.0 / dt


def main():
    import synthetic

    rng = np.random.default_rng(0)
    scans = [synthetic.make_scan(origin=(0.1 * i, 0.02 * i, -1.0),
                                 noise=0.004, rng=rng)
             for i in range(N_BENCH_SCANS)]

    tpu_rate = tpu_pipeline(scans)
    cpu_rate = cpu_baseline(scans)
    print(json.dumps({
        "metric": "lidar_scans_per_sec_reproject_associate",
        "value": round(tpu_rate, 2),
        "unit": "scans/sec",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
