"""Benchmark: LiDAR scans/sec reprojected + associated (BASELINE.json metric).

Measures the hot path of the init_lidar_pose stage on the available backend
(real TPU under the driver): VLP-16 scan -> range image -> segmentation ->
curvature -> edge/plane/line features, then pairwise KNN association
(point->line, point->plane, line->line) across the neighbor graph.

vs_baseline: a single-thread numpy/scipy implementation of the equivalent
work (range image binning, curvature, feature picking, cKDTree 5/10-NN
association), standing in for the C++ reference which ships no published
numbers (BASELINE.md) and cannot be built here (no PCL/Ceres).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "tests")

N_BENCH_SCANS = 16


def tpu_pipeline(scans_np):
    import jax
    import jax.numpy as jnp
    from panovlm_tpu.models import association, lidar_odometry
    from panovlm_tpu.sensors import velodyne as vd

    padded = []
    for s in scans_np:
        pts, _ = vd.preprocess_cloud(s)
        p, m = vd.pad_points(pts, 32768)
        padded.append((p, m))
    pts = jnp.asarray(np.stack([p for p, _ in padded]))
    msk = jnp.asarray(np.stack([m for _, m in padded]))

    extract = jax.jit(jax.vmap(lambda p, m: vd.extract_features(p, m)[0]))

    n = len(scans_np)
    poses = jnp.zeros((n, 6))
    poses = poses.at[:, 3].set(jnp.arange(n) * 0.15)  # rough odometry prior
    pair_r = jnp.asarray(np.arange(n - 1), jnp.int32)
    pair_n = jnp.asarray(np.arange(1, n), jnp.int32)

    # two separately-jitted stages (fusing them into one program gives XLA a
    # pathologically slow compile for no runtime benefit)
    assoc_j = jax.jit(lambda feats, poses: association.associate_all_pairs(
        {k: getattr(feats, k) for k in feats._fields}, poses, pair_r, pair_n))

    feats = extract(pts, msk)               # compile both
    out = assoc_j(feats, poses)
    jax.block_until_ready(out)
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        feats = extract(pts, msk)
        out = assoc_j(feats, poses)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    return n / dt, out


def cpu_baseline(scans_np, n_sample=2):
    """Single-thread numpy/scipy equivalent, timed on a sample of scans."""
    from scipy.spatial import cKDTree

    def one_scan(raw):
        pts = raw @ np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32).T
        pts = pts[(pts ** 2).sum(1) >= 0.25]
        x, y, z = pts.T
        rng = np.sqrt(x * x + y * y + z * z)
        va = np.degrees(np.arctan2(-y, np.sqrt(x * x + z * z)))
        ring = np.floor((va + 15) / 2 + 0.5).astype(int)
        ori = np.arctan2(x, z)
        col = np.mod(np.round(ori / (2 * np.pi / 1800)).astype(int), 1800)
        img = np.zeros((16, 1800), np.float32)
        ok = (ring >= 0) & (ring < 16)
        img[ring[ok], col[ok]] = rng[ok]
        # curvature per row (window 5 sum difference)
        k = np.ones(11, np.float32)
        curv = np.abs(np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same") - 11 * r, 1, img))
        # picks: top 30 edges, 400 flats per scan row
        edges, flats = [], []
        for r in range(16):
            order = np.argsort(curv[r])
            flats.append(np.stack([np.full(400, r), order[:400]], 1))
            edges.append(np.stack([np.full(30, r), order[-30:]], 1))
        return pts, img, np.concatenate(edges), np.concatenate(flats)

    t0 = time.time()
    prev = None
    for raw in scans_np[:n_sample]:
        pts, img, edges, flats = one_scan(raw)
        if prev is not None:
            tree = cKDTree(prev)
            tree.query(pts[::8], k=5)    # point->line 5-NN
            tree.query(pts[::16], k=10)  # point->plane 10-NN
        prev = pts
    dt = (time.time() - t0) / n_sample
    return 1.0 / dt


def main():
    import synthetic

    rng = np.random.default_rng(0)
    scans = []
    for i in range(N_BENCH_SCANS):
        scans.append(synthetic.make_scan(
            origin=(0.1 * i, 0.02 * i, -1.0), noise=0.004, rng=rng))

    tpu_rate, _ = tpu_pipeline(scans)
    cpu_rate = cpu_baseline(scans)
    print(json.dumps({
        "metric": "lidar_scans_per_sec_reproject_associate",
        "value": round(tpu_rate, 2),
        "unit": "scans/sec",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
