"""Standalone LiDAR plane segmentation + per-point normal maps.

Parity status: like its reference counterpart, this module has NO
production caller. The reference declares Velodyne::ExtractPlanes
(sensors/Velodyne.h:189) but never calls it from any pipeline stage; this
module mirrors that surface (and is exercised by tests/test_velodyne.py /
test_parallel.py) so a user porting code that calls ExtractPlanes finds
the equivalent here. The production point-to-plane association instead
fits planes from 10-NN candidates on the fly (models/association.py),
exactly as the reference's LidarFeatureAssociate does.

Replaces sensors/LidarPlaneExtraction.{h,cpp} (reference, 391 LoC):
  * ComputeNormals (:91-197): per-point normals from range-image
    neighborhoods (~70% same-ring, rest adjacent rings);
  * PlaneSegmentation (:11-89): normal-based region growing (PCL
    RegionGrowing, 3-deg smoothness) + multi-ring cluster filter;
  * PlaneSegmentation2 (:227-332, the Velodyne::ExtractPlanes default):
    BFS growth with incremental plane refits, clusters of 100..10000
    points whose fit RMS stays below ~3 cm.

TPU-first reformulation: everything lives on the (S, H) range image with
STATIC-shift neighborhoods (slice+pad / roll — pure memory ops, no
gathers), so the whole scan is one fused elementwise program:
  1. normal map: moment accumulation (n, sum p, sum p p^T) over a fixed
     shift set, one analytic 3x3 eigh per cell (ops/geometry.eigh3x3);
  2. region growing -> label flooding: neighbors conduct when both
     normals agree within smooth_deg; the segmented doubling-scan
     (velodyne._seg_run_min) broadcasts component minima in log steps —
     the batched equivalent of PCL's queue-based growth;
  3. cluster validation replaces the reference's incremental refits:
     per-cluster plane fits from scatter-added moments, keep clusters
     by size window, >= 2 rings, and fit RMS — the same acceptance
     criteria PlaneSegmentation2 applies point-by-point, applied once
     per converged cluster.

Production status: mirror of dead reference code. The reference declares
`Velodyne::ExtractPlanes` (sensors/Velodyne.h:189) but never calls it from
any stage — its point-to-plane association instead fits planes from 10-NN
neighborhoods on the fly (lidar_mapping/LidarFeatureAssociate.cpp:550-629),
and so does ours (models/association.py). This module is therefore
test-covered library surface (tests/test_velodyne.py) with no pipeline
caller, exactly like its reference counterpart; wire `segment_planes`'s
labels/normals into association as an extra candidate gate if a dataset
ever warrants it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.geometry import eigh3x3
from .velodyne import _seg_run_min, _shift_fill


class PlaneMap(NamedTuple):
    normals: jnp.ndarray    # (S, H, 3) unit, flipped toward the sensor
    curvature: jnp.ndarray  # (S, H) lambda0 / trace
    labels: jnp.ndarray     # (S, H) int32 component ids (S*H = none)
    keep: jnp.ndarray       # (S, H) cells in a validated plane cluster


def _neighbor_offsets(k_cols: int):
    # same-ring chord + a WIDE cross-ring reach: the range image loses
    # ~1/3 of cells to azimuth-bin collisions, and a cell whose adjacent
    # -ring neighbors are all holes degenerates to a collinear (same-
    # ring-only) neighborhood with an arbitrary normal
    offs = [(0, dc) for dc in range(-k_cols, k_cols + 1) if dc]
    offs += [(dr, dc) for dr in (-1, 1) for dc in range(-2, 3)]
    offs += [(dr, dc) for dr in (-2, 2) for dc in (-1, 0, 1)]
    return offs


@functools.partial(jax.jit, static_argnames=("k_cols",))
def compute_normals(xyz_img, valid, k_cols: int = 6):
    """Normal + curvature maps (ComputeNormals,
    LidarPlaneExtraction.cpp:91-197: k-neighborhoods mixing the point's
    own ring with the adjacent rings). Azimuth wraps; rings clamp.

    Returns (normals (S,H,3) unit, curvature (S,H), n_ok (S,H) bool)."""
    v = valid[..., None].astype(xyz_img.dtype)
    p = xyz_img * v

    def shifted(x, dr, dc, fill):
        x = jnp.roll(x, dc, axis=1)                # azimuth wraps
        return _shift_fill(x, dr, axis=0, fill=fill)

    n_acc = v[..., 0]
    n_cross = jnp.zeros_like(n_acc)
    s1 = p
    s2 = jnp.einsum("shi,shj->shij", p, p)
    for dr, dc in _neighbor_offsets(k_cols):
        vv = shifted(v, dr, dc, 0.0)
        pp = shifted(p, dr, dc, 0.0)
        n_acc = n_acc + vv[..., 0]
        if dr != 0:
            n_cross = n_cross + vv[..., 0]
        s1 = s1 + pp
        s2 = s2 + jnp.einsum("shi,shj->shij", pp, pp)
    n_safe = jnp.maximum(n_acc, 1.0)[..., None]
    mean = s1 / n_safe
    cov = s2 / n_safe[..., None] - jnp.einsum("shi,shj->shij", mean, mean)
    evals, evecs = eigh3x3(cov)
    normal = evecs[..., 0]
    # orient toward the sensor at the origin (flipNormalTowardsViewpoint)
    flip = jnp.sum(normal * xyz_img, axis=-1) > 0
    normal = jnp.where(flip[..., None], -normal, normal)
    tr = jnp.maximum(evals.sum(-1), 1e-12)
    curvature = jnp.maximum(evals[..., 0], 0.0) / tr
    # a neighborhood must span a 2D patch, not a ring chord: require
    # cross-ring support directly (an eigenvalue-ratio test cannot tell
    # a collinear chord from a legitimately anisotropic floor sliver —
    # the ring gap dwarfs the chord at range on both)
    n_ok = valid & (n_acc >= 4) & (n_cross >= 2)
    return normal, curvature, n_ok


@functools.partial(jax.jit, static_argnames=("iters",))
def _grow_labels(normals, xyz_img, conductive, valid, smooth_deg,
                 dist_thresh=0.05, iters: int = 4):
    """Label flooding over the 4-neighborhood: an edge conducts when both
    endpoints are conductive (valid, low curvature), the SIGNED normals
    agree within smooth_deg (they are oriented toward the sensor, so
    floor and ceiling cannot merge), and each endpoint lies within
    dist_thresh of the other's tangent plane — the point-to-plane
    criterion PlaneSegmentation2 enforces with its incremental refits,
    which stops smoothly-rotating corner chains from leaking one plane
    into the next. Same doubling-scan engine as the LeGO-LOAM
    segmentation (velodyne.segment_range_image)."""
    S, H = valid.shape
    cos_t = jnp.cos(jnp.radians(smooth_deg))

    def agree(na, pa, nb, pb):
        smooth = jnp.sum(na * nb, axis=-1) >= cos_t
        d = pb - pa
        # offset tolerance grows with the neighbor gap (cross-ring gaps
        # reach meters at range; a few degrees of normal tilt is fine)
        # but stays bounded in absolute terms near the sensor
        tol = dist_thresh + 0.05 * jnp.linalg.norm(d, axis=-1)
        off_a = jnp.abs(jnp.sum(na * d, axis=-1))
        off_b = jnp.abs(jnp.sum(nb * d, axis=-1))
        return smooth & (off_a <= tol) & (off_b <= tol)

    left_n = jnp.roll(normals, 1, axis=1)
    left_p = jnp.roll(xyz_img, 1, axis=1)
    left_c = jnp.roll(conductive, 1, axis=1)
    conn_left = agree(normals, xyz_img, left_n, left_p) \
        & conductive & left_c
    up_n = _shift_fill(normals, 1, axis=0, fill=0.0)
    up_p = _shift_fill(xyz_img, 1, axis=0, fill=0.0)
    up_c = _shift_fill(conductive, 1, axis=0, fill=False)
    conn_up = agree(normals, xyz_img, up_n, up_p) & conductive & up_c

    big = jnp.int32(S * H)
    lin = jnp.arange(S * H, dtype=jnp.int32).reshape(S, H)
    labels = jnp.where(conductive, lin, big)
    conn_row = conn_left.at[:, 0].set(False)

    def body(_, lab):
        lab = _seg_run_min(lab, conn_row, axis=1, big=big)
        wrap = conn_left[:, 0]
        lab = lab.at[:, 0].min(jnp.where(wrap, lab[:, -1], S * H))
        lab = lab.at[:, -1].min(jnp.where(wrap, lab[:, 0], S * H))
        lab = _seg_run_min(lab, conn_up, axis=0, big=big)
        return jnp.where(conductive, lab, big)

    return jax.lax.fori_loop(0, iters, body, labels)


@functools.partial(jax.jit, static_argnames=("min_cluster", "max_cluster"))
def _validate_clusters(xyz_img, valid, labels, min_cluster: int,
                       max_cluster: int, rms_thresh):
    """Per-cluster acceptance (PlaneSegmentation2's running criteria,
    applied once per converged cluster): size window, >= 2 rings, plane
    fit RMS <= rms_thresh. Scatter-added moments + analytic eigh."""
    S, H = valid.shape
    flat = labels.ravel()
    vf = valid.ravel().astype(xyz_img.dtype)
    p = xyz_img.reshape(-1, 3) * vf[:, None]

    n = jnp.zeros((S * H + 1,), xyz_img.dtype).at[flat].add(vf)
    s1 = jnp.zeros((S * H + 1, 3), xyz_img.dtype).at[flat].add(p)
    s2 = jnp.zeros((S * H + 1, 3, 3), xyz_img.dtype).at[flat].add(
        jnp.einsum("pi,pj->pij", p, p))
    rows = jnp.zeros((S * H + 1,), jnp.int32)
    for r in range(S):
        pres = jnp.zeros((S * H + 1,), jnp.int32).at[labels[r]].max(
            valid[r].astype(jnp.int32))
        rows = rows + pres

    n_safe = jnp.maximum(n, 1.0)
    mean = s1 / n_safe[:, None]
    cov = s2 / n_safe[:, None, None] - jnp.einsum("ci,cj->cij", mean, mean)
    evals, _ = eigh3x3(cov)
    rms = jnp.sqrt(jnp.maximum(evals[:, 0], 0.0))
    ok = ((n >= min_cluster) & (n <= max_cluster) & (rows >= 2)
          & (rms <= rms_thresh))
    return ok[flat].reshape(S, H) & valid


@jax.jit
def _cells_near_cluster_plane(xyz_img, valid, labels, dist_thresh):
    """Per-cell distance to the cell's OWN cluster plane (scatter-added
    moments -> analytic eigh per cluster -> one 6-float gather per cell).
    Cells of tiny clusters (< 3) pass trivially."""
    S, H = valid.shape
    flat = labels.ravel()
    vf = valid.ravel().astype(xyz_img.dtype)
    p = xyz_img.reshape(-1, 3) * vf[:, None]
    n = jnp.zeros((S * H + 1,), xyz_img.dtype).at[flat].add(vf)
    s1 = jnp.zeros((S * H + 1, 3), xyz_img.dtype).at[flat].add(p)
    s2 = jnp.zeros((S * H + 1, 3, 3), xyz_img.dtype).at[flat].add(
        jnp.einsum("pi,pj->pij", p, p))
    n_safe = jnp.maximum(n, 1.0)
    mean = s1 / n_safe[:, None]
    cov = s2 / n_safe[:, None, None] - jnp.einsum("ci,cj->cij", mean, mean)
    _, evecs = eigh3x3(cov)
    nrm = evecs[..., 0]
    d = jnp.abs(jnp.sum((xyz_img.reshape(-1, 3) - mean[flat])
                        * nrm[flat], axis=-1))
    ok = (d <= dist_thresh) | (n[flat] < 3)
    return ok.reshape(S, H)


def extract_planes(xyz_img, valid, smooth_deg: float = 5.0,
                   curvature_thresh: float = 0.05,
                   min_cluster: int = 100, max_cluster: int = 10000,
                   rms_thresh: float = 0.03, k_cols: int = 6) -> PlaneMap:
    """Full plane segmentation over one scan's range image
    (Velodyne::ExtractPlanes, Velodyne.cpp:1429-1435). Returns PlaneMap."""
    normals, curvature, n_ok = compute_normals(xyz_img, valid,
                                               k_cols=k_cols)
    # PCL's curvature gate is nearly open (threshold 1.0 in the
    # reference call); the strict planarity decision is the per-cluster
    # RMS below — the gate here only keeps corner/edge cells from
    # bridging two planes
    conductive = n_ok & (curvature <= curvature_thresh)
    labels = _grow_labels(normals, xyz_img, conductive, valid, smooth_deg)
    # refit-and-reassign (the global criterion of PlaneSegmentation2's
    # incremental refits, batched): fit each cluster's plane, evict
    # cells whose point sits too far from THEIR cluster's plane — the
    # pairwise smoothness chain cannot see these — then re-flood with
    # the leaky cells cut out of the conduction graph
    cond = conductive
    for _ in range(2):
        near = _cells_near_cluster_plane(xyz_img, cond, labels,
                                         jnp.float32(2.0 * rms_thresh))
        cond = cond & near
        labels = _grow_labels(normals, xyz_img, cond, valid, smooth_deg)
    keep = _validate_clusters(xyz_img, cond, labels,
                              min_cluster, max_cluster,
                              jnp.float32(rms_thresh))
    return PlaneMap(normals=normals, curvature=curvature,
                    labels=jnp.where(keep, labels, labels.shape[0]
                                     * labels.shape[1]),
                    keep=keep)


def plane_params(xyz_img, valid, plane_map: PlaneMap, cap: int = 32):
    """Compact the validated clusters to at most `cap` planes (largest
    first): centers (cap,3), unit normals (cap,3), d offsets (cap,),
    sizes (cap,), mask (cap,). Host compaction of the label set (tiny),
    batched device fits."""
    labels = np.asarray(plane_map.labels)
    keep = np.asarray(plane_map.keep)
    xyz = np.asarray(xyz_img)
    ids, counts = np.unique(labels[keep], return_counts=True)
    order = np.argsort(-counts)[:cap]
    ids, counts = ids[order], counts[order]
    centers = np.zeros((cap, 3), np.float32)
    normals = np.zeros((cap, 3), np.float32)
    ds = np.zeros((cap,), np.float32)
    sizes = np.zeros((cap,), np.int32)
    mask = np.zeros((cap,), bool)
    for k, (lid, cnt) in enumerate(zip(ids, counts)):
        pts = xyz[(labels == lid) & keep]
        c = pts.mean(0)
        cov = (pts - c).T @ (pts - c) / len(pts)
        w, v = np.linalg.eigh(cov)
        nrm = v[:, 0]
        if nrm @ c > 0:
            nrm = -nrm
        centers[k] = c
        normals[k] = nrm
        ds[k] = -nrm @ c
        sizes[k] = cnt
        mask[k] = True
    return centers, normals, ds, sizes, mask
