"""Joint panoramic MVS — the reference's joint_mvs stage.

Replaces mvs/MVS.{h,cpp} (reference, 3.3k LoC). Pipeline parity
(EstimateDepthMaps, MVS.cpp:81-166):

  RefineCameraPose    -> models/sfm.global_ba with per-frame T_cl preserved
                         by the caller (MVS.cpp:383-428)
  SelectNeighborViews -> select_neighbor_views (KNN on camera centers,
                         MVS.cpp:334-381)
  Initialize          -> init_depth_normal (LiDAR depth init + random fill,
                         depth_constant mask, MVS.cpp:496-584)
  pass 1 photometric  -> estimate_depth_map(geometric=False)
  pass 2 geometric    -> estimate_depth_map(geometric=True, neighbor depths)
  RemoveSmallSegments -> remove_small_segments (MVS.cpp:1504)
  GapInterpolation    -> gap_interpolation (MVS.cpp:1580)
  FilterDepthMaps     -> filter_depth_maps (Merrell-style conf-weighted
                         consensus with occlusion / free-space checks,
                         MVS.cpp:1794-1891)
  FuseDepthMaps       -> fuse_depth_maps (multi-view conf-weighted merge,
                         MVS.cpp:2168-2336)

The hot per-pixel loops live in ops/patchmatch.py as batched array programs;
this module is the per-image driver and the cross-image filter/fusion.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import patchmatch, se3, spherical
from ..ops.patchmatch import PatchMatchConfig


class MVSConfig(NamedTuple):
    pm: PatchMatchConfig = PatchMatchConfig()
    n_iterations: int = 4
    n_neighbors: int = 4
    propagate: int = 1                    # Propagate enum (mvs/MVS.h:38-42):
                                          # 1 checkerboard, 2 sequential
    keep_lidar_constant: bool = False     # Config.h keep_lidar_constant
    mvs_use_geometric: bool = True
    packed_sampling: bool = True          # one-gather warps (u8 gray /
                                          # u16 depth packing; see
                                          # ops/spherical.pack_bilinear_u8)
    depth_diff_threshold: float = 0.01
    min_segment: int = 50
    conf_threshold: float = 0.3           # min NCC-score to keep a pixel
    filter_support: int = 2               # neighbors agreeing (Merrell)


def select_neighbor_views(poses_cw, n_neighbors: int, valid=None):
    """KNN neighbor view selection on camera centers (MVS.cpp:334-381).
    Returns (N, K) int32 neighbor indices."""
    aa = jnp.asarray(poses_cw[:, :3])
    R = se3.exp_so3(aa)
    C = -se3.einsum("nji,nj->ni", R, jnp.asarray(poses_cw[:, 3:]))
    C = np.asarray(C)
    n = len(C)
    if valid is None:
        valid = np.ones(n, bool)
    d = np.linalg.norm(C[:, None] - C[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    d[:, ~valid] = np.inf
    return np.argsort(d, axis=1)[:, :n_neighbors].astype(np.int32)


def select_neighbor_sfm(poses_cw, points, track_img, track_mask,
                        n_neighbors: int, min_baseline: float = 0.0,
                        angle_threshold: float = 10.0,
                        scale_threshold: float = 1.6):
    """SFM_POINTS neighbor selection (SelectNeighborSFM, MVS.cpp:248-332):
    score every ordered view pair by shared SfM-point visibility — per
    co-visible point, an angle factor min((angle/10deg)^1.5, 1) times a
    depth-ratio factor (1 if ~equal, quadratic falloff) — then take each
    reference's top-scored neighbors whose baseline exceeds min_baseline.
    Robust on loopy trajectories where plain center-KNN picks
    opposite-facing views.

    points (T,3) world; track_img (T,L) view ids; track_mask (T,L).
    Returns (N, K) int32 (padded with -1 when a row lacks neighbors)."""
    poses_cw = np.asarray(poses_cw)
    n = len(poses_cw)
    R = np.asarray(se3.exp_so3(jnp.asarray(poses_cw[:, :3])))
    C = -np.einsum("nji,nj->ni", R, poses_cw[:, 3:])
    points = np.asarray(points)
    track_img = np.asarray(track_img)
    track_mask = np.asarray(track_mask)
    T, L = track_img.shape
    score = np.zeros((n, n), np.float64)
    # per-slot view rays and depths (T, L)
    V = points[:, None, :] - C[track_img]               # (T, L, 3)
    dep = np.linalg.norm(V, axis=-1)
    Vn = V / np.maximum(dep[..., None], 1e-12)
    for a in range(L):
        for b in range(a + 1, L):
            m = track_mask[:, a] & track_mask[:, b]
            if not m.any():
                continue
            ia, ib = track_img[m, a], track_img[m, b]
            ang = np.degrees(np.arccos(np.clip(
                (Vn[m, a] * Vn[m, b]).sum(-1), -1.0, 1.0)))
            angf = np.minimum((ang / angle_threshold) ** 1.5, 1.0)

            def scale_factor(s):
                out = np.where(s > scale_threshold,
                               scale_threshold ** 2 / np.maximum(s, 1e-12) ** 2,
                               np.where(s >= 1.0, 1.0, s ** 2))
                return out

            s_ab = dep[m, a] / np.maximum(dep[m, b], 1e-12)
            np.add.at(score, (ia, ib), scale_factor(s_ab) * angf)
            np.add.at(score, (ib, ia), scale_factor(1.0 / s_ab) * angf)
    baseline = np.linalg.norm(C[:, None] - C[None], axis=-1)
    out = np.full((n, n_neighbors), -1, np.int32)
    for r in range(n):
        order = np.argsort(-score[r])
        k = 0
        for j in order:
            if k >= n_neighbors or score[r, j] <= 0:
                break
            if baseline[r, j] > min_baseline:
                out[r, k] = j
                k += 1
    return out


def relative_to_neighbors(poses_cw, ref: int, nei_idx):
    """(R_nr, t_nr) for each neighbor view: p_n = R_nr p_r + t_nr."""
    poses = jnp.asarray(poses_cw)
    R_all = se3.exp_so3(poses[:, :3])
    t_all = poses[:, 3:]
    R_r, t_r = R_all[ref], t_all[ref]
    R_n, t_n = R_all[jnp.asarray(nei_idx)], t_all[jnp.asarray(nei_idx)]
    R_nr = se3.matmul(R_n, jnp.swapaxes(R_r[None], -1, -2))
    t_nr = t_n - se3.einsum("vij,j->vi", R_nr, t_r)
    return R_nr, t_nr


def fit_sweep_range(pm: PatchMatchConfig, depth_samples) -> PatchMatchConfig:
    """Tighten the plane-sweep depth range — and slice count, at CONSTANT
    displacement resolution — to a scene depth prior (TPU extension;
    config mvs_fit_sweep_range).

    Sweep slices are uniform in inverse depth, i.e. uniform in warp
    displacement, so the volume's hat-interpolation error is set by the
    displacement step (inverse-depth span / slices). Fitting [min, max]
    to the LiDAR prior's 2-98 pct span (0.7x / 1.3x margins) keeps that
    step constant with proportionally fewer slices; the volume build is
    V*D*H*W gathers at ~131 M/s (PERF.md) — the stage bottleneck — and
    costs O(slices). Measured at the 720x1440 Room bench profile:
    fitted [0.6, 6] m D~30 vs configured [0.3, 10] m D=64 gives 1.6x
    maps/min at BETTER median depth error (0.094 vs 0.209 — the tighter
    random-init range helps too)."""
    v = np.asarray(depth_samples).ravel()
    v = v[(v > 0) & np.isfinite(v)]
    if not pm.sweep_slices or v.size < 1024:
        return pm
    lo, hi = np.percentile(v, [2.0, 98.0])
    fit_min = max(pm.min_depth, 0.7 * float(lo))
    fit_max = min(pm.max_depth, 1.3 * float(hi))
    if not fit_max > fit_min:
        return pm
    full = 1.0 / pm.min_depth - 1.0 / pm.max_depth
    part = 1.0 / fit_min - 1.0 / fit_max
    slices = int(np.clip(np.ceil(pm.sweep_slices * part / max(full, 1e-9)),
                         16, pm.sweep_slices))
    return pm._replace(min_depth=fit_min, max_depth=fit_max,
                       sweep_slices=slices)


def init_depth_normal(key, rays, lidar_depth=None,
                      cfg: MVSConfig = MVSConfig()):
    """InitDepthNormal (MVS.cpp:496-584): LiDAR depth where available +
    random depth elsewhere; random camera-facing normals; fixed mask when
    keep_lidar_constant."""
    H, W = rays.shape[:2]
    k1, k2 = jax.random.split(key)
    d_rand = jnp.exp(jax.random.uniform(
        k1, (H, W), minval=jnp.log(cfg.pm.min_depth),
        maxval=jnp.log(cfg.pm.max_depth)))
    if lidar_depth is not None:
        has = lidar_depth > cfg.pm.min_depth
        depth = jnp.where(has, lidar_depth, d_rand)
        fixed = has & cfg.keep_lidar_constant
    else:
        depth = d_rand
        fixed = jnp.zeros((H, W), bool)
    normal = patchmatch.random_normals(k2, rays)
    return depth, normal, fixed


def estimate_depth_map(gray_ref, grays_nei, poses_cw, ref, nei_idx,
                       depth0, normal0, fixed, cfg: MVSConfig,
                       nei_depths=None, seed: int = 0):
    """Per-image PatchMatch (EstimateDepthMapSingle, MVS.cpp:930-1054):
    n_iterations of red/black half-steps. Returns (depth, normal, conf)."""
    H, W = gray_ref.shape
    rays = spherical.pixel_ray_grid(H, W)
    R_nr, t_nr = relative_to_neighbors(poses_cw, ref, nei_idx)
    if cfg.packed_sampling:
        # one-gather bilinear warps: neighbor grays as packed u8 quads,
        # neighbor depths as packed u16 quads (the reference's own on-disk
        # depth quantization, util/FileIO.h:101-123)
        grays_nei = patchmatch.pack_views(grays_nei)
        if nei_depths is not None:
            nei_depths = jax.vmap(
                lambda d: spherical.pack_bilinear_u16(d)[0])(
                    jnp.asarray(nei_depths))
    vols = dvols = None
    if cfg.pm.sweep_slices:
        vols = patchmatch.build_sweep_volume(grays_nei, rays, R_nr, t_nr,
                                             cfg.pm, nei_depths)
        if nei_depths is not None:
            vols, dvols = vols
    cost = patchmatch.multiview_cost(
        gray_ref, grays_nei, rays, depth0, normal0, R_nr, t_nr, cfg.pm,
        nei_depths, vols=vols, dvols=dvols)
    # same smoothness bonus the candidate scoring applies, so the incumbent
    # and its challengers are compared in the same cost space
    cost = cost * patchmatch.smoothness_factor(rays, depth0, normal0,
                                               depth0, normal0, cfg.pm)
    depth, normal = depth0, normal0
    key = jax.random.PRNGKey(seed)
    for it in range(cfg.n_iterations):
        if cfg.propagate == 2:      # SEQUENTIAL: alternate sweep direction
            key, sub = jax.random.split(key)
            depth, normal, cost = patchmatch.sequential_step(
                gray_ref, grays_nei, rays, depth, normal, cost,
                R_nr, t_nr, sub, fixed, cfg.pm, it % 2, nei_depths,
                vols=vols, dvols=dvols)
        else:                       # CHECKER_BOARD: red/black half-steps
            for parity in (0, 1):
                key, sub = jax.random.split(key)
                depth, normal, cost = patchmatch.checkerboard_step(
                    gray_ref, grays_nei, rays, depth, normal, cost,
                    R_nr, t_nr, sub, fixed, cfg.pm, parity, nei_depths,
                    vols=vols, dvols=dvols)
    # Confidence = the NCC score itself, exactly the reference's semantics:
    # ScorePixel returns the best-2-neighbor mean NCC in [-1,1] (higher =
    # better, mvs/MVS.cpp:905-923), InitConfMap stores it as conf_map
    # (MVS.cpp:586-619), and ConvertNCC2Conf clamps negatives to 0 before
    # conf-weighted filtering (MVS.cpp:2343-2353). Our `cost` is 1-NCC in
    # [0,2], so 1-cost IS that score; downstream filter/fuse apply
    # max(conf, 0), matching ConvertNCC2Conf.
    conf = jnp.clip(1.0 - cost, -1.0, 1.0)
    return depth, normal, conf


def estimate_depth_maps_batched(grays, poses_cw, nei_table, depth0s,
                                normal0s, fixeds, cfg: MVSConfig,
                                nei_depths=None, seed: int = 0, mesh=None,
                                ref_idx=None, key_idx=None):
    """Batched multi-image PatchMatch: a batch of reference images in ONE
    jitted program (patchmatch.run_patchmatch_batched). Images are
    embarrassingly parallel, so passing a data `mesh` shards the image axis
    across chips with no collectives — the multi-chip execution of the
    reference's per-image OpenMP loop (mvs/MVS.cpp:93-117).

    grays (N,H,W) float: the image set neighbor views are gathered from —
    either the full stack or a host-gathered residency window containing
    just the chunk's refs+neighbors (then nei_table/ref_idx are indices
    into that window and key_idx carries the global ids for the rng).
    nei_table (B,V) int: image indices per reference. depth0s/normal0s/
    fixeds (B,H,W[,3]). ref_idx None (then B must equal N and refs are
    0..N-1) or (B,) reference indices — chunking the refs while neighbors
    still come from the window. nei_depths None or (N,H,W) per-image
    PHOTOMETRIC depths (indexed like grays). Seeds fold in the GLOBAL
    image id, so chunked == whole-batch results.
    Returns (depths, normals, confs), each leading axis B.
    """
    grays = jnp.asarray(grays)
    N, H, W = grays.shape
    rays = spherical.pixel_ray_grid(H, W)
    nei_table = np.asarray(nei_table)
    B, V = nei_table.shape[0], nei_table.shape[1]
    if ref_idx is None:
        assert B == N
        ref_idx = np.arange(N)
    ref_idx = np.asarray(ref_idx)
    R_nr = []
    t_nr = []
    for b in range(B):
        R, t = relative_to_neighbors(poses_cw, int(ref_idx[b]), nei_table[b])
        R_nr.append(R)
        t_nr.append(t)
    R_nr = jnp.stack(R_nr)
    t_nr = jnp.stack(t_nr)
    # rng folds the GLOBAL image id (key_idx) so results are identical
    # whether the caller ships the full image stack or a host-gathered
    # residency window with locally re-indexed grays/poses (Room-scale
    # memory plan replacing the reference's refcount cache, mvs/MVS.h:89-101)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(
        jnp.asarray(ref_idx if key_idx is None else key_idx))
    grays_ref = grays[jnp.asarray(ref_idx)]
    nei_grays = grays[nei_table]                      # (B,V,H,W)
    if cfg.packed_sampling:
        packed, scales = jax.vmap(jax.vmap(spherical.pack_bilinear_u8))(
            nei_grays)
        nei_views = patchmatch.PackedViews(packed, scales)
        nd = None
        if nei_depths is not None:
            nd = jax.vmap(jax.vmap(
                lambda d: spherical.pack_bilinear_u16(d)[0]))(
                    jnp.asarray(nei_depths)[nei_table])
    else:
        nei_views = nei_grays
        nd = None if nei_depths is None else jnp.asarray(nei_depths)[nei_table]
    args = (grays_ref, nei_views, rays, jnp.asarray(depth0s),
            jnp.asarray(normal0s), jnp.asarray(fixeds), R_nr, t_nr, keys)
    if mesh is not None:
        from ..parallel import replicated, shard_leading_axis
        shardable, rays_in = (args[:2] + args[3:], args[2])
        shardable = shard_leading_axis(shardable, mesh)
        rays_in = replicated(rays_in, mesh)
        args = shardable[:2] + (rays_in,) + shardable[2:]
        if nd is not None:
            nd = shard_leading_axis(nd, mesh)
    return patchmatch.run_patchmatch_batched(
        *args, cfg=cfg.pm, n_iterations=cfg.n_iterations,
        propagate=cfg.propagate, nei_depths=nd)


@functools.partial(jax.jit, static_argnames=("min_segment", "iters"))
def remove_small_segments(depth, depth_diff_threshold: float = 0.01,
                          min_segment: int = 50, iters: int = 48):
    """RemoveSmallSegments (MVS.cpp:1504): connected components of the depth
    map under relative-continuity (|d_p - d_q| < thr * d_p), label
    propagation like the range-image segmentation; small components die."""
    H, W = depth.shape
    valid = depth > 0

    def conn(a, b):
        return (jnp.abs(a - b) < depth_diff_threshold * jnp.maximum(a, b)) \
            & (a > 0) & (b > 0)

    left = jnp.concatenate([depth[:, :1], depth[:, :-1]], axis=1)
    up = jnp.concatenate([depth[:1, :], depth[:-1, :]], axis=0)
    c_left = conn(depth, left).at[:, 0].set(False)
    c_up = conn(depth, up).at[0, :].set(False)

    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    labels = jnp.where(valid, lin, H * W)

    def body(_, lab):
        l_left = jnp.concatenate([lab[:, :1], lab[:, :-1]], axis=1)
        l_right = jnp.concatenate([lab[:, 1:], lab[:, -1:]], axis=1)
        l_up = jnp.concatenate([lab[:1, :], lab[:-1, :]], axis=0)
        l_down = jnp.concatenate([lab[1:, :], lab[-1:, :]], axis=0)
        c_right = jnp.concatenate([c_left[:, 1:], jnp.zeros_like(c_left[:, :1])], axis=1)
        c_down = jnp.concatenate([c_up[1:, :], jnp.zeros_like(c_up[:1, :])], axis=0)
        lab = jnp.minimum(lab, jnp.where(c_left, l_left, H * W))
        lab = jnp.minimum(lab, jnp.where(c_right, l_right, H * W))
        lab = jnp.minimum(lab, jnp.where(c_up, l_up, H * W))
        lab = jnp.minimum(lab, jnp.where(c_down, l_down, H * W))
        return jnp.where(valid, lab, H * W)

    labels = jax.lax.fori_loop(0, iters, body, labels)
    sizes = jnp.zeros((H * W + 1,), jnp.int32).at[labels.ravel()].add(
        valid.ravel().astype(jnp.int32))
    keep = sizes[labels] >= min_segment
    return jnp.where(keep & valid, depth, 0.0)


@jax.jit
def gap_interpolation(depth, max_gap: int = 3):
    """GapInterpolation (MVS.cpp:1580): fill small holes with the mean of
    valid neighbors (repeated local averaging into empty pixels only)."""
    d = depth
    for _ in range(max_gap):
        v = (d > 0).astype(d.dtype)
        num = jnp.zeros_like(d)
        den = jnp.zeros_like(d)
        for dv, du in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            num = num + jnp.roll(jnp.roll(d * v, dv, 0), du, 1)
            den = den + jnp.roll(jnp.roll(v, dv, 0), du, 1)
        fill = num / jnp.maximum(den, 1.0)
        d = jnp.where((d <= 0) & (den >= 2), fill, d)
    return d


def filter_depth_maps(depths, confs, poses_cw, nei_table, cfg: MVSConfig):
    """FilterDepthImageRefine (MVS.cpp:1794-1891): per reference image,
    project each neighbor's depth map into the reference view and run the
    Merrell-style consensus: pixels need >= filter_support neighbors within
    the relative threshold; supported depths are conf-weighted averaged;
    occluded / free-space-violating pixels are dropped.

    depths (N,H,W), confs (N,H,W). Returns (filtered depths, filtered confs).
    """
    depths = np.asarray(depths)
    confs = np.asarray(confs)
    N, H, W = depths.shape
    rays = spherical.pixel_ray_grid(H, W)
    if cfg.packed_sampling:
        # one-gather bilinear reads of neighbor depth/conf (u16 quads — the
        # same quantization the reference stores these maps with on disk,
        # util/FileIO.h:101-123; the resume path reloads them from that u16
        # grid anyway). Transfer-lean staging: quantize to u16 on HOST,
        # ship the u16 planes (half the f32 bytes — host<->device moves
        # ~18-32 MB/s through the axon tunnel and is the measured filter
        # wall, PERF.md round-5), build the quads ON DEVICE and keep them
        # resident. The previous design packed on device but staged the
        # quad stacks through host memory — pulling and re-pushing 8x the
        # u16 bytes. The ref rows are read back out of tap 0 of the
        # resident quads (the pixel's own value), so no per-chunk f32 rows
        # ship with the main loop either.
        from ..utils import membudget
        membudget.assert_device_budget("joint_mvs/filter", {
            "depth_quads": ((N, H, W, 2), np.int32),
            "conf_quads": ((N, H, W, 2), np.int32),
        })
        pack_q = jax.jit(jax.vmap(lambda q: jax.lax.bitcast_convert_type(
            spherical._quad_taps(q).reshape(H, W, 2, 2), jnp.int32)))

        def stage_quads(a, scale, offset):
            q16 = np.clip(np.round((a + offset) * scale), 0, 65535) \
                .astype(np.uint16)
            outs = [pack_q(jnp.asarray(q16[s:s + 32]))
                    for s in range(0, N, 32)]
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

        depths_pk = stage_quads(depths, 256.0, 0.0)
        confs_pk = stage_quads(confs, 16384.0, 1.0)
    else:
        depths_pk = confs_pk = None

    # the full-trajectory stacks are jit ARGUMENTS, not closure captures:
    # captured concrete arrays lower to HLO constants, and at Room scale
    # (454 frames) the serialized program blows past the remote-compile
    # request limit (observed: HTTP 413 at N=454, 256x512)
    def one(ref, depth_ref, conf_ref, nei_idx, poses_cw, dstack, cstack):
        R_nr, t_nr = relative_to_neighbors(poses_cw, ref, nei_idx)
        X = depth_ref[..., None] * rays

        def per_view(v):
            x_n = jnp.einsum("ij,hwj->hwi", R_nr[v], X) + t_nr[v]
            d_at_n = jnp.linalg.norm(x_n, axis=-1)
            uv = spherical.cam_to_image(x_n, H, W)
            if cfg.packed_sampling:
                d_n = spherical.bilinear_sample_packed_u16(
                    dstack[nei_idx[v]], 256.0, uv)
                c_n = spherical.bilinear_sample_packed_u16(
                    cstack[nei_idx[v]], 16384.0, uv) - 1.0
            else:
                d_n = spherical.bilinear_sample(dstack[nei_idx[v]], uv)
                c_n = spherical.bilinear_sample(cstack[nei_idx[v]], uv)
            rel = jnp.abs(d_n - d_at_n) / jnp.maximum(d_at_n, 1e-6)
            support = (d_n > 0) & (rel < cfg.depth_diff_threshold * 3)
            # occlusion: the neighbor sees a CLOSER surface along this ray
            occluded = (d_n > 0) & (d_at_n > d_n * (1 + 3 * cfg.depth_diff_threshold))
            # estimate of ref depth implied by the neighbor's surface
            d_implied = depth_ref * jnp.where(d_at_n > 1e-6, d_n / d_at_n, 0.0)
            return support, occluded, d_implied, c_n

        outs = [per_view(v) for v in range(nei_idx.shape[0])]
        support = jnp.stack([o[0] for o in outs])
        occluded = jnp.stack([o[1] for o in outs])
        d_imp = jnp.stack([o[2] for o in outs])
        c_n = jnp.stack([o[3] for o in outs])
        n_support = jnp.sum(support, axis=0)
        w = jnp.where(support, jnp.maximum(c_n, 0.0) + 1e-3, 0.0)
        d_avg = (jnp.sum(w * d_imp, axis=0) + jnp.maximum(conf_ref, 0) * depth_ref) \
            / jnp.maximum(jnp.sum(w, axis=0) + jnp.maximum(conf_ref, 0), 1e-6)
        ok = ((n_support >= cfg.filter_support)
              & (conf_ref > cfg.conf_threshold)
              & (depth_ref > 0)
              & (jnp.sum(occluded, axis=0) < nei_idx.shape[0] - 1))
        return jnp.where(ok, d_avg, 0.0), jnp.where(ok, conf_ref, -1.0)

    def one_packed(ref, nei_idx, poses_cw, dstack, cstack):
        # ref depth/conf come out of tap 0 of the RESIDENT quads (the
        # pixel's own u16 value) — the u16 grid the artifacts/resume path
        # already uses — so the main loop ships no f32 rows at all.
        depth_ref = (dstack[ref][..., 0] & 0xFFFF).astype(jnp.float32) \
            * (1.0 / 256.0)
        conf_ref = (cstack[ref][..., 0] & 0xFFFF).astype(jnp.float32) \
            * (1.0 / 16384.0) - 1.0
        d, c = one(ref, depth_ref, conf_ref, nei_idx, poses_cw, dstack,
                   cstack)
        # quantized pulls: half the d2h bytes; exact under the caller's own
        # export_depth_u16 roundtrip (0 -> 0, -1 conf -> 0)
        d16 = jnp.clip(jnp.round(d * 256.0), 0, 65535).astype(jnp.uint16)
        c16 = jnp.clip(jnp.round((c + 1.0) * 16384.0), 0,
                       65535).astype(jnp.uint16)
        return d16, c16

    dstack = depths_pk if cfg.packed_sampling else jnp.asarray(depths)
    cstack = confs_pk if cfg.packed_sampling else jnp.asarray(confs)
    poses_dev = jnp.asarray(poses_cw)
    out_d = np.zeros((N, H, W), np.float32)
    out_c = np.zeros((N, H, W), np.float32)
    # chunked batch programs: the round-4 per-ref dispatch paid a fixed
    # ~1.4 s/frame floor (filter wall 1593 s at Room-454 profile; round-3
    # quarter-res was 1.43 s/frame at 1/8 the pixels — i.e. overhead-bound,
    # not pixel-bound). vmap over a ref chunk amortizes dispatch + sync
    # ~16x.
    B = max(1, min(N, (24 << 20) // (H * W)))       # ~24M px of work rows
    if cfg.packed_sampling:
        onev = jax.jit(jax.vmap(one_packed, in_axes=(0, 0, None, None, None)))
    else:
        onev = jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, None, None, None)))
    nei_np = np.asarray(nei_table)
    for s in range(0, N, B):
        e = min(s + B, N)
        # pad the last partial chunk to B (wrap rows) so the big vmapped
        # program compiles ONCE — remote compiles of this program are
        # minutes-scale at Room size
        sel = np.arange(s, e)
        if e - s < B:
            sel = np.concatenate([sel, np.zeros(B - (e - s), np.int64)])
        refs = jnp.asarray(sel, jnp.int32)
        if cfg.packed_sampling:
            d, c = onev(refs, jnp.asarray(nei_np[sel]), poses_dev,
                        dstack, cstack)
            out_d[s:e] = np.asarray(d)[:e - s].astype(np.float32) / 256.0
            out_c[s:e] = np.asarray(c)[:e - s].astype(np.float32) \
                / 16384.0 - 1.0
        else:
            d, c = onev(refs, jnp.asarray(depths[sel]),
                        jnp.asarray(confs[sel]), jnp.asarray(nei_np[sel]),
                        poses_dev, dstack, cstack)
            out_d[s:e] = np.asarray(d)[:e - s]
            out_c[s:e] = np.asarray(c)[:e - s]
    return out_d, out_c


def fuse_depth_maps(depths, confs, colors, poses_cw, cfg: MVSConfig,
                    voxel: float = 0.04):
    """FuseDepthImages (MVS.cpp:2168-2336): back-project every filtered
    depth map to world, conf-weighted voxel merge. colors: (N,H,W) gray or
    (N,H,W,3). Returns (points (M,3), colors (M,...), mask)."""
    from ..sensors.velodyne import voxel_downsample
    depths = np.asarray(depths)
    N, H, W = depths.shape
    rays = spherical.pixel_ray_grid(H, W)
    poses = jnp.asarray(np.asarray(poses_cw))
    R_all = se3.exp_so3(poses[:, :3])
    # transfer-lean chunk uploads (host->device moves ~18 MB/s through the
    # axon tunnel — the measured fuse wall): depth ships on the u16 artifact
    # grid (exact under the export/read roundtrip the resume path applies),
    # colors as u8 (the source images' own quantization — an exact
    # roundtrip for u8-loaded frames)
    d16_all = np.clip(np.round(depths * 256.0), 0, 65535).astype(np.uint16)
    colors_np = np.asarray(colors)
    c8_all = colors_np if colors_np.dtype == np.uint8 else \
        np.clip(np.round(colors_np * 255.0), 0, 255).astype(np.uint8)

    @jax.jit
    def chunk_fuse(d16_chunk, c8_chunk, R_chunk, t_chunk):
        d_chunk = d16_chunk.astype(jnp.float32) * (1.0 / 256.0)
        c_chunk = c8_chunk.astype(jnp.float32) * (1.0 / 255.0)
        X = d_chunk[..., None] * rays                    # (B, H, W, 3)
        R_wc = jnp.swapaxes(R_chunk, -1, -2)
        Xw = jnp.einsum("bij,bhwj->bhwi", R_wc, X - t_chunk[:, None, None, :])
        pts = Xw.reshape(-1, 3)
        cols = c_chunk.reshape(pts.shape[0], -1)
        msk = (d_chunk > 0).reshape(-1)
        if cols.shape[-1] == 3:
            msk = msk & ~_is_sky_color(cols)
        return voxel_downsample(pts, msk, aux=cols, leaf=voxel,
                                return_counts=True)

    # Two-level centroid voxel merge with chunked residency: the full
    # back-projected cloud at the Room profile is 454 x 1.04M points x
    # (xyz + rgb) — past HBM. Chunk frames, voxel-reduce each chunk on
    # device (per-voxel point-count-weighted centroids + counts), accumulate
    # the reduced sets on host, then one final count-WEIGHTED pass: the
    # weighted mean of chunk centroids equals the global per-voxel centroid
    # exactly (sum_i cnt_i * cent_i / sum_i cnt_i), positions and colors both.
    B = max(1, min(N, (1 << 24) // (H * W)))             # ~16M px per chunk
    acc_p, acc_c, acc_n = [], [], []
    for s in range(0, N, B):
        e = min(s + B, N)
        p, m, c, cnt = chunk_fuse(jnp.asarray(d16_all[s:e]),
                                  jnp.asarray(c8_all[s:e]),
                                  R_all[s:e], poses[s:e, 3:])
        # voxel_downsample outputs are head-compacted: pull only the valid
        # prefix (one scalar sync for the count) instead of the full padded
        # (B*H*W, ...) arrays — at the Room profile the padding was ~8x the
        # data and the per-chunk host pull dominated the fuse wall
        nv = int(np.asarray(jnp.sum(m)))
        acc_p.append(np.asarray(p[:nv]))
        acc_c.append(np.asarray(c[:nv]))
        acc_n.append(np.asarray(cnt[:nv]))
    pts = np.concatenate(acc_p) if acc_p else np.zeros((0, 3), np.float32)
    cols = np.concatenate(acc_c) if acc_c else np.zeros((0, 1), np.float32)
    cnts = np.concatenate(acc_n) if acc_n else np.zeros((0,), np.float32)
    fused, fmask, caux = voxel_downsample(
        jnp.asarray(pts), jnp.ones((len(pts),), bool),
        aux=jnp.asarray(cols), leaf=voxel, weights=jnp.asarray(cnts))
    return fused, caux, fmask


def _is_sky_color(rgb):
    """Sky-blue rejection gate (FuseDepthImages, MVS.cpp:2311-2317): HSV in
    H [100,124] (OpenCV 0-180 hue), S [43,200], V [150,255]. rgb (...,3) in
    [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = mx - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(mx == r, jnp.mod((g - b) / safe_c, 6.0),
                  jnp.where(mx == g, (b - r) / safe_c + 2.0,
                            (r - g) / safe_c + 4.0))
    h = jnp.where(c > 0, h * 30.0, 0.0)          # OpenCV hue: 0..180
    s = jnp.where(mx > 0, c / jnp.where(mx > 0, mx, 1.0), 0.0) * 255.0
    v = mx * 255.0
    return ((h >= 100) & (h <= 124) & (s >= 43) & (s <= 200)
            & (v >= 150) & (v <= 255))
