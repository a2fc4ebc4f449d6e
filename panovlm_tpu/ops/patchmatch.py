"""Spherical PatchMatch core — plane hypotheses, NCC warp scoring,
checkerboard propagation. The flagship compute of the joint_mvs stage.

Replaces the per-pixel loops of mvs/MVS.cpp (reference): ScorePixel
(:774-923, homography warp + weighted NCC + best-2 neighbor mean),
InterpolatePixel (:1923-1935, plane-induced depth), PerturbDepthNormal3
(:1254-1317, confidence-tiered perturbation), PropagateCheckerBoard
(:1098-1127), and PropagateSequential (:1057-1096) — the serial TL->BR /
BR->TL walk re-expressed as directional log-shift sweeps (sequential_step);
config propagate_strategy selects between them (mvs/MVS.h:38-42).

Design notes (TPU):
  * hypotheses are per-pixel planes (depth d along the pixel ray + unit
    normal n); a texel's depth on the plane is closed-form
    lambda_t = d (n.r_p) / (n.r_t) — no homography matrix needed on a
    sphere;
  * patch texels come from static pixel offsets -> jnp.roll of the ray/gray
    grids (free, no gather); the only real gather is the bilinear sample of
    each neighbor panorama at the warped coordinates;
  * all candidates (self + 8 checkerboard propagations + perturbations +
    1 random) are scored in one batched pass; masked updates keep LiDAR
    pixels constant when keep_lidar_constant is set (MVS.cpp:496-584).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import spherical


class PatchMatchConfig(NamedTuple):
    ncc_half_window: int = 5         # reference default 11 (full res)
    ncc_step: int = 2
    min_depth: float = 0.1
    max_depth: float = 20.0
    sigma_color: float = 0.2         # bilateral NCC weight
    n_perturb: int = 2
    perturb_frac: float = 0.15
    prop_offsets: tuple = ((0, 1), (0, -1), (1, 0), (-1, 0),
                           (0, 3), (0, -3), (3, 0), (-3, 0))
    prop_pattern: int = 0            # 0 = prop_offsets above (compact);
                                     # 1 = the reference's full 72-point
                                     # checkerboard sampling pattern
                                     # (checkerboard_pattern()), selection
                                     # via candidate pre-ranking
    geom_weight: float = 0.2         # geometric-consistency pass weight
    geom_max_angle_deg: float = 2.0
    smooth_bonus: float = 0.95       # NCC smoothness bonus (MVS.h:82-86);
                                     # 1 disables
    prune_candidates: int = 2        # pre-rank candidates on a sparse texel
                                     # set, full-NCC only the best k
                                     # (0 = score everything, exact reference
                                     # candidate handling)
    prune_texels: int = 5            # texels in the pre-ranking patch (5 =
                                     # center + corners, 9 = + edge midpoints)
    prune_views: int = 2             # neighbor views used for pre-ranking
                                     # (0 = all; the neighbor table is
                                     # nearest-first, so a prefix works)
    sweep_slices: int = 0            # plane-sweep sample volume: >0 = build
                                     # D inverse-depth slices of each
                                     # neighbor once per pass and score all
                                     # candidates by static shifts + a hat-
                                     # weighted sum over D — ZERO gathers in
                                     # the hot loop (0 = exact per-plane
                                     # bilinear sampling)
    prune_slice_stride: int = 4      # pre-ranking reads every k-th slice
                                     # of the sweep volume (ranking only
                                     # needs coarse photoconsistency); 1 =
                                     # full resolution
    use_volscore_kernel: bool = False  # score candidates with the Pallas
                                     # volume kernel (ops/pallas/volscore):
                                     # volume tiles stay in VMEM across
                                     # candidates/texels. TPU only, and
                                     # only outside vmap — the pipeline
                                     # enables it per backend


def _patch_offsets(cfg: PatchMatchConfig):
    hw, st = cfg.ncc_half_window, cfg.ncc_step
    return [(dv, du) for dv in range(-hw, hw + 1, st)
            for du in range(-hw, hw + 1, st)]


def _cheap_offsets(cfg: PatchMatchConfig):
    """Sparse texel subset for candidate pre-ranking: center + the window's
    corners (prune_texels=5) or + edge midpoints (9)."""
    hw = cfg.ncc_half_window
    five = [(0, 0), (-hw, -hw), (-hw, hw), (hw, -hw), (hw, hw)]
    if cfg.prune_texels <= 5:
        return five
    return five + [(-hw, 0), (0, -hw), (0, hw), (hw, 0)]


def checkerboard_pattern():
    """The reference's checkerboard propagation sampling pattern
    (CheckerBoardSampling, MVS.cpp:1319-1352): the 4 direct neighbors,
    four V-shaped regions (distances 2-4), and four long strips (odd
    offsets 3-23). The reference ranks these ~72 sources by confidence and
    scores the best few; here ALL of them enter candidate pre-ranking
    (prune_candidates). Measured on the synthetic scene this converges
    WORSE than the compact default (sparse-texel ranking noise across 72
    candidates displaces good local ones), so prop_pattern=1 is an
    experiment knob, not the default. (dv, du) row/col offsets;
    cv::Point2i is (col=x, row=y) in the reference."""
    offs = [(0, -1), (0, 1), (-1, 0), (1, 0)]
    for i in range(2, 5):
        offs += [(i - 1, -i), (-i + 1, -i),      # left V
                 (i - 1, i), (-i + 1, i),        # right V
                 (-i, i - 1), (-i, -i + 1),      # top V
                 (i, i - 1), (i, -i + 1)]        # bottom V
    for i in range(3, 25, 2):
        offs += [(-i, 0), (i, 0), (0, -i), (0, i)]
    return tuple(offs)


class PackedViews(NamedTuple):
    """Neighbor panoramas packed for one-gather bilinear sampling
    (spherical.pack_bilinear_u8): packed (V,H,W) int32, scales (V,)."""
    packed: jax.Array
    scales: jax.Array


def pack_views(grays_nei):
    """Pack (V,H,W) float neighbor panoramas for fast warping."""
    packed, scales = jax.vmap(spherical.pack_bilinear_u8)(
        jnp.asarray(grays_nei))
    return PackedViews(packed, scales)


def ref_tables(gray_ref, offsets, cfg: PatchMatchConfig):
    """Per-texel tables that depend only on the reference image: rolled ref
    gray i_t and bilateral weight w = exp(-(i_t-i_c)^2 / 2 sigma^2)
    (ScorePixel weights, MVS.cpp:805-820). Computed once per image instead
    of per candidate x view x texel. Returns (i_tab, w_tab), each (T,H,W)."""
    i_tab = jnp.stack([_roll2(gray_ref, dv, du) for dv, du in offsets])
    w_tab = jnp.exp(-((i_tab - gray_ref[None]) ** 2)
                    / (2 * cfg.sigma_color ** 2))
    return i_tab, w_tab


def _sample_view(gray_nei, nei_scale, uv):
    """Dtype dispatch: int32 = packed u8 panorama, float = legacy path."""
    if gray_nei.dtype == jnp.int32:
        return spherical.bilinear_sample_packed_u8(gray_nei, nei_scale, uv)
    return spherical.bilinear_sample(gray_nei, uv)


def _sample_depth(nei_depth, uv):
    """Dtype dispatch: int32 (H,W,2) = packed u16 map, float = legacy."""
    if nei_depth.dtype == jnp.int32:
        return spherical.bilinear_sample_packed_u16(nei_depth, 256.0, uv)
    return spherical.bilinear_sample(nei_depth, uv)


def _roll2(img, dv, du):
    return jnp.roll(jnp.roll(img, -dv, axis=0), -du, axis=1)


def sweep_inv_depths(cfg: PatchMatchConfig):
    """The D inverse-depth slice positions (uniform in 1/d, far to near —
    uniform inverse depth is uniform in warp displacement, the plane-sweep
    discretization that bounds per-slice pixel error)."""
    return jnp.linspace(1.0 / cfg.max_depth, 1.0 / cfg.min_depth,
                        cfg.sweep_slices)


def build_sweep_volume(grays_nei, rays, R_nr_all, t_nr_all,
                       cfg: PatchMatchConfig, nei_depths=None):
    """Plane-sweep sample volume: vol[v, s, y, x] = neighbor v's gray
    sampled where the ray of REF pixel (y,x) at slice depth lambda_s lands.
    All warp gathers for a whole PatchMatch pass happen HERE (V*D image
    gathers); the per-candidate scoring then needs only static rolls of
    this volume plus a 2-tap interpolation over the D axis — gather-free.
    The classic plane-sweep reformulation of ScorePixel's homography warp
    (mvs/MVS.cpp:791-842). Returns (V, D, H, W) bfloat16, or a pair of
    them (gray, neighbor DEPTH sampled at the same warp positions — the
    geometric pass's consistency reads) when nei_depths is given."""
    H, W = rays.shape[:2]
    lam = 1.0 / sweep_inv_depths(cfg)                       # (D,)
    if isinstance(grays_nei, PackedViews):
        views = (grays_nei.packed, grays_nei.scales)
    else:
        views = (jnp.asarray(grays_nei),
                 jnp.ones((grays_nei.shape[0],), jnp.float32))
    with_depth = nei_depths is not None
    if not with_depth:
        nei_depths = jnp.zeros((views[0].shape[0], 1, 1), jnp.float32)

    def one_view(args):
        g, sc, R, t, nd = args
        rr = jnp.einsum("ij,hwj->hwi", R, rays)

        def one_slice(l):
            x_n = l[..., None] * rr + t
            uv = spherical.cam_to_image(x_n, H, W)
            s = _sample_view(g, sc, uv).astype(jnp.bfloat16)
            if with_depth:
                return s, _sample_depth(nd, uv).astype(jnp.bfloat16)
            return s, jnp.zeros((), jnp.bfloat16)

        return jax.lax.map(one_slice, lam)

    out = jax.lax.map(one_view, views + (R_nr_all, t_nr_all, nei_depths))
    return out if with_depth else out[0]


def _vol_interp(vol_t, sigma, D: int):
    """Hat-weighted (linear) interpolation over the slice axis, written as
    an unrolled sum of D masked FMAs instead of a take-along-axis — on TPU
    an axis gather with per-pixel indices lowers to the slow per-element
    path, while D slice reads + FMAs run at VPU/HBM speed. The volume is
    stored bfloat16 (8-bit source images — bf16's 8 mantissa bits are
    lossless there) to halve the read traffic; weights/accumulation f32.
    vol_t (D,H,W); sigma (H,W) in [0, D-1]. Returns (H,W) float32."""
    val = jnp.zeros_like(sigma)
    for d in range(D):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(sigma - d))
        val += w * vol_t[d].astype(jnp.float32)
    return val


def random_normals(key, rays):
    """Random unit normals facing the camera (n . ray < 0)."""
    n = jax.random.normal(key, rays.shape)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    flip = jnp.sum(n * rays, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def ncc_cost(gray_ref, gray_nei, rays, depth, normal, R_nr, t_nr,
             cfg: PatchMatchConfig, offsets=None, nei_scale=None,
             rays_rot=None, tabs=None, vol=None, vol_stride: int = 1):
    """Weighted-NCC matching cost of per-pixel plane hypotheses against ONE
    neighbor view (ScorePixel core, MVS.cpp:774-923).

    gray_ref: (H,W); gray_nei: (H,W) float OR (H,W) int32 packed
    (pack_bilinear_u8, pass nei_scale); rays: (H,W,3) ref pixel rays;
    depth (H,W); normal (H,W,3); (R_nr, t_nr): ref->neighbor. Returns cost
    (H,W) in [0,2] (1 - NCC), 2 where invalid.

    The texel loop is a lax.scan over the (T,2) offset table so the warp/
    sample body appears ONCE in the compiled program (a python unroll makes
    XLA compile times explode at 100+ texels). Optional precomputed values:
    rays_rot = R_nr @ rays (hoists the per-texel einsum), tabs = ref_tables
    output (hoists the per-texel roll + bilateral exp), vol = this view's
    (D,H,W) plane-sweep volume (build_sweep_volume) — texel samples then
    come from slice interpolation instead of bilinear gathers, and the warp
    trig drops out of the loop entirely."""
    rho = depth * jnp.sum(normal * rays, axis=-1)          # (H,W) plane offset
    H, W = gray_ref.shape
    if offsets is None:
        offsets = _patch_offsets(cfg)
    off_arr = jnp.asarray(offsets, jnp.int32)              # (T,2) [dv,du]
    if rays_rot is None and vol is None:
        rays_rot = jnp.einsum("ij,hwj->hwi", R_nr, rays)   # R r, once
    if tabs is None:
        tabs = ref_tables(gray_ref, offsets, cfg)
    i_tab, w_tab = tabs
    if vol is not None:
        D = vol.shape[0]                  # may be a ::vol_stride subset
        inv0 = 1.0 / cfg.max_depth
        inv_step = (1.0 / cfg.min_depth - inv0) \
            / max(cfg.sweep_slices - 1, 1) * vol_stride

    def body(carry, xs):
        sw, sx, sy, sxx, syy, sxy = carry
        off, i_t, w0 = xs
        dv, du = off[0], off[1]
        r_t = jnp.roll(rays, (-dv, -du), axis=(0, 1))      # texel ray
        denom = jnp.sum(normal * r_t, axis=-1)
        lam = rho / jnp.where(jnp.abs(denom) < 1e-6,
                              jnp.sign(denom) * 1e-6 + 1e-12, denom)
        if vol is not None:
            # slice coordinate of the plane-induced texel depth
            sigma = (1.0 / jnp.maximum(lam, 1e-6) - inv0) / inv_step
            sigma = jnp.clip(sigma, 0.0, D - 1)
            # read the volume IN PLACE: roll the (H,W) slice-coordinate map
            # to the texel position, interpolate, roll the result back —
            # two (H,W) rolls instead of one (D,H,W) roll per texel
            sig_t = jnp.roll(sigma, (dv, du), axis=(0, 1))
            s_t = _vol_interp(vol, sig_t, D)
            s = jnp.roll(s_t, (-dv, -du), axis=(0, 1))
        else:
            rr_t = jnp.roll(rays_rot, (-dv, -du), axis=(0, 1))  # R (texel ray)
            x_n = lam[..., None] * rr_t + t_nr             # R(lam r) + t
            uv = spherical.cam_to_image(x_n, H, W)
            s = _sample_view(gray_nei, nei_scale, uv)
        w = w0 * (lam > 0)                                 # behind-camera drop
        return (sw + w, sx + w * i_t, sy + w * s, sxx + w * i_t * i_t,
                syy + w * s * s, sxy + w * i_t * s), None

    zero = jnp.zeros_like(depth)
    (sw, sx, sy, sxx, syy, sxy), _ = jax.lax.scan(
        body, (zero,) * 6, (off_arr, i_tab, w_tab))
    eps = 1e-6
    mx = sx / (sw + eps)
    my = sy / (sw + eps)
    vx = sxx / (sw + eps) - mx * mx
    vy = syy / (sw + eps) - my * my
    cov = sxy / (sw + eps) - mx * my
    ncc = cov / jnp.sqrt(jnp.maximum(vx * vy, eps * eps))
    ncc = jnp.clip(ncc, -1.0, 1.0)
    valid = (sw > 1e-3) & (depth > cfg.min_depth) & (depth < cfg.max_depth)
    return jnp.where(valid, 1.0 - ncc, 2.0)


def geometric_cost(rays, depth, nei_depth, R_nr, t_nr, cfg: PatchMatchConfig,
                   dvol=None, vol_stride: int = 1):
    """Geometric-consistency penalty (MVS.cpp:126-153, 858-896): project the
    hypothesis point into the neighbor, read the neighbor's depth (float map
    or pack_bilinear_u16 packed; or interpolated from this view's (D,H,W)
    depth sweep volume `dvol` — gather-free), backcast and measure the
    angular reprojection error in the reference view."""
    H, W = depth.shape
    X = depth[..., None] * rays
    x_n = jnp.einsum("ij,hwj->hwi", R_nr, X) + t_nr
    if dvol is not None:
        D = dvol.shape[0]                 # may be a ::vol_stride subset
        inv0 = 1.0 / cfg.max_depth
        inv_step = (1.0 / cfg.min_depth - inv0) \
            / max(cfg.sweep_slices - 1, 1) * vol_stride
        sigma = (1.0 / jnp.maximum(depth, 1e-6) - inv0) / inv_step
        d_n = _vol_interp(dvol, jnp.clip(sigma, 0.0, D - 1), D)
    else:
        uv = spherical.cam_to_image(x_n, H, W)
        d_n = _sample_depth(nei_depth, uv)
    r_n = x_n / (jnp.linalg.norm(x_n, axis=-1, keepdims=True) + 1e-12)
    X_n = d_n[..., None] * r_n
    # back to ref frame
    X_back = jnp.einsum("ji,hwj->hwi", R_nr, X_n - t_nr)
    r_back = X_back / (jnp.linalg.norm(X_back, axis=-1, keepdims=True) + 1e-12)
    cosv = jnp.clip(jnp.sum(r_back * rays, axis=-1), -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cosv))
    pen = jnp.minimum(ang / cfg.geom_max_angle_deg, 1.0)
    return jnp.where(d_n > cfg.min_depth, pen, 1.0)


def multiview_cost(gray_ref, grays_nei, rays, depth, normal, R_nr_all,
                   t_nr_all, cfg: PatchMatchConfig, nei_depths=None,
                   offsets=None, rays_rot_all=None, tabs=None, vols=None,
                   dvols=None, vol_stride: int = 1):
    """Cost over all neighbors: mean of the best-2 per-pixel neighbor costs
    (MVS.cpp:905-918). grays_nei: (V,H,W) float array OR PackedViews;
    R_nr_all (V,3,3); t_nr_all (V,3); vols None or (V,D,H,W) plane-sweep
    volumes (build_sweep_volume) — gather-free NCC scoring; dvols None or
    (V,D,H,W) neighbor-depth volumes — gather-free geometric term."""
    if isinstance(grays_nei, PackedViews):
        views = (grays_nei.packed, grays_nei.scales)
    else:
        views = (jnp.asarray(grays_nei),
                 jnp.ones((grays_nei.shape[0],), jnp.float32))
    V = views[0].shape[0]
    if tabs is None:
        tabs = ref_tables(gray_ref,
                          _patch_offsets(cfg) if offsets is None else offsets,
                          cfg)
    if vols is None:
        rr_all = _rot_rays(R_nr_all, rays, rays_rot_all)

    if nei_depths is not None:
        if vols is not None and dvols is not None:
            def per_view(args):
                vol_v, dvol_v, R, t = args
                c = ncc_cost(gray_ref, None, rays, depth, normal, R, t, cfg,
                             offsets, tabs=tabs, vol=vol_v,
                             vol_stride=vol_stride)
                return c + cfg.geom_weight * geometric_cost(
                    rays, depth, None, R, t, cfg, dvol=dvol_v,
                    vol_stride=vol_stride)
            costs = jax.lax.map(per_view, (vols, dvols, R_nr_all, t_nr_all))
        elif vols is not None:
            def per_view(args):
                vol_v, R, t, d_n = args
                c = ncc_cost(gray_ref, None, rays, depth, normal, R, t, cfg,
                             offsets, tabs=tabs, vol=vol_v,
                             vol_stride=vol_stride)
                return c + cfg.geom_weight * geometric_cost(
                    rays, depth, d_n, R, t, cfg)
            costs = jax.lax.map(per_view,
                                (vols, R_nr_all, t_nr_all, nei_depths))
        else:
            def per_view(args):
                g_n, sc, R, t, rr, d_n = args
                c = ncc_cost(gray_ref, g_n, rays, depth, normal, R, t, cfg,
                             offsets, sc, rr, tabs)
                return c + cfg.geom_weight * geometric_cost(
                    rays, depth, d_n, R, t, cfg)
            xs = views + (R_nr_all, t_nr_all, rr_all, nei_depths)
            costs = jax.lax.map(per_view, xs)
    else:
        if vols is not None:
            def per_view(args):
                vol_v, R, t = args
                return ncc_cost(gray_ref, None, rays, depth, normal, R, t,
                                cfg, offsets, tabs=tabs, vol=vol_v,
                                vol_stride=vol_stride)
            costs = jax.lax.map(per_view, (vols, R_nr_all, t_nr_all))
        else:
            def per_view(args):
                g_n, sc, R, t, rr = args
                return ncc_cost(gray_ref, g_n, rays, depth, normal, R, t,
                                cfg, offsets, sc, rr, tabs)
            xs = views + (R_nr_all, t_nr_all, rr_all)
            costs = jax.lax.map(per_view, xs)
    k = min(2, V)
    best = -jax.lax.top_k(-jnp.moveaxis(costs, 0, -1), k)[0]
    return jnp.mean(best, axis=-1)


def _rot_rays(R_nr_all, rays, rays_rot_all=None):
    """(V,H,W,3) rotated ray grids, computed once per view set."""
    if rays_rot_all is not None:
        return rays_rot_all
    return jnp.einsum("vij,hwj->vhwi", R_nr_all, rays)


def plane_induced(rays, depth, normal, dv, du):
    """Propagate a neighbor pixel's plane: its (d,n) induces a depth at the
    current pixel (InterpolatePixel, MVS.cpp:1923-1935)."""
    d_q = _roll2(depth, dv, du)
    n_q = _roll2(normal, dv, du)
    r_q = _roll2(rays, dv, du)
    rho = d_q * jnp.sum(n_q * r_q, axis=-1)
    denom = jnp.sum(n_q * rays, axis=-1)
    d_p = rho / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    return d_p, n_q


def smoothness_factor(rays, depth, normal, cand_d, cand_n,
                      cfg: PatchMatchConfig):
    """Multiplicative NCC-cost bonus when the candidate plane agrees with
    the CURRENT 4-neighbor depths/normals (ScorePixel close_neighbors,
    MVS.cpp:844-856; constants MVS.h:82-86). Returns (H, W) factor <= 1."""
    if cfg.smooth_bonus >= 1.0:
        return jnp.ones_like(depth)
    bonus_d = 1.0 - cfg.smooth_bonus
    bonus_n = (1.0 - cfg.smooth_bonus) * 0.96
    sigma_d = -1.0 / (2.0 * 0.02 ** 2)
    sigma_n = -1.0 / (2.0 * 0.22 ** 2)
    # candidate plane through X0 = d * ray with normal cand_n
    rho = cand_d * jnp.sum(cand_n * rays, axis=-1)          # n . X0
    factor = jnp.ones_like(depth)
    safe_d = jnp.maximum(cand_d, 1e-6)
    for dv, du in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        d_q = _roll2(depth, dv, du)
        n_q = _roll2(normal, dv, du)
        r_q = _roll2(rays, dv, du)
        valid = d_q > 0
        X_q = d_q[..., None] * r_q
        dd = jnp.abs(jnp.sum(cand_n * X_q, axis=-1) - rho) / safe_d
        f_d = jnp.exp(dd * dd * sigma_d)
        cosn = jnp.clip(jnp.sum(cand_n * n_q, axis=-1), -1.0, 1.0)
        da = jnp.arccos(cosn)
        f_n = jnp.exp(da * da * sigma_n)
        f = (1.0 - bonus_d * f_d) * (1.0 - bonus_n * f_n)
        factor = factor * jnp.where(valid, f, 1.0)
    return factor


def _score_stack_kernel(cd, cn, rays, offsets, tabs, vols_sub, dvols_sub,
                        stride: int, R_nr, t_nr, cfg: PatchMatchConfig):
    """Score a (C,H,W) candidate stack against a view subset with the
    Pallas volume kernel (NCC) + XLA geometric term, reduced to the best-2
    per-pixel view mean (the multiview_cost tail). Returns (C,H,W)."""
    from .pallas import volscore
    rho = cd * jnp.sum(cn * rays[None], axis=-1)
    nrm = jnp.moveaxis(cn, -1, 1)
    rays_cf = jnp.moveaxis(rays, -1, 0)
    inv0 = 1.0 / cfg.max_depth
    inv_step = (1.0 / cfg.min_depth - inv0) \
        / max(cfg.sweep_slices - 1, 1) * stride
    costs = volscore.score_candidates(
        vols_sub, rho, nrm, rays_cf, tabs[0], tabs[1], tuple(offsets),
        inv0, inv_step, cfg.min_depth, cfg.max_depth)       # (V,C,H,W)
    if dvols_sub is not None:
        def per_view(args):
            dvol_v, R, t = args
            return jax.vmap(lambda d_c: geometric_cost(
                rays, d_c, None, R, t, cfg, dvol=dvol_v,
                vol_stride=stride))(cd)
        geom = jax.lax.map(per_view, (dvols_sub, R_nr, t_nr))
        costs = costs + cfg.geom_weight * geom
    k = min(2, costs.shape[0])
    best = -jax.lax.top_k(-jnp.moveaxis(costs, 0, -1), k)[0]
    return jnp.mean(best, axis=-1)


def _pm_step(gray_ref, grays_nei, rays, depth, normal, cost,
             R_nr_all, t_nr_all, key, fixed_depth, cfg: PatchMatchConfig,
             prop_offsets, active, nei_depths=None, vols=None, dvols=None):
    """Shared PatchMatch update: active pixels test propagated + perturbed +
    random candidates and keep the argmin-cost plane (ProcessPixel,
    MVS.cpp:719-772)."""
    cands_d = [depth]
    cands_n = [normal]
    for dv, du in prop_offsets:
        d_p, n_p = plane_induced(rays, depth, normal, dv, du)
        cands_d.append(d_p)
        cands_n.append(n_p)
    # conf-tiered perturbations around the current plane
    # (PerturbDepthNormal3, MVS.cpp:1254-1317 + scaleRanges MVS.h:70):
    # confident pixels polish with a small scale, uncertain ones search
    # wider; the scale map is per-pixel from the CURRENT cost
    keys = jax.random.split(key, cfg.n_perturb + 2)
    tier = jnp.where(cost <= 0.11, 0.25, jnp.where(cost <= 0.22, 0.5, 1.0))
    for i in range(cfg.n_perturb):
        sc = tier * (0.5 ** i)
        scale = 1.0 + cfg.perturb_frac * sc * (
            jax.random.uniform(keys[i], depth.shape) * 2 - 1)
        d_pert = jnp.clip(depth * scale, cfg.min_depth, cfg.max_depth)
        dn = jax.random.normal(jax.random.fold_in(keys[i], 7), normal.shape) \
            * 0.5 * sc[..., None]                  # ~30 deg * scale
        n_pert = normal + dn
        n_pert = n_pert / (jnp.linalg.norm(n_pert, axis=-1, keepdims=True) + 1e-12)
        flip = jnp.sum(n_pert * rays, axis=-1, keepdims=True) > 0
        n_pert = jnp.where(flip, -n_pert, n_pert)
        cands_d.append(d_pert)
        cands_n.append(n_pert)
    # random restart where the current estimate is bad (thConfRand tier);
    # elsewhere the candidate degenerates to the incumbent (no-op)
    bad = cost >= 0.495
    d_rand = jnp.exp(jax.random.uniform(
        keys[-1], depth.shape,
        minval=jnp.log(cfg.min_depth), maxval=jnp.log(cfg.max_depth)))
    cands_d.append(jnp.where(bad, d_rand, depth))
    cands_n.append(jnp.where(bad[..., None],
                             random_normals(keys[-2], rays), normal))

    # score all candidates with ONE program copy (lax.map over the C axis)
    cd = jnp.stack(cands_d)
    cn = jnp.stack(cands_n)

    # hoist everything candidate-independent out of the per-candidate map
    full_off = _patch_offsets(cfg)
    tabs_full = ref_tables(gray_ref, full_off, cfg)
    rr_all = None if vols is not None else _rot_rays(R_nr_all, rays)

    if cfg.prune_candidates and cd.shape[0] > cfg.prune_candidates:
        # pre-rank every candidate on the sparse texel set, then full-NCC
        # only the per-pixel best k (candidate pruning; the exact path
        # scores everything like the reference's ProcessPixel)
        cheap_off = _cheap_offsets(cfg)
        tabs_cheap = ref_tables(gray_ref, cheap_off, cfg)
        # rank against a prefix of the (nearest-first) neighbor views only
        V = R_nr_all.shape[0]
        vk = V if not cfg.prune_views else min(cfg.prune_views, V)
        # ranking only needs coarse photoconsistency: read every k-th slice
        ps = max(cfg.prune_slice_stride, 1)
        vols_c = None if vols is None else vols[:vk, ::ps]
        dvols_c = None if dvols is None else dvols[:vk, ::ps]

        use_k = cfg.use_volscore_kernel and vols is not None
        if use_k:
            ncc_c = _score_stack_kernel(cd, cn, rays, cheap_off, tabs_cheap,
                                        vols_c, dvols_c, ps,
                                        R_nr_all[:vk], t_nr_all[:vk], cfg)
            smooth = jax.vmap(lambda d_c, n_c: smoothness_factor(
                rays, depth, normal, d_c, n_c, cfg))(cd, cn)
            cheap = ncc_c * smooth
        else:
            if isinstance(grays_nei, PackedViews):
                views_c = PackedViews(grays_nei.packed[:vk],
                                      grays_nei.scales[:vk])
            else:
                views_c = grays_nei[:vk]
            neid_c = None if nei_depths is None else nei_depths[:vk]

            def cheap_score(args):
                d_c, n_c = args
                c = multiview_cost(gray_ref, views_c, rays, d_c, n_c,
                                   R_nr_all[:vk], t_nr_all[:vk], cfg, neid_c,
                                   offsets=cheap_off,
                                   rays_rot_all=None if rr_all is None
                                   else rr_all[:vk],
                                   tabs=tabs_cheap, vols=vols_c,
                                   dvols=dvols_c, vol_stride=ps)
                return c * smoothness_factor(rays, depth, normal, d_c, n_c,
                                             cfg)

            cheap = jax.lax.map(cheap_score, (cd, cn))     # (C,H,W)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, cheap.shape, 0)
        sel_d, sel_n = [], []
        for _ in range(cfg.prune_candidates):
            idx = jnp.argmin(cheap, axis=0)                # (H,W)
            sel_d.append(jnp.take_along_axis(cd, idx[None], axis=0)[0])
            sel_n.append(jnp.take_along_axis(
                cn, idx[None, ..., None], axis=0)[0])
            cheap = jnp.where(c_iota == idx[None], jnp.inf, cheap)
        cd = jnp.stack(sel_d)
        cn = jnp.stack(sel_n)

    if cfg.use_volscore_kernel and vols is not None:
        ncc_f = _score_stack_kernel(cd, cn, rays, full_off, tabs_full,
                                    vols, dvols, 1, R_nr_all, t_nr_all, cfg)
        smooth = jax.vmap(lambda d_c, n_c: smoothness_factor(
            rays, depth, normal, d_c, n_c, cfg))(cd, cn)
        costs = ncc_f * smooth
    else:
        def score(args):
            d_c, n_c = args
            c = multiview_cost(gray_ref, grays_nei, rays, d_c, n_c,
                               R_nr_all, t_nr_all, cfg, nei_depths,
                               rays_rot_all=rr_all, tabs=tabs_full,
                               vols=vols, dvols=dvols)
            return c * smoothness_factor(rays, depth, normal, d_c, n_c, cfg)

        costs = jax.lax.map(score, (cd, cn))               # (C or k,H,W)
    best_idx = jnp.argmin(costs, axis=0)
    c_min = jnp.min(costs, axis=0)
    d_best = jnp.take_along_axis(cd, best_idx[None], axis=0)[0]
    n_best = jnp.take_along_axis(cn, best_idx[None, ..., None], axis=0)[0]
    better = (c_min < cost) & active
    best_d = jnp.where(better, d_best, depth)
    best_n = jnp.where(better[..., None], n_best, normal)
    best_c = jnp.where(better, c_min, cost)
    # keep_lidar_constant: depth pinned, plane/normal/cost still update
    best_d = jnp.where(fixed_depth, depth, best_d)
    return best_d, best_n, best_c


@functools.partial(jax.jit, static_argnames=("cfg", "parity"))
def checkerboard_step(gray_ref, grays_nei, rays, depth, normal, cost,
                      R_nr_all, t_nr_all, key, fixed_depth, cfg: PatchMatchConfig,
                      parity: int, nei_depths=None, vols=None, dvols=None):
    """One red/black half-iteration (PropagateCheckerBoard, MVS.cpp:723-767)."""
    H, W = depth.shape
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    active = ((yy + xx) % 2) == parity
    offs = checkerboard_pattern() if cfg.prop_pattern == 1 \
        else cfg.prop_offsets
    return _pm_step(gray_ref, grays_nei, rays, depth, normal, cost,
                    R_nr_all, t_nr_all, key, fixed_depth, cfg,
                    offs, active, nei_depths, vols, dvols)


@functools.partial(jax.jit, static_argnames=("cfg", "direction", "max_shift"))
def sequential_step(gray_ref, grays_nei, rays, depth, normal, cost,
                    R_nr_all, t_nr_all, key, fixed_depth,
                    cfg: PatchMatchConfig, direction: int,
                    nei_depths=None, max_shift: int = 32, vols=None,
                    dvols=None):
    """Directional sweep (PropagateSequential, MVS.cpp:682-720) redesigned
    for TPU. The reference walks pixels TL->BR (even iters, candidates from
    left/up) or BR->TL (odd, right/down), letting one good plane sweep the
    whole image in a single serial pass. A serial pixel loop cannot batch,
    so this uses log-shift relaxation: candidates come from offsets
    1, 2, 4, ..., max_shift along the sweep direction, every hop re-scored
    and only kept when it lowers the pixel's cost — the same monotone
    improvement, whole-image reach in O(log W) batched evaluations.

    direction: 0 = TL->BR (left/up sources), 1 = BR->TL (right/down)."""
    active = jnp.ones(depth.shape, bool)
    return _pm_step(gray_ref, grays_nei, rays, depth, normal, cost,
                    R_nr_all, t_nr_all, key, fixed_depth, cfg,
                    _sequential_offsets(direction, max_shift), active,
                    nei_depths, vols, dvols)


def _sequential_offsets(direction: int, max_shift: int = 32):
    """Log-shift sweep sources. _roll2 semantics: offset (dv,du) sources
    the plane from (v+dv, u+du), so TL->BR (left/up sources) needs
    negative offsets."""
    sign = -1 if direction == 0 else 1
    offsets = []
    k = 1
    while k <= max_shift:
        offsets.append((0, sign * k))   # along-row
        offsets.append((sign * k, 0))   # along-column
        k *= 2
    return tuple(offsets)


def run_patchmatch(gray_ref, grays_nei, rays, depth0, normal0, fixed, R_nr,
                   t_nr, key, cfg: PatchMatchConfig, n_iterations: int,
                   propagate: int = 1, nei_depths=None):
    """Full per-image PatchMatch as ONE traced program: initial scoring +
    2*n_iterations half-steps in a lax.fori_loop (parity / sweep direction
    from the loop index). vmap-able over an image batch — the basis of the
    multi-chip MVS path (images are embarrassingly parallel, SURVEY §2.8).
    Returns (depth, normal, conf)."""
    H, W = depth0.shape
    # plane-sweep mode: pay all warp gathers once, before the loop
    vols = dvols = None
    if cfg.sweep_slices:
        vols = build_sweep_volume(grays_nei, rays, R_nr, t_nr, cfg,
                                  nei_depths)
        if nei_depths is not None:
            vols, dvols = vols
    cost0 = multiview_cost(gray_ref, grays_nei, rays, depth0, normal0,
                           R_nr, t_nr, cfg, nei_depths, vols=vols,
                           dvols=dvols)
    cost0 = cost0 * smoothness_factor(rays, depth0, normal0, depth0, normal0,
                                      cfg)
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    cb = (yy + xx) % 2
    all_on = jnp.ones((H, W), bool)

    def half_step(i, carry):
        depth, normal, cost = carry
        sub = jax.random.fold_in(key, i)
        if propagate == 2:
            # one sweep per loop index, direction alternating
            return jax.lax.cond(
                i % 2 == 0,
                lambda c: _pm_step(gray_ref, grays_nei, rays, *c, R_nr, t_nr,
                                   sub, fixed, cfg, _sequential_offsets(0),
                                   all_on, nei_depths, vols, dvols),
                lambda c: _pm_step(gray_ref, grays_nei, rays, *c, R_nr, t_nr,
                                   sub, fixed, cfg, _sequential_offsets(1),
                                   all_on, nei_depths, vols, dvols),
                (depth, normal, cost))
        active = cb == (i % 2)
        offs = checkerboard_pattern() if cfg.prop_pattern == 1 \
            else cfg.prop_offsets
        return _pm_step(gray_ref, grays_nei, rays, depth, normal, cost,
                        R_nr, t_nr, sub, fixed, cfg, offs,
                        active, nei_depths, vols, dvols)

    depth, normal, cost = jax.lax.fori_loop(
        0, 2 * n_iterations, half_step, (depth0, normal0, cost0))
    conf = jnp.clip(1.0 - cost, -1.0, 1.0)
    return depth, normal, conf


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_iterations", "propagate"))
def run_patchmatch_batched(grays_ref, nei_views, rays, depth0, normal0,
                           fixed, R_nr, t_nr, keys,
                           cfg: PatchMatchConfig, n_iterations: int,
                           propagate: int = 1, nei_depths=None):
    """vmap of run_patchmatch over a leading image-batch axis. All array
    args carry a leading B axis except rays (shared). Shard the B axis over
    a data mesh (parallel.shard_leading_axis) to scale MVS across chips —
    there is no cross-image communication, so XLA SPMD partitions it 1:1.

    grays_ref (B,H,W); nei_views: PackedViews with (B,V,H,W)/(B,V) leaves
    or float (B,V,H,W); nei_depths None or (B,V,H,W[,2])."""
    def one(g, nv, ns, d0, n0, fx, R, t, k, nd):
        views = PackedViews(nv, ns) if ns is not None else nv
        return run_patchmatch(g, views, rays, d0, n0, fx, R, t, k, cfg,
                              n_iterations, propagate, nd)

    if isinstance(nei_views, PackedViews):
        nv, ns = nei_views.packed, nei_views.scales
        ax_ns = 0
    else:
        nv, ns = nei_views, None
        ax_ns = None
    if grays_ref.shape[0] == 1:
        # B=1: skip vmap so pallas_call-based scoring (use_volscore_kernel)
        # stays legal; same one-program structure
        out = one(grays_ref[0], nv[0], None if ns is None else ns[0],
                  depth0[0], normal0[0], fixed[0], R_nr[0], t_nr[0],
                  keys[0], None if nei_depths is None else nei_depths[0])
        return jax.tree_util.tree_map(lambda x: x[None], out)
    ax_nd = None if nei_depths is None else 0
    return jax.vmap(one, in_axes=(0, 0, ax_ns, 0, 0, 0, 0, 0, 0, ax_nd))(
        grays_ref, nv, ns, depth0, normal0, fixed, R_nr, t_nr, keys,
        nei_depths)
