"""Pallas TPU kernel: plane-sweep volume NCC scoring.

The flagship MVS kernel (SURVEY.md §7 "Pallas kernel #2"). Scores C
candidate planes per pixel against V plane-sweep volumes
(ops/patchmatch.build_sweep_volume) — the hot loop of ScorePixel
(reference mvs/MVS.cpp:774-923) after the plane-sweep reformulation.

Why a kernel: the XLA path re-reads the (D,H,W) volume from HBM for every
(candidate x texel) slice sum (~10 GB/step at Room scale, ~60 GB/s
effective). Here each (view, row-tile) volume block is DMA'd to VMEM ONCE
and reused across all candidates and texels; per-texel work is VPU-only:
lane rolls of (h,W) maps + an unrolled hat-weighted sum over the D axis
read from VMEM.

Layout contract (prepared by the `score_candidates` wrapper):
  * W axis wrap-padded: [x[:, W-PAD:] | x | x[:, :PAD...]] to a multiple
    of 128 lanes. All in-kernel column shifts (|du| <= PAD/2) then read
    exactly 720-periodic (panorama longitude wrap) content — lane rolls
    over the padded width never wrap the physical boundary for reachable
    columns.
  * vol / rays H-padded with +-hv wrap rows (matches the jnp.roll
    vertical convention of the XLA path), so the per-tile row DMA
    [hi*h, hi*h + h + 2hv) is always in range.
  * grid (V, H/h, C), C fastest; the volume/ray DMAs fire only at c == 0
    and the scratch persists across the C sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 24          # W wrap-pad on each side; supports texel |du| <= 12


def _kernel(vol_hbm, rays_hbm, rho_ref, nrm_ref, itab_ref, wtab_ref,
            out_ref, vol_s, rays_s, sem_v, sem_r, *, offsets, D, hv, h, Wp,
            inv0, inv_step, dmin, dmax):
    vi = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _():
        cp = pltpu.make_async_copy(
            vol_hbm.at[vi, :, pl.ds(hi * h, h + 2 * hv), :], vol_s, sem_v)
        cp.start()
        cr = pltpu.make_async_copy(
            rays_hbm.at[:, pl.ds(hi * h, h + 2 * hv), :], rays_s, sem_r)
        cr.start()
        cp.wait()
        cr.wait()

    rho = rho_ref[0]                                   # (h, Wp)
    f32 = jnp.float32
    zero = jnp.zeros((h, Wp), f32)
    sw, sx, sy, sxx, syy, sxy = zero, zero, zero, zero, zero, zero

    for t, (dv, du) in enumerate(offsets):
        sh_f = du % Wp                                 # sigma(p_c - du)
        sh_b = (-du) % Wp                              # read back at p + du
        rho_sh = pltpu.roll(rho, sh_f, 1)
        n_sh0 = pltpu.roll(nrm_ref[0, 0], sh_f, 1)
        n_sh1 = pltpu.roll(nrm_ref[0, 1], sh_f, 1)
        n_sh2 = pltpu.roll(nrm_ref[0, 2], sh_f, 1)
        # texel ray = ray at the vol block's own (row+dv, col) — static row
        # slice into the halo, no column shift (B is in vol coordinates)
        denom = (n_sh0 * rays_s[0, hv + dv:hv + dv + h, :]
                 + n_sh1 * rays_s[1, hv + dv:hv + dv + h, :]
                 + n_sh2 * rays_s[2, hv + dv:hv + dv + h, :])
        denom = jnp.where(jnp.abs(denom) < 1e-6,
                          jnp.sign(denom) * 1e-6 + 1e-12, denom)
        lam = rho_sh / denom
        sigma = (1.0 / jnp.maximum(lam, 1e-6) - inv0) / inv_step
        sigma = jnp.clip(sigma, 0.0, D - 1)

        def d_body(d, acc):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(sigma - d.astype(f32)))
            sl = vol_s[d, hv + dv:hv + dv + h, :].astype(f32)
            return acc + w * sl

        B = jax.lax.fori_loop(0, D, d_body, zero)
        s = pltpu.roll(B, sh_b, 1)
        ok = pltpu.roll((lam > 0).astype(f32), sh_b, 1)
        i_t = itab_ref[t]
        w = wtab_ref[t] * ok
        sw += w
        sx += w * i_t
        sy += w * s
        sxx += w * i_t * i_t
        syy += w * s * s
        sxy += w * i_t * s

    eps = 1e-6
    mx = sx / (sw + eps)
    my = sy / (sw + eps)
    vx = sxx / (sw + eps) - mx * mx
    vy = syy / (sw + eps) - my * my
    cov = sxy / (sw + eps) - mx * my
    ncc = jnp.clip(cov / jnp.sqrt(jnp.maximum(vx * vy, eps * eps)),
                   -1.0, 1.0)
    # candidate center depth for the validity gate
    den0 = (nrm_ref[0, 0] * rays_s[0, hv:hv + h, :]
            + nrm_ref[0, 1] * rays_s[1, hv:hv + h, :]
            + nrm_ref[0, 2] * rays_s[2, hv:hv + h, :])
    den0 = jnp.where(jnp.abs(den0) < 1e-6,
                     jnp.sign(den0) * 1e-6 + 1e-12, den0)
    depth_c = rho / den0
    valid = (sw > 1e-3) & (depth_c > dmin) & (depth_c < dmax)
    out_ref[0, 0] = jnp.where(valid, 1.0 - ncc, 2.0)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pad_w(x, W):
    """Wrap-pad the last axis: [x[..., W-PAD:], x, x[..., :R]] to a lane
    multiple. Returns (padded, left_offset)."""
    Wp = _round_up(W + 2 * PAD, 128)
    right = Wp - W - PAD
    reps = -(-right // W)                      # right pad may exceed W once
    tail = jnp.concatenate([x] * reps, axis=-1)[..., :right] if reps > 1 \
        else x[..., :right]
    return jnp.concatenate([x[..., W - PAD:], x, tail], axis=-1), PAD


def _pad_h(x, hv, axis):
    """Wrap-pad +-hv rows along `axis` (jnp.roll vertical convention)."""
    idx_lo = [slice(None)] * x.ndim
    idx_hi = [slice(None)] * x.ndim
    idx_lo[axis] = slice(x.shape[axis] - hv, None)
    idx_hi[axis] = slice(0, hv)
    return jnp.concatenate([x[tuple(idx_lo)], x, x[tuple(idx_hi)]],
                           axis=axis)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "inv0", "inv_step", "dmin", "dmax",
                     "h_tile", "interpret"))
def score_candidates(vols, rho_all, nrm_all, rays, i_tab, w_tab,
                     offsets: tuple, inv0: float, inv_step: float,
                     dmin: float, dmax: float, h_tile: int = 16,
                     interpret: bool = False):
    """NCC cost of C candidate planes against V sweep volumes.

    vols (V,D,H,W) bf16; rho_all (C,H,W) f32 (plane offsets d*(n.r));
    nrm_all (C,3,H,W) f32; rays (3,H,W) f32; i_tab/w_tab (T,H,W) f32
    (ref_tables, pre-rolled at p); offsets: the T (dv,du) texel offsets.
    Returns (V,C,H,W) f32 costs (1-NCC, 2 invalid)."""
    V, D, H, W = vols.shape
    C = rho_all.shape[0]
    T = len(offsets)
    # halo rounded to the 8-sublane tiling (DMA slice sizes must align)
    hv = _round_up(max(abs(dv) for dv, _ in offsets), 8)
    assert max(abs(du) for _, du in offsets) * 2 <= PAD
    h = h_tile
    while H % h:
        h //= 2
    Wp_est = _round_up(W + 2 * PAD, 128)

    def vmem_bytes(h_):
        # volume + ray scratch, and the pipelined blocks double-buffered
        scratch = (D * (h_ + 2 * hv) * Wp_est * 2
                   + 3 * (h_ + 2 * hv) * Wp_est * 4)
        blocks = (1 + 3 + 2 * T + 1) * h_ * Wp_est * 4 * 2
        return scratch + blocks

    # stay under the ~16 MB scoped-vmem limit with margin (wide panoramas:
    # Room scale -2 is W=1440 -> h drops 16 -> 8)
    while h > 8 and vmem_bytes(h) > 13 * 2 ** 20:
        h //= 2
    vol_p, _ = _pad_w(vols, W)
    vol_p = _pad_h(vol_p, hv, 2)                       # (V,D,H+2hv,Wp)
    rays_p, L = _pad_w(rays, W)
    rays_p = _pad_h(rays_p, hv, 1)                     # (3,H+2hv,Wp)
    rho_p, _ = _pad_w(rho_all, W)
    nrm_p, _ = _pad_w(nrm_all, W)
    itab_p, _ = _pad_w(i_tab, W)
    wtab_p, _ = _pad_w(w_tab, W)
    Wp = vol_p.shape[-1]

    kern = functools.partial(
        _kernel, offsets=tuple(offsets), D=D, hv=hv, h=h, Wp=Wp,
        inv0=inv0, inv_step=inv_step, dmin=dmin, dmax=dmax)
    out = pl.pallas_call(
        kern,
        grid=(V, H // h, C),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # vol (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),         # rays (manual DMA)
            pl.BlockSpec((1, h, Wp), lambda v, i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),     # rho
            pl.BlockSpec((1, 3, h, Wp), lambda v, i, c: (c, 0, i, 0),
                         memory_space=pltpu.VMEM),     # normals
            pl.BlockSpec((T, h, Wp), lambda v, i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),     # i_tab
            pl.BlockSpec((T, h, Wp), lambda v, i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),     # w_tab
        ],
        out_specs=pl.BlockSpec((1, 1, h, Wp), lambda v, i, c: (v, c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, C, H, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, h + 2 * hv, Wp), jnp.bfloat16),
            pltpu.VMEM((3, h + 2 * hv, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(vol_p, rays_p, rho_p, nrm_p, itab_p, wtab_p)
    return out[..., L:L + W]
