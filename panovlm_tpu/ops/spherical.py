"""Equirectangular (spherical panorama) camera model — batched JAX.

Re-derives the reference camera model (sensors/Equirectangular.h:17-207)
as pure vectorized functions. Conventions (X-right, Y-down, Z-front):

  cam -> sphere : lon = atan2(x, z),  lat = -atan2(y, sqrt(x^2+z^2))
  sphere -> px  : u = W*(0.5 + lon/2pi),  v = H*(0.5 - lat/pi)
  sphere -> cam : x = r cos(lat) sin(lon), y = -r sin(lat), z = r cos(lat) cos(lon)

The reference optionally uses a polynomial FastAtan2 (base/Math.h:16-29,
~0.3 deg error); we use the exact atan2 (SURVEY.md step 1 allows this).

Also hosts the LiDAR->panorama depth splat that replaces
util/Visualization.h:408-441 (ProjectLidar2PanoramaDepth): the reference
writes depth*256 as uint16 into a (size+1)^2 pixel footprint with
last-write-wins; we use a deterministic scatter-min z-buffer over the same
footprint, which is order-independent and strictly better-posed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cam_to_sphere(xyz):
    """(...,3) camera-frame points -> (...,2) (lon, lat) radians."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    lon = jnp.arctan2(x, z)
    lat = -jnp.arctan2(y, jnp.sqrt(x * x + z * z))
    return jnp.stack([lon, lat], axis=-1)


def sphere_to_image(lonlat, rows, cols):
    """(...,2) (lon,lat) -> (...,2) pixel (u=x=col, v=y=row), origin top-left."""
    lon, lat = lonlat[..., 0], lonlat[..., 1]
    u = cols * (0.5 + lon / (2.0 * jnp.pi))
    v = rows * (0.5 - lat / jnp.pi)
    return jnp.stack([u, v], axis=-1)


def image_to_sphere(uv, rows, cols):
    u, v = uv[..., 0], uv[..., 1]
    lon = (2.0 * u / cols - 1.0) * jnp.pi
    lat = (0.5 - v / rows) * jnp.pi
    return jnp.stack([lon, lat], axis=-1)


def sphere_to_cam(lonlat, r=1.0):
    lon, lat = lonlat[..., 0], lonlat[..., 1]
    cy = jnp.cos(lat)
    x = r * cy * jnp.sin(lon)
    y = -r * jnp.sin(lat)
    z = r * cy * jnp.cos(lon)
    return jnp.stack([x, y, z], axis=-1)


def cam_to_image(xyz, rows, cols):
    return sphere_to_image(cam_to_sphere(xyz), rows, cols)


def image_to_cam(uv, rows, cols, r=1.0):
    return sphere_to_cam(image_to_sphere(uv, rows, cols), r)


def is_inside(uv, rows, cols, row_margin=0, col_margin=0):
    u, v = uv[..., 0], uv[..., 1]
    return (u >= col_margin) & (v >= row_margin) & (u < cols - col_margin) & (v < rows - row_margin)


@functools.partial(jax.jit, static_argnames=("rows", "cols"))
def pixel_ray_grid(rows: int, cols: int, dtype=jnp.float32):
    """Precomputed pixel-center -> unit ray LUT, shape (rows, cols, 3).

    Replaces Equirectangular::PreComputeI2C (sensors/Equirectangular.cpp:12-18);
    the reference evaluates rays at integer pixel coordinates (j, i).
    """
    v, u = jnp.meshgrid(
        jnp.arange(rows, dtype=dtype), jnp.arange(cols, dtype=dtype), indexing="ij"
    )
    uv = jnp.stack([u, v], axis=-1)
    return image_to_cam(uv, rows, cols, r=jnp.asarray(1.0, dtype))


@functools.partial(jax.jit, static_argnames=("rows", "cols", "size"))
def project_points_to_depth_pano(points_cam, mask, rows: int, cols: int, size: int = 3):
    """Splat 3D points (camera frame) into a sparse depth panorama.

    TPU-native replacement for ProjectLidar2PanoramaDepth
    (util/Visualization.h:408-441). Each valid point writes its range into a
    (size+1)x(size+1) pixel footprint (floor-size/2 .. ceil+size/2, matching
    the reference footprint) via scatter-min; empty pixels are 0.

    Args:
      points_cam: (P,3) points already in the camera frame (apply T_cl first).
      mask: (P,) bool validity.
      rows, cols: panorama size.
      size: footprint parameter (reference default 3 -> 4x4 block).

    Returns:
      (rows, cols) float32 depth (meters), 0 where empty.
    """
    depth = jnp.linalg.norm(points_cam, axis=-1)
    uv = cam_to_image(points_cam, rows, cols)
    lt_x = jnp.floor(uv[..., 0]) - size // 2
    lt_y = jnp.floor(uv[..., 1]) - size // 2
    rb_x = jnp.ceil(uv[..., 0]) + size // 2
    rb_y = jnp.ceil(uv[..., 1]) + size // 2
    # Reference IsInside(rb) uses x+1<=cols (Equirectangular.h:184-187).
    inside = (
        (lt_x >= 0) & (lt_y >= 0) & (rb_x + 1 <= cols) & (rb_y + 1 <= rows)
    )
    valid = mask & inside & (depth > 0)

    big = jnp.asarray(jnp.inf, depth.dtype)
    canvas = jnp.full((rows, cols), big, dtype=depth.dtype)
    x0 = lt_x.astype(jnp.int32)
    y0 = lt_y.astype(jnp.int32)
    # footprint spans (rb - lt + 1) <= size//2*2 + 2 pixels per axis
    span = size // 2 * 2 + 2
    d = jnp.where(valid, depth, big)
    for dy in range(span):
        for dx in range(span):
            xx = jnp.clip(x0 + dx, 0, cols - 1)
            yy = jnp.clip(y0 + dy, 0, rows - 1)
            in_fp = (x0 + dx <= rb_x.astype(jnp.int32)) & (y0 + dy <= rb_y.astype(jnp.int32))
            dd = jnp.where(in_fp, d, big)
            canvas = canvas.at[yy, xx].min(dd, mode="drop")
    return jnp.where(jnp.isinf(canvas), 0.0, canvas)


def bilinear_sample(img, uv, mode_wrap_lon: bool = True):
    """Bilinear sample img (H,W) or (H,W,C) at float pixel coords uv (...,2).

    Longitude (u axis) wraps around the panorama seam when mode_wrap_lon;
    latitude clamps. Returns samples (...,) or (...,C).
    """
    H, W = img.shape[0], img.shape[1]
    u = uv[..., 0] - 0.5  # sample at pixel centers
    v = uv[..., 1] - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    if mode_wrap_lon:
        u0w = jnp.mod(u0i, W)
        u1w = jnp.mod(u0i + 1, W)
    else:
        u0w = jnp.clip(u0i, 0, W - 1)
        u1w = jnp.clip(u0i + 1, 0, W - 1)
    v0c = jnp.clip(v0i, 0, H - 1)
    v1c = jnp.clip(v0i + 1, 0, H - 1)

    def gather(vy, ux):
        return img[vy, ux]

    p00 = gather(v0c, u0w)
    p01 = gather(v0c, u1w)
    p10 = gather(v1c, u0w)
    p11 = gather(v1c, u1w)
    if img.ndim == 3:
        fu = fu[..., None]
        fv = fv[..., None]
    top = p00 * (1 - fu) + p01 * fu
    bot = p10 * (1 - fu) + p11 * fu
    return top * (1 - fv) + bot * fv


def _quad_taps(img):
    """The 2x2 bilinear footprint of every pixel as 4 planes (self,
    right-with-longitude-wrap, down-clamped, down-right): (H,W,4)."""
    right = jnp.roll(img, -1, axis=1)                       # u+1 wraps the seam
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)     # v+1 clamps
    down_right = jnp.concatenate([right[1:], right[-1:]], axis=0)
    return jnp.stack([img, right, down, down_right], axis=-1)


def pack_bilinear_u8(img, scale=None):
    """Pack a grayscale image so ONE int32 gather fetches a full 2x2 bilinear
    footprint (the four u8-quantized taps live in one 32-bit word).

    XLA TPU gathers cost ~the same per *index* regardless of payload, so the
    4-tap bilinear sample of bilinear_sample (4 gathers) collapses to a
    single gather — the decisive optimization for the PatchMatch warp
    (ScorePixel, reference mvs/MVS.cpp:791-842, samples neighbor panoramas
    per pixel x hypothesis x texel). u8 quantization matches the 8-bit
    source images the reference itself samples.

    Returns (packed (H,W) int32, scale float): tap = byte/255 * scale.
    """
    img = img.astype(jnp.float32)
    if scale is None:
        scale = jnp.maximum(jnp.max(img), 1e-6)
    q = jnp.clip(jnp.round(img / scale * 255.0), 0, 255).astype(jnp.uint8)
    taps = _quad_taps(q)                                    # (H,W,4) u8
    packed = jax.lax.bitcast_convert_type(taps, jnp.int32)  # (H,W)
    return packed, scale


def bilinear_sample_packed_u8(packed, scale, uv):
    """Bilinear sample from a pack_bilinear_u8 image at uv (...,2): one
    gather per sample instead of four (longitude wraps, latitude clamps;
    matches bilinear_sample semantics incl. pole clamping)."""
    H, W = packed.shape[0], packed.shape[1]
    u = uv[..., 0] - 0.5
    v = jnp.clip(uv[..., 1] - 0.5, 0.0, float(H - 1))
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0w = jnp.mod(u0.astype(jnp.int32), W)
    v0c = v0.astype(jnp.int32)
    g = jnp.take(packed.reshape(-1), v0c * W + u0w)
    b0 = (g & 0xFF).astype(jnp.float32)
    b1 = ((g >> 8) & 0xFF).astype(jnp.float32)
    b2 = ((g >> 16) & 0xFF).astype(jnp.float32)
    b3 = ((g >> 24) & 0xFF).astype(jnp.float32)
    top = b0 * (1 - fu) + b1 * fu
    bot = b2 * (1 - fu) + b3 * fu
    return (top * (1 - fv) + bot * fv) * (scale / 255.0)


def pack_bilinear_u16(img, scale: float = 256.0):
    """Pack a non-negative float map (e.g. depth, meters) as x256 u16 fixed
    point — the reference's own on-disk depth quantization (util/FileIO.h:
    101-123) — with the 2x2 footprint in TWO int32 words: one (...,2) gather
    per bilinear sample. Returns ((H,W,2) int32, scale)."""
    q = jnp.clip(jnp.round(img.astype(jnp.float32) * scale), 0, 65535) \
        .astype(jnp.uint16)
    taps = _quad_taps(q)                                    # (H,W,4) u16
    packed = jax.lax.bitcast_convert_type(
        taps.reshape(*taps.shape[:-1], 2, 2), jnp.int32)    # (H,W,2)
    return packed, scale


def bilinear_sample_packed_u16(packed, scale, uv):
    """Bilinear sample from a pack_bilinear_u16 map at uv (...,2)."""
    H, W = packed.shape[0], packed.shape[1]
    u = uv[..., 0] - 0.5
    v = jnp.clip(uv[..., 1] - 0.5, 0.0, float(H - 1))
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0w = jnp.mod(u0.astype(jnp.int32), W)
    v0c = v0.astype(jnp.int32)
    g = jnp.take(packed.reshape(-1, 2), v0c * W + u0w, axis=0)  # (...,2)
    h0, h1 = g[..., 0], g[..., 1]
    b0 = (h0 & 0xFFFF).astype(jnp.float32)
    b1 = ((h0 >> 16) & 0xFFFF).astype(jnp.float32)
    b2 = (h1 & 0xFFFF).astype(jnp.float32)
    b3 = ((h1 >> 16) & 0xFFFF).astype(jnp.float32)
    top = b0 * (1 - fu) + b1 * fu
    bot = b2 * (1 - fu) + b3 * fu
    return (top * (1 - fv) + bot * fv) / scale


def break_to_segments_mask(start_uv, end_uv, rows, cols, n: int):
    """Sample n points along the geodesic between two panorama pixels.

    Vectorized analog of Equirectangular::BreakToSegments
    (sensors/Equirectangular.cpp:20-58): interpolate linearly between the two
    3D back-projections (r=5 like the reference) and reproject. Returns
    (n,2) pixel coords and a (n,) bool marking seam discontinuities
    (|du| > 0.8*cols between consecutive samples), which callers should not
    connect across.
    """
    p1 = image_to_cam(start_uv, rows, cols, r=5.0)
    p2 = image_to_cam(end_uv, rows, cols, r=5.0)
    ts = jnp.linspace(0.0, 1.0, n)[:, None]
    pts = p1[None, :] * (1 - ts) + p2[None, :] * ts
    uv = cam_to_image(pts, rows, cols)
    du = jnp.abs(jnp.diff(uv[:, 0]))
    seam = jnp.concatenate([jnp.array([False]), du > 0.8 * cols])
    return uv, seam
