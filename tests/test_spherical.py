import jax.numpy as jnp
import numpy as np
import pytest

from panovlm_tpu.ops import spherical as sph

ROWS, COLS = 256, 512


def test_cam_sphere_roundtrip(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    pts = pts[np.linalg.norm(pts, axis=1) > 0.1]
    lonlat = sph.cam_to_sphere(jnp.asarray(pts))
    back = sph.sphere_to_cam(lonlat, r=jnp.linalg.norm(jnp.asarray(pts), axis=-1))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_known_directions():
    # +Z (front) -> lon 0, lat 0 -> image center
    uv = sph.cam_to_image(jnp.array([0.0, 0.0, 1.0]), ROWS, COLS)
    np.testing.assert_allclose(np.asarray(uv), [COLS / 2, ROWS / 2], atol=1e-4)
    # +X (right) -> lon pi/2 -> u = 3/4 W
    uv = sph.cam_to_image(jnp.array([1.0, 0.0, 0.0]), ROWS, COLS)
    np.testing.assert_allclose(np.asarray(uv), [0.75 * COLS, ROWS / 2], atol=1e-4)
    # -Y (up in camera convention, Y-down) -> lat pi/2 -> v = 0
    uv = sph.cam_to_image(jnp.array([0.0, -1.0, 0.0]), ROWS, COLS)
    np.testing.assert_allclose(float(uv[1]), 0.0, atol=1e-4)


def test_image_cam_roundtrip():
    rays = sph.pixel_ray_grid(ROWS, COLS)
    # all unit norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays), axis=-1), np.ones((ROWS, COLS)), atol=1e-5
    )
    # reproject a strict interior block (pole pixels lose longitude information)
    v, u = jnp.meshgrid(jnp.arange(32, ROWS - 32), jnp.arange(COLS), indexing="ij")
    uv = jnp.stack([u + 0.0, v + 0.0], axis=-1).astype(jnp.float32)
    uv2 = sph.cam_to_image(rays[32:-32], ROWS, COLS)
    wrapped = np.minimum(
        np.abs(np.asarray(uv2[..., 0]) - np.asarray(uv[..., 0])),
        COLS - np.abs(np.asarray(uv2[..., 0]) - np.asarray(uv[..., 0])),
    )
    assert wrapped.max() < 1e-2
    np.testing.assert_allclose(np.asarray(uv2[..., 1]), np.asarray(uv[..., 1]), atol=1e-2)


def test_depth_splat_basic():
    # one point straight ahead at 2 m -> 4x4 footprint around image center
    pts = jnp.array([[0.0, 0.0, 2.0]])
    mask = jnp.array([True])
    depth = sph.project_points_to_depth_pano(pts, mask, ROWS, COLS, size=3)
    d = np.asarray(depth)
    cu, cv = COLS // 2, ROWS // 2
    assert abs(d[cv, cu] - 2.0) < 1e-4
    # integer projection: floor == ceil -> (size//2*2+1)^2 = 9 pixels
    assert (d > 0).sum() == 9
    # nothing elsewhere
    assert d[0, 0] == 0
    # fractional projection -> floor != ceil -> 4x4 = 16 pixels
    lon = (2 * (COLS / 2 + 0.5) / COLS - 1) * np.pi
    lat = (0.5 - (ROWS / 2 + 0.5) / ROWS) * np.pi
    pts2 = sph.sphere_to_cam(jnp.array([[lon, lat]]), r=2.0)
    d2 = np.asarray(sph.project_points_to_depth_pano(pts2, mask, ROWS, COLS, size=3))
    assert (d2 > 0).sum() == 16


def test_depth_splat_zmin():
    # two points projecting to the same pixel: nearer one wins (z-buffer)
    pts = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 5.0]])
    mask = jnp.array([True, True])
    depth = sph.project_points_to_depth_pano(pts, mask, ROWS, COLS)
    cu, cv = COLS // 2, ROWS // 2
    assert abs(float(depth[cv, cu]) - 2.0) < 1e-4


def test_depth_splat_mask_and_outside():
    pts = jnp.array([[0.0, 0.0, 2.0], [0.0, -1.0, 0.001]])  # 2nd ~ at pole, splat oob
    mask = jnp.array([False, True])
    depth = sph.project_points_to_depth_pano(pts, mask, ROWS, COLS)
    assert float(jnp.sum(depth[ROWS // 2 - 3: ROWS // 2 + 3, COLS // 2 - 3: COLS // 2 + 3])) == 0.0


def test_bilinear_sample_interp():
    img = jnp.arange(16.0).reshape(4, 4)
    # at the center of pixel (1,1) -> exact value img[1,1] = 5
    val = sph.bilinear_sample(img, jnp.array([1.5, 1.5]))
    np.testing.assert_allclose(float(val), 5.0, atol=1e-5)
    # halfway between pixel (1,1) and (1,2) centers
    val = sph.bilinear_sample(img, jnp.array([2.0, 1.5]))
    np.testing.assert_allclose(float(val), 5.5, atol=1e-5)


def test_bilinear_lon_wrap():
    img = jnp.zeros((4, 8)).at[:, 0].set(1.0).at[:, 7].set(3.0)
    # u=0 is half a pixel left of col-0 center -> wraps to blend col 7 and col 0
    val = sph.bilinear_sample(img, jnp.array([0.0, 2.5]), mode_wrap_lon=True)
    np.testing.assert_allclose(float(val), 2.0, atol=1e-5)


def test_break_to_segments_seam():
    # line crossing the seam: from u near W-2 to u near 2 at same v
    uv, seam = sph.break_to_segments_mask(
        jnp.array([COLS - 2.0, ROWS / 2]), jnp.array([2.0, ROWS / 2]), ROWS, COLS, 16
    )
    assert bool(jnp.any(seam))


def test_packed_u8_sampler_matches_bilinear():
    """pack_bilinear_u8 + one-gather sampling == legacy 4-gather bilinear on
    the u8-quantized image (incl. seam wrap and pole clamping)."""
    rng = np.random.default_rng(3)
    H, W = 37, 64
    img = rng.uniform(0, 1.3, (H, W)).astype(np.float32)
    uv = np.stack([rng.uniform(-3, W + 3, 4000),
                   rng.uniform(-2, H + 2, 4000)], -1).astype(np.float32)
    packed, scale = sph.pack_bilinear_u8(jnp.asarray(img))
    fast = np.asarray(sph.bilinear_sample_packed_u8(packed, scale,
                                                    jnp.asarray(uv)))
    imgq = (np.round(img / float(scale) * 255) / 255 * float(scale))
    ref = np.asarray(sph.bilinear_sample(jnp.asarray(imgq.astype(np.float32)),
                                         jnp.asarray(uv)))
    np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_packed_u16_sampler_matches_bilinear():
    rng = np.random.default_rng(4)
    H, W = 23, 48
    d = rng.uniform(0, 25, (H, W)).astype(np.float32)
    uv = np.stack([rng.uniform(-3, W + 3, 4000),
                   rng.uniform(-2, H + 2, 4000)], -1).astype(np.float32)
    packed, _ = sph.pack_bilinear_u16(jnp.asarray(d))
    fast = np.asarray(sph.bilinear_sample_packed_u16(packed, 256.0,
                                                     jnp.asarray(uv)))
    dq = np.round(d * 256) / 256
    ref = np.asarray(sph.bilinear_sample(jnp.asarray(dq.astype(np.float32)),
                                         jnp.asarray(uv)))
    np.testing.assert_allclose(fast, ref, atol=1e-4)
