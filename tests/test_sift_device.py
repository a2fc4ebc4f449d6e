"""On-device SIFT (ops/sift_device.py): detection quality and cross-view
matchability — the properties the SfM chain actually needs (the host cv2
path stays the default; this is the TPU-native alternative for 1-core
hosts, PERF.md round-4)."""

import numpy as np
import jax.numpy as jnp
import pytest

import synthetic
from panovlm_tpu.ops import sift_device, spherical
from panovlm_tpu.utils import sift as host_sift


@pytest.fixture(scope="module")
def pano_pair():
    g1, _ = synthetic.render_panorama((0.0, 0.4, 0.0), 256, 512)
    g2, _ = synthetic.render_panorama((0.08, 0.42, 0.03), 256, 512)
    return g1.astype(np.float32), g2.astype(np.float32)


def test_detects_repeatable_keypoints(pano_pair):
    g1, g2 = pano_pair
    uv1, d1, v1, r1 = sift_device.detect_and_describe(jnp.asarray(g1),
                                                      num_features=512)
    uv1, v1 = np.asarray(uv1), np.asarray(v1)
    assert v1.sum() >= 200, int(v1.sum())
    H, W = g1.shape
    assert (uv1[v1][:, 0] >= 0).all() and (uv1[v1][:, 0] < W).all()
    assert (uv1[v1][:, 1] >= 0).all() and (uv1[v1][:, 1] < H).all()
    # descriptors are unit-ish (RootSIFT: L1 of squared = 1 -> L2 = 1)
    n = np.linalg.norm(np.asarray(d1)[v1], axis=1)
    np.testing.assert_allclose(n, 1.0, atol=0.05)


def test_cross_view_matching_yields_inliers(pano_pair):
    """Features from two nearby views must match and the matches must be
    geometrically consistent (AC-RANSAC finds an essential matrix with a
    healthy inlier set) — the property init_camera_pose depends on."""
    import jax
    from panovlm_tpu.ops import epipolar
    g1, g2 = pano_pair
    uv1, d1, v1, _ = sift_device.detect_and_describe(jnp.asarray(g1),
                                                     num_features=512)
    uv2, d2, v2, _ = sift_device.detect_and_describe(jnp.asarray(g2),
                                                     num_features=512)
    m = host_sift.match_descriptors(d1, v1, d2, v2, max_matches=256)
    idx, mmask = np.asarray(m["idx"]), np.asarray(m["mask"])
    n_m = int(mmask.sum())
    assert n_m >= 60, n_m
    H, W = g1.shape
    b1 = spherical.image_to_cam(jnp.asarray(np.asarray(uv1)[idx[:, 0]]), H, W)
    b2 = spherical.image_to_cam(jnp.asarray(np.asarray(uv2)[idx[:, 1]]), H, W)
    out = epipolar.find_essential_acransac(b1, b2, jnp.asarray(mmask), n_hyp=200)
    n_inl = int(np.asarray(out["inliers"]).sum())
    assert bool(np.asarray(out["ok"])), "AC-RANSAC failed"
    assert n_inl >= 0.5 * n_m, (n_inl, n_m)


def test_uv_localization_unbiased():
    """A symmetric blob's strongest keypoint must land on the blob center:
    catches the +0.25 px upsample half-pixel-center bias (uv = yx*scale -
    0.25; with the bias the error is ~0.35 px, without it < 0.2 px)."""
    H, W = 96, 96
    cy, cx = 40.0, 57.0
    yy, xx = np.meshgrid(np.arange(H) + 0.0, np.arange(W) + 0.0,
                         indexing="ij")
    g = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0 ** 2)))
    g = (0.1 + 0.8 * g).astype(np.float32)
    uv, _, val, resp = sift_device.detect_and_describe(
        jnp.asarray(g), num_features=16, n_octaves=2)
    uv, val, resp = np.asarray(uv), np.asarray(val), np.asarray(resp)
    assert val.any()
    best = np.argmax(np.where(val, resp, -np.inf))
    err = np.hypot(uv[best, 0] - cx, uv[best, 1] - cy)
    assert err < 0.2, (uv[best], err)


def test_small_input_pads_instead_of_erroring():
    """num_features larger than the candidate pool must clamp+pad (ADVICE
    r4): a tiny image at a huge feature count used to raise a top_k shape
    error."""
    g = np.random.default_rng(0).random((40, 40)).astype(np.float32)
    uv, desc, val, resp = sift_device.detect_and_describe(
        jnp.asarray(g), num_features=8096, n_octaves=4)
    assert uv.shape == (8096, 2) and desc.shape == (8096, 128)
    assert val.shape == (8096,) and resp.shape == (8096,)


def test_batch_entry_shapes(pano_pair):
    g1, g2 = pano_pair
    uv, desc, val = sift_device.extract_sift_device_batch(
        np.stack([g1, g2]), num_features=256, chunk=2)
    assert uv.shape == (2, 256, 2) and desc.shape == (2, 256, 128)
    assert val.shape == (2, 256) and val.sum() > 200
