import jax.numpy as jnp
import numpy as np

from panovlm_tpu.utils import depth_completion as dc
from panovlm_tpu.config import Config, load_config
from panovlm_tpu.io import artifacts


def test_dilate_erode_basic():
    img = jnp.zeros((9, 9)).at[4, 4].set(2.0)
    d = np.asarray(dc.dilate(img, dc.CROSS_3))
    assert d[4, 5] == 2.0 and d[3, 4] == 2.0 and d[3, 3] == 0.0
    e = np.asarray(dc.erode(jnp.ones((9, 9)).at[4, 4].set(0.0), dc.FULL_3))
    assert e[4, 5] == 0.0 and e[2, 2] == 1.0


def test_depth_completion_fills_plane(rng):
    # sparse samples of a smooth depth field -> completion close to the field
    H, W = 64, 128
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    field = (3.0 + 0.01 * xx + 0.02 * yy).astype(np.float32)
    sparse = np.zeros((H, W), np.float32)
    sel = rng.random((H, W)) < 0.15
    sel[:6] = False  # empty "sky" band at top
    sparse[sel] = field[sel]
    dense = np.asarray(dc.depth_completion(jnp.asarray(sparse), max_depth=20.0))
    filled = dense > 0.1
    # everything below the first valid row should be filled
    assert filled[10:].mean() > 0.98
    err = np.abs(dense[filled] - field[filled])
    assert np.median(err) < 0.15, np.median(err)
    # sky stays empty beyond morphological reach (first valid row is 6 and
    # the largest kernel reaches 4 rows; the reference's dilations bleed the
    # same way — only hole FILLING is sky-gated)
    assert dense[:2].max() == 0.0


def test_compute_depth_image(rng):
    import sys
    sys.path.insert(0, "tests")
    from synthetic import make_scan
    from panovlm_tpu.sensors import velodyne as vd
    pts_l = make_scan(noise=0.002, h_steps=900)
    pts, _ = vd.preprocess_cloud(pts_l)
    # note: compute_depth_image expects raw lidar-frame points + T_cl; here
    # points are already camera-convention so T_cl = I
    p, m = vd.pad_points(pts, 16384)
    depth = np.asarray(dc.compute_depth_image(
        jnp.asarray(p), jnp.asarray(m), jnp.eye(4), 128, 256, max_depth=20.0))
    # a VLP-16 only covers |lat| <= 15 deg: rows ~53..75 of 128 (+fill below)
    band = depth[56:72]
    assert (band > 0).mean() > 0.98, (band > 0).mean()
    assert depth.max() <= 20.0
    # completed depths in the band should be close to the true ranges
    assert 1.0 < np.median(band[band > 0]) < 5.0


def test_config_roundtrip(tmp_path):
    p = tmp_path / "cfg.txt"
    p.write_text("""
# comment
num_sift = 4096
scale = -2
angle_residual = true
camera_lidar_weight = 25
T_cl = 1 0 0 0 0 1 0 0 0 0 1 0.5
result_path = /tmp/x
mvs_data_path = /tmp/x/mvs_data
""")
    cfg = load_config(str(p))
    assert cfg.num_sift == 4096
    assert cfg.scale == -2
    assert cfg.angle_residual is True
    assert cfg.camera_lidar_weight == 25.0
    np.testing.assert_allclose(cfg.T_cl[:3, 3], [0, 0, 0.5])
    assert cfg.sfm_result_path == "/tmp/x/sfm"
    assert cfg.mvs_depth_path == "/tmp/x/mvs_data/depth"


def test_pose_txt_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation as ScR
    R = ScR.random(5, random_state=1).as_matrix()
    t = rng.normal(size=(5, 3))
    path = str(tmp_path / "pose.txt")
    artifacts.export_pose_t(path, R, t, names=[f"f{i}.jpg" for i in range(5)])
    R2, t2, names, valid = artifacts.read_pose_t(path)
    np.testing.assert_allclose(R2, R, atol=1e-12)
    np.testing.assert_allclose(t2, t, atol=1e-12)
    assert names[0] == "f0.jpg" and valid.all()


def test_depth_conf_quantization(tmp_path):
    d = np.array([[1.5, 0.0], [19.99, 3.25]], np.float32)
    p = str(tmp_path / "d.npy")
    artifacts.export_depth_u16(p, d)
    d2 = artifacts.read_depth_u16(p)
    np.testing.assert_allclose(d2, d, atol=1 / 256)
    c = np.array([[-1.0, 0.0], [0.5, 1.0]], np.float32)
    pc = str(tmp_path / "c.npy")
    artifacts.export_conf_u16(pc, c)
    c2 = artifacts.read_conf_u16(pc)
    np.testing.assert_allclose(c2, c, atol=1e-4)


def test_compute_depth_images_chunked_matches_unchunked():
    """The host-level chunking (bounded device programs for Floor/Campus
    trajectories) must reproduce the single-program result exactly,
    including a padded last chunk — and must work when called with N >
    chunk (regression: an outer jit made the host loop trace-crash)."""
    rng = np.random.default_rng(0)
    N, P = 5, 512
    pts = rng.normal(size=(N, P, 3)).astype(np.float32) * 2 + np.array(
        [0, 0, 3], np.float32)
    msk = rng.random((N, P)) < 0.9
    T = np.eye(4, dtype=np.float32)
    a = dc.compute_depth_images(jnp.asarray(pts), jnp.asarray(msk),
                                jnp.asarray(T), 32, 64, chunk=256)
    b = dc.compute_depth_images(jnp.asarray(pts), jnp.asarray(msk),
                                jnp.asarray(T), 32, 64, chunk=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
