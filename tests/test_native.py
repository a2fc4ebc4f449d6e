import numpy as np
import pytest

from panovlm_tpu import native
from panovlm_tpu.io import pointcloud


@pytest.fixture(scope="module")
def lib():
    lib = native.get()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_pcd_roundtrip_native_vs_numpy(tmp_path, lib, rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    inten = rng.random(1000).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    assert native.write_pcd_native(p, pts, inten)
    a = native.read_cloud_native(p)
    np.testing.assert_allclose(a[:, :3], pts, atol=1e-6)
    np.testing.assert_allclose(a[:, 3], inten, atol=1e-6)
    # numpy reader parses the native writer's output identically
    b = pointcloud.read_pcd(p)
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_numpy_writer_native_reader(tmp_path, lib, rng):
    pts = rng.normal(size=(512, 3)).astype(np.float32)
    p = str(tmp_path / "b.pcd")
    pointcloud.write_pcd(p, pts)
    a = native.read_cloud_native(p)
    np.testing.assert_allclose(a[:, :3], pts, atol=1e-6)


def test_prefetcher_order_and_content(tmp_path, lib, rng):
    paths = []
    truths = []
    for i in range(8):
        pts = rng.normal(size=(200 + i, 3)).astype(np.float32)
        p = str(tmp_path / f"s{i}.pcd")
        pointcloud.write_pcd(p, pts)
        paths.append(p)
        truths.append(pts)
    pf = native.ScanPrefetcher(paths, n_threads=3)
    out = list(pf)
    pf.close()
    assert len(out) == 8
    for got, want in zip(out, truths):
        np.testing.assert_allclose(got[:, :3], want, atol=1e-6)


def test_depth_quantize(lib, rng):
    import ctypes
    d = (rng.random(1000) * 20).astype(np.float32)
    q = np.zeros(1000, np.uint16)
    lib.pv_depth_quantize(d.ctypes.data_as(ctypes.c_void_p),
                          q.ctypes.data_as(ctypes.c_void_p), 1000,
                          ctypes.c_float(256.0))
    out = np.zeros(1000, np.float32)
    lib.pv_depth_dequantize(q.ctypes.data_as(ctypes.c_void_p),
                            out.ctypes.data_as(ctypes.c_void_p), 1000,
                            ctypes.c_float(256.0))
    np.testing.assert_allclose(out, d, atol=1 / 256)


def test_lzf_roundtrip(rng):
    from panovlm_tpu.io.pointcloud import lzf_compress, lzf_decompress
    # repetitive data (back-references), random data (literal runs), short
    for blob in (bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),
                 bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
                 b"abcabcabcabcabcabcabc" * 50, b"x", b""):
        comp = lzf_compress(blob)
        assert lzf_decompress(comp, len(blob)) == blob


def test_pcd_binary_compressed_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(700, 3)).astype(np.float32)
    inten = rng.random(700).astype(np.float32)
    p = str(tmp_path / "c.pcd")
    pointcloud.write_pcd(p, pts, intensity=inten, compressed=True)
    with open(p, "rb") as f:
        assert b"DATA binary_compressed" in f.read()
    a = pointcloud.read_pcd(p)
    np.testing.assert_allclose(a[:, :3], pts, atol=1e-6)
    np.testing.assert_allclose(a[:, 3], inten, atol=1e-6)


def test_pcd_binary_compressed_native(tmp_path, lib, rng):
    pts = rng.normal(size=(700, 3)).astype(np.float32)
    p = str(tmp_path / "d.pcd")
    pointcloud.write_pcd(p, pts, compressed=True)
    a = native.read_cloud_native(p)
    assert a is not None and a.shape == (700, 3)
    np.testing.assert_allclose(a, pts, atol=1e-6)


def test_native_rejects_unknown_data_mode(tmp_path, lib):
    p = str(tmp_path / "bad.pcd")
    with open(p, "w") as f:
        f.write("FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
                "WIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA rle\n1 2 3\n4 5 6\n")
    assert native.read_cloud_native(p) is None
