import jax.numpy as jnp
import numpy as np
import pytest

from panovlm_tpu.sensors import velodyne as vd
from panovlm_tpu.sensors import lidar_lines

from synthetic import make_scan


@pytest.fixture(scope="module")
def scan():
    pts_lidar = make_scan(noise=0.002)
    pts, ok = vd.preprocess_cloud(pts_lidar)
    assert ok
    return pts


@pytest.fixture(scope="module")
def img(scan):
    pts, mask = vd.pad_points(scan, 32768)
    return vd.build_range_image(jnp.asarray(pts), jnp.asarray(mask))


def test_preprocess_axis_swap():
    # lidar (0, 1, 0) = forward -> camera (0, 0, 1) = +Z front
    raw = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (5000, 1))
    pts, _ = vd.preprocess_cloud(raw)
    np.testing.assert_allclose(pts[0], [0, 0, 1], atol=1e-6)
    # min-range filter
    raw2 = np.array([[0.1, 0.1, 0.0], [0, 2.0, 0]], np.float32)
    pts2, ok = vd.preprocess_cloud(raw2)
    assert len(pts2) == 1 and not ok  # <4000 points -> invalid scan


def test_range_image_coverage(img):
    valid = np.asarray(img["valid"])
    # nearly every cell should be hit for a closed room
    assert valid.mean() > 0.9
    r = np.asarray(img["range"])
    assert r[valid].min() > 0.5
    assert r[valid].max() < 10.0


def test_range_image_geometry(img, scan):
    # ranges should match point norms
    valid = np.asarray(img["valid"])
    xyz = np.asarray(img["xyz"])
    r = np.asarray(img["range"])
    norms = np.linalg.norm(xyz[valid], axis=1)
    np.testing.assert_allclose(norms, r[valid], atol=1e-4)


def test_compact_rows(img):
    seq = vd.compact_rows(img)
    count = np.asarray(seq["count"])
    assert (count > 1000).all()  # dense rows
    v = np.asarray(seq["valid"])
    for i in range(vd.N_SCANS):
        assert v[i, :count[i]].all() and not v[i, count[i]:].any()
    # columns strictly increasing within valid prefix
    col = np.asarray(seq["col"])
    assert (np.diff(col[0, :count[0]]) > 0).all()


def test_segmentation_keeps_big_components(img):
    labels, keep = vd.segment_range_image(img["range"], img["valid"])
    valid = np.asarray(img["valid"])
    # a closed room: walls+columns are all large connected components
    assert np.asarray(keep).sum() > 0.8 * valid.sum()


def test_adaptive_curvature_flags_column_edges(img):
    seq = vd.compact_rows(img)
    curv, m, ok = vd.adaptive_curvature(seq)
    curv = np.asarray(curv)
    ok = np.asarray(ok)
    assert (curv[ok] >= 0).all()
    # wall interiors are flat: median curvature low
    assert np.median(curv[ok]) < 0.05
    # but the column edges create high-curvature points
    assert (curv[ok] > 0.5).sum() > 10


def test_extract_features_end_to_end(scan):
    pts, mask = vd.pad_points(scan, 32768)
    feats, seq, aux = vd.extract_features(jnp.asarray(pts), jnp.asarray(mask))
    n_sharp = int(np.asarray(feats.sharp_mask).sum())
    n_edge = int(np.asarray(feats.less_sharp_mask).sum())
    n_flat = int(np.asarray(feats.flat_mask).sum())
    n_surf = int(np.asarray(feats.less_flat_mask).sum())
    n_lines = int(np.asarray(feats.line_mask).sum())
    assert n_edge > 20, n_edge
    assert n_flat > 50, n_flat
    assert n_surf > 500, n_surf
    assert n_lines >= 4, n_lines  # two columns x >=2 visible vertical edges

    # vertical column edges: line directions ~ Y (camera frame, Y down)
    dirs = np.asarray(feats.line_dirs)[np.asarray(feats.line_mask)]
    vertical = np.abs(dirs[:, 1]) > 0.95
    assert vertical.sum() >= 4, dirs

    # every kept less-sharp point belongs to a line
    lbl = np.asarray(feats.point_to_segment)
    msk = np.asarray(feats.less_sharp_mask)
    assert (lbl[msk] >= 0).all()


def test_voxel_downsample():
    rng = np.random.default_rng(0)
    # 1000 points in a 0.2-cube -> 1 voxel
    pts = (rng.random((1000, 3)) * 0.18).astype(np.float32)
    out, mask = vd.voxel_downsample(jnp.asarray(pts), jnp.ones(1000, bool))
    assert int(np.asarray(mask).sum()) == 1
    np.testing.assert_allclose(np.asarray(out[0]), pts.mean(0), atol=1e-4)
    # two separated clusters -> 2 voxels
    pts2 = np.concatenate([pts, pts + 5.0]).astype(np.float32)
    out2, mask2 = vd.voxel_downsample(jnp.asarray(pts2), jnp.ones(2000, bool))
    assert int(np.asarray(mask2).sum()) == 2


def test_voxel_downsample_two_level_weighted_merge_is_exact():
    """Chunked level-1 centroids merged with weights=counts must reproduce
    the single-pass per-voxel centroid exactly (the fuse_depth_maps
    two-level merge contract) — including aux channels."""
    rng = np.random.default_rng(1)
    pts = (rng.random((600, 3)) * 1.5).astype(np.float32)
    aux = rng.random(600).astype(np.float32)
    mask = jnp.ones(600, bool)
    ref_c, ref_m, ref_a = vd.voxel_downsample(
        jnp.asarray(pts), mask, aux=jnp.asarray(aux), leaf=0.2)
    ref_m = np.asarray(ref_m)

    # uneven chunks deliberately split voxels across chunk boundaries
    acc_p, acc_a, acc_n = [], [], []
    for s, e in ((0, 170), (170, 430), (430, 600)):
        p, m, a, n = vd.voxel_downsample(
            jnp.asarray(pts[s:e]), jnp.ones(e - s, bool),
            aux=jnp.asarray(aux[s:e]), leaf=0.2, return_counts=True)
        m = np.asarray(m)
        acc_p.append(np.asarray(p)[m])
        acc_a.append(np.asarray(a)[m])
        acc_n.append(np.asarray(n)[m])
    p2 = np.concatenate(acc_p)
    out_c, out_m, out_a = vd.voxel_downsample(
        jnp.asarray(p2), jnp.ones(len(p2), bool),
        aux=jnp.asarray(np.concatenate(acc_a)), leaf=0.2,
        weights=jnp.asarray(np.concatenate(acc_n)))
    out_m = np.asarray(out_m)
    assert out_m.sum() == ref_m.sum()

    def keyed(c, a):
        order = np.lexsort(c.T)
        return c[order], a[order]

    rc, ra = keyed(np.asarray(ref_c)[ref_m], np.asarray(ref_a)[ref_m])
    oc, oa = keyed(np.asarray(out_c)[out_m], np.asarray(out_a)[out_m])
    np.testing.assert_allclose(oc, rc, atol=1e-5)
    np.testing.assert_allclose(oa, ra, atol=1e-5)


def test_undistort_identity_and_rotation():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32))
    frac = jnp.linspace(0, 1, 100)
    out = vd.undistort_points(pts, frac, jnp.eye(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)
    # pure translation: point at frac=1 moves by t, frac=0 stays
    t = jnp.asarray([1.0, 0, 0])
    out2 = np.asarray(vd.undistort_points(pts, frac, jnp.eye(3), t))
    np.testing.assert_allclose(out2[0], np.asarray(pts)[0], atol=1e-6)
    np.testing.assert_allclose(out2[-1], np.asarray(pts)[-1] + [1, 0, 0], atol=1e-5)


def test_extract_lines_synthetic():
    rng = np.random.default_rng(1)
    # two perpendicular segments + noise clutter
    # lines must span >= n/2 distinct rings (reference FilterLineByScan) —
    # like real vertical edges with ~1-2 points per ring
    t1 = np.linspace(0, 2, 30)
    l1 = np.stack([t1, np.zeros_like(t1), np.ones_like(t1)], 1)
    t2 = np.linspace(0, 1.5, 24)
    l2 = np.stack([np.zeros_like(t2), t2, 2 * np.ones_like(t2)], 1)
    clutter = rng.uniform(-3, 3, size=(30, 3))
    pts = np.concatenate([l1, l2, clutter]).astype(np.float32)
    pts += rng.normal(size=pts.shape).astype(np.float32) * 0.01
    P = 128
    buf = np.zeros((P, 3), np.float32)
    buf[:len(pts)] = pts
    mask = np.zeros(P, bool)
    mask[:len(pts)] = True
    rows = np.zeros(P, np.int32)
    rows[:30] = np.arange(30) % 16         # line 1: 16 rings, <=2 pts each
    rows[30:54] = np.arange(24) % 13
    rows[54:] = -1
    out = lidar_lines.extract_lines(jnp.asarray(buf), jnp.asarray(mask), jnp.asarray(rows))
    got = int(np.asarray(out["mask"]).sum())
    assert got >= 2, got
    dirs = np.asarray(out["dirs"])[np.asarray(out["mask"])]
    # the two dominant lines should be along x and y
    ax = np.abs(dirs)
    assert (ax[:, 0] > 0.99).any() and (ax[:, 1] > 0.99).any()


def test_extract_planes_finds_room_planes():
    """Standalone plane segmentation (LidarPlaneExtraction.cpp: normal
    maps + region growing + cluster validation): on a synthetic room scan
    the floor and walls come out as large validated clusters whose fitted
    normals match the room's axis directions, and curvature is low on the
    kept cells."""
    import jax.numpy as jnp
    from synthetic import make_scan
    from panovlm_tpu.sensors import velodyne as vd
    from panovlm_tpu.sensors import lidar_planes as lp

    # large open room: the downward rings land on the floor well before
    # the walls, so floor AND wall clusters are both in play
    pts_raw = make_scan(origin=(0.4, 0.2, -1.0), noise=0.003,
                        half_extents=(8.0, 8.0, 1.5), boxes=())
    pts, ok = vd.preprocess_cloud(pts_raw)
    assert ok
    pp, mm = vd.pad_points(pts, 32768)
    img = vd.build_range_image(jnp.asarray(pp), jnp.asarray(mm))

    pm = lp.extract_planes(img["xyz"], img["valid"])
    keep = np.asarray(pm.keep)
    assert keep.sum() > 2000, keep.sum()        # planes cover the room

    centers, normals, ds, sizes, mask = lp.plane_params(
        img["xyz"], img["valid"], pm, cap=16)
    assert mask.sum() >= 3                       # floor + several walls
    # every recovered plane should be axis-aligned in the camera frame
    # (room walls/floor): max |component| close to 1
    ax = np.abs(normals[mask]).max(axis=1)
    assert (ax > 0.98).all(), normals[mask]
    # the floor (y = const in camera frame after the axis swap) is there
    has_floor = (np.abs(normals[mask][:, 1]) > 0.98).any()
    assert has_floor
    # kept cells are genuinely low-curvature
    assert float(np.asarray(pm.curvature)[keep].mean()) < 0.02


def test_combine_edges_hysteresis():
    """CombineEdgeFeatures (Velodyne.cpp:1191-1267): a loose-only blob
    with no strict seed is dropped; a blob containing a strict seed is
    kept whole; blobs smaller than min_segment are dropped even when
    seeded."""
    S, W = 16, 64
    strict = np.zeros((S, W), bool)
    loose = np.zeros((S, W), bool)
    # blob A: strict seed at (4,10) + loose neighbors -> kept
    strict[4, 10] = True
    loose[4, 8:14] = True
    loose[5, 9:13] = True
    # blob B: loose-only run, size >= min_segment, far away -> dropped
    loose[10, 40:48] = True
    # blob C: strict seed but only 2 members -> dropped
    strict[14, 30] = True
    loose[14, 31] = True
    keep, _ = vd.combine_edges_hysteresis(jnp.asarray(strict),
                                          jnp.asarray(loose))
    keep = np.asarray(keep)
    assert keep[4, 8:14].all() and keep[5, 9:13].all()      # A kept whole
    assert not keep[10, 40:48].any()                        # B dropped
    assert not keep[14, 30:32].any()                        # C dropped


def test_extract_features_double_extraction(scan):
    """method=2 DOUBLE_EXTRACTION returns a valid feature set whose edge
    points are a hysteresis-validated subset near the loose picks; line
    labels still line up with the edge buffer."""
    pts, mask = vd.pad_points(scan, 32768)
    f3, _, _ = vd.extract_features(jnp.asarray(pts), jnp.asarray(mask),
                                   method=3)
    f2, _, _ = vd.extract_features(jnp.asarray(pts), jnp.asarray(mask),
                                   method=2)
    n2 = int(np.asarray(f2.less_sharp_mask).sum())
    n3 = int(np.asarray(f3.less_sharp_mask).sum())
    assert n2 > 0
    # hysteresis keeps only seeded segments: never more than the loose set
    m2 = np.asarray(jnp.sum(jnp.where(
        f2.less_sharp_mask, 1, 0)))
    assert m2 <= np.asarray(f2.less_sharp_mask).shape[0]
    # labels are consistent: every labeled point is a masked edge point
    lab = np.asarray(f2.point_to_segment)
    em = np.asarray(f2.less_sharp_mask)
    assert ((lab >= 0) <= em).all() or n3 == 0


def _firing_column(az, rings):
    """Points of one firing column at azimuth az, in the given ring order
    (ring r sits at elevation -15 + 2r degrees, VLP-16)."""
    els = np.radians(np.asarray(rings, np.float64) * 2.0 - 15.0)
    y = -np.sin(els)
    h = np.cos(els)
    return np.stack([h * np.sin(az), y, h * np.cos(az)], 1).astype(np.float32)


def test_repair_ring_conflicts_lcs():
    """ReOrderVLP2 parity (Velodyne.cpp:213-369): a sparse firing column
    where elevation noise lands a ring-5 return on ring 6 (duplicating the
    true ring-6 return) is repaired by the LCS vote; clean columns and all
    other points keep their elevation-binned rings."""
    order_to_ring = [0, 8, 1, 9, 2, 10, 3, 11, 4, 12, 5, 13, 6, 14, 7, 15]
    cols = []
    for k in range(5):
        az = 0.01 + 0.3 * k
        if k == 2:
            # firing positions 0..9 canonical, position 10 = corrupted
            # (true ring 5 measured at ring 6's elevation), position 11
            # (ring 13) missing, then canonical 12..15
            rings = order_to_ring[:10] + [6] + order_to_ring[12:]
        else:
            rings = order_to_ring
        cols.append(_firing_column(az, rings))
    pts = np.concatenate(cols, 0)
    mask = np.ones(len(pts), bool)
    out = np.asarray(vd.repair_ring_conflicts(jnp.asarray(pts), jnp.asarray(mask)))

    expect = []
    for k in range(5):
        if k == 2:
            expect += order_to_ring[:10] + [5] + order_to_ring[12:]
        else:
            expect += order_to_ring
    np.testing.assert_array_equal(out, np.asarray(expect, np.int32))


def test_repair_ring_conflicts_noop_on_clean(scan):
    """On a clean synthetic sweep the repaired rings equal plain elevation
    binning (no conflicts -> no changes)."""
    pts, mask = vd.pad_points(scan, 32768)
    pts, mask = jnp.asarray(pts), jnp.asarray(mask)
    out = np.asarray(vd.repair_ring_conflicts(pts, mask))
    x, y, z = np.asarray(pts).T
    vert = np.degrees(np.arctan2(-y, np.sqrt(x * x + z * z)))
    ring = np.floor((vert + 15.0) / 2.0 + 0.5).astype(np.int32)
    ok = np.asarray(mask) & (ring >= 0) & (ring < 16)
    np.testing.assert_array_equal(out[ok], ring[ok])
    assert np.all(out[~ok] == -1)
