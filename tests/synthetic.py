"""Synthetic Room-like dataset generation for tests and benchmarks.

Simulates a VLP-16 (16 rings x 1800 azimuth steps, sensors/Velodyne.h:171)
inside a box room with interior box columns, in the raw lidar convention
(X right, Y forward, Z up) that Velodyne::LoadLidar expects before its axis
swap (Velodyne.cpp:124-131). Also renders matching synthetic panoramas.
"""

from __future__ import annotations

import numpy as np

VLP16_ELEVATIONS = np.arange(-15.0, 16.0, 2.0)  # degrees, 16 rings


def vlp16_directions(h_steps: int = 1800):
    """(16*h, 3) unit ray directions in lidar frame, azimuth-major order
    mimicking a sweep (azimuth varies slowly, ring varies fast)."""
    az = np.linspace(0, 2 * np.pi, h_steps, endpoint=False)
    el = np.radians(VLP16_ELEVATIONS)
    a, e = np.meshgrid(az, el, indexing="ij")  # (h, 16)
    d = np.stack([np.sin(a) * np.cos(e), np.cos(a) * np.cos(e), np.sin(e)], axis=-1)
    return d.reshape(-1, 3)


DEFAULT_BOXES = (
    # full-height square columns (vertical edge features)
    ((1.5, 0.8, 0.0), (0.25, 0.25, 10.0)),
    ((-1.2, -0.9, 0.0), (0.3, 0.3, 10.0)),
    # table-like slabs (horizontal surfaces -> vertical observability for a
    # VLP-16 whose +-15 deg fan misses distant floor/ceiling)
    ((0.8, -1.0, -0.7), (0.5, 0.35, 0.06)),
    ((-1.8, 1.2, -0.5), (0.4, 0.5, 0.05)),
)


def raycast_room(origins, dirs, half_extents=(3.0, 2.0, 1.5),
                 boxes=DEFAULT_BOXES):
    """Cast rays from inside a box room with solid interior boxes.

    origins: (3,) or (N,3); dirs (N,3) unit. Returns (N,) ranges (inf = miss).
    boxes: ((center xyz), (half extents xyz)) solid obstacles; half extents
    are clipped to the room so "10" means full height.
    """
    o = np.broadcast_to(np.asarray(origins, np.float64), dirs.shape)
    d = np.asarray(dirs, np.float64)
    he = np.asarray(half_extents)

    with np.errstate(divide="ignore", invalid="ignore"):
        # interior walls: for each axis the exit distance
        t_axis = np.where(d > 0, (he - o) / d, (-he - o) / d)
        t_axis = np.where(np.abs(d) < 1e-12, np.inf, t_axis)
        t_wall = np.min(t_axis, axis=1)

        t = t_wall
        for center, half in boxes:
            c = np.asarray(center, np.float64)
            h = np.asarray(half, np.float64)
            lo = np.maximum(c - h, -he)
            hi = np.minimum(c + h, he)
            t1 = (lo - o) / d
            t2 = (hi - o) / d
            t1, t2 = np.minimum(t1, t2), np.maximum(t1, t2)
            # d == 0 on an axis: the ray never crosses that slab — constraint
            # is "origin inside" (t = -inf..inf) or "never" (inf..-inf), NOT
            # ignored (the old isfinite() filtering dropped the axis, letting
            # rays with an exactly-zero component hit boxes they never reach:
            # phantom returns pinned to the sensor at azimuth 0 / pi)
            par = np.abs(d) < 1e-12
            inside = (o > lo) & (o < hi)
            t1 = np.where(par, np.where(inside, -np.inf, np.inf), t1)
            t2 = np.where(par, np.where(inside, np.inf, -np.inf), t2)
            t_near = np.max(t1, axis=1)
            t_far = np.min(t2, axis=1)
            hit = (t_near <= t_far) & (t_near > 0)
            t = np.where(hit & (t_near < t), t_near, t)
    return t


def make_scan(origin=(0.0, 0.0, 0.0), noise=0.005, rng=None, h_steps=1800,
              dropout=0.0, **room_kw):
    """One synthetic VLP-16 scan (lidar frame, X right Y fwd Z up) -> (N,3)."""
    rng = rng or np.random.default_rng(0)
    dirs = vlp16_directions(h_steps)
    t = raycast_room(np.asarray(origin), dirs, **room_kw)
    ok = np.isfinite(t)
    if dropout > 0:
        ok &= rng.random(len(t)) > dropout
    pts = dirs[ok] * t[ok, None]
    if noise > 0:
        pts += rng.normal(size=pts.shape) * noise
    return pts.astype(np.float32)


def pano_rays(H, W):
    """Equirectangular pixel-center rays in CAMERA convention (X right,
    Y down, Z front), matching panovlm_tpu.ops.spherical."""
    v, u = np.meshgrid(np.arange(H) + 0.0, np.arange(W) + 0.0, indexing="ij")
    lon = (2 * u / W - 1) * np.pi
    lat = (0.5 - v / H) * np.pi
    x = np.cos(lat) * np.sin(lon)
    y = -np.sin(lat)
    z = np.cos(lat) * np.cos(lon)
    return np.stack([x, y, z], -1)


def _value_noise(p, cell=0.25, seed=12345):
    """Deterministic 3D value noise (trilinear interp of hashed lattice
    values) — gives SIFT blob structure that pure sinusoids lack."""
    q = np.asarray(p) / cell
    q0 = np.floor(q).astype(np.int64)
    f = (q - q0).astype(np.float32)
    f = f * f * (3 - 2 * f)  # smoothstep

    def hash3(ix, iy, iz):
        h = (ix * 374761393 + iy * 668265263 + iz * 2147483647 + seed) & 0x7fffffff
        h = (h ^ (h >> 13)) * 1274126177 & 0x7fffffff
        return ((h ^ (h >> 16)) % 10000).astype(np.float32) / 10000.0

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (np.abs(1 - dx - f[..., 0]) * np.abs(1 - dy - f[..., 1])
                     * np.abs(1 - dz - f[..., 2]))
                out = out + w * hash3(q0[..., 0] + dx, q0[..., 1] + dy,
                                      q0[..., 2] + dz)
    return out


def _texture(p):
    """Procedural gray texture of a 3D point (gives NCC signal); includes
    high-frequency components so matching localizes to sub-pixel, and value
    noise at two scales so SIFT finds blobs."""
    return (0.45
            + 0.10 * np.sin(7.1 * p[..., 0]) * np.cos(5.3 * p[..., 1])
            + 0.08 * np.sin(9.7 * p[..., 2] + 1.3)
            + 0.07 * np.sin(17.0 * p[..., 1] + 0.7)
            + 0.06 * np.sin(41.0 * p[..., 0] + 2.1) * np.cos(37.0 * p[..., 2])
            + 0.25 * _value_noise(p, 0.35)
            + 0.15 * _value_noise(p, 0.12, seed=777)).astype(np.float32)


def make_dataset(root, n_frames=6, H=128, W=256, step=(0.22, 0.06, 0.0),
                 yaw_step=0.03, origin=(0.0, 0.0, -1.0), noise=0.002,
                 h_steps=1800, sweep_alpha=0.0, body_step=False,
                 config_overrides=""):
    """Write a synthetic Room-style dataset: images/ pcd/ config.txt.

    T_cl = identity, time_offset = 0: frames and scans are colocated.
    sweep_alpha > 0 simulates spinning-LiDAR motion distortion (see
    make_trajectory_scans); with the default data_gap_time = 0.1 the
    physically consistent value is 0.5 (= 0.1 / (0.1 + 0.1)).
    Returns (config_path, gt) where gt has camera poses in CAMERA-convention
    world ([R_wc, t_wc]) and matching lidar z-up poses."""
    import os
    import cv2
    from panovlm_tpu.io.pointcloud import write_pcd
    os.makedirs(f"{root}/images", exist_ok=True)
    os.makedirs(f"{root}/lidar", exist_ok=True)
    os.makedirs(f"{root}/result", exist_ok=True)
    S = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
    scans, poses_l = make_trajectory_scans(
        n_scans=n_frames, step=step, yaw_step=yaw_step, origin=origin,
        noise=noise, h_steps=h_steps, sweep_alpha=sweep_alpha,
        body_step=body_step)
    R_wc_all, C_all = [], []
    for i, ((R_l, t_l), scan) in enumerate(zip(poses_l, scans)):
        R_wc = S @ R_l @ S.T
        C = S @ t_l
        g, _ = render_panorama(C, H, W, R_wc=R_wc)
        cv2.imwrite(f"{root}/images/{i:06d}.png",
                    np.clip(g * 255, 0, 255).astype(np.uint8))
        write_pcd(f"{root}/lidar/{i:06d}.pcd", scan,
                  intensity=np.zeros(len(scan), np.float32))
        R_wc_all.append(R_wc)
        C_all.append(C)
    np.savez(f"{root}/gt_poses.npz", R_wc=np.stack(R_wc_all),
             C=np.stack(C_all),
             R_wl=np.stack([p[0] for p in poses_l]),
             t_wl=np.stack([p[1] for p in poses_l]))
    cfg_path = f"{root}/config.txt"
    with open(cfg_path, "w") as f:
        f.write(f"""
image_path = {root}/images
lidar_path = {root}/lidar
result_path = {root}/result
mvs_data_path = {root}/result/mvs_data
depth_path = {root}/result/depth
frame_path = {root}/result/frames
match_pair_path = {root}/result/pairs
image_line_path = {root}/result/lines
lidar_path_undistort = {root}/result/undis
data_gap_time = 0.1
time_offset = 0
T_cl = 1 0 0 0 0 1 0 0 0 0 1 0
num_sift = 2048
scale = 0
ncc_half_window = 5
ncc_step = 2
max_depth = 10
{config_overrides}
""")
    return cfg_path, dict(R_wc=np.stack(R_wc_all), C=np.stack(C_all),
                          poses_lidar=poses_l)


def render_panorama(origin_cam, H, W, R_wc=None, **room_kw):
    """Render a synthetic panorama + GT depth from inside the room.

    origin_cam: camera center in CAMERA-CONVENTION world (x right, y down,
    z front); internally converted to the lidar z-up convention used by
    raycast_room. R_wc: optional camera-to-world rotation (camera conv).
    Returns (gray (H,W) float32 in [0,1], depth (H,W) float32)."""
    S = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]], np.float64)  # p_cam = S p_lidar
    rays_c = pano_rays(H, W).reshape(-1, 3)
    if R_wc is not None:
        rays_w_cam = rays_c @ np.asarray(R_wc).T
    else:
        rays_w_cam = rays_c
    rays_l = rays_w_cam @ S            # row form of S^T @ v
    o_l = S.T @ np.asarray(origin_cam, np.float64)
    t = raycast_room(o_l, rays_l, **room_kw)
    t = np.where(np.isfinite(t), t, 0.0)
    hit_l = o_l + rays_l * t[:, None]
    gray = _texture(hit_l).reshape(H, W)
    return gray.astype(np.float32), t.reshape(H, W).astype(np.float32)


def make_trajectory_scans(n_scans=5, step=(0.15, 0.02, 0.0), yaw_step=0.02,
                          noise=0.003, seed=0, origin=(0.0, 0.0, -1.0),
                          sweep_alpha=0.0, body_step=False, **kw):
    """Scans along a straight-ish trajectory. Returns (scans, poses) where
    poses are (R_wl, t_wl) ground truth in the LIDAR (z-up) world frame.

    body_step: apply `step` in the SENSOR frame (t_{i+1} = t_i + R_i step)
    instead of the world frame — with yaw_step != 0 the path is a circle of
    radius |step_xy| / yaw_step, letting a long trajectory loop inside the
    room instead of exiting through a wall (room half-extent is 3 m; a
    454-frame world-frame line leaves the geometry at frame ~75).

    sweep_alpha: fraction of the inter-scan motion covered DURING one sweep
    — simulates spinning-sensor motion distortion. Matches the pipeline /
    reference time model (LidarOdometry.cpp:224: the sweep-end pose sits at
    duration/(duration+gap_time) along the geodesic to the next scan pose),
    so sweep_alpha = duration / (duration + data_gap_time); 0 = instantaneous
    scans (no distortion). Each azimuth column is raycast from the
    interpolated pose and the return is stored in the sensor frame AT FIRING
    TIME — exactly what a real spinning LiDAR records, and exactly what
    UndistortCloud inverts. GT pose = the sweep-START pose.

    Default origin sits near the floor: a VLP-16's +-15 deg fan at room
    center never hits floor or ceiling, leaving vertical translation
    unobservable for LiDAR-only odometry (walls give horizontal normals,
    edges give vertical lines)."""
    rng = np.random.default_rng(seed)
    h_steps = kw.get("h_steps", 1800)
    room_kw = {k: v for k, v in kw.items() if k != "h_steps"}
    dirs = vlp16_directions(h_steps)

    def yaw_R(yaw):
        c, s = np.cos(yaw), np.sin(yaw)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    scans, poses = [], []
    t_cum = np.asarray(origin, np.float64).copy()
    for i in range(n_scans):
        R = yaw_R(yaw_step * i)
        t = t_cum.copy() if body_step \
            else np.asarray(step) * i + np.asarray(origin)
        step_i = R @ np.asarray(step) if body_step else np.asarray(step)
        if body_step:
            t_cum = t_cum + step_i
        if sweep_alpha == 0.0:
            dirs_w = dirs @ R.T
            tt = raycast_room(t, dirs_w, **room_kw)
            dirs_s = dirs
        else:
            # per-point pose at firing time: frac of the sweep elapsed =
            # azimuth index / h_steps (azimuth-major order, start at az=0,
            # the same convention sweep_fraction recovers downstream).
            # Translation interpolates along THIS frame's step (= the
            # chord t_{i+1} - t_i in both step modes), matching the
            # constant-velocity geodesic UndistortCloud inverts.
            frac = np.repeat(np.arange(h_steps) / h_steps, 16)
            a = sweep_alpha * frac
            yaw_f = yaw_step * (i + a)
            cf, sf = np.cos(yaw_f), np.sin(yaw_f)
            t_f = t[None, :] + a[:, None] * step_i[None, :]
            # world ray dir = R_f @ d, R_f = yaw rotation per point
            dx, dy, dz = dirs[:, 0], dirs[:, 1], dirs[:, 2]
            dirs_w = np.stack([cf * dx - sf * dy, sf * dx + cf * dy, dz], -1)
            tt = raycast_room(t_f, dirs_w, **room_kw)
            dirs_s = dirs  # return stored in the instantaneous sensor frame
        ok = np.isfinite(tt)
        pts_l = dirs_s[ok] * tt[ok, None]
        pts_l += rng.normal(size=pts_l.shape) * noise
        scans.append(pts_l.astype(np.float32))
        poses.append((R, t.astype(np.float64)))
    return scans, poses


def make_independent_noise_scene(n_frames=10, n_points=400, H=256, W=512,
                                 sigma_px=0.05, desc_noise=0.01, seed=11):
    """Keypoint-level scene with INDEPENDENT per-view pixel noise.

    The rendered-texture e2e datasets carry COMMON-MODE SIFT localization
    drift (nearby views see nearly the same patch, so their subpixel
    offsets are correlated and act as fake parallax — PERF.md "Accuracy
    ceiling"). This mode breaks that by construction: each view's keypoint
    pixels are the EXACT equirectangular projection of shared 3-D points
    plus i.i.d. pixel noise, so the solver chain's own bias — not the
    measurement correlation — is what an accuracy assertion measures
    (north-star falsifiability, <1e-3 rad / sub-cm).

    Returns dict with uv (N,K,2) pixel keypoints, descs (N,K,128) unit
    descriptors, fmask (N,K), poses_gt (N,6) world->cam [aa|t], pts (K,3).
    """
    rng = np.random.default_rng(seed)
    from scipy.spatial.transform import Rotation as ScR

    pts = rng.uniform(-4, 4, (n_points, 3)).astype(np.float32)
    pts[:, 1] *= 0.4
    aa = np.cumsum(rng.normal(size=(n_frames, 3)) * 0.02, axis=0).astype(np.float32)
    aa[0] = 0
    C = np.cumsum(rng.normal(size=(n_frames, 3))
                  * np.array([0.25, 0.05, 0.25]), axis=0).astype(np.float32)
    C[0] = 0
    R = ScR.from_rotvec(aa).as_matrix().astype(np.float32)
    t = -np.einsum("nij,nj->ni", R, C)

    # exact projection to pixels via the production camera model, then
    # i.i.d. pixel noise per view (the point of this mode)
    import jax.numpy as jnp
    from panovlm_tpu.ops import spherical
    uv = np.zeros((n_frames, n_points, 2), np.float32)
    for i in range(n_frames):
        p_c = pts @ R[i].T + t[i]
        uv_i = np.asarray(spherical.cam_to_image(jnp.asarray(p_c), H, W))
        uv[i] = uv_i + rng.normal(size=uv_i.shape) * sigma_px

    desc_gt = rng.normal(size=(n_points, 128)).astype(np.float32)
    desc_gt /= np.linalg.norm(desc_gt, axis=1, keepdims=True)
    descs = np.zeros((n_frames, n_points, 128), np.float32)
    for i in range(n_frames):
        d = desc_gt + rng.normal(size=desc_gt.shape) * desc_noise
        descs[i] = d / np.linalg.norm(d, axis=1, keepdims=True)
    fmask = np.ones((n_frames, n_points), bool)
    poses_gt = np.concatenate([aa, t], axis=1).astype(np.float32)
    return {"uv": uv, "descs": descs, "fmask": fmask, "poses_gt": poses_gt,
            "pts": pts, "H": H, "W": W}


def seed_sfm_state(cfg, gt, n_points: int = 800, seed: int = 0,
                   noise_px: float = 0.15):
    """Write GT-quality stage-1/2 artifacts (frames.npz, points.npz, pose
    txts) so the joint/colorize/mvs stages can be tested without running
    the sfm/odometry chain first — the suite-splitting device that keeps
    tests/test_pipeline_cli.py (stages 1-2) and tests/test_pipeline_cli_
    late.py (stages 3-5) on different xdist workers (VERDICT r4 weak #6:
    the five-stage file was the suite's serial multi-minute tail).

    Tracks are geometrically exact: world points sampled by back-projecting
    random pixels of the GT depth renders, observations projected into
    every frame and kept only where the GT depth test confirms visibility.
    """
    import os
    from panovlm_tpu.io import artifacts
    from panovlm_tpu.utils import poses as pose_util

    rng = np.random.default_rng(seed)
    R_wc, C = np.asarray(gt["R_wc"]), np.asarray(gt["C"])
    n = len(R_wc)
    import glob
    import cv2
    img0 = cv2.imread(sorted(glob.glob(f"{cfg.image_path}/*.png"))[0], 0)
    H, W = img0.shape
    depths = [render_panorama(C[i], H, W, R_wc=R_wc[i])[1] for i in range(n)]
    rays = pano_rays(H, W)

    # world points from random pixels of each frame's GT depth
    pts_w = []
    per = n_points // n + 1
    for i in range(n):
        yy = rng.integers(H // 5, 4 * H // 5, per)
        xx = rng.integers(0, W, per)
        d = depths[i][yy, xx]
        ok = d > 0.3
        X_cam = rays[yy, xx] * d[:, None]
        pts_w.append((X_cam[ok] @ R_wc[i].T) + C[i])
    X = np.concatenate(pts_w)[:n_points]
    T = len(X)

    # project into every frame; visibility by GT depth agreement
    uv_all = np.zeros((n, T, 2), np.float32)
    vis = np.zeros((n, T), bool)
    for i in range(n):
        Xc = (X - C[i]) @ R_wc[i]
        d = np.linalg.norm(Xc, axis=1)
        theta = np.arccos(np.clip(-Xc[:, 1] / np.maximum(d, 1e-9), -1, 1))
        phi = np.arctan2(Xc[:, 0], Xc[:, 2])
        u = (phi + np.pi) / (2 * np.pi) * W - 0.5
        v = theta / np.pi * H - 0.5
        yi = np.clip(np.round(v).astype(int), 0, H - 1)
        xi = np.clip(np.round(u).astype(int), 0, W - 1)
        d_gt = depths[i][yi, xi]
        vis[i] = (d > 0.3) & (np.abs(d - d_gt) < 0.03 * np.maximum(d_gt, 1))
        uv_all[i] = np.stack([u, v], 1) + rng.normal(0, noise_px, (T, 2))

    keep = vis.sum(0) >= 2
    X, uv_all, vis = X[keep], uv_all[:, keep], vis[:, keep]
    T = len(X)

    # per-frame feature slots; track arrays in export_point_tracks form
    cap = int(cfg.num_sift)
    uv = np.zeros((n, cap, 2), np.float32)
    fmask = np.zeros((n, cap), bool)
    L = n
    track_img = np.zeros((T, L), np.int32)
    track_feat = np.zeros((T, L), np.int32)
    track_mask = np.zeros((T, L), bool)
    counts = np.zeros(n, int)
    for t in range(T):
        li = 0
        for i in range(n):
            if vis[i, t] and counts[i] < cap and li < L:
                f = counts[i]
                uv[i, f] = uv_all[i, t]
                fmask[i, f] = True
                track_img[t, li] = i
                track_feat[t, li] = f
                track_mask[t, li] = True
                counts[i] += 1
                li += 1

    import jax.numpy as jnp
    from panovlm_tpu.ops import spherical
    bearings = np.asarray(spherical.image_to_cam(jnp.asarray(uv), H, W))
    poses = pose_util.world_to_params(R_wc, C)
    frame_valid = np.ones(n, bool)

    os.makedirs(cfg.sfm_result_path, exist_ok=True)
    os.makedirs(cfg.odo_result_path, exist_ok=True)
    artifacts.save_npz(os.path.join(cfg.sfm_result_path, "frames.npz"),
                       uv=uv, fmask=fmask, bearings=bearings, poses=poses,
                       frame_valid=frame_valid, rows=np.asarray([H]),
                       cols=np.asarray([W]))
    artifacts.export_point_tracks(
        os.path.join(cfg.sfm_result_path, "points.npz"),
        track_img, track_feat, track_mask, X.astype(np.float32),
        np.ones(T, bool))
    artifacts.export_pose_t(
        os.path.join(cfg.sfm_result_path, "camera_pose_final.txt"),
        R_wc, C, [f"{i:06d}" for i in range(n)])
    # lidar poses: GT (z-up convention as produced by make_trajectory_scans,
    # stored in the same camera-convention world as the odometry stage does)
    S = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
    R_wl = np.stack([S @ p[0] @ S.T for p in gt["poses_lidar"]])
    t_wl = np.stack([S @ p[1] for p in gt["poses_lidar"]])
    artifacts.export_pose_t(
        os.path.join(cfg.odo_result_path, "lidar_pose_refined.txt"),
        R_wl, t_wl)
    return X
