"""Visualization & artifact rendering — util/Visualization.{h,cpp}.

The reference treats visual artifacts as first-class observability
(SURVEY.md §4/§5): depth colormaps, camera pose PLY/PCD markers, LiDAR->
panorama projection overlays, line drawings via geodesic polylines. The
data-path member ProjectLidar2PanoramaDepth lives in ops/spherical.py; the
rest (pure artifact writers) are implemented here with numpy/cv2.
"""

from __future__ import annotations

import numpy as np


def depth_to_color(depth, max_depth: float = 20.0, min_depth: float = 0.0):
    """Gray2Color-style depth colormap -> (H,W,3) uint8 BGR (cv2 JET)."""
    import cv2
    d = np.asarray(depth, np.float32)
    norm = np.clip((d - min_depth) / max(max_depth - min_depth, 1e-6), 0, 1)
    img = (norm * 255).astype(np.uint8)
    color = cv2.applyColorMap(img, cv2.COLORMAP_JET)
    color[d <= 0] = 0
    return color


def normal_to_color(normal):
    """Normal map -> RGB visualization."""
    n = np.asarray(normal)
    return ((n * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)


def camera_centers_pcd(path, poses_params, frame_valid=None, color_t=True):
    """CameraCenterPCD (util/Visualization.h): one point per camera center,
    intensity = time index."""
    from ..io.pointcloud import write_pcd
    from .poses import params_to_world
    R_w, t_w = params_to_world(poses_params)
    C = t_w
    n = len(C)
    valid = np.ones(n, bool) if frame_valid is None else np.asarray(frame_valid)
    inten = (np.arange(n) / max(n - 1, 1)).astype(np.float32)
    write_pcd(path, C[valid].astype(np.float32), intensity=inten[valid])


def camera_pose_ply(path, poses_params, frame_valid=None, scale: float = 0.2):
    """CameraPoseVisualize: small 5-point frustum per camera as PLY points
    with per-axis colored edges collapsed to points (x=red axis tip etc.)."""
    from .poses import params_to_world
    R_w, t_w = params_to_world(poses_params)
    n = len(t_w)
    valid = np.ones(n, bool) if frame_valid is None else np.asarray(frame_valid)
    pts, cols = [], []
    axes = np.eye(3) * scale
    axis_colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    for i in range(n):
        if not valid[i]:
            continue
        pts.append(t_w[i])
        cols.append(np.array([255, 255, 255], np.uint8))
        for a in range(3):
            for s in np.linspace(0.25, 1.0, 4):
                pts.append(t_w[i] + R_w[i] @ axes[a] * s)
                cols.append(axis_colors[a])
    pts = np.asarray(pts, np.float32)
    cols = np.asarray(cols, np.uint8)
    with open(path, "wb") as f:
        f.write((f"ply\nformat binary_little_endian 1.0\n"
                 f"element vertex {len(pts)}\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                 "end_header\n").encode())
        rec = np.zeros(len(pts), dtype=[("xyz", np.float32, 3),
                                        ("rgb", np.uint8, 3)])
        rec["xyz"] = pts
        rec["rgb"] = cols
        f.write(rec.tobytes())


def project_cloud_overlay(gray, points_cam, mask, max_depth: float = 20.0):
    """LiDAR->panorama projection overlay (ProjectLidar2PanoramaRGB-style):
    colored depth dots over the grayscale panorama. Returns (H,W,3) uint8."""
    import cv2
    import jax.numpy as jnp
    from ..ops import spherical
    H, W = gray.shape[:2]
    img = cv2.cvtColor((np.asarray(gray) * 255).astype(np.uint8),
                       cv2.COLOR_GRAY2BGR)
    p = np.asarray(points_cam)[np.asarray(mask)]
    if len(p) == 0:
        return img
    uv = np.asarray(spherical.cam_to_image(jnp.asarray(p), H, W))
    d = np.linalg.norm(p, axis=1)
    inside = (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    norm = np.clip(d / max_depth * 255, 0, 255).astype(np.uint8)
    colors = cv2.applyColorMap(norm[:, None], cv2.COLORMAP_JET)[:, 0]
    for (u, v), c in zip(uv[inside].astype(int), colors[inside]):
        img[v, u] = c
    return img


def draw_panorama_line(img, e1, e2, color=(0, 255, 0), n_samples: int = 64):
    """Draw a great-circle arc on a panorama via geodesic sampling
    (Equirectangular::BreakToSegments semantics incl. seam splitting)."""
    import cv2
    import jax.numpy as jnp
    from ..ops import spherical
    H, W = img.shape[:2]
    ts = np.linspace(0, 1, n_samples)[:, None]
    pts = np.asarray(e1)[None] * (1 - ts) + np.asarray(e2)[None] * ts
    uv = np.asarray(spherical.cam_to_image(jnp.asarray(pts), H, W))
    for a, b in zip(uv[:-1], uv[1:]):
        if abs(a[0] - b[0]) > 0.8 * W:  # seam
            continue
        cv2.line(img, tuple(a.astype(int)), tuple(b.astype(int)), color, 1)
    return img
