"""Point-cloud colorization — the reference's colorize_lidar_map stage.

Replaces mvs/Texture.{h,cpp} (reference): ColorizeLidarPointCloud transforms
each scan into its nearest frame's camera via the current poses, projects
through the equirectangular model, samples RGB, and FuseCloud merges scans
(main.cpp:524-551 call path). Distance/occlusion gating mirrors the
reference's (max distance, view-angle threshold) arguments
Texture::ColorizeLidarPointCloud(1.5, 35).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import se3, spherical


@functools.partial(jax.jit, static_argnames=())
def colorize_points(points_w, mask, image, pose_cw, max_dist: float = 35.0):
    """Sample image color for world points seen from one camera.

    points_w (P,3); image (H,W) gray or (H,W,3) rgb; pose_cw (6,).
    Returns (colors (P,C), ok (P,))."""
    H, W = image.shape[:2]
    R = se3.exp_so3(pose_cw[:3])
    p_c = points_w @ R.T + pose_cw[3:]
    dist = jnp.linalg.norm(p_c, axis=-1)
    uv = spherical.cam_to_image(p_c, H, W)
    col = spherical.bilinear_sample(image, uv)
    ok = mask & (dist > 0.1) & (dist < max_dist)
    if col.ndim == 1:
        col = col[:, None]
    return jnp.where(ok[:, None], col, 0.0), ok


@jax.jit
def _colorize_all(scans_pts, scans_mask, lidar_poses, images, cam_poses,
                  cam_idx, cam_near, max_dist):
    """One device program for every scan: lax.map keeps the per-scan gather
    tensors one-scan sized while running all N scans per dispatch — the
    per-scan host loop cost a dispatch+sync tunnel round trip per scan
    (~1.3 s/scan at Room-454 => 592 s colorize phase)."""
    from .association import to_world

    def body(args):
        pts, m, lp, j, near = args
        p_w = to_world(lp, pts)
        pose = cam_poses[j]
        image = images[j]
        H, W = image.shape[:2]
        R = se3.exp_so3(pose[:3])
        p_c = p_w @ R.T + pose[3:]
        dist = jnp.linalg.norm(p_c, axis=-1)
        uv = spherical.cam_to_image(p_c, H, W)
        col = spherical.bilinear_sample(image, uv)
        if col.ndim == 1:
            col = col[:, None]
        ok = m & (dist > 0.1) & (dist < max_dist) & near
        return p_w, jnp.where(ok[:, None], col, 0.0), ok

    return jax.lax.map(
        body, (scans_pts, scans_mask, lidar_poses, cam_idx, cam_near))


def colorize_lidar_map(scans_pts, scans_mask, lidar_poses, images, cam_poses,
                       nearest_dist: float = 1.5, max_dist: float = 35.0):
    """ColorizeLidarPointCloud (mvs/Texture.cpp): each scan is colorized from
    its nearest camera (by center distance, must be < nearest_dist).

    scans_pts (N,P,3) local scans; lidar_poses (N,6) [aa_lw,t_lw];
    images list/array of (H,W[,3]); cam_poses (M,6) [aa_cw,t_cw].
    Returns (points_w (N*P,3), colors (N*P,C), mask)."""
    from .association import scan_centers
    lidar_poses = jnp.asarray(np.asarray(lidar_poses))
    cam_poses = jnp.asarray(np.asarray(cam_poses))
    # nearest-camera selection on host: O(N*M) centers, control plane
    C_l = np.asarray(scan_centers(lidar_poses))
    R_c = se3.exp_so3(cam_poses[:, :3])
    C_c = np.asarray(-se3.einsum("nji,nj->ni", R_c, cam_poses[:, 3:]))
    d = np.linalg.norm(C_c[None, :] - C_l[:, None], axis=-1)   # (N, M)
    cam_idx = np.argmin(d, axis=1).astype(np.int32)
    cam_near = d[np.arange(len(C_l)), cam_idx] <= nearest_dist
    pts, col, ok = _colorize_all(
        jnp.asarray(np.asarray(scans_pts)), jnp.asarray(np.asarray(scans_mask)),
        lidar_poses, jnp.asarray(np.asarray(images)), cam_poses,
        jnp.asarray(cam_idx), jnp.asarray(cam_near),
        jnp.float32(max_dist))
    P = pts.shape[1]
    N = pts.shape[0]
    return (pts.reshape(N * P, 3), col.reshape(N * P, -1), ok.reshape(N * P))


def fuse_cloud(points, colors, mask, leaf: float = 0.04):
    """FuseCloud (mvs/Texture.cpp): voxel-merge the colorized cloud."""
    from ..sensors.velodyne import voxel_downsample
    return voxel_downsample(points, mask, aux=colors, leaf=leaf)
