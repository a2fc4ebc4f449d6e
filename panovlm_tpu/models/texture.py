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


def colorize_lidar_map(scans_pts, scans_mask, lidar_poses, images, cam_poses,
                       nearest_dist: float = 1.5, max_dist: float = 35.0):
    """ColorizeLidarPointCloud (mvs/Texture.cpp): each scan is colorized from
    its nearest camera (by center distance, must be < nearest_dist).

    scans_pts (N,P,3) local scans; lidar_poses (N,6) [aa_lw,t_lw];
    images list/array of (H,W[,3]); cam_poses (M,6) [aa_cw,t_cw].
    Returns (points_w (N*P,3), colors (N*P,C), mask)."""
    from .association import to_world, scan_centers
    lidar_poses = jnp.asarray(lidar_poses)
    cam_poses = jnp.asarray(cam_poses)
    C_l = np.asarray(scan_centers(lidar_poses))
    R_c = se3.exp_so3(cam_poses[:, :3])
    C_c = np.asarray(-se3.einsum("nji,nj->ni", R_c, cam_poses[:, 3:]))
    out_pts, out_col, out_msk = [], [], []
    images = jnp.asarray(images)
    for i in range(len(scans_pts)):
        d = np.linalg.norm(C_c - C_l[i], axis=1)
        j = int(np.argmin(d))
        p_w = to_world(lidar_poses[i], jnp.asarray(scans_pts[i]))
        m = jnp.asarray(scans_mask[i])
        if d[j] > nearest_dist:
            n_ch = 1 if images.ndim == 3 else images.shape[-1]
            col = jnp.zeros((p_w.shape[0], n_ch))
            ok = jnp.zeros((p_w.shape[0],), bool)
        else:
            col, ok = colorize_points(p_w, m, images[j], cam_poses[j],
                                      max_dist)
        out_pts.append(p_w)
        out_col.append(col)
        out_msk.append(ok & m)
    return (jnp.concatenate(out_pts), jnp.concatenate(out_col),
            jnp.concatenate(out_msk))


def fuse_cloud(points, colors, mask, leaf: float = 0.04):
    """FuseCloud (mvs/Texture.cpp): voxel-merge the colorized cloud."""
    from ..sensors.velodyne import voxel_downsample
    return voxel_downsample(points, mask, aux=colors, leaf=leaf)
