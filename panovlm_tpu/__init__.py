"""panovlm_tpu — a TPU-native panoramic-camera + LiDAR mapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
3dv-casia/PanoVLM (reference: /root/reference, C++14/OpenMP/Ceres):
five-stage offline pipeline fusing unsynchronized equirectangular
images and Velodyne VLP-16 scans into globally consistent camera+LiDAR
poses and a dense colored map.

Stages (mirrors reference main.cpp:61-84):
    init_camera_pose   -> LiDAR-assisted global SfM
    init_lidar_pose    -> multi-scan LiDAR odometry + undistortion
    joint_optimization -> camera-LiDAR joint refinement
    colorize_lidar_map -> point-cloud colorization
    joint_mvs          -> panoramic PatchMatch MVS

Design: struct-of-arrays state with validity masks, pure functions,
batched array programs under jit, Pallas kernels for hot loops,
sharding over a jax Mesh for multi-chip scale-out.
"""

__version__ = "0.1.0"
