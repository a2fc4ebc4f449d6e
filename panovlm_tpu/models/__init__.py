"""Workload stages: SfM, LiDAR odometry, joint optimization, MVS, texture."""
