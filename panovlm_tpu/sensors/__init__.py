"""Sensor models: Velodyne LiDAR frontend, camera frames."""

from . import velodyne  # noqa: F401
