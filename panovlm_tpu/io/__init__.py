"""File formats and persistence (stage-file checkpoint contract)."""

from . import pointcloud  # noqa: F401
