"""Core batched array ops: SE(3)/SO(3), spherical camera model, geometry fits."""

from . import se3, spherical, geometry  # noqa: F401
