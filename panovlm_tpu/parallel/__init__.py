"""Multi-chip scale-out over a jax Mesh (ICI collectives via sharding).

The reference's only parallelism is single-node OpenMP over frames/scans/
pairs (SURVEY.md §2.8). The TPU-native equivalent: a 1-D device mesh over
the data axis (frames / scan pairs / residual observations), parameters
(poses, structure) replicated, XLA inserting psum/all-gather for the
normal-equation reductions in the LM solver. DCN-free: everything rides ICI.
"""

from .sharding import (make_mesh, pad_leading_to_multiple,  # noqa: F401
                       replicated, shard_blocks, shard_leading_axis)
