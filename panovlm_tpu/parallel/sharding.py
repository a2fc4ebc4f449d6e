"""Mesh construction and sharding helpers.

Design (maps SURVEY.md §2.8's OpenMP table to TPU):
  * axis "data": embarrassingly-parallel work items — residual observations,
    scan pairs, frames (MVS depth maps). All big arrays shard their leading
    axis here.
  * parameters (poses (N,6), points (P,3), scales) are replicated; JtJ / Jtr
    reductions in solver/lm.py contract over the data axis, so XLA lowers
    them to psum over ICI automatically under jit-with-shardings.

No shard_map is required for correctness: solve_lm is pure array code, so
placing sharded inputs + replicated params under one jit yields the SPMD
program directly (the "How to Scale Your Model" recipe: pick mesh, annotate,
let XLA insert collectives).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_leading_axis(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Place every array in the pytree with its leading axis sharded."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicated(tree, mesh: Mesh):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


def shard_blocks(blocks, mesh: Mesh, axis: str = DATA_AXIS):
    """Shard solver ResidualBlocks' observation axes over the mesh.

    Pads every block's per-observation arrays (indices, data, weight, mask)
    to a multiple of the mesh size — masks pad False, so padded rows
    contribute nothing — and places them with the leading axis sharded.
    Parameter groups stay replicated; under jit the JtJ/Jtr contractions in
    solver/lm.py then lower to psum over the mesh (SURVEY.md §2.8: the
    multi-chip form of Ceres' threaded normal-equation assembly,
    util/Optimization.cpp:615,661)."""
    import jax.numpy as jnp
    n_dev = mesh.devices.size
    out = []
    for b in blocks:
        arrs = pad_leading_to_multiple(
            (b.indices, b.data, b.weight, b.mask), n_dev)
        idx, data, w, m = shard_leading_axis(
            jax.tree_util.tree_map(jnp.asarray, arrs), mesh, axis)
        out.append(type(b)(b.fn, b.groups, idx, data, w, m,
                           b.loss, b.loss_scale, b.name))
    return tuple(out)


def pad_leading_to_multiple(tree, multiple: int):
    """Pad leading axes to a multiple (so they shard evenly); masks in the
    tree must already encode validity — padding adds False/0 rows."""
    def pad(x):
        n = x.shape[0]
        target = ((n + multiple - 1) // multiple) * multiple
        if target == n:
            return x
        pad_width = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)
    return jax.tree_util.tree_map(pad, tree)
