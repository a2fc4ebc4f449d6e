"""Time-axis trajectory sharding: ring halo exchange + windowed association.

SURVEY.md §5.7: the reference's "long context" analog is trajectory length
(454-8730 scans, /root/reference/README.md:77-83) with neighbor-window
structure — FindNeighbors forces temporal prev/next neighbors
(lidar_mapping/LidarFeatureAssociate.cpp:19-111) and point-to-line residuals
couple only consecutive scans (util/Optimization.cpp:475). When the scan
axis is sharded across devices, each shard needs its ring-neighbors'
boundary scans to form those temporal pairs — the classic halo pattern.

`ring_halo` moves exactly the window-sized boundary block over the ICI ring
with one `lax.ppermute` inside `shard_map`; `associate_windowed_sharded`
then computes every temporal pair (i, i+d), d = 1..window, with NO global
gather: each device touches only its own scans plus the received halo.
Results are bit-identical to the replicated `associate_all_pairs` on the
same pair list (tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .sharding import DATA_AXIS


def ring_halo_right(x, h: int, axis_name: str = DATA_AXIS):
    """Inside shard_map: append the RIGHT ring-neighbor's first h rows.

    (n_loc, ...) -> (n_loc + h, ...). The ring wraps (the last shard
    receives shard 0's head); callers mask wrapped pairs via the global
    scan count. One ppermute: the block each device sends is exactly the
    halo its left neighbor needs.
    """
    n_dev = jax.lax.psum(1, axis_name)
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    head = jax.lax.slice_in_dim(x, 0, h, axis=0)
    recv = jax.lax.ppermute(head, axis_name, perm)
    return jnp.concatenate([x, recv], axis=0)


def _windowed_pairs_local(batch_halo, poses, g0, n_loc: int, window: int,
                          n_scans, bidirectional: bool = False):
    """Associate every temporal pair (g, g+d), d=1..window, for the n_loc
    scans owned by this shard. batch_halo: feature dict with leading axis
    n_loc + window (right halo attached). poses replicated (N, 6).
    Returns (assoc pytree, pair_r, pair_n, pair_valid), leading axis
    n_loc * window (x2 when bidirectional: the reversed-role pairs
    (g+d, g) follow the forward block — association is asymmetric, so the
    production neighbor graph needs both directions,
    LidarFeatureAssociate.cpp:19-111 adds (i,j) and (j,i) separately)."""
    from ..models import association

    li = jnp.repeat(jnp.arange(n_loc), window)             # local ref index
    dd = jnp.tile(jnp.arange(1, window + 1), n_loc)        # temporal delta
    lr, ln = li, li + dd                                   # local roles
    if bidirectional:
        lr = jnp.concatenate([li, li + dd])
        ln = jnp.concatenate([li + dd, li])
    pair_r = g0 + lr
    pair_n = g0 + ln
    pair_valid = jnp.maximum(pair_r, pair_n) < n_scans     # wrap/pad masked

    def one(args):
        l, ld, pr, pn, ok = args
        fr = jax.tree_util.tree_map(lambda a: a[l], batch_halo)
        fn = jax.tree_util.tree_map(lambda a: a[ld], batch_halo)
        # clip pose rows for wrapped pairs; their outputs are masked out
        pr_c = jnp.clip(pr, 0, poses.shape[0] - 1)
        pn_c = jnp.clip(pn, 0, poses.shape[0] - 1)
        p2l = association.associate_point2line_pair(
            fr, fn, poses[pr_c], poses[pn_c])
        p2p = association.associate_point2plane_pair(
            fr, fn, poses[pr_c], poses[pn_c])
        l2l = association.associate_line2line_pair(p2l, fr, fn)
        p2l.pop("seg_n"); p2l.pop("seg_n_valid"); p2l.pop("seg_r")
        for fam in (p2l, p2p, l2l):
            fam["mask"] = fam["mask"] & ok
        return {"p2l": p2l, "p2p": p2p, "l2l": l2l}

    assoc = jax.lax.map(one, (lr, ln, pair_r, pair_n, pair_valid),
                        batch_size=8)
    return assoc, pair_r, pair_n, pair_valid


def associate_windowed_sharded(batch, poses, n_scans: int, window: int,
                               mesh, axis_name: str = DATA_AXIS,
                               bidirectional: bool = False):
    """Temporal-window association over a scan-sharded trajectory.

    batch: stacked per-scan feature dict, leading axis N (padded to a
    multiple of the mesh size; feature masks already encode validity).
    poses (N, 6) replicated. Returns (assoc, pair_r, pair_n, pair_valid)
    with leading axis N * window (x2 when bidirectional: each shard emits
    its forward pairs then its reversed-role pairs), matching
    `associate_all_pairs(batch, poses, pair_r, pair_n)` restricted by
    pair_valid.

    Communication: one ppermute of the window-sized feature block per
    shard — O(window / n_loc) of the feature bytes, independent of
    trajectory length. Device programs never see the full scan stack.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    N = jax.tree_util.tree_leaves(batch)[0].shape[0]
    n_dev = mesh.devices.size
    assert N % n_dev == 0, f"scan axis {N} must pad to mesh size {n_dev}"
    n_loc = N // n_dev
    assert n_loc >= window, (
        f"shard owns {n_loc} scans < window {window}: halo would span "
        f"multiple shards — lower the window or use fewer devices")

    in_specs = (jax.tree_util.tree_map(lambda _: P(axis_name), batch),
                P())
    out_specs = (jax.tree_util.tree_map(lambda _: P(axis_name),
                                        _dummy_assoc_spec(batch)),
                 P(axis_name), P(axis_name), P(axis_name))

    @functools.partial(shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs)
    def run(batch_loc, poses_rep):
        g0 = jax.lax.axis_index(axis_name) * n_loc
        halo = jax.tree_util.tree_map(
            lambda a: ring_halo_right(a, window, axis_name), batch_loc)
        return _windowed_pairs_local(halo, poses_rep, g0, n_loc, window,
                                     n_scans, bidirectional=bidirectional)

    return jax.jit(run)(batch, jnp.asarray(poses, jnp.float32))


def _dummy_assoc_spec(batch):
    """Shape-only evaluation of one pair's association output, used to
    build the out_specs pytree without running any association."""
    from ..models import association

    def one_pair():
        fr = jax.tree_util.tree_map(lambda a: a[0], batch)
        p2l = association.associate_point2line_pair(
            fr, fr, jnp.zeros(6), jnp.zeros(6))
        p2p = association.associate_point2plane_pair(
            fr, fr, jnp.zeros(6), jnp.zeros(6))
        l2l = association.associate_line2line_pair(p2l, fr, fr)
        p2l.pop("seg_n"); p2l.pop("seg_n_valid"); p2l.pop("seg_r")
        return {"p2l": p2l, "p2p": p2p, "l2l": l2l}

    shp = jax.eval_shape(one_pair)
    return shp
