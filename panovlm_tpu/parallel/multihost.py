"""Multi-host / DCN scale-out (SURVEY.md §5.8, §2.8 "absent" row).

The reference runs on one workstation; its cluster story is OpenMP. The
TPU-native scale-out has two tiers:

  * ICI (within a slice): the data-axis mesh in `sharding.py` — global
    solves contract JtJ/Jtr over ICI psum, the halo ring in `halo.py`
    moves scan windows with ppermute.
  * DCN (across hosts / pod slices): ONLY embarrassingly-parallel
    per-frame work fans out over DCN — MVS depth maps, feature
    extraction, per-pair matching (SURVEY.md §2.8: "the rebuild's DCN
    story is optional scale-out of embarrassingly-parallel stages").
    Global solves stay inside one slice; DCN never carries a solver
    collective.

This module provides the three pieces:
  * `initialize_distributed()` — idempotent `jax.distributed.initialize`
    wrapper, gated on the standard env contract (JAX_COORDINATOR_ADDRESS
    / JAX_NUM_PROCESSES / JAX_PROCESS_ID) so single-process runs are a
    no-op.
  * `make_hybrid_mesh(ici_axis, dcn_axis)` — a 2-D (dcn, ici) mesh via
    mesh_utils.create_hybrid_device_mesh when >1 slice/host is present,
    degenerate dcn=1 mesh otherwise; ICI-heavy axes go on the inner
    (contiguous) axis so solver collectives never touch DCN.
  * `process_slice(n_items)` — the static per-process partition of a
    frame/pair/scan list. Pure function of (n, process_index,
    process_count): each host computes its own contiguous chunk, runs the
    per-frame stage on its local devices, and the driver merges artifacts
    through the shared filesystem contract (io/artifacts.py) exactly as
    the reference's stages communicate through result/ directories.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from .sharding import DATA_AXIS

FRAME_AXIS = "frame"  # DCN axis: per-frame fan-out only

_initialized = False


def initialize_distributed() -> bool:
    """Initialize jax.distributed from the env contract; no-op otherwise.

    Env contract (the standard JAX multi-process triplet):
      JAX_COORDINATOR_ADDRESS=host:port  JAX_NUM_PROCESSES=N  JAX_PROCESS_ID=i
    Returns True iff running multi-process after the call. Idempotent —
    safe to call from every stage entry point.
    """
    global _initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if coord and n > 1 and not _initialized:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=n,
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        _initialized = True
    return jax.process_count() > 1


def make_hybrid_mesh(ici_axis: str = DATA_AXIS,
                     dcn_axis: str = FRAME_AXIS,
                     devices=None) -> Mesh:
    """(dcn, ici) mesh: DCN-connected granules on the outer axis, ICI on
    the inner. Single-host: degenerate (1, n_devices) mesh with identical
    axis names, so stage code is written once against the 2-D mesh and
    runs everywhere. Shard solver data over `ici_axis` only; shard frame
    batches over `dcn_axis` only (no collective ever crosses it).
    """
    devs = list(devices) if devices is not None else jax.devices()
    n_proc = jax.process_count()
    if n_proc > 1 and devices is None:
        from jax.experimental import mesh_utils
        per = len(devs) // n_proc
        dmesh = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per), dcn_mesh_shape=(n_proc, 1))
        return Mesh(dmesh, (dcn_axis, ici_axis))
    return Mesh(np.asarray(devs).reshape(1, len(devs)), (dcn_axis, ici_axis))


def process_slice(n_items: int, process_index: int | None = None,
                  process_count: int | None = None) -> slice:
    """Contiguous per-host chunk of an n_items frame/pair list.

    Deterministic balanced split (first `rem` hosts get one extra item) —
    every host computes the same partition without communicating, the
    DCN-tier analog of the reference's `#pragma omp for` static schedule.
    """
    p = jax.process_index() if process_index is None else process_index
    k = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_items, k)
    start = p * base + min(p, rem)
    stop = start + base + (1 if p < rem else 0)
    return slice(start, stop)
