"""Host-side frame-parallel map — the reference's OpenMP frontend loops.

The reference runs its CPU frontends under `#pragma omp parallel for
num_threads(config.num_threads)` (SIFT extraction sfm/SfM.cpp:23-36, image
line detection joint_optimization/CameraLidarOptimizer.cpp:89-149; Room
profile sets num_threads = 25). The TPU rebuild keeps those stages on host
(they are data prep: cv2 SIFT / LSD), so they get the same treatment: a
process pool over frames, sized min(config.num_threads, host cores).

Workers use the *spawn* start method: the parent typically holds a live
TPU client by the time these stages run, and forking a process with an
initialized PJRT runtime is undefined behavior. Spawned workers only ever
import cv2/numpy work paths.

On a single-core host (this dev box) the pool degrades to the plain serial
loop — no processes are spawned, identical results.
"""

from __future__ import annotations

import os


def pool_workers(num_threads: int = -1) -> int:
    """Effective worker count: config num_threads (-1/0 = all cores) capped
    to the host's cores."""
    cpus = os.cpu_count() or 1
    if num_threads is None or num_threads <= 0:
        return cpus
    return max(1, min(int(num_threads), cpus))


def map_frames(fn, items, num_threads: int = -1, force_workers: int = 0):
    """Map `fn` over `items` (ordered), using a spawn-based process pool
    when more than one worker is effective. `fn` must be a picklable
    module-level callable (use functools.partial for per-run constants).
    `force_workers` overrides the worker count (tests exercise the pool on
    a 1-core host with it)."""
    items = list(items)
    w = force_workers or pool_workers(num_threads)
    w = min(w, max(len(items), 1))
    if w <= 1:
        return [fn(it) for it in items]
    import concurrent.futures as cf
    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    chunk = max(1, len(items) // (4 * w))
    try:
        with cf.ProcessPoolExecutor(max_workers=w, mp_context=ctx) as ex:
            return list(ex.map(fn, items, chunksize=chunk))
    except (cf.process.BrokenProcessPool, OSError) as e:
        # spawn re-imports __main__, which fails for stdin/exec-driven
        # parents (no file to re-run) — degrade to the serial loop
        import logging
        logging.getLogger("panovlm").warning(
            "host pool unavailable (%s); running serial", e)
        return [fn(it) for it in items]
