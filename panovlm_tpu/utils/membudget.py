"""Host-memory budget assertions — fail in seconds, not at hour two.

The reference keeps its working set bounded with a ref-counted image cache
(mvs/MVS.h:89-101); the rebuild's residency plan does the same on the
device side (HBM chunking, models/mvs.py) but the HOST side historically
went unbudgeted: the first Room-454 profile run peaked at 82.6 GB RSS and
died mid-MVS after two hours. Each pipeline stage now declares its
expected dominant host arrays up front; if the plan exceeds the machine,
the stage raises immediately with the itemized plan so the operator can
lower the resolution / frame window instead of discovering the limit at
the filter pass.
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger("panovlm")


def host_total_bytes() -> int:
    try:
        return (os_sysconf("SC_PAGE_SIZE") * os_sysconf("SC_PHYS_PAGES"))
    except (ValueError, OSError):
        return 1 << 62


def os_sysconf(name):
    import os
    return os.sysconf(name)


def assert_host_budget(stage: str, plan: dict, limit_frac: float = 0.85,
                       slack: float = 1.5):
    """plan: {name: (shape tuple, dtype)}. Computes the expected dominant
    host bytes and logs the itemized plan. Raises MemoryError only when
    the PLAN ALONE exceeds limit_frac of physical RAM (certain failure);
    the borderline band — plan fits but slack * plan does not (`slack`
    covers transient copies: np.stack, transfer buffers) — gets a loud
    warning instead, so near-limit runs that completed before budgets
    existed still start. PANOVLM_IGNORE_HOST_BUDGET=1 downgrades even the
    hard failure to a warning (operator override)."""
    import os
    items = []
    total = 0
    for name, (shape, dtype) in plan.items():
        nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
        items.append((name, shape, nbytes))
        total += nbytes
    avail = host_total_bytes()
    lines = ", ".join(f"{n} {tuple(s)} = {b / 2**30:.2f} GB"
                      for n, s, b in items)
    log.info("host budget [%s]: %.2f GB planned (x%.1f slack) of %.1f GB "
             "RAM — %s", stage, total / 2**30, slack, avail / 2**30, lines)
    override = os.environ.get("PANOVLM_IGNORE_HOST_BUDGET") == "1"
    if total > limit_frac * avail and not override:
        raise MemoryError(
            f"stage {stage}: planned host arrays need {total / 2**30:.1f} "
            f"GB but only {limit_frac * avail / 2**30:.1f} GB of RAM is "
            f"budgeted. Itemized plan: {lines}. Reduce the working "
            f"resolution (config scale), the frame count, run on a larger "
            f"host, or set PANOVLM_IGNORE_HOST_BUDGET=1 to proceed anyway.")
    if slack * total > limit_frac * avail:
        log.warning(
            "host budget [%s]: plan fits RAM but x%.1f transient slack "
            "does not (%.1f GB > %.1f GB) — the stage may OOM under "
            "transient copies", stage, slack, slack * total / 2**30,
            limit_frac * avail / 2**30)
    return total


def device_total_bytes() -> int:
    """HBM capacity of device 0; 16 GiB (v5e) when the backend does not
    report memory stats (e.g. the CPU backend used by the test mesh)."""
    try:
        import jax
        stats = jax.devices()[0].memory_stats() or {}
        v = int(stats.get("bytes_limit", 0))
        if v > 0:
            return v
    except Exception:
        pass
    return 16 << 30


def assert_device_budget(stage: str, plan: dict, limit_frac: float = 0.85):
    """Device-HBM analog of assert_host_budget for the stages that pin a
    whole-trajectory stack in HBM (MVS filter/fuse packed quads — the
    round-4 profile run died RESOURCE_EXHAUSTED at the filter pass two
    hours in; this fails the run in seconds instead, VERDICT r4 item 5/7).
    plan: {name: (shape, dtype)}. PANOVLM_IGNORE_DEVICE_BUDGET=1
    downgrades to a warning."""
    import os
    items = []
    total = 0
    for name, (shape, dtype) in plan.items():
        nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
        items.append((name, shape, nbytes))
        total += nbytes
    avail = device_total_bytes()
    lines = ", ".join(f"{n} {tuple(s)} = {b / 2**30:.2f} GB"
                      for n, s, b in items)
    log.info("device budget [%s]: %.2f GB planned of %.1f GB HBM — %s",
             stage, total / 2**30, avail / 2**30, lines)
    if total > limit_frac * avail and \
            os.environ.get("PANOVLM_IGNORE_DEVICE_BUDGET") != "1":
        raise MemoryError(
            f"stage {stage}: planned device-resident arrays need "
            f"{total / 2**30:.1f} GB but only {limit_frac * avail / 2**30:.1f}"
            f" GB of HBM is budgeted. Itemized plan: {lines}. Reduce the "
            f"working resolution (config scale) or the frame count, or set "
            f"PANOVLM_IGNORE_DEVICE_BUDGET=1 to proceed anyway.")
    return total
