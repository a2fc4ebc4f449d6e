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
    host bytes, logs the itemized plan, raises MemoryError when
    slack * total_plan exceeds limit_frac of physical RAM. `slack` covers
    transient copies (np.stack, device transfers buffers)."""
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
    if slack * total > limit_frac * avail:
        raise MemoryError(
            f"stage {stage}: planned host arrays need "
            f"{slack * total / 2**30:.1f} GB (incl. {slack}x transient "
            f"slack) but only {limit_frac * avail / 2**30:.1f} GB of RAM is "
            f"budgeted. Itemized plan: {lines}. Reduce the working "
            f"resolution (config scale), the frame count, or run the stage "
            f"on a larger host.")
    return total
