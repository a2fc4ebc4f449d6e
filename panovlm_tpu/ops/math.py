"""Scalar math kernels — base/Math.h (reference).

fast_atan2: the reference's polynomial atan2 (base/Math.h:16-29, ~3x faster
than libm on CPU with ~0.3 deg error), used throughout its Equirectangular
projections (USE_FAST_ATAN2). On TPU the exact atan2 is a cheap VPU
transcendental, so the production camera model uses the exact form
(ops/spherical.py); this batched implementation exists for numerical parity
experiments against reference outputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def square(x):
    return x * x


def fast_atan2(y, x):
    """Polynomial atan2 approximation (reference FastAtan2 semantics:
    atan(z) ~ pi/4 z + 0.273 z (1 - |z|) on the primary octant, quadrant
    fixups) — max error ~0.005 rad."""
    abs_y = jnp.abs(y)
    abs_x = jnp.abs(x)
    mx = jnp.maximum(abs_x, abs_y)
    mn = jnp.minimum(abs_x, abs_y)
    z = mn / jnp.where(mx > 0, mx, 1.0)
    a = (jnp.pi / 4) * z + 0.273 * z * (1.0 - z)
    a = jnp.where(abs_y > abs_x, jnp.pi / 2 - a, a)
    a = jnp.where(x < 0, jnp.pi - a, a)
    a = jnp.where(y < 0, -a, a)
    return jnp.where((x == 0) & (y == 0), 0.0, a)
