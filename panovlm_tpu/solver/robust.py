"""Robust loss functions (Ceres-compatible definitions).

rho(s) operates on the squared residual norm s = ||r||^2, following Ceres'
convention, so HuberLoss(delta) here matches ceres::HuberLoss(delta) as used
by the reference (e.g. Huber(4 deg) for reprojection, Huber(2 deg)/0.2 m for
LiDAR residuals — util/Optimization.cpp:104-110,231-236,451-455).

The solver uses IRLS: residuals and Jacobians are scaled by
sqrt(rho'(s)) evaluated at the current iterate (with gradients stopped),
which reproduces the Gauss-Newton approximation of the robustified problem.
"""

from __future__ import annotations

import jax.numpy as jnp

TRIVIAL = "trivial"
HUBER = "huber"
SOFT_L1 = "soft_l1"
CAUCHY = "cauchy"


def rho(loss: str, s, scale: float):
    """Loss value rho(s); s = squared norm."""
    a2 = scale * scale
    if loss == TRIVIAL:
        return s
    if loss == HUBER:
        # ceres: rho(s) = s if s <= a^2 else 2a sqrt(s) - a^2
        return jnp.where(s <= a2, s, 2.0 * scale * jnp.sqrt(jnp.maximum(s, 1e-30)) - a2)
    if loss == SOFT_L1:
        # ceres: rho(s) = 2 a^2 (sqrt(1 + s/a^2) - 1)
        return 2.0 * a2 * (jnp.sqrt(1.0 + s / a2) - 1.0)
    if loss == CAUCHY:
        return a2 * jnp.log1p(s / a2)
    raise ValueError(f"unknown loss {loss}")


def rho_prime(loss: str, s, scale: float):
    """rho'(s) — the IRLS weight is sqrt(rho'(s))."""
    a2 = scale * scale
    if loss == TRIVIAL:
        return jnp.ones_like(s)
    if loss == HUBER:
        return jnp.where(s <= a2, 1.0, scale / jnp.sqrt(jnp.maximum(s, 1e-30)))
    if loss == SOFT_L1:
        return 1.0 / jnp.sqrt(1.0 + s / a2)
    if loss == CAUCHY:
        return 1.0 / (1.0 + s / a2)
    raise ValueError(f"unknown loss {loss}")
