"""Batched Gauss-Newton / Levenberg-Marquardt solver replacing Ceres.

The reference builds every optimization in the system through Ceres autodiff
functors (base/CostFunction.h) assembled by util/Optimization.cpp. Here the
same problems are expressed as ResidualBlocks (vmapped residual functions +
index arrays into parameter groups) and solved by an LM loop that runs
entirely on device: matrix-free JtJ products via jvp/vjp, block-Jacobi
preconditioned CG, IRLS robust-loss weighting.
"""

from .lm import (ResidualBlock, LMOptions, SchurSpec, make_schur_spec,  # noqa: F401
                 bucket_schur_points, solve_lm, solve_lm_chunked)
from .two_view import two_view_refine  # noqa: F401
from . import residuals, robust  # noqa: F401
from . import l1_admm  # noqa: F401
