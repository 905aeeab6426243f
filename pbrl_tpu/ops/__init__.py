"""TPU-shaped ops: custom linear algebra (and, later, Pallas kernels)."""

from pbrl_tpu.ops.linalg import (  # noqa: F401
    cholesky_factor,
    cholesky_solve,
    solve_spd,
)
