"""Unrolled small-matrix SPD solvers shaped for the TPU VPU.

``jax.scipy.linalg.cho_factor`` lowers to XLA's generic blocked Cholesky
(``while``-loop based, designed for large matrices); for the humanoid's
34x34 mass matrix batched over thousands of envs it is catastrophically slow
on TPU — measured >10x the cost of the entire rest of the physics substep.

These replacements unroll the factorisation across the (static, small) nv
dimension: each of the n steps is a masked rank-1 update / FMA over the full
``(..., n, n)`` or ``(..., n)`` tensor, so under ``vmap`` every step is one
large regular VPU op over the env batch with no data-dependent control flow.
FLOP count is ~2x the textbook algorithm (masks discard half the work) —
irrelevant next to the win of keeping the batch dense and loop-free.

Used by the integrator (``engine/forward.py``) and Stable PD
(``control/pd.py``) — the same (M + h D) solves the reference performed via
``cho_factor/cho_solve`` (``pds_controllers_agents.py:124-130``) and
``jp.linalg.solve`` (``pds_controllers_mjx.py:150``).
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_factor(a: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular L with ``L @ L.T = a`` for SPD ``a`` (..., n, n).

    Fully unrolled over n; safe under vmap/jit. No pivoting (SPD assumed);
    diagonal is clamped at a tiny floor so a marginally indefinite input
    (f32 roundoff) cannot produce NaNs.
    """
    n = a.shape[-1]
    idx = jnp.arange(n)
    l = jnp.zeros_like(a)
    work = a
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(work[..., j, j], 1e-12))
        col = work[..., :, j] / d[..., None]          # (..., n)
        col = jnp.where(idx >= j, col, 0.0)           # rows < j are done
        l = l.at[..., :, j].set(col)
        below = jnp.where(idx > j, col, 0.0)
        work = work - below[..., :, None] * below[..., None, :]
    return l


def _solve_lower(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b by unrolled forward substitution (columns of L)."""
    n = l.shape[-1]
    y = jnp.zeros_like(b)
    r = b
    for j in range(n):
        yj = r[..., j] / l[..., j, j]
        y = y.at[..., j].set(yj)
        # eliminate column j from the remaining residual (rows > j only,
        # which is automatic: L is strictly lower there, zero above).
        r = r - l[..., :, j] * yj[..., None]
    return y


def _solve_upper_t(l: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = y by unrolled backward substitution (rows of L)."""
    n = l.shape[-1]
    x = jnp.zeros_like(y)
    r = y
    for j in reversed(range(n)):
        xj = r[..., j] / l[..., j, j]
        x = x.at[..., j].set(xj)
        r = r - l[..., j, :] * xj[..., None]
    return x


def cholesky_solve(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = b given a factor from :func:`cholesky_factor`."""
    return _solve_upper_t(l, _solve_lower(l, b))


def solve_spd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD system a x = b (..., n, n) @ (..., n)."""
    return cholesky_solve(cholesky_factor(a), b)
