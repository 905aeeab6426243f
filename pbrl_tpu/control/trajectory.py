"""Cubic joint-space trajectory utilities.

Capability match for the reference's trajectory generator
(``some_math/math_utils.py:75-121``): cubic polynomial coefficients with
zero endpoint velocities, batch initialisation over the actuator set, and
pointwise evaluation. Rebuilt batched-first: coefficients are an ``(nu, 4)``
array and every function broadcasts, so evaluation inside a jitted rollout
is one fused FMA chain.
"""

from __future__ import annotations

import jax.numpy as jnp


def cubic_coefficients(t0, tf, q0, qf) -> jnp.ndarray:
    """(..., 4) coefficients of the cubic reaching q0 -> qf over [t0, tf]
    with zero endpoint velocity: q(t) = a0 + a1 t + a2 t^2 + a3 t^3."""
    t0 = jnp.asarray(t0, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    q0 = jnp.asarray(q0, jnp.float32)
    qf = jnp.asarray(qf, jnp.float32)
    d3 = (tf - t0) ** 3
    a0 = (qf * t0**2 * (3 * tf - t0) + q0 * tf**2 * (tf - 3 * t0)) / d3
    a1 = 6 * t0 * tf * (q0 - qf) / d3
    a2 = 3 * (t0 + tf) * (qf - q0) / d3
    a3 = 2 * (q0 - qf) / d3
    return jnp.stack([a0, a1, a2, a3], axis=-1)


def constant_trajectories(nu: int, value=0.0, t0=1.0, tf=3.0) -> jnp.ndarray:
    """(nu, 4) coefficient table holding ``value`` (the reference's dummy
    initialisation, ``math_utils.py:94-111``, generalised over nu)."""
    return jnp.tile(cubic_coefficients(t0, tf, value, value), (nu, 1))


def set_trajectories(table: jnp.ndarray, indices, coeffs) -> jnp.ndarray:
    """Overwrite rows ``indices`` of a coefficient table."""
    return table.at[jnp.asarray(indices)].set(jnp.asarray(coeffs))


def evaluate(table: jnp.ndarray, t) -> jnp.ndarray:
    """Evaluate all trajectories at scalar (traced) time t -> (nu,)."""
    t = jnp.asarray(t, table.dtype)
    return table[..., 0] + t * (table[..., 1] + t * (table[..., 2] + t * table[..., 3]))


def evaluate_velocity(table: jnp.ndarray, t) -> jnp.ndarray:
    """d/dt of :func:`evaluate` -> (nu,) target joint velocities."""
    t = jnp.asarray(t, table.dtype)
    return table[..., 1] + t * (2 * table[..., 2] + t * 3 * table[..., 3])
