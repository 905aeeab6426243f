"""Gradient-safe numeric primitives shared across the differentiable stack.

``jnp.linalg.norm`` backpropagates ``x / ||x||`` — a 0/0 NaN whenever the
input is exactly zero, even if the *forward* consumer guards with
``maximum(n, eps)`` or selects another branch with ``where`` (the classic
JAX ``where``-gradient trap: both branches are differentiated). Zero inputs
are not exotic here: a contact reference point inside a box geom
(collision._point_box), tangential contact force at rest or on a
zero-Delassus held self-contact row (solver ft_raw), identical mocap
keyframes under slerp (clip interpolation -> to_rotvec of the identity),
a zero joint rotation (from_rotvec). The analytic-policy-gradient trainer
(train/apg.py) backpropagates through all of them every step.
"""

from __future__ import annotations

import jax.numpy as jnp

# Squared-norm floor: inputs with ||x|| <= 1e-6 report norm 0 (their callers
# all guard the direction with maximum(n, eps) anyway). Representable in f32.
_EPS_SQ = 1e-12


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    """L2 norm with a NaN-free gradient everywhere.

    Forward-exact vs ``jnp.linalg.norm`` for ``||x|| > 1e-6``; returns 0.0
    (with zero gradient — the correct subgradient) below that. Both ``where``
    branches are differentiable, so no NaN reaches the backward pass.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    ok = sq > _EPS_SQ
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)
