"""Batched 6D spatial-vector algebra (Featherstone), world-origin Plücker frame.

All spatial quantities are expressed in **world coordinates at the world
origin** — a deliberate TPU-first choice: it removes per-body coordinate
transforms from the inner dynamics loops, so CRBA / RNEA become masked batched
einsums over a ``(nbody, 6)``/``(nv, 6)`` axis instead of sequential frame
conversions. Per-env matrices are tiny (nv ≈ 34); the batch dimension supplies
the parallelism and the einsums lower to MXU-friendly batched GEMMs.

Layout: a spatial *motion* vector is ``[omega(3), v(3)]`` where ``v`` is the
linear velocity of the body-fixed point currently coincident with the world
origin. A spatial *force* vector is ``[torque-about-origin(3), force(3)]``.

The reference delegates all of this to MuJoCo's C engine (``mjx.step`` /
``mj_fullM``, see SURVEY.md §2.2); these are the from-scratch equivalents.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix ``[v]x`` of shape (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def inertia_at_origin(mass: jnp.ndarray, com: jnp.ndarray, inertia_c: jnp.ndarray) -> jnp.ndarray:
    """Spatial inertia (..., 6, 6) about the world origin.

    Args:
      mass: (...,) body mass.
      com: (..., 3) world-frame centre of mass.
      inertia_c: (..., 3, 3) world-frame rotational inertia about the com.

    ``I = [[I_c + m cx cx^T, m cx], [m cx^T, m 1]]`` with ``cx = skew(com)``.
    """
    cx = skew(com)
    m = mass[..., None, None]
    top_left = inertia_c + m * cx @ jnp.swapaxes(cx, -1, -2)
    top_right = m * cx
    bot_left = m * jnp.swapaxes(cx, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3), cx.shape)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product ``v x m`` for motion vectors (..., 6)."""
    w, vl = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, ml) + jnp.cross(vl, mw)], axis=-1
    )


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product ``v x* f`` for force vectors (..., 6)."""
    w, vl = v[..., :3], v[..., 3:]
    ft, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, ft) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def point_velocity(v: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Linear velocity of a world-frame ``point`` on a body with motion ``v``."""
    return v[..., 3:] + jnp.cross(v[..., :3], point)
