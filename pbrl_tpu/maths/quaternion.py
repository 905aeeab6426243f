"""Batched quaternion algebra for TPU (pure jax.numpy).

Conventions
-----------
* Quaternions are ``(..., 4)`` arrays in **wxyz** order (MuJoCo convention:
  scalar first), unit norm unless stated otherwise.
* All functions broadcast over leading batch dimensions and are safe under
  ``jax.jit`` / ``jax.vmap`` / ``jax.grad``.
* Rotation vectors ("rotvec") are axis * angle, in radians.

This module provides the capabilities of the reference's quaternion stack
(pyquaternion used in ``some_math/math_utils.py:25-65`` and the vendored
Gohlke library ``some_math/transformations.py:1089`` of which only
``euler_from_quaternion(..., axes='rxyz')`` is exercised) as pure batched
jnp — usable on device inside the simulator, not just host-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pbrl_tpu.maths.numeric import safe_norm

# A small epsilon used to stabilise divisions / square roots near zero.
_EPS = 1e-12


def identity(shape=()) -> jnp.ndarray:
    """Identity quaternion(s) with the given batch shape."""
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalise to unit quaternion (safe near zero norm, incl. gradients)."""
    n = safe_norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``q1 ⊗ q2`` (wxyz)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def inv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse for possibly non-unit quaternions."""
    return conj(q) / jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), _EPS)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``v`` by quaternion(s) ``q``: ``R(q) @ v``.

    Uses the expanded 15-mul form (cheaper than two Hamilton products).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``v`` by the inverse of ``q``: ``R(q)^T @ v``."""
    return rotate(conj(q), v)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from (unit) axis and angle. ``angle`` broadcasts."""
    angle = jnp.asarray(angle)[..., None]
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def to_rotvec(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (axis * angle) of a unit quaternion, angle in (-pi, pi].

    Numerically stable at small angles via the sinc expansion.
    """
    # Make w >= 0 so the returned angle is the short way around.
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:4]
    sin_half = safe_norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # angle / sin(angle/2) with series fallback:  2 + angle^2/12 * ... ~ 2
    scale = jnp.where(sin_half < 1e-7, 2.0 + angle * angle / 12.0, angle / jnp.maximum(sin_half, _EPS))
    return v * scale[..., None]


def from_rotvec(rv: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from a rotation vector (exp map), stable at small angles."""
    angle = safe_norm(rv, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(half)/angle with series fallback 0.5 - angle^2/48.
    small = angle < 1e-7
    k = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.maximum(angle, _EPS))
    return jnp.concatenate([jnp.cos(half), rv * k], axis=-1)


def integrate(q: jnp.ndarray, omega_local: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by body-frame angular velocity over dt.

    ``q(t+dt) = q ⊗ exp(omega_local * dt)`` — matches MuJoCo's free/ball
    joint position integration (``mju_quatIntegrate`` semantics, local frame).
    """
    return normalize(mul(q, from_rotvec(omega_local * dt)))


def integrate_world(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate by a world-frame angular velocity: ``exp(w dt) ⊗ q``."""
    return normalize(mul(from_rotvec(omega_world * dt), q))


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``(..., 3, 3)`` of unit quaternion(s)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion from rotation matrix (Shepperd's branchless method)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by max pivot.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, _EPS)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0)], axis=-1),
            jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1)], axis=-1),
            jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2)], axis=-1),
            jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3], axis=-1),
        ],
        axis=-2,
    )
    idx = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return normalize(q)


def to_euler_rxyz(q: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic (rotating-frame) x-y-z Euler angles: ``R = Rx(a) Ry(b) Rz(c)``.

    Matches Gohlke ``euler_from_quaternion(q_xyzw, axes='rxyz')`` (used by the
    reference converter, ``utils/SimpleConverter.py:178``) and scipy's
    ``Rotation.as_euler('XYZ')``. This is exactly the decomposition realised by
    a MuJoCo x/y/z hinge-joint triple in one body, so mocap spherical joints
    map losslessly onto the humanoid's hinge triples.
    """
    m = to_matrix(q)
    b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
    # Gimbal lock when |cos b| ~ 0: fold c into a.
    locked = jnp.abs(m[..., 0, 2]) > 1.0 - 1e-7
    a = jnp.where(
        locked,
        jnp.arctan2(m[..., 2, 1], m[..., 1, 1]),
        jnp.arctan2(-m[..., 1, 2], m[..., 2, 2]),
    )
    c = jnp.where(locked, 0.0, jnp.arctan2(-m[..., 0, 1], m[..., 0, 0]))
    return jnp.stack([a, b, c], axis=-1)


def from_euler_rxyz(euler: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from intrinsic x-y-z Euler angles (inverse of above)."""
    a, b, c = euler[..., 0], euler[..., 1], euler[..., 2]
    z = jnp.zeros_like(a)
    ex = jnp.stack([a, z, z], axis=-1)
    ey = jnp.stack([z, b, z], axis=-1)
    ez = jnp.stack([z, z, c], axis=-1)
    return mul(from_rotvec(ex), mul(from_rotvec(ey), from_rotvec(ez)))


@jax.custom_jvp
def angle_between(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between two unit quaternions, in [0, pi].

    The forward value is the plain ``2 arccos |<q1, q2>|``; the derivative is
    supplied by a custom JVP because ``d/dx arccos`` diverges as ``|<q1,q2>|
    -> 1`` — in f32, ``1 - d^2`` underflows to 0 near perfect alignment and
    autodiff produces ``0 * inf = NaN`` exactly where an imitation policy
    tracks well. Analytically the chain through ``angle^2`` stays finite
    (``theta / sqrt(1 - d^2) -> 2``), so the JVP clamps the derivative factor
    at ``d = 1 - 1e-6`` (bounding it at ~1.4e3) and the composed gradient of
    any smooth function of the angle matches the true limit to rounding.
    Needed by the analytic-policy-gradient trainer (train/apg.py), which
    backpropagates the DeepMimic pose reward through the simulator.
    """
    d = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0))


@angle_between.defjvp
def _angle_between_jvp(primals, tangents):
    q1, q2 = primals
    dq1, dq2 = tangents
    s = jnp.sum(q1 * q2, axis=-1)
    d = jnp.abs(s)
    ans = 2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0))
    ds = jnp.sum(dq1 * q2 + q1 * dq2, axis=-1)
    d_safe = jnp.clip(d, -1.0 + 1e-6, 1.0 - 1e-6)
    factor = -2.0 / jnp.sqrt(1.0 - d_safe * d_safe)
    return ans, factor * jnp.sign(s) * ds


def box_minus(q_new: jnp.ndarray, q_old: jnp.ndarray, dt) -> jnp.ndarray:
    """Finite-difference body-frame angular velocity between two quaternions.

    ``omega = log(q_old^{-1} ⊗ q_new) / dt`` — the correctly signed version of
    the reference's ``calc_rot_vel`` (``some_math/math_utils.py:46-65``, which
    computes ``log(q_new^{-1} ⊗ q_old)`` and thus flips sign depending on
    pyquaternion's axis normalisation).
    """
    return to_rotvec(mul(conj(q_old), q_new)) / dt
