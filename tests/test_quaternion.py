"""Quaternion algebra vs scipy oracle.

Golden-value strategy per SURVEY.md §4: the reference's quaternion semantics
(pyquaternion in ``some_math/math_utils.py``, Gohlke ``transformations.py:1089``
``euler_from_quaternion(..., 'rxyz')``) are pinned here against scipy's
``Rotation``, which implements the same classical conventions.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from pbrl_tpu.maths import quaternion as quat


def _rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def _to_scipy(q_wxyz):
    return R.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))


def test_mul_matches_scipy():
    q1, q2 = _rand_quats(64, 1), _rand_quats(64, 2)
    got = np.asarray(quat.mul(jnp.asarray(q1), jnp.asarray(q2)))
    want = (_to_scipy(q1) * _to_scipy(q2)).as_quat()  # xyzw
    want = np.roll(want, 1, axis=-1)
    # Allow global sign flips (q and -q are the same rotation).
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-6)


def test_rotate_matches_matrix():
    q = _rand_quats(64, 3)
    v = np.random.default_rng(4).normal(size=(64, 3))
    got = np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))
    want = np.einsum("nij,nj->ni", _to_scipy(q).as_matrix(), v)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_to_from_matrix_roundtrip():
    q = _rand_quats(128, 5)
    m = quat.to_matrix(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(m), _to_scipy(q).as_matrix(), atol=1e-6)
    q2 = np.asarray(quat.from_matrix(m))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2, q * sign, atol=1e-5)


def test_rotvec_roundtrip_and_scipy():
    q = _rand_quats(128, 6)
    rv = np.asarray(quat.to_rotvec(jnp.asarray(q)))
    np.testing.assert_allclose(rv, _to_scipy(q).as_rotvec(), atol=1e-5)
    q2 = np.asarray(quat.from_rotvec(jnp.asarray(rv)))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2, q * sign, atol=1e-6)


def test_rotvec_small_angle_stable():
    rv = jnp.asarray([[1e-10, 0, 0], [0.0, 0.0, 0.0]])
    q = quat.from_rotvec(rv)
    np.testing.assert_allclose(np.asarray(q)[:, 0], 1.0, atol=1e-12)
    back = np.asarray(quat.to_rotvec(q))
    np.testing.assert_allclose(back, np.asarray(rv), atol=1e-12)


def test_euler_rxyz_matches_scipy_intrinsic_XYZ():
    q = _rand_quats(256, 7)
    got = np.asarray(quat.to_euler_rxyz(jnp.asarray(q)))
    want = _to_scipy(q).as_euler("XYZ")  # intrinsic x-y-z == Gohlke 'rxyz'
    np.testing.assert_allclose(got, want, atol=1e-5)
    # Round trip back to the same rotation.
    q2 = np.asarray(quat.from_euler_rxyz(jnp.asarray(got)))
    ang = np.asarray(quat.angle_between(jnp.asarray(q2), jnp.asarray(q)))
    # arccos near 1 amplifies f32 rounding to ~sqrt(eps); 2e-3 rad is noise.
    np.testing.assert_allclose(ang, 0.0, atol=2e-3)


def test_integrate_constant_omega():
    # Spinning about body z at 2 rad/s for 0.5 s => 1 rad rotation.
    q = quat.identity()
    for _ in range(500):
        q = quat.integrate(q, jnp.asarray([0.0, 0.0, 2.0]), 0.001)
    want = R.from_euler("z", 1.0).as_quat()
    np.testing.assert_allclose(np.asarray(q), np.roll(want, 1), atol=1e-5)


def test_box_minus_inverts_integrate():
    rng = np.random.default_rng(8)
    q0 = jnp.asarray(_rand_quats(32, 9))
    w = jnp.asarray(rng.normal(size=(32, 3)))
    dt = 0.002
    q1 = quat.integrate(q0, w, dt)
    got = np.asarray(quat.box_minus(q1, q0, dt))
    np.testing.assert_allclose(got, np.asarray(w), atol=1e-4)


def test_angle_between():
    qa = quat.identity((4,))
    ax = jnp.asarray([[0.0, 0, 1]] * 4)
    ang = jnp.asarray([0.1, 0.5, 1.0, 3.0])
    qb = quat.from_axis_angle(ax, ang)
    np.testing.assert_allclose(np.asarray(quat.angle_between(qa, qb)), np.asarray(ang), atol=1e-6)


# ---------------------------------------------------------------------------
# Gradient safety: the analytic-policy-gradient trainer backpropagates
# through every quaternion op; the degenerate points below are routinely hit
# (identity rotations, perfectly tracked references) and raw autodiff of
# norm/arccos compositions yields NaN exactly there.
# ---------------------------------------------------------------------------


def test_angle_between_grad_finite_at_alignment():
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    g = jax.grad(lambda a: quat.angle_between(a, q) ** 2)(q)
    assert bool(jnp.all(jnp.isfinite(g)))
    # Away from the singularity the custom JVP matches raw autodiff.
    qa = quat.normalize(jnp.asarray([0.9, 0.3, 0.2, 0.1]))
    qb = quat.normalize(jnp.asarray([0.7, -0.4, 0.5, 0.2]))
    raw = lambda a, b: 2.0 * jnp.arccos(
        jnp.clip(jnp.abs(jnp.sum(a * b)), -1.0, 1.0))
    for other in (qb, -qb):  # both hemispheres (the |.| sign path)
        g1 = jax.grad(quat.angle_between)(qa, other)
        g2 = jax.grad(raw)(qa, other)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_rotvec_round_trip_grads_finite_at_identity():
    z3 = jnp.zeros((3,))
    g = jax.grad(lambda rv: jnp.sum(quat.from_rotvec(rv) ** 2))(z3)
    assert bool(jnp.all(jnp.isfinite(g)))
    qid = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    g2 = jax.grad(lambda q: jnp.sum(quat.to_rotvec(q) ** 2))(qid)
    assert bool(jnp.all(jnp.isfinite(g2)))
    g3 = jax.grad(lambda q: jnp.sum(quat.normalize(q) ** 2))(qid)
    assert bool(jnp.all(jnp.isfinite(g3)))


def test_safe_norm_forward_exact_grad_finite():
    from pbrl_tpu.maths import safe_norm

    x = jnp.asarray([[3.0, 4.0, 0.0], [1e-3, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(safe_norm(x, axis=-1)),
                               np.asarray(jnp.linalg.norm(x, axis=-1)),
                               rtol=1e-7)
    # At exactly zero: forward 0, gradient 0 (not NaN like linalg.norm).
    g = jax.grad(lambda v: safe_norm(v))(jnp.zeros((3,)))
    assert bool(jnp.all(g == 0.0))
    g_bad = jax.grad(lambda v: jnp.linalg.norm(v))(jnp.zeros((3,)))
    assert not bool(jnp.all(jnp.isfinite(g_bad)))  # the trap being fixed
