"""Controller tests: the reference's PD experiment, automated.

The reference validated controllers by eyeballing videos of the no-gravity
humanoid tracking cubic joint trajectories (``testing_pds_env.ipynb``,
SURVEY.md §4: shoulders to ±1.5 rad, elbows to 1.5, over t in [1, 3]). Here
the same scenario runs headless and asserts tracking error numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrl_tpu.control import (
    Gains,
    clamp_torque,
    constant_trajectories,
    cubic_coefficients,
    default_gains,
    evaluate,
    evaluate_velocity,
    inverse_dynamics_pd,
    masked_torque,
    set_trajectories,
    stable_pd,
    standard_pd,
    torque_to_qfrc,
)
from pbrl_tpu.engine import make_data, step
from pbrl_tpu.engine.forward import forward_smooth
from pbrl_tpu.model import humanoid_model


@pytest.fixture(scope="module")
def model():
    return humanoid_model(gravity=False, floor=False)


@pytest.fixture(scope="module")
def traj(model):
    """The notebook's experiment: shoulders +-1.5, elbows 1.5, knees 0."""
    table = constant_trajectories(model.nu, 0.0, t0=1.0, tf=3.0)
    names = ["right_shoulder_x", "left_shoulder_x", "right_elbow", "left_elbow"]
    values = [-1.5, 1.5, 1.5, 1.5]
    idx = [model.actuator_names.index(n) for n in names]
    coeffs = jnp.stack([cubic_coefficients(1.0, 3.0, 0.0, v) for v in values])
    return set_trajectories(table, idx, coeffs), idx, values


def test_cubic_endpoints():
    c = cubic_coefficients(1.0, 3.0, 0.2, 1.5)
    np.testing.assert_allclose(float(evaluate(c, 1.0)), 0.2, atol=1e-5)
    np.testing.assert_allclose(float(evaluate(c, 3.0)), 1.5, atol=1e-5)
    np.testing.assert_allclose(float(evaluate_velocity(c, 1.0)), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(evaluate_velocity(c, 3.0)), 0.0, atol=1e-5)
    # Monotone midpoint.
    assert 0.2 < float(evaluate(c, 2.0)) < 1.5


def _rollout(model, controller, table, n=2000, t0=1.0):
    """Controller-in-the-loop rollout at the physics rate (dt=2 ms)."""
    gains = default_gains()
    data = make_data(model)
    data = data.replace(time=jnp.asarray(t0, jnp.float32))

    def body(d, _):
        d = forward_smooth(model, d)
        tau = controller(model, d, gains, table)
        d = d.replace(qfrc_applied=torque_to_qfrc(model, clamp_torque(model, tau)))
        d = step(model, d)
        return d, None

    data, _ = jax.lax.scan(body, data, None, length=n)
    return data


def _final_error(model, data, table):
    t = data.time
    target = evaluate(table, jnp.clip(t, 1.0, 3.0))
    qposadr = jnp.asarray(model.actuator_qposadr, jnp.int32)
    return np.abs(np.asarray(data.qpos[qposadr] - target))


def test_standard_pd_tracks(model, traj):
    table, idx, values = traj

    def ctrl(m, d, g, tbl):
        target = evaluate(tbl, jnp.clip(d.time, 1.0, 3.0))
        return standard_pd(m, d, target, g)

    data = jax.jit(lambda: _rollout(model, ctrl, table))()
    err = _final_error(model, data, table)
    assert err.max() < 0.1, f"standard PD err {err.max()}"


def test_inverse_dynamics_pd_tracks(model, traj):
    table, idx, values = traj

    def ctrl(m, d, g, tbl):
        target = evaluate(tbl, jnp.clip(d.time, 1.0, 3.0))
        return inverse_dynamics_pd(m, d, target, g)

    data = jax.jit(lambda: _rollout(model, ctrl, table))()
    err = _final_error(model, data, table)
    assert err.max() < 0.05, f"inverse-dynamics PD err {err.max()}"


def test_stable_pd_tracks(model, traj):
    table, idx, values = traj

    def ctrl(m, d, g, tbl):
        t_next = jnp.clip(d.time + m.option.timestep, 1.0, 3.0)
        return stable_pd(m, d, evaluate(tbl, t_next), g,
                         target_vel_next=evaluate_velocity(tbl, t_next))

    data = jax.jit(lambda: _rollout(model, ctrl, table))()
    err = _final_error(model, data, table)
    assert err.max() < 0.05, f"stable PD err {err.max()}"


def test_stable_pd_survives_high_gains(model, traj):
    """Stability selling point: 50x gains explode standard PD's torques but
    Stable PD stays bounded (implicit damping)."""
    table, _, _ = traj
    big = default_gains()
    big = Gains(kp=big.kp * 50, kd=big.kd * 50)

    def ctrl(m, d, g, tbl):
        t_next = jnp.clip(d.time + m.option.timestep, 1.0, 3.0)
        return stable_pd(m, d, evaluate(tbl, t_next), big)

    data = jax.jit(lambda: _rollout(model, ctrl, table, n=1000))()
    assert bool(jnp.all(jnp.isfinite(data.qpos)))
    assert float(jnp.max(jnp.abs(data.qvel))) < 50.0


def test_clamp_torque(model):
    tau = jnp.full((model.nu,), 1e4)
    clamped = clamp_torque(model, tau)
    hi = np.asarray(model.actuator_gear) * 0.5
    np.testing.assert_allclose(np.asarray(clamped), hi, rtol=1e-6)


def test_masked_torque(model):
    tau = jnp.ones(model.nu)
    mask = jnp.zeros(model.nu).at[3].set(1)
    out = np.asarray(masked_torque(tau, mask))
    assert out[3] == 1.0 and out.sum() == 1.0


def test_vmapped_stable_pd(model, traj):
    """Batched Stable PD (the per-env Cholesky under vmap)."""
    table, _, _ = traj
    gains = default_gains()
    B = 4
    rng = np.random.default_rng(0)
    qpos = np.tile(np.asarray(model.qpos0), (B, 1))
    qpos[:, 7:] += rng.uniform(-0.2, 0.2, size=(B, model.nq - 7))

    def one(q):
        d = forward_smooth(model, make_data(model, qpos=q))
        return stable_pd(model, d, jnp.zeros(model.nu), gains)

    taus = jax.jit(jax.vmap(one))(jnp.asarray(qpos, jnp.float32))
    assert taus.shape == (B, model.nu)
    assert bool(jnp.all(jnp.isfinite(taus)))
    assert float(jnp.std(taus[:, 0])) > 0  # batch members differ
