"""Differential tests against CPU MuJoCo as oracle (SURVEY.md §4).

The humanoid spec is exported through ``to_mjcf`` and compiled by MuJoCo's C
compiler; FK poses, the dense CRBA mass matrix (what the reference fetched via
``mujoco.mj_fullM``, ``pds_controllers_mjx.py:66-68``) and the RNEA bias force
(``qfrc_bias``, ``pds_controllers_agents.py:65``) are compared at random
in-range states. Tolerances reflect our f32 compute vs MuJoCo f64.
"""

import mujoco
import numpy as np
import pytest

import jax.numpy as jnp

from pbrl_tpu.engine import make_data
from pbrl_tpu.engine.forward import forward as fwd
from pbrl_tpu.model import humanoid_spec, to_mjcf


@pytest.fixture(scope="module")
def pair():
    spec = humanoid_spec(floor=False)
    ours = spec.compile()
    mj = mujoco.MjModel.from_xml_string(to_mjcf(spec))
    return ours, mj


def _random_state(m, seed):
    rng = np.random.default_rng(seed)
    qpos = np.asarray(m.qpos0, np.float64).copy()
    qpos[7:] = rng.uniform(-0.5, 0.5, size=m.nq - 7)
    quat = rng.normal(size=4)
    qpos[3:7] = quat / np.linalg.norm(quat)
    qpos[:3] = rng.uniform(-1, 1, size=3) + [0, 0, 1.5]
    qvel = rng.normal(size=m.nv) * 0.5
    return qpos, qvel


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fk_matches_mujoco(pair, seed):
    ours, mj = pair
    qpos, qvel = _random_state(ours, seed)
    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    mujoco.mj_forward(mj, mjd)

    d = fwd(ours, make_data(ours, qpos=jnp.asarray(qpos, jnp.float32),
                            qvel=jnp.asarray(qvel, jnp.float32)))

    for b, name in enumerate(ours.body_names):
        mb = mj.body(name)
        np.testing.assert_allclose(
            np.asarray(d.xpos[b]), mjd.xpos[mb.id], atol=2e-5,
            err_msg=f"xpos mismatch for body {name}")
        qm = mjd.xquat[mb.id]
        qo = np.asarray(d.xquat[b], np.float64)
        if np.dot(qm, qo) < 0:
            qo = -qo
        np.testing.assert_allclose(qo, qm, atol=2e-5,
                                   err_msg=f"xquat mismatch for body {name}")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_site_positions_match(pair, seed):
    ours, mj = pair
    qpos, _ = _random_state(ours, seed)
    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = qpos
    mujoco.mj_forward(mj, mjd)
    d = fwd(ours, make_data(ours, qpos=jnp.asarray(qpos, jnp.float32)))
    for s, name in enumerate(ours.site_names):
        np.testing.assert_allclose(
            np.asarray(d.site_xpos[s]), mjd.site(name).xpos, atol=2e-5,
            err_msg=f"site {name}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mass_matrix_matches_mujoco(pair, seed):
    ours, mj = pair
    qpos, qvel = _random_state(ours, seed)
    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    mujoco.mj_forward(mj, mjd)
    M_mj = np.zeros((mj.nv, mj.nv))
    # MuJoCo >= 3.10 signature: mj_fullM(model, data, dst).
    mujoco.mj_fullM(mj, mjd, M_mj)

    d = fwd(ours, make_data(ours, qpos=jnp.asarray(qpos, jnp.float32),
                            qvel=jnp.asarray(qvel, jnp.float32)))
    M = np.asarray(d.qM, np.float64)
    scale = max(1.0, np.abs(M_mj).max())
    np.testing.assert_allclose(M / scale, M_mj / scale, atol=3e-4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_bias_force_matches_mujoco(pair, seed):
    ours, mj = pair
    qpos, qvel = _random_state(ours, seed)
    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    mujoco.mj_forward(mj, mjd)

    d = fwd(ours, make_data(ours, qpos=jnp.asarray(qpos, jnp.float32),
                            qvel=jnp.asarray(qvel, jnp.float32)))
    bias = np.asarray(d.qfrc_bias, np.float64)
    scale = max(1.0, np.abs(mjd.qfrc_bias).max())
    np.testing.assert_allclose(bias / scale, mjd.qfrc_bias / scale, atol=5e-4)


def test_smooth_trajectory_matches_mujoco():
    """Step both engines through contact-free, limit-free dynamics and compare.

    Joint limits are disabled: MuJoCo enforces them as hard constraints while
    we use compliant one-sided springs, so the smooth-dynamics comparison must
    exclude them (they are covered qualitatively by engine tests).
    """
    spec = humanoid_spec(floor=False)
    for b in spec.bodies:
        for j in b.joints:
            j.limited = False
        for g in b.geoms:  # also no self-collisions: smooth dynamics only
            g.contype = 0
            g.conaffinity = 0
    ours = spec.compile()
    mj = mujoco.MjModel.from_xml_string(to_mjcf(spec))
    qpos = np.asarray(ours.qpos0, np.float64).copy()
    qpos[2] += 2.0
    rng = np.random.default_rng(7)
    qpos[7:] = rng.uniform(-0.3, 0.3, size=ours.nq - 7)
    ctrl = rng.uniform(-0.4, 0.4, size=ours.nu)

    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = qpos
    # to_mjcf preserves actuator order, so raw index assignment lines up.
    mjd.ctrl[:] = ctrl
    n = 50
    for _ in range(n):
        mujoco.mj_step(mj, mjd)

    import jax
    from pbrl_tpu.engine import step_n

    d = make_data(ours, qpos=jnp.asarray(qpos, jnp.float32))
    d = jax.jit(lambda d: step_n(ours, d, n, ctrl=jnp.asarray(ctrl, jnp.float32)))(d)

    np.testing.assert_allclose(np.asarray(d.qpos, np.float64), mjd.qpos, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d.qvel, np.float64), mjd.qvel, atol=2e-2)
