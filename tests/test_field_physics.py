"""Field-form physics vs the einsum engine (differential, eager mode).

The field program is the Pallas kernel's math; running it eagerly on tiny
batches avoids jitting the ~50k-op program on CPU while still checking every
stage bit-for-bit against pbrl_tpu.engine (which is itself validated against
CPU MuJoCo in test_oracle_mujoco.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrl_tpu.control import default_gains, implicit_pd
from pbrl_tpu.engine.data import make_data
from pbrl_tpu.engine.forward import forward_smooth, step as engine_step
from pbrl_tpu.mocap.skeleton import generate_kp_kd_gains
from pbrl_tpu.model import humanoid_model, sphere_model
from pbrl_tpu.ops import field_physics as fp


@pytest.fixture(scope="module")
def humanoid():
    return humanoid_model()


@pytest.fixture(scope="module")
def spec(humanoid):
    kp, kd = generate_kp_kd_gains()
    return fp.build_spec(humanoid, kp=kp, kd=kd,
                         fall_allowed_bodies=("right_ankle", "left_ankle"))


def _rows(arr):
    a = np.atleast_2d(np.asarray(arr, np.float32))
    return [jnp.asarray(a[:, i]) for i in range(a.shape[1])]


def _state(m, seed, z=0.85):
    rng = np.random.default_rng(seed)
    qpos = np.asarray(m.qpos0, np.float64).copy()
    qpos[2] = z
    qpos[7:] += rng.uniform(-0.3, 0.3, m.nq - 7)
    qvel = rng.normal(size=m.nv) * 0.5
    target = rng.uniform(-0.3, 0.3, m.nu)
    return qpos, qvel, target


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_substep_matches_engine(humanoid, spec, seed):
    m = humanoid
    qpos, qvel, target = _state(m, seed)
    gains = default_gains()
    d = make_data(m, qpos=jnp.asarray(qpos, jnp.float32),
                  qvel=jnp.asarray(qvel, jnp.float32))
    d = engine_step(m, d, qfrc_fn=lambda mm, dd: implicit_pd(
        mm, dd, jnp.asarray(target, jnp.float32), gains))

    q2, v2, fall = fp.substep(spec, _rows(qpos), _rows(qvel), _rows(target))
    qf = np.array([float(r[0]) for r in q2])
    vf = np.array([float(r[0]) for r in v2])
    np.testing.assert_allclose(qf, np.asarray(d.qpos), atol=1e-6)
    np.testing.assert_allclose(vf, np.asarray(d.qvel), atol=2e-4)


def test_multi_substep_trajectory(humanoid, spec):
    """4 chained substeps stay in lockstep with the engine."""
    m = humanoid
    qpos, qvel, target = _state(m, 3, z=0.9)
    gains = default_gains()
    d = make_data(m, qpos=jnp.asarray(qpos, jnp.float32),
                  qvel=jnp.asarray(qvel, jnp.float32))
    qrows, vrows, urows = _rows(qpos), _rows(qvel), _rows(target)
    for _ in range(4):
        d = engine_step(m, d, qfrc_fn=lambda mm, dd: implicit_pd(
            mm, dd, jnp.asarray(target, jnp.float32), gains))
        qrows, vrows, _ = fp.substep(spec, qrows, vrows, urows)
    qf = np.array([float(r[0]) for r in qrows])
    np.testing.assert_allclose(qf, np.asarray(d.qpos), atol=1e-5)


def test_fk_outputs_match_engine(humanoid, spec):
    m = humanoid
    qpos, _, _ = _state(m, 4)
    d = forward_smooth(m, make_data(m, qpos=jnp.asarray(qpos, jnp.float32)))
    xpos, xquat = fp.fk_outputs(spec, _rows(qpos))
    for b in range(m.nbody):
        got_p = np.array([float(c[0]) for c in xpos[b]])
        np.testing.assert_allclose(got_p, np.asarray(d.xpos[b]), atol=1e-5)
        got_q = np.array([float(c[0]) for c in xquat[b]])
        want_q = np.asarray(d.xquat[b])
        if np.dot(got_q, want_q) < 0:
            got_q = -got_q
        np.testing.assert_allclose(got_q, want_q, atol=1e-5)


def test_fall_flag(humanoid, spec):
    m = humanoid
    # Standing pose on feet: no fall. Root dropped to the floor: fall.
    qpos = np.asarray(m.qpos0, np.float64).copy()
    up = fp.substep(spec, _rows(qpos), _rows(np.zeros(m.nv)),
                    _rows(np.zeros(m.nu)))[2]
    assert float(up[0]) == 0.0
    qpos[2] = 0.05  # root sphere inside the floor
    down = fp.substep(spec, _rows(qpos), _rows(np.zeros(m.nv)),
                      _rows(np.zeros(m.nu)))[2]
    assert float(down[0]) == 1.0


def test_sphere_model_free_fall():
    """Spec builder generalises beyond the humanoid (no actuators)."""
    m = sphere_model()
    spec = fp.build_spec(m, n_substeps=1)
    qrows, vrows = _rows(np.asarray(m.qpos0)), _rows(np.zeros(m.nv))
    for _ in range(3):
        qrows, vrows, _ = fp.substep(spec, qrows, vrows, [])
    h = float(m.option.timestep)
    want_vz = -9.81 * h * 3
    np.testing.assert_allclose(float(vrows[2][0]), want_vz, rtol=1e-5)


def test_torque_mode(humanoid):
    m = humanoid
    spec_t = fp.build_spec(m, mode="torque")
    qpos, qvel, _ = _state(m, 5, z=2.0)  # airborne: no contacts
    tau = np.full(m.nu, 10.0)
    q2, v2, _ = fp.substep(spec_t, _rows(qpos), _rows(qvel), _rows(tau))
    assert all(np.isfinite(float(r[0])) for r in v2)
