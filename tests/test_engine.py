"""Engine correctness: analytic solutions, conservation, contact behavior.

Mirrors SURVEY.md §4's prescribed pyramid: physics step vs analytic solutions
(sphere free fall — the reference's ``models/sphere_model.xml`` sanity scene),
contact rest, and humanoid stability at the reference timestep (2 ms,
``agents_env/agent_env_template.py:65``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrl_tpu.engine import forward, make_data, step, step_n
from pbrl_tpu.engine.forward import forward as fwd
from pbrl_tpu.model import humanoid_model, sphere_model


@pytest.fixture(scope="module")
def sphere():
    return sphere_model()


@pytest.fixture(scope="module")
def sphere_nofloor():
    return sphere_model(floor=False)


@pytest.fixture(scope="module")
def humanoid():
    return humanoid_model()


def test_free_fall_analytic(sphere_nofloor):
    m = sphere_nofloor
    d = make_data(m)
    n = 100
    d = jax.jit(lambda d: step_n(m, d, n))(d)
    h = float(m.option.timestep)
    g = 9.81
    # Semi-implicit Euler: v_k = -g h k;  z_n = z0 - g h^2 n(n+1)/2.
    z_want = 1.4 - g * h * h * n * (n + 1) / 2
    np.testing.assert_allclose(float(d.qpos[2]), z_want, atol=1e-4)
    np.testing.assert_allclose(float(d.qvel[2]), -g * h * n, atol=1e-4)
    # x, y untouched; quaternion still identity.
    np.testing.assert_allclose(np.asarray(d.qpos[:2]), [0.0, -1.2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.qpos[3:7]), [1, 0, 0, 0], atol=1e-6)


def test_projectile_parabola(sphere_nofloor):
    m = sphere_nofloor
    d = make_data(m)
    d = d.replace(qvel=d.qvel.at[0].set(3.0))  # 3 m/s in x
    d = jax.jit(lambda d: step_n(m, d, 250))(d)
    t = 250 * float(m.option.timestep)
    np.testing.assert_allclose(float(d.qpos[0]), 3.0 * t, atol=1e-4)


def test_torque_free_spin_conserves_omega(sphere_nofloor):
    # Uniform sphere: any spin axis is principal; omega must stay constant.
    m = sphere_nofloor
    d = make_data(m)
    w0 = np.array([1.0, 2.0, 3.0])
    d = d.replace(qvel=d.qvel.at[3:6].set(jnp.asarray(w0)))
    d = jax.jit(lambda d: step_n(m, d, 500))(d)
    np.testing.assert_allclose(np.asarray(d.qvel[3:6]), w0, atol=1e-4)


def test_sphere_settles_on_plane(sphere):
    m = sphere
    d = make_data(m)
    d = jax.jit(lambda d: step_n(m, d, 1500))(d)  # 3 s
    # Rests near z = r with tiny residual velocity.
    assert abs(float(d.qpos[2]) - 0.1) < 0.02
    assert abs(float(d.qvel[2])) < 0.05
    assert bool(jnp.all(jnp.isfinite(d.qpos)))


def test_no_gravity_statics(humanoid):
    m = humanoid_model(gravity=False, floor=False)
    d = make_data(m)
    d = jax.jit(lambda d: step_n(m, d, 200))(d)
    # Nothing moves without forces.
    np.testing.assert_allclose(np.asarray(d.qvel), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.qpos), np.asarray(m.qpos0), atol=1e-5)


def test_humanoid_drop_stable(humanoid):
    m = humanoid
    d = make_data(m)
    d = jax.jit(lambda d: step_n(m, d, 1000))(d)  # 2 s of contact-rich dynamics
    assert bool(jnp.all(jnp.isfinite(d.qpos)))
    assert bool(jnp.all(jnp.isfinite(d.qvel)))
    z = float(d.qpos[2])
    assert 0.0 < z < 1.0  # fell over / crumpled but did not explode or tunnel


def test_kinetic_energy_matches_mass_matrix(humanoid):
    # 0.5 qv' M qv must equal the sum of body KEs from cvel + spatial inertia.
    m = humanoid
    rng = np.random.default_rng(0)
    qvel = jnp.asarray(rng.normal(size=m.nv) * 0.5, jnp.float32)
    d = make_data(m).replace(qvel=qvel)
    d = fwd(m, d)
    ke_m = 0.5 * float(qvel @ d.qM @ qvel)
    # Independent KE: for each body, 0.5 v' I v with world spatial inertia.
    from pbrl_tpu.engine.dynamics import _spatial_inertias

    imats = _spatial_inertias(m, d)
    ke_b = 0.5 * float(jnp.einsum("bx,bxy,by->", d.cvel, imats, d.cvel))
    # armature adds to qM only
    ke_arm = 0.5 * float(jnp.sum(np.asarray(m.dof_armature) * np.asarray(qvel) ** 2))
    np.testing.assert_allclose(ke_m, ke_b + ke_arm, rtol=1e-4)


def test_mass_matrix_spd(humanoid):
    m = humanoid
    rng = np.random.default_rng(1)
    q = np.asarray(m.qpos0).copy()
    q[7:] += rng.uniform(-0.3, 0.3, size=m.nq - 7)
    d = fwd(m, make_data(m, qpos=jnp.asarray(q)))
    M = np.asarray(d.qM, np.float64)
    np.testing.assert_allclose(M, M.T, atol=1e-3)
    w = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert w.min() > 0


def test_vmap_batched_step(humanoid):
    m = humanoid
    B = 8
    rng = np.random.default_rng(2)
    qpos = np.tile(np.asarray(m.qpos0), (B, 1))
    qpos[:, 7:] += rng.uniform(-0.1, 0.1, size=(B, m.nq - 7))
    data = jax.vmap(lambda q: make_data(m, qpos=q))(jnp.asarray(qpos, jnp.float32))
    stepped = jax.jit(jax.vmap(lambda d: step_n(m, d, 10)))(data)
    assert stepped.qpos.shape == (B, m.nq)
    assert bool(jnp.all(jnp.isfinite(stepped.qpos)))
    # Batch members evolve independently: different perturbations, different results.
    assert float(jnp.std(stepped.qpos[:, 2])) > 0


def test_actuation_direction(humanoid):
    # Positive ctrl on a hinge must produce positive qacc on that dof alone
    # (no gravity, zero state).
    m = humanoid_model(gravity=False, floor=False)
    d = make_data(m)
    act = m.actuator_names.index("right_elbow")
    ctrl = jnp.zeros(m.nu).at[act].set(0.3)
    d = fwd(m, d.replace(ctrl=ctrl))
    dof = m.actuator_dofadr[act]
    assert float(d.qacc[dof]) > 0
    gear = float(m.actuator_gear[act])
    np.testing.assert_allclose(float(d.qfrc_actuator[dof]), 0.3 * gear, rtol=1e-6)


def test_ctrlrange_clamp(humanoid):
    m = humanoid_model(gravity=False, floor=False)
    d = make_data(m)
    act = 0
    dof = m.actuator_dofadr[act]
    gear = float(m.actuator_gear[act])
    d1 = fwd(m, d.replace(ctrl=jnp.zeros(m.nu).at[act].set(10.0)))
    np.testing.assert_allclose(float(d1.qfrc_actuator[dof]), 0.5 * gear, rtol=1e-6)


_TWO_BOX_XML = """
<mujoco model="boxes">
  <option timestep="0.002" gravity="0 0 0"/>
  <worldbody>
    <body name="b1" pos="0 0 1"><freejoint/><geom type="box" size="0.1 0.05 0.03" mass="1"/></body>
    <body name="b2" pos="0.17 0.01 1.02"><freejoint/><geom type="box" size="0.1 0.05 0.03" mass="1"/></body>
  </worldbody>
</mujoco>
"""


def test_box_box_corner_narrow_phase():
    """Two overlapping free boxes in zero gravity resolve their penetration.

    Exercises the corner-vs-box manifold (the MJX box-box capability the
    reference gets implicitly, SURVEY.md §2.2) and the <freejoint/> MJCF
    shorthand. The initial pose penetrates 1 cm along y (the min-translation
    axis for the deepest corners); the penalty contact must drive the
    penetration to ~0 and give the boxes opposite separating velocities.
    """
    from pbrl_tpu.engine.collision import collide, ncon_max
    from pbrl_tpu.engine.forward import forward_smooth
    from pbrl_tpu.model.mjcf import load_model

    m = load_model(_TWO_BOX_XML)
    assert ncon_max(m) == 16  # 8 corners of each box vs the other
    d0 = forward_smooth(m, make_data(m))
    d0 = collide(m, d0)
    assert float(jnp.min(d0.contact.dist)) == pytest.approx(-0.01, abs=1e-4)

    d = make_data(m)
    stepper = jax.jit(lambda d: step_n(m, d, 200))
    d = stepper(d)
    dT = collide(m, forward_smooth(m, d))
    assert float(jnp.min(dT.contact.dist)) > -2e-3  # penetration resolved
    # opposite y velocities: the contact pushed the boxes apart
    vy1, vy2 = float(d.qvel[1]), float(d.qvel[7])
    assert vy1 * vy2 < 0
    assert bool(jnp.all(jnp.isfinite(d.qpos)))
