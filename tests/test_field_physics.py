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

    q2, v2, fall, _ = fp.substep(spec, _rows(qpos), _rows(qvel), _rows(target))
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
        qrows, vrows, _, _ = fp.substep(spec, qrows, vrows, urows)
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
        qrows, vrows, _, _ = fp.substep(spec, qrows, vrows, [])
    h = float(m.option.timestep)
    want_vz = -9.81 * h * 3
    np.testing.assert_allclose(float(vrows[2][0]), want_vz, rtol=1e-5)


def test_torque_mode(humanoid):
    m = humanoid
    spec_t = fp.build_spec(m, mode="torque")
    qpos, qvel, _ = _state(m, 5, z=2.0)  # airborne: no contacts
    tau = np.full(m.nu, 10.0)
    q2, v2, _, _ = fp.substep(spec_t, _rows(qpos), _rows(qvel), _rows(tau))
    assert all(np.isfinite(float(r[0])) for r in v2)


def test_box_box_corner_differential():
    """Corner-vs-box slots match the einsum engine on a two-box scene.

    Both boxes penetrate 1 cm at t=0 (interior-corner case — regression for
    the v3_norm rounding bug that classified exactly-interior points as
    outside). Contact geometry (dist/pos/normal per corner probe) must agree
    slot-for-slot; the integrated state gets a looser tolerance because the
    opposed corner pushes make the contact torque-heavy and f32-chaotic.
    """
    from pbrl_tpu.engine.collision import collide
    from pbrl_tpu.engine.forward import forward_smooth
    from pbrl_tpu.model.mjcf import load_model
    from tests.test_engine import _TWO_BOX_XML

    m = load_model(_TWO_BOX_XML)
    spec = fp.build_spec(m, n_substeps=1, mode="torque")
    bb = [s for s in spec.slots if s.kind in ("boxcorner_box", "box_boxcorner")]
    assert len(bb) == 16

    # --- geometry: each field slot vs the matching engine contact row ------
    d0 = collide(m, forward_smooth(m, make_data(m)))
    con = d0.contact  # rows 0-7: corners of box1 vs box2; 8-15: box2 vs box1
    corners = [(sx, sy, sz) for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
               for sz in (-1.0, 1.0)]
    qrows = _rows(np.asarray(m.qpos0))
    xpos, xquat = fp.fk_outputs(spec, qrows)
    cache = {}
    for slot in bb:
        ci = corners.index(slot.extra)
        row = ci if slot.kind == "boxcorner_box" else 8 + ci
        dist, pos, n, _ = fp._contact_geometry(spec, slot, xpos, xquat,
                                               qrows[0], cache)
        np.testing.assert_allclose(float(np.asarray(dist).ravel()[0]),
                                   float(con.dist[row]), atol=1e-6)
        got_p = np.array([float(np.asarray(c).ravel()[0]) for c in pos])
        got_n = np.array([float(np.asarray(c).ravel()[0]) for c in n])
        np.testing.assert_allclose(got_p, np.asarray(con.pos[row]), atol=1e-6)
        np.testing.assert_allclose(got_n, np.asarray(con.frame[row, 0]), atol=1e-6)

    # --- integrated state over a few substeps ------------------------------
    qrows, vrows = _rows(np.asarray(m.qpos0)), _rows(np.zeros(m.nv))
    d = make_data(m)
    for _ in range(4):
        d = engine_step(m, d)
        qrows, vrows, _, _ = fp.substep(spec, qrows, vrows, [])
    qf = np.array([float(r[0]) for r in qrows])
    vf = np.array([float(r[0]) for r in vrows])
    np.testing.assert_allclose(qf, np.asarray(d.qpos), atol=1e-4)
    np.testing.assert_allclose(vf, np.asarray(d.qvel), atol=2e-2)


def test_foot_foot_contact_differential(humanoid, spec):
    """Crossed-feet pose activates the foot-foot manifold in BOTH engines and
    the substep stays in lockstep (the walk/backflip crossover-step case the
    round-1 inscribed-sphere approximation mishandled)."""
    from pbrl_tpu.engine.collision import collide
    from pbrl_tpu.engine.forward import forward_smooth

    m = humanoid
    qpos = np.asarray(m.qpos0, np.float64).copy()
    qpos[2] = 1.0    # airborne: isolates foot-foot from floor contacts
    qpos[21] = 0.15  # right_hip_x: swing right leg across
    qpos[22] = 0.05  # right_hip_y
    d0 = collide(m, forward_smooth(
        m, make_data(m, qpos=jnp.asarray(qpos, jnp.float32))))
    fb1, fb2 = m.geom_bodyid[12], m.geom_bodyid[15]
    mask = (np.asarray(d0.contact.body1) == fb1) & (np.asarray(d0.contact.body2) == fb2)
    ff = np.asarray(d0.contact.dist)[mask]
    assert ff.min() < -5e-3  # feet genuinely interpenetrate here

    gains = default_gains()
    target = np.zeros(m.nu)
    qrows, vrows = _rows(qpos), _rows(np.zeros(m.nv))
    d = make_data(m, qpos=jnp.asarray(qpos, jnp.float32))
    for _ in range(2):
        d = engine_step(m, d, qfrc_fn=lambda mm, dd: implicit_pd(
            mm, dd, jnp.asarray(target, jnp.float32), gains))
        qrows, vrows, _, _ = fp.substep(spec, qrows, vrows, _rows(target))
    qf = np.array([float(r[0]) for r in qrows])
    vf = np.array([float(r[0]) for r in vrows])
    np.testing.assert_allclose(qf, np.asarray(d.qpos), atol=1e-5)
    np.testing.assert_allclose(vf, np.asarray(d.qvel), atol=1e-3)


@pytest.mark.parametrize("pair", [(-1, 12), (9, 12), (3, 11), (6, 10)])
def test_delassus_two_body_vs_dense(humanoid, spec, pair):
    """_delassus_inv_mass (sparse union-chain forward solve, round-4
    two-body generalization) against a dense numpy J M^-1 J^T built from
    the same S rows and CRBA entries."""
    m = humanoid
    qpos, qvel, _ = _state(m, 7)
    xpos, xquat, S, origin = fp._fk(spec, _rows(qpos))
    inertias = fp._spatial_inertias(spec, xpos, xquat, origin)
    M = fp._crba(spec, S, inertias)
    L0, invd0 = fp._factor(spec, M, [0.0] * spec.nv)

    b1, b2 = pair
    rng = np.random.default_rng(42)
    f_hat = tuple(jnp.asarray(np.float32(v)) for v in rng.normal(size=6))

    w = fp._delassus_inv_mass(spec, L0, invd0, S, b2, f_hat, body1=b1)

    # dense reference
    Md = np.zeros((spec.nv, spec.nv), np.float64)
    for (i, j), v in M.items():
        Md[i, j] = Md[j, i] = float(np.asarray(v).reshape(-1)[0])
    chain2 = set(fp._chain_dofs(spec, b2))
    chain1 = set(fp._chain_dofs(spec, b1)) if b1 >= 0 else set()
    J = np.zeros(spec.nv)
    for i in range(spec.nv):
        coef = (1.0 if i in chain2 else 0.0) - (1.0 if i in chain1 else 0.0)
        if coef:
            si = np.array([float(np.asarray(c).reshape(-1)[0]) if not isinstance(c, float) else c
                           for c in S[i]])
            fh = np.array([float(np.asarray(c).reshape(-1)[0]) for c in f_hat])
            J[i] = coef * float(si @ fh)
    w_dense = float(J @ np.linalg.solve(Md, J))
    w_field = float(np.asarray(w).reshape(-1)[0])
    assert np.isclose(w_field, w_dense, rtol=2e-3, atol=1e-5), (w_field, w_dense)


def test_self_contact_surrogate_flag_both_engines(humanoid):
    """option.self_contact_mass='static' (the round-2/3 harmonic surrogate
    for self rows) must be honored CONSISTENTLY by the einsum engine and
    the field program — same harness/tolerances as
    test_substep_matches_engine, on a crouched state with active foot-foot
    contact (same seed family as test_foot_foot_contact_differential)."""
    m = humanoid.replace(option=humanoid.option.replace(
        self_contact_mass="static"))
    kp, kd = generate_kp_kd_gains()
    spec_off = fp.build_spec(m, kp=kp, kd=kd,
                             fall_allowed_bodies=("right_ankle", "left_ankle"))
    assert spec_off.self_contact_mass == "static"
    qpos, qvel, target = _state(m, 1, z=0.55)
    gains = default_gains()
    d = make_data(m, qpos=jnp.asarray(qpos, jnp.float32),
                  qvel=jnp.asarray(qvel, jnp.float32))
    d = engine_step(m, d, qfrc_fn=lambda mm, dd: implicit_pd(
        mm, dd, jnp.asarray(target, jnp.float32), gains))
    q2, v2, _, _ = fp.substep(spec_off, _rows(qpos), _rows(qvel), _rows(target))
    qf = np.array([float(r[0]) for r in q2])
    vf = np.array([float(r[0]) for r in v2])
    np.testing.assert_allclose(qf, np.asarray(d.qpos), atol=1e-6)
    np.testing.assert_allclose(vf, np.asarray(d.qvel), atol=2e-4)


def test_held_self_contact_mass_trajectory(humanoid):
    """'step' mode (default): engine step_n holds the entry-state
    self-contact masses across the scan; the field program computes them at
    substep 0 and reuses the returned dict. Both must stay in lockstep over
    a 4-substep window with the foot-foot manifold active."""
    from pbrl_tpu.engine.forward import step_n

    m = humanoid
    assert m.option.self_contact_mass == "step"
    kp, kd = generate_kp_kd_gains()
    spec = fp.build_spec(m, kp=kp, kd=kd,
                         fall_allowed_bodies=("right_ankle", "left_ankle"))
    assert spec.self_contact_mass == "step"

    qpos = np.asarray(m.qpos0, np.float64).copy()
    qpos[2] = 1.0    # airborne: isolates foot-foot from floor contacts
    qpos[21] = 0.15  # swing right leg across (same pose as the foot-foot test)
    qpos[22] = 0.05
    gains = default_gains()
    target = np.zeros(m.nu)

    d = make_data(m, qpos=jnp.asarray(qpos, jnp.float32))
    d = step_n(m, d, 4, qfrc_fn=lambda mm, dd: implicit_pd(
        mm, dd, jnp.asarray(target, jnp.float32), gains))

    qrows, vrows = _rows(qpos), _rows(np.zeros(m.nv))
    held = None
    for k in range(4):
        qrows, vrows, _, out = fp.substep(spec, qrows, vrows, _rows(target),
                                          held_self=held)
        if k == 0:
            assert out, "entry substep must emit held self-contact masses"
            held = out
        else:
            assert not out
    qf = np.array([float(r[0]) for r in qrows])
    vf = np.array([float(r[0]) for r in vrows])
    np.testing.assert_allclose(qf, np.asarray(d.qpos), atol=1e-5)
    np.testing.assert_allclose(vf, np.asarray(d.qvel), atol=1e-3)


_SLIDE_XML = """
<mujoco>
  <compiler angle="radian"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="carriage" pos="0 0 0.6">
      <joint name="lift" type="slide" axis="0 0 1" damping="0.5"/>
      <geom name="ball" type="sphere" size="0.12" mass="2"/>
      <body name="arm" pos="0.2 0 0">
        <joint name="swing" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom name="tip" type="sphere" size="0.06" pos="0.25 0 0" mass="0.5"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_slide_joint_differential():
    """SLIDE joints through the field program match the einsum engine.

    Regression for the round-4 constant-folding refactor which left the
    SLIDE branch of ``_fk`` referencing a deleted local (`zero`) — a
    NameError at trace time for any slide-joint model on the field/kernel
    backend, while ``model/mjcf.py`` accepts "slide" and the einsum engine
    supports it (engine/kinematics.py). Scene: a vertical slider falling
    onto the floor with a swinging hinge arm, so the slide DoF exercises
    FK, the Delassus contact mass, and integration, coupled to a hinge.
    """
    from pbrl_tpu.model.mjcf import load_model

    m = load_model(_SLIDE_XML)
    spec = fp.build_spec(m, n_substeps=1, mode="torque")

    qpos = np.asarray(m.qpos0, np.float64).copy()
    qpos[0] = -0.3   # slide down: ball 1 cm above the floor after drop
    qpos[1] = 0.7    # swing the arm off-axis
    qvel = np.array([-0.5, 1.0])

    d = make_data(m, qpos=jnp.asarray(qpos, jnp.float32),
                  qvel=jnp.asarray(qvel, jnp.float32))
    qrows, vrows = _rows(qpos), _rows(qvel)
    for _ in range(6):
        d = engine_step(m, d)
        qrows, vrows, _, _ = fp.substep(spec, qrows, vrows, [])
    qf = np.array([float(r[0]) for r in qrows])
    vf = np.array([float(r[0]) for r in vrows])
    assert np.all(np.isfinite(qf)) and np.all(np.isfinite(vf))
    np.testing.assert_allclose(qf, np.asarray(d.qpos), atol=1e-5)
    np.testing.assert_allclose(vf, np.asarray(d.qvel), atol=1e-3)
