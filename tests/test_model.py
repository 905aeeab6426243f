"""Model compiler tests: built-in humanoid/sphere specs and MJCF round trip.

Dimension facts pinned from the reference model
(``/root/reference/models/final_humanoid.xml``): nq=35, nv=34, nu=28,
13 bodies, 16 body geoms + floor, 8 contact-exclusion pairs (SURVEY.md §6).
"""

import numpy as np
import pytest

from pbrl_tpu.model import (
    GeomType,
    JointType,
    humanoid_model,
    humanoid_spec,
    load_spec,
    sphere_model,
    to_mjcf,
)


def test_humanoid_dimensions():
    m = humanoid_model()
    assert (m.nq, m.nv, m.nu) == (35, 34, 28)
    assert m.nbody == 13
    # 5 spheres + 8 capsules + 2 foot boxes + floor plane (SURVEY.md §2).
    assert m.ngeom == 16
    assert m.njnt == 1 + 28
    assert m.jnt_type[0] == JointType.FREE
    assert all(t == JointType.HINGE for t in m.jnt_type[1:])
    assert m.nsite == 12


def test_humanoid_masses():
    m = humanoid_model()
    # Reference geom masses sum: 6+14+2+2*(1.5+1+0.5+4.5+3+1) = 45 kg
    total = float(np.sum(np.asarray(m.body_mass)))
    np.testing.assert_allclose(total, 45.0, atol=1e-4)


def test_humanoid_actuators():
    m = humanoid_model()
    gears = np.asarray(m.actuator_gear)
    assert gears.min() == 50.0 and gears.max() == 200.0
    cr = np.asarray(m.actuator_ctrlrange)
    np.testing.assert_allclose(cr[:, 0], -0.5)
    np.testing.assert_allclose(cr[:, 1], 0.5)
    # Every actuator drives a distinct hinge dof past the 6 root dofs.
    dofs = sorted(m.actuator_dofadr)
    assert dofs == list(range(6, 34))


def test_contact_pair_filtering():
    m = humanoid_model()
    # Floor pairs: every non-plane geom is a candidate.
    assert m.nplanepair == 15
    # Excluded body pairs must not appear among geom-geom candidates.
    excluded = {
        ("right_hip", "root"), ("left_hip", "root"),
        ("right_hip", "right_knee"), ("left_hip", "left_knee"),
        ("right_knee", "right_ankle"), ("left_knee", "left_ankle"),
        ("right_elbow", "right_shoulder"), ("left_elbow", "left_shoulder"),
    }
    excluded = {tuple(sorted(p)) for p in excluded}
    for g1, g2 in zip(m.pair_geom1, m.pair_geom2):
        b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
        assert b1 != b2
        names = tuple(sorted((m.body_names[b1], m.body_names[b2])))
        assert names not in excluded
        # parent-child filtered
        assert m.body_parent[b1] != b2 and m.body_parent[b2] != b1


def test_sphere_model():
    m = sphere_model()
    assert (m.nq, m.nv, m.nu) == (7, 6, 0)
    assert m.nplanepair == 1 and m.npair == 0
    np.testing.assert_allclose(np.asarray(m.body_mass), [5.0])
    # qpos0 holds the free-body world pose.
    np.testing.assert_allclose(np.asarray(m.qpos0[:3]), [0.0, -1.2, 1.4])
    np.testing.assert_allclose(np.asarray(m.qpos0[3:7]), [1, 0, 0, 0])


def test_mjcf_roundtrip_humanoid():
    spec = humanoid_spec()
    xml = to_mjcf(spec)
    spec2 = load_spec(xml)
    m1, m2 = spec.compile(), spec2.compile()
    assert (m1.nq, m1.nv, m1.nu) == (m2.nq, m2.nv, m2.nu)
    assert m1.body_names == m2.body_names
    assert m1.jnt_type == m2.jnt_type
    assert m1.geom_type == m2.geom_type
    np.testing.assert_allclose(np.asarray(m1.body_pos), np.asarray(m2.body_pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.jnt_range), np.asarray(m2.jnt_range), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.body_mass), np.asarray(m2.body_mass), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.body_inertia), np.asarray(m2.body_inertia), atol=1e-6)
    assert m1.npair == m2.npair and m1.nplanepair == m2.nplanepair


def test_mjcf_fromto_capsule():
    xml = """
    <mujoco>
      <compiler angle="radian"/>
      <worldbody>
        <body name="b" pos="0 0 1">
          <joint name="j" type="free"/>
          <geom name="c" type="capsule" size="0.05" fromto="0 0 -0.2 0 0 0.2" mass="1"/>
        </body>
      </worldbody>
    </mujoco>
    """
    spec = load_spec(xml)
    g = spec.bodies[0].geoms[0]
    assert g.type == GeomType.CAPSULE
    np.testing.assert_allclose(g.size[:2], [0.05, 0.2])
    np.testing.assert_allclose(g.pos, [0, 0, 0], atol=1e-12)


def test_inertia_synthesis_sphere():
    m = sphere_model()
    i = np.asarray(m.body_inertia[0])
    want = 0.4 * 5.0 * 0.1**2
    np.testing.assert_allclose(i, np.eye(3) * want, atol=1e-7)


def test_mjcf_cameras_roundtrip():
    """Tracking cameras survive export -> parse and reach host MuJoCo
    (the reference's back/side views, ``final_humanoid.xml:26-27``)."""
    spec = humanoid_spec()
    cams = {c.name: c for b in spec.bodies for c in b.cameras}
    assert set(cams) == {"back", "side"}
    assert cams["back"].mode == "trackcom"

    xml = to_mjcf(spec)
    spec2 = load_spec(xml)
    cams2 = {c.name: c for b in spec2.bodies for c in b.cameras}
    assert set(cams2) == {"back", "side"}
    np.testing.assert_allclose(cams2["back"].pos, cams["back"].pos)
    np.testing.assert_allclose(cams2["side"].xyaxes, cams["side"].xyaxes)

    mujoco = pytest.importorskip("mujoco")
    mj = mujoco.MjModel.from_xml_string(xml)
    assert mj.ncam == 2
    names = [mj.camera(i).name for i in range(mj.ncam)]
    assert set(names) == {"back", "side"}
