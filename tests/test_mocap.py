"""Mocap ingestion golden tests.

Clip facts pinned from the reference data files (SURVEY.md §2/§6): frame
counts, durations and loop modes of the 7 bundled DeepMimic clips. Internal
consistency: Euler decomposition must recompose to the aligned quaternions,
and finite-difference velocities must integrate back to the next frame.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbrl_tpu.mocap import (
    load_clip,
    parse_deepmimic,
    phase,
    reference_frame_index,
    reference_state,
)
from pbrl_tpu.mocap.convert import _euler_rxyz, _qmul, align_position, align_rotation
from pbrl_tpu.mocap.skeleton import generate_kp_kd_gains

CLIP_FACTS = {
    # name: (frames, total_time, loop)
    "walk": (39, 1.2666, "wrap"),
    "backflip": (29, 1.75, "wrap"),
    "jump": (107, 1.7655, "wrap"),
    "kick": (47, 1.5510, "none"),
    "punch": (65, 2.1450, "none"),
    "getup_facedown": (183, 3.0195, "none"),
    "getup_faceup": (227, 3.7665, "none"),
}


@pytest.mark.parametrize("name", sorted(CLIP_FACTS))
def test_clip_facts(name):
    frames, total, loop = CLIP_FACTS[name]
    import os
    p = parse_deepmimic(os.path.join(os.path.dirname(__file__), "..", "assets",
                                     "motions", f"humanoid3d_{name}.txt"))
    assert p.num_frames == frames
    assert p.loop == loop
    np.testing.assert_allclose(p.total_time, total, atol=0.02)
    assert p.qpos.shape == (frames, 35)
    assert p.qvel.shape == (frames, 34)
    # Root quaternions are unit.
    np.testing.assert_allclose(np.linalg.norm(p.qpos[:, 3:7], axis=-1), 1.0, atol=1e-9)


def test_align_position():
    np.testing.assert_allclose(align_position(np.array([1.0, 2.0, 3.0])), [1.0, -3.0, 2.0])


def test_align_rotation_is_frame_conjugation():
    # Rotating v_mocap by q then mapping to mujoco == mapping then rotating by q'.
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        v = rng.normal(size=3)

        def rot(q, v):
            w, x, y, z = q
            m = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ])
            return m @ v

        lhs = align_position(rot(q, v))
        rhs = rot(align_rotation(q), align_position(v))
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_euler_recomposes_quaternion():
    # _euler_rxyz must be the exact inverse of composing x-y-z hinge triples.
    rng = np.random.default_rng(1)
    for _ in range(50):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        a, b, c = _euler_rxyz(q)

        def axis_q(axis, ang):
            out = np.zeros(4)
            out[0] = np.cos(ang / 2)
            out[1 + axis] = np.sin(ang / 2)
            return out

        q2 = _qmul(axis_q(0, a), _qmul(axis_q(1, b), axis_q(2, c)))
        if np.dot(q2, q) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-9)


def test_velocity_integrates_to_next_frame():
    p = parse_deepmimic(_clip_path("walk"))
    # Joint angles: qpos[k] ~= qpos[k-1] + dt * qvel[k] (euler_rate mode).
    for k in range(1, p.num_frames):
        dt = p.durations[k - 1]
        np.testing.assert_allclose(
            p.qpos[k, 7:], p.qpos[k - 1, 7:] + dt * p.qvel[k, 6:], atol=1e-8)
        np.testing.assert_allclose(
            p.qpos[k, :3], p.qpos[k - 1, :3] + dt * p.qvel[k, :3], atol=1e-8)


def _clip_path(name):
    import os
    return os.path.join(os.path.dirname(__file__), "..", "assets", "motions",
                        f"humanoid3d_{name}.txt")


def test_walk_physically_plausible():
    p = parse_deepmimic(_clip_path("walk"))
    # Root stays upright at ~0.8-1.0 m, and walks forward in x.
    assert 0.6 < p.qpos[:, 2].min() and p.qpos[:, 2].max() < 1.1
    assert abs(p.qpos[-1, 0] - p.qpos[0, 0]) > 0.5  # covers ground
    # All joint angles within generous physical bounds.
    assert np.abs(p.qpos[:, 7:]).max() < np.pi


def test_reference_state_lookup():
    clip = load_clip("walk")
    # t = k * dt hits frame k exactly.
    for k in [0, 5, 20]:
        q, v = reference_state(clip, jnp.asarray(float(k) * float(clip.dt)))
        np.testing.assert_allclose(np.asarray(q), np.asarray(clip.qpos[k]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), np.asarray(clip.qvel[k]), atol=1e-4)
    assert int(reference_frame_index(clip, jnp.asarray(0.1))) == int(0.1 / float(clip.dt))


def test_reference_state_wraps_with_offset():
    clip = load_clip("walk")  # wrap clip
    t0 = jnp.asarray(0.02)
    t1 = t0 + clip.cycle_time
    q0, _ = reference_state(clip, t0)
    q1, _ = reference_state(clip, t1)
    # Same pose modulo the horizontal cycle offset.
    np.testing.assert_allclose(
        np.asarray(q1[:3] - q0[:3]), np.asarray(clip.cycle_offset), atol=1e-3)
    np.testing.assert_allclose(np.asarray(q1[3:]), np.asarray(q0[3:]), atol=1e-3)
    # Phase is periodic.
    np.testing.assert_allclose(float(phase(clip, t0)), float(phase(clip, t1)), atol=1e-4)


def test_reference_state_clamps_nonloop():
    clip = load_clip("kick")
    q_end, _ = reference_state(clip, clip.cycle_time + 5.0)
    np.testing.assert_allclose(np.asarray(q_end), np.asarray(clip.qpos[-1]), atol=1e-5)


def test_lookup_is_jittable():
    clip = load_clip("walk")
    f = jax.jit(lambda t: reference_state(clip, t))
    q, v = f(jnp.asarray(0.5))
    assert q.shape == (35,) and v.shape == (34,)
    assert bool(jnp.all(jnp.isfinite(q)))


def test_gains_table():
    kp, kd = generate_kp_kd_gains()
    assert kp.shape == (28,) and kd.shape == (28,)
    assert kp.min() == 100.0 and kp.max() == 1000.0
    assert kd.min() == 10.0 and kd.max() == 100.0
    np.testing.assert_allclose(kp / kd, 10.0)


def test_unknown_clip_errors():
    with pytest.raises(FileNotFoundError) as e:
        load_clip("moonwalk")
    assert "walk" in str(e.value)  # lists available clips


def test_nonuniform_dt_resampled():
    """A clip with varying frame durations is resampled onto a uniform grid
    (the reference's ``duration_dict`` per-frame-dt generality,
    SimpleConverter.py:226-238) instead of mis-indexed or rejected."""
    import json

    import numpy as np

    from pbrl_tpu.mocap.clip import from_parsed

    with open(_clip_path("walk")) as f:
        data = json.load(f)
    data["Frames"] = data["Frames"][:6]
    data["Frames"][2][0] = 2.0 * data["Frames"][0][0]  # stretch one interval
    p = parse_deepmimic(json.dumps(data))
    total = p.total_time
    clip = from_parsed(p, name="synthetic")
    # uniform grid at the median interval, same overall duration (within dt)
    dt = float(clip.dt)
    assert abs(dt - np.median(np.asarray(p.durations[:-1]))) < 1e-6
    assert abs(float(clip.cycle_time) - (clip.num_frames - 1) * dt) < 1e-6
    assert abs(float(clip.cycle_time) - total) < dt
    # resampled poses track the originals at the original frame times
    t2 = float(p.cum_time[2])  # original frame 2 start time
    q_at, _ = reference_state(clip, jnp.asarray(t2))
    np.testing.assert_allclose(np.asarray(q_at), p.qpos[2], atol=5e-3)
    # root quat stays normalised everywhere
    norms = np.linalg.norm(np.asarray(clip.qpos[:, 3:7]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # All bundled clips are uniform and load unchanged.
    for name in CLIP_FACTS:
        load_clip(name)
