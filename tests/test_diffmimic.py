"""DiffMimic .npy clip loader: the reference's dormant asset, realised."""

import numpy as np
import pytest

import jax.numpy as jnp

from pbrl_tpu.engine.data import make_data
from pbrl_tpu.engine.kinematics import kinematics
from pbrl_tpu.mocap import load_clip
from pbrl_tpu.mocap.diffmimic import parse_diffmimic_npy
from pbrl_tpu.model import humanoid_model

PATH = "assets/motion_diffmimic/walk_fps_30_20s.npy"


@pytest.fixture(scope="module")
def clip():
    import os

    return parse_diffmimic_npy(
        os.path.join(os.path.dirname(__file__), "..", PATH))


def test_shape_and_facts(clip):
    # Reference facts (SURVEY.md §2): 601 frames, 30 fps, 20 s walk.
    assert clip.num_frames == 601
    np.testing.assert_allclose(clip.total_time, 601 / 30.0, atol=1e-6)
    assert clip.loop == "wrap"
    assert clip.qpos.shape == (601, 35)
    assert clip.qvel.shape == (601, 34)


def test_physically_plausible_walk(clip):
    z = clip.qpos[:, 2]
    assert 0.8 < z.min() and z.max() < 0.95      # upright throughout
    assert clip.qpos[-1, 0] - clip.qpos[0, 0] > 15  # 20 s of forward walking
    assert np.abs(clip.qpos[:, 7:]).max() < 1.6     # sane joint angles
    np.testing.assert_allclose(
        np.linalg.norm(clip.qpos[:, 3:7], axis=1), 1.0, atol=1e-9)


def test_fk_feet_on_ground(clip):
    m = humanoid_model()
    d = kinematics(m, make_data(m, qpos=jnp.asarray(clip.qpos[0], jnp.float32)))
    assert float(d.xpos[:, 2].min()) < 0.12  # a foot is near the floor


def test_velocity_consistency(clip):
    dt = clip.durations[0]
    np.testing.assert_allclose(
        clip.qpos[10, 7:], clip.qpos[9, 7:] + dt * clip.qvel[10, 6:], atol=1e-8)


def test_load_clip_npy_path():
    c = load_clip(PATH)
    assert c.num_frames == 601 and c.loop
    with pytest.raises(FileNotFoundError):
        load_clip("nope.npy")
