"""Environment tests: replay playback, mimic reward/termination/RSI.

Test strategy per SURVEY.md §4: the replay env is the reference's own first
milestone (``testing_forward_env.ipynb``), validated here by numeric
properties instead of watching videos — frame lookups land on clip frames,
a jitted whole-clip rollout stays finite, and mimicking from the reference
state yields near-maximal reward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrl_tpu.envs import (
    EnvConfig,
    MimicEnv,
    ReplayEnv,
    get_environment,
    registered_environments,
    variant2,
)
from pbrl_tpu.envs.humanoid_task import augment_clip, ee_positions, center_of_mass
from pbrl_tpu.mocap import load_clip, reference_state
from pbrl_tpu.model import humanoid_model


@pytest.fixture(scope="module")
def model():
    return humanoid_model()


@pytest.fixture(scope="module")
def walk(model):
    return augment_clip(model, load_clip("walk"))


@pytest.fixture(scope="module")
def mimic(model, walk):
    return MimicEnv(model, walk, EnvConfig())


def test_registry():
    assert "humanoid_replay" in registered_environments()
    assert "humanoid_mimic" in registered_environments()
    env = get_environment("humanoid_replay", clip="walk")
    assert isinstance(env, ReplayEnv)
    with pytest.raises(KeyError):
        get_environment("nope")


# ---------------------------------------------------------------------------
# Replay
# ---------------------------------------------------------------------------


def test_replay_hits_clip_frames(model, walk):
    env = ReplayEnv(model, walk)
    s = env.at_frame(10)
    np.testing.assert_allclose(
        np.asarray(s.pipeline.qpos), np.asarray(walk.qpos[10]), atol=1e-4)
    assert int(s.metrics["step_index"]) == 10
    # FK actually ran: feet near the ground for a walk pose.
    assert float(s.pipeline.xpos[:, 2].min()) < 0.2


def test_replay_rollout_scan(model, walk):
    env = ReplayEnv(model, walk)
    states = jax.jit(lambda: env.rollout(80))()
    assert states.obs.shape == (80, env.observation_size)
    assert bool(jnp.all(jnp.isfinite(states.obs)))
    # Walk wraps: forward progress should roughly keep accumulating.
    x = np.asarray(states.pipeline.qpos[:, 0])
    assert x[-1] > x[0]


def test_replay_partial_body(model, walk):
    # Only the right arm follows the clip; everything else holds qpos0.
    mask = np.zeros(model.nq)
    for jn in ("right_shoulder_x", "right_shoulder_y", "right_shoulder_z", "right_elbow"):
        j = model.joint_id(jn)
        mask[model.jnt_qposadr[j]] = 1.0
    env = ReplayEnv(model, walk, qpos_mask=jnp.asarray(mask))
    s = env.at_frame(15)
    q = np.asarray(s.pipeline.qpos)
    j = model.joint_id("left_elbow")
    assert q[model.jnt_qposadr[j]] == 0.0  # left arm untouched
    j = model.joint_id("right_elbow")
    np.testing.assert_allclose(
        q[model.jnt_qposadr[j]], float(walk.qpos[15, model.jnt_qposadr[j]]), atol=1e-4)


# ---------------------------------------------------------------------------
# Mimic
# ---------------------------------------------------------------------------


def test_mimic_reset_rsi(mimic):
    s0 = mimic.reset(jax.random.PRNGKey(0))
    s1 = mimic.reset(jax.random.PRNGKey(1))
    # RSI: different keys land at different clip phases.
    assert float(jnp.abs(s0.pipeline.time - s1.pipeline.time)) > 1e-3
    assert s0.obs.shape == (mimic.observation_size,)
    assert float(s0.done) == 0.0


def test_mimic_reset_matches_reference_pose(mimic):
    s = mimic.reset(jax.random.PRNGKey(3))
    q_ref, v_ref = reference_state(mimic.clip, s.pipeline.time)
    np.testing.assert_allclose(np.asarray(s.pipeline.qpos), np.asarray(q_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.pipeline.qvel), np.asarray(v_ref), atol=1e-5)


@pytest.mark.slow
def test_mimic_reward_near_max_on_reference(mimic):
    """Tracking the reference with Stable PD from the reference state keeps
    the imitation reward high for several policy steps."""
    env = mimic
    s = env.reset(jax.random.PRNGKey(0))

    def body(s, _):
        # perfect-information action: next reference pose as PD target
        q_ref, _ = reference_state(env.clip, s.pipeline.time + env.config.policy_dt)
        action = q_ref[jnp.asarray(env.model.actuator_qposadr)]
        s = env.step(s, action)
        return s, s.reward

    # Open-loop PD tracking has no balance feedback, so it drifts and can
    # topple a few hundred ms after a mid-stride RSI reset; assert the
    # window where tracking is meaningful.
    s, rewards = jax.jit(lambda s: jax.lax.scan(body, s, None, length=6))(s)
    rewards = np.asarray(rewards)
    assert rewards.min() > 0.6, f"tracking rewards {rewards}"
    assert rewards.max() <= 1.0 + 1e-6


def test_mimic_reward_low_when_off_reference(mimic):
    s = mimic.reset(jax.random.PRNGKey(0))
    # Scramble the pose badly and re-evaluate.
    bad = s.pipeline.replace(qpos=s.pipeline.qpos.at[7:].add(1.5))
    from pbrl_tpu.engine.kinematics import kinematics

    bad = kinematics(mimic.model, bad)
    r_bad, _ = mimic._reward(bad, jnp.asarray(False))
    r_good, _ = mimic._reward(s.pipeline, jnp.asarray(False))
    assert float(r_bad) < 0.2 < float(r_good)


@pytest.mark.slow
def test_mimic_fall_terminates(model, walk):
    env = MimicEnv(model, walk, EnvConfig(reference_state_init=False))
    s = env.reset(jax.random.PRNGKey(0))
    # Zero action + gravity: the humanoid crumples; within 2 s a non-foot
    # body touches the floor and the episode must end.
    def body(s, _):
        s = env.step(s, jnp.zeros(env.action_size))
        return s, (s.done, s.metrics["fall"])

    s, (dones, falls) = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=120))(s)
    assert float(jnp.max(dones)) == 1.0
    assert float(jnp.max(falls)) == 1.0


@pytest.mark.slow
def test_mimic_nonloop_clip_ends(model):
    clip = augment_clip(model, load_clip("kick"))
    env = MimicEnv(model, clip, EnvConfig(reference_state_init=False,
                                          early_termination=False))
    s = env.reset(jax.random.PRNGKey(0))
    n = int(float(clip.cycle_time) / env.config.effective_policy_dt) + 2

    def body(s, _):
        s = env.step(s, jnp.zeros(env.action_size))
        return s, s.done

    _, dones = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n))(s)
    assert float(dones[-1]) == 1.0


@pytest.mark.slow
def test_mimic_variant2_substeps(model, walk):
    cfg = variant2()
    assert cfg.n_substeps == 40
    env = MimicEnv(model, walk, cfg)
    s = env.reset(jax.random.PRNGKey(0))
    s = jax.jit(env.step)(s, jnp.zeros(env.action_size))
    np.testing.assert_allclose(
        float(s.pipeline.time - s.info["episode_start"]), 1 / 30, atol=1e-5)


@pytest.mark.slow
def test_mimic_vmapped_batch(mimic):
    B = 4
    rngs = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(mimic.reset)(rngs)
    actions = jnp.zeros((B, mimic.action_size))
    stepped = jax.jit(jax.vmap(mimic.step))(states, actions)
    assert stepped.obs.shape == (B, mimic.observation_size)
    assert bool(jnp.all(jnp.isfinite(stepped.obs)))


def test_ee_and_com_shapes(model, walk):
    assert walk.ee_pos.shape == (39, 4, 3)
    assert walk.com.shape == (39, 3)
    # COM height plausible for walking.
    com_z = np.asarray(walk.com[:, 2])
    assert 0.5 < com_z.min() and com_z.max() < 1.2


@pytest.mark.slow
def test_torque_action_mode(model, walk):
    env = MimicEnv(model, walk, EnvConfig(action_mode="torque"))
    s = env.reset(jax.random.PRNGKey(0))
    s = jax.jit(env.step)(s, jnp.full((env.action_size,), 0.1))
    assert bool(jnp.all(jnp.isfinite(s.obs)))
