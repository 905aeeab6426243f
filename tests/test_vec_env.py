"""MimicVecEnv: batched semantics vs the per-env MimicEnv (CPU/xla backend),
plus an interpret-mode run of the Pallas kernel wrapper.

Kept cheap for CPU CI: 2 physics substeps per policy step (policy_dt =
2*physics_dt) and one shared jitted step per backend — the full 8-substep
kernel path is exercised on real TPU by bench.py / training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrl_tpu.envs import EnvConfig, MimicEnv, MimicVecEnv
from pbrl_tpu.envs.humanoid_task import augment_clip
from pbrl_tpu.mocap import load_clip, reference_state
from pbrl_tpu.model import humanoid_model

CFG = EnvConfig(policy_dt=0.004, physics_dt=0.002)  # 2 substeps


@pytest.fixture(scope="module")
def model():
    return humanoid_model()


@pytest.fixture(scope="module")
def walk(model):
    return augment_clip(model, load_clip("walk"))


@pytest.fixture(scope="module")
def venv(model, walk):
    return MimicVecEnv(model, walk, CFG, backend="xla")


@pytest.fixture(scope="module")
def vstep(venv):
    return jax.jit(venv.step)


def test_reset_on_reference(model, venv):
    B = 4
    vs = venv.reset(jax.random.split(jax.random.PRNGKey(0), B))
    assert vs.qpos.shape == (B, model.nq)
    assert vs.obs.shape == (B, venv.observation_size)
    for i in range(B):
        q_ref, _ = reference_state(venv.clip, vs.time[i])
        np.testing.assert_allclose(np.asarray(vs.qpos[i]), np.asarray(q_ref),
                                   atol=1e-5)
    # RSI: distinct phases
    assert float(jnp.std(vs.time)) > 1e-3


@pytest.mark.slow
def test_step_matches_per_env_physics(model, walk, venv, vstep):
    """One vec policy step equals the per-env MimicEnv step (eager)."""
    env = MimicEnv(model, walk, CFG)
    B = 2
    vs = venv.reset(jax.random.split(jax.random.PRNGKey(1), B))
    action = jnp.tile(jnp.asarray(np.linspace(-0.2, 0.2, model.nu),
                                  jnp.float32), (B, 1))
    vs2 = vstep(vs, action)

    from pbrl_tpu.engine.data import make_data
    from pbrl_tpu.engine.kinematics import kinematics
    from pbrl_tpu.envs.base import State

    for i in range(B):  # eager per-env comparison, no extra compiles
        data = make_data(env.model, qpos=vs.qpos[i], qvel=vs.qvel[i])
        data = data.replace(time=vs.time[i])
        data = kinematics(env.model, data)
        s = State(pipeline=data, obs=vs.obs[i], reward=jnp.zeros(()),
                  done=jnp.zeros(()), metrics={},
                  info={"rng": jax.random.PRNGKey(0),
                        "episode_start": vs.time[i]})
        s2 = env.step(s, action[i])
        np.testing.assert_allclose(np.asarray(vs2.qpos[i]),
                                   np.asarray(s2.pipeline.qpos), atol=2e-5)
        np.testing.assert_allclose(np.asarray(vs2.reward[i]),
                                   np.asarray(s2.reward), atol=2e-3)


@pytest.mark.slow
def test_step_advances_time_and_rewards(venv, vstep):
    B = 4
    vs = venv.reset(jax.random.split(jax.random.PRNGKey(2), B))
    q_ref = jax.vmap(lambda t: reference_state(
        venv.clip, t + venv.config.policy_dt)[0])(vs.time)
    action = q_ref[:, venv._qposadr]  # track the reference
    vs2 = vstep(vs, action)
    np.testing.assert_allclose(np.asarray(vs2.time - vs.time), 0.004, atol=1e-6)
    assert float(jnp.min(vs2.reward)) > 0.5  # tracking keeps reward high
    assert bool(jnp.all(jnp.isfinite(vs2.obs)))
    for k in ("reward_pose", "reward_vel", "reward_ee", "reward_com",
              "pose_error", "fall", "step_index"):
        assert vs2.metrics[k].shape == (B,)


def test_auto_reset(venv):
    B = 4
    vs = venv.reset(jax.random.split(jax.random.PRNGKey(3), B))
    done = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    vs = vs.replace(done=done, qpos=vs.qpos.at[:, 2].set(-5.0))
    out = venv.auto_reset(vs, jax.random.split(jax.random.PRNGKey(4), B))
    z = np.asarray(out.qpos[:, 2])
    assert z[0] > 0 and z[2] > 0
    assert z[1] == -5.0 and z[3] == -5.0
    np.testing.assert_allclose(np.asarray(out.done), np.asarray(done))


@pytest.mark.slow
def test_ground_contact_rewarded_without_early_termination(model):
    """Regression: floor-contact tasks (getup) must keep their reward when
    early termination is off — the fall flag used to zero it everywhere."""
    from pbrl_tpu.envs.humanoid_task import augment_clip
    clip = augment_clip(model, load_clip("getup_facedown"))
    venv = MimicVecEnv(model, clip,
                       EnvConfig(policy_dt=0.004, physics_dt=0.002,
                                 early_termination=False,
                                 enforce_joint_limits=False,
                                 reference_state_init=False),
                       backend="xla")
    vs = venv.reset(jax.random.split(jax.random.PRNGKey(7), 2))
    # lying on the floor at the reference: ground contacts active
    q_ref, _ = jax.vmap(lambda t: reference_state(
        venv.clip, t + venv.config.policy_dt))(vs.time)
    vs2 = jax.jit(venv.step)(vs, q_ref[:, venv._qposadr])
    assert float(jnp.max(vs2.metrics["fall"])) == 1.0  # body on the ground...
    assert float(jnp.min(vs2.reward)) > 0.3            # ...but still rewarded
    assert float(jnp.max(vs2.done)) == 0.0             # and not terminated


def test_kernel_interpret_wrapper_mechanics():
    """The Pallas wrapper (interpret mode): packing, padding to the 1024-env
    tile, in-kernel substep loop and outputs — on the tiny sphere scene.

    (The humanoid kernel math itself is covered by the eager differential
    tests in test_field_physics.py; interpreting its ~50k-op program is far
    too slow for CI, so wrapper mechanics are validated on the small model.)
    """
    from pbrl_tpu.model import sphere_model
    from pbrl_tpu.ops.mimic_kernel import build_mimic_step

    m = sphere_model()
    kstep, spec = build_mimic_step(m, n_substeps=3, interpret=True)
    B = 5  # deliberately not a multiple of the tile: exercises padding
    qpos = jnp.tile(jnp.asarray(m.qpos0), (B, 1))
    qvel = jnp.zeros((B, m.nv))
    u = jnp.zeros((B, 1))
    q2, v2, xpos, xquat, fall = kstep(qpos, qvel, u)
    assert q2.shape == (B, m.nq) and v2.shape == (B, m.nv)
    assert xpos.shape == (B, 1, 3) and xquat.shape == (B, 1, 4)
    # 3 substeps of free fall: vz = -g*h*3 on every (unpadded) env.
    h = float(m.option.timestep)
    np.testing.assert_allclose(np.asarray(v2[:, 2]), -9.81 * h * 3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xpos[:, 0, 2]), np.asarray(q2[:, 2]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fall), 0.0)


def test_rsi_phase_bias_shifts_resets(model, walk):
    """rsi_phase_bias > 0 biases reset phases toward the end of the clip
    (landing-curriculum knob for ballistic skills); 0 stays uniform."""
    import dataclasses

    rngs = jax.random.split(jax.random.PRNGKey(11), 512)
    t_uniform = MimicVecEnv(model, walk, CFG, backend="xla").reset(rngs).time
    late_cfg = dataclasses.replace(CFG, rsi_phase_bias=2.0)
    t_late = MimicVecEnv(model, walk, late_cfg, backend="xla").reset(rngs).time
    hi = float(walk.cycle_time)
    # uniform mean ~ hi/2; bias 2.0 -> E[u^(1/3)] = 3/4
    assert abs(float(t_uniform.mean()) - 0.5 * hi) < 0.05 * hi
    assert float(t_late.mean()) > 0.65 * hi
    assert float(t_late.max()) <= hi
