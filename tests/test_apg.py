"""APG trainer: exact-gradient learning, physics differentiability, interop.

The analytic-policy-gradient trainer (train/apg.py) is a capability with no
counterpart in the reference (its MJX physics is a black box to Brax PPO,
``agents_env/agent_env_template.py:14-15``); these tests pin (1) that the
trainer follows exact gradients on a differentiable toy env, (2) that
gradients actually flow through the full physics stack (FK -> CRBA ->
compliant contacts -> implicit Euler -> DeepMimic reward) finite and
nonzero, and (3) checkpoint interop with PPO runs (fine-tune warm start,
eval tooling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrl_tpu.train import APGConfig, make_apg_functions, train_apg
from tests.test_ppo import MatchEnv


def _tiny_config(**kw):
    defaults = dict(num_envs=16, horizon=8, hidden=(32, 32),
                    learning_rate=1e-2, gamma=0.9, value_bootstrap=False,
                    total_env_steps=16 * 8 * 40, seed=0)
    defaults.update(kw)
    return APGConfig(**defaults)


def test_apg_learns_match_env():
    # Reward exp(-||a - obs||^2) is differentiable in the action: the exact
    # gradient should drive matching far faster than likelihood-ratio PPO.
    env = MatchEnv()
    cfg = _tiny_config()
    init, step, evaluate = make_apg_functions(env, cfg)
    ts = init(jax.random.PRNGKey(0))
    step = jax.jit(step)
    first = None
    for _ in range(40):
        ts, metrics = step(ts)
        if first is None:
            first = float(metrics["reward_mean"])
    last = float(metrics["reward_mean"])
    # Random actions give ~exp(-2)~=0.14; exact gradients push toward 1.
    assert last > max(first + 0.3, 0.6), f"no learning: {first} -> {last}"
    ev = evaluate(ts.params, ts.obs_stats, jax.random.PRNGKey(1),
                  num_envs=32, num_steps=16)
    assert float(ev["eval_reward"]) > 0.6


def test_apg_reset_every_restarts_windows():
    """Demonstration-replay mode: reset_every=1 forces a full batch reset
    after every window, so the carried env state is always freshly
    initialised (MatchEnv pins this via its info['t'] step counter, which a
    4-step window would otherwise leave at 4)."""
    env = MatchEnv()
    init, step_free, _ = make_apg_functions(env, _tiny_config(horizon=4))
    init_r, step_reset, _ = make_apg_functions(
        env, _tiny_config(horizon=4, reset_every=1))
    ts = init(jax.random.PRNGKey(0))
    ts_free, _ = jax.jit(step_free)(ts)
    ts_reset, _ = jax.jit(step_reset)(init_r(jax.random.PRNGKey(0)))
    assert np.all(np.asarray(ts_free.env_state.info["t"]) == 4.0)
    assert np.all(np.asarray(ts_reset.env_state.info["t"]) == 0.0)
    # And learning still works in replay mode.
    step_reset = jax.jit(step_reset)
    ts2 = init_r(jax.random.PRNGKey(0))
    first = None
    for _ in range(40):
        ts2, metrics = step_reset(ts2)
        if first is None:
            first = float(metrics["reward_mean"])
    assert float(metrics["reward_mean"]) > max(first + 0.3, 0.6)


def test_apg_value_bootstrap_keeps_critic_frozen():
    env = MatchEnv()
    cfg = _tiny_config(value_bootstrap=True)
    init, step, _ = make_apg_functions(env, cfg)
    ts = init(jax.random.PRNGKey(0))
    before = jax.tree.leaves(ts.params["value"])
    ts2, metrics = jax.jit(step)(ts)
    after = jax.tree.leaves(ts2.params["value"])
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ... while the policy moved and everything stayed finite.
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts.params["policy"]),
                        jax.tree.leaves(ts2.params["policy"])))
    assert moved
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


@pytest.mark.slow
def test_reward_grad_wrt_action_finite_nonzero():
    """d(step reward)/d(action) through one full physics step (FK -> CRBA ->
    contacts -> implicit Euler -> DeepMimic reward) is finite and nonzero.
    Slow: the engine backward pass takes ~8 min to compile cold on CPU (the
    persistent cache amortises reruns)."""
    from pbrl_tpu.envs import EnvConfig, MimicVecEnv
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model

    env = MimicVecEnv(humanoid_model(), load_clip("walk"),
                      EnvConfig(policy_dt=0.004, physics_dt=0.002),
                      backend="xla")
    vs = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), 2))
    g = jax.jit(jax.grad(
        lambda a: jnp.sum(env.step(vs, a).reward)))(
            jnp.zeros((2, env.action_size)))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 0.0


@pytest.mark.slow
def test_apg_gradients_flow_through_physics():
    """d(window loss)/d(policy params) through the real simulator is finite
    and nonzero — the property the whole trainer rests on. Slow: compiles
    the trainer's full backward program (window scan + remat + optimizer)."""
    from pbrl_tpu.envs import EnvConfig, MimicVecEnv
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model

    env = MimicVecEnv(humanoid_model(), load_clip("walk"),
                      EnvConfig(policy_dt=0.004, physics_dt=0.002),
                      backend="xla")
    cfg = APGConfig(num_envs=2, horizon=2, hidden=(16,),
                    value_bootstrap=False, normalize_obs=False)
    init, step, _ = make_apg_functions(env, cfg)
    ts = init(jax.random.PRNGKey(0))
    ts2, metrics = jax.jit(step)(ts)
    gnorm = float(metrics["grad_norm"])
    assert np.isfinite(gnorm) and gnorm > 0.0, f"grad_norm={gnorm}"
    assert np.isfinite(float(metrics["loss"]))
    # The update actually moved the policy.
    l0 = jax.tree.leaves(ts.params["policy"])
    l1 = jax.tree.leaves(ts2.params["policy"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(l0, l1))


def test_apg_train_entry_and_ppo_warm_start(tmp_path):
    """train_apg resume_from a PPO checkpoint: params/obs-stats carried
    over, history produced, APG checkpoint evaluable via the same payload
    schema (params/obs_stats keys) as PPO."""
    from pbrl_tpu.train import TrainConfig, checkpoint as ckpt, make_train_functions

    env = MatchEnv()
    # A tiny PPO run to produce the warm-start checkpoint.
    pcfg = TrainConfig(num_envs=8, unroll_length=4, num_minibatches=2,
                       update_epochs=1, hidden=(32, 32),
                       total_env_steps=8 * 4 * 2, seed=0)
    init_p, _, _ = make_train_functions(env, pcfg)
    ts_p = init_p(jax.random.PRNGKey(3))
    src = str(tmp_path / "ppo")
    ckpt.save(src, ts_p, step=5)

    dst = str(tmp_path / "apg")
    cfg = _tiny_config(num_envs=8, horizon=4, total_env_steps=8 * 4 * 3,
                       hidden=(32, 32))
    params, stats, history = train_apg(env, cfg, checkpoint_dir=dst,
                                       resume_from=src, checkpoint_every=1,
                                       steps_per_call=1)
    # steps_per_call=1 (CLI --steps-per-call): one history row per iteration.
    assert len(history) == cfg.num_iterations
    assert history and "sps" in history[-1]
    # Warm start took the PPO critic verbatim (APG never updates it).
    for a, b in zip(jax.tree.leaves(ts_p.params["value"]),
                    jax.tree.leaves(params["value"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The APG checkpoint restores through the shared payload schema.
    payload = ckpt.restore(dst)
    assert set(payload) >= {"params", "obs_stats", "env_steps"}
    import os
    assert os.path.exists(os.path.join(dst, "apg_config.json"))
    assert os.path.exists(os.path.join(dst, "run_config.json"))
