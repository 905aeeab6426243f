"""PPO trainer tests: GAE math, running stats, learning, SPMD sharding.

The multi-device test runs on the 8-virtual-device CPU mesh from conftest —
the standard JAX fake-multi-device trick SURVEY.md §4 prescribes (nothing
equivalent existed in the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrl_tpu.envs.base import Env, State
from pbrl_tpu.parallel import make_mesh
from pbrl_tpu.train import TrainConfig, compute_gae, make_train_functions, running_stats, train


# ---------------------------------------------------------------------------
# Unit: GAE
# ---------------------------------------------------------------------------


def test_gae_matches_reference_recursion():
    T, B = 5, 3
    rng = np.random.default_rng(0)
    r = rng.normal(size=(T, B)).astype(np.float32)
    d = (rng.uniform(size=(T, B)) < 0.3).astype(np.float32)
    v = rng.normal(size=(T, B)).astype(np.float32)
    boot = rng.normal(size=(B,)).astype(np.float32)
    gamma, lam = 0.97, 0.9

    adv, ret = compute_gae(jnp.asarray(r), jnp.asarray(d), jnp.asarray(v),
                           jnp.asarray(boot), gamma, lam)

    # Python reference recursion.
    want = np.zeros((T, B), np.float32)
    gae = np.zeros(B, np.float32)
    v_all = np.concatenate([v, boot[None]], axis=0)
    for t in reversed(range(T)):
        delta = r[t] + gamma * (1 - d[t]) * v_all[t + 1] - v[t]
        gae = delta + gamma * lam * (1 - d[t]) * gae
        want[t] = gae
    np.testing.assert_allclose(np.asarray(adv), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), want + v, atol=1e-5)


def test_gae_done_cuts_bootstrap():
    # A done at t means no value flows back from t+1.
    r = jnp.zeros((2, 1))
    d = jnp.asarray([[1.0], [0.0]])
    v = jnp.zeros((2, 1))
    boot = jnp.asarray([100.0])
    adv, _ = compute_gae(r, d, v, boot, 0.99, 0.95)
    assert float(adv[0, 0]) == 0.0  # bootstrap blocked by done
    assert float(adv[1, 0]) > 90.0


# ---------------------------------------------------------------------------
# Unit: running stats
# ---------------------------------------------------------------------------


def test_running_stats_matches_numpy():
    rng = np.random.default_rng(1)
    stats = running_stats.init(4)
    chunks = [rng.normal(loc=3.0, scale=2.0, size=(50, 4)).astype(np.float32)
              for _ in range(5)]
    for c in chunks:
        stats = running_stats.update(stats, jnp.asarray(c))
    allc = np.concatenate(chunks)
    np.testing.assert_allclose(np.asarray(stats.mean), allc.mean(0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats.std), allc.std(0), rtol=2e-2)
    z = running_stats.normalize(stats, jnp.asarray(allc))
    assert abs(float(jnp.mean(z))) < 0.05


def test_policy_log_std_clamped():
    # Exploration sigma is hard-bounded to [0.1, 2.0] rad: a runaway
    # entropy bonus (arm Q) or a strong negative-entropy anneal must not
    # push the effective std outside a healthy range.
    from pbrl_tpu.train.networks import PolicyNetwork

    obs = jnp.zeros((3, 5))
    for init, expect in ((-5.0, -2.3), (2.0, 0.7), (-1.0, -1.0)):
        net = PolicyNetwork(action_size=4, hidden=(8,), init_log_std=init)
        params = net.init(jax.random.PRNGKey(0), obs)
        _, log_std = net.apply(params, obs)
        np.testing.assert_allclose(np.asarray(log_std), expect, atol=1e-6)


# ---------------------------------------------------------------------------
# A tiny synthetic env implementing the Env protocol: the agent must output
# action == obs to maximise reward. Verifies the full PPO loop cheaply.
# ---------------------------------------------------------------------------


class MatchEnv(Env):
    OBS, ACT = 3, 3

    @property
    def observation_size(self):
        return self.OBS

    @property
    def action_size(self):
        return self.ACT

    def reset(self, rng):
        obs = jax.random.uniform(rng, (self.OBS,), minval=-1, maxval=1)
        from pbrl_tpu.engine.data import Data  # placeholder pipeline slot

        return State(pipeline=None, obs=obs, reward=jnp.zeros(()),
                     done=jnp.zeros(()), metrics={"pose_error": jnp.zeros(())},
                     info={"rng": rng, "t": jnp.zeros(())})

    def step(self, state, action):
        reward = jnp.exp(-jnp.sum((action - state.obs) ** 2))
        rng, k = jax.random.split(state.info["rng"])
        obs = jax.random.uniform(k, (self.OBS,), minval=-1, maxval=1)
        t = state.info["t"] + 1
        done = (t >= 8).astype(jnp.float32)
        return state.replace(obs=obs, reward=reward, done=done,
                             info={"rng": rng, "t": t * (1 - done)})


def _tiny_config(**kw):
    defaults = dict(num_envs=16, unroll_length=8, num_minibatches=2,
                    update_epochs=2, hidden=(32, 32), learning_rate=3e-3,
                    total_env_steps=16 * 8 * 60, seed=0)
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_ppo_learns_match_env():
    env = MatchEnv()
    cfg = _tiny_config()
    init, step, evaluate = make_train_functions(env, cfg)
    ts = init(jax.random.PRNGKey(0))
    step = jax.jit(step)
    first = None
    for i in range(60):
        ts, metrics = step(ts)
        if first is None:
            first = float(metrics["reward_mean"])
    last = float(metrics["reward_mean"])
    # Random actions give ~exp(-2)≈0.14 mean; matching pushes toward 1.
    assert last > first + 0.2, f"no learning: {first} -> {last}"
    ev = evaluate(ts.params, ts.obs_stats, jax.random.PRNGKey(1), num_envs=32,
                  num_steps=16)
    assert float(ev["eval_reward"]) > last - 0.2


def test_train_entry_runs_and_returns_history():
    env = MatchEnv()
    params, stats, history = train(env, _tiny_config(total_env_steps=16 * 8 * 5))
    assert history, "no metrics recorded"
    assert "sps" in history[-1] and history[-1]["sps"] > 0
    assert "reward_mean" in history[-1]


def test_train_step_sharded_over_mesh():
    """One SPMD train step over the 8-device CPU mesh: params replicated,
    env batch sharded, identical result to single-device execution."""
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    env = MatchEnv()
    cfg = _tiny_config(num_envs=32)
    init, step, _ = make_train_functions(env, cfg)
    ts = init(jax.random.PRNGKey(0))

    from pbrl_tpu.parallel import replicated, sharded_batch_spec

    mesh = make_mesh()
    batch_sh = sharded_batch_spec(mesh)
    repl = replicated(mesh)
    sh = jax.tree.map(lambda _: repl, ts)
    sh = sh.replace(env_state=jax.tree.map(lambda _: batch_sh, ts.env_state))
    ts_sharded = jax.device_put(ts, sh)
    stepped, metrics = jax.jit(step, in_shardings=(sh,), out_shardings=(sh, repl))(
        ts_sharded)

    # Same math as the unsharded program.
    stepped1, metrics1 = jax.jit(step)(ts)
    np.testing.assert_allclose(float(metrics["reward_mean"]),
                               float(metrics1["reward_mean"]), atol=1e-4)
    leaf = jax.tree.leaves(stepped.params)[0]
    np.testing.assert_allclose(np.asarray(leaf),
                               np.asarray(jax.tree.leaves(stepped1.params)[0]),
                               atol=2e-5)
    # Env batch stayed sharded across devices.
    assert len(stepped.env_state.obs.sharding.device_set) == 8


def test_checkpoint_roundtrip(tmp_path):
    from pbrl_tpu.train import checkpoint as ckpt

    env = MatchEnv()
    cfg = _tiny_config()
    init, step, _ = make_train_functions(env, cfg)
    ts = init(jax.random.PRNGKey(0))
    ckpt.save(str(tmp_path / "ck"), ts, step=7)
    assert ckpt.latest_step(str(tmp_path / "ck")) == 7
    out = ckpt.restore(str(tmp_path / "ck"))
    got = jax.tree.leaves(out["params"])[0]
    want = jax.tree.leaves(ts.params)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_train_step_sharded_physics_env():
    """One SPMD train step over the REAL physics env (MimicVecEnv, 2
    substeps) on the 8-device CPU mesh — the suite-resident version of
    __graft_entry__.dryrun_multichip (VERDICT r1: the only sharded run of
    the physics env lived outside the suite)."""
    from pbrl_tpu.envs import EnvConfig, MimicVecEnv
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model
    from pbrl_tpu.parallel import replicated, sharded_batch_spec

    assert jax.device_count() >= 8
    env = MimicVecEnv(humanoid_model(), load_clip("walk"),
                      EnvConfig(policy_dt=0.004), backend="xla")
    cfg = TrainConfig(num_envs=16, unroll_length=2, num_minibatches=2,
                      update_epochs=1, hidden=(32, 32))
    init, step, _ = make_train_functions(env, cfg)
    ts = init(jax.random.PRNGKey(0))

    mesh = make_mesh()
    batch_sh = sharded_batch_spec(mesh)
    repl = replicated(mesh)
    sh = jax.tree.map(lambda _: repl, ts)
    sh = sh.replace(env_state=jax.tree.map(lambda _: batch_sh, ts.env_state))
    ts = jax.device_put(ts, sh)
    stepped, metrics = jax.jit(step, in_shardings=(sh,),
                               out_shardings=(sh, repl))(ts)
    assert np.isfinite(float(metrics["reward_mean"]))
    assert float(metrics["reward_mean"]) > 0.0  # RSI start: near-reference
    assert len(stepped.env_state.obs.sharding.device_set) == 8


def test_resume_continues_checkpoint_numbering(tmp_path):
    """A resumed run must save checkpoints numbered AFTER the restored one
    (orbax latest_step is max(step); restarting at step 1 made resumed
    checkpoints invisible — the r2 backflip polish run lost 500M steps of
    training to this)."""
    from pbrl_tpu.train import checkpoint as ckpt

    env = MatchEnv()
    cfg = _tiny_config(total_env_steps=16 * 8 * 10)
    d = str(tmp_path / "run")
    train(env, cfg, checkpoint_dir=d, checkpoint_every=5, steps_per_call=5)
    first = ckpt.latest_step(d)
    assert first == cfg.num_iterations
    train(env, cfg, checkpoint_dir=d, checkpoint_every=5, steps_per_call=5)
    second = ckpt.latest_step(d)
    assert second == 2 * cfg.num_iterations, (first, second)
