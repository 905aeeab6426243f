"""Analytic-policy-gradient (APG / SHAC-style) trainer over the differentiable simulator.

A training mode the CUDA/torch reference cannot offer: its physics (external
MJX driven through Brax, ``agents_env/agent_env_template.py:14-15``) is
consumed as a black box by likelihood-ratio PPO. Here the whole simulator —
FK, CRBA, compliant contacts, implicit-PD, implicit Euler — is one pure JAX
program, so the DeepMimic imitation reward is differentiable end-to-end with
respect to the policy parameters and the trainer can follow the *exact*
gradient of the short-horizon return instead of a high-variance Monte-Carlo
estimate of it (SHAC, Xu et al. 2022; DiffMimic, Ren et al. 2023 — PAPERS.md).

Design
------
* Truncated-BPTT windows of ``horizon`` policy steps over the batched env.
  The window's entry state is ``stop_gradient``-ed (truncation) and each
  policy step is rematerialised (``jax.checkpoint``) so backward memory is
  one step deep regardless of horizon.
* Loss ``L = -E_b[ sum_t gamma^t r_t alive_t + gamma^H V(s_H) alive_H ] / H``
  with a FROZEN critic (e.g. restored from a PPO run) supplying the tail
  value through a differentiable observation; rewards are alive-masked after
  termination (``done`` itself is stop-gradiented — it is a step indicator,
  not a differentiable quantity).
* Deterministic actions (the policy mean) by default; ``action_noise`` adds
  reparameterised Gaussian exploration, which stays differentiable.
* Only the policy subtree is updated; the critic and observation statistics
  ride along frozen so an APG fine-tune composes with ``pbrl eval`` /
  parity tooling exactly like a PPO checkpoint.
* Must run on the XLA/einsum backend (``MimicVecEnv(backend="xla")``): the
  fused Pallas kernel (ops/mimic_kernel.py) defines no VJP. The einsum
  engine's compliant contact model is smooth by construction — the property
  that makes this trainer possible.

Gradient hygiene: the quaternion geodesic angle in the pose reward uses a
custom JVP (maths/quaternion.py:angle_between) because raw ``arccos``
autodiff returns NaN exactly at perfect tracking; a residual ``zero_nans``
transform plus global-norm clipping contains any remaining
poisoned-trajectory gradients (the env already sanitises forward NaNs,
envs/vec.py:449-456).
"""

from __future__ import annotations

import dataclasses
import functools
import time as _time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pbrl_tpu.envs.base import Env
from pbrl_tpu.parallel import make_mesh, replicated, sharded_batch_spec
from pbrl_tpu.train import networks, running_stats


@dataclasses.dataclass(frozen=True)
class APGConfig:
    num_envs: int = 256
    horizon: int = 32            # truncated-BPTT window, in policy steps
    learning_rate: float = 2e-5
    lr_decay: bool = True
    gamma: float = 0.95
    value_bootstrap: bool = True  # frozen critic closes the horizon
    action_noise: float = 0.0     # reparameterised exploration std (rad)
    max_grad_norm: float = 1.0
    normalize_obs: bool = True
    update_obs_stats: bool = False  # fine-tunes keep the PPO stats frozen
    # Demonstration replay (DiffMimic, Ren et al. 2023): force a FULL batch
    # reset every k iterations (0 disables; 1 = every window starts from a
    # fresh reference-state init). Long free rollouts of a chaotic clip
    # push the state off the demonstration manifold where the exact BPTT
    # gradient explodes and anti-correlates with the true improvement
    # direction; restarting windows from RSI states keeps every gradient
    # evaluated near the reference, where it is informative.
    reset_every: int = 0
    hidden: tuple = (1024, 512)
    total_env_steps: int = 2_000_000
    seed: int = 0
    init_log_std: float = -1.0
    fixed_log_std: bool = False
    remat: bool = True

    @property
    def steps_per_iteration(self) -> int:
        return self.num_envs * self.horizon

    @property
    def num_iterations(self) -> int:
        return max(1, self.total_env_steps // self.steps_per_iteration)


@struct.dataclass
class APGTrainState:
    params: dict                   # {"policy": ..., "value": ...} (critic frozen)
    opt_state: optax.OptState      # over params["policy"] only
    obs_stats: running_stats.RunningStats
    env_state: object              # batched env state (num_envs leading axis)
    rng: jnp.ndarray
    env_steps: jnp.ndarray         # ()


def make_apg_functions(env: Env, config: APGConfig):
    """Build (init_fn, train_step_fn, eval_fn) — pure, jittable, SPMD-ready.

    Accepts a per-env ``Env`` (vmapped here) or a batch-first vectorized env
    (``is_vectorized``), same contract as ppo.make_train_functions.
    """
    _, policy, value = networks.init_params(
        jax.random.PRNGKey(0), env.observation_size, env.action_size,
        config.hidden, init_log_std=config.init_log_std,
        fixed_log_std=config.fixed_log_std,
    )
    if config.lr_decay:
        lr = optax.linear_schedule(config.learning_rate,
                                   config.learning_rate * 0.01,
                                   config.num_iterations)
    else:
        lr = config.learning_rate
    tx = optax.chain(
        optax.zero_nans(),
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(lr),
    )

    vectorized = getattr(env, "is_vectorized", False)

    def reset_batch(keys):
        if vectorized:
            return env.reset(keys)
        return jax.vmap(env.reset)(keys)

    def step_batch(state, action):
        if vectorized:
            return env.step(state, action)
        return jax.vmap(env.step)(state, action)

    def norm_obs(stats, obs):
        if config.normalize_obs:
            return running_stats.normalize(stats, obs)
        return obs

    # ---------------- differentiable window ------------------------------
    def window_loss(policy_params, frozen, entry_state, rng):
        """Negative discounted window return, averaged over the batch.

        ``frozen`` = (value_params, obs_stats); gradients flow through the
        critic's *input* (the final observation) but not its weights.
        """
        value_params, obs_stats = jax.lax.stop_gradient(frozen)

        def one_step(carry, key):
            state, alive, acc, disc = carry
            mean, _ = policy.apply(policy_params, norm_obs(obs_stats, state.obs))
            if config.action_noise > 0:
                mean = mean + config.action_noise * jax.random.normal(
                    key, mean.shape)
            nstate = step_batch(state, mean)
            done = jax.lax.stop_gradient(nstate.done)
            # The terminating step's reward counts (the env already zeroes
            # it on fall/off-pose); steps after termination are masked.
            acc = acc + disc * alive * nstate.reward
            alive = alive * (1.0 - done)
            ys = (nstate.reward, done, nstate.obs if config.update_obs_stats
                  else None)
            return (nstate, alive, acc, disc * config.gamma), ys

        if config.remat:
            one_step = jax.checkpoint(one_step)

        B = entry_state.done.shape[0]
        carry0 = (entry_state, jnp.ones((B,)), jnp.zeros((B,)),
                  jnp.ones(()))
        (final_state, alive, acc, _), (rews, dones, obses) = jax.lax.scan(
            one_step, carry0, jax.random.split(rng, config.horizon))

        ret = acc
        if config.value_bootstrap:
            v_tail = value.apply(value_params,
                                 norm_obs(obs_stats, final_state.obs))
            ret = ret + (config.gamma ** config.horizon) * alive * v_tail
        loss = -jnp.mean(ret) / config.horizon

        ever_done = jnp.max(dones, axis=0)
        aux = {
            "final_state": final_state,
            "ever_done": ever_done,
            "obses": obses,
            "metrics": {
                "reward_mean": jnp.mean(rews),
                "episode_done_frac": jnp.mean(dones),
                "window_alive_frac": jnp.mean(alive),
                **{k: jnp.mean(v) for k, v in final_state.metrics.items()},
            },
        }
        return loss, aux

    grad_fn = jax.value_and_grad(window_loss, has_aux=True)

    # ---------------- one APG iteration ----------------------------------
    def train_step(ts: APGTrainState):
        rng, k_win, k_reset = jax.random.split(ts.rng, 3)
        entry_state = jax.lax.stop_gradient(ts.env_state)
        (loss, aux), grads = grad_fn(
            ts.params["policy"], (ts.params["value"], ts.obs_stats),
            entry_state, k_win)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params["policy"])
        policy_params = optax.apply_updates(ts.params["policy"], updates)
        params = {**ts.params, "policy": policy_params}

        obs_stats = ts.obs_stats
        if config.update_obs_stats:
            obs_stats = running_stats.update(obs_stats, aux["obses"])

        # Reset every env that terminated anywhere in the window (its
        # post-termination steps were masked dead weight); the merged state
        # seeds the next window.
        final_state = aux["final_state"]
        fresh = reset_batch(jax.random.split(k_reset, config.num_envs))
        d = aux["ever_done"].astype(bool)
        if config.reset_every > 0:
            it = ts.env_steps // config.steps_per_iteration
            force = (it % config.reset_every) == (config.reset_every - 1)
            d = jnp.logical_or(d, force)
        sel = lambda a, b: jnp.where(
            d.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
        env_state = jax.tree.map(sel, fresh, final_state)

        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            **aux["metrics"],
        }
        return APGTrainState(
            params=params,
            opt_state=opt_state,
            obs_stats=obs_stats,
            env_state=env_state,
            rng=rng,
            env_steps=ts.env_steps + config.steps_per_iteration,
        ), metrics

    # ---------------- init ------------------------------------------------
    def init(rng) -> APGTrainState:
        rng, k_net, k_env = jax.random.split(rng, 3)
        params, _, _ = networks.init_params(
            k_net, env.observation_size, env.action_size, config.hidden,
            init_log_std=config.init_log_std,
            fixed_log_std=config.fixed_log_std,
        )
        env_state = jax.jit(reset_batch)(
            jax.random.split(k_env, config.num_envs))
        return APGTrainState(
            params=params,
            opt_state=tx.init(params["policy"]),
            obs_stats=running_stats.init(env.observation_size),
            env_state=env_state,
            rng=rng,
            env_steps=jnp.zeros(
                (), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
        )

    # ---------------- evaluation ------------------------------------------
    def evaluate(params, obs_stats, rng, num_envs: int = 128,
                 num_steps: int = 256):
        """Deterministic-policy rollout; identical metric to ppo.evaluate."""
        env_state = reset_batch(jax.random.split(rng, num_envs))

        def one(carry, _):
            env_state = carry
            mean, _ = policy.apply(params["policy"],
                                   norm_obs(obs_stats, env_state.obs))
            nstate = step_batch(env_state, mean)
            return nstate, (nstate.reward, nstate.done,
                            nstate.metrics.get(
                                "pose_error", jnp.zeros_like(nstate.reward)))

        _, (rew, done, perr) = jax.lax.scan(one, env_state, None,
                                            length=num_steps)
        alive = jnp.cumprod(1.0 - done, axis=0)
        ep_len = jnp.mean(jnp.sum(alive, axis=0))
        live = jnp.maximum(jnp.sum(alive), 1.0)
        return {
            "eval_reward": jnp.sum(rew * alive) / live,
            "eval_episode_length": ep_len,
            "eval_pose_error": jnp.sum(perr * alive) / live,
        }

    return init, train_step, evaluate


def train(
    env: Env,
    config: APGConfig = APGConfig(),
    mesh=None,
    progress_fn: Optional[Callable] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 50,
    steps_per_call: int = 10,
    resume_from: Optional[str] = None,
    resume: bool = True,
):
    """Run APG; returns (params, obs_stats, metrics_history).

    ``resume_from`` warm-starts params + obs-stats (+ env_steps) from an
    existing checkpoint directory — typically a PPO run to fine-tune; the
    optimizer restarts fresh (it only covers the policy subtree). Plain
    ``resume`` continues an interrupted APG run inside ``checkpoint_dir``.
    Same SPMD layout as ppo.train: env batch sharded on the mesh's ``data``
    axis, learner state replicated, XLA derives the gradient all-reduce.
    """
    mesh = mesh or make_mesh()
    ndev = mesh.devices.size
    if config.num_envs % max(ndev, 1):
        raise ValueError(
            f"num_envs {config.num_envs} not divisible by {ndev} devices")

    init, train_step, evaluate = make_apg_functions(env, config)

    rng = jax.random.PRNGKey(config.seed)
    ts = init(rng)

    from pbrl_tpu.parallel.distributed import is_primary_host
    from pbrl_tpu.train import checkpoint as ckpt

    primary = is_primary_host()
    it0 = 0
    src = None
    if checkpoint_dir and resume and ckpt.latest_step(checkpoint_dir) is not None:
        src = checkpoint_dir
    elif resume_from:
        src = resume_from
    if src is not None:
        last = ckpt.latest_step(src)
        if last is None:
            raise FileNotFoundError(f"no checkpoints under {src}")
        # Raw (target-free) restore: works for both PPO and APG payloads —
        # the optimizer state (structure differs between the two) restarts.
        payload = ckpt.restore(src, last)
        params = jax.tree.map(jnp.asarray, payload["params"])
        # ts.opt_state (from init) is already a valid FRESH optimizer state
        # for the restored params: adam moments are zeros shaped like the
        # policy subtree, whose shapes depend only on obs/action/hidden
        # sizes — identical between init-time and restored params.
        ts = ts.replace(
            params=params,
            obs_stats=running_stats.RunningStats(
                **jax.tree.map(jnp.asarray, payload["obs_stats"])),
            env_steps=jnp.asarray(payload["env_steps"],
                                  ts.env_steps.dtype),
        )
        if src == checkpoint_dir:
            it0 = int(last)

    if checkpoint_dir and primary:
        _save_run_config(checkpoint_dir, env, config)

    batch_sh = sharded_batch_spec(mesh)
    repl = replicated(mesh)
    sh = APGTrainState(
        params=jax.tree.map(lambda _: repl, ts.params),
        opt_state=jax.tree.map(lambda _: repl, ts.opt_state),
        obs_stats=jax.tree.map(lambda _: repl, ts.obs_stats),
        env_state=jax.tree.map(lambda _: batch_sh, ts.env_state),
        rng=repl,
        env_steps=repl,
    )
    ts = jax.device_put(ts, sh)

    steps_per_call = max(1, min(steps_per_call, config.num_iterations))

    def multi_step(ts):
        return jax.lax.scan(lambda ts, _: train_step(ts), ts, None,
                            length=steps_per_call)

    step_jit = jax.jit(multi_step, in_shardings=(sh,),
                       out_shardings=(sh, repl), donate_argnums=0)

    history = []
    t0 = _time.perf_counter()
    num_calls = config.num_iterations // steps_per_call
    for call in range(num_calls):
        ts, metrics = step_jit(ts)
        it = (call + 1) * steps_per_call - 1
        metrics = jax.device_get(metrics)
        last = {k: float(v[-1]) for k, v in metrics.items()}
        last["env_steps"] = (it + 1) * config.steps_per_iteration
        last["sps"] = config.steps_per_iteration * (it + 1) / (
            _time.perf_counter() - t0)
        history.append(last)
        if progress_fn is not None and primary:
            progress_fn(it, last)
        if (checkpoint_dir and primary
                and (call + 1) % max(1, checkpoint_every // steps_per_call) == 0):
            ckpt.save(checkpoint_dir, ts, step=it0 + it + 1)
    if checkpoint_dir and primary:
        ckpt.save(checkpoint_dir, ts, step=it0 + config.num_iterations)
    return ts.params, ts.obs_stats, history


def _save_run_config(directory: str, env, config: APGConfig) -> None:
    """Persist eval-compatible run metadata.

    ``run_config.json`` carries a TrainConfig-compatible projection (the
    fields eval/rollout need to rebuild the networks) so every downstream
    tool (`pbrl eval`, parity harness) works on APG checkpoints unchanged;
    the full APGConfig is kept alongside as ``apg_config.json``."""
    import os

    from pbrl_tpu.train import checkpoint as ckpt
    from pbrl_tpu.train.ppo import TrainConfig
    from pbrl_tpu.utils.configio import save_json_config

    compat = TrainConfig(
        num_envs=config.num_envs,
        learning_rate=config.learning_rate,
        gamma=config.gamma,
        normalize_obs=config.normalize_obs,
        hidden=config.hidden,
        total_env_steps=config.total_env_steps,
        seed=config.seed,
        init_log_std=config.init_log_std,
        fixed_log_std=config.fixed_log_std,
    )
    ckpt.save_run_config(directory, env, compat)
    save_json_config(os.path.join(directory, "apg_config.json"), config)
