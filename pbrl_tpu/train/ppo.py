"""PPO trainer fused with the simulator in one XLA program.

Completes the capability the reference only imports
(``brax.training.agents.ppo.train`` at ``agents_env/agent_env_template.py:
14-15`` — never called, SURVEY.md §0): clipped-surrogate PPO with GAE over
vmapped environment rollouts, compiled into the same program as the physics.

TPU-native scaling design (SURVEY.md §2.3): the whole train step is ONE
jitted SPMD program over a ``Mesh``; the env-state batch is sharded on the
``data`` axis, parameters/optimizer/obs-stats are replicated, and XLA derives
the gradient all-reduce over ICI from the sharding constraints — no pmap, no
explicit collectives in the loss. Multi-host runs reuse the same program via
``jax.distributed.initialize`` (DCN handles the cross-host legs).
"""

from __future__ import annotations

import dataclasses
import functools
import time as _time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pbrl_tpu.envs.base import Env, State
from pbrl_tpu.parallel import make_mesh, replicated, sharded_batch_spec
from pbrl_tpu.train import networks, running_stats
from flax import struct


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_envs: int = 2048
    unroll_length: int = 16
    num_minibatches: int = 8
    update_epochs: int = 4
    learning_rate: float = 3e-4
    lr_decay: bool = True        # linear decay to 0 over the run (guards
                                 # against late-training PPO collapse)
    gamma: float = 0.95          # DeepMimic's discount
    gae_lambda: float = 0.95
    clip_epsilon: float = 0.2
    entropy_cost: float = 1e-3
    value_cost: float = 0.5
    max_grad_norm: float = 0.5
    normalize_obs: bool = True
    hidden: tuple = (1024, 512)
    total_env_steps: int = 10_000_000
    seed: int = 0
    reward_scale: float = 1.0
    # Exploration std: exp(init_log_std) rad on the PD-target action.
    # fixed_log_std freezes the std at the param's current value — the init
    # on fresh runs, the restored value when resuming (DeepMimic-style
    # small fixed noise; see train/networks.py:PolicyNetwork).
    # reset_log_std explicitly overwrites a RESTORED log_std with
    # init_log_std (e.g. fine-tuning at a deliberately small std after a
    # learnable-std run let it drift) — the explicit form of what
    # fixed_log_std used to do silently (advisor round 2).
    init_log_std: float = -1.0
    fixed_log_std: bool = False
    reset_log_std: bool = False

    @property
    def steps_per_iteration(self) -> int:
        return self.num_envs * self.unroll_length

    @property
    def num_iterations(self) -> int:
        return max(1, self.total_env_steps // self.steps_per_iteration)


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    obs_stats: running_stats.RunningStats
    env_state: State          # batched (num_envs leading axis)
    rng: jnp.ndarray
    env_steps: jnp.ndarray    # ()


@struct.dataclass
class Transition:
    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    value: jnp.ndarray


def compute_gae(rewards, dones, values, bootstrap_value, gamma, lam):
    """GAE over a (T, B) rollout; `dones` terminate the bootstrap chain."""
    values_tp1 = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    deltas = rewards + gamma * (1.0 - dones) * values_tp1 - values

    def body(carry, xs):
        delta, done = xs
        carry = delta + gamma * lam * (1.0 - done) * carry
        return carry, carry

    _, adv = jax.lax.scan(body, jnp.zeros_like(bootstrap_value),
                          (deltas, dones), reverse=True)
    return adv, adv + values


def make_train_functions(env: Env, config: TrainConfig):
    """Build (init_fn, train_step_fn, eval_fn) — pure, jittable, SPMD-ready.

    Accepts either a per-env ``Env`` (vmapped here) or a batch-first
    vectorized env (``is_vectorized`` attribute, e.g. MimicVecEnv over the
    fused physics kernel).
    """
    _, policy, value = networks.init_params(
        jax.random.PRNGKey(0), env.observation_size, env.action_size, config.hidden,
        init_log_std=config.init_log_std, fixed_log_std=config.fixed_log_std,
    )
    if config.lr_decay:
        total_updates = (config.num_iterations * config.update_epochs
                         * config.num_minibatches)
        lr = optax.linear_schedule(config.learning_rate,
                                   config.learning_rate * 0.01, total_updates)
    else:
        lr = config.learning_rate
    tx = optax.chain(
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

    def auto_reset(state, nstate, keys):
        if vectorized:
            return env.auto_reset(nstate, keys)
        B = nstate.done.shape[0]
        reset_state = jax.vmap(env.reset)(keys)
        done = nstate.done
        sel = lambda a, b: jnp.where(
            done.reshape((B,) + (1,) * (a.ndim - 1)).astype(bool), a, b
        )
        merged = jax.tree.map(sel, reset_state, nstate)
        return merged.replace(metrics=nstate.metrics, reward=nstate.reward,
                              done=nstate.done)

    def norm_obs(stats, obs):
        if config.normalize_obs:
            return running_stats.normalize(stats, obs)
        return obs

    # ---------------- rollout -------------------------------------------
    def rollout(ts: TrainState):
        def one_step(carry, _):
            env_state, rng = carry
            rng, k_act, k_reset = jax.random.split(rng, 3)
            obs_n = norm_obs(ts.obs_stats, env_state.obs)
            mean, log_std = policy.apply(ts.params["policy"], obs_n)
            action = networks.sample_action(k_act, mean, log_std)
            lp = networks.log_prob(mean, log_std, action)
            val = value.apply(ts.params["value"], obs_n)

            nstate = step_batch(env_state, action)
            B = nstate.done.shape[0]
            merged = auto_reset(env_state, nstate, jax.random.split(k_reset, B))
            t = Transition(obs=env_state.obs, action=action, log_prob=lp,
                           reward=nstate.reward * config.reward_scale,
                           done=nstate.done, value=val)
            return (merged, rng), t

        (env_state, rng), traj = jax.lax.scan(
            one_step, (ts.env_state, ts.rng), None, length=config.unroll_length
        )
        return env_state, rng, traj

    # ---------------- loss ----------------------------------------------
    def loss_fn(params, batch, adv, ret, obs_stats):
        obs_n = norm_obs(obs_stats, batch.obs)
        mean, log_std = policy.apply(params["policy"], obs_n)
        lp = networks.log_prob(mean, log_std, batch.action)
        ratio = jnp.exp(lp - batch.log_prob)
        adv_n = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
        surrogate = jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 1 - config.clip_epsilon, 1 + config.clip_epsilon) * adv_n,
        )
        policy_loss = -jnp.mean(surrogate)
        v = value.apply(params["value"], obs_n)
        value_loss = jnp.mean((v - ret) ** 2)
        ent = jnp.mean(networks.entropy(log_std))
        total = (policy_loss + config.value_cost * value_loss
                 - config.entropy_cost * ent)
        return total, {
            "loss_policy": policy_loss,
            "loss_value": value_loss,
            "entropy": ent,
            "kl_approx": jnp.mean(batch.log_prob - lp),
        }

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # ---------------- one PPO iteration ---------------------------------
    def train_step(ts: TrainState):
        env_state, rng, traj = rollout(ts)

        # Update observation statistics from this rollout.
        obs_stats = (
            running_stats.update(ts.obs_stats, traj.obs)
            if config.normalize_obs else ts.obs_stats
        )

        final_obs_n = norm_obs(obs_stats, env_state.obs)
        bootstrap = value.apply(ts.params["value"], final_obs_n)
        adv, ret = compute_gae(traj.reward, traj.done, traj.value, bootstrap,
                               config.gamma, config.gae_lambda)

        # Flatten (T, B) -> (T*B,)
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), traj)
        adv_f = adv.reshape(-1)
        ret_f = ret.reshape(-1)
        n = adv_f.shape[0]
        mb = n // config.num_minibatches

        def epoch(carry, _):
            params, opt_state, rng = carry
            rng, k = jax.random.split(rng)
            perm = jax.random.permutation(k, n)[: config.num_minibatches * mb]
            perm = perm.reshape(config.num_minibatches, mb)

            def minibatch(carry, idx):
                params, opt_state = carry
                take = lambda x: x[idx]
                b = jax.tree.map(take, flat)
                (l, aux), grads = grad_fn(params, b, take(adv_f), take(ret_f),
                                          obs_stats)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), auxes = jax.lax.scan(
                minibatch, (params, opt_state), perm
            )
            return (params, opt_state, rng), auxes

        (params, opt_state, rng), auxes = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, rng), None,
            length=config.update_epochs,
        )

        metrics = {
            "reward_mean": jnp.mean(traj.reward) / config.reward_scale,
            "episode_done_frac": jnp.mean(traj.done),
            **{k: jnp.mean(v) for k, v in auxes.items()},
            **{k: jnp.mean(v) for k, v in env_state.metrics.items()},
        }
        return TrainState(
            params=params,
            opt_state=opt_state,
            obs_stats=obs_stats,
            env_state=env_state,
            rng=rng,
            env_steps=ts.env_steps + config.steps_per_iteration,
        ), metrics

    # ---------------- init ----------------------------------------------
    def init(rng) -> TrainState:
        rng, k_net, k_env = jax.random.split(rng, 3)
        params, _, _ = networks.init_params(
            k_net, env.observation_size, env.action_size, config.hidden,
            init_log_std=config.init_log_std, fixed_log_std=config.fixed_log_std,
        )
        env_state = jax.jit(reset_batch)(jax.random.split(k_env, config.num_envs))
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            obs_stats=running_stats.init(env.observation_size),
            env_state=env_state,
            rng=rng,
            env_steps=jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
        )

    # ---------------- evaluation ----------------------------------------
    def evaluate(params, obs_stats, rng, num_envs: int = 128, num_steps: int = 256):
        """Deterministic-policy rollout; returns mean reward and ep length."""
        env_state = reset_batch(jax.random.split(rng, num_envs))

        def one(carry, _):
            env_state = carry
            mean, _ = policy.apply(params["policy"], norm_obs(obs_stats, env_state.obs))
            nstate = step_batch(env_state, mean)
            return nstate, (nstate.reward, nstate.done,
                            nstate.metrics.get("pose_error", jnp.zeros_like(nstate.reward)))

        _, (rew, done, perr) = jax.lax.scan(one, env_state, None, length=num_steps)
        alive = jnp.cumprod(1.0 - done, axis=0)
        ep_len = jnp.mean(jnp.sum(alive, axis=0))
        # Mean reward over live steps only.
        live_rew = jnp.sum(rew * alive) / jnp.maximum(jnp.sum(alive), 1.0)
        return {
            "eval_reward": live_rew,
            "eval_episode_length": ep_len,
            "eval_pose_error": jnp.sum(perr * alive) / jnp.maximum(jnp.sum(alive), 1.0),
        }

    return init, train_step, evaluate


def train(
    env: Env,
    config: TrainConfig = TrainConfig(),
    mesh=None,
    progress_fn: Optional[Callable] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 50,
    steps_per_call: int = 10,
    resume: bool = True,
):
    """Run PPO; returns (params, obs_stats, metrics_history).

    With more than one device, the env batch is sharded over the mesh's
    ``data`` axis and the same jitted program runs SPMD.

    ``steps_per_call`` PPO iterations run inside ONE jitted call (a
    lax.scan), with metrics stacked and fetched in a single device->host
    transfer — per-dispatch and per-scalar-fetch latency otherwise dominates
    on remote TPU runtimes (measured ~0.5 s/iteration of pure overhead).
    """
    mesh = mesh or make_mesh()
    ndev = mesh.devices.size
    if config.num_envs % max(ndev, 1):
        raise ValueError(f"num_envs {config.num_envs} not divisible by {ndev} devices")

    init, train_step, evaluate = make_train_functions(env, config)

    rng = jax.random.PRNGKey(config.seed)
    ts = init(rng)

    # Host-side side effects (checkpoints, progress) happen on process 0
    # only — multi-host runs execute this same function on every host.
    from pbrl_tpu.parallel.distributed import is_primary_host

    primary = is_primary_host()
    if checkpoint_dir:
        from pbrl_tpu.train import checkpoint as ckpt

        if primary:
            ckpt.save_run_config(checkpoint_dir, env, config)
    it0 = 0
    if checkpoint_dir and resume:
        last = ckpt.latest_step(checkpoint_dir)
        if last is not None:
            target = {"params": ts.params, "opt_state": ts.opt_state,
                      "obs_stats": ts.obs_stats, "env_steps": ts.env_steps}
            payload = ckpt.restore(checkpoint_dir, last, target=target)
            params = payload["params"]
            if config.reset_log_std:
                pol = dict(params["policy"])
                inner = dict(pol["params"])
                inner["log_std"] = jnp.full_like(
                    inner["log_std"], config.init_log_std)
                pol["params"] = inner
                params = {**params, "policy": pol}
            ts = ts.replace(params=params,
                            opt_state=payload["opt_state"],
                            obs_stats=payload["obs_stats"],
                            env_steps=payload["env_steps"])
            # Continue checkpoint numbering from the restored step: orbax's
            # latest_step() is max(step), so saving anything lower makes the
            # resumed run's checkpoints invisible (env_steps-derived numbers
            # go backwards when num_envs/unroll_length change between runs).
            it0 = int(last)

    batch_sh = sharded_batch_spec(mesh)
    repl = replicated(mesh)

    def shardings_of(ts: TrainState):
        return TrainState(
            params=jax.tree.map(lambda _: repl, ts.params),
            opt_state=jax.tree.map(lambda _: repl, ts.opt_state),
            obs_stats=jax.tree.map(lambda _: repl, ts.obs_stats),
            env_state=jax.tree.map(lambda _: batch_sh, ts.env_state),
            rng=repl,
            env_steps=repl,
        )

    sh = shardings_of(ts)
    ts = jax.device_put(ts, sh)

    steps_per_call = max(1, min(steps_per_call, config.num_iterations))

    def multi_step(ts):
        def body(ts, _):
            return train_step(ts)

        return jax.lax.scan(body, ts, None, length=steps_per_call)

    step_jit = jax.jit(multi_step, in_shardings=(sh,),
                       out_shardings=(sh, repl), donate_argnums=0)

    if checkpoint_dir:
        from pbrl_tpu.train import checkpoint as ckpt

    history = []
    t0 = _time.perf_counter()
    num_calls = config.num_iterations // steps_per_call
    for call in range(num_calls):
        ts, metrics = step_jit(ts)
        it = (call + 1) * steps_per_call - 1
        metrics = jax.device_get(metrics)  # one transfer for the whole stack
        last = {k: float(v[-1]) for k, v in metrics.items()}
        last["env_steps"] = (it + 1) * config.steps_per_iteration
        last["sps"] = config.steps_per_iteration * (it + 1) / (
            _time.perf_counter() - t0
        )
        history.append(last)
        if progress_fn is not None and primary:
            progress_fn(it, last)
        if (checkpoint_dir and primary
                and (call + 1) % max(1, checkpoint_every // steps_per_call) == 0):
            ckpt.save(checkpoint_dir, ts, step=it0 + it + 1)
    if checkpoint_dir and primary:
        ckpt.save(checkpoint_dir, ts, step=it0 + config.num_iterations)
    return ts.params, ts.obs_stats, history
