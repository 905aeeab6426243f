"""Per-start-phase eval decomposition: roll the deterministic policy from a
grid of clip phases (the same distribution ``pbrl eval`` samples uniformly)
and report reward / episode length per starting phase.  Localises where the
eval average loses reward — e.g. mid-air RSI starts vs ground starts.

Runs fine on CPU (deterministic policy + noise-free reset => one env per
phase is exact):

  JAX_PLATFORMS=cpu python scripts/phase_eval.py \
      --checkpoint-dir ckpts/backflip_r3v3 --phases 16 --steps 256
"""

import argparse
import dataclasses
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--phases", type=int, default=16)
    ap.add_argument("--steps", type=int, default=256)
    args = ap.parse_args()

    import jax

    # Always host-CPU: the axon TPU plugin ignores JAX_PLATFORMS (see
    # reward_parity.py, same guard).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pbrl_tpu.cli import _restore_run
    from pbrl_tpu.envs import MimicVecEnv
    from pbrl_tpu.mocap.clip import reference_state
    from pbrl_tpu.train import checkpoint
    from pbrl_tpu.train.networks import PolicyNetwork
    from pbrl_tpu.train.running_stats import RunningStats, normalize

    class _A:
        pass

    _A.checkpoint_dir = args.checkpoint_dir
    _A.clip = None
    env, train_cfg = _restore_run(_A)
    # Same strip as ``pbrl eval`` (cli.py): standard DeepMimic reward, no
    # training-only shaping or reset perturbations.
    cfg = dataclasses.replace(env.config, reference_state_init=False,
                              rsi_noise_qpos=0.0, rsi_noise_qvel=0.0,
                              rsi_noise_root_xy=0.0,
                              rsi_phase_bias=0.0, curriculum_reset_prob=0.0,
                              aerial_window=(), drift_w=0.0,
                              contact_tc_scale=1.0, friction_scale=1.0)
    env = MimicVecEnv(env.model, env.clip, cfg)
    payload = checkpoint.restore(args.checkpoint_dir)
    stats = RunningStats(**payload["obs_stats"])
    policy = PolicyNetwork(action_size=env.action_size,
                           hidden=tuple(train_cfg.hidden))
    params = payload["params"]["policy"]

    B = args.phases
    hi = (env.clip.cycle_time if env.clip.loop
          else 0.9 * env.clip.cycle_time)
    t0 = jnp.asarray(np.linspace(0.0, hi, B, endpoint=False))

    # Mirror MimicVecEnv.reset with a fixed start-time grid instead of RSI.
    vs = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    qpos, qvel = jax.vmap(lambda tt: reference_state(env.clip, tt))(t0)
    obs = env._obs(qpos, qvel, t0)
    vs = dataclasses.replace(vs, qpos=qpos, qvel=qvel, time=t0,
                             episode_start=t0, obs=obs)

    @jax.jit
    def roll(vs):
        def body(carry, _):
            s, alive = carry
            mean, _ = policy.apply(params, normalize(stats, s.obs))
            s = env.step(s, mean)
            r = s.reward * alive
            alive = alive * (1.0 - s.done)
            return (s, alive), (r, alive)

        (_, _), (rew, alive) = jax.lax.scan(
            body, (vs, jnp.ones((B,))), None, length=args.steps)
        return rew, alive

    rew, alive = (np.asarray(x) for x in roll(vs))
    per_phase_reward = rew.mean(axis=0)          # masked reward over steps
    ep_len = alive.sum(axis=0)
    out = {
        "checkpoint": args.checkpoint_dir,
        "mean_reward": round(float(per_phase_reward.mean()), 4),
        "mean_ep_len": round(float(ep_len.mean()), 1),
        "per_phase": [
            {"phase": round(float(t0[i] / env.clip.cycle_time), 3),
             "reward": round(float(per_phase_reward[i]), 3),
             "ep_len": int(ep_len[i])}
            for i in range(B)
        ],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
