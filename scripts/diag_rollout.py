"""Phase-aligned diagnostic rollout: deterministic policy from the clip
start (t=0, no RSI), dumping per-step reward/time/root pose vs reference.

  python scripts/diag_rollout.py --checkpoint-dir ckpts/backflip_r3_ft \
      --steps 300 --out /tmp/diag.npz
"""

import argparse
import dataclasses
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="/tmp/diag.npz")
    args = ap.parse_args()

    import jax

    # Diagnostics always run on host CPU — the axon TPU plugin ignores
    # JAX_PLATFORMS, and landing here while a training job owns the chip
    # wedges both (see reward_parity.py, same guard).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

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
    cfg = dataclasses.replace(env.config, reference_state_init=False)
    env = MimicVecEnv(env.model, env.clip, cfg)
    payload = checkpoint.restore(args.checkpoint_dir)
    stats = RunningStats(**payload["obs_stats"])
    policy = PolicyNetwork(action_size=env.action_size,
                           hidden=tuple(train_cfg.hidden))
    params = payload["params"]["policy"]

    vs = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), 1))

    @jax.jit
    def roll(vs):
        def body(s, _):
            mean, _ = policy.apply(params, normalize(stats, s.obs))
            s = env.step(s, mean)
            terms = jnp.stack([s.metrics[k][0] for k in
                               ("reward_pose", "reward_vel", "reward_ee",
                                "reward_com")])
            return s, (s.qpos[0], s.reward[0], s.done[0], s.time[0],
                       s.metrics["root_err"][0], terms)

        _, out = jax.lax.scan(body, vs, None, length=args.steps)
        return out

    qpos, rew, done, t, root_err, terms = (np.asarray(x) for x in roll(vs))
    q_ref = np.stack([
        np.asarray(reference_state(env.clip, jnp.asarray(float(tt)))[0])
        for tt in t])
    np.savez(args.out, qpos=qpos, reward=rew, done=done, time=t,
             root_err=root_err, qpos_ref=q_ref)
    dxy = np.linalg.norm(qpos[:, :2] - q_ref[:, :2], axis=1)
    dz = qpos[:, 2] - q_ref[:, 2]
    cyc = max(1, int(round(float(env.clip.cycle_time)
                           / env.config.effective_policy_dt)))
    ncyc = args.steps // cyc
    print(json.dumps({
        "mean_reward": round(float(rew.mean()), 4),
        "alive": int((done == 0).all(axis=0).sum() and args.steps
                     if not done.any() else int(np.argmax(done > 0))),
        "cycle_steps": cyc,
        "reward_by_cycle": [round(float(rew[i*cyc:(i+1)*cyc].mean()), 3)
                            for i in range(ncyc)],
        "xy_err_by_cycle": [round(float(dxy[i*cyc:(i+1)*cyc].mean()), 3)
                            for i in range(ncyc)],
        "z_apex_by_cycle": [round(float(qpos[i*cyc:(i+1)*cyc, 2].max()), 3)
                            for i in range(ncyc)],
        "ref_z_apex": round(float(q_ref[:cyc, 2].max()), 3),
        "root_err_by_cycle": [round(float(root_err[i*cyc:(i+1)*cyc].mean()), 3)
                              for i in range(ncyc)],
        "terms_mean": {k: round(float(terms[:, j].mean()), 3)
                       for j, k in enumerate(("pose", "vel", "ee", "com"))},
        "terms_cycle1": {k: round(float(terms[:cyc, j].mean()), 3)
                         for j, k in enumerate(("pose", "vel", "ee", "com"))},
    }))
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
