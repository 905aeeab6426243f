"""Measured reward ceiling for a chaotic clip (VERDICT r4 task 4; backflip).

Round 3 ARGUED the backflip eval ceiling ("velocity term structurally dead
for ~10 rad/s references => ceiling ~0.90") from one term breakdown. This
script turns that into committed measurements:

(a) pipeline check — the reference (qpos, qvel) frames scored against
    themselves through the eval reward. Upper bound; ~1.0 by construction
    (residual < 1.0 comes from clip resampling/interpolation, measured
    here instead of assumed).
(b) timing-error envelope — the reference scored against itself shifted by
    delta in {1/2/4 substeps, 1/2 frames}: exactly what a controller that
    reproduces the motion PERFECTLY but `delta` late would earn, per term.
    No feedback controller tracks a chaotic flip better than frame-level,
    so the 1-frame row is a defensible achievability bound per term.
(c) shipped-checkpoint decomposition — deterministic rollout of
    ckpts/<skill>: per-term rewards, joint-velocity RMSE vs reference, and
    r_vel evaluated AT that RMSE (shows whether the velocity term is
    earnable at the checkpoint's real tracking quality).

Runs on host CPU (same guard as reward_parity.py). Usage:

  python scripts/backflip_ceiling.py --checkpoint-dir ckpts/backflip
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-dir", default="ckpts/backflip")
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import mujoco

    from pbrl_tpu.cli import _restore_run
    from pbrl_tpu.envs import MimicVecEnv
    from pbrl_tpu.mocap.clip import reference_state
    from pbrl_tpu.model import humanoid_spec
    from pbrl_tpu.model.mjcf import to_mjcf
    from pbrl_tpu.train import checkpoint
    from pbrl_tpu.train.networks import PolicyNetwork
    from pbrl_tpu.train.running_stats import RunningStats, normalize

    class _A:
        checkpoint_dir = args.checkpoint_dir
        clip = None

    env, train_cfg = _restore_run(_A)
    cfg = dataclasses.replace(env.config, reference_state_init=False)
    env = MimicVecEnv(env.model, env.clip, cfg)
    pdt = float(cfg.effective_policy_dt)

    # MuJoCo FK oracle for body poses of reference states (no dynamics).
    mj = mujoco.MjModel.from_xml_string(to_mjcf(humanoid_spec()))
    mjd = mujoco.MjData(mj)

    def fk(q):
        mjd.qpos[:] = np.asarray(q, np.float64)
        mjd.qvel[:] = 0.0
        mujoco.mj_forward(mj, mjd)
        return (np.asarray(mjd.xpos[1:], np.float32),
                np.asarray(mjd.xquat[1:], np.float32))

    reward_fn = jax.jit(lambda q, v, tt, xp, xq: env._reward_batch(
        q, v, tt, xp, xq, jnp.zeros(1)))

    def score_shift(delta):
        """Score reference(t + delta) against the reward at time t."""
        rews, terms_acc = [], {}
        for k in range(args.steps):
            t = k * pdt
            q, v = reference_state(env.clip, jnp.asarray(t + delta))
            xp, xq = fk(q)
            r, terms = reward_fn(
                jnp.asarray(q, jnp.float32)[None],
                jnp.asarray(v, jnp.float32)[None],
                jnp.asarray([t], jnp.float32),
                jnp.asarray(xp)[None], jnp.asarray(xq)[None])
            rews.append(float(r[0]))
            for kk, vv in terms.items():
                terms_acc.setdefault(kk, []).append(float(vv[0]))
        return (float(np.mean(rews)),
                {k: round(float(np.mean(v)), 4) for k, v in terms_acc.items()})

    sub_dt = float(cfg.physics_dt)
    frame_dt = float(env.clip.dt)
    shifts = [("exact", 0.0), ("1 substep", sub_dt), ("2 substeps", 2 * sub_dt),
              ("4 substeps", 4 * sub_dt), ("1 frame", frame_dt),
              ("2 frames", 2 * frame_dt)]
    envelope = {}
    for name, d in shifts:
        mean_r, terms = score_shift(d)
        envelope[name] = {"delta_ms": round(d * 1e3, 2),
                          "reward": round(mean_r, 4), **terms}
        print(f"[envelope] {name:>10} ({d*1e3:5.1f} ms): reward="
              f"{mean_r:.4f} {terms}", file=sys.stderr)

    # (c) shipped checkpoint: deterministic rollout, qvel RMSE, r_vel at RMSE
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
            return s, (s.qvel[0], s.reward[0], s.time[0], terms)

        _, out = jax.lax.scan(body, vs, None, length=args.steps)
        return out

    qvel, rew, t, terms = (np.asarray(x) for x in roll(vs))
    v_ref = np.stack([
        np.asarray(reference_state(env.clip, jnp.asarray(float(tt)))[1])
        for tt in t])
    dv = qvel - v_ref
    vel_sq_mean = float(np.mean(np.sum(dv**2, axis=1)))
    rmse = float(np.sqrt(np.mean(dv**2)))
    ref_speed = float(np.sqrt(np.mean(v_ref**2)))
    r_vel_at_rmse = float(np.exp(-cfg.s_vel * vel_sq_mean))
    ckpt = {
        "mean_reward": round(float(rew.mean()), 4),
        "terms_mean": {k: round(float(terms[:, j].mean()), 4)
                       for j, k in enumerate(("pose", "vel", "ee", "com"))},
        "qvel_rmse_per_dof": round(rmse, 3),
        "ref_qvel_rms_per_dof": round(ref_speed, 3),
        "sum_dv_sq_mean": round(vel_sq_mean, 1),
        "r_vel_at_checkpoint_rmse": r_vel_at_rmse,
    }
    print(f"[ckpt] {ckpt}", file=sys.stderr)

    # Ceiling estimate: per-term achievable = the 1-frame timing-error
    # envelope (generous for pose/com, which tolerate timing error, and the
    # measured shipped-vel row for vel); weights from the eval config.
    one_frame = envelope["1 frame"]
    ceiling = (cfg.w_pose * one_frame["reward_pose"]
               + cfg.w_vel * one_frame["reward_vel"]
               + cfg.w_ee * one_frame["reward_ee"]
               + cfg.w_com * one_frame["reward_com"])
    out = {
        "clip": env.clip.name if hasattr(env.clip, "name") else "backflip",
        "weights": {"pose": cfg.w_pose, "vel": cfg.w_vel, "ee": cfg.w_ee,
                    "com": cfg.w_com},
        "kernel_scales": {"s_pose": cfg.s_pose, "s_vel": cfg.s_vel,
                          "s_ee": cfg.s_ee, "s_com": cfg.s_com},
        "envelope": envelope,
        "checkpoint": ckpt,
        "ceiling_at_1frame_timing": round(float(ceiling), 4),
        "eval_fraction_of_ceiling": round(
            float(ckpt["mean_reward"]) / float(ceiling), 4) if ceiling else None,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
