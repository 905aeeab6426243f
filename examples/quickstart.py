"""End-to-end tour of pbrl_tpu — the reference's notebooks, as one script.

Covers what `testing_forward_env.ipynb` (kinematic replay),
`testing_pds_env.ipynb` (PD tracking of cubic trajectories) and the
never-written training driver did, against the TPU-native stack.

Run:  python examples/quickstart.py [--steps 2000]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def section(title):
    print(f"\n=== {title} " + "=" * max(0, 60 - len(title)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=200_000)
    args = ap.parse_args()

    from pbrl_tpu.model import humanoid_model, sphere_model
    from pbrl_tpu.engine import make_data, step_n

    section("1. Raw physics: sphere drop (the reference's sanity scene)")
    m = sphere_model()
    d = jax.jit(lambda d: step_n(m, d, 500))(make_data(m))
    print(f"after 1 s: z = {float(d.qpos[2]):.3f} (rests at its radius 0.1)")

    section("2. Kinematic replay of a DeepMimic clip (testing_forward_env)")
    from pbrl_tpu.envs import ReplayEnv
    from pbrl_tpu.mocap import load_clip

    human = humanoid_model()
    clip = load_clip("walk")
    env = ReplayEnv(human, clip)
    states = jax.jit(lambda: env.rollout(76))()  # one cycle at 60 fps
    x = np.asarray(states.pipeline.qpos[:, 0])
    print(f"replayed {clip.name}: {states.obs.shape[0]} frames, "
          f"root advanced {x[-1] - x[0]:.2f} m")

    section("3. Stable-PD tracking of cubic joint trajectories (testing_pds_env)")
    from pbrl_tpu.control import (constant_trajectories, cubic_coefficients,
                                  default_gains, evaluate, implicit_pd,
                                  set_trajectories)
    from pbrl_tpu.engine.forward import step as engine_step

    nog = humanoid_model(gravity=False, floor=False)
    table = constant_trajectories(nog.nu, 0.0, t0=1.0, tf=3.0)
    idx = [nog.actuator_names.index(n)
           for n in ("right_elbow", "left_elbow")]
    table = set_trajectories(
        table, idx, jnp.stack([cubic_coefficients(1.0, 3.0, 0.0, 1.5)] * 2))
    gains = default_gains()

    def roll(d):
        def body(d, _):
            t_next = jnp.clip(d.time + nog.option.timestep, 1.0, 3.0)
            d = engine_step(nog, d, qfrc_fn=lambda mm, dd: implicit_pd(
                mm, dd, evaluate(table, t_next), gains))
            return d, None
        return jax.lax.scan(body, d, None, length=1500)[0]

    d = make_data(nog)
    d = d.replace(time=jnp.asarray(1.0))
    d = jax.jit(roll)(d)
    elbow = float(d.qpos[nog.jnt_qposadr[nog.joint_id("right_elbow")]])
    print(f"right elbow after tracking 1.5 rad cubic: {elbow:.3f} rad")

    section("4. Batched imitation env over the fused kernel")
    from pbrl_tpu.envs import EnvConfig, MimicVecEnv

    venv = MimicVecEnv(human, clip, EnvConfig())
    print(f"backend: {venv.backend}")
    vs = jax.jit(venv.reset)(jax.random.split(jax.random.PRNGKey(0), 256))
    vs = jax.jit(venv.step)(vs, jnp.zeros((256, venv.action_size)))
    print(f"256 envs stepped; mean reward {float(vs.reward.mean()):.3f}")

    section("5. A short PPO training burst")
    from pbrl_tpu.train import TrainConfig, train

    cfg = TrainConfig(num_envs=256, unroll_length=8, num_minibatches=4,
                      update_epochs=2, total_env_steps=args.train_steps)
    params, stats, history = train(venv, cfg)
    print(f"{history[-1]['env_steps']} env steps: reward "
          f"{history[0]['reward_mean']:.3f} -> {history[-1]['reward_mean']:.3f} "
          f"at {history[-1]['sps']:.0f} steps/s")


if __name__ == "__main__":
    main()
