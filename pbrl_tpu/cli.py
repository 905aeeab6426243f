"""``pbrl`` command-line interface: train / replay / eval / bench / info.

Realises the reference's empty ``main.py``/``visualizer.py`` stubs
(SURVEY.md §2: both 0 bytes) as an actual CLI over the framework.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_clip_arg(p, default="walk"):
    p.add_argument("--clip", default=default,
                   help="bundled clip name (walk, backflip, ...) or a file path")


def cmd_info(args):
    import jax

    from pbrl_tpu import __version__
    from pbrl_tpu.envs import registered_environments
    from pbrl_tpu.mocap import bundled_clip_names, load_clip
    from pbrl_tpu.model import humanoid_model

    m = humanoid_model()
    print(f"pbrl_tpu {__version__}")
    print(f"devices: {jax.devices()}")
    print(f"humanoid: nq={m.nq} nv={m.nv} nu={m.nu} bodies={m.nbody} geoms={m.ngeom}")
    print(f"environments: {', '.join(registered_environments())}")
    print("clips:")
    for name in bundled_clip_names():
        c = load_clip(name)
        loop = "wrap" if c.loop else "none"
        print(f"  {name:16s} {c.num_frames:4d} frames  "
              f"{float(c.cycle_time):5.2f}s  loop={loop}")
    return 0


def cmd_replay(args):
    import jax
    import numpy as np

    from pbrl_tpu.envs import ReplayEnv
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model, humanoid_spec
    from pbrl_tpu.viz import dump_trajectory, render_video, save_video

    clip = load_clip(args.clip)
    env = ReplayEnv(humanoid_model(), clip)
    steps = args.steps or int(float(clip.cycle_time) / env.config.policy_dt) + 1
    states = jax.jit(lambda: env.rollout(steps))()
    qpos = np.asarray(states.pipeline.qpos)
    fps = 1.0 / env.config.policy_dt
    dump_trajectory(args.out, qpos, fps)
    print(f"replayed {args.clip}: {steps} frames -> {args.out}")
    if args.video:
        frames = render_video(humanoid_spec(), qpos, camera=args.camera or None)
        out = save_video(args.video, frames, fps=fps)
        print(f"video -> {out}")
    return 0


def _env_overrides(env_cfg, env_set):
    """Apply repeatable ``--env-set FIELD=VALUE`` overrides to an EnvConfig.

    Typed by the current field value: bools accept 1/true/yes, tuples parse
    comma-separated floats/strings ('' = empty), everything else casts via
    the field's type. Shared by ``train`` and (round 5) ``eval``/``rollout``
    so controller-semantic knobs (e.g. ``ref_target_lead``) can be swept at
    evaluation time on top of the checkpoint's restored run config.
    """
    import dataclasses

    from pbrl_tpu.envs import EnvConfig

    fields = {f.name for f in dataclasses.fields(EnvConfig)}
    overrides = {}
    for kv in env_set:
        k, _, v = kv.partition("=")
        if k not in fields:
            raise SystemExit(f"--env-set: unknown EnvConfig field {k!r}")
        cur = getattr(env_cfg, k)
        if isinstance(cur, bool):
            overrides[k] = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, tuple):
            # e.g. --env-set aerial_window=0.27,0.5 or
            # fall_contact_bodies=right_ankle,left_ankle ('' = empty)
            def conv(x):
                try:
                    return float(x)
                except ValueError:
                    return x
            overrides[k] = tuple(conv(x) for x in v.split(",") if x != "")
        else:
            overrides[k] = type(cur)(v)
    return dataclasses.replace(env_cfg, **overrides)


def cmd_train(args):
    if args.distributed:
        # Must run before the backend initialises so every process sees the
        # global device set (ICI within a slice, DCN across hosts).
        from pbrl_tpu.parallel import DistributedConfig, initialize_distributed

        initialize_distributed(DistributedConfig(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        ))

    import jax

    from pbrl_tpu.envs import EnvConfig, MimicVecEnv
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model
    from pbrl_tpu.train import TrainConfig, train

    env_cfg = EnvConfig(controller=args.controller,
                        enforce_joint_limits=not args.no_joint_limits,
                        early_termination=not args.no_early_termination,
                        action_mode=args.action_mode,
                        rsi_phase_bias=args.rsi_phase_bias,
                        torque_limit_scale=args.torque_scale,
                        policy_dt=args.policy_dt,
                        physics_dt=args.physics_dt,
                        pose_termination=args.pose_termination)
    if args.env_set:
        env_cfg = _env_overrides(env_cfg, args.env_set)
    env = MimicVecEnv(humanoid_model(), load_clip(args.clip), env_cfg,
                      backend=args.backend)
    cfg = TrainConfig(
        num_envs=args.num_envs,
        unroll_length=args.unroll_length,
        total_env_steps=args.total_steps,
        learning_rate=args.lr,
        gamma=args.gamma,
        seed=args.seed,
    )
    if args.train_set:
        import dataclasses

        tfields = {f.name for f in dataclasses.fields(TrainConfig)}
        overrides = {}
        for kv in args.train_set:
            k, _, v = kv.partition("=")
            if k not in tfields:
                raise SystemExit(f"--train-set: unknown TrainConfig field {k!r}")
            cur = getattr(cfg, k)
            if isinstance(cur, bool):
                overrides[k] = v.lower() in ("1", "true", "yes")
            elif isinstance(cur, tuple):
                overrides[k] = tuple(int(x) for x in v.split(","))
            else:
                overrides[k] = type(cur)(v)
        cfg = dataclasses.replace(cfg, **overrides)

    def progress(it, metrics):
        print(json.dumps({"iteration": it, **{k: round(v, 5) if isinstance(v, float)
                                              else v for k, v in metrics.items()}}))

    params, stats, history = train(
        env, cfg, progress_fn=progress if args.verbose else None,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
    )
    final = history[-1] if history else {}
    print(json.dumps({"final": final}))
    return 0


def _dataclass_overrides(cfg, kvs, flag):
    """Apply repeatable FIELD=VALUE overrides to a dataclass config."""
    import dataclasses

    fields = {f.name: f for f in dataclasses.fields(type(cfg))}
    overrides = {}
    for kv in kvs:
        k, _, v = kv.partition("=")
        if k not in fields:
            raise SystemExit(
                f"{flag}: unknown {type(cfg).__name__} field {k!r}")
        cur = getattr(cfg, k)
        if isinstance(cur, bool):
            overrides[k] = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, tuple):
            overrides[k] = tuple(int(x) for x in v.split(","))
        else:
            overrides[k] = type(cur)(v)
    return dataclasses.replace(cfg, **overrides)


def cmd_train_apg(args):
    """Analytic-policy-gradient training/fine-tune over the differentiable
    simulator (train/apg.py) — typically warm-started from a PPO run."""
    from pbrl_tpu.envs import EnvConfig, MimicVecEnv
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model
    from pbrl_tpu.train import APGConfig, train_apg
    from pbrl_tpu.train.checkpoint import load_run_config
    from pbrl_tpu.utils.configio import dict_to_config

    env_cfg, clip, run = EnvConfig(), args.clip or "walk", None
    if args.from_checkpoint:
        # Fine-tunes inherit the source run's FULL training env (including
        # training-only shaping like RSI noise / aerial window) so the APG
        # objective continues the same optimisation problem; --env-set
        # overrides apply on top.
        run = load_run_config(args.from_checkpoint)
        if run is not None:
            if run.get("env_config"):
                env_cfg = dict_to_config(EnvConfig, run["env_config"])
            clip = args.clip or run.get("clip") or clip
    if args.env_set:
        env_cfg = _env_overrides(env_cfg, args.env_set)
    # The fused Pallas kernel defines no VJP; APG requires the XLA engine.
    env = MimicVecEnv(humanoid_model(), load_clip(clip), env_cfg,
                      backend="xla")
    cfg = APGConfig(
        num_envs=args.num_envs,
        horizon=args.horizon,
        learning_rate=args.lr,
        gamma=args.gamma,
        total_env_steps=args.total_steps,
        seed=args.seed,
    )
    if run is not None and run.get("train_config"):
        # Network-architecture fields must match the restored params.
        import dataclasses

        tc = run["train_config"]
        cfg = dataclasses.replace(
            cfg,
            hidden=tuple(tc.get("hidden", cfg.hidden)),
            normalize_obs=tc.get("normalize_obs", cfg.normalize_obs),
            init_log_std=tc.get("init_log_std", cfg.init_log_std),
            fixed_log_std=tc.get("fixed_log_std", cfg.fixed_log_std),
        )
    if args.apg_set:
        cfg = _dataclass_overrides(cfg, args.apg_set, "--apg-set")

    def progress(it, metrics):
        print(json.dumps({"iteration": it,
                          **{k: round(v, 5) if isinstance(v, float) else v
                             for k, v in metrics.items()}}))

    params, stats, history = train_apg(
        env, cfg, progress_fn=progress if args.verbose else None,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        steps_per_call=args.steps_per_call,
        resume_from=args.from_checkpoint,
    )
    print(json.dumps({"final": history[-1] if history else {}}))
    return 0


def _restore_run(args):
    """(env, train_cfg) reconstructed from the checkpoint's run config.

    Training runs persist their EnvConfig/TrainConfig/clip next to the
    checkpoints (train.checkpoint.save_run_config); evaluating a
    residual-action / no-joint-limit policy in a default env would measure
    the wrong thing entirely. Pre-run-config checkpoints fall back to
    defaults + CLI flags.
    """
    from pbrl_tpu.envs import EnvConfig, MimicVecEnv
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model
    from pbrl_tpu.train import TrainConfig
    from pbrl_tpu.train.checkpoint import load_run_config
    from pbrl_tpu.utils.configio import dict_to_config

    import dataclasses

    run = load_run_config(args.checkpoint_dir)
    if run is not None:
        env_cfg = (dict_to_config(EnvConfig, run["env_config"])
                   if run.get("env_config") else EnvConfig())
        train_cfg = dict_to_config(TrainConfig, run["train_config"])
        clip = args.clip or run.get("clip") or "walk"
    else:
        env_cfg = EnvConfig()
        train_cfg = TrainConfig()
        clip = args.clip or "walk"
    # Evaluation measures clean reference starts and the STANDARD DeepMimic
    # reward: training-time reset perturbations (RSI noise / phase or
    # takeoff-state curricula) and training-only reward shaping (the aerial
    # window) stay out of the metric, so eval numbers are comparable across
    # recipes and to the oracle parity harness.
    env_cfg = dataclasses.replace(env_cfg, rsi_noise_qpos=0.0,
                                  rsi_noise_qvel=0.0, rsi_noise_root_xy=0.0,
                                  rsi_phase_bias=0.0,
                                  curriculum_reset_prob=0.0,
                                  aerial_window=(), drift_w=0.0,
                                  contact_tc_scale=1.0, friction_scale=1.0)
    # Explicit CLI overrides apply LAST: eval-time sweeps of controller-
    # semantic knobs (e.g. ref_target_lead) on a fixed checkpoint.
    if getattr(args, "env_set", None):
        env_cfg = _env_overrides(env_cfg, args.env_set)
    env = MimicVecEnv(humanoid_model(), load_clip(clip), env_cfg)
    return env, train_cfg


def cmd_eval(args):
    import jax

    from pbrl_tpu.train import checkpoint, make_train_functions

    env, cfg = _restore_run(args)
    _, _, evaluate = make_train_functions(env, cfg)
    payload = checkpoint.restore(args.checkpoint_dir)
    from pbrl_tpu.train.running_stats import RunningStats

    stats = RunningStats(**payload["obs_stats"])  # orbax restores a dict
    metrics = evaluate(payload["params"], stats,
                       jax.random.PRNGKey(args.seed),
                       num_envs=args.num_envs, num_steps=args.steps)
    print(json.dumps({k: float(v) for k, v in metrics.items()}))
    return 0


def cmd_rollout(args):
    """Roll a trained policy and dump the qpos trajectory (+ video)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbrl_tpu.model import humanoid_spec
    from pbrl_tpu.train import checkpoint
    from pbrl_tpu.train.networks import PolicyNetwork
    from pbrl_tpu.train.running_stats import RunningStats, normalize
    from pbrl_tpu.viz import dump_trajectory, render_video, save_video

    env, train_cfg = _restore_run(args)
    payload = checkpoint.restore(args.checkpoint_dir)
    stats = RunningStats(**payload["obs_stats"])
    policy = PolicyNetwork(action_size=env.action_size,
                           hidden=tuple(train_cfg.hidden))
    params = payload["params"]["policy"]

    B = 1
    vs = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(args.seed), B))

    @jax.jit
    def roll(vs):
        def body(s, _):
            mean, _ = policy.apply(params, normalize(stats, s.obs))
            s = env.step(s, mean)
            return s, (s.qpos[0], s.reward[0], s.done[0])

        _, out = jax.lax.scan(body, vs, None, length=args.steps)
        return out

    qpos, reward, done = roll(vs)
    qpos = np.asarray(qpos)
    fps = 1.0 / env.config.effective_policy_dt
    dump_trajectory(args.out, qpos, fps,
                    metrics={"reward": np.asarray(reward),
                             "done": np.asarray(done)})
    alive = int(np.argmax(np.asarray(done) > 0)) or args.steps
    print(f"rollout: {args.steps} steps, mean reward "
          f"{float(np.asarray(reward)[:alive].mean()):.3f}, "
          f"alive {alive} steps -> {args.out}")
    if args.video:
        frames = render_video(humanoid_spec(), qpos, camera=args.camera or None)
        out = save_video(args.video, frames, fps=fps)
        print(f"video -> {out}")
    return 0


def cmd_bench(args):
    import runpy
    import os

    os.environ.setdefault("BENCH_NUM_ENVS", str(args.num_envs))
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                   run_name="__main__")
    return 0


def build_parser():
    p = argparse.ArgumentParser(prog="pbrl",
                                description="TPU-native physics-based RL framework")
    p.add_argument("--platform", default=os.environ.get("PBRL_PLATFORM", ""),
                   choices=["", "cpu", "tpu", "axon"],
                   help="force the jax platform before backend init "
                        "(env: PBRL_PLATFORM). Needed to run host-side "
                        "subcommands (info/replay/rollout on CPU) while a "
                        "training job owns the single-tenant chip — the "
                        "axon TPU plugin ignores the JAX_PLATFORMS env var, "
                        "so the CLI must set it via jax.config.")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("info", help="print devices, model dims, clips")
    sp.set_defaults(fn=cmd_info)

    sp = sub.add_parser("replay", help="kinematic clip playback -> trajectory/video")
    _add_clip_arg(sp)
    sp.add_argument("--steps", type=int, default=0, help="frames (default: one cycle)")
    sp.add_argument("--out", default="replay.npz")
    sp.add_argument("--video", default="", help="optional mp4 output path")
    sp.add_argument("--camera", default="back",
                    help="named model camera for --video (back/side; '' = free)")
    sp.set_defaults(fn=cmd_replay)

    sp = sub.add_parser("train", help="PPO imitation training")
    _add_clip_arg(sp)
    sp.add_argument("--num-envs", type=int, default=2048)
    sp.add_argument("--unroll-length", type=int, default=16)
    sp.add_argument("--total-steps", type=int, default=10_000_000)
    sp.add_argument("--lr", type=float, default=3e-4)
    sp.add_argument("--gamma", type=float, default=0.95,
                    help="discount; DeepMimic's 0.95 at 30 Hz sees ~0.66 s "
                         "ahead — at this env's 60 Hz use ~0.975 for the "
                         "same horizon (ballistic skills need it)")
    sp.add_argument("--checkpoint-every", type=int, default=200,
                    help="iterations between checkpoints")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--controller", default="implicit_pd",
                    choices=["implicit_pd", "stable_pd", "standard_pd",
                             "inverse_dynamics_pd"])
    sp.add_argument("--action-mode", default="absolute",
                    choices=["absolute", "residual", "torque"],
                    help="absolute: action = PD target; residual: action "
                         "adds to the reference pose (imitation prior)")
    sp.add_argument("--no-early-termination", action="store_true",
                    help="keep episodes alive on ground contact (getup clips)")
    sp.add_argument("--no-joint-limits", action="store_true",
                    help="disable hinge limit springs + target clipping "
                         "(needed for backflip/kick-class clips)")
    sp.add_argument("--rsi-phase-bias", type=float, default=0.0,
                    help="bias RSI resets toward later (>0) or earlier (<0) "
                         "clip phases (curriculum for ballistic landings)")
    sp.add_argument("--policy-dt", type=float, default=1.0 / 60.0,
                    help="policy period; 1/30 + --physics-dt 1/1200 = the "
                         "reference's variant-2 (DeepMimic) rates")
    sp.add_argument("--physics-dt", type=float, default=0.002)
    sp.add_argument("--pose-termination", type=float, default=0.0,
                    help="terminate when root-orientation error exceeds this "
                         "many radians (0 = off); breaks the stand-still "
                         "local optimum of ballistic clips")
    sp.add_argument("--env-set", action="append", default=[],
                    metavar="FIELD=VALUE",
                    help="override any EnvConfig field (repeatable), e.g. "
                         "--env-set s_vel=0.02 --env-set w_vel=0.2")
    sp.add_argument("--train-set", action="append", default=[],
                    metavar="FIELD=VALUE",
                    help="override any TrainConfig field (repeatable), e.g. "
                         "--train-set entropy_cost=0 --train-set hidden=512,256")
    sp.add_argument("--torque-scale", type=float, default=2.0,
                    help="torque envelope = gear * ctrlrange * this scale")
    sp.add_argument("--backend", default="auto",
                    choices=["auto", "kernel", "xla"],
                    help="physics backend: fused Pallas kernel (TPU) or XLA")
    sp.add_argument("--checkpoint-dir", default=None)
    sp.add_argument("--quiet", dest="verbose", action="store_false")
    sp.add_argument("--distributed", action="store_true",
                    help="multi-host run: jax.distributed.initialize before "
                         "the backend starts (auto-detects TPU pod metadata "
                         "unless --coordinator/--num-processes/--process-id "
                         "are given)")
    sp.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (multi-host)")
    sp.add_argument("--num-processes", type=int, default=None)
    sp.add_argument("--process-id", type=int, default=None)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser(
        "train-apg",
        help="analytic-policy-gradient training through the differentiable "
             "simulator (SHAC/DiffMimic-style; usually a PPO fine-tune)")
    _add_clip_arg(sp, default=None)  # None: use the source run's clip
    sp.add_argument("--from-checkpoint", default=None,
                    help="warm-start params/obs-stats (and inherit the "
                         "training env config) from this checkpoint dir")
    sp.add_argument("--checkpoint-dir", default=None)
    sp.add_argument("--checkpoint-every", type=int, default=50)
    sp.add_argument("--steps-per-call", type=int, default=10,
                    help="iterations fused per jit call (progress "
                         "granularity; smaller = finer probe telemetry)")
    sp.add_argument("--num-envs", type=int, default=256)
    sp.add_argument("--horizon", type=int, default=32,
                    help="truncated-BPTT window length (policy steps)")
    sp.add_argument("--total-steps", type=int, default=2_000_000)
    sp.add_argument("--lr", type=float, default=2e-5)
    sp.add_argument("--gamma", type=float, default=0.95)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--env-set", action="append", default=[],
                    metavar="FIELD=VALUE",
                    help="override EnvConfig fields on top of the inherited "
                         "run config")
    sp.add_argument("--apg-set", action="append", default=[],
                    metavar="FIELD=VALUE",
                    help="override any APGConfig field (repeatable), e.g. "
                         "--apg-set action_noise=0.02 --apg-set remat=false")
    sp.add_argument("--quiet", dest="verbose", action="store_false")
    sp.set_defaults(fn=cmd_train_apg)

    sp = sub.add_parser("eval", help="evaluate a checkpoint")
    _add_clip_arg(sp, default=None)  # None: use the checkpoint's run config
    sp.add_argument("--checkpoint-dir", required=True)
    sp.add_argument("--num-envs", type=int, default=128)
    sp.add_argument("--steps", type=int, default=256)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--env-set", action="append", default=[],
                    metavar="FIELD=VALUE",
                    help="override EnvConfig fields on top of the restored "
                         "run config (controller-semantic sweeps, e.g. "
                         "--env-set ref_target_lead=0.025)")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("rollout", help="roll a trained policy -> trajectory/video")
    _add_clip_arg(sp, default=None)  # None: use the checkpoint's run config
    sp.add_argument("--checkpoint-dir", required=True)
    sp.add_argument("--steps", type=int, default=300)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--out", default="rollout.npz")
    sp.add_argument("--video", default="")
    sp.add_argument("--camera", default="back",
                    help="named model camera for --video (back/side; '' = free)")
    sp.add_argument("--env-set", action="append", default=[],
                    metavar="FIELD=VALUE",
                    help="override EnvConfig fields on top of the restored "
                         "run config (see eval --env-set)")
    sp.set_defaults(fn=cmd_rollout)

    sp = sub.add_parser("bench", help="throughput benchmark (one JSON line)")
    sp.add_argument("--num-envs", type=int, default=4096)
    sp.set_defaults(fn=cmd_bench)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    # Persistent compilation cache: repeated CLI invocations (eval sweeps,
    # parity harness, fine-tune campaigns) re-jit the same physics programs;
    # the cache turns minutes of XLA compile into a disk read. Opt out with
    # PBRL_COMPILE_CACHE=0 (e.g. when bisecting compiler behavior).
    cache = os.environ.get("PBRL_COMPILE_CACHE",
                           os.path.expanduser("~/.pbrl_jax_cache"))
    if cache != "0":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update(
            "jax_platforms", "axon" if args.platform == "tpu" else args.platform)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
