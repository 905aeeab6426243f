"""Reconstruct the training-recipe CLI flags of a finished run from the
run_config.json its checkpoint dir persists (train.checkpoint.save_run_config).

Prints one line of ``--env-set k=v`` / ``--train-set k=v`` overrides for every
field that differs from the dataclass defaults — because the CLI applies the
override lists LAST, appending this line to a ``pbrl train`` command exactly
reproduces the stored recipe regardless of the explicit-flag defaults.
Campaign scripts use it to continue the best arm of a sweep without
hand-tracking which flags each lineage carried.

  FLAGS=$(python scripts/recipe_flags.py ckpts/backflip_r3x)
  pbrl train --clip backflip $FLAGS --total-steps 500000000 ...

Fields the campaign always sets explicitly (num_envs, total_env_steps,
learning_rate, seed, hidden) are skipped.
"""

import dataclasses
import json
import os
import sys

# Run as ``python scripts/recipe_flags.py`` — sys.path[0] is scripts/, so
# the repo root (one level up) must be added for the pbrl_tpu import.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SKIP_TRAIN = {"num_envs", "total_env_steps", "learning_rate", "seed",
              "hidden", "checkpoint_every"}


def _fmt(v):
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (list, tuple)):
        return ",".join(str(x) for x in v)
    return str(v)


def main():
    from pbrl_tpu.envs import EnvConfig
    from pbrl_tpu.train import TrainConfig

    run = json.load(open(f"{sys.argv[1]}/run_config.json"))
    out = []
    for cls, key, flag, skip in ((EnvConfig, "env_config", "--env-set", set()),
                                 (TrainConfig, "train_config", "--train-set",
                                  SKIP_TRAIN)):
        defaults = cls()
        stored = run.get(key, {})
        for f in dataclasses.fields(cls):
            if f.name in skip or f.name not in stored:
                continue
            cur, ref = stored[f.name], getattr(defaults, f.name)
            if isinstance(ref, tuple):
                ref = list(ref)
            if cur != ref:
                out.append(f"{flag} {f.name}={_fmt(cur)}")
    print(" ".join(out))


if __name__ == "__main__":
    main()
