"""Orbax checkpointing of training state.

The reference imports ``brax.io.model`` in every env module signalling
intent but never persists anything (SURVEY.md §5). Here: params, optimizer
state, observation statistics and the step counter round-trip through Orbax;
env states are deliberately excluded (episodes restart on resume — RSI makes
that cheap).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save(directory: str, train_state, step: int) -> None:
    """Persist the learner slice of a TrainState."""
    payload = {
        "params": train_state.params,
        "opt_state": train_state.opt_state,
        "obs_stats": train_state.obs_stats,
        "env_steps": train_state.env_steps,
    }
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def restore(directory: str, step: Optional[int] = None, target: Any = None) -> Any:
    """Load the latest (or given) checkpoint payload as a pytree.

    ``target`` (optional) is a reference pytree with the desired structure
    and array types — required to faithfully restore typed containers like
    optax optimizer states.
    """
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    if target is not None:
        out = mgr.restore(step, args=ocp.args.StandardRestore(target))
    else:
        out = mgr.restore(step)
    mgr.close()
    return out


def latest_step(directory: str) -> Optional[int]:
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


_RUN_CONFIG = "run_config.json"


def save_run_config(directory: str, env, train_config) -> None:
    """Persist the run's env/train configuration next to the checkpoints so
    ``pbrl eval``/``pbrl rollout`` can reconstruct the exact training env
    (action mode, joint limits, controller, clip) instead of guessing."""
    import json

    from pbrl_tpu.utils.configio import config_to_dict

    os.makedirs(os.path.abspath(directory), exist_ok=True)
    meta = {
        "clip": getattr(getattr(env, "clip", None), "name", None),
        "env_config": config_to_dict(env.config) if getattr(env, "config", None) else None,
        "train_config": config_to_dict(train_config),
    }
    with open(os.path.join(directory, _RUN_CONFIG), "w") as f:
        json.dump(meta, f, indent=2)


def load_run_config(directory: str) -> Optional[dict]:
    """Load the run configuration saved by :func:`save_run_config`, or None
    for checkpoints that predate it."""
    import json

    path = os.path.join(directory, _RUN_CONFIG)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
