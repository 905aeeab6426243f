"""Environments: replay + mimic over the TPU-native engine, with registry."""

from pbrl_tpu.envs.base import (  # noqa: F401
    Env,
    EnvConfig,
    State,
    get_environment,
    register_environment,
    registered_environments,
    variant1,
    variant2,
)
from pbrl_tpu.envs.replay import ReplayEnv  # noqa: F401
from pbrl_tpu.envs.mimic import MimicEnv  # noqa: F401
from pbrl_tpu.envs.vec import MimicVecEnv, VecState  # noqa: F401
from pbrl_tpu.envs import humanoid_task  # noqa: F401


def _make_replay(clip="walk", config=None, **kw):
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model

    clip = load_clip(clip) if isinstance(clip, str) else clip
    return ReplayEnv(humanoid_model(), clip, config or EnvConfig(), **kw)


def _make_mimic(clip="walk", config=None, gravity=True, **kw):
    from pbrl_tpu.mocap import load_clip
    from pbrl_tpu.model import humanoid_model

    clip = load_clip(clip) if isinstance(clip, str) else clip
    return MimicEnv(humanoid_model(gravity=gravity), clip, config or EnvConfig(), **kw)


# Registry parity with the reference notebooks' names
# (``envs.register_environment('humanoidReplay'/'humanoidMimic', ...)``).
register_environment("humanoid_replay", _make_replay)
register_environment("humanoid_mimic", _make_mimic)
