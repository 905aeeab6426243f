"""Training: PPO fused with the simulator, checkpointing, obs normalisation."""

from pbrl_tpu.train.ppo import (  # noqa: F401
    TrainConfig,
    TrainState,
    Transition,
    compute_gae,
    make_train_functions,
    train,
)
from pbrl_tpu.train import checkpoint, networks, running_stats  # noqa: F401
