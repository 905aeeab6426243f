"""Training: PPO + analytic-policy-gradient (APG) fused with the simulator,
checkpointing, obs normalisation."""

from pbrl_tpu.train.ppo import (  # noqa: F401
    TrainConfig,
    TrainState,
    Transition,
    compute_gae,
    make_train_functions,
    train,
)
from pbrl_tpu.train.apg import (  # noqa: F401
    APGConfig,
    APGTrainState,
    make_apg_functions,
)
from pbrl_tpu.train.apg import train as train_apg  # noqa: F401
from pbrl_tpu.train import checkpoint, networks, running_stats  # noqa: F401
