"""Device-mesh utilities: sharding the env batch over ICI/DCN.

The reference has no distributed machinery at all (SURVEY.md §2.3); its
implied scaling story is Brax PPO's ``pmap`` + NCCL all-reduce. The
TPU-native equivalent here is compiler-driven SPMD: one jitted program over a
``jax.sharding.Mesh`` with the env batch sharded on the ``data`` axis and
parameters replicated — XLA inserts the gradient all-reduce (over ICI within
a slice, DCN across hosts) from the sharding constraints alone.
"""

from pbrl_tpu.parallel.distributed import (  # noqa: F401
    DistributedConfig,
    initialize_distributed,
    is_primary_host,
)
from pbrl_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    replicated,
    shard_batch,
    sharded_batch_spec,
)
