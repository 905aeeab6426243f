"""pbrl_tpu: a from-scratch, TPU-native physics-based-RL framework.

Capability-matching rebuild of Galleta12/Physics-Based-RL (DeepMimic-style
humanoid motion imitation on a differentiable rigid-body simulator), designed
TPU-first: a pure-functional generalized-coordinate physics engine expressed
as batched einsums/GEMMs that XLA tiles onto the MXU, `lax.scan` rollouts,
`vmap` env batching, and `shard_map` data parallelism over device meshes.
"""

__version__ = "0.1.0"
