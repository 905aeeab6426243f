"""Test config: run JAX on a virtual 8-device CPU mesh.

Tests exercise the TPU code paths (same XLA programs) on host CPU with 8
virtual devices so sharding/collective logic is validated without real
multi-chip hardware — the standard JAX fake-multi-device trick. The TPU
benchmark path is exercised separately by bench.py.

Note: the axon TPU plugin ignores ``JAX_PLATFORMS``; ``jax.config`` must be
used before the backend initialises.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
