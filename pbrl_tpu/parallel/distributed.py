"""Multi-host (DCN) process initialisation.

Single-controller JAX covers one host; scaling a training run across hosts
(a v5e pod slice spans 2+ hosts beyond 8 chips) needs
``jax.distributed.initialize`` so every process sees the global device set
and collectives ride ICI within a slice / DCN across hosts. The reference
has no distributed machinery (SURVEY.md §2.3/§5 — its implied story is Brax
PPO's pmap+NCCL); this is the TPU-native equivalent entry point, wired to
``pbrl train --distributed``.

Design: the same SPMD training program (train/ppo.py) runs unchanged — the
mesh simply spans all global devices; only host-side side effects
(checkpoints, progress printing) are gated to process 0 via
:func:`is_primary_host`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class DistributedConfig:
    """Flags for ``jax.distributed.initialize``.

    All-``None`` means auto-detection (TPU pod metadata / cluster env vars),
    which is what real multi-host TPU jobs use; explicit values support
    manual bring-up and tests.
    """

    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


def initialize_distributed(config: DistributedConfig = DistributedConfig()) -> bool:
    """Initialise multi-host JAX; returns True if initialisation happened.

    No-op (returns False) when already initialised, so library code may call
    this unconditionally.
    """
    if is_initialized():
        return False
    jax.distributed.initialize(
        coordinator_address=config.coordinator_address,
        num_processes=config.num_processes,
        process_id=config.process_id,
    )
    return True


def is_initialized() -> bool:
    return jax.distributed.is_initialized()


def shutdown() -> None:
    if is_initialized():
        jax.distributed.shutdown()


def is_primary_host() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    writes, progress logging). Always True single-process."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()
