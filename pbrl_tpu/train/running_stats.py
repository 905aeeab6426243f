"""Running observation normalisation (Welford, cross-device exact).

No equivalent exists in the reference (SURVEY.md §5 — no observability
subsystem); this is standard PPO plumbing built mesh-aware: batch moments
are reduced with ``psum`` over the data axis before merging, so every
device holds identical statistics without a separate sync pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningStats:
    count: jnp.ndarray  # ()
    mean: jnp.ndarray   # (dim,)
    m2: jnp.ndarray     # (dim,) sum of squared deviations

    @property
    def std(self) -> jnp.ndarray:
        var = self.m2 / jnp.maximum(self.count, 2.0)
        return jnp.sqrt(jnp.maximum(var, 1e-6))


def init(dim: int) -> RunningStats:
    return RunningStats(
        count=jnp.zeros(()), mean=jnp.zeros((dim,)), m2=jnp.ones((dim,))
    )


def update(stats: RunningStats, batch: jnp.ndarray, axis_name: str | None = None) -> RunningStats:
    """Merge a (..., dim) batch of observations (Chan's parallel update)."""
    flat = batch.reshape(-1, batch.shape[-1])
    n_b = jnp.asarray(flat.shape[0], jnp.float32)
    mean_b = jnp.mean(flat, axis=0)
    m2_b = jnp.sum((flat - mean_b) ** 2, axis=0)
    if axis_name is not None:
        k = jax.lax.psum(1, axis_name)
        mean_all = jax.lax.pmean(mean_b, axis_name)
        # total M2 = sum_i [m2_i + n_i (mean_i - mean_all)^2]
        m2_b = jax.lax.psum(m2_b + n_b * (mean_b - mean_all) ** 2, axis_name)
        n_b = n_b * k
        mean_b = mean_all

    delta = mean_b - stats.mean
    tot = stats.count + n_b
    new_mean = stats.mean + delta * n_b / tot
    new_m2 = stats.m2 + m2_b + delta**2 * stats.count * n_b / tot
    return RunningStats(count=tot, mean=new_mean, m2=new_m2)


def normalize(stats: RunningStats, obs: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip((obs - stats.mean) / stats.std, -10.0, 10.0)
