"""Actor-critic networks for PPO.

The reference imports ``brax.training.agents.ppo.ppo_networks`` everywhere
but never instantiates it (``agents_env/agent_env_template.py:14-15``,
SURVEY.md §0); these are the from-scratch equivalents. DeepMimic-scale MLPs
(1024-512 hidden) — small enough that the MXU cost is dominated by the env
batch dimension, which is exactly how we want it.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    features: Sequence[int]
    activation: str = "swish"

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for i, f in enumerate(self.features[:-1]):
            x = act(nn.Dense(f, name=f"hidden_{i}")(x))
        return nn.Dense(self.features[-1], name="out")(x)


class PolicyNetwork(nn.Module):
    """Gaussian policy: MLP mean + state-independent learnable log-std.

    ``fixed_log_std=True`` freezes exploration at the ``log_std`` param's
    current value — ``init_log_std`` on a fresh run, the restored value when
    resuming a checkpoint (advisor round 2: overriding a restored learned
    std with ``init_log_std`` silently discarded it). DeepMimic used a small
    fixed std; precise skills like backflip suffer from the learnable std's
    slow drift — it sits near 0.3 rad for hundreds of millions of steps. To
    *change* the exploration level of a resumed run, edit the restored
    ``log_std`` param (``pbrl train --train-set init_log_std=...`` only
    affects fresh runs).
    """

    action_size: int
    hidden: Sequence[int] = (1024, 512)
    init_log_std: float = -1.0
    fixed_log_std: bool = False
    # Hard exploration bounds: sigma in [0.1, 2.0] rad. The learnable std
    # has wandered both ways in training (arm Q: entropy bonus blew sigma
    # to ~2 rad and noise-soaked the policy; a strong negative
    # entropy_cost anneal would otherwise collapse it to 0 and freeze the
    # likelihood ratios). Outside the clamp the param stops receiving
    # gradient, which pins the effective std at the bound.
    min_log_std: float = -2.3
    max_log_std: float = 0.7

    @nn.compact
    def __call__(self, obs):
        mean = MLP(features=(*self.hidden, self.action_size), name="torso")(obs)
        log_std = self.param(
            "log_std", lambda k: jnp.full((self.action_size,), self.init_log_std)
        )
        if self.fixed_log_std:
            log_std = jax.lax.stop_gradient(log_std)
        log_std = jnp.clip(log_std, self.min_log_std, self.max_log_std)
        return mean, jnp.broadcast_to(log_std, mean.shape)


class ValueNetwork(nn.Module):
    hidden: Sequence[int] = (1024, 512)

    @nn.compact
    def __call__(self, obs):
        return MLP(features=(*self.hidden, 1), name="torso")(obs)[..., 0]


def init_params(rng, obs_size: int, action_size: int, hidden=(1024, 512),
                init_log_std: float = -1.0, fixed_log_std: bool = False):
    kp, kv = jax.random.split(rng)
    dummy = jnp.zeros((obs_size,))
    policy = PolicyNetwork(action_size=action_size, hidden=hidden,
                           init_log_std=init_log_std,
                           fixed_log_std=fixed_log_std)
    value = ValueNetwork(hidden=hidden)
    return {
        "policy": policy.init(kp, dummy),
        "value": value.init(kv, dummy),
    }, policy, value


# ---------------------------------------------------------------------------
# Gaussian distribution helpers
# ---------------------------------------------------------------------------


def sample_action(rng, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(rng, mean.shape)


def log_prob(mean, log_std, action):
    z = (action - mean) / jnp.exp(log_std)
    return jnp.sum(-0.5 * z**2 - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


def entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)
