"""Numerical guards: finiteness checks inside and outside jit.

TPU-native stand-in for the reference's ad-hoc numerical hygiene (Tikhonov
regularisation + condition-number warning, ``pds_controllers_mjx.py:
104-126``; ``check_finite=False`` Cholesky flags, ``pds_controllers_agents.
py:124-130``): debug-callback asserts usable under jit, a whole-pytree
checker for tests, and a switch for JAX's global NaN debugging.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


def assert_finite(x: jnp.ndarray, name: str = "value"):
    """Inside-jit finiteness check (jax.debug based; zero cost when clean)."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))

    def _raise(bad_val):
        if bad_val:
            raise FloatingPointError(f"non-finite values in {name}")

    jax.debug.callback(_raise, bad)
    return x


def check_finite_tree(tree, prefix: str = "") -> list:
    """Host-side: return paths of non-finite leaves (empty list = clean)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if arr.dtype.kind == "f" and not bool(jnp.all(jnp.isfinite(arr))):
            bad.append(prefix + jax.tree_util.keystr(path))
    return bad


@contextlib.contextmanager
def nan_debug_enabled():
    """Temporarily enable jax_debug_nans (tests / bug hunts)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
