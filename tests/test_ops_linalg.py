"""Unrolled SPD solver vs scipy/numpy oracle, incl. batched + jitted paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrl_tpu.ops.linalg import cholesky_factor, cholesky_solve, solve_spd


def _spd(rng, n, batch=()):
    a = rng.normal(size=batch + (n, n))
    return (a @ np.swapaxes(a, -1, -2) + n * np.eye(n)).astype(np.float32)


@pytest.mark.parametrize("n", [1, 3, 17, 34])
def test_factor_matches_numpy(n):
    rng = np.random.default_rng(0)
    a = _spd(rng, n)
    l = np.asarray(cholesky_factor(jnp.asarray(a)))
    want = np.linalg.cholesky(a.astype(np.float64))
    np.testing.assert_allclose(l, want, rtol=2e-4, atol=2e-4)
    # strictly lower triangular structure
    assert np.allclose(np.triu(l, 1), 0.0)


def test_solve_matches_numpy_batched():
    rng = np.random.default_rng(1)
    a = _spd(rng, 34, batch=(16,))
    b = rng.normal(size=(16, 34)).astype(np.float32)
    x = np.asarray(solve_spd(jnp.asarray(a), jnp.asarray(b)))
    want = np.linalg.solve(a.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, want, rtol=2e-3, atol=2e-3)


def test_solve_under_vmap_jit():
    rng = np.random.default_rng(2)
    a = _spd(rng, 10, batch=(8,))
    b = rng.normal(size=(8, 10)).astype(np.float32)
    f = jax.jit(jax.vmap(solve_spd))
    x = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
    res = np.einsum("bij,bj->bi", a, x) - b
    assert np.abs(res).max() < 1e-3


def test_factor_solve_consistency():
    rng = np.random.default_rng(3)
    a = _spd(rng, 34)
    b = rng.normal(size=(34,)).astype(np.float32)
    l = cholesky_factor(jnp.asarray(a))
    x = cholesky_solve(l, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(a @ x), b, atol=2e-3)


def test_gradients_flow():
    rng = np.random.default_rng(4)
    a = _spd(rng, 6)
    b = rng.normal(size=(6,)).astype(np.float32)

    def loss(a):
        return jnp.sum(solve_spd(a, jnp.asarray(b)) ** 2)

    g = jax.grad(loss)(jnp.asarray(a))
    assert bool(jnp.all(jnp.isfinite(g)))
    # numeric check on one entry
    eps = 1e-2
    ap = a.copy(); ap[2, 3] += eps; ap[3, 2] += eps  # keep symmetric
    num = (loss(jnp.asarray(ap)) - loss(jnp.asarray(a))) / eps
    np.testing.assert_allclose(float(g[2, 3] + g[3, 2]), float(num), rtol=0.1)
