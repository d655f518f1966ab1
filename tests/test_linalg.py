"""Linear-algebra tier tests: blocked Cholesky vs jnp.linalg.cholesky
(SURVEY.md §5 item 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.linalg import cholesky as lin


def _spd(rng, n):
    a = rng.normal(size=(n, n))
    return jnp.asarray(a @ a.T + n * np.eye(n))


@pytest.mark.parametrize("n,block", [(64, 32), (256, 64), (384, 128)])
def test_blocked_cholesky_matches_xla(n, block, rng):
    a = _spd(rng, n)
    want = jnp.linalg.cholesky(a)
    got = lin.blocked_cholesky(a, block=block)
    np.testing.assert_allclose(got, want, atol=1e-9)
    # strict lower-triangularity
    np.testing.assert_allclose(np.triu(np.asarray(got), 1), 0.0, atol=0.0)


def test_blocked_cholesky_bad_block(rng):
    with pytest.raises(ValueError):
        lin.blocked_cholesky(_spd(rng, 100), block=64)


def test_cho_solve(rng):
    a = _spd(rng, 96)
    l = lin.cholesky(a)
    b = jnp.asarray(rng.normal(size=96))
    x = lin.cho_solve(l, b)
    np.testing.assert_allclose(a @ x, b, atol=1e-8)
    bm = jnp.asarray(rng.normal(size=(96, 5)))
    xm = lin.cho_solve(l, bm)
    np.testing.assert_allclose(a @ xm, bm, atol=1e-8)


def test_blocked_cholesky_ad_matches_xla_grad(rng):
    """custom_vjp of the blocked factorization == XLA cholesky AD."""
    import jax

    n = 128
    a = _spd(rng, n)

    def f_blocked(a):
        l = lin.blocked_cholesky_ad(a, 32)
        return jnp.sum(jnp.log(jnp.diagonal(l))) + jnp.sum(l * 0.001)

    def f_xla(a):
        l = jnp.linalg.cholesky(a)
        return jnp.sum(jnp.log(jnp.diagonal(l))) + jnp.sum(l * 0.001)

    g1 = jax.grad(f_blocked)(a)
    g2 = jax.grad(f_xla)(a)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


def test_cholesky_dispatch_small():
    """Small matrices stay on the XLA path regardless of backend."""
    a = jnp.eye(64) * 2.0
    np.testing.assert_allclose(lin.cholesky(a), jnp.sqrt(2.0) * jnp.eye(64), atol=1e-12)


def test_blocked_linv(rng):
    a = _spd(rng, 256)
    l = jnp.linalg.cholesky(a)
    w = lin.blocked_linv(l, 64)
    np.testing.assert_allclose(np.asarray(w @ l), np.eye(256), atol=1e-9)
