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
