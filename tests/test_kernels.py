"""C1 kernel-function tests: oracle parity + AD consistency of the closed
r2-derivatives (SURVEY.md §5 items 2-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg

KERNELS = ["rbf", "thin_plate", "laplace", "inverse_multiquadric"]
LS, SV = 0.7, 1.3


@pytest.mark.parametrize("name", KERNELS)
def test_kernel_matches_oracle(name, rng):
    r2 = jnp.asarray(rng.uniform(0.0, 9.0, size=64))
    params = kf.kernel_params(LS, SV)
    got = kf.k_r2(name, r2, params)
    want = oracle.k_r2(name, np.asarray(r2), LS, SV)
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("name", KERNELS)
def test_k_diag0(name):
    params = kf.kernel_params(LS, SV)
    np.testing.assert_allclose(
        kf.k_diag0(name, params), oracle.k_r2(name, np.zeros(1), LS, SV)[0], rtol=1e-12
    )


@pytest.mark.parametrize("name", ["rbf", "thin_plate", "inverse_multiquadric"])
def test_dk_dr2_matches_ad(name, rng):
    """Closed-form dk/dr2 and d2k/dr2^2 vs jax.grad of the scalar kernel."""
    params = kf.kernel_params(LS, SV)
    r2s = rng.uniform(0.05, 9.0, size=16)
    f = lambda r2: kf.k_r2(name, r2, params)
    g = jax.grad(f)
    h = jax.grad(g)
    for r2 in r2s:
        r2 = jnp.asarray(r2)
        np.testing.assert_allclose(kf.dk_dr2(name, r2, params), g(r2), rtol=1e-9)
        np.testing.assert_allclose(kf.d2k_dr2(name, r2, params), h(r2), rtol=1e-9)


@pytest.mark.parametrize("name", KERNELS)
def test_gram_matches_oracle(name, rng):
    x = jnp.asarray(rng.normal(size=(40, 3)))
    noise = jnp.asarray(rng.uniform(1e-4, 1e-2, size=40))
    params = kf.kernel_params(LS, SV)
    got = kg.gram(name, x, params, noise=noise)
    want = oracle.gram(name, np.asarray(x), LS, SV, np.asarray(noise))
    np.testing.assert_allclose(got, want, atol=1e-12)
    # symmetry
    np.testing.assert_allclose(got, got.T, atol=1e-12)


def test_cross_cov_matches_oracle(rng):
    x = jnp.asarray(rng.normal(size=(30, 3)))
    q = jnp.asarray(rng.normal(size=(17, 3)))
    params = kf.kernel_params(LS, SV)
    got = kg.cross_cov("rbf", q, x, params)
    want = oracle.k_r2("rbf", oracle.pairwise_r2(np.asarray(q), np.asarray(x)), LS, SV)
    np.testing.assert_allclose(got, want, atol=1e-12)
