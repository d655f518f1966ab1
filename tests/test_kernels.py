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


def test_custom_kernel_registry(rng):
    """C1 extension point: a registered kernel works through the full stack
    (fit/predict and the Pallas tile kernels call the same function)."""
    from gpis_tpu.gp import regression as gpr

    def matern32_k(r2, params):
        ls, sv = params["lengthscale"], params["signal_variance"]
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        a = jnp.sqrt(3.0) * r / ls
        return sv * (1.0 + a) * jnp.exp(-a)

    kf.register_kernel("matern32", k_r2=matern32_k,
                       k_diag0=lambda p: p["signal_variance"])
    try:
        x = jnp.asarray(rng.normal(size=(40, 3)))
        y = jnp.asarray(rng.normal(size=40) * 0.1)
        params = kf.kernel_params(0.9, 1.2)
        m = gpr.fit("matern32", x, y, 1e-4, params, block=32, touch_capacity=0)
        q = jnp.asarray(rng.normal(size=(10, 3)))
        mean, var = gpr.predict(m, q)
        assert np.isfinite(np.asarray(mean)).all()
        assert np.all(np.asarray(var) >= -1e-9)
        # Posterior interpolates with small noise.
        mean_x, _ = gpr.predict(m, x)
        np.testing.assert_allclose(np.asarray(mean_x), np.asarray(y), atol=0.05)
        # The pallas tile path sees it too (interpret mode).
        from gpis_tpu.kernels import pallas_gram as pg

        p32 = {k: v.astype(jnp.float32) for k, v in params.items()}
        g1 = pg.cross_cov_pallas("matern32", q.astype(jnp.float32),
                                 x.astype(jnp.float32), p32)
        g2 = kg.cross_cov("matern32", q.astype(jnp.float32),
                          x.astype(jnp.float32), p32)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
        # Config accepts it; derivative obs are refused (no dk supplied).
        from gpis_tpu.config import ModelConfig

        ModelConfig(kernel="matern32")
        assert not kf.supports_derivatives("matern32")
    finally:
        kf.unregister_kernel("matern32")
