"""Parity of the custom-VJP Gram assembly (kernels/gram.gram_ad) against
jax.grad through the plain gram_reference — every cotangent (x, params,
noise), banded and non-banded, plus the MLL that now routes through it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg


@pytest.fixture
def prob():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(96, 3)))
    noise = jnp.asarray(rng.uniform(1e-3, 1e-2, size=96))
    params = kf.kernel_params(0.8, 1.2)
    kbar = jnp.asarray(rng.normal(size=(96, 96)))
    return x, noise, params, kbar


@pytest.mark.parametrize("name", ["rbf", "thin_plate", "inverse_multiquadric"])
@pytest.mark.parametrize("band", [
    pytest.param(32, marks=pytest.mark.slow),  # sub-block band: ragged path
    96, 1024,
])
def test_gram_ad_vjp_parity(prob, name, band):
    x, noise, params, kbar = prob

    def via_ad(x_, params_, noise_):
        return jnp.sum(kg.gram_ad(name, x_, params_, noise_, band=band) * kbar)

    def via_ref(x_, params_, noise_):
        return jnp.sum(kg.gram_reference(name, x_, params_, noise_) * kbar)

    got = jax.grad(via_ad, argnums=(0, 1, 2))(x, params, noise)
    want = jax.grad(via_ref, argnums=(0, 1, 2))(x, params, noise)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-9, atol=1e-12)
    for k in params:
        np.testing.assert_allclose(float(got[1][k]), float(want[1][k]),
                                   rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                               rtol=1e-9, atol=1e-12)


def test_gram_ad_primal_matches(prob):
    x, noise, params, _ = prob
    got = kg.gram_ad("rbf", x, params, noise, band=32)
    want = kg.gram_reference("rbf", x, params, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_gram_ad_scalar_noise(prob):
    x, _, params, kbar = prob

    def via_ad(n):
        return jnp.sum(kg.gram_ad("rbf", x, params, n, band=32) * kbar)

    def via_ref(n):
        return jnp.sum(kg.gram_reference("rbf", x, params, n) * kbar)

    n0 = jnp.asarray(1e-3)
    np.testing.assert_allclose(float(jax.grad(via_ad)(n0)),
                               float(jax.grad(via_ref)(n0)), rtol=1e-9)


def test_mll_grad_unchanged_by_gram_ad(prob):
    """log_marginal_likelihood (now assembled via gram_ad) keeps its exact
    hyperparameter gradients."""
    from gpis_tpu.gp import regression as gpr

    x, noise, params, _ = prob
    y = jnp.asarray(np.random.default_rng(3).normal(size=96) * 0.2)

    def mll_now(log_ls):
        prm = dict(params, lengthscale=jnp.exp(log_ls))
        return gpr.log_marginal_likelihood("rbf", x, y, noise, prm)

    def mll_ref(log_ls):
        prm = dict(params, lengthscale=jnp.exp(log_ls))
        k = kg.gram_reference("rbf", x, prm, noise=noise)
        from gpis_tpu.linalg import cholesky as lin

        l = jnp.linalg.cholesky(k)
        alpha = lin.cho_solve(l, y)
        return (-0.5 * jnp.dot(y, alpha) - jnp.sum(jnp.log(jnp.diagonal(l)))
                - 0.5 * 96 * jnp.log(2.0 * jnp.pi))

    a = jnp.log(params["lengthscale"])
    np.testing.assert_allclose(float(mll_now(a)), float(mll_ref(a)), rtol=1e-12)
    np.testing.assert_allclose(float(jax.grad(mll_now)(a)),
                               float(jax.grad(mll_ref)(a)), rtol=1e-9)

def test_custom_kernel_without_dk_dr2_grad(prob):
    """register_kernel makes dk_dr2 optional, and the MLL routes through
    gram_ad whose pullback needs it — the derivative must fall back to
    forward-mode AD of the user's k_r2 instead of raising (review r3
    finding 3; before the fix jax.grad of the MLL raised at trace time)."""
    x, noise, params, kbar = prob

    def k_r2(r2, p):
        r = jnp.sqrt(3.0 * r2 + 1e-30) / p["lengthscale"]
        return p["signal_variance"] * (1.0 + r) * jnp.exp(-r)

    kf.register_kernel("_m32_test", k_r2=k_r2,
                       k_diag0=lambda p: p["signal_variance"])
    try:
        def via_gram_ad(params_):
            return jnp.sum(kg.gram_ad("_m32_test", x, params_, noise) * kbar)

        def via_plain_ad(params_):
            return jnp.sum(
                kg.gram_reference("_m32_test", x, params_, noise=noise) * kbar)

        g = jax.grad(via_gram_ad)(params)
        g_ref = jax.grad(via_plain_ad)(params)
        for k in g:
            np.testing.assert_allclose(np.asarray(g[k]), np.asarray(g_ref[k]),
                                       rtol=1e-9)
    finally:
        kf._REGISTRY.pop("_m32_test", None)
