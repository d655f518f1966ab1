"""Pallas derivative-block kernels vs the jnp joint-Gram assembly
(SURVEY.md §5 item 3; interpret mode on CPU, compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.kernels import derivative as kd
from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import pallas_deriv as pd

KERNELS = ["rbf", "thin_plate", "inverse_multiquadric"]


@pytest.fixture(scope="module")
def prob(rng):
    x = jnp.asarray(np.random.default_rng(3).normal(size=(70, 3)), jnp.float32)
    q = jnp.asarray(np.random.default_rng(4).normal(size=(40, 3)), jnp.float32)
    return q, x


@pytest.mark.parametrize("name", KERNELS)
def test_kfg_blocks(name, prob):
    q, x = prob
    ls = 3.0 if name == "thin_plate" else 0.8
    params = {k: v.astype(jnp.float32) for k, v in kf.kernel_params(ls, 1.1).items()}
    want_full = kd.cross_cov_value(name, q, x, params)  # (M, 4N)
    n = x.shape[0]
    for d in range(3):
        got = pd.kfg_pallas(name, q, x, params, d)
        want = want_full[:, n * (1 + d) : n * (2 + d)]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=1e-5)


@pytest.mark.parametrize("name", KERNELS)
def test_joint_gram_pallas(name, rng):
    x = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    ls = 3.0 if name == "thin_plate" else 0.8
    params = {k: v.astype(jnp.float32) for k, v in kf.kernel_params(ls, 1.1).items()}
    nf = jnp.asarray(rng.uniform(1e-4, 1e-2, size=50), jnp.float32)
    ng = jnp.asarray(rng.uniform(1e-4, 1e-2, size=50), jnp.float32)
    got = pd.joint_gram_pallas(name, x, params, nf, ng)
    want = kd.joint_gram(name, x, params, noise_f=nf, noise_g=ng)
    assert got.shape == (200, 200)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=2e-5)
    # Symmetry of the assembled matrix.
    np.testing.assert_allclose(np.asarray(got), np.asarray(got).T, atol=2e-5)
