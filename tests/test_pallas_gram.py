"""Pallas Gram/cross-cov kernels vs the jnp reference, tile-for-tile
(SURVEY.md §5 item 3). Runs in interpreter mode on CPU; the same code
compiles on TPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg
from gpis_tpu.kernels import pallas_gram as pg

KERNELS = ["rbf", "thin_plate", "laplace", "inverse_multiquadric"]


@pytest.mark.parametrize("name", KERNELS)
@pytest.mark.parametrize("shape", [(64, 40), (300, 300), (256, 512)])
def test_cross_cov_matches_jnp(name, shape, rng):
    m, n = shape
    q = jnp.asarray(rng.normal(size=(m, 3)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    params = {k: v.astype(jnp.float32) for k, v in kf.kernel_params(0.8, 1.2).items()}
    got = pg.cross_cov_pallas(name, q, x, params)
    want = kg.cross_cov(name, q, x, params)
    assert got.shape == (m, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=2e-6)


@pytest.mark.parametrize("name", ["rbf", "thin_plate"])
@pytest.mark.parametrize("n", [100, 256, 700])
def test_gram_matches_jnp(name, n, rng):
    x = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    noise = jnp.asarray(rng.uniform(1e-4, 1e-2, size=n), jnp.float32)
    params = {k: v.astype(jnp.float32) for k, v in kf.kernel_params(2.5, 1.1).items()}
    got = pg.gram_pallas(name, x, params, noise)
    want = kg.gram(name, x, params, noise=noise)
    assert got.shape == (n, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=2e-5)
    # Diagonal carries exact k(0) + noise.
    np.testing.assert_allclose(
        np.diagonal(np.asarray(got)),
        float(kf.k_diag0(name, params)) + np.asarray(noise),
        rtol=1e-6,
    )


def test_gram_pallas_f64(rng):
    """Interpreter mode also validates the f64 path used in parity tests."""
    x = jnp.asarray(rng.normal(size=(96, 3)))
    noise = jnp.full((96,), 1e-4)
    params = kf.kernel_params(0.9, 1.0)
    got = pg.gram_pallas("rbf", x, params, noise)
    want = kg.gram("rbf", x, params, noise=noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


@pytest.mark.parametrize("n", [256, 1024])
@pytest.mark.parametrize("kernel", ["rbf", "thin_plate"])
def test_fused_query_pallas(n, kernel):
    _fused_query_case(n, kernel, staged=False)


@pytest.mark.parametrize("n,kernel", [
    (1024, "rbf"), (1024, "thin_plate"),
    pytest.param(2048, "rbf", marks=pytest.mark.slow),  # multi-i-plane case
])
def test_fused_query_pallas_staged(n, kernel):
    """Staged-kq variant (round 5): kq assembled once into an HBM buffer,
    quad kernel READS tiles instead of regenerating per i-plane.  n=2048
    gives 2 i-planes at the default TI=1024 — the regime where the staged
    kq index map must serve both the i==0 mean plane (all columns) and the
    liveness-clamped quad tiles."""
    _fused_query_case(n, kernel, staged=True)


def _fused_query_case(n, kernel, *, staged):
    """Fused assemble+GEMM query kernel == linv predict path.  n=256 clamps
    the sweep-tunable tiles down to the capacity; n=1024 runs the default
    TALL TI (TI=512 != TC) — covering the generalized liveness predicate
    and the upper-triangle DMA-elision index map.

    Local generator, NOT the session-scoped `rng` fixture: this parity
    tolerance is scale-tight, and the shared stream's position shifts
    whenever any earlier test adds/removes a draw (adding tests to
    test_gp.py once flipped the thin_plate case here)."""
    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.kernels.pallas_query import fused_query_pallas

    rng = np.random.default_rng(20260818 + n)
    x = rng.normal(size=(n, 3))
    if kernel == "thin_plate":
        # Thin-plate is only conditionally positive definite: random
        # Gaussian clouds with small noise go indefinite in f32.  Use the
        # GPIS geometry (unit sphere, scale R > diameter) and more noise.
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        ls, noise = 2.5, 1e-2
    else:
        ls, noise = 0.8, 1e-3
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(rng.normal(size=n) * 0.2, jnp.float32)
    params = {k: v.astype(jnp.float32) for k, v in kf.kernel_params(ls, 1.0).items()}
    m = gpr.fit(kernel, x, y, noise, params, block=128, touch_capacity=0)
    m = gpr.with_linv(m, block=128)
    q = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)

    mean_ref, var_ref = gpr.predict(m, q)
    mean, quad = fused_query_pallas(kernel, q, m.x, m.params, m.alpha, m.linv,
                                    staged=staged)
    var = float(kf.k_diag0(kernel, m.params)) - quad
    # f32 agreement: alpha entries are O(1e2) (noise 1e-3), so the fused
    # kernel's different summation order shows at the ~1e-3 absolute level,
    # growing with the number of accumulated products (n) — and the exact
    # noise realization shifts with ambient XLA CPU reduction layouts, so
    # the bound needs headroom over the observed worst case.  Thin-plate's
    # covariance values are unbounded (r^2-scale vs RBF's <= 1), so the
    # single-pass-bf16 mean GEMV's absolute error is correspondingly
    # larger: observed up to ~1e-2 at n=1024 across seeds.
    atol = (4e-3 if kernel == "thin_plate" else 1e-3) * (n / 256)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=atol)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=2e-3, atol=atol)


def test_gram_band_pallas(rng):
    """Band Gram kernel (sharded assembly tile) == global Gram rows."""
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.kernels import gram as kg
    from gpis_tpu.kernels.pallas_gram import gram_band_pallas

    n = 512
    x = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    noise = jnp.asarray(rng.uniform(1e-3, 1e-2, size=n), jnp.float32)
    params = {k: v.astype(jnp.float32) for k, v in kf.kernel_params(0.7, 1.1).items()}
    full = np.asarray(kg.gram_reference("rbf", x, params, noise=noise))
    for row0, r in [(0, 256), (256, 256), (0, 512)]:
        band = gram_band_pallas("rbf", x[row0:row0 + r], x, params,
                                noise[row0:row0 + r], row0)
        np.testing.assert_allclose(np.asarray(band), full[row0:row0 + r],
                                   atol=1e-6)


def test_fused_quad_band_pallas(rng):
    """Band quad kernel == ||W_band kq^T||^2 colsums, any band offset."""
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.kernels import gram as kg
    from gpis_tpu.kernels.pallas_query import fused_quad_band_pallas

    c = 512
    x = jnp.asarray(rng.normal(size=(c, 3)), jnp.float32)
    params = {k: v.astype(jnp.float32) for k, v in kf.kernel_params(0.7, 1.0).items()}
    # Lower-triangular W (the kernel skips tiles above the band diagonal).
    w_full = jnp.asarray(np.tril(rng.normal(size=(c, c))), jnp.float32)
    q = jnp.asarray(rng.normal(size=(96, 3)), jnp.float32)
    kq = np.asarray(kg.gram_reference("rbf", jnp.concatenate([q, x]), params))[:96, 96:]
    for row0, r in [(0, 256), (256, 256)]:
        quad = fused_quad_band_pallas("rbf", q, x, params,
                                      w_full[row0:row0 + r], row0)
        v = np.asarray(w_full)[row0:row0 + r] @ kq.T
        want = (v * v).sum(axis=0)
        np.testing.assert_allclose(np.asarray(quad), want, rtol=1e-5, atol=1e-5)
