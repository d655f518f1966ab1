"""Compiled-Pallas smoke tier on the real TPU (VERDICT r1 item 3).

CI runs every Pallas kernel in interpret mode on CPU, which checks the math
but not the Mosaic compilation, tiling contracts, or VMEM behavior.  This
file runs the same kernels COMPILED on the real chip at small-but-tiled
sizes, against jnp references computed on the same chip.

Run (the only supported way — the default conftest pins CPU):

    GPIS_TEST_PLATFORM=tpu python -m pytest -m tpu -q

Everything here skips unless the active backend is a real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="needs a real TPU backend"
    ),
]

N = 1024
DT = jnp.float32


@pytest.fixture(scope="module")
def prob():
    from gpis_tpu.kernels import functions as kf

    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(size=(N, 3)), DT)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    # Noise well above n*eps*||K|| ~ 1e-2: a unit sphere at ls=0.5 with
    # tiny noise is genuinely indefinite in f32 — this tier checks Mosaic
    # compilation, not the jitter ladder (fit()'s ladder owns conditioning).
    noise = jnp.full((N,), 5e-2, DT)
    params = {k: v.astype(DT) for k, v in kf.kernel_params(0.4, 1.0).items()}
    return x, noise, params


@pytest.mark.parametrize("kernel", ["rbf", "thin_plate"])
def test_gram_pallas_compiled(prob, kernel):
    from gpis_tpu.kernels import gram as kg
    from gpis_tpu.kernels import pallas_gram as pg

    x, noise, params = prob
    got = np.asarray(pg.gram_pallas(kernel, x, params, noise))
    want = np.asarray(kg.gram_reference(kernel, x, params, noise=noise))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_cross_cov_pallas_compiled(prob):
    from gpis_tpu.kernels import gram as kg
    from gpis_tpu.kernels import pallas_gram as pg

    x, _, params = prob
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(512, 3)), DT)
    got = np.asarray(pg.cross_cov_pallas("rbf", q, x, params))
    want = np.asarray(kg.gram_reference("rbf", jnp.concatenate([q, x]), params)[:512, 512:])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_cholesky_compiled(prob):
    """The compiled factor's reconstruction residual ||L L^T - A|| must be
    in the same class as XLA's own f32 cholesky on the same chip — the
    residual floor is set by f32 conditioning, not by the kernel, so the
    gate is relative to the on-chip XLA result (both ~1e-2 here)."""
    from gpis_tpu.kernels import pallas_gram as pg
    from gpis_tpu.linalg.pallas_chol import pallas_blocked_cholesky

    x, noise, params = prob
    a = np.asarray(pg.gram_pallas("rbf", x, params, noise))
    l = np.asarray(pallas_blocked_cholesky(jnp.asarray(a), 256))
    assert np.isfinite(l).all()
    assert np.abs(np.triu(l, 1)).max() == 0.0
    l_x = np.asarray(jnp.linalg.cholesky(jnp.asarray(a)))
    r_p = np.abs(l @ l.T - a).max()
    r_x = np.abs(l_x @ l_x.T - a).max()
    # The kernel's trailing updates are bf16x3 (3-pass MXU, ~16-bit
    # mantissa): the residual class is ~2^8 x the f32 XLA one.  The gate
    # still catches real bugs (those show up as O(1) residuals or NaNs).
    assert r_p <= 400.0 * r_x + 2e-4, (r_p, r_x)


def test_pallas_linv_compiled(prob):
    """Same relative gate for W = L^{-1}: the compiled Pallas TRSM's
    ||W L - I|| residual must match XLA's triangular solve on-chip."""
    import jax.lax as lax

    from gpis_tpu.kernels import pallas_gram as pg
    from gpis_tpu.linalg.pallas_chol import (
        pallas_blocked_cholesky,
        pallas_blocked_linv,
    )

    x, noise, params = prob
    a = pg.gram_pallas("rbf", x, params, noise)
    l = pallas_blocked_cholesky(a, 256)
    w = np.asarray(pallas_blocked_linv(l, 256))
    assert np.abs(np.triu(w, 1)).max() == 0.0
    w_x = np.asarray(lax.linalg.triangular_solve(
        l, jnp.eye(N, dtype=DT), left_side=True, lower=True))
    r_p = np.abs(w @ np.asarray(l) - np.eye(N)).max()
    r_x = np.abs(w_x @ np.asarray(l) - np.eye(N)).max()
    assert np.isfinite(w).all()
    # Same bf16x3 residual class as the cholesky kernel (see above).
    assert r_p <= 400.0 * r_x + 2e-4, (r_p, r_x)


def test_fused_query_compiled(prob):
    from gpis_tpu.kernels import gram as kg
    from gpis_tpu.kernels import pallas_gram as pg
    from gpis_tpu.kernels.pallas_query import fused_query_pallas
    from gpis_tpu.linalg.pallas_chol import (
        pallas_blocked_cholesky,
        pallas_blocked_linv,
    )

    x, noise, params = prob
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(512, 3)), DT)
    a = pg.gram_pallas("rbf", x, params, noise)
    l = pallas_blocked_cholesky(a, 256)
    w = pallas_blocked_linv(l, 256)
    alpha = jnp.asarray(rng.normal(size=(N,)), DT)

    mean, quad = fused_query_pallas("rbf", q, x, params, alpha, w)
    kq = kg.gram_reference("rbf", jnp.concatenate([q, x]), params)[:512, 512:]
    mean_ref = kq @ alpha
    v = jnp.dot(w, kq.T, precision=jax.lax.Precision.HIGHEST)
    quad_ref = jnp.sum(v * v, axis=0)
    # The fused kernel is the SPEED path: single-pass bf16 MXU products
    # with f32 accumulation (~1e-3 relative mean, ~2e-2 quad).  Exactness
    # lives on the HIGHEST GEMM path; this gate checks compilation and
    # tile plumbing, not f32 parity.
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(quad), np.asarray(quad_ref), atol=5e-2)


def test_joint_gram_pallas_compiled(prob):
    """The SINGLE flag-blended joint kernel compiles once and serves the
    whole (4C+T)^2 assembly — with a wall-clock gate on the cold compile
    (the round-2 13-block assembly cost ~8 min of one-time Mosaic compile;
    the replacement must stay interactive)."""
    import time

    from gpis_tpu.kernels import derivative as kd
    from gpis_tpu.kernels import gram as kg_mod
    from gpis_tpu.kernels import pallas_joint as pj

    x, noise, params = prob
    xs = x[:256]
    nf = noise[:256]
    ng = jnp.full((256,), 1e-2, DT)
    tx = x[256:320]
    tn = jnp.full((64,), 1e-2, DT)
    t0 = time.perf_counter()
    got = np.asarray(pj.joint_gram_fused_pallas(
        "rbf", xs, params, nf, ng, touch_x=tx, touch_noise=tn))
    cold = time.perf_counter() - t0
    want4 = kd.joint_gram_reference("rbf", xs, params, noise_f=nf, noise_g=ng)
    b = kd.cross_cov_value("rbf", tx, xs, params)
    d = kg_mod.gram_reference("rbf", tx, params, noise=tn)
    want = np.asarray(jnp.block([[want4, b.T], [b, d]]))
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert cold < 120.0, f"joint gram cold compile took {cold:.0f}s"


def test_fused_joint_query_compiled(prob):
    """Fused joint query (mean, quad) compiled on the real chip vs the
    HIGHEST-GEMM chain."""
    from gpis_tpu.gp import derivative as gpd

    x, noise, params = prob
    n = 192
    xs = x[:n] / jnp.linalg.norm(x[:n], axis=1, keepdims=True)
    nrm = xs
    y = jnp.zeros((n,), DT)
    # c=192 -> 4C=768; T=256 makes J=1024, a 256-multiple (the fused gate).
    # Noise well above n*eps*||K|| (same reasoning as the fixture): this
    # tier checks Mosaic compilation and tile plumbing — an
    # ill-conditioned factor inflates ||alpha|| and the single-pass-bf16
    # dots' absolute error with it, which is the jitter ladder's domain,
    # not this gate's.
    model = gpd.fit_with_normals("rbf", xs, y, nrm, 1e-2, 2e-2, params,
                                 block=64, touch_capacity=256)
    model = gpd.with_linv_joint(model)
    q = jnp.asarray(np.random.default_rng(5).normal(size=(4096, 3)), DT)
    assert gpd._use_fused_joint_query(model, q)
    mean, var = gpd.predict(model, q)
    kq = gpd.joint_cross_value(model, q)
    mean_ref = jnp.dot(kq, model.alpha, precision=jax.lax.Precision.HIGHEST)
    v = jnp.dot(model.linv, kq.T, precision=jax.lax.Precision.HIGHEST)
    from gpis_tpu.kernels import functions as kf_mod

    var_ref = kf_mod.k_diag0("rbf", model.params) - jnp.sum(v * v, axis=0)
    # Speed-path grade (single-pass bf16 MXU dots, f32 accumulation): the
    # joint kq carries dk-scaled gradient columns ~1/ls^2 larger than the
    # value kernel's, so the absolute mean tolerance is wider than the
    # value-model fused gate (2e-3).
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), atol=5e-2)


def test_sharded_pallas_panels_mesh1_compiled(prob):
    """use_pallas sharded Cholesky on a mesh of ONE real chip — exercises
    pallas_call inside shard_map compiled by Mosaic."""
    from gpis_tpu.linalg import sharded as sh
    from gpis_tpu.linalg.pallas_chol import pallas_blocked_cholesky
    from gpis_tpu.parallel import mesh as pm

    x, noise, params = prob
    from gpis_tpu.kernels import pallas_gram as pg

    mesh = pm.make_row_mesh(1)
    a = pg.gram_pallas("rbf", x, params, noise)
    l_sh = np.asarray(sh.sharded_cholesky(a, mesh, block=256, use_pallas=True))
    l_ref = np.asarray(pallas_blocked_cholesky(a, 256))
    # The sharded panel solve is XLA's triangular solve; the single-chip
    # kernel uses the inverse+bf16x3-GEMM panel — same class, small drift.
    np.testing.assert_allclose(l_sh, l_ref, atol=5e-4)


def test_fit_predict_end_to_end_tpu():
    """One tiny end-to-end fit+query on the chip through the public API —
    the dispatch thresholds route to jnp at this size; this guards the
    session path itself on hardware."""
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis

    pts = gpis.fibonacci_sphere(256, radius=0.05)  # world units
    sess = ObjectModelSession(ModelConfig(lengthscale=0.5, block=64,
                                          touch_capacity=64))
    sess.start(pts)
    mean, var = sess.query(pts[:32])
    assert np.abs(mean).max() < 0.05
    assert np.isfinite(var).all()


def test_fit_inference_compiled(prob):
    """The one-matrix-peak fit (in-place chol + in-place TRSM + W-alpha,
    donated jits) runs compiled and matches the two-buffer model's
    posterior to speed-path tolerance."""
    from gpis_tpu.gp import regression as gpr

    x, noise, params = prob
    y = jnp.zeros((N,), DT)
    m_ref = gpr.with_linv(gpr.fit("rbf", x, y, noise, params, block=256,
                                  touch_capacity=0))
    m_inf = gpr.fit_inference("rbf", x, y, noise, params, block=256)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(512, 3)), DT)
    a1, v1 = gpr.predict(m_ref, q, precision=jax.lax.Precision.HIGHEST)
    a2, v2 = gpr.predict(m_inf, q, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=5e-3)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=5e-3)


def test_sharded_band_kernels_mesh1_compiled(prob):
    """Band Gram + fused band quad (the sharded pipeline's Pallas tiles)
    compiled inside shard_map on a mesh of one real chip."""
    from gpis_tpu.kernels import gram as kg
    from gpis_tpu.linalg import sharded as sh
    from gpis_tpu.linalg.pallas_chol import (
        pallas_blocked_cholesky,
        pallas_blocked_linv,
    )
    from gpis_tpu.parallel import mesh as pm

    x, noise, params = prob
    mesh = pm.make_row_mesh(1)
    a_sh = np.asarray(sh.sharded_gram("rbf", x, params, noise, mesh))
    a_ref = np.asarray(kg.gram_reference("rbf", x, params, noise=noise))
    np.testing.assert_allclose(a_sh, a_ref, atol=2e-5)

    l = pallas_blocked_cholesky(jnp.asarray(a_sh), 256)
    w = pallas_blocked_linv(l, 256)
    y = jnp.asarray(np.random.default_rng(3).normal(size=N) * 0.1, DT)
    alpha = sh.sharded_alpha_from_linv(w, y, mesh)
    q = jnp.asarray(np.random.default_rng(4).normal(size=(512, 3)), DT)
    mean, var = sh.sharded_predict_linv("rbf", q, x, params, alpha, w, mesh)
    # Reference via the single-chip GEMM paths on the same chip.
    kq = kg.gram_reference("rbf", jnp.concatenate([q, x]), params)[:512, 512:]
    mean_ref = jnp.dot(kq, alpha, precision=jax.lax.Precision.HIGHEST)
    v = jnp.dot(w, kq.T, precision=jax.lax.Precision.HIGHEST)
    var_ref = 1.0 - jnp.sum(v * v, axis=0)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), atol=5e-2)


def test_ooc_pipeline_compiled(prob):
    """Out-of-core fit + streamed bordering update + streamed query,
    COMPILED on the chip: covers the panel kernels' Mosaic paths (band
    Gram, masked GEMMs, fused band quad with the DMA-elision index map)
    plus the tail-correction algebra at a small tiled size."""
    from gpis_tpu.linalg import outofcore as ooc

    x, noise, params = prob
    rng = np.random.default_rng(31)
    y = jnp.asarray(rng.normal(size=N) * 0.2, DT)
    m = ooc.ooc_fit("rbf", x, y, noise, params, panel=256)
    q = jnp.asarray(rng.normal(size=(64, 3)), DT)
    mean, var = m.predict(q, chunk=1024)
    assert np.isfinite(np.asarray(mean)).all()
    assert (np.asarray(var) >= 0).all()

    # Reference posterior from the in-core path on the same chip.
    from gpis_tpu.gp import regression as gpr

    ref = gpr.with_linv(
        gpr.fit("rbf", x, y, noise, params, block=256, touch_capacity=0),
        block=256)
    mean_r, var_r = gpr.predict(ref, q, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_r),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_r), atol=5e-3)

    # Streamed bordering update: variance at the touch collapses.
    touch = jnp.asarray(rng.normal(size=(2, 3)), DT)
    touch = touch / jnp.linalg.norm(touch, axis=1, keepdims=True) * 1.2
    _, v0 = m.predict(touch, chunk=1024)
    m2 = m.update(touch, 0.0, 1e-4)
    _, v1 = m2.predict(touch, chunk=1024)
    assert float(jnp.max(v1)) < float(jnp.min(v0))

    # Serving-mode promotion on the chip: pin a spilled store's panels
    # into HBM; the posterior must be bit-identical to the pre-promotion
    # streamed path (promotion changes residency, not values).
    ms = ooc.ooc_fit("rbf", x, y, noise, params, panel=256,
                     device_budget=2 * 256 * m.capacity * 4)
    mean_s, var_s = ms.predict(q, chunk=1024)
    assert ms.promote_for_serving() > 0
    mean_p, var_p = ms.predict(q, chunk=1024)
    np.testing.assert_array_equal(np.asarray(mean_p), np.asarray(mean_s))
    np.testing.assert_array_equal(np.asarray(var_p), np.asarray(var_s))

def test_ooc_joint_pipeline_compiled(prob):
    """Joint (config 2) out-of-core fit + streamed update + query COMPILED
    on the chip: covers the packed-metadata joint band Gram
    (joint_rows_pallas under _gram_band), the fused joint band quad kernel
    (DMA-elision index map), and the joint tail bordering at a small tiled
    size (C=256 -> J=1024, panel 256)."""
    from gpis_tpu.gp import derivative as gpd
    from gpis_tpu.linalg import outofcore as ooc

    x, _, params = prob
    rng = np.random.default_rng(37)
    c = 256
    xs = x[:c]
    nrm = xs  # unit sphere: outward normal == position
    y = jnp.zeros((c,), DT)
    m = ooc.ooc_fit_joint("rbf", xs, y, nrm, 5e-2, 1e-1, params, panel=256)
    assert m.alpha.shape[0] == 1024
    q = jnp.asarray(rng.normal(size=(64, 3)), DT)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True) * 1.1
    mean, var = m.predict(q, chunk=1024)
    assert np.isfinite(np.asarray(mean)).all()
    assert (np.asarray(var) >= 0).all()

    # Reference posterior from the in-core joint path on the same chip.
    ref = gpd.fit_with_normals("rbf", xs, y, nrm, jnp.full(c, 5e-2, DT),
                               jnp.full(c, 1e-1, DT), params, block=64)
    mean_r, var_r = gpd.predict(ref, q)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_r),
                               atol=5e-3)
    k0 = float(jnp.asarray(params["signal_variance"]))
    np.testing.assert_allclose(np.asarray(var),
                               np.clip(np.asarray(var_r), 0.0, k0),
                               atol=5e-3)

    # Streamed joint bordering update: variance at the touch collapses.
    touch = jnp.asarray(rng.normal(size=(2, 3)), DT)
    touch = touch / jnp.linalg.norm(touch, axis=1, keepdims=True) * 1.2
    _, v0 = m.predict(touch, chunk=1024)
    m2 = m.update(touch, 0.0, 1e-3)
    _, v1 = m2.predict(touch, chunk=1024)
    assert float(jnp.max(v1)) < float(jnp.min(v0))


def test_ooc_hyperopt_compiled(prob):
    """One ooc_mll_and_grad evaluation COMPILED on the chip: the streamed
    dK-band trace/quad GEMMs, colnorm pass, and the byproduct MLL assembly
    all run on Mosaic/XLA-compiled paths (the factor/TRSM kernels are
    covered above; this adds the gradient stream).  The noise-scale and
    signal-variance identities are O(C) algebra — sanity-gate signs/finiteness
    here, exactness belongs to the f64 CPU parity test."""
    from gpis_tpu.gp import ooc_hyperopt as oho

    x, noise, params = prob
    rng = np.random.default_rng(77)
    y = jnp.asarray(rng.normal(size=N) * 0.2, DT)
    mll, g = oho.ooc_mll_and_grad("rbf", x, y, noise, params, panel=256,
                                  noise_scale=1.2)
    vals = [float(mll)] + [float(g[k]) for k in
                           ("log_ls", "log_noise_scale", "log_sv")]
    assert all(np.isfinite(v) for v in vals), vals
    # Directional check vs finite differences on the lengthscale (the
    # streamed-trace term — coarse rtol: f32 factor + bf16x3 kernels).
    eps = 0.02
    up = dict(params, lengthscale=params["lengthscale"] * float(np.exp(eps)))
    dn = dict(params, lengthscale=params["lengthscale"] * float(np.exp(-eps)))
    mu, _ = oho.ooc_mll_and_grad("rbf", x, y, noise, up, panel=256,
                                 noise_scale=1.2)
    md, _ = oho.ooc_mll_and_grad("rbf", x, y, noise, dn, panel=256,
                                 noise_scale=1.2)
    fd = (float(mu) - float(md)) / (2 * eps)
    np.testing.assert_allclose(float(g["log_ls"]), fd,
                               rtol=0.05, atol=2.0)


def test_experts_committee_compiled():
    """Expert committee (EP axis) compiled on the chip: the stacked
    lax.map fit program (native chol + Pallas TRSM + Newton-refined W),
    the host-gated fused query program, and a routed touch bordering.
    Guards PERF.md rule 7: the Newton step must keep committee variances
    POSITIVE and sane (raw Pallas W drove them negative at this scale)."""
    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis as gpis_mod
    from gpis_tpu.gp import experts as ex
    from gpis_tpu.kernels import functions as kf

    cfg = ModelConfig(lengthscale=1.0, touch_capacity=64)
    pts = gpis_mod.fibonacci_sphere(4096, radius=1.0).astype(np.float32)
    ts = gpis_mod.build_training_set(pts, cfg)
    params = {k: v.astype(DT)
              for k, v in kf.kernel_params(1.0, 1.0).items()}
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=4,
                       n_shared_tail=ts.n_internal + ts.n_external,
                       block=cfg.block, touch_capacity=cfg.touch_capacity,
                       pad_noise=cfg.pad_noise, gate=2)
    assert m.capacity >= 1024 and m.linv is not None  # Pallas TRSM engaged

    rng = np.random.default_rng(5)
    q = rng.normal(size=(2048, 3)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q *= rng.uniform(0.9, 1.6, size=(2048, 1)).astype(np.float32)
    mean, var = ex.predict(m, jnp.asarray(q), chunk=1024)  # gated program
    mean, var = np.asarray(mean), np.asarray(var)
    assert np.isfinite(mean).all() and np.isfinite(var).all()
    assert (var > 0).all() and var.max() <= 1.01  # no negative-quad regression
    # Queries within 0.02 of the surface read |f| up to ~dist * |grad f|
    # (grad magnitude is O(2-4) for the normalized GPIS field) — this is a
    # compile smoke, accuracy bars live in the f64 CPU tier.
    on = np.abs(np.linalg.norm(q, axis=1) - 1.0) < 0.02
    assert np.abs(mean[on]).max() < 0.15

    # Routed touch bordering with the Schur-gated ladder, compiled.
    tp = jnp.asarray([[0.0, 0.0, 1.3]], DT)
    m0, v0 = ex.predict(m, tp)
    mu = ex.update(m, tp, jnp.zeros(1, DT), jnp.full(1, 1e-4, DT))
    m1, v1 = ex.predict(mu, tp)
    assert int(np.asarray(mu.n_touch).sum()) == 1
    assert abs(float(m1[0])) < 0.6 * abs(float(m0[0]))  # pulled toward 0
    assert float(v1[0]) < float(v0[0]) * 1.5 + 1e-3


def test_compile_cache_cross_process(tmp_path):
    """VERDICT r3 item 3: the persistent compile cache must actually serve
    a SECOND process from disk on this backend.  Process 1 populates the
    cache dir; process 2 must log a persistent-cache HIT for the same
    computation (JAX_DEBUG_LOG_MODULES on jax._src.compiler exposes the
    hit/miss lines).  If axon cannot serve serialized executables, this
    fails loudly here instead of silently no-opping all round."""
    import os
    import subprocess
    import sys

    code = (
        "from gpis_tpu.utils.compile_cache import enable\n"
        "enable()\n"
        "import jax, jax.numpy as jnp\n"
        "x = jnp.full((384, 384), 1.000173)\n"
        "print(float((x @ x).sum()))\n"
    )
    env = dict(os.environ)
    env["GPIS_COMPILE_CACHE_DIR"] = str(tmp_path)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["GPIS_COMPILE_CACHE"] = "1"
    r1 = subprocess.run([sys.executable, "-c", code], env=env,
                        capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    files = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert files, "first process left no cache entries"

    env["JAX_DEBUG_LOG_MODULES"] = "jax._src.compiler"
    r2 = subprocess.run([sys.executable, "-c", code], env=env,
                        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "persistent compilation cache hit" in r2.stderr.lower(), (
        "no cache hit logged; stderr tail:\n" + r2.stderr[-2000:]
    )


def test_compile_cache_cpu_guard(tmp_path):
    """A process whose live backend is CPU must drop the cache dir at
    guard time even though enable() configured it (ADVICE r3: axon
    fallback / late cpu pin must not cache SIGILL-unsafe CPU binaries)."""
    import os
    import subprocess
    import sys

    code = (
        "import jax\n"
        "from gpis_tpu.utils import compile_cache as cc\n"
        "cc.enable()\n"  # configured platform is axon/tpu: cache arms
        "assert jax.config.jax_compilation_cache_dir\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "jnp.ones((8,)).sum()\n"  # live backend: cpu
        "cc.guard_cpu_backend()\n"
        "assert not jax.config.jax_compilation_cache_dir\n"
        "print('guarded')\n"
    )
    env = dict(os.environ)
    env["GPIS_COMPILE_CACHE_DIR"] = str(tmp_path)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["GPIS_COMPILE_CACHE"] = "1"
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "guarded" in r.stdout


def test_fused_query_staged_compiled(prob):
    """r5 staged-kq query path compiled: stage-A cross-cov into HBM + the
    kq-reading quad kernel (with its dual-role index map) must match the
    on-the-fly kernel on the same operands to tight tolerance (same dot
    structure, same tiles — only the kq source differs)."""
    from gpis_tpu.kernels import pallas_gram as pg
    from gpis_tpu.kernels.pallas_query import fused_query_pallas
    from gpis_tpu.linalg.pallas_chol import (
        pallas_blocked_cholesky,
        pallas_blocked_linv,
    )

    x, noise, params = prob
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(512, 3)), DT)
    a = pg.gram_pallas("rbf", x, params, noise)
    l = pallas_blocked_cholesky(a, 256)
    w = pallas_blocked_linv(l, 256)
    alpha = jnp.asarray(rng.normal(size=(N,)), DT)

    mean0, quad0 = fused_query_pallas("rbf", q, x, params, alpha, w,
                                      staged=False)
    mean1, quad1 = fused_query_pallas("rbf", q, x, params, alpha, w,
                                      staged=True)
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean0),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(quad1), np.asarray(quad0),
                               atol=1e-3)


def test_panel_solve_inv_compiled(prob):
    """r5 'inv' panel solve compiled: factor + TRSM through the small-
    inverse + Pallas-GEMM path must land in the same residual class as the
    'xla' substitution path on the same Gram."""
    from gpis_tpu.kernels import pallas_gram as pg
    from gpis_tpu.linalg.pallas_chol import (
        pallas_blocked_cholesky,
        pallas_blocked_linv,
    )

    x, noise, params = prob
    a = pg.gram_pallas("rbf", x, params, noise)
    an = np.asarray(a)
    res = {}
    for ps in ("xla", "inv"):
        l = pallas_blocked_cholesky(a, 256, panel_solve=ps)
        w = np.asarray(pallas_blocked_linv(l, 256, panel_solve=ps))
        ln = np.asarray(l)
        assert np.isfinite(ln).all() and np.isfinite(w).all()
        res[ps] = (np.abs(ln @ ln.T - an).max(),
                   np.abs(w @ ln - np.eye(N)).max())
    # Same class: the inv path trades backward-stable substitution for
    # eps_bf16x3 * k(Ljj) on the panels — bounded at 8x the xla path here.
    assert res["inv"][0] <= 8.0 * res["xla"][0] + 2e-4, res
    assert res["inv"][1] <= 8.0 * res["xla"][1] + 2e-4, res
