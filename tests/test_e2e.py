"""End-to-end milestone configs 1-5 (BASELINE.md; SURVEY.md §5 item 6).

Each config runs at CI-friendly scale (shapes shrunk, math identical) and
checks correctness; the full-size wall-clock versions live in bench/ and
bench.py.  Marked `e2e`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.config import ModelConfig
from gpis_tpu.data import gpis, synthetic
from gpis_tpu.gp import derivative as gpd
from gpis_tpu.gp import hyperopt as ho
from gpis_tpu.gp import regression as gpr
from gpis_tpu.kernels import functions as kf
from gpis_tpu.surface import grid as grid_mod
from gpis_tpu.surface import marching

pytestmark = pytest.mark.e2e


def test_config1_rbf_sphere_fit():
    """Config 1: exact GP implicit-surface fit, RBF kernel, 1k-point
    synthetic sphere cloud, Cholesky solve."""
    pts = gpis.fibonacci_sphere(1000, radius=1.0)
    cfg = ModelConfig(kernel="rbf", lengthscale=0.5, noise_surface=1e-5)
    ts = gpis.build_training_set(pts, cfg)
    params = kf.kernel_params(cfg.lengthscale, cfg.signal_variance)
    model = gpr.fit(cfg.kernel, ts.x, ts.y, ts.noise, params)
    # Radial crossings accurate to <1% of the radius.
    dirs = gpis.fibonacci_sphere(64, 1.0)
    rs = np.linspace(0.9, 1.1, 81)
    q = jnp.asarray((dirs[:, None, :] * rs[None, :, None]).reshape(-1, 3))
    f = np.asarray(gpr.predict_mean(model, q)).reshape(64, 81)
    crossings = rs[np.argmin(np.abs(f), axis=1)]
    assert np.abs(crossings - 1.0).max() < 0.01


@pytest.mark.slow
def test_config2_thin_plate_normals_scan():
    """Config 2: thin-plate kernel + derivative observations on a scanned
    object (ellipsoid partial scan stands in for the real scan fixture)."""
    pts, nrm = synthetic.ellipsoid_cloud(400, radii=(1.0, 0.8, 0.6), seed=11)
    params = kf.kernel_params(4.0, 1.0)  # R > diameter for CPD thin-plate
    model = gpd.fit_with_normals(
        "thin_plate", jnp.asarray(pts), jnp.zeros(len(pts)), jnp.asarray(nrm),
        1e-5, 1e-4, params, block=64,
    )
    # Posterior gradient reproduces the scan normals.
    g = np.array(gpd.predict_gradient(model, jnp.asarray(pts[:50])))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    cos = np.sum(g * nrm[:50], axis=1)
    assert cos.min() > 0.99
    # Zero level set matches the true ellipsoid: |implicit(v)| small on verts.
    mean, _, axis = grid_mod.evaluate_grid(model, 32, 1.4)
    verts, _ = marching.marching_tetrahedra(np.asarray(mean), np.asarray(axis))
    lhs = np.sqrt((verts[:, 0] / 1.0) ** 2 + (verts[:, 1] / 0.8) ** 2
                  + (verts[:, 2] / 0.6) ** 2)
    assert np.abs(lhs - 1.0).mean() < 0.02


def test_config3_hyperopt_recovers_lengthscale():
    """Config 3: MLL optimization with AD through Cholesky."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(80, 3))
    import oracle

    k = oracle.gram("rbf", x, 0.5, 1.0, noise=1e-4)
    y = np.linalg.cholesky(k) @ rng.normal(size=80)
    xp, yp, np_ = gpr._pad_training(
        jnp.asarray(x), jnp.asarray(y), jnp.full(80, 1e-4), 128, 1e10, jnp.float64
    )
    res = ho.optimize("rbf", xp, yp, np_, kf.kernel_params(2.0, 1.0),
                      n_real=80, steps=100)
    assert 0.3 < float(res.params["lengthscale"]) < 0.9


@pytest.mark.slow
def test_config4_dense_grid_isosurface():
    """Config 4: dense grid posterior mean+variance + isosurface extraction."""
    pts = gpis.fibonacci_sphere(800, radius=1.0)
    cfg = ModelConfig(kernel="rbf", lengthscale=0.5, noise_surface=1e-5)
    ts = gpis.build_training_set(pts, cfg)
    params = kf.kernel_params(cfg.lengthscale, cfg.signal_variance)
    model = gpr.with_inverse(gpr.fit(cfg.kernel, ts.x, ts.y, ts.noise, params))
    mean, var, axis = grid_mod.evaluate_grid(model, 48, 1.5, chunk=8192)
    assert np.isfinite(np.asarray(mean)).all()
    verts, faces = marching.marching_tetrahedra(np.asarray(mean), np.asarray(axis))
    r = np.linalg.norm(verts, axis=1)
    assert np.sqrt(np.mean((r - 1.0) ** 2)) < 0.01
    # Variance is small near the surface, large far outside the shell.
    vgrid = np.asarray(var)
    center = vgrid[24, 24, 24]
    corner = vgrid[0, 0, 0]
    assert corner > center


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.slow
def test_config5_sharded_fit_query():
    """Config 5 (CI scale): row-block-sharded Gram + ICI-distributed blocked
    Cholesky + sharded query on the 8-device mesh, vs single-device."""
    from gpis_tpu.linalg import sharded as sh
    from gpis_tpu.parallel import mesh as pm

    mesh = pm.make_row_mesh(8)
    pts = gpis.fibonacci_sphere(1000, radius=1.0)
    cfg = ModelConfig(kernel="rbf", lengthscale=0.5, noise_surface=1e-4,
                      n_external=23, n_internal=1)
    ts = gpis.build_training_set(pts, cfg)
    c = 1024  # 1000 + 24 = divisible by 8 devices x 64-blocks
    params = kf.kernel_params(cfg.lengthscale, cfg.signal_variance)

    a = sh.sharded_gram(cfg.kernel, ts.x, params, ts.noise, mesh)
    l = sh.sharded_cholesky(a, mesh, block=64)
    w = sh.sharded_linv(l, mesh, block=64)
    alpha = sh.sharded_alpha_from_linv(w, ts.y, mesh)
    q = jnp.asarray(gpis.fibonacci_sphere(512, 1.05))
    mean, var = sh.sharded_predict_linv(cfg.kernel, q, ts.x, params, alpha, w, mesh)

    ref = gpr.fit(cfg.kernel, ts.x, ts.y, ts.noise, params, block=64, touch_capacity=0)
    mean_ref, var_ref = gpr.predict(ref, q)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), atol=1e-6)


@pytest.mark.slow
def test_torus_reconstruction():
    """Genus-1 object. The reference's centroid-internal-point labeling
    breaks here (the centroid sits in the torus HOLE — outside the solid),
    and so does ours, faithfully.  The rebuild's fix: derivative (normal)
    observations orient the surface without any internal label, and the
    torus reconstructs."""
    pts, nrm = synthetic.torus_cloud(1200, R=1.0, r=0.35, seed=3)
    ls = 0.35

    # Joint model: surface values + normals, NO internal point needed.
    params = kf.kernel_params(ls, 1.0)
    # Normalize like the session would (unit sphere), keeping normals valid
    # (similarity transforms preserve directions).
    from gpis_tpu.data.gpis import normalize_cloud

    xn, frame = normalize_cloud(pts)
    model = gpd.fit_with_normals(
        "rbf", xn, jnp.zeros(len(pts)), jnp.asarray(nrm),
        1e-5, 1e-4, kf.kernel_params(ls / float(frame.scale), 1.0), block=64,
    )
    mean, _, axis = grid_mod.evaluate_grid(model, 56, 1.2, chunk=8192)
    verts, faces = marching.marching_tetrahedra(np.asarray(mean), np.asarray(axis))
    assert len(verts) > 2000
    w = np.asarray(frame.to_world(jnp.asarray(verts)))
    sd = synthetic.sdf_torus(w, R=1.0, r=0.35)
    assert np.abs(sd).mean() < 0.03
    # Genus check by proxy: no surface verts in the hole's center column.
    col = np.linalg.norm(w[:, :2], axis=1)
    deep_hole = (col < 0.3) & (np.abs(w[:, 2]) < 0.2)
    assert deep_hole.sum() == 0


def test_duplicate_points_robustness(rng):
    """Exactly duplicated points make K singular at tiny noise; the
    auto-jitter ladder must still produce a usable fit."""
    base = gpis.fibonacci_sphere(80, radius=1.0)
    pts = np.concatenate([base, base[:40]])  # 40 exact duplicates
    cfg = ModelConfig(kernel="rbf", lengthscale=0.7, noise_surface=1e-8,
                      n_external=16, block=32)
    ts = gpis.build_training_set(pts, cfg)
    params = kf.kernel_params(cfg.lengthscale, cfg.signal_variance)
    model = gpr.fit(cfg.kernel, ts.x, ts.y, ts.noise, params,
                    block=32, touch_capacity=0)
    mean, var = gpr.predict(model, jnp.zeros((1, 3)))
    assert np.isfinite(float(mean[0])) and float(mean[0]) < -0.5
