"""C4 surface-layer tests: Newton projection, dense grid eval, marching
tetrahedra (SURVEY.md §5 items 1, 5, 6: sphere isosurface RMSE -> 0)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.config import ModelConfig
from gpis_tpu.data import gpis
from gpis_tpu.gp import regression as gpr
from gpis_tpu.kernels import functions as kf
from gpis_tpu.surface import grid, marching, projection


@pytest.fixture(scope="module")
def sphere_model():
    # Fibonacci sphere: centroid ~ 0, so after unit-sphere normalization the
    # surface stays at radius ~1 (a random cloud's centroid offset would
    # shift normalized radii to ~0.97 and the geometric checks below would
    # measure the normalization, not the GP).
    pts = gpis.fibonacci_sphere(300, radius=1.0)
    cfg = ModelConfig(kernel="rbf", lengthscale=0.8, noise_surface=1e-6)
    ts = gpis.build_training_set(pts, cfg)
    params = kf.kernel_params(cfg.lengthscale, cfg.signal_variance)
    return gpr.fit(cfg.kernel, ts.x, ts.y, ts.noise, params, block=128, touch_capacity=128)


def test_projection_lands_on_surface(sphere_model, rng):
    seeds = jnp.asarray(rng.normal(size=(40, 3)))
    seeds = seeds / jnp.linalg.norm(seeds, axis=1, keepdims=True) * 1.4
    pts, ok = projection.project_points(sphere_model, seeds)
    assert np.asarray(ok).all()
    # Projected points lie on the unit sphere (normalized frame).
    r = np.linalg.norm(np.asarray(pts), axis=1)
    np.testing.assert_allclose(r, 1.0, atol=5e-3)
    # And satisfy f == 0.
    f = np.asarray(gpr.predict_mean(sphere_model, pts))
    np.testing.assert_allclose(f, 0.0, atol=1e-5)


def test_normals_point_outward(sphere_model):
    pts = jnp.asarray(gpis.fibonacci_sphere(32, radius=1.0))
    n = np.asarray(projection.surface_normals(sphere_model, pts))
    # For a sphere, the outward normal is the radial direction.
    cos = np.sum(n * np.asarray(pts), axis=1)
    assert np.all(cos > 0.99)


def test_grid_eval_chunking_consistent(sphere_model, rng):
    q = jnp.asarray(rng.normal(size=(100, 3)))
    m1, v1 = grid.evaluate_points_chunked(sphere_model, q, chunk=32)
    m2, v2 = gpr.predict(sphere_model, q)
    np.testing.assert_allclose(m1, m2, atol=1e-10)
    np.testing.assert_allclose(v1, v2, atol=1e-10)


def test_marching_tetrahedra_sphere_rmse(sphere_model):
    mean, _, axis = grid.evaluate_grid(sphere_model, 48, 1.5, chunk=4096)
    verts, faces = marching.marching_tetrahedra(np.asarray(mean), np.asarray(axis))
    assert len(verts) > 1000
    r = np.linalg.norm(verts, axis=1)
    rmse = np.sqrt(np.mean((r - 1.0) ** 2))
    assert rmse < 0.01, f"sphere isosurface RMSE {rmse}"
    vw, fw = marching.weld_vertices(verts, faces)
    assert len(vw) < len(verts)
    assert fw.max() == len(vw) - 1


def test_marching_tetrahedra_analytic_sphere():
    """Pure-geometry check without a GP: exact SDF field in, sphere out."""
    ax = np.linspace(-1.5, 1.5, 40)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    field = np.sqrt(gx**2 + gy**2 + gz**2) - 1.0
    verts, faces = marching.marching_tetrahedra(field, ax)
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 1.0) < 5e-3
    assert r.std() < 5e-3
    # Every face references valid vertices.
    assert faces.max() < len(verts)
