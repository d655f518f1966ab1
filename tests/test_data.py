"""C3 data-layer tests: normalization, GPIS labeling, voxel filter, IO."""

import numpy as np
import pytest

from gpis_tpu.config import ModelConfig
from gpis_tpu.data import gpis, io, synthetic, voxel


def test_normalize_cloud(rng):
    pts = rng.normal(size=(200, 3)) * 3.0 + np.array([5.0, -2.0, 1.0])
    normed, frame = gpis.normalize_cloud(pts)
    np.testing.assert_allclose(np.mean(np.asarray(normed), axis=0), 0.0, atol=1e-12)
    assert np.max(np.linalg.norm(np.asarray(normed), axis=1)) <= 1.0 + 1e-12
    # Round trip.
    back = frame.to_world(normed)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-9)


def test_build_training_set_labels():
    pts, _ = synthetic.sphere_cloud(100, radius=2.0, center=(1, 2, 3), seed=0)
    cfg = ModelConfig(n_external=32, n_internal=1, external_radius=2.0)
    ts = gpis.build_training_set(pts, cfg)
    n = ts.x.shape[0]
    assert n == 100 + 1 + 32
    y = np.asarray(ts.y)
    assert np.all(y[:100] == cfg.label_surface)
    assert np.all(y[100:101] == cfg.label_internal)
    assert np.all(y[101:] == cfg.label_external)
    # External shell sits at the configured radius in the normalized frame.
    r = np.linalg.norm(np.asarray(ts.x[101:]), axis=1)
    np.testing.assert_allclose(r, cfg.external_radius, atol=1e-9)
    # Noise roles.
    nz = np.asarray(ts.noise)
    assert np.all(nz[:100] == cfg.noise_surface)


def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1.0, 1.0]])
    out = voxel.voxel_downsample(pts, 0.1)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(sorted(out[:, 0]), [0.005, 1.0])
    # leaf <= 0 is identity
    np.testing.assert_allclose(voxel.voxel_downsample(pts, 0.0), pts)


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(20, 3))
    nrm = rng.normal(size=(20, 3))
    p = str(tmp_path / "c.ply")
    io.save_ply(p, pts, normals=nrm)
    pts2, nrm2 = io.load_cloud(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-5)
    np.testing.assert_allclose(nrm2, nrm, atol=1e-5)


def test_npz_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(10, 3))
    p = str(tmp_path / "c.npz")
    np.savez(p, points=pts)
    pts2, nrm2 = io.load_cloud(p)
    np.testing.assert_allclose(pts2, pts)
    assert nrm2 is None


def test_fibonacci_sphere():
    pts = gpis.fibonacci_sphere(64, radius=2.5)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 2.5, atol=1e-12)
