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


def _write_pcd_ascii(path, pts, normals=None):
    fields = "x y z" + (" normal_x normal_y normal_z" if normals is not None else "")
    nf = 3 + (3 if normals is not None else 0)
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n")
        f.write(f"FIELDS {fields}\n")
        f.write("SIZE " + " ".join(["4"] * nf) + "\n")
        f.write("TYPE " + " ".join(["F"] * nf) + "\n")
        f.write("COUNT " + " ".join(["1"] * nf) + "\n")
        f.write(f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n")
        f.write(f"POINTS {len(pts)}\nDATA ascii\n")
        for i in range(len(pts)):
            row = list(pts[i]) + (list(normals[i]) if normals is not None else [])
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")


def test_pcd_ascii_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(25, 3))
    nrm = rng.normal(size=(25, 3))
    p = str(tmp_path / "c.pcd")
    _write_pcd_ascii(p, pts, nrm)
    p2, n2 = io.load_cloud(p)
    np.testing.assert_allclose(p2, pts, atol=1e-5)
    np.testing.assert_allclose(n2, nrm, atol=1e-5)


def test_pcd_binary(tmp_path, rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    p = str(tmp_path / "b.pcd")
    with open(p, "wb") as f:
        f.write(b"VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                b"COUNT 1 1 1\nWIDTH 10\nHEIGHT 1\nPOINTS 10\nDATA binary\n")
        f.write(pts.astype("<f4").tobytes())
    p2, n2 = io.load_cloud(p)
    np.testing.assert_allclose(p2, pts, atol=1e-6)
    assert n2 is None


def test_pcd_binary_with_padding_field(tmp_path, rng):
    """PCL pads XYZ clouds to 16 bytes with a dummy float — common format."""
    pts = rng.normal(size=(6, 3)).astype(np.float32)
    pad = np.zeros((6, 1), np.float32)
    rows = np.concatenate([pts, pad], axis=1)
    p = str(tmp_path / "p.pcd")
    with open(p, "wb") as f:
        f.write(b"VERSION 0.7\nFIELDS x y z _\nSIZE 4 4 4 4\nTYPE F F F F\n"
                b"COUNT 1 1 1 1\nWIDTH 6\nHEIGHT 1\nPOINTS 6\nDATA binary\n")
        f.write(rows.astype("<f4").tobytes())
    p2, _ = io.load_cloud(p)
    np.testing.assert_allclose(p2, pts, atol=1e-6)
