"""C++ native runtime tests: build-on-demand, and exact agreement with the
pure-Python implementations it accelerates (voxel filter, marching
tetrahedra)."""

import numpy as np
import pytest

from gpis_tpu.native import bindings as nb

pytestmark = pytest.mark.skipif(not nb.available(), reason="native lib unavailable")


def test_voxel_matches_numpy(rng):
    from gpis_tpu.data.voxel import _voxel_downsample_numpy

    pts = rng.normal(size=(3000, 3))
    a = nb.voxel_downsample(pts, 0.25)
    b = _voxel_downsample_numpy(pts, 0.25)
    assert len(a) == len(b)
    sa = set(map(tuple, np.round(a, 9)))
    sb = set(map(tuple, np.round(b, 9)))
    assert sa == sb


def test_voxel_identity_leaf_zero(rng):
    pts = rng.normal(size=(10, 3))
    np.testing.assert_allclose(nb.voxel_downsample(pts, 0.0), pts)


def test_marching_matches_python():
    from gpis_tpu.surface import marching

    ax = np.linspace(-1.4, 1.4, 24)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    field = np.sqrt(gx**2 + 0.8 * gy**2 + 1.3 * gz**2) - 1.0
    v_py, f_py = marching.marching_tetrahedra(field, ax, native=False)
    v_c, f_c = nb.marching_tets(field, ax)
    assert len(f_py) == len(f_c)
    assert set(map(tuple, np.round(v_py, 7))) == set(map(tuple, np.round(v_c, 7)))


def test_marching_empty_field():
    ax = np.linspace(0, 1, 8)
    field = np.ones((8, 8, 8))  # no crossing
    v, f = nb.marching_tets(field, ax)
    assert len(v) == 0 and len(f) == 0


def test_marching_anisotropic_axes():
    ax = np.linspace(-2, 2, 20)
    ay = np.linspace(-1, 1, 12)
    az = np.linspace(-1.5, 1.5, 16)
    gx, gy, gz = np.meshgrid(ax, ay, az, indexing="ij")
    field = np.sqrt((gx / 1.5) ** 2 + gy**2 + gz**2) - 0.8
    v, f = nb.marching_tets(field, ax, ay, az)
    assert len(v) > 100
    val = np.sqrt((v[:, 0] / 1.5) ** 2 + v[:, 1] ** 2 + v[:, 2] ** 2) - 0.8
    assert np.abs(val).max() < 0.05


def test_ply_extract_binary(tmp_path, rng):
    """Native binary-PLY fast path == the struct fallback."""
    from gpis_tpu.data import io as io_mod

    pts = rng.normal(size=(30, 3)).astype(np.float32)
    nrm = rng.normal(size=(30, 3)).astype(np.float32)
    p = str(tmp_path / "b.ply")
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 30\n")
        for name in ("x", "y", "z", "nx", "ny", "nz"):
            f.write(f"property float {name}\n".encode())
        f.write(b"end_header\n")
        f.write(np.concatenate([pts, nrm], axis=1).astype("<f4").tobytes())
    p2, n2 = io_mod.load_ply(p)
    np.testing.assert_allclose(p2, pts, atol=1e-6)
    np.testing.assert_allclose(n2, nrm, atol=1e-6)
