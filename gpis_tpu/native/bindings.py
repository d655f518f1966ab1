"""ctypes bindings for the native host runtime (libgomcpp.so).

Every entry point has a pure-Python/NumPy fallback elsewhere in the
package; callers check `available()` and fall back gracefully, so the
framework works with or without a C++ toolchain.
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

__all__ = ["available", "voxel_downsample", "marching_tets", "ply_extract"]

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = pathlib.Path(__file__).resolve().parent / "libgomcpp.so"
    if not path.exists():
        try:
            from gpis_tpu.native.build import ensure_built

            built = ensure_built()
            if built is None:
                return None
            path = built
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    c_d = ctypes.POINTER(ctypes.c_double)
    lib.gom_voxel_downsample.restype = ctypes.c_int64
    lib.gom_voxel_downsample.argtypes = [c_d, ctypes.c_int64, ctypes.c_double, c_d]
    lib.gom_marching_tets.restype = ctypes.c_int64
    lib.gom_marching_tets.argtypes = [
        c_d, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        c_d, c_d, c_d, ctypes.c_double, ctypes.POINTER(c_d),
    ]
    lib.gom_free.restype = None
    lib.gom_free.argtypes = [ctypes.c_void_p]
    c_i32 = ctypes.POINTER(ctypes.c_int32)
    lib.gom_ply_extract.restype = ctypes.c_int64
    lib.gom_ply_extract.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, c_i32, c_i32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, c_d, c_d,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_c(arr):
    return np.ascontiguousarray(arr, dtype=np.float64)


def voxel_downsample(points: np.ndarray, leaf: float) -> np.ndarray:
    lib = _load()
    pts = _as_c(points)
    n = len(pts)
    out = np.empty((n, 3), np.float64)
    m = lib.gom_voxel_downsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, leaf,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out[:m].copy()


def marching_tets(field: np.ndarray, axis_x, axis_y=None, axis_z=None,
                  iso: float = 0.0):
    """Native marching tetrahedra; same output convention as
    gpis_tpu.surface.marching.marching_tetrahedra (triangle soup)."""
    lib = _load()
    f = _as_c(field)
    rx, ry, rz = f.shape
    ax = _as_c(axis_x)
    ay = ax if axis_y is None else _as_c(axis_y)
    az = ax if axis_z is None else _as_c(axis_z)
    out_ptr = ctypes.POINTER(ctypes.c_double)()
    ntri = lib.gom_marching_tets(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), rx, ry, rz,
        ax.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ay.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        az.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        iso, ctypes.byref(out_ptr),
    )
    if ntri == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    buf = np.ctypeslib.as_array(out_ptr, shape=(ntri * 3, 3)).copy()
    lib.gom_free(out_ptr)
    faces = np.arange(ntri * 3, dtype=np.int64).reshape(-1, 3)
    return buf, faces


_PLY_KINDS = {"float": 0, "float32": 0, "double": 1, "float64": 1,
              "uchar": 2, "uint8": 2, "char": 2, "int8": 2,
              "short": 3, "ushort": 3, "int16": 3, "uint16": 3,
              "int": 4, "int32": 4, "uint": 4, "uint32": 4}
_PLY_SIZES = {0: 4, 1: 8, 2: 1, 3: 2, 4: 4}


def ply_extract(buf: bytes, n_vertex: int, prop_types, idx):
    """Extract xyz (+normals) from a binary-little-endian PLY vertex buffer.
    prop_types: list of PLY type strings; idx: name->property index map."""
    lib = _load()
    kinds = np.asarray([_PLY_KINDS[t] for t in prop_types], np.int32)
    sizes = np.asarray([_PLY_SIZES[k] for k in kinds], np.int32)
    arr = np.frombuffer(buf, np.uint8)
    pts = np.empty((n_vertex, 3), np.float64)
    has_n = all(k in idx for k in ("nx", "ny", "nz"))
    nrm = np.empty((n_vertex, 3), np.float64) if has_n else None
    lib.gom_ply_extract(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_vertex,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(prop_types), idx["x"], idx["y"], idx["z"],
        idx.get("nx", -1), idx.get("ny", -1), idx.get("nz", -1),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        (nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if has_n
         else ctypes.cast(None, ctypes.POINTER(ctypes.c_double))),
    )
    return pts, nrm
