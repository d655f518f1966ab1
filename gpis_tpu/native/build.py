"""Build the native host runtime: `python -m gpis_tpu.native.build`.

Invokes g++ directly (no pybind11 — the ABI is plain C consumed via
ctypes).  Also importable: `ensure_built()` compiles on demand and returns
the library path, or None if no toolchain is available.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "src" / "gomcpp.cpp"
_OUT = _DIR / "libgomcpp.so"


def ensure_built(force: bool = False) -> pathlib.Path | None:
    if _OUT.exists() and not force and _OUT.stat().st_mtime >= _SRC.stat().st_mtime:
        return _OUT
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-Wall",
        "-shared", "-o", str(_OUT), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"native build failed: {msg}", file=sys.stderr)
        return None
    return _OUT


if __name__ == "__main__":
    out = ensure_built(force="--force" in sys.argv)
    if out is None:
        sys.exit(1)
    print(f"built {out}")
