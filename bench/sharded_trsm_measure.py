"""Measure the two sharded TRSM variants (right- vs left-looking) at mesh-1.

VERDICT r2 item 7: "re-measure the sharded TRSM choice (right-looking vs
`sharded_linv_ll`) at 16k/32k mesh-1, wiring the winner as default".  The
collectives are free at mesh-1; what this measures is the per-step GEMM
shape each variant feeds the backend — panel-thin (C,B)@(B,C) with the
Pallas band trail update (right-looking) vs a full-prefix (B,C)@(C,C)
HIGHEST GEMM per block row (left-looking).  Prints one JSON line per size.

Usage:  python bench/sharded_trsm_measure.py [sizes...]   (default 16384 32768)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import threading

    def fire():
        time.sleep(2400)
        print(json.dumps({"ok": False, "error": "watchdog"}), flush=True)
        os._exit(2)

    threading.Thread(target=fire, daemon=True).start()

    import jax
    import jax.numpy as jnp

    from gpis_tpu.data import gpis
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.linalg import sharded as sh
    from gpis_tpu.parallel import mesh as pm

    sizes = [int(a) for a in sys.argv[1:]] or [16384, 32768]
    mesh = pm.make_row_mesh(1)
    use_pallas = jax.default_backend() == "tpu"
    for c in sizes:
        pts = gpis.fibonacci_sphere(c - 128, radius=1.0)
        import numpy as np

        xp = jnp.zeros((c, 3), jnp.float32).at[: c - 128].set(
            jnp.asarray(pts, jnp.float32))
        nz = jnp.full((c,), 1e10, jnp.float32).at[: c - 128].set(1e-3)
        params = {k: v.astype(jnp.float32)
                  for k, v in kf.kernel_params(0.4, 1.0).items()}
        a = sh.sharded_gram("rbf", xp, params, nz, mesh)
        l = sh.sharded_cholesky(a, mesh, block=256, use_pallas=use_pallas)
        jax.block_until_ready(l)
        del a
        out = {"n": c, "mesh": 1}
        for tag, fn in (("rl", sh.sharded_linv), ("ll", sh.sharded_linv_ll)):
            w = jax.block_until_ready(fn(l, mesh, block=256))  # compile
            # parity spot-check: W L ~ I on a few rows
            wl = jnp.dot(w[:256], l, precision=jax.lax.Precision.HIGHEST)
            err = float(jnp.abs(wl - jnp.eye(256, c)).max())
            del w, wl
            t0 = time.perf_counter()
            w = jax.block_until_ready(fn(l, mesh, block=256))
            out[f"{tag}_s"] = round(time.perf_counter() - t0, 3)
            out[f"{tag}_err"] = f"{err:.2e}"
            del w
        print(json.dumps(out), flush=True)
        del l
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
