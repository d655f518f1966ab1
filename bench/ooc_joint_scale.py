"""Joint (config 2) out-of-core scale bench: fit a normals cloud whose
JOINT factor exceeds HBM on one chip, then a dense-grid query + RMSE gate.

The joint system has J = 4C rows, so "beyond HBM" arrives at 4x smaller
clouds than the value path: n=16384 surface points with normals make a
J=65,536 factor (17.2 GB f32 Gram > 15.75 GB HBM) — a size the in-core
joint path (gp/derivative.py) cannot represent at all.  This is the
config-2 analogue of the N=100k value-model judge run (bench/ooc_staged).

Usage:  python bench/ooc_joint_scale.py [N=16384] [GRID=64]
Prints ONE JSON line: {"metric": "ooc_joint_fit_query_<N>", ...}.

Unlike ooc_staged this is one-shot (no process split): the joint band
assembly happens ON DEVICE from the packed metadata, so phase-1 h2d
traffic is only panel refetch — and at J=65k the planner's HBM-resident
tier holds nearly the whole triangular W, so client RSS stays bounded.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _watchdog(s: float, metric: str) -> None:
    def fire():
        print(json.dumps({"metric": metric, "ok": False,
                          "error": f"watchdog: no result after {s:.0f}s"}),
              flush=True)
        os._exit(3)

    t = threading.Timer(s, fire)
    t.daemon = True
    t.start()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    grid_res = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    metric = f"ooc_joint_fit_query_{n}"
    _watchdog(float(os.environ.get("OOC_JOINT_WD", "10800")), metric)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.data import gpis
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.linalg import outofcore as ooc
    from gpis_tpu.surface import grid as grid_mod
    from gpis_tpu.surface import marching

    # Hermite GPIS problem: surface points with outward normals (unit
    # sphere), zero function targets — the gradient observations pin the
    # field, no off-surface labels needed (reference §4.1 normals path).
    pts = gpis.fibonacci_sphere(n, radius=1.0).astype(np.float32)
    nrm = pts.copy()
    y = np.zeros((n,), np.float32)
    params = {k: jnp.asarray(v, jnp.float32)
              for k, v in kf.kernel_params(0.7, 1.0).items()}

    panel = int(os.environ.get("OOC_PANEL", "4096"))
    t0 = time.perf_counter()
    m = ooc.ooc_fit_joint("rbf", pts, y, nrm, 1e-3, 1e-2, params,
                          panel=panel)
    jax.block_until_ready(m.alpha)
    fit_s = time.perf_counter() - t0
    j_tot = int(m.alpha.shape[0])
    print(f"[fit] n={n} J={j_tot} panel={panel} fit={fit_s:.1f}s",
          flush=True)

    coords, axis = grid_mod.make_grid(grid_res, 1.5, dtype=jnp.float32)
    t0 = time.perf_counter()
    mean, var = m.predict(coords)
    jax.block_until_ready((mean, var))
    query_s = time.perf_counter() - t0
    field = np.asarray(mean).reshape(grid_res, grid_res, grid_res)
    verts, _ = marching.marching_tetrahedra(field, np.asarray(axis))
    r = np.linalg.norm(verts, axis=1)
    rmse = float(np.sqrt(np.mean((r - 1.0) ** 2))) if len(verts) else float("nan")
    ok = bool(np.isfinite(rmse) and rmse < 0.01)
    out = {"metric": metric, "value": fit_s + query_s, "unit": "s",
           "n": n, "j": j_tot, "panel": panel, "fit_s": round(fit_s, 1),
           "query_s": round(query_s, 1), "grid": grid_res,
           "rmse": rmse, "ok": ok,
           "gram_gb": round(j_tot * j_tot * 4 / 1e9, 1)}
    from gpis_tpu.utils.provenance import provenance

    out.update(provenance())
    print(json.dumps(out), flush=True)
    m.wstore.clear()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
