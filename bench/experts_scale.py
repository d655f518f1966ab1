"""Expert-committee (EP) scale bench: the fast APPROXIMATE path for
100k-class clouds on one chip.

The exact N=100k judge configuration needs the out-of-core panel-streamed
factorization (hours over the shared tunnel link; bench/ooc_staged.py).
The committee trades exactness (rBCM posterior, SURVEY.md §3 EP row /
gp/experts.py) for E independent in-core O(B²) factors — the whole fit
lives in HBM and runs in seconds.  Accuracy is gated by the same
surface-RMSE bar as the exact paths (the committee's implicit surface must
still reconstruct the sphere to <1e-2).

Usage:  python bench/experts_scale.py [N=100000] [E=16] [GRID=64] [GATE=6]
Prints ONE JSON line: {"metric": "experts_fit_query_<N>", ...}.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    grid_res = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    gate = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    metric = f"experts_fit_query_{n}"
    _watchdog(float(os.environ.get("EXPERTS_WD", "3600")), metric)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis
    from gpis_tpu.gp import experts as ex
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.surface import grid as grid_mod
    from gpis_tpu.surface import marching

    # Frontier knobs (VERDICT r4: map the committee accuracy-speed
    # frontier): lengthscale/noise via env (the exact 100k runs use
    # ls=0.4/noise=1e-3), boundary halo, and retain_chol for capacity.
    ls = float(os.environ.get("EXPERTS_LS", "1.0"))
    noise_s = float(os.environ.get("EXPERTS_NOISE", "1e-4"))
    halo = int(os.environ.get("EXPERTS_HALO", "0"))
    cfg = ModelConfig(kernel="rbf", lengthscale=ls, noise_surface=noise_s,
                      touch_capacity=64)
    pts = gpis.fibonacci_sphere(n, radius=1.0).astype(np.float32)
    ts = gpis.build_training_set(pts, cfg)
    params = {k: jnp.asarray(v, jnp.float32)
              for k, v in kf.kernel_params(cfg.lengthscale,
                                           cfg.signal_variance).items()}
    joint = bool(os.environ.get("EXPERTS_NORMALS"))
    if joint:
        # Config 2 x EP: outward unit normals as per-expert gradient rows
        # (the session's _joint_obs layout: zero normals + pad gradient
        # noise on the anchor tail).
        c_rows = ts.x.shape[0]
        n_s = ts.n_surface
        nrm = np.zeros((c_rows, 3), np.float32)
        xs_host = np.asarray(ts.x)
        nrm[:n_s] = xs_host[:n_s] / np.linalg.norm(
            xs_host[:n_s], axis=1, keepdims=True)
        ng = np.full((c_rows,), cfg.pad_noise, np.float32)
        ng[:n_s] = noise_s * 10.0
        nrm, ng = jnp.asarray(nrm), jnp.asarray(ng)
        metric = f"experts_joint_fit_query_{n}"

    fit_kw = dict(n_experts=e,
                  n_shared_tail=ts.n_internal + ts.n_external,
                  block=cfg.block, touch_capacity=cfg.touch_capacity,
                  pad_noise=cfg.pad_noise, gate=gate, n_halo=halo)

    def do_fit():
        if joint:
            return ex.fit_experts_joint(cfg.kernel, ts.x, ts.y, nrm,
                                        ts.noise, ng, params, **fit_kw)
        return ex.fit_experts(cfg.kernel, ts.x, ts.y, ts.noise, params,
                              **fit_kw)

    t0 = time.perf_counter()
    m = do_fit()
    jax.block_until_ready(m.alpha)
    fit_s = time.perf_counter() - t0
    print(f"[fit] n={n} E={e} B={m.capacity} fit={fit_s:.1f}s", flush=True)

    fit_warm_s = None
    if os.environ.get("EXPERTS_WARM"):
        # Second fit at the same shapes = cached compiles: the steady
        # (serving/refit) number, vs the cold one-time-compile number above.
        t0 = time.perf_counter()
        m = None  # release the cold fit's stacked factors first: holding
        # them through the refit doubles peak HBM (OOM'd E=8 x B=13312)
        m = do_fit()
        jax.block_until_ready(m.alpha)
        fit_warm_s = round(time.perf_counter() - t0, 2)
        print(f"[fit-warm] {fit_warm_s}s", flush=True)

    coords, axis = grid_mod.make_grid(grid_res, 1.5, dtype=jnp.float32)
    t0 = time.perf_counter()
    mean, var = ex.predict(m, coords)
    jax.block_until_ready((mean, var))
    query_s = time.perf_counter() - t0
    # warm pass (cached compiles) — the serving-loop number
    t0 = time.perf_counter()
    mean, var = ex.predict(m, coords)
    jax.block_until_ready((mean, var))
    query_warm_s = time.perf_counter() - t0

    field = np.asarray(mean).reshape(grid_res, grid_res, grid_res)
    verts, _ = marching.marching_tetrahedra(field, np.asarray(axis))
    r = np.linalg.norm(verts, axis=1)
    rmse = float(np.sqrt(np.mean((r - 1.0) ** 2))) if len(verts) else float("nan")
    ok = bool(np.isfinite(rmse) and rmse < 0.01)
    out = {"metric": metric, "value": round(fit_s + query_s, 2), "unit": "s",
           "n": n, "experts": e, "capacity": int(m.capacity), "gate": gate,
           "halo": halo, "lengthscale": ls, "noise_surface": noise_s,
           "joint": joint,
           "retained_chol": m.chol is not None,
           "fit_s": round(fit_s, 2), "fit_warm_s": fit_warm_s,
           "query_s": round(query_s, 2),
           "query_warm_s": round(query_warm_s, 2), "grid": grid_res,
           "rmse": rmse, "ok": ok,
           "factors_gb": round((2 if m.chol is not None else 1) * e * (m.linv if m.linv is not None else m.chol).shape[-1] ** 2 * 4 / 1e9, 2)}
    from gpis_tpu.utils.provenance import provenance

    out.update(provenance())
    print(json.dumps(out), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
