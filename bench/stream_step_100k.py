"""ONE measured full-data stream-hyperopt step at the judge N (VERDICT r3
item 9): `gp.ooc_hyperopt.ooc_mll_and_grad` — one out-of-core factorization
+ one streamed W gradient pass over ALL rows, no subsampling.  Config 3 at
beyond-HBM scale gets a number instead of a docstring estimate.

    python bench/stream_step_100k.py [n=100000] [panel=2048]

Prints ONE JSON line: {"metric": "stream_hyperopt_step_<n>", "step_s": ...,
"mll": ..., "grads": {...}, "grad_sane": bool, "ok": bool}.  Sanity: the
lengthscale gradient at the (deliberately offset) init must point the same
way a small-subsample exact MLL gradient points.
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
                          "error": f"watchdog after {s:.0f}s"}), flush=True)
        os._exit(3)

    t = threading.Timer(s, fire)
    t.daemon = True
    t.start()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    panel = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    metric = f"stream_hyperopt_step_{n}"
    _watchdog(float(os.environ.get("STREAM_WD", "10800")), metric)

    if os.environ.get("STREAM_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis
    from gpis_tpu.gp import ooc_hyperopt as oho
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.linalg import outofcore as ooc

    cfg = ModelConfig(kernel="rbf", lengthscale=0.5, noise_surface=1e-3,
                      n_external=127, n_internal=1, block=128,
                      touch_capacity=0)
    pts = gpis.fibonacci_sphere(n, radius=1.0).astype(np.float32)
    ts = gpis.build_training_set(pts, cfg)
    x = jnp.asarray(ts.x, jnp.float32)
    y = jnp.asarray(ts.y, jnp.float32)
    noise = jnp.asarray(ts.noise, jnp.float32)
    # Deliberately offset init so the gradient has a known useful direction.
    params = {k: jnp.asarray(v, jnp.float32)
              for k, v in kf.kernel_params(0.8, 1.0).items()}

    ooc.link_stats(reset=True)
    t0 = time.perf_counter()
    mll, grads = oho.ooc_mll_and_grad("rbf", x, y, noise, params,
                                      panel=panel)
    step_s = time.perf_counter() - t0
    link = ooc.link_stats(reset=True)
    grads = {k: float(v) for k, v in grads.items()}
    print(f"[stream] step {step_s:.1f}s mll={float(mll):.2f} "
          f"grads={grads}", flush=True)

    # Direction sanity vs the exact subsample gradient at the same theta
    # (same parameterization: d/d log_ls, d/d log_noise_scale, d/d log_sv).
    import jax

    from gpis_tpu.gp import regression as gpr

    step = max(1, n // 4096)
    xs, ys, ns = x[::step], y[::step], noise[::step]

    def sub_mll(log_ls, log_scale, log_sv):
        p = {"lengthscale": jnp.exp(log_ls),
             "signal_variance": jnp.exp(log_sv)}
        return gpr.log_marginal_likelihood(
            "rbf", xs, ys, ns * jnp.exp(log_scale), p)

    g = jax.grad(sub_mll, argnums=(0, 1, 2))(
        jnp.log(params["lengthscale"]).astype(jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.log(params["signal_variance"]).astype(jnp.float32))
    gs = {"log_ls": float(g[0]), "log_noise_scale": float(g[1]),
          "log_sv": float(g[2])}
    print(f"[stream] subsample grads={gs}", flush=True)
    # Per-row gradient magnitudes scale with row count; compare SIGNS of
    # the dominant components only.
    sane = all(
        np.sign(grads[k]) == np.sign(gs[k])
        for k in grads if abs(gs[k]) > 1.0
    )
    out = {"metric": metric, "n": n, "panel": panel,
           "step_s": round(step_s, 1), "mll": float(mll),
           "grads": grads, "grad_sane": bool(sane), "link": link,
           "ok": bool(np.isfinite(float(mll)) and sane)}
    from gpis_tpu.utils.provenance import provenance

    out.update(provenance())
    print(json.dumps(out), flush=True)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
