"""Sweep the fused-query kernel's tile sizes on hardware.

The tile constants are read from env at import (kernels/pallas_query.py),
so each configuration runs in a fresh subprocess.  Usage:

    python bench/query_tile_sweep.py [N] [--tiles I1,I2,...]

Child mode (internal): QSWEEP_CHILD=1 runs one timing and prints a JSON
line.  Each child fits once (Pallas in-place path) and times the 64^3-grid
query twice (compile excluded), like bench.py's steady-state round.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def child(n_surface: int) -> None:
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    if os.environ.get("QSWEEP_CPU"):
        # Harness smoke while another client owns the TPU: env JAX_PLATFORMS
        # is snapshotted before scripts run (docs/PERF.md), so pin via
        # jax.config.  NEVER point a second client at the tunnel.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis
    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.gp.model import GPModel, round_up
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.kernels import gram as kg_mod
    from gpis_tpu.linalg import cholesky as lin_mod
    from gpis_tpu.surface import grid as grid_mod

    # Liveness watchdog: a wedged tunnel must report, not hang.
    import threading

    def fire():
        time.sleep(600)
        print(json.dumps({"ok": False, "error": "watchdog"}), flush=True)
        os._exit(2)

    threading.Thread(target=fire, daemon=True).start()

    dtype = jnp.float32
    cfg = ModelConfig(kernel="rbf", lengthscale=0.4, noise_surface=1e-3,
                      n_external=127, n_internal=1, block=128,
                      touch_capacity=0)
    pts = gpis.fibonacci_sphere(n_surface, radius=1.0).astype(np.float32)
    ts = gpis.build_training_set(pts, cfg)
    params = {k: v.astype(dtype) for k, v in
              kf.kernel_params(cfg.lengthscale, cfg.signal_variance).items()}
    c = round_up(ts.x.shape[0], cfg.block)
    xp = jnp.pad(jnp.asarray(ts.x, dtype), ((0, c - ts.x.shape[0]), (0, 0)))
    yp = jnp.pad(jnp.asarray(ts.y, dtype), (0, c - ts.y.shape[0]))
    nz = jnp.pad(jnp.asarray(ts.noise, dtype), (0, c - ts.noise.shape[0]),
                 constant_values=1e10)

    k = jax.jit(lambda x, n_: kg_mod.gram("rbf", x, params, noise=n_))(xp, nz)
    l = jax.jit(lin_mod.cholesky, donate_argnums=(0,))(k)
    from gpis_tpu.linalg.pallas_chol import pallas_blocked_linv

    w = jax.jit(lambda a: pallas_blocked_linv(a, 256, inplace=True),
                donate_argnums=(0,))(l)
    alpha = jax.jit(lambda w_, y: jnp.dot(
        w_.T, jnp.dot(w_, y, precision=jax.lax.Precision.HIGHEST),
        precision=jax.lax.Precision.HIGHEST))(w, yp)
    model = GPModel(x=xp, y=yp, noise=nz, params=params, chol=w, alpha=alpha,
                    n_touch=jnp.zeros((), jnp.int32), kernel="rbf", n0=c,
                    pad_noise=1e10, linv=w)

    coords, _ = grid_mod.make_grid(64, 1.5, dtype=dtype)
    chunk = 8192
    qchunks = coords.reshape(coords.shape[0] // chunk, chunk, 3)
    query_fn = jax.jit(lambda m, q: gpr.predict(m, q))

    def run():
        outs = [query_fn(model, qchunks[i]) for i in range(qchunks.shape[0])]
        jax.block_until_ready(outs[-1])

    run()  # compile
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "ok": True, "n": int(c), "ti": os.environ.get("GPIS_QTILE_I"),
        "tq": os.environ.get("GPIS_QTILE_Q"),
        "tc": os.environ.get("GPIS_QTILE_C"),
        "query_s": round(min(times), 3),
    }), flush=True)


def main() -> int:
    if os.environ.get("QSWEEP_CHILD"):
        child(int(sys.argv[1]) if len(sys.argv) > 1 else 16256)
        return 0
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 16256
    tiles = "256,512,1024"
    for a in sys.argv[1:]:
        if a.startswith("--tiles="):
            tiles = a.split("=", 1)[1]
    results = []
    for ti in tiles.split(","):
        env = dict(os.environ, QSWEEP_CHILD="1", GPIS_QTILE_I=ti)
        r = subprocess.run([sys.executable, os.path.abspath(__file__), str(n)],
                           env=env, capture_output=True, text=True,
                           timeout=900)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        print(f"TI={ti}: {line}", flush=True)
        try:
            results.append(json.loads(line))
        except json.JSONDecodeError:
            results.append({"ok": False, "ti": ti, "error": r.stderr[-200:]})
        time.sleep(5)  # let the tunnel settle between clients
    ok = [r for r in results if r.get("ok")]
    if ok:
        best = min(ok, key=lambda r: r["query_s"])
        print(json.dumps({"best_ti": best["ti"], "query_s": best["query_s"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
