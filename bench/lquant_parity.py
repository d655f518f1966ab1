"""Measure the posterior impact of int16-quantized stored L panels
(`l_codec="int16"`) against the exact f32 out-of-core fit and the dense
in-core reference — the measurement VERDICT r3 item 1b asks for before the
N=100k run streams compressed panels.

Worst case is forced: device_budget=0 spills EVERY panel through the
codec, so all factor k-steps, the alpha substitutions, and the TRSM
consume dequantized panels.  (A real tiered run keeps the early, hottest
panels in HBM at f32.)

    JAX_PLATFORMS=cpu python bench/lquant_parity.py [n=8192] [panel=1024]

Prints one JSON line: posterior mean/var deltas (quant-OOC vs f32-OOC and
vs dense), surface RMSE for all three, and the measured quantization error
on the factor panels themselves.
"""

from __future__ import annotations

import json
import sys


def main(n: int = 8192, panel: int = 1024) -> None:
    import os

    import jax

    if not os.environ.get("GPIS_LQ_TPU"):
        # Env vars are snapshotted before scripts run (docs/PERF.md); the
        # CPU pin must go through jax.config.  GPIS_LQ_TPU=1 runs on the
        # real chip instead.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis
    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.linalg import outofcore as ooc
    from gpis_tpu.surface import grid as grid_mod
    from gpis_tpu.surface import marching

    cfg = ModelConfig(kernel="rbf", lengthscale=0.4, noise_surface=1e-3,
                      n_external=127, n_internal=1, block=128,
                      touch_capacity=0)
    pts = gpis.fibonacci_sphere(n, radius=1.0).astype(np.float32)
    ts = gpis.build_training_set(pts, cfg)
    x = jnp.asarray(ts.x, jnp.float32)
    y = jnp.asarray(ts.y, jnp.float32)
    noise = jnp.asarray(ts.noise, jnp.float32)
    params = {k: jnp.asarray(v, jnp.float32) for k, v in
              kf.kernel_params(cfg.lengthscale, cfg.signal_variance).items()}

    coords, axis = grid_mod.make_grid(48, 1.5, dtype=jnp.float32)

    def rmse_of(mean):
        field = np.asarray(mean).reshape(48, 48, 48)
        verts, _ = marching.marching_tetrahedra(field, np.asarray(axis))
        r = np.linalg.norm(verts, axis=1)
        return float(np.sqrt(np.mean((r - 1.0) ** 2))) if len(verts) else float("nan")

    import time

    def run(codec):
        t0 = time.perf_counter()
        m = ooc.ooc_fit("rbf", x, y, noise, params, panel=panel,
                        device_budget=0, l_codec=codec)
        t1 = time.perf_counter()
        mean, var = m.predict(coords)
        jax.block_until_ready((mean, var))
        print(f"[lquant] codec={codec}: fit {t1 - t0:.1f}s query "
              f"{time.perf_counter() - t1:.1f}s "
              f"link={ooc.link_stats(reset=True)}", flush=True)
        return m, np.asarray(mean), np.asarray(var)

    _, mean_f32, var_f32 = run(None)
    _, mean_q, var_q = run("int16")
    print(json.dumps({
        "partial": f"lquant_vs_f32_{n}",
        "dmean_q_vs_f32": float(np.max(np.abs(mean_q - mean_f32))),
        "dvar_q_vs_f32": float(np.max(np.abs(var_q - var_f32))),
        "rmse_f32": rmse_of(mean_f32), "rmse_q": rmse_of(mean_q),
    }), flush=True)

    if n > 8192:
        # The plain dense fit OOMs at 16k on this backend (XLA DUS temps);
        # the f32-OOC posterior is itself dense-anchored by the CPU tests,
        # so the q-vs-f32 deltas above are the measurement.
        return

    # Dense in-core reference at the same dtype/precision budget.
    md = gpr.fit("rbf", x, y, noise, params)
    mean_d, var_d = gpr.predict(md, coords)
    mean_d, var_d = np.asarray(mean_d), np.asarray(var_d)

    # Direct panel-level quantization error on a representative factor row
    # band: round-trip one f32 panel through the codec.
    arr = jnp.asarray(np.random.default_rng(0).normal(
        size=(panel, 4 * panel)).astype(np.float32))
    q, s = ooc._qpack(arr)
    back = ooc._qunpack(q, s, w=arr.shape[1], dtype=jnp.float32)
    panel_err = float(jnp.max(jnp.abs(back - arr)))

    out = {
        "metric": f"lquant_parity_{n}",
        "n": n, "panel": panel,
        "dmean_q_vs_f32": float(np.max(np.abs(mean_q - mean_f32))),
        "dvar_q_vs_f32": float(np.max(np.abs(var_q - var_f32))),
        "dmean_q_vs_dense": float(np.max(np.abs(mean_q - mean_d))),
        "dvar_q_vs_dense": float(np.max(np.abs(var_q - var_d))),
        "dmean_f32_vs_dense": float(np.max(np.abs(mean_f32 - mean_d))),
        "dvar_f32_vs_dense": float(np.max(np.abs(var_f32 - var_d))),
        "rmse_dense": rmse_of(mean_d),
        "rmse_f32": rmse_of(mean_f32),
        "rmse_q": rmse_of(mean_q),
        "panel_roundtrip_maxerr": panel_err,
    }
    out["ok"] = bool(out["dmean_q_vs_f32"] < 5e-4
                     and out["dvar_q_vs_f32"] < 5e-4
                     and abs(out["rmse_q"] - out["rmse_f32"]) < 2e-4)
    print(json.dumps(out))


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    panel = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    main(n, panel)
