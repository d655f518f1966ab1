"""Session-level scenario benchmark: the reference's own service loop
(SURVEY.md §4.1/§4.4/§4.5 — start_process / get_next_best_path / update)
timed end-to-end through `ObjectModelSession` on the active backend.

    python bench/session_scenario.py [n_surface=16256] [--normals] [--ooc]

--normals runs the config-2 joint model (surface normals as derivative
observations; the joint system is 4x the point count) at the given size.
--ooc runs the out-of-core model (panel-streamed factor; every variance
query re-streams the spilled part of W, so this measures the streamed
service loop a beyond-HBM session pays).

Emits one JSON line per verb (steady-state where the verb is repeatable)
plus a total.  This is the user-facing wall-clock: everything the CLI and
HTTP service do routes through these calls.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ExploreConfig, ModelConfig
    from gpis_tpu.data import gpis

    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16256
    use_normals = "--normals" in sys.argv
    use_ooc = "--ooc" in sys.argv
    if use_normals and use_ooc:
        raise SystemExit("--normals and --ooc are mutually exclusive")
    print(json.dumps({"backend": jax.default_backend(), "n_surface": n,
                      "normals": use_normals, "ooc": use_ooc}), flush=True)

    cfg = ModelConfig(kernel="rbf", lengthscale=0.4, noise_surface=1e-3,
                      n_external=127, n_internal=1, block=128,
                      touch_capacity=256)
    ecfg = ExploreConfig(max_charts=24, n_disc_samples=16,
                         variance_threshold=0.05)
    center = np.array([0.2, -0.1, 0.05], np.float32)
    pts = gpis.fibonacci_sphere(n, radius=0.35).astype(np.float32) + center
    normals = None
    if use_normals:
        normals = (pts - center) / 0.35

    def timed(label, fn, warm=True):
        if warm:
            fn()  # compile / warm caches
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(json.dumps({"verb": label, "seconds": round(dt, 3)}), flush=True)
        return out, dt

    total = 0.0
    sess = ObjectModelSession(cfg, ecfg)
    # start is not idempotent-cheap to warm; time the second call (the
    # first compiles) on a fresh session each time.
    ObjectModelSession(cfg, ecfg).start(pts, normals=normals,
                                        out_of_core=use_ooc)  # compile round
    t0 = time.perf_counter()
    sess.start(pts, normals=normals, out_of_core=use_ooc)
    t_start = time.perf_counter() - t0
    print(json.dumps({"verb": "start(fit)", "seconds": round(t_start, 3)}),
          flush=True)
    total += t_start

    _, dt = timed("query(4096)", lambda: sess.query(
        np.asarray(pts[:4096], np.float32)))
    total += dt
    res, dt = timed("next_best_path", lambda: sess.next_best_path())
    total += dt
    touch = res.path[-1:]
    for label in ("update(1 touch, compile)", "update(1 touch, steady)"):
        t0 = time.perf_counter()
        sess.update(touch.astype(np.float32) + np.random.default_rng(1).normal(
            scale=1e-3, size=(1, 3)).astype(np.float32))
        dt = time.perf_counter() - t0
        print(json.dumps({"verb": label, "seconds": round(dt, 3)}), flush=True)
    total += dt  # count the steady-state update
    _, dt = timed("extract_surface(48^3)",
                  lambda: sess.extract_surface(resolution=48))
    total += dt
    _, dt = timed("is_done(256 probes)", lambda: sess.is_done())
    total += dt

    print(json.dumps({
        "metric": f"session service loop (fit+query+plan+touch+mesh+done), "
                  f"N={n}",
        "value": round(total, 3), "unit": "s", "ok": True,
    }), flush=True)


if __name__ == "__main__":
    main()
