"""ONE measured full-data stream-hyperopt step at the judge N — PROCESS
SPLIT (VERDICT r4 missing #2 / next-round item 2): the single-process step
at N=100,128 was OOM-killed at 130.7 GB host RSS because the axon client
retains ~1:1 host copies of every h2d byte and the factor + TRSM +
gradient W-pass all ran in one interpreter.  This driver mirrors
bench/ooc_staged.py: factor in one subprocess (ooc_factor_phase,
defer_alpha), TRSM + exact gradients in a fresh one
(gp.ooc_hyperopt.ooc_mll_and_grad_solve_phase — the gradient pass rides
the TRSM's on_panel hook, no separate W re-stream).

    python bench/stream_step_100k.py [n=100000] [panel=2048]   # split run
    python bench/stream_step_100k.py single [n] [panel]        # old 1-proc
    python bench/stream_step_100k.py phase1|phase2 n panel dir # internals

Prints ONE JSON line: {"metric": "stream_hyperopt_step_<n>", "step_s": ...,
"mll": ..., "grads": {...}, "grad_sane": bool, "ok": bool}.  Sanity: the
lengthscale gradient at the (deliberately offset) init must point the same
way a small-subsample exact MLL gradient points.
"""

from __future__ import annotations

import json
import os
import subprocess
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


def _maybe_cpu() -> None:
    if os.environ.get("STREAM_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # Persistent compile cache for the phase subprocesses (see
        # bench/ooc_staged.py main — same rationale).
        from gpis_tpu.utils.compile_cache import enable

        enable()


def _problem(n: int):
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis

    cfg = ModelConfig(kernel="rbf", lengthscale=0.5, noise_surface=1e-3,
                      n_external=127, n_internal=1, block=128,
                      touch_capacity=0)
    pts = gpis.fibonacci_sphere(n, radius=1.0).astype(np.float32)
    ts = gpis.build_training_set(pts, cfg)
    x = jnp.asarray(ts.x, jnp.float32)
    y = jnp.asarray(ts.y, jnp.float32)
    noise = jnp.asarray(ts.noise, jnp.float32)
    # Deliberately offset init so the gradient has a known useful direction.
    from gpis_tpu.kernels import functions as kf

    params = {k: jnp.asarray(v, jnp.float32)
              for k, v in kf.kernel_params(0.8, 1.0).items()}
    return x, y, noise, params


def _l_codec() -> str | None:
    v = os.environ.get("OOC_LQUANT", "int16").lower()
    return None if v in ("", "0", "false", "off", "none") else v


def phase1(n: int, panel: int, spill_dir: str) -> None:
    _maybe_cpu()
    from gpis_tpu.linalg import outofcore as ooc

    x, y, noise, params = _problem(n)
    c = ((x.shape[0] + panel - 1) // panel) * panel
    plan = ooc.plan_sweeps(c, panel, 4,
                           l_itemsize=2 if _l_codec() else None)
    sweep = int(os.environ.get("OOC_SWEEP", plan["factor_sweep"]))
    print(f"[phase1] n={n} panel={panel} sweep={sweep} "
          f"budget={plan['factor_budget']/1e9:.1f}GB "
          f"l_codec={_l_codec()}", flush=True)
    ooc.link_stats(reset=True)
    t0 = time.perf_counter()
    ooc.ooc_factor_phase("rbf", x, y, noise, params, panel=panel,
                         spill_dir=spill_dir, sweep=sweep,
                         device_budget=plan["factor_budget"],
                         l_codec=_l_codec(), defer_alpha=True)
    dt = time.perf_counter() - t0
    link = ooc.link_stats(reset=True)
    with open(os.path.join(spill_dir, "step_phase1.json"), "w") as f:
        json.dump({"n": n, "panel": panel, "factor_s": dt, "sweep": sweep,
                   "l_codec": _l_codec(), "link": link}, f)
    print(f"[phase1] factor {dt:.1f}s", flush=True)


def phase2(n: int, panel: int, spill_dir: str) -> None:
    _maybe_cpu()
    import numpy as np

    from gpis_tpu.gp import ooc_hyperopt as oho
    from gpis_tpu.linalg import outofcore as ooc

    x, y, noise, params = _problem(n)
    c = ((x.shape[0] + panel - 1) // panel) * panel
    plan = ooc.plan_sweeps(c, panel, 4, w_itemsize=2,
                           l_itemsize=2 if _l_codec() else None)
    tsw = int(os.environ.get("OOC_TRSM_SWEEP", plan["trsm_sweep"]))
    print(f"[phase2] trsm_sweep={tsw} budget={plan['trsm_budget']/1e9:.1f}GB",
          flush=True)
    import jax.numpy as jnp

    ooc.link_stats(reset=True)
    t0 = time.perf_counter()
    mll, grads = oho.ooc_mll_and_grad_solve_phase(
        spill_dir, noise_base=noise, trsm_sweep=tsw,
        device_budget=plan["trsm_budget"], w_dtype=jnp.float16)
    dt = time.perf_counter() - t0
    link = ooc.link_stats(reset=True)
    grads = {k: float(v) for k, v in grads.items()}
    print(f"[phase2] grad pass {dt:.1f}s mll={float(mll):.2f} "
          f"grads={grads}", flush=True)

    # Direction sanity vs the exact subsample gradient at the same theta.
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
    print(f"[phase2] subsample grads={gs}", flush=True)
    sane = all(
        np.sign(grads[k]) == np.sign(gs[k])
        for k in grads if abs(gs[k]) > 1.0
    )
    with open(os.path.join(spill_dir, "step_phase2.json"), "w") as f:
        json.dump({"grad_s": dt, "mll": float(mll), "grads": grads,
                   "sub_grads": gs, "grad_sane": bool(sane),
                   "link": link}, f)


def run_split(n: int, panel: int, spill_dir: str) -> int:
    metric = f"stream_hyperopt_step_{n}"
    os.makedirs(spill_dir, exist_ok=True)
    me = os.path.abspath(__file__)
    wd = os.environ.get("STREAM_WD", "10800")
    t0 = time.perf_counter()
    for ph in ("phase1", "phase2"):
        r = subprocess.run([sys.executable, me, ph, str(n), str(panel),
                            spill_dir], timeout=float(wd) + 120)
        if r.returncode != 0:
            print(json.dumps({"metric": metric, "ok": False,
                              "error": f"{ph} rc={r.returncode}"}))
            return 1
    total = time.perf_counter() - t0
    with open(os.path.join(spill_dir, "step_phase1.json")) as f:
        p1 = json.load(f)
    with open(os.path.join(spill_dir, "step_phase2.json")) as f:
        p2 = json.load(f)
    out = {"metric": metric, "n": n, "panel": panel,
           "step_s": round(total, 1),
           "factor_s": round(p1["factor_s"], 1),
           "grad_s": round(p2["grad_s"], 1),
           "process_split": True, "l_codec": p1.get("l_codec"),
           "mll": p2["mll"], "grads": p2["grads"],
           "grad_sane": p2["grad_sane"],
           "link": {"phase1": p1.get("link"), "phase2": p2.get("link")},
           "ok": bool(p2["grad_sane"])}
    from gpis_tpu.utils.provenance import provenance

    out.update(provenance())
    print(json.dumps(out), flush=True)
    return 0 if out["ok"] else 1


def run_single(n: int, panel: int) -> int:
    """The pre-r5 single-process step (kept for <=49k-class N and CPU CI)."""
    metric = f"stream_hyperopt_step_{n}"
    _watchdog(float(os.environ.get("STREAM_WD", "10800")), metric)
    _maybe_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.gp import ooc_hyperopt as oho
    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.linalg import outofcore as ooc

    x, y, noise, params = _problem(n)
    ooc.link_stats(reset=True)
    t0 = time.perf_counter()
    mll, grads = oho.ooc_mll_and_grad("rbf", x, y, noise, params,
                                      panel=panel)
    step_s = time.perf_counter() - t0
    link = ooc.link_stats(reset=True)
    grads = {k: float(v) for k, v in grads.items()}
    print(f"[stream] step {step_s:.1f}s mll={float(mll):.2f} "
          f"grads={grads}", flush=True)

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
    sane = all(
        np.sign(grads[k]) == np.sign(gs[k])
        for k in grads if abs(gs[k]) > 1.0
    )
    out = {"metric": metric, "n": n, "panel": panel,
           "step_s": round(step_s, 1), "mll": float(mll),
           "grads": grads, "grad_sane": bool(sane), "link": link,
           "process_split": False,
           "ok": bool(np.isfinite(float(mll)) and sane)}
    from gpis_tpu.utils.provenance import provenance

    out.update(provenance())
    print(json.dumps(out), flush=True)
    return 0 if out["ok"] else 1


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] in ("phase1", "phase2"):
        metric = f"stream_step_{argv[0]}"
        _watchdog(float(os.environ.get("STREAM_WD", "10800")), metric)
        n, panel, sd = int(argv[1]), int(argv[2]), argv[3]
        (phase1 if argv[0] == "phase1" else phase2)(n, panel, sd)
        return 0
    if argv and argv[0] == "single":
        n = int(argv[1]) if len(argv) > 1 else 100_000
        panel = int(argv[2]) if len(argv) > 2 else 2048
        return run_single(n, panel)
    n = int(argv[0]) if argv else 100_000
    panel = int(argv[1]) if len(argv) > 1 else 2048
    sd = argv[2] if len(argv) > 2 else "/tmp/stream_step"
    return run_split(n, panel, sd)


if __name__ == "__main__":
    raise SystemExit(main())
