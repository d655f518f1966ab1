"""On-hardware sweep: fused query tile geometry vs capacity alignment.

Two questions the round-3 value-kernel sweep (TI=1024 beats 256 by 1.35x
at C=16384) left open:

1. Does the taller-TI win carry to the JOINT fused query kernel
   (kernels/pallas_joint.py), whose in-VMEM kq blend is ~2x the VPU work
   per element (dk chain + direction dot)?  Swept at J = 20480
   (C=5120, T=0 — divisible by every candidate TI).
2. Both kernels clamp TI down to a divisor of the capacity, so a session
   capacity like C=16640 (multiple of 128/256 only) silently degrades to
   TI=256.  Is padding the capacity up to the next 1024 multiple (more
   rows, but the fast tile) a net win?  Measured: value kernel at
   C=16640 (TI clamps to 256) vs C=17408 (+4.6% rows, TI=1024).

HARNESS RULE (learned the hard way, 2026-08-18): every large operand must
be COMPUTED ON DEVICE.  The axon remote client defers executions whose
operands were uploaded from host (block_until_ready returns immediately;
the upload+execute replays on each d2h), so a host-built W both breaks
block-based timing AND pays a ~1 GB re-upload per call — measured 94.8 s
for one fused query against a host `np.tril` W vs ~50 ms against the same
W produced by the on-device fit pipeline.  Models here are therefore fit
on device, exactly like the production session path.

Each case times 13 distinct 8192-point query chunks (compile excluded,
one d2h force at the end) and prints one JSON line.  Subprocesses per TI
(module-level tile constants), like query_tile_sweep.

Usage: python bench/joint_query_tile_sweep.py            # both questions
       QSWEEP_CPU=1 ... (harness smoke on CPU, tiny sizes)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = """
import json, os, sys, time, threading
sys.path.insert(0, %(repo)r)

def fire():
    time.sleep(1500)
    print(json.dumps({"ok": False, "error": "watchdog"}), flush=True)
    os._exit(2)
threading.Thread(target=fire, daemon=True).start()

import jax
import numpy as np
if os.environ.get("QSWEEP_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gpis_tpu.data import gpis
from gpis_tpu.kernels import functions as kf

mode = %(mode)r
n_surface = %(n_surface)d
m_chunk = 8192
n_chunks = %(n_chunks)d
rng = np.random.default_rng(0)
pts = gpis.fibonacci_sphere(n_surface, radius=1.0).astype(np.float32)
qs = jnp.asarray(rng.normal(size=(n_chunks, m_chunk, 3))
                 .astype(np.float32) * 0.8)
params = {k: v.astype(jnp.float32)
          for k, v in kf.kernel_params(0.4, 1.0).items()}

if mode == "joint":
    from gpis_tpu.gp import derivative as gpd
    normals = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    model = gpd.fit_with_normals(
        "rbf", jnp.asarray(pts), jnp.zeros((n_surface,), jnp.float32),
        jnp.asarray(normals), 1e-3, 1e-2, params, block=64,
        touch_capacity=0)
    model = gpd.with_linv_joint(model)
    rows = model.chol.shape[0]
    def run(q):
        return gpd.predict(model, q)
else:
    from gpis_tpu.gp import regression as gpr
    if not %(align)d:
        # Control case: defeat align_capacity so the capacity stays on the
        # raw block multiple (e.g. 16640) and TI clamps down inside the
        # kernel — the exact pre-alignment behavior being measured.
        gpr.align_capacity = lambda t, **k: t
    model = gpr.fit("rbf", jnp.asarray(pts),
                    jnp.zeros((n_surface,), jnp.float32), 1e-3, params,
                    block=128, touch_capacity=%(touch)d)
    model = gpr.with_linv(model)
    rows = model.capacity
    def run(q):
        return gpr.predict(model, q)

jax.block_until_ready(run(qs[0]))  # compile
t0 = time.perf_counter()
outs = [run(qs[i]) for i in range(n_chunks)]
jax.block_until_ready(outs)
_ = np.asarray(outs[-1][1])  # d2h force (axon defers host-operand graphs)
dt = time.perf_counter() - t0
tflop = 2 * m_chunk * n_chunks * rows * (rows / 2 + 1) / 1e12
print(json.dumps({"ok": True, "mode": mode, "rows": int(rows),
                  "ti": os.environ.get("GPIS_QTILE_I", "default"),
                  "chunks": n_chunks, "seconds": round(dt, 3),
                  "eff_tflops": round(tflop / dt, 1)}), flush=True)
"""


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    smoke = bool(os.environ.get("QSWEEP_CPU"))
    n_chunks = 1 if smoke else 13
    # joint: n=5118 -> C=5120 (block 64), J=20480 — divisible by all TIs.
    jn = 250 if smoke else 5118
    cases = [("joint", jn, 0, ti, 1) for ti in ("256", "512", "1024")]
    if not smoke:
        # value: C = round_up(n,128) + touch, 16384+256=16640 without
        # alignment (TI clamps to 256) vs align_capacity's 17408 (+4.6%%
        # rows, TI=1024 kept).
        cases += [("value", 16384, 256, "1024", 0),
                  ("value", 16384, 256, "1024", 1)]
    results = []
    for mode, n, touch, ti, align in cases:
        env = dict(os.environ, GPIS_QTILE_I=ti)
        body = _CHILD % {"repo": repo, "mode": mode, "n_surface": n,
                         "touch": touch, "n_chunks": n_chunks,
                         "align": align}
        r = subprocess.run([sys.executable, "-c", body], env=env,
                           capture_output=True, text=True, timeout=1800)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        print(f"{mode} n={n} touch={touch} TI={ti} align={align}: {line}",
              flush=True)
        if r.returncode != 0 and not line.startswith("{"):
            print(r.stderr[-2000:], file=sys.stderr)
        try:
            results.append(json.loads(line))
        except json.JSONDecodeError:
            results.append({"ok": False, "mode": mode, "ti": ti})
    print(json.dumps({"cases": results}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
