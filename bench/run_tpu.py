"""Per-stage TPU benchmark matrix (SURVEY.md §6 metrics; feeds BASELINE.md).

Measures, on the real chip, each stage of the flagship pipeline at a given
N with each available implementation, emitting JSON lines per measurement:

    python bench/run_tpu.py [N=16384] [--quick] [--stages gram,chol,linv,query]
    python bench/run_tpu.py 16384 --stages sharded1   # mesh-of-1 config-5 path

Stages x variants:
  gram      : pallas | jnp-reference (small N only)
  cholesky  : pallas(256) | blocked(512) | xla (small N only: OOM)
  linv      : pallas(256) | blocked-trsm(512)
  query 8k  : linv-GEMM at DEFAULT | HIGHEST | bf16x3; fused pallas; solve
  sharded1  : the distributed pipeline (band gram / pallas-panel cholesky /
              band TRSM both variants / ring query) on a mesh of one chip

All timed callables take their operands as ARGUMENTS of a jitted function —
never as closure captures, which jit would embed as constants and XLA would
then constant-fold on the host (a 4.4-TFLOP GEMM folded single-threaded:
the r2 bench stall).

Timing forces real execution by pulling one output element to the host
(block_until_ready alone under-reports on the axon backend).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def sync(r):
    import jax

    for x in jax.tree_util.tree_leaves(r):
        if hasattr(x, "ravel"):
            np.asarray(x.ravel()[0:1])


def timeit(fn, *args, reps=3):
    r = fn(*args)
    sync(r)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / reps


def emit(stage, variant, seconds, **extra):
    print(json.dumps({"stage": stage, "variant": variant,
                      "seconds": round(seconds, 4), **extra}), flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.kernels import gram as kg
    from gpis_tpu.kernels import pallas_gram as pg
    from gpis_tpu.linalg import cholesky as lin
    from gpis_tpu.linalg.matmul import matmul_bf16x3
    from gpis_tpu.linalg.pallas_chol import (
        pallas_blocked_cholesky,
        pallas_blocked_linv,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16384
    quick = "--quick" in sys.argv
    stages = {"gram", "chol", "linv", "query"}  # add "sharded1" explicitly
    for i, a in enumerate(sys.argv):
        if a == "--stages" and i + 1 < len(sys.argv):
            stages = set(sys.argv[i + 1].split(","))
    reps = 1 if quick else 3
    rng = np.random.default_rng(0)
    dt = jnp.float32

    x = jnp.asarray(rng.normal(size=(n, 3)), dt)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    noise = jnp.full((n,), 1e-3, dt)
    params = {k: v.astype(dt) for k, v in kf.kernel_params(0.4, 1.0).items()}
    print(json.dumps({"backend": jax.default_backend(), "n": n}), flush=True)
    on_tpu = jax.default_backend() == "tpu"

    # --- gram ---
    if "gram" in stages:
        t = timeit(pg.gram_pallas, "rbf", x, params, noise, reps=reps)
        emit("gram", "pallas", t, gb_s=round(n * n * 4 / t / 1e9, 1))
        if n <= 8192:
            jfn = jax.jit(lambda xx, nz: kg.gram_reference("rbf", xx, params, noise=nz))
            t = timeit(jfn, x, noise, reps=reps)
            emit("gram", "jnp", t, gb_s=round(n * n * 4 / t / 1e9, 1))

    g = pg.gram_pallas("rbf", x, params, noise)

    # --- cholesky ---
    flops = n**3 / 3
    if "chol" in stages:
        for ps in ("inv", "xla"):
            t = timeit(functools.partial(pallas_blocked_cholesky,
                                         panel_solve=ps), g, 256, reps=reps)
            emit("cholesky", f"pallas256-{ps}", t,
                 tflops=round(flops / t / 1e12, 2))
        if n <= 16384:
            t = timeit(functools.partial(lin.blocked_cholesky, block=512), g,
                       reps=1)
            emit("cholesky", "blocked512", t, tflops=round(flops / t / 1e12, 2))
        if n < 8192:
            t = timeit(jnp.linalg.cholesky, g, reps=reps)
            emit("cholesky", "xla", t, tflops=round(flops / t / 1e12, 2))

    l = pallas_blocked_cholesky(g, 256)

    # --- linv ---
    if "linv" in stages:
        for ps in ("inv", "xla"):
            t = timeit(functools.partial(pallas_blocked_linv,
                                         panel_solve=ps), l, 256, reps=reps)
            emit("linv", f"pallas256-{ps}", t,
                 tflops=round(n**3 / 2 / t / 1e12, 2))
        if n <= 16384:
            t = timeit(functools.partial(lin.blocked_linv, block=512), l, reps=1)
            emit("linv", "blocked512", t, tflops=round(n**3 / 2 / t / 1e12, 2))
    w = pallas_blocked_linv(l, 256)

    # --- query variants (8192 queries) ---
    if "query" in stages:
        q = jnp.asarray(rng.normal(size=(8192, 3)), dt)
        kq = pg.cross_cov_pallas("rbf", q, x, params)
        qflops = 2 * 8192 * n * n

        for label, prec in [("default", lax.Precision.DEFAULT),
                            ("highest", lax.Precision.HIGHEST)]:
            fn = jax.jit(functools.partial(
                lambda ww, kk, p: jnp.dot(ww, kk.T, precision=p), p=prec))
            t = timeit(fn, w, kq, reps=reps)
            emit("query_gemm", f"linv-{label}", t,
                 tflops=round(qflops / t / 1e12, 2))
        if on_tpu:  # CPU emulates bf16 at glacial speed
            fn = jax.jit(lambda ww, kk: matmul_bf16x3(ww, kk.T))
            t = timeit(fn, w, kq, reps=reps)
            emit("query_gemm", "linv-bf16x3", t,
                 tflops=round(3 * qflops / t / 1e12, 2))

        # fused streaming kernel (assembly + mean + quad in one pass)
        from gpis_tpu.kernels.pallas_query import fused_query_pallas

        alpha = jnp.zeros((n,), dt)
        for staged in (False, True):
            t = timeit(functools.partial(fused_query_pallas, "rbf",
                                         staged=staged),
                       q, x, params, alpha, w, reps=reps)
            emit("query_fused", "pallas-staged" if staged else "pallas", t,
                 tflops=round(qflops / t / 1e12, 2))

        # solve-path variance for reference (small N only: XLA's
        # triangular-solve expansion keeps ~2N^2 f32 temps live and OOMs a
        # 16 GB chip at n=16k with 8k RHS)
        if n < 8192:
            fn = jax.jit(lambda ll, kk: lax.linalg.triangular_solve(
                ll, kk.T, left_side=True, lower=True))
            t = timeit(fn, l, kq, reps=1)
            emit("query_var", "triangular-solve", t,
                 tflops=round(qflops / 2 / t / 1e12, 2))

    # --- mesh-of-1 distributed pipeline on the real chip: the per-stage
    # cost structure of the config-5 path (v5e-8 target) minus the ICI ---
    if "sharded1" in stages:
        from gpis_tpu.linalg import sharded as shl
        from gpis_tpu.parallel import mesh as pm

        mesh = pm.make_row_mesh(1)
        t = timeit(lambda: shl.sharded_gram("rbf", x, params, noise, mesh),
                   reps=reps)
        emit("sharded1_gram", "shard_map", t, gb_s=round(n * n * 4 / t / 1e9, 1))
        a_sh = shl.sharded_gram("rbf", x, params, noise, mesh)
        t = timeit(lambda: shl.sharded_cholesky(a_sh, mesh, block=256,
                                                use_pallas=True), reps=reps)
        emit("sharded1_chol", "pallas-panels", t,
             tflops=round(n**3 / 3 / t / 1e12, 2))
        l_sh = shl.sharded_cholesky(a_sh, mesh, block=256, use_pallas=True)
        t = timeit(lambda: shl.sharded_linv(l_sh, mesh, block=256), reps=1)
        emit("sharded1_linv", "masked-gemm", t,
             tflops=round(n**3 / 2 / t / 1e12, 2))
        t = timeit(lambda: shl.sharded_linv(l_sh, mesh, block=256,
                                            use_pallas=True), reps=1)
        emit("sharded1_linv", "pallas-trail", t,
             tflops=round(n**3 / 2 / t / 1e12, 2))
        t = timeit(lambda: shl.sharded_linv_ll(l_sh, mesh, block=256), reps=1)
        emit("sharded1_linv", "left-looking", t,
             tflops=round(n**3 / 2 / t / 1e12, 2))
        w_sh = shl.sharded_linv(l_sh, mesh, block=256)
        alpha_sh = shl.sharded_alpha_from_linv(w_sh, jnp.zeros((n,), dt), mesh)
        q1 = jnp.asarray(rng.normal(size=(8192, 3)), dt)
        t = timeit(lambda: shl.sharded_predict_linv(
            "rbf", q1, x, params, alpha_sh, w_sh, mesh), reps=1)
        emit("sharded1_predict", "ring", t,
             tflops=round(2 * 8192 * n * n / t / 1e12, 2))


if __name__ == "__main__":
    main()
