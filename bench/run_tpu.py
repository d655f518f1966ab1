"""Per-stage TPU benchmark matrix (SURVEY.md §6 metrics; feeds BASELINE.md).

Measures, on the real chip, each stage of the flagship pipeline at a given
N with each available implementation, emitting JSON lines per measurement:

    python bench/run_tpu.py [N=16384] [--quick]

Stages x variants:
  gram      : pallas | jnp-reference
  cholesky  : blocked(512) | pallas-blocked(256) | xla (skipped for N>=8k: OOM)
  linv      : blocked-trsm(512)
  query 8k  : solve | kinv-GEMM | linv-GEMM, each at DEFAULT | HIGHEST | bf16x3

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


def timeit(fn, reps=3):
    r = fn()
    sync(r)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / reps


def emit(stage, variant, seconds, **extra):
    print(json.dumps({"stage": stage, "variant": variant,
                      "seconds": round(seconds, 4), **extra}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.kernels import gram as kg
    from gpis_tpu.kernels import pallas_gram as pg
    from gpis_tpu.linalg import cholesky as lin
    from gpis_tpu.linalg.matmul import matmul_bf16x3
    from gpis_tpu.linalg.pallas_chol import pallas_blocked_cholesky

    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16384
    quick = "--quick" in sys.argv
    reps = 1 if quick else 3
    rng = np.random.default_rng(0)
    dt = jnp.float32

    x = jnp.asarray(rng.normal(size=(n, 3)), dt)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    noise = jnp.full((n,), 1e-3, dt)
    params = {k: v.astype(dt) for k, v in kf.kernel_params(0.4, 1.0).items()}
    print(json.dumps({"backend": jax.default_backend(), "n": n}), flush=True)

    # --- gram ---
    t = timeit(lambda: pg.gram_pallas("rbf", x, params, noise), reps)
    emit("gram", "pallas", t, gb_s=round(n * n * 4 / t / 1e9, 1))
    if n <= 8192:
        jfn = jax.jit(lambda: kg.gram_reference("rbf", x, params, noise=noise))
        t = timeit(jfn, reps)
        emit("gram", "jnp", t, gb_s=round(n * n * 4 / t / 1e9, 1))

    g = pg.gram_pallas("rbf", x, params, noise)

    # --- cholesky ---
    flops = n**3 / 3
    t = timeit(lambda: lin.blocked_cholesky(g, 512), reps)
    emit("cholesky", "blocked512", t, tflops=round(flops / t / 1e12, 2))
    t = timeit(lambda: pallas_blocked_cholesky(g, 256), reps)
    emit("cholesky", "pallas256", t, tflops=round(flops / t / 1e12, 2))
    if jax.default_backend() == "tpu":
        t = timeit(lambda: lin.blocked_cholesky(g, 512, precision="bf16x3"), reps)
        emit("cholesky", "blocked512-bf16x3", t, tflops=round(flops / t / 1e12, 2))
    if n < 8192:
        t = timeit(lambda: jnp.linalg.cholesky(g), reps)
        emit("cholesky", "xla", t, tflops=round(flops / t / 1e12, 2))

    l = lin.blocked_cholesky(g, 512)

    # --- linv ---
    t = timeit(lambda: lin.blocked_linv(l, 512), reps)
    emit("linv", "blocked512", t, tflops=round(n**3 / 2 / t / 1e12, 2))
    w = lin.blocked_linv(l, 512)

    # --- query variants (8192 queries) ---
    q = jnp.asarray(rng.normal(size=(8192, 3)), dt)
    kq = pg.cross_cov_pallas("rbf", q, x, params)
    qflops = 2 * 8192 * n * n

    for label, prec in [("default", lax.Precision.DEFAULT),
                        ("highest", lax.Precision.HIGHEST)]:
        fn = jax.jit(lambda kq=kq, p=prec: jnp.dot(w, kq.T, precision=p))
        t = timeit(fn, reps)
        emit("query_gemm", f"linv-{label}", t, tflops=round(qflops / t / 1e12, 2))
    if jax.default_backend() == "tpu":  # CPU emulates bf16 at glacial speed
        fn = jax.jit(lambda: matmul_bf16x3(w, kq.T))
        t = timeit(fn, reps)
        emit("query_gemm", "linv-bf16x3", t, tflops=round(3 * qflops / t / 1e12, 2))

    # fused streaming kernel (assembly + mean + quad in one pass)
    from gpis_tpu.kernels.pallas_query import fused_query_pallas

    alpha = jnp.zeros((n,), dt)
    fn = jax.jit(lambda: fused_query_pallas("rbf", q, x, params, alpha, w))
    t = timeit(fn, reps)
    emit("query_fused", "pallas", t, tflops=round(qflops / t / 1e12, 2))

    # solve-path variance for reference (small rep count: can be slow)
    fn = jax.jit(lambda: lax.linalg.triangular_solve(l, kq.T, left_side=True, lower=True))
    t = timeit(fn, 1)
    emit("query_var", "triangular-solve", t, tflops=round(qflops / 2 / t / 1e12, 2))


if __name__ == "__main__":
    main()
