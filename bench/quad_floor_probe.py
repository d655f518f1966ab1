"""Measure the committee variance floor law (VERDICT r4 item 4): the
post-Newton fused-query quad error vs per-expert capacity B, so
`gp.experts._FLOOR_SCALE` is SET FROM A MEASUREMENT instead of the B=1280
point extrapolated.  The floor formula clamps expert variances at
`k0 * eps * max(16, scale * B)`; if the true quad error grows slower than
B, the formula over-clamps at 100k-class capacities and becomes the
committee's accuracy ceiling (r4 measured RMSE tracking the floor ~1:1).

For each B: fit ONE expert-shaped problem (a spherical-cap patch of a unit
sphere GPIS labeling — what a 100k-committee expert actually sees), run
the committee's exact W pipeline (Pallas cholesky -> Pallas TRSM -> one
Newton step), then compare the FUSED QUERY kernel's quad (the bf16x3 path
the floor guards) against the exact triangular-solve quad on the same
factor (docs/PERF.md rule 7: substitution is exact to ~7e-7).

    python bench/quad_floor_probe.py [B ...]   # default 1280 3328 7168 13312

One JSON line per B: {"B": ..., "err_max": ..., "err_p99": ...,
"floor_old": ..., "implied_scale": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe(b: int) -> dict:
    import jax

    if os.environ.get("FLOOR_CPU"):
        # Harness smoke while another client owns the tunnel; interpret-mode
        # kernels are exact there, so err_* reflect only GEMM rounding.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.kernels import gram as kg
    from gpis_tpu.kernels.pallas_query import fused_query_pallas
    from gpis_tpu.linalg import cholesky as lin
    from gpis_tpu.linalg.pallas_chol import pallas_blocked_linv

    dt = jnp.float32
    rng = np.random.default_rng(1000 + b)
    # Expert patch: points in a spherical cap covering ~1/14 of the sphere
    # (E=14-ish at N=100k), plus GPIS anchor rows (internal -1, external
    # +1 ring) like fit_experts shares into every expert.
    n_pts = b - 128
    z = rng.uniform(0.85, 1.0, size=n_pts)
    phi = rng.uniform(0, 2 * np.pi, size=n_pts)
    r = np.sqrt(1 - z * z)
    pts = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)
    anchors = rng.normal(size=(128, 3))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    x = np.concatenate([pts, 0.0 * anchors[:1], 2.0 * anchors[1:]])
    y = np.concatenate([np.zeros(n_pts), [-1.0], np.ones(127)])
    noise = np.full(b, 1e-3)
    x = jnp.asarray(x, dt)
    y = jnp.asarray(y, dt)
    noise = jnp.asarray(noise, dt)
    params = {k: v.astype(dt) for k, v in kf.kernel_params(1.0, 1.0).items()}

    hp = jax.lax.Precision.HIGHEST
    # Jitter ladder like the production fits (gpr.fit / fit_experts): the
    # cap density at committee-realistic B makes the raw f32 Gram
    # indefinite — the committee's floor must reflect the JITTERED factor
    # its experts actually deploy (B=7168/13312 NaN'd without this).
    extra = 0.0
    for _ in range(6):
        k = kg.gram("rbf", x, params, noise=noise + extra)
        l = lin.cholesky(k)
        if not bool(jnp.isnan(jnp.diagonal(l)).any()):
            break
        extra = max(extra * 10.0, 1e-4)
    w = pallas_blocked_linv(l) if b % 256 == 0 else lin.blocked_linv(l, b)
    eye = jnp.eye(b, dtype=dt)
    r_ = eye - jnp.dot(l, w, precision=hp)
    w = jnp.tril(w + jnp.dot(w, r_, precision=hp))
    alpha = jnp.dot(w.T, jnp.dot(w, y, precision=hp), precision=hp)

    q = jnp.asarray(rng.normal(size=(2048, 3)), dt)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

    # Committee path: fused Pallas kernel quad through the refined W.
    _, quad_fused = fused_query_pallas("rbf", q, x, params, alpha, w)
    # Exact reference: substitution against the same factor.
    kq = kg.cross_cov("rbf", q, x, params)
    v = jax.lax.linalg.triangular_solve(l, kq.T, left_side=True, lower=True)
    quad_exact = jnp.sum(v * v, axis=0)
    jax.block_until_ready((quad_fused, quad_exact))

    err = np.abs(np.asarray(quad_fused) - np.asarray(quad_exact))
    k0 = float(kf.k_diag0("rbf", params))
    eps = float(jnp.finfo(dt).eps)
    scale_now = float(os.environ.get("GPIS_EXPERT_FLOOR_SCALE", "0.5"))
    return {
        "B": b,
        "jitter": extra,
        "err_max": float(err.max()),
        "err_p99": float(np.percentile(err, 99)),
        "err_mean": float(err.mean()),
        "floor_now": k0 * eps * max(16.0, scale_now * b),
        "implied_scale": float(err.max() / (eps * b * k0)),
    }


def main() -> int:
    bs = [int(a) for a in sys.argv[1:]] or [1280, 3328, 7168, 13312]
    for b in bs:
        t0 = time.time()
        out = probe(b)
        out["probe_s"] = round(time.time() - t0, 1)
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
