"""Full-data hyperparameter optimization for OUT-OF-CORE fits (config 3 at
beyond-HBM N — the reference's MLL hyperopt, SURVEY.md §3 C2/config 3,
at sizes its dense objective cannot reach).

The session previously only offered `method="subsample"` for out-of-core
models ("the full objective would need one beyond-HBM factorization per
optimizer step").  That factorization-per-step cost is real and stays —
but it is exactly one `ooc_fit`-shaped pipeline, and every quantity the
exact gradient identities need either falls out of it for free or costs
one extra streamed pass over the W = L^{-1} panels:

    d MLL / d theta = 1/2 ( alpha^T (dK/dtheta) alpha - tr(K^{-1} dK/dtheta) )

* **MLL value** — from the factorization byproducts: u = L^{-1}y is
  accumulated inline, sum(log diag L) is captured per sweep
  (`ooc_cholesky(stats=...)`), and y.alpha = ||u||^2.
* **lengthscale** — dK row bands come from `jax.jvp` of the band assembly
  (`kernels.gram._gram_band_rows`, the same target `gram_ad` uses — generic
  over registered kernels).  The trace tr(K^{-1} dK) = tr(W dK W^T) streams
  each stored W panel once: for panel p only the column blocks q <= p are
  live (W is lower triangular), and each (p, q) step assembles its dK band
  in-core — O(C^3/2) MXU work, ONE full W stream of link traffic, never a
  C x C dK in memory.
* **noise scale** — dK is diagonal: tr = diag(K^{-1}).dn with
  diag(K^{-1})_i = ||W[:, i]||^2, column norms accumulated on the same W
  stream.
* **signal variance** — free via dK/d(log sv) = K - D (exact for kernels
  linear in signal_variance, i.e. all built-ins): alpha^T(K-D)alpha =
  y.alpha - sum(alpha^2 n) and tr(K^{-1}(K-D)) = C - diag(K^{-1}).n.

These are the same identities the distributed optimizer uses
(`gp.sharded_hyperopt` — there the trace rides the ICI ring; here it rides
the host<->HBM panel stream).  The Adam ascent driver is shared.

Cost per step ~= one out-of-core fit + one W-stream pass; at N=32k on the
axon tunnel that is minutes/step, at N=100k tens of minutes/step — so the
session keeps `method="subsample"` as the default and offers this as
`method="stream"` for when the exact full-data objective is worth it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg
from gpis_tpu.linalg import outofcore as ooc

__all__ = ["ooc_mll_and_grad", "optimize_ooc",
           "ooc_mll_and_grad_solve_phase",
           "ooc_joint_mll_and_grad", "optimize_ooc_joint"]


@functools.partial(jax.jit, static_argnames=("name",))
def _band_trace_quad(name, x_band, x_full, log_ls, sv, w_full, alpha, q0):
    """One (p, q) step of the streamed lengthscale gradient: assemble the
    dK/d(log ls) row band for block q via jvp (the noise diagonal is
    theta-independent and the pinned k(0) diagonal has zero tangent), then

      tr partial = sum over (W_p dK)[:, q-block] * W_p[:, q-block]
                 = sum( (dK[q,:] W_p^T)^T * W_p[:, q0:q0+B] )   (dK symmetric)
      quad partial = alpha_q . (dK[q,:] alpha)

    w_full is the fetched panel padded to (B, C) — zero columns beyond the
    trimmed width make the full-C contractions exact.  One compile serves
    every (p, q) pair (q0 is traced)."""
    dt = x_full.dtype
    b = x_band.shape[0]

    def band(lls):
        prm = {"lengthscale": jnp.exp(lls), "signal_variance": sv}
        return kg._gram_band_rows(name, x_band, x_full, prm, None, q0)

    _, kdot = jax.jvp(band, (log_ls,), (jnp.ones((), dt),))
    wq = lax.dynamic_slice(
        w_full, (jnp.zeros((), q0.dtype), q0), (w_full.shape[0], b)
    )
    y = jnp.dot(kdot, w_full.T, precision=lax.Precision.HIGHEST)  # (B, P)
    tr = jnp.sum(y.T * wq)
    aq = lax.dynamic_slice(alpha, (q0,), (b,))
    quad = jnp.dot(aq, jnp.dot(kdot, alpha, precision=lax.Precision.HIGHEST))
    return tr, quad


@jax.jit
def _colnorm_accum(acc, w_full):
    """diag(K^{-1}) partial: column norms of the streamed W panel."""
    return acc + jnp.sum(w_full * w_full, axis=0)


def ooc_mll_and_grad(kernel, x, y, noise, params, *, panel: int,
                     block: int = 256, noise_scale=1.0,
                     pad_noise: float = 1e10, store: str = "tiered",
                     sweep: int = 2, trsm_sweep: int | None = None,
                     width_quant: int = 2, device_budget: int | None = None,
                     max_jitter_retries: int = 3, dtype=None):
    """Exact MLL and gradients w.r.t. (log lengthscale, log noise scale,
    log signal variance) for the out-of-core system K(x) + diag(noise *
    scale on real rows).  Runs one full out-of-core factor + TRSM at the
    given theta, then one streamed gradient pass over the W panels.

    Takes the RAW (unpadded) problem like `ooc_fit`; pads internally.
    Returns (mll, {"log_ls", "log_noise_scale", "log_sv"}).  The stores
    are transient (cleared before returning) — each call's memory
    footprint is one fit's worth, so an optimizer loop doesn't accumulate
    host RAM across steps."""
    ooc._warm_d2h_async()
    xp, yp, np_, params, c, n, jitter = ooc._pad_problem(
        kernel, x, y, noise, params, panel=panel, pad_noise=pad_noise,
        dtype=dtype,
    )
    dt = xp.dtype
    scale = jnp.asarray(noise_scale, dt)
    real = (jnp.arange(c) < n).astype(dt)
    noise_eff = jnp.where(real > 0, np_ * scale, np_)

    tsw = min(sweep, 2) if trsm_sweep is None else trsm_sweep
    budget = ooc.DeviceBudget(
        device_budget if device_budget is not None
        else ooc._hbm_budget(panel, c, jnp.dtype(dt).itemsize,
                             sweep=max(sweep, tsw + 1))
    )

    st, u, stats, extra = ooc._factor_with_jitter(
        kernel, xp, noise_eff, params, budget, panel=panel, block=block,
        store=store, width_quant=width_quant, sweep=sweep, y=yp,
        jitter=jitter, max_jitter_retries=max_jitter_retries)
    n_tot = noise_eff + extra  # the diagonal the factor actually represents
    logdet = stats["logdiag_sum"]

    alpha = ooc.ooc_alpha_backward(st, u, panel=panel)
    wstore = ooc._make_store(store, budget)
    try:
        ooc.ooc_trsm(st, wstore, yp, panel=panel, block=block,
                     accumulate_alpha=False, width_quant=width_quant,
                     sweep=tsw)

        # ---- one streamed pass: colnorms + lengthscale trace/quad.
        log_ls = jnp.log(jnp.asarray(params["lengthscale"], dt))
        sv = jnp.asarray(params["signal_variance"], dt)
        nb = c // panel
        colnorms = jnp.zeros((c,), dt)
        tr_ls = jnp.zeros((), dt)
        quad_ls = jnp.zeros((), dt)
        for p, w_full in ooc._Prefetcher(wstore, range(nb), pad_to=c):
            colnorms = _colnorm_accum(colnorms, w_full)
            for q in range(p + 1):
                xq = ooc._dyn_rows(xp, q * panel, size=panel)
                tr_p, quad_p = _band_trace_quad(
                    kernel, xq, xp, log_ls, sv, w_full, alpha,
                    jnp.asarray(q * panel, jnp.int32),
                )
                tr_ls = tr_ls + tr_p
                if q == p:
                    quad_ls = quad_ls + quad_p
            # Bound live padded panels to ~2 (this one + the prefetch).
            jax.block_until_ready(tr_ls)
            del w_full
    finally:
        wstore.clear()
        st.clear()

    # ---- assemble value + gradients from the O(C) pieces.
    ya = jnp.dot(yp, alpha)
    mll = (-0.5 * ya - logdet - 0.5 * c * jnp.log(2.0 * jnp.pi).astype(dt)
           + jnp.sum(jnp.where(real > 0, 0.0,
                               0.5 * jnp.log(2.0 * jnp.pi * n_tot))))

    dn = real * np_ * scale
    a2 = alpha * alpha
    g_ns = 0.5 * (jnp.dot(a2, dn) - jnp.dot(colnorms, dn))
    quad_sv = ya - jnp.dot(a2, n_tot)
    tr_sv = c - jnp.dot(colnorms, n_tot)
    g_sv = 0.5 * (quad_sv - tr_sv)
    g_ls = 0.5 * (quad_ls - tr_ls)
    return mll, {"log_ls": g_ls, "log_noise_scale": g_ns, "log_sv": g_sv}


@functools.partial(jax.jit, static_argnames=("name",))
def _band_quad_only(name, x_band, x_full, log_ls, sv, alpha, q0):
    """alpha-quad term of one column band — the W-free half of
    `_band_trace_quad`, split out so the process-split gradient phase can
    run it AFTER the TRSM (alpha accumulates during the W stream under
    defer_alpha, so the quad cannot ride `on_panel`)."""
    dt = x_full.dtype
    b = x_band.shape[0]

    def band(lls):
        prm = {"lengthscale": jnp.exp(lls), "signal_variance": sv}
        return kg._gram_band_rows(name, x_band, x_full, prm, None, q0)

    _, kdot = jax.jvp(band, (log_ls,), (jnp.ones((), dt),))
    aq = lax.dynamic_slice(alpha, (q0,), (b,))
    return jnp.dot(aq, jnp.dot(kdot, alpha, precision=lax.Precision.HIGHEST))


def ooc_mll_and_grad_solve_phase(spill_dir: str, *, noise_base,
                                 noise_scale=1.0, trsm_sweep: int = 1,
                                 device_budget: int | None = None,
                                 w_dtype=None):
    """Phase 2 of the PROCESS-SPLIT full-data stream-hyperopt step
    (VERDICT r4 missing #2): reattach the L store a prior
    `ooc_factor_phase(..., defer_alpha=True)` persisted under `spill_dir`
    and produce the exact (mll, grads) of `ooc_mll_and_grad` — in a FRESH
    process, so the factor phase's retained h2d RSS (the axon client keeps
    ~1:1 host copies of every panel byte, docs/PERF.md) is returned to the
    OS before the TRSM+gradient stream starts.  The single-process step at
    N=100,128 was OOM-killed at 130.7 GB for exactly this reason.

    The gradient pass RIDES the TRSM (`ooc_trsm(on_panel=...)`, the same
    hook as the fused dense-grid query): colnorms and the lengthscale
    trace accumulate against each sweep's full-width f32 W rows while they
    are device-resident, alpha accumulates panel-wise (defer_alpha), and
    the alpha-quad term runs as a W-free band sweep afterwards — the
    separate post-hoc W re-stream of the single-process path disappears
    entirely.

    `noise_base` is the RAW (unpadded, unscaled, jitter-free) per-point
    noise the problem was built with — needed for d(noise)/d(log scale)
    because the persisted state stores only the jittered effective
    diagonal.  Returns (mll, grads_dict)."""
    import os

    ooc._warm_d2h_async()
    d = np.load(os.path.join(spill_dir, "state.npz"), allow_pickle=False)
    kernel = str(d["kernel"])
    panel = int(d["panel"])
    block = int(d["block"])
    n = int(d["n_real"])
    xp = jnp.asarray(d["x"])
    yp = jnp.asarray(d["y"])
    n_tot = jnp.asarray(d["noise"])  # scaled noise + fit jitter
    if "logdiag_sum" not in d.files:
        raise ValueError("factor phase predates logdiag capture; refit")
    logdet = jnp.asarray(float(d["logdiag_sum"]), xp.dtype)
    params = {k[len("param_"):]: jnp.asarray(d[k])
              for k in d.files if k.startswith("param_")}
    dt = xp.dtype
    c = xp.shape[0]
    nb = c // panel
    budget = ooc.DeviceBudget(
        device_budget if device_budget is not None
        else ooc._hbm_budget(panel, c, jnp.dtype(dt).itemsize,
                             sweep=trsm_sweep + 1)
    )
    lst = ooc.TieredPanelStore.open_dir(budget, os.path.join(spill_dir, "L"))
    wstore = ooc._make_store("tiered", budget, spill_dtype=w_dtype,
                             device_dtype=w_dtype)

    log_ls = jnp.log(jnp.asarray(params["lengthscale"], dt))
    sv = jnp.asarray(params["signal_variance"], dt)
    acc = {"colnorms": jnp.zeros((c,), dt), "tr_ls": jnp.zeros((), dt)}
    # _band_trace_quad wants an alpha operand; a zero vector makes its quad
    # term (which this pass ignores) cost one O(B*C) GEMV of nothing.
    zero_alpha = jnp.zeros((c,), dt)

    def on_panel(j0, wj):
        # wj: the sweep group's (R, C) full-width f32 W rows, device
        # resident.  Column bands q beyond a row's own panel contribute
        # exactly zero (W lower-triangular, zero-padded), so sweeping q
        # over the whole group prefix is exact.
        acc["colnorms"] = _colnorm_accum(acc["colnorms"], wj)
        q_hi = j0 // panel + wj.shape[0] // panel
        tr = acc["tr_ls"]
        for q in range(q_hi):
            xq = ooc._dyn_rows(xp, q * panel, size=panel)
            tr_p, _ = _band_trace_quad(
                kernel, xq, xp, log_ls, sv, wj, zero_alpha,
                jnp.asarray(q * panel, jnp.int32))
            tr = tr + tr_p
        acc["tr_ls"] = tr
        jax.block_until_ready(tr)

    try:
        alpha = ooc.ooc_trsm(lst, wstore, yp, panel=panel, block=block,
                             accumulate_alpha=True,
                             width_quant=int(d["width_quant"]),
                             sweep=trsm_sweep, on_panel=on_panel,
                             store_final=True)
        colnorms, tr_ls = acc["colnorms"], acc["tr_ls"]
        quad_ls = jnp.zeros((), dt)
        for q in range(nb):
            xq = ooc._dyn_rows(xp, q * panel, size=panel)
            quad_ls = quad_ls + _band_quad_only(
                kernel, xq, xp, log_ls, sv, alpha,
                jnp.asarray(q * panel, jnp.int32))
    finally:
        wstore.clear()
        lst.clear()

    real = (jnp.arange(c) < n).astype(dt)
    ya = jnp.dot(yp, alpha)
    mll = (-0.5 * ya - logdet - 0.5 * c * jnp.log(2.0 * jnp.pi).astype(dt)
           + jnp.sum(jnp.where(real > 0, 0.0,
                               0.5 * jnp.log(2.0 * jnp.pi * n_tot))))
    scale = jnp.asarray(noise_scale, dt)
    nb_pad = jnp.zeros((c,), dt).at[:n].set(jnp.asarray(noise_base, dt)[:n])
    dn = real * nb_pad * scale
    a2 = alpha * alpha
    g_ns = 0.5 * (jnp.dot(a2, dn) - jnp.dot(colnorms, dn))
    quad_sv = ya - jnp.dot(a2, n_tot)
    tr_sv = c - jnp.dot(colnorms, n_tot)
    g_sv = 0.5 * (quad_sv - tr_sv)
    g_ls = 0.5 * (quad_ls - tr_ls)
    return mll, {"log_ls": g_ls, "log_noise_scale": g_ns, "log_sv": g_sv}


@functools.partial(jax.jit, static_argnames=("name",))
def _joint_band_trace_quad(name, meta_band, meta_full, log_ls, sv, w_full,
                           alpha, q0):
    """Joint mirror of `_band_trace_quad`: the dK/d(log ls) row band comes
    from jvp of the blended joint operator (`pallas_joint.joint_rows_ref`),
    which differentiates the gradient-block diagonals too (they DO depend
    on the lengthscale, unlike the value path's pinned k(0) diagonal); the
    observation-noise diagonal is theta-independent and excluded
    (noise_col=None).  meta_* are packed (rows, 7) factor metadata.

    The dK band is generated in (B, B)-column chunks inside a fori_loop:
    `joint_rows_ref` materializes O(rows * cols * 3) broadcast temps, so
    a single J-wide call would hold panel*J*3 floats (+ jvp tangents) —
    ~13 GB at J=131k — defeating the out-of-core point.  Chunked, the
    transient is O(B^2) regardless of J; tr and dK@alpha accumulate per
    chunk (y = sum_s kdot_s W_s^T distributes over column blocks)."""
    from gpis_tpu.kernels import pallas_joint as pj

    dt = meta_full.dtype
    b = meta_band.shape[0]
    j = meta_full.shape[0]
    rmeta = (meta_band[:, :3], meta_band[:, 3:6], meta_band[:, 6])
    wq = lax.dynamic_slice(
        w_full, (jnp.zeros((), q0.dtype), q0), (w_full.shape[0], b)
    )

    def step(i, carry):
        tr, ka = carry
        s0 = i * b
        mc = lax.dynamic_slice(meta_full, (s0, 0), (b, 7))
        cmeta = (mc[:, :3], mc[:, 3:6], mc[:, 6])

        def band(lls):
            prm = {"lengthscale": jnp.exp(lls), "signal_variance": sv}
            return pj.joint_rows_ref(name, rmeta, cmeta, prm)

        _, kdot = jax.jvp(band, (log_ls,), (jnp.ones((), dt),))
        ws = lax.dynamic_slice(w_full, (0, s0), (w_full.shape[0], b))
        yv = jnp.dot(kdot, ws.T, precision=lax.Precision.HIGHEST)  # (B, P)
        als = lax.dynamic_slice(alpha, (s0,), (b,))
        return (tr + jnp.sum(yv.T * wq),
                ka + jnp.dot(kdot, als, precision=lax.Precision.HIGHEST))

    tr, ka = lax.fori_loop(
        0, j // b, step, (jnp.zeros((), dt), jnp.zeros((b,), dt)))
    aq = lax.dynamic_slice(alpha, (q0,), (b,))
    return tr, jnp.dot(aq, ka)


def ooc_joint_mll_and_grad(kernel, x, y, normals, noise_f, noise_g, params,
                           *, panel: int, block: int = 256, noise_scale=1.0,
                           pad_noise: float = 1e10, store: str = "tiered",
                           sweep: int = 2, trsm_sweep: int | None = None,
                           width_quant: int = 2,
                           device_budget: int | None = None,
                           max_jitter_retries: int = 3, dtype=None):
    """Exact JOINT-system MLL and gradients w.r.t. (log lengthscale, log
    value-noise scale, log signal variance) out of core — config 3 on
    config 2 at beyond-HBM J = 4C.  Same identities as `ooc_mll_and_grad`;
    the band jvp targets the blended joint operator, the value-noise scale
    multiplies REAL CORE value rows only (the `optimize_joint` /
    `optimize_sharded_joint` convention — the gradient-noise family stays
    fixed), and diag directions live on the dimension-major joint layout
    [f(1..C) | d1 | d2 | d3]."""
    from gpis_tpu.kernels import pallas_joint as pj

    ooc._warm_d2h_async()
    (xp, yj, meta, _nrm, nf, ng, params, c, n,
     jitter) = ooc._pad_joint_problem(kernel, x, y, normals, noise_f,
                                      noise_g, params, panel=panel,
                                      pad_noise=pad_noise, dtype=dtype)
    dt = xp.dtype
    j_tot = 4 * c
    scale = jnp.asarray(noise_scale, dt)
    real_c = (jnp.arange(c) < n).astype(dt)
    nf_eff = jnp.where(real_c > 0, nf * scale, nf)
    noisej = pj._joint_noise(c, nf_eff, ng, None, dt)
    real_j = jnp.concatenate([real_c] * 4)
    dn_j = jnp.concatenate([real_c * nf * scale, jnp.zeros((3 * c,), dt)])

    tsw = min(sweep, 2) if trsm_sweep is None else trsm_sweep
    budget = ooc.DeviceBudget(
        device_budget if device_budget is not None
        else ooc._hbm_budget(panel, j_tot, jnp.dtype(dt).itemsize,
                             sweep=max(sweep, tsw + 1))
    )

    st, u, stats, extra = ooc._factor_with_jitter(
        kernel, meta, noisej, params, budget, panel=panel, block=block,
        store=store, width_quant=width_quant, sweep=sweep, y=yj,
        jitter=jitter, max_jitter_retries=max_jitter_retries)
    n_tot = noisej + extra  # the diagonal the factor actually represents
    logdet = stats["logdiag_sum"]

    alpha = ooc.ooc_alpha_backward(st, u, panel=panel)
    wstore = ooc._make_store(store, budget)
    try:
        ooc.ooc_trsm(st, wstore, yj, panel=panel, block=block,
                     accumulate_alpha=False, width_quant=width_quant,
                     sweep=tsw)

        log_ls = jnp.log(jnp.asarray(params["lengthscale"], dt))
        sv = jnp.asarray(params["signal_variance"], dt)
        nb = j_tot // panel
        colnorms = jnp.zeros((j_tot,), dt)
        tr_ls = jnp.zeros((), dt)
        quad_ls = jnp.zeros((), dt)
        for p, w_full in ooc._Prefetcher(wstore, range(nb), pad_to=j_tot):
            colnorms = _colnorm_accum(colnorms, w_full)
            for q in range(p + 1):
                mq = ooc._dyn_rows(meta, q * panel, size=panel)
                tr_p, quad_p = _joint_band_trace_quad(
                    kernel, mq, meta, log_ls, sv, w_full, alpha,
                    jnp.asarray(q * panel, jnp.int32),
                )
                tr_ls = tr_ls + tr_p
                if q == p:
                    quad_ls = quad_ls + quad_p
            jax.block_until_ready(tr_ls)
            del w_full
    finally:
        wstore.clear()
        st.clear()

    ya = jnp.dot(yj, alpha)
    mll = (-0.5 * ya - logdet
           - 0.5 * j_tot * jnp.log(2.0 * jnp.pi).astype(dt)
           + jnp.sum(jnp.where(real_j > 0, 0.0,
                               0.5 * jnp.log(2.0 * jnp.pi * n_tot))))

    a2 = alpha * alpha
    g_ns = 0.5 * (jnp.dot(a2, dn_j) - jnp.dot(colnorms, dn_j))
    quad_sv = ya - jnp.dot(a2, n_tot)
    tr_sv = j_tot - jnp.dot(colnorms, n_tot)
    g_sv = 0.5 * (quad_sv - tr_sv)
    g_ls = 0.5 * (quad_ls - tr_ls)
    return mll, {"log_ls": g_ls, "log_noise_scale": g_ns, "log_sv": g_sv}


def optimize_ooc_joint(kernel, x, y, normals, noise_f, noise_g, init_params,
                       *, panel: int, block: int = 256, steps: int = 25,
                       learning_rate: float = 0.1, learn_noise: bool = True,
                       learn_signal: bool = False, **ooc_kw):
    """Full-data JOINT MLL ascent out of core — config 3 on config 2 with
    NO subsampling at any J the panel stores can hold.  Each step is one
    out-of-core joint factor + TRSM + one streamed gradient pass."""
    from gpis_tpu.gp.sharded_hyperopt import _mll_ascent

    dt = jnp.asarray(x).dtype

    def eval_fn(prm, scale):
        return ooc_joint_mll_and_grad(kernel, x, y, normals, noise_f,
                                      noise_g, prm, panel=panel, block=block,
                                      noise_scale=scale, **ooc_kw)

    return _mll_ascent(eval_fn, kernel, init_params, dt, steps=steps,
                       learning_rate=learning_rate, learn_noise=learn_noise,
                       learn_signal=learn_signal)


def optimize_ooc(kernel, x, y, noise, init_params, *, panel: int,
                 block: int = 256, steps: int = 25,
                 learning_rate: float = 0.1, learn_noise: bool = True,
                 learn_signal: bool = False, **ooc_kw):
    """Full-data MLL ascent on the out-of-core system — config 3 with NO
    subsampling at any N the panel stores can hold.  Each step is one
    out-of-core factor + TRSM + one streamed gradient pass (see
    ooc_mll_and_grad — this is deliberate, the same fit-per-step shape as
    `optimize_sharded`).  Returns a dict: params (optimal), noise_scale,
    mll, history."""
    from gpis_tpu.gp.sharded_hyperopt import _mll_ascent

    dt = jnp.asarray(x).dtype

    def eval_fn(prm, scale):
        return ooc_mll_and_grad(kernel, x, y, noise, prm, panel=panel,
                                block=block, noise_scale=scale, **ooc_kw)

    return _mll_ascent(eval_fn, kernel, init_params, dt, steps=steps,
                       learning_rate=learning_rate, learn_noise=learn_noise,
                       learn_signal=learn_signal)
