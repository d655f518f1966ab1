"""Local-expert GP committee — the expert-parallel (EP) axis.

SURVEY.md §3's parallelism checklist lists expert parallelism as the one
strategy with no reference analogue, naming "local-expert GPs (mixture of
GP experts)" as the nearest fit.  This module implements it TPU-first:

* The surface cloud is spatially partitioned into E balanced local experts
  (k-means centroids + capacity-capped greedy assignment, host-side data
  prep like the voxel filter).  Every expert also sees the *shared* GPIS
  context rows (internal −1 / external +1 label points), so each local
  implicit function is globally anchored — a local expert seeing only
  label-0 surface rows would have a posterior mean that is identically 0.
* Each expert is an exact GP over its ≤B points.  All experts share one
  static capacity B (stacked (E, B, …) leaves), so the per-expert fit is
  ONE compiled program executed E times through the existing single-model
  machinery (`gp.regression.fit_padded` + Pallas Cholesky/TRSM on TPU —
  a deliberate host loop: this backend's *batched* native Cholesky hits
  the same HLO-temp blowup documented in docs/PERF.md for the unbatched
  one, while E sequential Pallas fits reuse one compile).
* Prediction combines the expert posteriors with the (robust) Bayesian
  committee machine [Tresp 2000; Deisenroth & Ng, ICML 2015,
  "Distributed Gaussian Processes"]:

      beta_e  = 1                      (BCM — exact for E=1)
      beta_e  = ½(log k0 − log σ_e²)   (rBCM — differential entropy)
      σ*⁻²    = Σ_e beta_e σ_e⁻² + (1 − Σ_e beta_e) k0⁻¹
      μ*      = σ*² Σ_e beta_e σ_e⁻² μ_e

  A far-from-data expert has σ_e² → k0, so its beta → 0 (rBCM): distant
  experts drop out of the committee *smoothly*, which makes spatial
  gating principled — for concrete (host-known) query chunks only the
  `gate` nearest experts by centroid distance are evaluated at all, and
  the skipped experts' exact contribution is the prior term already in
  the σ*⁻² formula.  Dense-grid queries on TPU route each gated
  (chunk, expert) pair through the fused Pallas query kernel
  (`kernels.pallas_query.fused_query_pallas` — kq generated in VMEM).
* Expert *parallelism*: the expert axis is embarrassingly parallel at fit
  time and needs exactly three `psum`s at combine time.  `predict_sharded`
  runs the committee under `shard_map` over a named ("expert",) mesh —
  each device evaluates its local experts and the combine rides ICI.

This is an *approximate* posterior (committee ≠ exact GP for E > 1): it
trades the exact model's O(N²)-memory factor for E independent O(B²)
factors, which is what lets a 100k-point cloud fit and query in seconds on
one chip (vs the exact out-of-core path's link-bound hour, BASELINE.md).
Accuracy is gated by the same surface-RMSE tests as the exact paths.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from gpis_tpu.gp import regression as gpr
from gpis_tpu.gp.model import GPModel, align_capacity, round_up
from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg
from gpis_tpu.linalg import cholesky as lin
from gpis_tpu.linalg.matmul import matmul as _mm

__all__ = [
    "ExpertGPModel",
    "partition_cloud",
    "fit_experts",
    "fit_experts_joint",
    "optimize_experts",
    "predict",
    "predict_mean",
    "predict_sharded",
    "update",
    "expert_view",
    "expert_chol",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ExpertGPModel:
    """Committee of E local exact GPs with stacked (E, B, …) state."""

    x: jax.Array  # (E, B, 3) expert training positions (normalized frame)
    y: jax.Array  # (E, B) targets
    noise: jax.Array  # (E, B) observation variances (pad rows: pad_noise)
    params: dict  # shared kernel hyperparameters
    # (E, B, B) per-expert lower Cholesky factors — or None for large
    # committees (retain_chol=False): queries need only `linv`, and the
    # rare touch-update recomputes one expert's factor on demand
    # (`expert_chol`), which halves the committee's resident factor HBM
    # and the fit program's stacked outputs (the E=16 x B=7168 OOM of
    # BASELINE.md r3 was exactly the stacked L+W).
    chol: jax.Array | None
    alpha: jax.Array  # (E, B) per-expert weights
    linv: jax.Array | None  # (E, B, B) per-expert W = L^{-1} (fast variance)
    n_touch: jax.Array  # (E,) int32 touch-slot occupancy per expert
    centroids: jax.Array  # (E, 3) expert centroids (gating / touch routing)
    # --- static metadata ---
    kernel: str = dataclasses.field(metadata=dict(static=True))
    n0: int = dataclasses.field(metadata=dict(static=True))  # touch boundary
    pad_noise: float = dataclasses.field(metadata=dict(static=True), default=1e10)
    beta: str = dataclasses.field(metadata=dict(static=True), default="rbcm")
    gate: int = dataclasses.field(metadata=dict(static=True), default=0)
    # --- joint (config-2) committee state: normals as first-class gradient
    # observations per expert.  When `normals` is set the factors span the
    # per-expert JOINT system (J = 4B + T rows, gp.derivative layout) and
    # tactile slots live at the joint tail (touch_* stacks) instead of
    # inside the B point rows.
    normals: jax.Array | None = dataclasses.field(default=None)   # (E, B, 3)
    noise_g: jax.Array | None = dataclasses.field(default=None)   # (E, B)
    touch_x: jax.Array | None = dataclasses.field(default=None)   # (E, T, 3)
    touch_y: jax.Array | None = dataclasses.field(default=None)   # (E, T)
    touch_noise: jax.Array | None = dataclasses.field(default=None)  # (E, T)

    @property
    def n_experts(self) -> int:
        return self.x.shape[0]

    @property
    def capacity(self) -> int:  # per-expert capacity B
        return self.x.shape[1]

    @property
    def joint(self) -> bool:
        return self.normals is not None

    @property
    def touch_capacity(self) -> int:
        if self.joint:
            return 0 if self.touch_x is None else self.touch_x.shape[1]
        return self.capacity - self.n0

    @property
    def dtype(self):
        return self.x.dtype

    def predict(self, q, **kw):
        return predict(self, q, **kw)


# --------------------------------------------------------------- partition


def partition_cloud(points, n_experts: int, *, iters: int = 8, seed: int = 0):
    """Balanced spatial partition of an (N, 3) cloud into `n_experts` groups.

    Plain k-means for centroids, then a globally-greedy capacity-capped
    assignment: all (point, expert) pairs sorted by distance, each point
    taking its nearest expert that still has room (cap = ceil(N/E)).  Host
    NumPy — O(N·E) data prep, same layer as the voxel filter.

    Returns (centroids (E,3) float array, groups: list of E index arrays).
    """
    pts = np.asarray(points, np.float64)
    n = pts.shape[0]
    e = int(n_experts)
    if e < 1:
        raise ValueError(f"n_experts must be >= 1, got {e}")
    if e == 1:
        return pts.mean(0, keepdims=True), [np.arange(n)]
    if e > n:
        raise ValueError(f"n_experts {e} exceeds point count {n}")
    rng = np.random.default_rng(seed)
    cent = pts[rng.choice(n, e, replace=False)]
    for _ in range(iters):
        d = ((pts[:, None, :] - cent[None, :, :]) ** 2).sum(-1)  # (N, E)
        a = d.argmin(1)
        for k in range(e):
            sel = pts[a == k]
            if len(sel):
                cent[k] = sel.mean(0)
    # Balanced assignment: global greedy over distance-sorted pairs.
    d = ((pts[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    cap = -(-n // e)
    order = np.argsort(d, axis=None, kind="stable")
    assign = np.full(n, -1, np.int64)
    counts = np.zeros(e, np.int64)
    placed = 0
    for flat in order:
        i, k = divmod(int(flat), e)
        if assign[i] >= 0 or counts[k] >= cap:
            continue
        assign[i] = k
        counts[k] += 1
        placed += 1
        if placed == n:
            break
    groups = [np.nonzero(assign == k)[0] for k in range(e)]
    # Final centroids = means of the balanced groups (used for gating).
    cent = np.stack([
        pts[g].mean(0) if len(g) else cent[k] for k, g in enumerate(groups)
    ])
    return cent, groups


def _partition_with_halo(pts_own, n_experts: int, *, n_halo: int = 0,
                         seed: int = 0):
    """Balanced partition plus optional boundary halo: each expert
    additionally replicates the `n_halo` surface points nearest its
    centroid that the partition assigned elsewhere (smooths the committee
    seam where neighboring experts both extrapolate).  Host prep, O(N·E)
    like the partition itself."""
    centroids, groups = partition_cloud(pts_own, n_experts, seed=seed)
    e = len(groups)
    n_own = pts_own.shape[0]
    if n_halo > 0 and e > 1:
        own = np.asarray(pts_own, np.float64)
        member = np.zeros((n_own, e), bool)
        for k, g in enumerate(groups):
            member[g, k] = True
        d = ((own[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        halo_groups = []
        for k, g in enumerate(groups):
            dk = np.where(member[:, k], np.inf, d[:, k])
            take = min(int(n_halo), n_own - len(g))
            halo = np.argpartition(dk, take - 1)[:take] if take > 0 else \
                np.empty((0,), np.int64)
            halo_groups.append(np.concatenate([g, np.sort(halo)]))
        groups = halo_groups
    return centroids, groups


# --------------------------------------------------------------------- fit


def fit_experts(
    kernel: str,
    x,
    y,
    noise,
    params,
    *,
    n_experts: int,
    n_shared_tail: int = 0,
    block: int = 128,
    touch_capacity: int = 64,
    pad_noise: float = 1e10,
    dtype=None,
    beta: str = "rbcm",
    gate: int = 0,
    seed: int = 0,
    max_jitter_retries: int = 6,
    n_halo: int = 0,
    retain_chol: bool | None = None,
) -> ExpertGPModel:
    """Partition rows [0, N - n_shared_tail) spatially into `n_experts`
    local GPs; the trailing `n_shared_tail` rows (the GPIS internal/external
    label points) are replicated into every expert as shared context.

    Each expert gets `touch_capacity` private tactile slots at rows
    [n0, B).  All experts share one capacity, so the fit is one compiled
    program run E times (Pallas Cholesky + TRSM on TPU via the single-model
    path).

    `n_halo` > 0 additionally replicates, into each expert, the `n_halo`
    surface points nearest its centroid that the balanced partition
    assigned elsewhere — boundary overlap that smooths the committee seam
    where two neighboring experts both extrapolate (the rBCM weights fade
    each expert near its boundary; the halo keeps its local posterior
    accurate there instead).

    `retain_chol=None` (auto) keeps the stacked (E, B, B) Cholesky factors
    only while L+W together stay under ~4 GB; beyond that the model carries
    W alone (`chol=None`) — queries never read L, and `expert_chol`
    recomputes one expert's factor on demand for touch updates.  This is
    what lets E=16 x B=7168 (and beyond) fit at N=100k on one 16 GB chip
    (the r3 OOM held stacked L AND W plus per-step temps)."""
    dtype = dtype or x.dtype
    x = jnp.asarray(x, dtype)
    y = jnp.asarray(y, dtype)
    n = x.shape[0]
    noise = jnp.broadcast_to(jnp.asarray(noise, dtype), (n,))
    n_own = n - n_shared_tail
    if n_own <= 0:
        raise ValueError("no partitionable rows (n_shared_tail >= N)")
    x_host = np.asarray(x)
    centroids, groups = _partition_with_halo(
        x_host[:n_own], n_experts, n_halo=n_halo, seed=seed)
    e = len(groups)

    max_own = max(len(g) for g in groups)
    n0 = round_up(max_own + n_shared_tail, block)
    b_tot = align_capacity(n0 + round_up(touch_capacity, block))

    shared = np.arange(n_own, n)
    xs, ys, ns = [], [], []
    for g in groups:
        idx = np.concatenate([g, shared])
        xp, yp, np_ = gpr._pad_training(
            x[idx], y[idx], noise[idx], b_tot, pad_noise, dtype
        )
        xs.append(xp)
        ys.append(yp)
        ns.append(np_)
    xs = jnp.stack(xs)
    ys = jnp.stack(ys)
    ns = jnp.stack(ns)

    eps = float(jnp.finfo(dtype).eps)
    params_cast = {k: jnp.asarray(v, dtype) for k, v in params.items()}
    k0 = float(kf.k_diag0(kernel, params_cast))
    jitter = 4.0 * eps * b_tot * abs(k0)

    # ONE jitted program for all E fits (lax.map over the stacked leaves;
    # the per-expert body compiles once, and a single dispatch replaces
    # E eager gram/chol/TRSM round-trips — the tunnel's per-step latency
    # made the eager loop minutes-slow at E=16, docs/PERF.md).  Sequential
    # on purpose: the BATCHED native Cholesky hits the HLO-temp blowup
    # documented in docs/PERF.md; lax.map keeps one B x B live per step.
    want_linv = b_tot >= 512
    hp = jax.lax.Precision.HIGHEST
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False

    def _linv(l):
        # Same dispatch as gp.regression.with_linv: the left-looking Pallas
        # TRSM on TPU tiled sizes, the blocked fori-loop TRSM elsewhere.
        if on_tpu and b_tot >= 1024 and b_tot % 256 == 0:
            from gpis_tpu.linalg.pallas_chol import pallas_blocked_linv

            return pallas_blocked_linv(l, 256)
        return lin.blocked_linv(l, 512 if b_tot % 512 == 0 else b_tot)

    itemsize = jnp.dtype(dtype).itemsize
    retain = (not want_linv if retain_chol is None
              else (retain_chol or not want_linv))
    if retain_chol is None and want_linv:
        # Auto: keep the stacked L only while L+W together are cheap.
        retain = 2 * e * b_tot * b_tot * itemsize <= 4_000_000_000

    @jax.jit
    def _fit_program(xs, ys, ns):
        def one(args):
            xe, ye, ne = args
            k = kg.gram(kernel, xe, params_cast, noise=ne)
            l = lin.cholesky(k)
            if not want_linv:
                return {"diag": jnp.diagonal(l), "l": l,
                        "alpha": lin.cho_solve(l, ye)}
            w = _linv(l)
            # One Newton step W <- W + W(I - L W): the explicit Pallas
            # inverse carries O(eps*kappa) absolute error that the rBCM
            # variance weights can't tolerate (measured on-chip at
            # B=1280: quad error 1.5e-3 raw vs 7e-7 refined, against a
            # 5.6e-3 posterior variance — raw W drove the variance
            # NEGATIVE).  Means are insensitive; committee weights are
            # not.  Cost: two B^3 GEMMs per expert, once, at fit time.
            # tril keeps the exact-zero upper triangle the fused query
            # kernels' DMA elision relies on.
            eye = jnp.eye(b_tot, dtype=w.dtype)
            r = eye - _mm(l, w, precision=hp)
            w = jnp.tril(w + _mm(w, r, precision=hp))
            alpha = _mm(w.T, _mm(w, ye, precision=hp), precision=hp)
            out = {"diag": jnp.diagonal(l), "w": w, "alpha": alpha}
            if retain:
                out["l"] = l
            return out

        return jax.lax.map(one, (xs, ys, ns))

    extra = np.zeros((e,), np.float64)
    out = None
    for attempt in range(max_jitter_retries + 1):
        out = None  # release the failed attempt's stacks before refitting
        out = _fit_program(xs, ys, ns + jnp.asarray(extra, dtype)[:, None])
        bad = np.asarray(jnp.isnan(out["diag"]).any(axis=1))
        if not bad.any():
            break
        extra[bad] = jitter * (10.0 ** attempt)
    else:
        raise FloatingPointError(
            f"expert Cholesky failed even with jitter {extra.max():.2e}"
        )

    return ExpertGPModel(
        x=xs,
        y=ys,
        noise=ns + jnp.asarray(extra, dtype)[:, None],
        params=params_cast,
        chol=out.get("l"),
        alpha=out["alpha"],
        linv=out.get("w"),
        n_touch=jnp.zeros((e,), jnp.int32),
        centroids=jnp.asarray(centroids, dtype),
        kernel=kernel,
        n0=n0,
        pad_noise=pad_noise,
        beta=beta,
        gate=int(gate),
    )


def fit_experts_joint(
    kernel: str,
    x,
    y,
    normals,
    noise_f,
    noise_g,
    params,
    *,
    n_experts: int,
    n_shared_tail: int = 0,
    block: int = 128,
    touch_capacity: int = 64,
    pad_noise: float = 1e10,
    dtype=None,
    beta: str = "rbcm",
    gate: int = 0,
    seed: int = 0,
    max_jitter_retries: int = 6,
    n_halo: int = 0,
    retain_chol: bool | None = None,
) -> ExpertGPModel:
    """Config 2 × EP: a committee of local JOINT GPs — each expert observes
    its own surface points' values AND unit normals (gradient rows, the
    gp.derivative layout: per-expert factor J = 4B + T).  Each expert's
    joint factor is only (4B)² — in-core at any committee scale — so
    derivative observations compose with the fast approximate 100k-class
    path (VERDICT r3 missing #3).  The rBCM combine is observation-type
    agnostic: expert posteriors enter as (mean, variance) regardless of
    what they were conditioned on.  Tactile slots live at each expert's
    joint tail and take the exact single-model bordering
    (gp.derivative.update_joint) via `update`.

    `normals` rows for the shared GPIS anchor tail should be zero with
    `noise_g` at pad_noise (the session's `_joint_obs` builds exactly
    that), so anchors stay value-only observations in every expert."""
    from gpis_tpu.kernels import derivative as kd

    dtype = dtype or x.dtype
    x = jnp.asarray(x, dtype)
    y = jnp.asarray(y, dtype)
    normals = jnp.asarray(normals, dtype)
    n = x.shape[0]
    noise_f = jnp.broadcast_to(jnp.asarray(noise_f, dtype), (n,))
    noise_g = jnp.broadcast_to(jnp.asarray(noise_g, dtype), (n,))
    n_own = n - n_shared_tail
    if n_own <= 0:
        raise ValueError("no partitionable rows (n_shared_tail >= N)")
    x_host = np.asarray(x)
    centroids, groups = _partition_with_halo(
        x_host[:n_own], n_experts, n_halo=n_halo, seed=seed)
    e = len(groups)

    max_own = max(len(g) for g in groups)
    c = round_up(max_own + n_shared_tail, block)
    t = round_up(touch_capacity, block) if touch_capacity else 0
    if 4 * c + t >= 4096:
        # Same MXU-friendly joint sizing as gp.derivative.fit_with_normals.
        c = round_up(c, 256)
        if t:
            t = align_capacity(4 * c + t) - 4 * c
    j_tot = 4 * c + t

    shared = np.arange(n_own, n)
    xs, ys, nfs, ngs, nrms = [], [], [], [], []
    for g in groups:
        idx = np.concatenate([g, shared])
        m = len(idx)
        xs.append(jnp.zeros((c, 3), dtype).at[:m].set(x[idx]))
        ys.append(jnp.zeros((c,), dtype).at[:m].set(y[idx]))
        nfs.append(jnp.full((c,), pad_noise, dtype).at[:m].set(noise_f[idx]))
        ngs.append(jnp.full((c,), pad_noise, dtype).at[:m].set(noise_g[idx]))
        nrms.append(jnp.zeros((c, 3), dtype).at[:m].set(normals[idx]))
    xs, ys = jnp.stack(xs), jnp.stack(ys)
    nfs, ngs, nrms = jnp.stack(nfs), jnp.stack(ngs), jnp.stack(nrms)

    eps = float(jnp.finfo(dtype).eps)
    params_cast = {k: jnp.asarray(v, dtype) for k, v in params.items()}
    k0 = float(kf.k_diag0(kernel, params_cast))
    jitter = 4.0 * eps * j_tot * abs(k0)

    want_linv = j_tot >= 512
    hp = jax.lax.Precision.HIGHEST
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False

    def _linv(l):
        if on_tpu and j_tot >= 1024 and j_tot % 256 == 0:
            from gpis_tpu.linalg.pallas_chol import pallas_blocked_linv

            return pallas_blocked_linv(l, 256)
        return lin.blocked_linv(l, 512 if j_tot % 512 == 0 else j_tot)

    itemsize = jnp.dtype(dtype).itemsize
    retain = (not want_linv if retain_chol is None
              else (retain_chol or not want_linv))
    if retain_chol is None and want_linv:
        retain = 2 * e * j_tot * j_tot * itemsize <= 4_000_000_000

    tx0 = jnp.zeros((t, 3), dtype) if t else None
    tn0 = jnp.full((t,), pad_noise, dtype) if t else None

    @jax.jit
    def _fit_program(xs, ys, nfs, ngs, nrms):
        def one(args):
            xe, ye, nfe, nge, nrme = args
            k = kd.joint_gram(kernel, xe, params_cast, noise_f=nfe,
                              noise_g=nge, touch_x=tx0, touch_noise=tn0)
            l = lin.cholesky(k)
            yj = kd.joint_targets(ye, nrme)
            if t:
                yj = jnp.concatenate([yj, jnp.zeros((t,), dtype)])
            if not want_linv:
                return {"diag": jnp.diagonal(l), "l": l,
                        "alpha": lin.cho_solve(l, yj)}
            w = _linv(l)
            # Newton-refined W — same rationale as the value committee
            # (docs/PERF.md rule 7: rBCM weights cannot tolerate the raw
            # Pallas inverse's O(eps·κ) absolute quad error).
            eye = jnp.eye(j_tot, dtype=w.dtype)
            r = eye - _mm(l, w, precision=hp)
            w = jnp.tril(w + _mm(w, r, precision=hp))
            alpha = _mm(w.T, _mm(w, yj, precision=hp), precision=hp)
            out = {"diag": jnp.diagonal(l), "w": w, "alpha": alpha}
            if retain:
                out["l"] = l
            return out

        return jax.lax.map(one, (xs, ys, nfs, ngs, nrms))

    extra = np.zeros((e,), np.float64)
    out = None
    for attempt in range(max_jitter_retries + 1):
        ej = jnp.asarray(extra, dtype)[:, None]
        out = None  # release the failed attempt's stacks before refitting
        out = _fit_program(xs, ys, nfs + ej, ngs + ej, nrms)
        bad = np.asarray(jnp.isnan(out["diag"]).any(axis=1))
        if not bad.any():
            break
        extra[bad] = jitter * (10.0 ** attempt)
    else:
        raise FloatingPointError(
            f"joint expert Cholesky failed even with jitter {extra.max():.2e}"
        )

    ej = jnp.asarray(extra, dtype)[:, None]
    return ExpertGPModel(
        x=xs,
        y=ys,
        noise=nfs + ej,
        params=params_cast,
        chol=out.get("l"),
        alpha=out["alpha"],
        linv=out.get("w"),
        n_touch=jnp.zeros((e,), jnp.int32),
        centroids=jnp.asarray(centroids, dtype),
        kernel=kernel,
        n0=c,
        pad_noise=pad_noise,
        beta=beta,
        gate=int(gate),
        normals=nrms,
        noise_g=ngs + ej,
        touch_x=jnp.zeros((e, t, 3), dtype) if t else None,
        touch_y=jnp.zeros((e, t), dtype) if t else None,
        touch_noise=jnp.full((e, t), pad_noise, dtype) if t else None,
    )


def expert_chol(model: ExpertGPModel, e: int) -> jax.Array:
    """Expert e's Cholesky factor — the stored stack when retained, else
    one on-demand refactor (touch updates on a chol=None large committee:
    one B³/3 Pallas factorization beats holding E of them in HBM)."""
    if model.chol is not None:
        return model.chol[e]
    if model.joint:
        from gpis_tpu.kernels import derivative as kd

        k = kd.joint_gram(model.kernel, model.x[e], model.params,
                          noise_f=model.noise[e], noise_g=model.noise_g[e],
                          touch_x=(None if model.touch_x is None
                                   else model.touch_x[e]),
                          touch_noise=(None if model.touch_noise is None
                                       else model.touch_noise[e]))
        return lin.cholesky(k)
    k = kg.gram(model.kernel, model.x[e], model.params, noise=model.noise[e])
    return lin.cholesky(k)


def expert_view(model: ExpertGPModel, e: int):
    """Expert e as a plain single-expert model (GPModel, or DerivGPModel
    for a joint committee) — reuses the single-model update/tests."""
    if model.joint:
        from gpis_tpu.gp.derivative import DerivGPModel

        return DerivGPModel(
            x=model.x[e], y=model.y[e], normals=model.normals[e],
            noise_f=model.noise[e], noise_g=model.noise_g[e],
            params=model.params, chol=expert_chol(model, e),
            alpha=model.alpha[e], kernel=model.kernel, n0=model.n0,
            linv=None if model.linv is None else model.linv[e],
            touch_x=None if model.touch_x is None else model.touch_x[e],
            touch_y=None if model.touch_y is None else model.touch_y[e],
            touch_noise=(None if model.touch_noise is None
                         else model.touch_noise[e]),
            n_touch=None if model.touch_x is None else model.n_touch[e],
        )
    return GPModel(
        x=model.x[e], y=model.y[e], noise=model.noise[e], params=model.params,
        chol=expert_chol(model, e), alpha=model.alpha[e],
        n_touch=model.n_touch[e], kernel=model.kernel, n0=model.n0,
        pad_noise=model.pad_noise,
        linv=None if model.linv is None else model.linv[e],
    )


# ----------------------------------------------------------------- combine


_FLOOR_SCALE = float(os.environ.get("GPIS_EXPERT_FLOOR_SCALE", "0.5"))


def _beta_weights(var, k0, mode: str, dt, capacity: int = 4):
    """Committee weights from clamped expert variances. Returns (beta, vc).

    The lower clamp is a dtype/size-aware quad-noise floor
    `eps·B·_FLOOR_SCALE·k0`: the posterior quadratic form ||W kq||² on the
    f32 TPU path carries absolute error, so a raw expert variance below the
    floor is numerical noise — and because (r)BCM SUMS expert precisions,
    E experts clamped at a too-small floor combine into an absurdly
    overconfident posterior (measured on-chip r3: 2.9e-7 "variance" at a
    point whose true posterior variance is 4e-4).  The r3 formula used
    scale 4.0 (the worst-case pre-Newton bound), which at 100k-class
    per-expert capacities EXCEEDS the committee's intrinsic seam error and
    became the accuracy ceiling (measured r4: RMSE tracked the floor —
    E=16/B=7168 floor 3.4e-3 → RMSE 3.1e-3; E=8/B=13312 floor 6.3e-3 →
    RMSE 5.2e-3).  The Newton-refined W's measured quad error is ~1e-6 at
    B=1280 (docs/PERF.md rule 7), so the default scale is now 0.5 —
    ~75x above the measured error at that size, 8x below the old bound
    (GPIS_EXPERT_FLOOR_SCALE overrides).  At f64 the floor never binds."""
    eps = jnp.asarray(jnp.finfo(dt).eps, dt)
    vc = jnp.clip(
        var, k0 * eps * jnp.maximum(16.0, _FLOOR_SCALE * capacity), k0)
    if mode == "bcm":
        return jnp.ones_like(vc), vc
    if mode == "rbcm":
        return 0.5 * (jnp.log(k0) - jnp.log(vc)), vc
    raise ValueError(f"unknown committee rule {mode!r} (use 'rbcm' or 'bcm')")


def _combine(means, varis, k0, mode: str, capacity: int = 4):
    """(G, M) per-expert posteriors -> (M,) committee posterior (BCM/rBCM)."""
    dt = means.dtype
    beta, vc = _beta_weights(varis, k0, mode, dt, capacity)
    s_prec = jnp.sum(beta / vc, axis=0)
    s_beta = jnp.sum(beta, axis=0)
    prec = s_prec + (1.0 - s_beta) / k0
    mean = jnp.sum(beta * means / vc, axis=0) / prec
    return mean, 1.0 / prec


def _expert_cross(kernel, q, x_e, params, joint: bool, tx_e):
    """cov(f(q), expert e's observation columns): plain value cross for the
    value committee, the joint value-row layout (+ tactile tail columns)
    for the config-2 committee."""
    if not joint:
        return kg.cross_cov(kernel, q, x_e, params)
    from gpis_tpu.kernels import derivative as kd

    kq = kd.cross_cov_value(kernel, q, x_e, params)  # (M, 4B)
    if tx_e is not None:
        kq = jnp.concatenate(
            [kq, kg.cross_cov(kernel, q, tx_e, params)], axis=1)
    return kq


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "mode", "use_fused", "use_linv", "joint",
                     "gather"),
)
def _gated_program(kernel, params, x, alpha, fac, qp, sel, k0,
                   mode: str, use_fused: bool, use_linv: bool,
                   joint: bool = False, tx=None, gather: bool = True):
    """ONE dispatch for a whole gated dense-grid query (docs/PERF.md: the
    remote dispatch round-trip dominates unjitted chunk loops).

    qp: (n_chunks, chunk, 3) padded queries; sel: (n_chunks, G) int32 expert
    ids per chunk (host-gated by centroid distance).  Outer lax.map streams
    chunks; per chunk the G gated experts' (B,·) state is gathered from the
    stacked (E,·) leaves and an inner lax.map runs the per-expert posterior
    — the fused Pallas query kernel on TPU (kq in VMEM vs W tiles).
    `joint=True` (config-2 committee) builds the value-query cross against
    each expert's JOINT columns plus tactile tail columns from `tx`."""

    def chunk_fn(args):
        qc, s = args
        if gather:
            xg = jnp.take(x, s, axis=0)  # (G, B, 3)
            ag = jnp.take(alpha, s, axis=0)  # (G, J)
            fg = jnp.take(fac, s, axis=0)  # (G, J, J)
            tg = None if tx is None else jnp.take(tx, s, axis=0)  # (G, T, 3)
        else:
            # gate == E: gathering would materialize a full COPY of the
            # stacked factors next to the stack itself (2x peak HBM —
            # OOM'd the E=8 x B=14336 committee).  Use the leaves as-is.
            xg, ag, fg, tg = x, alpha, fac, tx

        def one(arg):
            if tx is None:
                xe, ae, fe = arg
                txe = None
            else:
                xe, ae, fe, txe = arg
            if use_fused and joint:
                from gpis_tpu.kernels.pallas_joint import (
                    fused_joint_query_pallas)

                mean, quad = fused_joint_query_pallas(
                    kernel, qc, xe, params, ae, fe, touch_x=txe)
                return mean, k0 - quad
            if use_fused:
                from gpis_tpu.kernels.pallas_query import fused_query_pallas

                mean, quad = fused_query_pallas(kernel, qc, xe, params, ae, fe)
                return mean, k0 - quad
            kq = _expert_cross(kernel, qc, xe, params, joint, txe)
            hp = jax.lax.Precision.HIGHEST
            mean = _mm(kq, ae, precision=hp)
            if use_linv:
                v = _mm(fe, kq.T, precision=hp)
            else:
                v = lin.solve_lower(fe, kq.T)
            return mean, k0 - jnp.sum(v * v, axis=0)

        operands = (xg, ag, fg) if tx is None else (xg, ag, fg, tg)
        means, varis = jax.lax.map(one, operands)
        return _combine(means, varis, k0, mode, x.shape[1])

    return jax.lax.map(chunk_fn, (qp, sel))


def _stats_all(model: ExpertGPModel, q):
    """All-expert (means, vars) — traceable (no host gating), used by
    predict_mean under jit/grad and by small query batches."""
    k0 = kf.k_diag0(model.kernel, model.params)
    hp = jax.lax.Precision.HIGHEST
    joint = model.joint

    def one(x_e, alpha_e, fac_e, tx_e=None):
        kq = _expert_cross(model.kernel, q, x_e, model.params, joint, tx_e)
        mean = _mm(kq, alpha_e, precision=hp)
        if model.linv is not None:
            v = _mm(fac_e, kq.T, precision=hp)
        else:
            v = lin.solve_lower(fac_e, kq.T)
        return mean, k0 - jnp.sum(v * v, axis=0)

    fac = model.linv if model.linv is not None else model.chol
    if joint and model.touch_x is not None:
        return jax.vmap(one)(model.x, model.alpha, fac, model.touch_x)
    return jax.vmap(one)(model.x, model.alpha, fac)


def predict(model: ExpertGPModel, q, *, gate: int | None = None,
            chunk: int = 8192):
    """Committee posterior (mean, var) at queries q (M, 3).

    Concrete (host-known) q of dense-grid size is chunked and *gated*: each
    chunk is evaluated only against its `gate` nearest experts by centroid
    distance (gate=0 or None-with-model.gate-0 = all experts).  Skipped
    experts are exactly the prior term of the BCM precision formula (their
    rBCM beta → 0).  Traced q (inside jit/vmap/grad) takes the ungated
    vmapped path."""
    gate = model.gate if gate is None else gate
    e = model.n_experts
    k0 = kf.k_diag0(model.kernel, model.params)
    g = e if gate <= 0 else min(gate, e)
    if isinstance(q, jax.core.Tracer) or (
        g == e and 0 < q.shape[0] * model.capacity * e < 1 << 24
    ):
        means, varis = _stats_all(model, q)
        return _combine(means, varis, k0, model.beta, model.capacity)

    q_host = np.asarray(q)
    cent = np.asarray(model.centroids)
    m = q_host.shape[0]
    chunk = min(chunk, max(256, m))
    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m
    qp = jnp.pad(jnp.asarray(q), ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
    # Host-side gating (no device sync — the grid and centroids are both
    # host-known): per chunk, the G experts nearest by min centroid distance.
    d = ((q_host[:, None, :] - cent[None, :, :]) ** 2).sum(-1)  # (M, E)
    d = np.pad(d, ((0, pad), (0, 0)), constant_values=np.inf)
    d = d.reshape(n_chunks, chunk, e).min(1)  # (n_chunks, E)
    sel = np.argsort(d, axis=1, kind="stable")[:, :g].astype(np.int32)
    ev0 = expert_view(model, 0)
    if model.joint:
        from gpis_tpu.gp import derivative as gpd

        use_fused = model.linv is not None and gpd._use_fused_joint_query(
            ev0, qp[0])
    else:
        use_fused = model.linv is not None and gpr._use_fused_query(
            ev0, qp[0])
    fac = model.linv if model.linv is not None else model.chol
    mean, var = _gated_program(
        model.kernel, model.params, model.x, model.alpha, fac, qp,
        jnp.asarray(sel), jnp.asarray(k0, model.dtype), model.beta,
        use_fused, model.linv is not None, joint=model.joint,
        tx=model.touch_x if model.joint else None, gather=g < e,
    )
    return mean.ravel()[:m], var.ravel()[:m]


def predict_mean(model: ExpertGPModel, q):
    """Committee posterior mean — differentiable in q (Newton projection
    uses jax.grad of this; the combine is smooth in q through the expert
    means AND variances)."""
    means, varis = _stats_all(model, q)
    k0 = kf.k_diag0(model.kernel, model.params)
    return _combine(means, varis, k0, model.beta, model.capacity)[0]


# ------------------------------------------------------------ sharded (EP)


def predict_sharded(model: ExpertGPModel, q, mesh, *, axis: str = "expert"):
    """Committee posterior under `shard_map` over the expert axis: each
    device evaluates its local experts' (beta/var, beta*mean/var, beta)
    partial sums and three `psum`s ride ICI — textbook expert parallelism
    (SURVEY.md §3 parallelism table, EP row).  Leaves placed with
    `shard_experts`; q is replicated."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    k0 = kf.k_diag0(model.kernel, model.params)
    mode = model.beta
    kernel, params = model.kernel, model.params
    use_linv = model.linv is not None
    fac = model.linv if use_linv else model.chol
    joint = model.joint
    has_touch = joint and model.touch_x is not None

    def local(xs, alphas, facs, txs, qq):
        def one(x_e, alpha_e, fac_e, tx_e):
            kq = _expert_cross(kernel, qq, x_e, params, joint,
                               tx_e if has_touch else None)
            mean = kq @ alpha_e
            v = (fac_e @ kq.T) if use_linv else lin.solve_lower(fac_e, kq.T)
            return mean, k0 - jnp.sum(v * v, axis=0)

        means, varis = jax.vmap(one)(xs, alphas, facs, txs)
        beta, vc = _beta_weights(varis, k0, mode, means.dtype, xs.shape[1])
        s_prec = jax.lax.psum(jnp.sum(beta / vc, axis=0), axis)
        s_mean = jax.lax.psum(jnp.sum(beta * means / vc, axis=0), axis)
        s_beta = jax.lax.psum(jnp.sum(beta, axis=0), axis)
        prec = s_prec + (1.0 - s_beta) / k0
        return s_mean / prec, 1.0 / prec

    # txs rides along even for value committees (a tiny dummy) so the
    # shard_map signature stays fixed.
    txs = (model.touch_x if has_touch
           else jnp.zeros((model.n_experts, 1, 3), model.dtype))
    sm = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(sm)(model.x, model.alpha, fac, txs, q)


def shard_experts(model: ExpertGPModel, mesh, *, axis: str = "expert"):
    """Place the stacked (E, …) leaves expert-sharded on `mesh` (fit stays
    embarrassingly parallel; predict_sharded then runs the combine on-mesh)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis))
    put = lambda a: jax.device_put(a, sh) if a is not None else None
    return dataclasses.replace(
        model, x=put(model.x), y=put(model.y), noise=put(model.noise),
        chol=put(model.chol), alpha=put(model.alpha), linv=put(model.linv),
        n_touch=put(model.n_touch), normals=put(model.normals),
        noise_g=put(model.noise_g), touch_x=put(model.touch_x),
        touch_y=put(model.touch_y), touch_noise=put(model.touch_noise),
    )


# ---------------------------------------------------------------- hyperopt


def optimize_experts(
    model: ExpertGPModel,
    *,
    learn_noise: bool = True,
    learn_signal: bool = False,
    steps: int = 100,
    learning_rate: float = 0.05,
):
    """Full-data hyperparameter optimization for the committee: maximize
    the PRODUCT-OF-EXPERTS objective sum_e log p(y_e | X_e, theta) — the
    standard distributed-GP training objective [Deisenroth & Ng, ICML
    2015]: the factorized likelihood the committee actually deploys, using
    ALL rows (vs the session's subsample fallback).  One jitted lax.map
    program evaluates every expert's MLL (custom-VJP Gram assembly +
    blocked-Cholesky AD via `gpr.log_marginal_likelihood`), so the
    gradient is one compiled graph over the stacked (E, B, ...) leaves.

    Caveat (documented, standard for PoE training): the shared GPIS
    anchor rows appear in every expert, so their likelihood contribution
    is counted E times; they are O(10-100) rows against O(B) surface rows
    per expert and carry their own noise, so the bias on (ls, noise_scale,
    sv) is second-order.

    The noise scale applies to real rows only (noise < pad_noise / 2 —
    pad AND occupied-touch rows keep their stored noise: touches arrive
    with their own calibrated noise and may already ride a jitter ladder).
    Returns a `gp.hyperopt.HyperoptResult` (params, noise_scale, history,
    mll)."""
    import optax

    from gpis_tpu.gp.hyperopt import HyperoptResult

    if model.joint:
        raise ValueError(
            "optimize_experts' PoE objective covers value-observation "
            "committees; for a joint (normals) committee use the session's "
            "subsample hyperopt (gp.hyperopt.optimize_joint on a core "
            "subsample), which pins the shared hyperparameters the same way"
        )
    dt = model.dtype
    xs, ys, ns = model.x, model.y, model.noise
    n0 = model.n0
    # Real fit rows: finite noise in the leading [0, n0) block.
    real = (ns < 0.5 * model.pad_noise) & (jnp.arange(ns.shape[1])[None, :] < n0)
    kernel = model.kernel
    init = model.params

    theta0 = {"log_ls": jnp.log(jnp.asarray(init["lengthscale"], dt))}
    if learn_signal:
        theta0["log_sv"] = jnp.log(jnp.asarray(init["signal_variance"], dt))
    if learn_noise:
        theta0["log_noise_scale"] = jnp.zeros((), dt)

    def unpack(theta):
        params = {
            "lengthscale": jnp.exp(theta["log_ls"]),
            "signal_variance": (
                jnp.exp(theta["log_sv"]) if learn_signal
                else jnp.asarray(init["signal_variance"], dt)
            ),
        }
        scale = jnp.exp(theta.get("log_noise_scale", jnp.zeros((), dt)))
        return params, jnp.where(real, ns * scale, ns)

    def loss(theta):
        params, noise = unpack(theta)

        def one(args):
            xe, ye, ne = args
            return gpr.log_marginal_likelihood(kernel, xe, ye, ne, params)

        return -jnp.sum(jax.lax.map(one, (xs, ys, noise)))

    opt = optax.adam(learning_rate)

    @jax.jit
    def step(theta, opt_state):
        val, g = jax.value_and_grad(loss)(theta)
        updates, opt_state = opt.update(g, opt_state, theta)
        return optax.apply_updates(theta, updates), opt_state, val

    theta, opt_state = theta0, opt.init(theta0)
    history, best_theta, best_val = [], theta0, jnp.inf
    for _ in range(steps):
        new_theta, opt_state, val = step(theta, opt_state)
        v = float(val)
        history.append(-v)
        if v < best_val:
            best_theta, best_val = theta, v
        theta = new_theta

    params, _ = unpack(best_theta)
    scale = jnp.exp(best_theta.get("log_noise_scale", jnp.zeros((), dt)))
    return HyperoptResult(
        params={k: jnp.asarray(v) for k, v in params.items()},
        noise=None,
        noise_scale=scale,
        history=history,
        mll=-float(best_val),
    )


# ------------------------------------------------------------------ update


def update(model: ExpertGPModel, new_x, new_y, new_noise,
           *, max_jitter_retries: int = 6) -> ExpertGPModel:
    """Tactile update: each touch point is routed to its nearest expert by
    centroid distance and appended through the *exact* single-model
    bordering update (`gp.regression.update`) on that expert's factor —
    O(B·T²) per touched expert, other experts untouched.

    The bordered Schur complement can go indefinite on the f32 TPU path
    (the Pallas W carries quad error beyond `gpr.update`'s dtype floor at
    small per-expert capacities), so the touch noise rides the same
    escalation ladder the fit uses: on a NaN factor, retry with 10× the
    floored noise."""
    new_x = np.asarray(new_x)
    if new_x.shape[0] == 0:
        return model
    dt = model.dtype
    new_y = np.broadcast_to(np.asarray(new_y, dt), (new_x.shape[0],))
    new_noise = np.broadcast_to(np.asarray(new_noise, dt), (new_x.shape[0],))
    cent = np.asarray(model.centroids)
    route = ((new_x[:, None, :] - cent[None, :, :]) ** 2).sum(-1).argmin(1)

    eps = float(jnp.finfo(dt).eps)
    k0 = float(kf.k_diag0(model.kernel, model.params))
    floor = 4.0 * eps * model.capacity * abs(k0)
    n0 = model.n0
    joint = model.joint
    if joint and model.touch_x is None:
        raise ValueError(
            "this joint committee was fitted with touch_capacity=0; refit "
            "with tactile slots to take touch updates"
        )
    for e in np.unique(route):
        sel = route == e
        base = np.maximum(new_noise[sel], floor)
        ev = expert_view(model, int(e))  # one factor recompute if chol=None
        prev = int(model.n_touch[int(e)])
        if joint and prev + int(sel.sum()) > model.touch_capacity:
            raise ValueError(
                f"expert {int(e)}'s joint tactile slots would overflow "
                f"({prev}+{int(sel.sum())} > {model.touch_capacity}); refit "
                "the committee folding the accumulated touches (session "
                "hyperopt refit does this) or raise touch_capacity"
            )
        # The joint tail rows sit at [4*n0, 4*n0 + T); value slots inside
        # the point rows at [n0, B).
        t0 = 4 * n0 if joint else n0
        for attempt in range(max_jitter_retries + 1):
            noise_a = base * (10.0 ** attempt)
            args = (ev, jnp.asarray(new_x[sel], dt),
                    jnp.asarray(new_y[sel], dt), jnp.asarray(noise_a, dt))
            if joint:
                from gpis_tpu.gp import derivative as gpd

                m_e = gpd.update_joint(*args)
            else:
                m_e = gpr.update(*args)
            # Accept only a WELL-CONDITIONED bordered factor: the Schur
            # diagonal of a touch row is noise + (k0 - ||l21||^2) and can
            # come out barely positive when the f32 quad error exceeds the
            # noise — finite but garbage (w22 = 1/l22 blows up and the
            # posterior mean moves AWAY from the observation; reproduced
            # on-chip).  diag^2 >= noise/4 is the honest bound: the true
            # Schur is >= the noise the row carries.
            occ = int(m_e.n_touch)
            d = np.asarray(jnp.diagonal(m_e.chol))
            d_new = d[t0 + prev:t0 + occ]
            if (not np.isnan(d[t0:t0 + occ]).any()
                    and (d_new * d_new >= 0.25 * noise_a.min()).all()):
                break
        else:
            raise FloatingPointError(
                f"expert {int(e)} touch bordering failed even with noise "
                f"{float(base.max()) * 10.0 ** max_jitter_retries:.2e}"
            )
        ei = int(e)
        rep = dict(
            chol=(None if model.chol is None
                  else model.chol.at[ei].set(m_e.chol)),
            alpha=model.alpha.at[ei].set(m_e.alpha),
            linv=(None if model.linv is None
                  else model.linv.at[ei].set(m_e.linv)),
            n_touch=model.n_touch.at[ei].set(m_e.n_touch),
        )
        if joint:
            rep.update(
                touch_x=model.touch_x.at[ei].set(m_e.touch_x),
                touch_y=model.touch_y.at[ei].set(m_e.touch_y),
                touch_noise=model.touch_noise.at[ei].set(m_e.touch_noise),
            )
        else:
            rep.update(
                x=model.x.at[ei].set(m_e.x),
                y=model.y.at[ei].set(m_e.y),
                noise=model.noise.at[ei].set(m_e.noise),
            )
        model = dataclasses.replace(model, **rep)
    return model
