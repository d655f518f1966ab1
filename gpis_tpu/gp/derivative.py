"""GP regression with derivative (surface-normal) observations (BASELINE
config 2).  The reference reaches the same end — surface orientation
constraining the implicit surface — through its derivative-capable kernel
functors (SURVEY.md §3 C1); here normals are first-class observations in a
joint 4C x 4C system.

Same capacity-padding scheme as the value-only model (gpis_tpu.gp.model):
padding rows get huge noise on value AND gradient slots, staying inert.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gpis_tpu.gp.model import align_capacity, round_up
from gpis_tpu.kernels import derivative as kd
from gpis_tpu.kernels import functions as kf
from gpis_tpu.linalg import cholesky as lin

__all__ = ["DerivGPModel", "fit_with_normals", "predict", "predict_gradient",
           "update_joint", "with_linv_joint", "joint_cross_value"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DerivGPModel:
    """Exact GP with value + gradient observations. Capacity C points ->
    joint system size 4C."""

    x: jax.Array  # (C, 3)
    y: jax.Array  # (C,) value targets
    normals: jax.Array  # (C, 3) gradient targets (zero rows where absent)
    noise_f: jax.Array  # (C,)
    noise_g: jax.Array  # (C,)
    params: dict
    chol: jax.Array  # (4C, 4C)
    alpha: jax.Array  # (4C,)
    kernel: str = dataclasses.field(metadata=dict(static=True))
    n0: int = dataclasses.field(metadata=dict(static=True))
    # W = chol^{-1} (J, J): the GEMM variance path (with_linv_joint) —
    # XLA's triangular solve runs ~1 TFLOP/s on TPU and OOMs at 4C ~ 16k+.
    linv: jax.Array | None = None
    # Tactile touch slots: value-only observations at extra points,
    # occupying joint rows [4C, 4C+T) (the tail of the chol/alpha system).
    # None on models fitted with touch_capacity=0 (J = 4C exactly).
    touch_x: jax.Array | None = None      # (T, 3)
    touch_y: jax.Array | None = None      # (T,)
    touch_noise: jax.Array | None = None  # (T,)
    n_touch: jax.Array | None = None      # () int32 occupancy

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def touch_capacity(self) -> int:
        return 0 if self.touch_x is None else self.touch_x.shape[0]

    @property
    def dtype(self):
        return self.x.dtype

    @property
    def noise(self):
        """Value-observation noise (alias so the planner/session treat both
        model types uniformly)."""
        return self.noise_f


def fit_with_normals(
    kernel: str,
    x,
    y,
    normals,
    noise_f,
    noise_g,
    params,
    *,
    block: int = 64,
    touch_capacity: int = 0,
    pad_noise: float = 1e10,
    dtype=None,
    max_jitter_retries: int = 6,
) -> DerivGPModel:
    """Fit on (x, y, normals). Normal observations use the GPIS convention
    that grad f on the surface equals the outward unit normal (the field
    grows ~linearly from -1 inside to +1 outside).

    touch_capacity > 0 preallocates T value-only tactile slots at the
    JOINT TAIL (rows [4C, 4C+T) of the chol/alpha system, slot points at
    the origin with pad noise — inert, see gp.model), so `update_joint`
    can border them in O(T·J²) instead of refitting O(J³)."""
    dtype = dtype or x.dtype
    n = x.shape[0]
    c = round_up(n, block)
    t = round_up(touch_capacity, block) if touch_capacity else 0
    if 4 * c + t >= 4096:
        # MXU-friendly joint size: round C to 256 (4C lands on a 1024
        # multiple) and grow the touch allocation so J = 4C + T keeps the
        # fused joint query kernel's tall TI tile (gp.model.align_capacity).
        c = round_up(c, 256)
        if t:
            t = align_capacity(4 * c + t) - 4 * c
    xp = jnp.zeros((c, 3), dtype).at[:n].set(x.astype(dtype))
    yp = jnp.zeros((c,), dtype).at[:n].set(y.astype(dtype))
    npf = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise_f, dtype), (n,)))
    npg = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise_g, dtype), (n,)))
    nrm = jnp.zeros((c, 3), dtype).at[:n].set(normals.astype(dtype))
    params = {k: jnp.asarray(v, dtype) for k, v in params.items()}
    tx = jnp.zeros((t, 3), dtype) if t else None
    ty = jnp.zeros((t,), dtype) if t else None
    tn = jnp.full((t,), pad_noise, dtype) if t else None

    eps = float(jnp.finfo(dtype).eps)
    k0 = float(kf.k_diag0(kernel, params))
    jitter0 = 4.0 * eps * (4 * c + t) * abs(k0)
    extra = 0.0
    for attempt in range(max_jitter_retries + 1):
        # The whole (4C+T, 4C+T) system assembles in one call (one Pallas
        # launch on TPU); touch slots are inert origin points with pad
        # noise — k(0) off-diagonal among them, same padding semantics as
        # gp.model and the same K the bordering update recomputes.
        k = kd.joint_gram(kernel, xp, params, noise_f=npf + extra,
                          noise_g=npg + extra, touch_x=tx,
                          touch_noise=None if tn is None else tn + extra)
        l = lin.cholesky(k)
        if not bool(jnp.isnan(jnp.diagonal(l)).any()):
            break
        extra = jitter0 * (10.0**attempt)
    else:
        raise FloatingPointError("joint Cholesky failed even with jitter")
    yj = kd.joint_targets(yp, nrm)
    if t:
        yj = jnp.concatenate([yj, ty])
    alpha = lin.cho_solve(l, yj)
    return DerivGPModel(
        x=xp, y=yp, normals=nrm, noise_f=npf, noise_g=npg, params=params,
        chol=l, alpha=alpha, kernel=kernel, n0=c,
        touch_x=tx, touch_y=ty, touch_noise=tn,
        n_touch=jnp.zeros((), jnp.int32) if t else None,
    )


def with_linv_joint(model: DerivGPModel) -> DerivGPModel:
    """Attach W = chol^{-1} for the GEMM variance path (the joint mirror of
    `gp.regression.with_linv`)."""
    j = model.chol.shape[0]
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    if backend == "tpu" and j >= 1024 and j % 256 == 0:
        from gpis_tpu.linalg.pallas_chol import pallas_blocked_linv

        w = pallas_blocked_linv(model.chol, 256)
    else:
        b = 512 if j % 512 == 0 else j
        w = lin.blocked_linv(model.chol, b)
    return dataclasses.replace(model, linv=w)


def joint_cross_value(model: DerivGPModel, q):
    """cov(f(q), [joint obs]): (M, J) — value/gradient core columns plus
    value-only touch columns when the model carries tactile slots."""
    kq = kd.cross_cov_value(model.kernel, q, model.x, model.params)  # (M, 4C)
    if model.touch_x is not None:
        from gpis_tpu.kernels import gram as kg_mod

        kt = kg_mod.cross_cov(model.kernel, q, model.touch_x, model.params)
        kq = jnp.concatenate([kq, kt], axis=1)
    return kq


def _use_fused_joint_query(model: DerivGPModel, q) -> bool:
    """Route to the fused joint query kernel: TPU, W attached, tiled joint
    size, built-in r2-form kernel, and enough work to pay for the launch."""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    j = model.chol.shape[0]
    return (
        backend == "tpu"
        and model.linv is not None
        and model.kernel in kf.KERNEL_NAMES
        and set(model.params) == {"lengthscale", "signal_variance"}
        and j % 256 == 0
        and q.shape[0] * j >= 1 << 22
    )


def predict(model: DerivGPModel, q):
    """Posterior mean and variance of f at q (M, 3).

    On TPU with W = chol^{-1} attached, large queries run the fused Pallas
    kernel (kernels/pallas_joint.py): the (M, J) cross-covariance is
    generated in VMEM against W tiles and never exists in HBM — the joint
    mirror of the value model's fused query path (the round-2 HIGHEST-GEMM
    chain ran ~1 actual TFLOP/s on this backend)."""
    if _use_fused_joint_query(model, q):
        from gpis_tpu.kernels.pallas_joint import fused_joint_query_pallas

        mean, quad = fused_joint_query_pallas(
            model.kernel, q, model.x, model.params, model.alpha, model.linv,
            touch_x=model.touch_x,
        )
        return mean, kf.k_diag0(model.kernel, model.params) - quad
    kq = joint_cross_value(model, q)  # (M, J)
    mean = jnp.dot(kq, model.alpha, precision=jax.lax.Precision.HIGHEST)
    if model.linv is not None:
        v = jnp.dot(model.linv, kq.T, precision=jax.lax.Precision.HIGHEST)
    else:
        v = lin.solve_lower(model.chol, kq.T)
    var = kf.k_diag0(model.kernel, model.params) - jnp.sum(v * v, axis=0)
    return mean, var


def predict_gradient(model: DerivGPModel, q):
    """Posterior mean of grad f at q: (M, 3) — surface normals directly from
    the joint model (no AD needed, though AD gives the same numbers)."""
    m = q.shape[0]
    kg_ = kd.cross_cov_grad(model.kernel, q, model.x, model.params)  # (3M, 4C)
    if model.touch_x is not None:
        kg_ = jnp.concatenate(
            [kg_, kd.cross_cov_grad_value(model.kernel, q, model.touch_x,
                                          model.params)], axis=1)
    g = jnp.dot(kg_, model.alpha, precision=jax.lax.Precision.HIGHEST)  # (3M,)
    return jnp.stack([g[:m], g[m : 2 * m], g[2 * m :]], axis=1)


def update_joint(model: DerivGPModel, new_x, new_y, new_noise) -> DerivGPModel:
    """Append tactile (value-only) points to a joint model's preallocated
    tail slots and re-form only the trailing Cholesky rows [4C, J) — the
    single-chip joint mirror of `gp.regression.update` (reference §4.5).
    Raises on cumulative overflow (occupancy is host-side here)."""
    if model.touch_x is None:
        raise ValueError(
            "model has no touch slots; fit with touch_capacity > 0 "
            "(or refit via the session, which falls back automatically)"
        )
    t = model.touch_capacity
    n4 = 4 * model.capacity
    k_new = new_x.shape[0]
    occ = int(model.n_touch)
    if occ + k_new > t:
        raise ValueError(
            f"cumulative touches {occ + k_new} exceed touch capacity {t}"
        )
    dt = model.dtype
    hi = jax.lax.Precision.HIGHEST
    new_y = jnp.broadcast_to(jnp.asarray(new_y, dt), (k_new,))
    floor = (4.0 * float(jnp.finfo(dt).eps) * (n4 + t)) * kf.k_diag0(
        model.kernel, model.params)
    new_noise = jnp.maximum(jnp.asarray(new_noise, dt), floor.astype(dt))

    tx = model.touch_x.at[occ : occ + k_new].set(new_x.astype(dt))
    ty = model.touch_y.at[occ : occ + k_new].set(new_y)
    tn = model.touch_noise.at[occ : occ + k_new].set(
        jnp.broadcast_to(new_noise, (k_new,)))

    from gpis_tpu.kernels import gram as kg_mod

    k21 = kd.cross_cov_value(model.kernel, tx, model.x, model.params)  # (T, 4C)
    k22 = kg_mod.gram_reference(model.kernel, tx, model.params, noise=tn)
    if model.linv is not None:
        w11 = model.linv[:n4, :n4]
        l21 = jnp.dot(k21, w11.T, precision=hi)
    else:
        l21 = lin.solve_lower(model.chol[:n4, :n4], k21.T).T
    l22 = jnp.linalg.cholesky(k22 - jnp.dot(l21, l21.T, precision=hi))
    chol = model.chol.at[n4:, :n4].set(l21).at[n4:, n4:].set(l22)

    yj = jnp.concatenate([kd.joint_targets(model.y, model.normals), ty])
    linv = None
    if model.linv is not None:
        w21 = -jax.lax.linalg.triangular_solve(
            l22, jnp.dot(l21, w11, precision=hi), left_side=True, lower=True)
        w22 = jax.lax.linalg.triangular_solve(
            l22, jnp.eye(t, dtype=dt), left_side=True, lower=True)
        linv = (model.linv.at[n4:, :n4].set(w21).at[n4:, n4:].set(w22)
                .at[:n4, n4:].set(0.0))
        alpha = jnp.dot(linv.T, jnp.dot(linv, yj, precision=hi), precision=hi)
    else:
        alpha = lin.cho_solve(chol, yj)
    import dataclasses as _dc

    return _dc.replace(
        model, chol=chol, alpha=alpha, linv=linv,
        touch_x=tx, touch_y=ty, touch_noise=tn,
        n_touch=jnp.asarray(occ + k_new, jnp.int32),
    )
