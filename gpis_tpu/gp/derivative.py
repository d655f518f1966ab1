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

from gpis_tpu.gp.model import round_up
from gpis_tpu.kernels import derivative as kd
from gpis_tpu.kernels import functions as kf
from gpis_tpu.linalg import cholesky as lin

__all__ = ["DerivGPModel", "fit_with_normals", "predict", "predict_gradient"]


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
    # W = chol^{-1} (4C, 4C): the GEMM variance path (with_linv_joint) —
    # XLA's triangular solve runs ~1 TFLOP/s on TPU and OOMs at 4C ~ 16k+.
    linv: jax.Array | None = None

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

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
    pad_noise: float = 1e10,
    dtype=None,
    max_jitter_retries: int = 6,
) -> DerivGPModel:
    """Fit on (x, y, normals). Normal observations use the GPIS convention
    that grad f on the surface equals the outward unit normal (the field
    grows ~linearly from -1 inside to +1 outside)."""
    dtype = dtype or x.dtype
    n = x.shape[0]
    c = round_up(n, block)
    xp = jnp.zeros((c, 3), dtype).at[:n].set(x.astype(dtype))
    yp = jnp.zeros((c,), dtype).at[:n].set(y.astype(dtype))
    npf = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise_f, dtype), (n,)))
    npg = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise_g, dtype), (n,)))
    nrm = jnp.zeros((c, 3), dtype).at[:n].set(normals.astype(dtype))
    params = {k: jnp.asarray(v, dtype) for k, v in params.items()}

    eps = float(jnp.finfo(dtype).eps)
    k0 = float(kf.k_diag0(kernel, params))
    jitter0 = 4.0 * eps * 4 * c * abs(k0)
    extra = 0.0
    for attempt in range(max_jitter_retries + 1):
        k = kd.joint_gram(kernel, xp, params, noise_f=npf + extra, noise_g=npg + extra)
        l = lin.cholesky(k)
        if not bool(jnp.isnan(jnp.diagonal(l)).any()):
            break
        extra = jitter0 * (10.0**attempt)
    else:
        raise FloatingPointError("joint Cholesky failed even with jitter")
    alpha = lin.cho_solve(l, kd.joint_targets(yp, nrm))
    return DerivGPModel(
        x=xp, y=yp, normals=nrm, noise_f=npf, noise_g=npg, params=params,
        chol=l, alpha=alpha, kernel=kernel, n0=c,
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


def predict(model: DerivGPModel, q):
    """Posterior mean and variance of f at q (M, 3)."""
    kq = kd.cross_cov_value(model.kernel, q, model.x, model.params)  # (M, 4C)
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
    g = jnp.dot(kg_, model.alpha, precision=jax.lax.Precision.HIGHEST)  # (3M,)
    return jnp.stack([g[:m], g[m : 2 * m], g[2 * m :]], axis=1)
