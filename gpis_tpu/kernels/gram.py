"""Dense Gram / cross-covariance assembly in pure jnp (reference C1/C2 hot
loop #1, SURVEY.md §4.1: `K[i,j] = k(||xi - xj||)`, O(N^2)).

This is the trusted XLA-fused baseline; `gpis_tpu.kernels.pallas_gram`
provides the tiled Pallas version of the same math, verified against this
module tile-for-tile (SURVEY.md §5 item 3).

For 3-D point clouds the pairwise squared distance is computed per
coordinate with broadcasting (3 fused subtract-square-accumulate sweeps on
the VPU) rather than via the `||x||^2 + ||x'||^2 - 2 x.x'` matmul identity:
with K=3 the matmul cannot tile the MXU efficiently, and the direct form is
exact (no cancellation), which matters for the 1e-6 parity bar
(BASELINE.md row 2).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpis_tpu.kernels import functions as kf

__all__ = ["pairwise_r2", "gram", "gram_reference", "cross_cov", "add_noise_diag"]


def pairwise_r2(x, z):
    """Pairwise squared distances. x: (N,3), z: (M,3) -> (N,M)."""
    d = x[:, None, :] - z[None, :, :]
    return jnp.sum(d * d, axis=-1)


def gram(name: str, x, params, noise=None):
    """Symmetric Gram matrix K(X,X) [+ diag(noise)].

    noise: scalar or (N,) per-point observation variances (the GPIS builder
    assigns different noise to surface/internal/external points; SURVEY.md §3
    C3).  Large matrices on TPU dispatch to the tiled Pallas kernel."""
    n = x.shape[0]
    if n * n >= 1 << 22 and noise is not None:
        try:
            import jax

            if jax.default_backend() == "tpu":
                from gpis_tpu.kernels import pallas_gram as pg

                return pg.gram_pallas(
                    name, x, params,
                    jnp.broadcast_to(jnp.asarray(noise, x.dtype), (n,)),
                )
        except Exception:
            pass
    return gram_reference(name, x, params, noise=noise)


def gram_reference(name: str, x, params, noise=None):
    """Pure-jnp Gram (always differentiable — the MLL/hyperopt path uses
    this form so AD never meets the Pallas kernel)."""
    k = kf.k_r2(name, pairwise_r2(x, x), params)
    # Exact k(0) on the diagonal (thin-plate's r2=0 sqrt clamp is below fp
    # noise, but setting the diagonal explicitly keeps parity bit-clean).
    n = x.shape[0]
    k = jnp.where(jnp.eye(n, dtype=bool), kf.k_diag0(name, params).astype(k.dtype), k)
    if noise is not None:
        k = k + jnp.diag(jnp.broadcast_to(jnp.asarray(noise, k.dtype), (n,)))
    return k


def cross_cov(name: str, q, x, params):
    """Cross-covariance K(Q, X): q (M,3) queries vs x (N,3) training points.

    On TPU, large blocks dispatch to the tiled Pallas kernel (fused
    distance+covariance, no (M,N,3) broadcast intermediate in HBM); small
    blocks and other backends use the direct jnp form.  Both are
    tile-compared in tests (SURVEY.md §5 item 3)."""
    m, n = q.shape[0], x.shape[0]
    if m * n >= 1 << 22:  # ~4M elements: broadcast temps start to matter
        try:
            import jax

            if jax.default_backend() == "tpu":
                from gpis_tpu.kernels import pallas_gram as pg

                return pg.cross_cov_pallas(name, q, x, params)
        except Exception:
            pass
    return kf.k_r2(name, pairwise_r2(q, x), params)


def add_noise_diag(k, noise):
    n = k.shape[0]
    return k + jnp.diag(jnp.broadcast_to(jnp.asarray(noise, k.dtype), (n,)))
