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

import functools

import jax
import jax.numpy as jnp

from gpis_tpu.kernels import functions as kf

__all__ = ["pairwise_r2", "gram", "gram_reference", "gram_ad", "cross_cov",
           "add_noise_diag"]


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


def _gram_band_rows(name, x_band, x, params, noise_band, row0):
    """Row band [row0, row0+B) of gram_reference — the jvp target of
    gram_ad's pullback (per-band (B, C, 3) temps instead of (C, C, 3))."""
    b, c = x_band.shape[0], x.shape[0]
    k = kf.k_r2(name, pairwise_r2(x_band, x), params)
    cols = jnp.arange(c)[None, :]
    rows = row0 + jnp.arange(b)[:, None]
    diag = cols == rows
    k = jnp.where(diag, kf.k_diag0(name, params).astype(k.dtype), k)
    if noise_band is not None:
        k = jnp.where(diag, k + noise_band[:, None], k)
    return k


@functools.lru_cache(maxsize=None)
def _gram_ad_fn(name: str, band: int):
    @jax.custom_vjp
    def f(x, params, noise):
        return gram(name, x, params, noise)

    def fwd(x, params, noise):
        return gram(name, x, params, noise), (x, params, noise)

    def bwd(res, kbar):
        x, params, noise = res
        c = x.shape[0]
        nb = c // band
        dt = x.dtype
        noise_v = jnp.broadcast_to(jnp.asarray(noise, dt), (c,))
        keys = sorted(params)

        def body(i, carry):
            gx, gp = carry
            r0 = i * band
            xb = jax.lax.dynamic_slice(x, (r0, 0), (band, 3))
            kb = jax.lax.dynamic_slice(kbar, (r0, 0), (band, c))
            kbt = jax.lax.dynamic_slice(kbar, (0, r0), (c, band)).T
            sym = kb + kbt  # <dK, Kbar>: K is assembled full, both triangles
            # x-cotangent: dK_ij/dx_i = 2 dk/dr2 (x_i - x_j); the pinned
            # diagonal is x-independent and diff_ii = 0 kills it anyway.
            d = xb[:, None, :] - x[None, :, :]
            r2 = jnp.sum(d * d, axis=-1)
            dk = kf.dk_dr2(name, r2, params)
            gx_b = jnp.einsum("bc,bcd->bd", sym * dk * 2.0, d)
            gx = jax.lax.dynamic_update_slice(gx, gx_b.astype(dt), (r0, 0))
            # param cotangents: one jvp per param key (elementwise VPU work,
            # O(B*C) per band — the whole pullback never holds a (C, C, 3)).
            nb_band = jax.lax.dynamic_slice(noise_v, (r0,), (band,))

            def band_of(prm):
                return _gram_band_rows(name, xb, x, prm, nb_band, r0)

            for ki, key in enumerate(keys):
                tang = {k2: jnp.ones_like(params[k2]) if k2 == key
                        else jnp.zeros_like(params[k2]) for k2 in keys}
                _, dkp = jax.jvp(band_of, (params,), (tang,))
                gp = gp.at[ki].add(jnp.sum(kb * dkp))
            return gx, gp

        gx0 = jnp.zeros_like(x)
        gp0 = jnp.zeros((len(keys),), dt)
        gx, gp = jax.lax.fori_loop(0, nb, body, (gx0, gp0))
        g_params = {k2: gp[i].astype(jnp.asarray(params[k2]).dtype)
                    for i, k2 in enumerate(keys)}
        g_noise = jnp.diagonal(kbar)
        if jnp.ndim(noise) == 0:
            g_noise = jnp.sum(g_noise)
        return gx, g_params, g_noise

    f.defvjp(fwd, bwd)
    return f


def gram_ad(name: str, x, params, noise, *, band: int = 1024):
    """Differentiable Gram with an O(band x C) pullback (VERDICT r2 weak 3).

    `gram_reference` under AD materializes the (C, C, 3) difference tensor
    in the residual graph (~3 GB at 16k f32) on every optimizer step; this
    custom-VJP version runs the Pallas-dispatched `gram` as the primal and
    reconstructs cotangents band-by-band: params via jvp of the band
    assembly, noise via diag(Kbar), x via the closed-form
    dK_ij/dx_i = 2 dk/dr2 (x_i - x_j).  Exact VJP — parity vs jax.grad of
    gram_reference in tests/test_gram_ad.py."""
    c = x.shape[0]
    b = band if c % band == 0 else c
    return _gram_ad_fn(name, b)(x, params, noise)


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
