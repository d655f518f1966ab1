"""Derivative-observation covariance blocks (BASELINE config 2; SURVEY.md
§8 step 4: "extend Gram assembly with dk/dx and d2k/dx dx' blocks so surface
normals are observations").

A GP over f with observations of both f(x_i) and grad f(x_i) has the joint
covariance (for kernels k(r2), r2 = ||x - x'||^2):

    cov(f(x),  f(x'))        = k
    cov(f(x),  d_e f(x'))    = -2 dk_dr2 (x - x')_e
    cov(d_d f(x), f(x'))     = +2 dk_dr2 (x - x')_d
    cov(d_d f(x), d_e f(x')) = -2 dk_dr2 δ_de - 4 d2k_dr2 (x-x')_d (x-x')_e

Layout is **dimension-major** (SURVEY.md §8 "hard parts": get the block
layout right early): the joint index space is [f(1..C), d1(1..C), d2(1..C),
d3(1..C)], so the joint Gram is a 4x4 grid of dense C x C blocks — each
block individually tileable by the Pallas kernels, no 4x4 interleaving
inside tiles.  Validated against `jax.jacfwd` of the scalar kernel and the
float64 oracle (tests/test_derivative.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpis_tpu.kernels import functions as kf

__all__ = ["joint_gram", "joint_gram_reference", "cross_cov_value",
           "cross_cov_grad", "cross_cov_grad_value", "joint_targets"]


def _diff_r2(x, z):
    d = x[:, None, :] - z[None, :, :]  # (N, M, 3)
    return d, jnp.sum(d * d, axis=-1)


def joint_gram(name: str, x, params, noise_f=None, noise_g=None,
               touch_x=None, touch_noise=None):
    """(J, J) joint Gram over values+gradients at x (C, 3), dimension-major,
    J = 4C + T with optional trailing value-only touch slots (touch_x (T,3)
    with touch_noise (T,) — the preallocated tactile tail of
    gp/derivative.fit_with_normals).

    noise_f: per-point value-observation variance (C,) or scalar.
    noise_g: per-point gradient-observation variance (shared by the 3 dims).
    """
    if not kf.supports_derivatives(name):
        raise ValueError(f"kernel {name!r} does not support derivative observations")
    c = x.shape[0]
    dt = x.dtype
    if c * c >= 1 << 22 and noise_f is not None:
        # Large blocks on TPU: the single flag-blended tile kernel (ONE
        # Mosaic compile; the round-2 13-block assembly cost ~8 min of
        # one-time remote compile at ~5k points).
        try:
            import jax

            if jax.default_backend() == "tpu":
                from gpis_tpu.kernels import pallas_joint as pj

                return pj.joint_gram_fused_pallas(
                    name, x, params, noise_f, noise_g,
                    touch_x=touch_x, touch_noise=touch_noise,
                )
        except Exception:
            pass
    k = joint_gram_reference(name, x, params, noise_f=noise_f, noise_g=noise_g)
    if touch_x is None:
        return k
    from gpis_tpu.kernels import gram as kg_mod

    b = cross_cov_value(name, touch_x, x, params)  # (T, 4C)
    d = kg_mod.gram_reference(name, touch_x, params, noise=touch_noise)
    return jnp.block([[k, b.T], [b, d]])


def joint_gram_reference(name: str, x, params, noise_f=None, noise_g=None):
    """Pure-jnp joint Gram (always differentiable — the MLL path for models
    with normal observations uses this form)."""
    if not kf.supports_derivatives(name):
        raise ValueError(f"kernel {name!r} does not support derivative observations")
    c = x.shape[0]
    dt = x.dtype
    d, r2 = _diff_r2(x, x)
    kff = kf.k_r2(name, r2, params)
    kff = jnp.where(jnp.eye(c, dtype=bool), kf.k_diag0(name, params).astype(dt), kff)
    dk = kf.dk_dr2(name, r2, params)
    d2k = kf.d2k_dr2(name, r2, params)

    # K_fg[i, (e, j)] = -2 dk (x_i - x_j)_e   -> (C, 3C) dimension-major.
    kfg = jnp.concatenate([-2.0 * dk * d[:, :, e] for e in range(3)], axis=1)

    # K_gg[(d_, i), (e, j)] = -2 dk δ - 4 d2k diff_d diff_e.  The d2k term is
    # multiplied by diff products that vanish at r=0, masking its singularity
    # (thin_plate d2k ~ 1/r); zero the diagonal of that term explicitly.
    eye_c = jnp.eye(c, dtype=bool)
    rows = []
    for di in range(3):
        blocks = []
        for e in range(3):
            outer = d[:, :, di] * d[:, :, e]
            term = -4.0 * jnp.where(eye_c, 0.0, d2k * outer)
            if di == e:
                term = term - 2.0 * dk
            blocks.append(term)
        rows.append(jnp.concatenate(blocks, axis=1))
    kgg = jnp.concatenate(rows, axis=0)  # (3C, 3C)

    k = jnp.block([[kff, kfg], [kfg.T, kgg]])
    if noise_f is not None:
        dn = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(noise_f, dt), (c,)),
            jnp.broadcast_to(jnp.asarray(noise_g, dt), (c,)),
            jnp.broadcast_to(jnp.asarray(noise_g, dt), (c,)),
            jnp.broadcast_to(jnp.asarray(noise_g, dt), (c,)),
        ])
        k = k + jnp.diag(dn)
    return k


def cross_cov_value(name: str, q, x, params):
    """cov(f(q), [f(x); grad f(x)]): (M, 4C) — the query row block for
    posterior evaluation of f."""
    if q.shape[0] * x.shape[0] >= 1 << 22:
        try:
            import jax

            if jax.default_backend() == "tpu":
                from gpis_tpu.kernels import pallas_joint as pj

                return pj.joint_cross_value_pallas(name, q, x, params)
        except Exception:
            pass
    d, r2 = _diff_r2(q, x)
    kqf = kf.k_r2(name, r2, params)
    dk = kf.dk_dr2(name, r2, params)
    kqg = jnp.concatenate([-2.0 * dk * d[:, :, e] for e in range(3)], axis=1)
    return jnp.concatenate([kqf, kqg], axis=1)


def cross_cov_grad(name: str, q, x, params):
    """cov(grad f(q), [f(x); grad f(x)]): (3M, 4C) dimension-major — for
    querying posterior surface normals directly."""
    m = q.shape[0]
    d, r2 = _diff_r2(q, x)
    dk = kf.dk_dr2(name, r2, params)
    d2k = kf.d2k_dr2(name, r2, params)
    zero = r2 <= 1e-24
    rows = []
    for di in range(3):
        kgf = 2.0 * dk * d[:, :, di]  # cov(d_d f(q), f(x))
        blocks = [kgf]
        for e in range(3):
            outer = d[:, :, di] * d[:, :, e]
            term = -4.0 * jnp.where(zero, 0.0, d2k * outer)
            if di == e:
                term = term - 2.0 * dk
            blocks.append(term)
        rows.append(jnp.concatenate(blocks, axis=1))
    return jnp.concatenate(rows, axis=0)


def cross_cov_grad_value(name: str, q, t, params):
    """cov(grad f(q), f(t)): (3M, T) dimension-major — the gradient-query
    rows against VALUE-ONLY columns (tactile touch slots)."""
    d, r2 = _diff_r2(q, t)
    dk = kf.dk_dr2(name, r2, params)
    return jnp.concatenate([2.0 * dk * d[:, :, e] for e in range(3)], axis=0)


def joint_targets(y_f, normals):
    """Observation vector [y_f; n_x(1..C); n_y(1..C); n_z(1..C)]."""
    return jnp.concatenate([y_f, normals[:, 0], normals[:, 1], normals[:, 2]])
