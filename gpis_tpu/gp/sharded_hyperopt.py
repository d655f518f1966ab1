"""True distributed hyperparameter optimization (VERDICT r1 item 8;
SURVEY.md §8 hard part "AD through the blocked/sharded factorization").

Rather than differentiating through the shard_map'ed factorization (custom
VJPs over collectives), the gradient uses the classic exact identity

    d MLL / d theta = 1/2 ( alpha^T (dK/dtheta) alpha  -  tr(K^{-1} dK/dtheta) )

with alpha = K^{-1} y and W = L^{-1} already produced by the sharded fit
pipeline.  Everything decomposes over the row bands:

* **lengthscale** — dK/d(log ls) bands come from `jax.jvp` of the local band
  assembly (generic over kernels); the trace rides the ICI ring: each
  device's dK band visits every device once (`ppermute`), accumulating
  (W dK) rows against the resident W band — O(C^3/P) compute, C^2 words of
  ring traffic, the same pattern as the variance query.
* **noise scale** — dK is diagonal, so tr(K^{-1} dK) = sum(diag(K^{-1}) dn)
  with diag(K^{-1})_i = ||W[:, i]||^2: per-device column partial norms +
  one psum.  O(C^2/P).
* **signal variance** — free via K0 = K - D:  alpha^T K0 alpha = alpha.y -
  sum(alpha^2 n) (since K alpha = y) and tr(K^{-1} K0) = C - sum(diag(K^{-1}) n).

The MLL value itself needs only diag(L) (local band slices + psum) and
alpha.y.  No AD ever crosses a collective, so this runs unchanged on the
virtual CPU mesh and a v5e-8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg
from gpis_tpu.linalg import sharded as sh

__all__ = ["sharded_mll_and_grad", "optimize_sharded"]


def _mll_and_grad_collective(kernel, x, y, noisep, real_mask, theta, mesh,
                             *, axis: str = "row"):
    """One shard_map pass: MLL pieces + gradients w.r.t. theta =
    (log_ls, log_noise_scale).  Returns (mll_core, g_logls, g_lognoise).
    mll_core excludes the constant -C/2 log(2pi) and padding correction
    (added by the host caller)."""
    c = x.shape[0]
    p = mesh.shape[axis]
    band = c // p
    dt = x.dtype
    sv = jnp.asarray(theta["signal_variance"], dt)
    log_ls = jnp.log(jnp.asarray(theta["lengthscale"], dt))
    scale = jnp.asarray(theta.get("noise_scale", 1.0), dt)

    def body(x_full, y_full, noise_full, mask_full, alpha_full, l_loc, w_loc):
        me = lax.axis_index(axis)
        r0 = me * band
        x_loc = lax.dynamic_slice(x_full, (r0, jnp.zeros((), r0.dtype)), (band, 3))
        noise_loc = lax.dynamic_slice(noise_full, (r0,), (band,))
        mask_loc = lax.dynamic_slice(mask_full, (r0,), (band,))
        alpha_loc = lax.dynamic_slice(alpha_full, (r0,), (band,))
        rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (band,), 0)

        # ---- MLL pieces: log|L| from my band's diagonal slice.
        diag_l = l_loc[jnp.arange(band), rows]
        logdet = lax.psum(jnp.sum(jnp.log(diag_l)), axis)

        # ---- dK band w.r.t. log lengthscale via jvp of the band assembly
        # (exactly mirrors sharded_gram's row computation; the noise diagonal
        # is theta-independent here so it drops out of the tangent).
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (band, c), 1)
        diag_pos = col_ids == rows[:, None]

        def band_k(lls):
            prm = {"lengthscale": jnp.exp(lls), "signal_variance": sv}
            k_rows = kg.cross_cov(kernel, x_loc, x_full, prm)
            k0 = kf.k_diag0(kernel, prm).astype(dt)
            return jnp.where(diag_pos, k0, k_rows)

        _, dk_loc = jax.jvp(band_k, (log_ls,), (jnp.ones((), dt),))

        # quad term: alpha^T dK alpha (band partial + psum).
        quad_ls = lax.psum(
            jnp.dot(alpha_loc, jnp.dot(dk_loc, alpha_full,
                                       precision=lax.Precision.HIGHEST)), axis
        )

        # trace term: acc = (W dK)[my rows, :] built over the ring — my W
        # band stays resident; each dK band visits once.
        perm = [(i, (i + 1) % p) for i in range(p)]

        def ring_step(s, carry):
            dk_vis, acc = carry
            # The visiting band belongs to device q = (me - s) mod p.
            q = (me - s) % p
            wq = lax.dynamic_slice(
                w_loc, (jnp.zeros((), q.dtype), q * band), (band, band)
            )
            acc = acc + jnp.dot(wq, dk_vis, precision=lax.Precision.HIGHEST)
            dk_vis = lax.ppermute(dk_vis, axis, perm)
            return dk_vis, acc

        acc0 = lax.pcast(jnp.zeros((band, c), dt), (axis,), to="varying")
        _, wdk = lax.fori_loop(0, p, ring_step, (dk_loc, acc0))
        tr_ls = lax.psum(jnp.sum(wdk * w_loc), axis)

        # ---- noise-scale direction: dK = diag(mask * noise * scale).
        diag_kinv = lax.psum(jnp.sum(w_loc * w_loc, axis=0), axis)  # (C,)
        dn = mask_full * noise_full * scale
        quad_ns = jnp.dot(alpha_full * alpha_full, dn)
        tr_ns = jnp.dot(diag_kinv, dn)

        mll_core = -0.5 * jnp.dot(y_full, alpha_full) - logdet
        g_logls = 0.5 * (quad_ls - tr_ls)
        g_lognoise = 0.5 * (quad_ns - tr_ns)
        return mll_core, g_logls, g_lognoise

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(axis, None), P(axis, None)),
        out_specs=(P(), P(), P()),
    )
    return fn


def sharded_mll_and_grad(kernel, xp, yp, noisep, params, mesh, *,
                         block: int = 256, n_real: int | None = None,
                         noise_scale=1.0):
    """MLL value and exact gradients w.r.t. (log lengthscale, log noise
    scale) on padded, row-shardable arrays.  Runs one full sharded fit
    (gram -> Cholesky -> W -> alpha) at the given theta, then one collective
    gradient pass.  Returns (mll, {"log_ls": g, "log_noise_scale": g})."""
    c = xp.shape[0]
    dt = xp.dtype
    real = (jnp.arange(c) < (n_real if n_real is not None else c)).astype(dt)
    scale = jnp.asarray(noise_scale, dt)
    noise_eff = jnp.where(real > 0, noisep * scale, noisep)

    a = sh.sharded_gram(kernel, xp, params, noise_eff, mesh)
    use_pallas = jax.default_backend() == "tpu"
    l = sh.sharded_cholesky(a, mesh, block=block, use_pallas=use_pallas)
    w = sh.sharded_linv(l, mesh, block=block)
    alpha = sh.sharded_alpha_from_linv(w, yp, mesh)

    theta = {
        "lengthscale": jnp.asarray(params["lengthscale"], dt),
        "signal_variance": jnp.asarray(params["signal_variance"], dt),
        "noise_scale": scale,
    }
    fn = _mll_and_grad_collective(kernel, xp, yp, noise_eff, real, theta, mesh)
    mll_core, g_ls, g_ns = fn(xp, yp, noisep, real, alpha, l, w)

    mll = mll_core - 0.5 * c * jnp.log(2.0 * jnp.pi).astype(dt)
    if n_real is not None:
        pad = jnp.arange(c) >= n_real
        mll = mll + jnp.sum(
            jnp.where(pad, 0.5 * jnp.log(2.0 * jnp.pi * noise_eff), 0.0)
        )
    return mll, {"log_ls": g_ls, "log_noise_scale": g_ns}


def optimize_sharded(kernel, xp, yp, noisep, init_params, mesh, *,
                     block: int = 256, n_real: int | None = None,
                     steps: int = 25, learning_rate: float = 0.1,
                     learn_noise: bool = True):
    """Distributed MLL ascent over (log lengthscale[, log noise scale]) —
    config 3 at config 5 scale, no subsampling.  Each step is one sharded
    fit + one gradient collective; Adam on the host (theta is 2 scalars).

    Returns a dict: params (optimal), noise_scale, mll, history."""
    import optax

    dt = xp.dtype
    theta = {"log_ls": jnp.log(jnp.asarray(init_params["lengthscale"], dt))}
    if learn_noise:
        theta["log_noise_scale"] = jnp.zeros((), dt)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(theta)

    best_theta, best_val, history = dict(theta), -np.inf, []
    for _ in range(steps):
        prm = {
            "lengthscale": jnp.exp(theta["log_ls"]),
            "signal_variance": jnp.asarray(init_params["signal_variance"], dt),
        }
        scale = jnp.exp(theta.get("log_noise_scale", jnp.zeros((), dt)))
        mll, g = sharded_mll_and_grad(
            kernel, xp, yp, noisep, prm, mesh, block=block, n_real=n_real,
            noise_scale=scale,
        )
        v = float(mll)
        history.append(v)
        if v > best_val:
            best_theta, best_val = dict(theta), v
        grad = {"log_ls": -g["log_ls"]}
        if learn_noise:
            grad["log_noise_scale"] = -g["log_noise_scale"]
        updates, opt_state = opt.update(grad, opt_state)
        theta = optax.apply_updates(theta, updates)

    return {
        "params": {
            "lengthscale": jnp.exp(best_theta["log_ls"]),
            "signal_variance": jnp.asarray(init_params["signal_variance"], dt),
        },
        "noise_scale": jnp.exp(best_theta.get("log_noise_scale", jnp.zeros((), dt))),
        "mll": best_val,
        "history": history,
    }
