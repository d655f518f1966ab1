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
  (Exact because every built-in kernel is LINEAR in signal_variance —
  kernels/functions.py — so dK/d(log sv) = K - D; custom registry kernels
  without that property must not use learn_signal.)

The MLL value itself needs only diag(L) (local band slices + psum) and
alpha.y.  No AD ever crosses a collective, so this runs unchanged on the
virtual CPU mesh and a v5e-8.

The JOINT (value+gradient, config 2) system uses the identical identities —
they are assembly-agnostic: `sharded_joint_mll_and_grad` swaps the band
jvp target from `kg.cross_cov` to `sharded_joint._joint_band_rows` and the
noise directions to the joint layout [f(C) | d1..d3(C) | touch(T)], and
everything else (ring trace, diag(K^{-1}) column norms) carries over.
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

__all__ = ["sharded_mll_and_grad", "optimize_sharded",
           "sharded_joint_mll_and_grad", "optimize_sharded_joint"]


def _ring_trace(dk_loc, w_loc, me, p, band, axis):
    """tr(K^{-1} dK) = sum(W dK . W) over the ppermute ring: my W band stays
    resident, each device's dK band visits every device once."""
    perm = [(i, (i + 1) % p) for i in range(p)]
    c = dk_loc.shape[1]

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

    acc0 = lax.pcast(jnp.zeros((band, c), dk_loc.dtype), (axis,), to="varying")
    _, wdk = lax.fori_loop(0, p, ring_step, (dk_loc, acc0))
    return lax.psum(jnp.sum(wdk * w_loc), axis)


def _mll_and_grad_collective(kernel, x, theta, mesh, *, axis: str = "row"):
    """One shard_map pass: MLL pieces + gradients w.r.t. theta =
    (log_ls, log_noise_scale).  Returns (mll_core, g_logls, g_lognoise).
    mll_core excludes the constant -C/2 log(2pi) and padding correction
    (added by the host caller).  `x` supplies shape/dtype only at
    construction; all data arrives at call time."""
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
        tr_ls = _ring_trace(dk_loc, w_loc, me, p, band, axis)

        # ---- noise-scale direction: dK = diag(mask * noise * scale).
        diag_kinv = lax.psum(jnp.sum(w_loc * w_loc, axis=0), axis)  # (C,)
        dn = mask_full * noise_full * scale
        quad_ns = jnp.dot(alpha_full * alpha_full, dn)
        tr_ns = jnp.dot(diag_kinv, dn)

        # ---- signal-variance direction (free): dK/d(log sv) = K - D with
        # D = diag(effective noise); alpha^T (K - D) alpha = y.alpha -
        # sum(alpha^2 n) and tr(K^{-1}(K - D)) = C - diag(K^{-1}).n.
        ya = jnp.dot(y_full, alpha_full)
        n_eff = jnp.where(mask_full > 0, noise_full * scale, noise_full)
        quad_sv = ya - jnp.dot(alpha_full * alpha_full, n_eff)
        tr_sv = c - jnp.dot(diag_kinv, n_eff)

        mll_core = -0.5 * ya - logdet
        g_logls = 0.5 * (quad_ls - tr_ls)
        g_lognoise = 0.5 * (quad_ns - tr_ns)
        g_logsv = 0.5 * (quad_sv - tr_sv)
        return mll_core, g_logls, g_lognoise, g_logsv

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(axis, None), P(axis, None)),
        out_specs=(P(), P(), P(), P()),
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
    fn = _mll_and_grad_collective(kernel, xp, theta, mesh)
    mll_core, g_ls, g_ns, g_sv = fn(xp, yp, noisep, real, alpha, l, w)

    mll = mll_core - 0.5 * c * jnp.log(2.0 * jnp.pi).astype(dt)
    if n_real is not None:
        pad = jnp.arange(c) >= n_real
        mll = mll + jnp.sum(
            jnp.where(pad, 0.5 * jnp.log(2.0 * jnp.pi * noise_eff), 0.0)
        )
    return mll, {"log_ls": g_ls, "log_noise_scale": g_ns, "log_sv": g_sv}


def _mll_ascent(eval_fn, kernel, init_params, dt, *, steps, learning_rate,
                learn_noise, learn_signal):
    """Shared Adam ascent driver for the distributed optimizers: theta is
    <= 3 host scalars (log lengthscale[, log noise scale][, log signal
    variance]); `eval_fn(prm, scale) -> (mll, grads)` runs one sharded fit
    + one gradient collective.  Tracks the best-MLL iterate (the gradient
    pairs with the theta it was evaluated at — ADVICE r1).

    learn_signal uses the free dK/d(log sv) = K - D identity, exact for
    kernels linear in signal_variance (all built-ins); custom registry
    kernels are rejected."""
    import optax

    if learn_signal and kernel not in kf.KERNEL_NAMES:
        raise ValueError(
            f"learn_signal requires a kernel linear in signal_variance; "
            f"custom kernel {kernel!r} is not certified for the "
            f"dK/d(log sv) = K - D identity"
        )
    theta = {"log_ls": jnp.log(jnp.asarray(init_params["lengthscale"], dt))}
    if learn_noise:
        theta["log_noise_scale"] = jnp.zeros((), dt)
    if learn_signal:
        theta["log_sv"] = jnp.log(jnp.asarray(init_params["signal_variance"], dt))
    opt = optax.adam(learning_rate)
    opt_state = opt.init(theta)

    sv0 = jnp.asarray(init_params["signal_variance"], dt)
    best_theta, best_val, history = dict(theta), -np.inf, []
    for _ in range(steps):
        prm = {
            "lengthscale": jnp.exp(theta["log_ls"]),
            "signal_variance": jnp.exp(theta["log_sv"]) if learn_signal else sv0,
        }
        scale = jnp.exp(theta.get("log_noise_scale", jnp.zeros((), dt)))
        mll, g = eval_fn(prm, scale)
        v = float(mll)
        history.append(v)
        if v > best_val:
            best_theta, best_val = dict(theta), v
        grad = {"log_ls": -g["log_ls"]}
        if learn_noise:
            grad["log_noise_scale"] = -g["log_noise_scale"]
        if learn_signal:
            grad["log_sv"] = -g["log_sv"]
        updates, opt_state = opt.update(grad, opt_state)
        theta = optax.apply_updates(theta, updates)

    return {
        "params": {
            "lengthscale": jnp.exp(best_theta["log_ls"]),
            "signal_variance": (jnp.exp(best_theta["log_sv"])
                                if learn_signal else sv0),
        },
        "noise_scale": jnp.exp(best_theta.get("log_noise_scale", jnp.zeros((), dt))),
        "mll": best_val,
        "history": history,
    }


def optimize_sharded(kernel, xp, yp, noisep, init_params, mesh, *,
                     block: int = 256, n_real: int | None = None,
                     steps: int = 25, learning_rate: float = 0.1,
                     learn_noise: bool = True, learn_signal: bool = False):
    """Distributed MLL ascent — config 3 at config 5 scale, no subsampling.
    Each step is one sharded fit + one gradient collective (see
    _mll_ascent).  Returns a dict: params (optimal), noise_scale, mll,
    history."""
    def eval_fn(prm, scale):
        return sharded_mll_and_grad(
            kernel, xp, yp, noisep, prm, mesh, block=block, n_real=n_real,
            noise_scale=scale,
        )

    return _mll_ascent(eval_fn, kernel, init_params, xp.dtype, steps=steps,
                       learning_rate=learning_rate, learn_noise=learn_noise,
                       learn_signal=learn_signal)


# ------------------------------------------------------ joint (config 2)


def _joint_collective(kernel, x_all, theta, mesh, c, *, axis: str = "row"):
    """Gradient collective for the JOINT system (J = 4C + T): identical
    identities, the band jvp targets `sharded_joint._joint_band_rows`
    (assembly-agnostic — VERDICT r2 item 4).  Noise/sv directions arrive as
    precomputed joint-length diagonal vectors (dn = d(noise diag)/d(log
    value-noise-scale), n_eff = the effective noise diagonal); `x_all`
    supplies shape/dtype only at construction."""
    from gpis_tpu.gp.sharded_joint import _joint_band_rows

    j_tot = 3 * c + x_all.shape[0]  # 3C gradient rows + (C+T) value rows
    p = mesh.shape[axis]
    band = j_tot // p
    dt = x_all.dtype
    sv = jnp.asarray(theta["signal_variance"], dt)
    log_ls = jnp.log(jnp.asarray(theta["lengthscale"], dt))

    def body(x_full, nf, ng_, yj_full, dn_full, neff_full, alpha_full,
             l_loc, w_loc):
        me = lax.axis_index(axis)
        r0 = me * band
        grows = r0 + jax.lax.broadcasted_iota(jnp.int32, (band,), 0)
        alpha_loc = lax.dynamic_slice(alpha_full, (r0,), (band,))

        diag_l = l_loc[jnp.arange(band), grows]
        logdet = lax.psum(jnp.sum(jnp.log(diag_l)), axis)

        def band_k(lls):
            prm = {"lengthscale": jnp.exp(lls), "signal_variance": sv}
            return _joint_band_rows(kernel, x_full, prm, nf, ng_, grows, c)

        _, dk_loc = jax.jvp(band_k, (log_ls,), (jnp.ones((), dt),))

        quad_ls = lax.psum(
            jnp.dot(alpha_loc, jnp.dot(dk_loc, alpha_full,
                                       precision=lax.Precision.HIGHEST)), axis
        )
        tr_ls = _ring_trace(dk_loc, w_loc, me, p, band, axis)

        diag_kinv = lax.psum(jnp.sum(w_loc * w_loc, axis=0), axis)  # (J,)
        quad_ns = jnp.dot(alpha_full * alpha_full, dn_full)
        tr_ns = jnp.dot(diag_kinv, dn_full)

        ya = jnp.dot(yj_full, alpha_full)
        quad_sv = ya - jnp.dot(alpha_full * alpha_full, neff_full)
        tr_sv = j_tot - jnp.dot(diag_kinv, neff_full)

        mll_core = -0.5 * ya - logdet
        return (mll_core, 0.5 * (quad_ls - tr_ls), 0.5 * (quad_ns - tr_ns),
                0.5 * (quad_sv - tr_sv))

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(),
                  P(axis, None), P(axis, None)),
        out_specs=(P(), P(), P(), P()),
    )
    return fn


def _joint_noise_vectors(nf_all, ng, c, n_real, n_touch, scale, dt):
    """(dn, n_eff, real_mask) over the joint layout [f(C) | d1 d2 d3 (C) |
    touch(T)].  The value-noise scale multiplies REAL CORE value rows only
    (the single-chip optimize_joint convention: the gradient-noise family
    stays fixed, and touch observations keep their own calibrated noise)."""
    ct = nf_all.shape[0]
    t = ct - c
    core_real = (jnp.arange(c) < n_real).astype(dt)
    nf_core = nf_all[:c]
    dn_core = core_real * nf_core * scale
    nf_eff_core = jnp.where(core_real > 0, nf_core * scale, nf_core)
    zeros3c = jnp.zeros((3 * c,), dt)
    ng3 = jnp.concatenate([ng, ng, ng])
    parts_dn = [dn_core, zeros3c]
    parts_ne = [nf_eff_core, ng3]
    parts_real = [core_real, jnp.concatenate([core_real] * 3)]
    if t:
        touch_real = (jnp.arange(t) < n_touch).astype(dt)
        parts_dn.append(jnp.zeros((t,), dt))
        parts_ne.append(nf_all[c:])
        parts_real.append(touch_real)
    return (jnp.concatenate(parts_dn), jnp.concatenate(parts_ne),
            jnp.concatenate(parts_real))


def sharded_joint_mll_and_grad(kernel, x_all, yj, nf_all, ng, params, mesh,
                               *, c: int, block: int = 128,
                               n_real: int | None = None, n_touch: int = 0,
                               noise_scale=1.0):
    """Joint-system MLL and exact gradients w.r.t. (log lengthscale, log
    value-noise scale, log signal variance) over the mesh.  x_all (C+T, 3)
    core+touch coordinates, yj (J,) joint targets, nf_all (C+T,) value
    noise, ng (C,) gradient noise — the ShardedJointModel field layout.
    Runs one sharded joint fit at theta, then one gradient collective."""
    from gpis_tpu.gp.sharded_joint import sharded_joint_gram

    dt = x_all.dtype
    j_tot = 3 * c + x_all.shape[0]
    scale = jnp.asarray(noise_scale, dt)
    nr = n_real if n_real is not None else c
    dn, n_eff, real_j = _joint_noise_vectors(nf_all, ng, c, nr, n_touch,
                                             scale, dt)
    nf_eff = jnp.concatenate([n_eff[:c], nf_all[c:]]) if x_all.shape[0] > c \
        else n_eff[:c]

    a = sharded_joint_gram(kernel, x_all, params, nf_eff, ng, mesh, c=c)
    use_pallas = jax.default_backend() == "tpu"
    l = sh.sharded_cholesky(a, mesh, block=block, use_pallas=use_pallas)
    w = sh.sharded_linv(l, mesh, block=block)
    alpha = sh.sharded_alpha_from_linv(w, yj, mesh)

    theta = {
        "lengthscale": jnp.asarray(params["lengthscale"], dt),
        "signal_variance": jnp.asarray(params["signal_variance"], dt),
    }
    fn = _joint_collective(kernel, x_all, theta, mesh, c)
    mll_core, g_ls, g_ns, g_sv = fn(x_all, nf_eff, ng, yj, dn, n_eff,
                                    alpha, l, w)

    mll = mll_core - 0.5 * j_tot * jnp.log(2.0 * jnp.pi).astype(dt)
    # Padding correction: inert rows (pad core value+gradient rows, empty
    # touch slots) each contribute -1/2 log(2 pi n) that the identity-noise
    # construction cancels; theta-independent.
    mll = mll + jnp.sum(
        jnp.where(real_j > 0, 0.0, 0.5 * jnp.log(2.0 * jnp.pi * n_eff))
    )
    return mll, {"log_ls": g_ls, "log_noise_scale": g_ns, "log_sv": g_sv}


def optimize_sharded_joint(kernel, x_all, yj, nf_all, ng, init_params, mesh,
                           *, c: int, block: int = 128,
                           n_real: int | None = None, n_touch: int = 0,
                           steps: int = 25, learning_rate: float = 0.1,
                           learn_noise: bool = True,
                           learn_signal: bool = False):
    """Distributed joint MLL ascent (config 3 on config 2 at config 5
    scale) — no subsampling, exact gradients over the mesh.  The
    value-noise scale multiplies real core rows; the gradient-noise family
    stays fixed (see optimize_joint's under-determination note)."""
    def eval_fn(prm, scale):
        return sharded_joint_mll_and_grad(
            kernel, x_all, yj, nf_all, ng, prm, mesh, c=c, block=block,
            n_real=n_real, n_touch=n_touch, noise_scale=scale,
        )

    return _mll_ascent(eval_fn, kernel, init_params, x_all.dtype,
                       steps=steps, learning_rate=learning_rate,
                       learn_noise=learn_noise, learn_signal=learn_signal)
