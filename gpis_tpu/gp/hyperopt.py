"""Marginal-likelihood hyperparameter optimization (BASELINE config 3;
SURVEY.md §8 step 6).

Maximizes log p(y | X, theta) over (lengthscale, observation-noise scale,
optionally signal variance) by AD through the Cholesky factorization —
XLA's cholesky has exact JVP/VJP rules, so the whole objective is one
differentiable jitted graph.  Optimization runs in log-parameter space
(positivity for free) with optax Adam (default) or L-BFGS.

The reference has no equivalent (hyperparameters are hand-set YAML values,
SURVEY.md §3 C9) — this is a capability the rebuild adds on top of parity,
as named by the north star.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gpis_tpu.gp import regression as gpr

__all__ = ["optimize", "optimize_joint", "HyperoptResult"]


class HyperoptResult(dict):
    """dict with attribute access: params, noise, history."""

    __getattr__ = dict.__getitem__


def optimize(
    kernel: str,
    xp,
    yp,
    noisep,
    init_params,
    *,
    n_real: int,
    learn_signal: bool = False,
    learn_noise: bool = True,
    steps: int = 150,
    learning_rate: float = 0.05,
    optimizer: str = "adam",
) -> HyperoptResult:
    """Optimize hyperparameters on padded training arrays.

    The noise-scale multiplier applies only to real rows (< n_real): padding
    rows keep their huge variance so they stay inert (gpis_tpu.gp.model).
    Returns optimized params dict, the scaled noise vector, and the MLL
    history."""
    dt = xp.dtype
    real = (jnp.arange(xp.shape[0]) < n_real).astype(dt)

    theta0 = {"log_ls": jnp.log(jnp.asarray(init_params["lengthscale"], dt))}
    if learn_signal:
        theta0["log_sv"] = jnp.log(jnp.asarray(init_params["signal_variance"], dt))
    if learn_noise:
        theta0["log_noise_scale"] = jnp.zeros((), dt)

    def unpack(theta):
        params = {
            "lengthscale": jnp.exp(theta["log_ls"]),
            "signal_variance": (
                jnp.exp(theta["log_sv"]) if learn_signal
                else jnp.asarray(init_params["signal_variance"], dt)
            ),
        }
        scale = jnp.exp(theta.get("log_noise_scale", jnp.zeros((), dt)))
        noise = jnp.where(real > 0, noisep * scale, noisep)
        return params, noise

    def loss(theta):
        params, noise = unpack(theta)
        return -gpr.log_marginal_likelihood(kernel, xp, yp, noise, params)

    if optimizer == "lbfgs":
        opt = optax.lbfgs(learning_rate=None)
    else:
        opt = optax.adam(learning_rate)

    @jax.jit
    def step(theta, opt_state):
        val, g = jax.value_and_grad(loss)(theta)
        updates, opt_state = opt.update(
            g, opt_state, theta, value=val, grad=g, value_fn=loss
        )
        return optax.apply_updates(theta, updates), opt_state, val

    theta = theta0
    opt_state = opt.init(theta)
    history = []
    best_theta, best_val = theta, jnp.inf
    for _ in range(steps):
        # `val` is the loss at the *incoming* theta: pair it with that
        # iterate, not the post-update one (the returned params must be the
        # ones that achieved the reported best MLL).
        new_theta, opt_state, val = step(theta, opt_state)
        v = float(val)
        history.append(-v)  # store MLL, not loss
        if v < best_val:
            best_theta, best_val = theta, v
        theta = new_theta

    params, noise = unpack(best_theta)
    scale = jnp.exp(best_theta.get("log_noise_scale", jnp.zeros((), dt)))
    return HyperoptResult(
        params={k: jnp.asarray(v) for k, v in params.items()},
        noise=noise,
        noise_scale=scale,
        history=history,
        mll=-float(best_val),
    )


def optimize_joint(
    kernel: str,
    xp,
    yp,
    normals,
    noise_f,
    noise_g,
    init_params,
    *,
    n_real: int,
    steps: int = 100,
    learning_rate: float = 0.05,
    learn_noise: bool = False,
    learn_noise_g: bool = False,
    learn_signal: bool = False,
) -> HyperoptResult:
    """MLL hyperparameter optimization for the joint (value + normals)
    system — config 3 applied to the config 2 model.  Lengthscale by
    default; `learn_noise=True` adds one multiplicative scale on the
    value-observation noise of real rows; `learn_noise_g=True` adds an
    independent scale on the gradient-observation noise of real rows
    (off by default: learning both jointly can be under-determined on
    sparse scans where few normals pin the gradient scale);
    `learn_signal=True` adds the signal variance (AD through the joint
    assembly — every block is linear in sv, so this is well-posed)."""
    from gpis_tpu.kernels import derivative as kd
    from gpis_tpu.linalg import cholesky as lin_mod

    dt = xp.dtype
    yj = kd.joint_targets(yp, normals)
    real_f = (jnp.arange(xp.shape[0]) < n_real).astype(dt)
    theta0 = {"log_ls": jnp.log(jnp.asarray(init_params["lengthscale"], dt))}
    if learn_noise:
        theta0["log_noise_scale"] = jnp.zeros((), dt)
    if learn_noise_g:
        theta0["log_noise_scale_g"] = jnp.zeros((), dt)
    if learn_signal:
        theta0["log_sv"] = jnp.log(jnp.asarray(init_params["signal_variance"], dt))

    def loss(theta):
        params = {
            "lengthscale": jnp.exp(theta["log_ls"]),
            "signal_variance": (
                jnp.exp(theta["log_sv"]) if learn_signal
                else jnp.asarray(init_params["signal_variance"], dt)
            ),
        }
        scale = jnp.exp(theta.get("log_noise_scale", jnp.zeros((), dt)))
        scale_g = jnp.exp(theta.get("log_noise_scale_g", jnp.zeros((), dt)))
        nf = jnp.where(real_f > 0, noise_f * scale, noise_f)
        ng = jnp.where(real_f > 0, noise_g * scale_g, noise_g)
        k = kd.joint_gram_reference(kernel, xp, params, noise_f=nf, noise_g=ng)
        l = gpr._mll_chol(k.shape[0])(k)
        alpha = lin_mod.cho_solve(l, yj)
        return (
            0.5 * jnp.dot(yj, alpha)
            + jnp.sum(jnp.log(jnp.diagonal(l)))
            + 0.5 * yj.shape[0] * jnp.log(2.0 * jnp.pi)
        )

    opt = optax.adam(learning_rate)

    @jax.jit
    def step(theta, opt_state):
        val, g = jax.value_and_grad(loss)(theta)
        updates, opt_state = opt.update(g, opt_state, theta)
        return optax.apply_updates(theta, updates), opt_state, val

    theta = theta0
    opt_state = opt.init(theta)
    history = []
    best_theta, best_val = theta, jnp.inf
    for _ in range(steps):
        new_theta, opt_state, val = step(theta, opt_state)
        v = float(val)
        history.append(-v)
        if v < best_val:
            best_theta, best_val = theta, v
        theta = new_theta
    params = {
        "lengthscale": jnp.exp(best_theta["log_ls"]),
        "signal_variance": (
            jnp.exp(best_theta["log_sv"]) if learn_signal
            else jnp.asarray(init_params["signal_variance"], dt)
        ),
    }
    scale = jnp.exp(best_theta.get("log_noise_scale", jnp.zeros((), dt)))
    scale_g = jnp.exp(best_theta.get("log_noise_scale_g", jnp.zeros((), dt)))
    noise_out = jnp.where(real_f > 0, noise_f * scale, noise_f)
    noise_g_out = jnp.where(real_f > 0, noise_g * scale_g, noise_g)
    return HyperoptResult(params=params, noise=noise_out, noise_scale=scale,
                          noise_g=noise_g_out, noise_scale_g=scale_g,
                          history=history, mll=-float(best_val))
