"""Covariance functions (rebuild of reference component C1, SURVEY.md §3).

The reference ships four kernel functors — Gaussian/RBF, Laplace,
InverseMultiQuad, and the compactified ThinPlate `2r^3 - 3Rr^2 + R^3` —
each exposing the covariance and its radial derivative (SURVEY.md §3 C1;
the reference mount was empty at survey time, so no file:line citation is
possible — see SURVEY.md §0).

TPU-first design notes
----------------------
* Every kernel is expressed as a function of the **squared** distance `r2`.
  Pairwise `r2` tiles come straight out of broadcast/matmul arithmetic, and
  working in `r2` removes the `sqrt` from the RBF/IMQ hot path entirely and
  keeps autodiff smooth at `r = 0`.
* Derivative (surface-normal) observations need `dk/dr2` and `d2k/dr2^2`:

      grad_x  k = 2 * dk_dr2 * (x - x')
      grad_x' k = -2 * dk_dr2 * (x - x')
      d2k/dx dx'^T = -2*dk_dr2 * I - 4*d2k_dr2 * (x-x')(x-x')^T

  For the thin-plate kernel `dk/dr2 = 3*(r - R)` is *smooth* even at r=0,
  which is why this parameterization (rather than `dk/dr`) is used.
* Dispatch on the kernel name happens at trace time (the name is static),
  so each jitted program contains exactly one kernel's math — no `lax.switch`
  in the hot loop.

Hyperparameters are a small dict pytree ``{"lengthscale": ..,
"signal_variance": ..}`` so they can be optimized by AD (BASELINE config 3).
For the thin-plate kernel, ``lengthscale`` plays the role of the scale R.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

__all__ = [
    "KERNEL_NAMES",
    "register_kernel",
    "unregister_kernel",
    "kernel_params",
    "k_r2",
    "dk_dr2",
    "d2k_dr2",
    "k_diag0",
    "supports_derivatives",
]

KERNEL_NAMES = ("rbf", "thin_plate", "laplace", "inverse_multiquadric")

Params = Mapping[str, Any]

# User-registered covariance functions (the reference's kernel-functor
# extension point, SURVEY.md §3 C1: "one small struct per kernel").  Each
# entry: dict with k_r2, k_diag0, and optional dk_dr2 / d2k_dr2 callables,
# all taking (r2_or_nothing, params).
_REGISTRY: dict[str, dict] = {}


def register_kernel(name: str, *, k_r2, k_diag0, dk_dr2=None, d2k_dr2=None):
    """Register a custom covariance function usable everywhere a built-in
    kernel name is (fit, session, Pallas tiles — the tile kernels call the
    same functions).  Derivative observations require dk_dr2 and d2k_dr2."""
    if name in KERNEL_NAMES:
        raise ValueError(f"cannot shadow built-in kernel {name!r}")
    _REGISTRY[name] = {
        "k_r2": k_r2, "k_diag0": k_diag0, "dk_dr2": dk_dr2, "d2k_dr2": d2k_dr2,
    }


def unregister_kernel(name: str):
    _REGISTRY.pop(name, None)


def kernel_params(lengthscale=1.0, signal_variance=1.0) -> dict:
    """Build the hyperparameter pytree shared by all kernels."""
    return {
        "lengthscale": jnp.asarray(lengthscale),
        "signal_variance": jnp.asarray(signal_variance),
    }


def supports_derivatives(name: str) -> bool:
    """Laplace is not differentiable at r=0, so normal observations are
    unsupported for it (matching the reference, which only forms derivative
    terms for its smooth kernels; SURVEY.md §3 C1)."""
    if name in _REGISTRY:
        return _REGISTRY[name]["dk_dr2"] is not None and _REGISTRY[name]["d2k_dr2"] is not None
    return name in ("rbf", "thin_plate", "inverse_multiquadric")


def _safe_sqrt(r2):
    # sqrt with a zero-safe gradient: d/dr2 sqrt(r2) at 0 is inf; the callers
    # below only use sqrt where the result is multiplied by r-like factors,
    # but AD through hyperopt still traces the bad branch, so clamp.
    return jnp.sqrt(jnp.maximum(r2, 1e-30))


def k_r2(name: str, r2, params: Params):
    """Covariance k as a function of squared distance r2. Elementwise."""
    ls = params["lengthscale"]
    sv = params["signal_variance"]
    if name == "rbf":
        return sv * jnp.exp(-0.5 * r2 / (ls * ls))
    if name == "laplace":
        return sv * jnp.exp(-_safe_sqrt(r2) / ls)
    if name == "inverse_multiquadric":
        return sv / jnp.sqrt(r2 + ls * ls)
    if name == "thin_plate":
        # Williams & Fitzgibbon compactified thin-plate: 2r^3 - 3Rr^2 + R^3,
        # zero at r=R, conditionally positive definite (needs noise jitter).
        r = _safe_sqrt(r2)
        return sv * (2.0 * r * r2 - 3.0 * ls * r2 + ls * ls * ls)
    if name in _REGISTRY:
        return _REGISTRY[name]["k_r2"](r2, params)
    raise ValueError(f"unknown kernel {name!r}")


def k_diag0(name: str, params: Params):
    """k(0) — the prior variance at a point (diagonal of the Gram matrix)."""
    ls = params["lengthscale"]
    sv = params["signal_variance"]
    if name == "rbf" or name == "laplace":
        return jnp.asarray(sv)
    if name == "inverse_multiquadric":
        return sv / ls
    if name == "thin_plate":
        return sv * ls * ls * ls
    if name in _REGISTRY:
        return jnp.asarray(_REGISTRY[name]["k_diag0"](params))
    raise ValueError(f"unknown kernel {name!r}")


def dk_dr2(name: str, r2, params: Params):
    """First derivative dk/d(r2). Elementwise; smooth at r2=0 for rbf/thin_plate/imq."""
    ls = params["lengthscale"]
    sv = params["signal_variance"]
    if name == "rbf":
        inv2 = 1.0 / (ls * ls)
        return -0.5 * inv2 * sv * jnp.exp(-0.5 * r2 * inv2)
    if name == "inverse_multiquadric":
        c2 = ls * ls
        return -0.5 * sv * (r2 + c2) ** (-1.5)
    if name == "thin_plate":
        # dk/dr = 6r^2 - 6Rr  =>  dk/dr2 = dk/dr / (2r) = 3(r - R): smooth.
        return sv * 3.0 * (_safe_sqrt(r2) - ls)
    if name == "laplace":
        r = _safe_sqrt(r2)
        return -0.5 * sv * jnp.exp(-r / ls) / (ls * r)
    if name in _REGISTRY:
        fn = _REGISTRY[name]["dk_dr2"]
        if fn is not None:
            return fn(r2, params)
        # dk_dr2 is optional at registration; k_r2 is elementwise in r2, so
        # forward-mode AD recovers the derivative exactly.  This keeps
        # custom kernels working through every dk_dr2 consumer (gram_ad's
        # banded MLL pullback, the projector's normals) without forcing the
        # user to hand-derive it.  Derivative OBSERVATIONS still require an
        # explicit dk/d2k pair (supports_derivatives) — the 4x4 joint
        # blocks also need d2k, where the same trick would hide the
        # laplace-style r=0 singularity instead of rejecting it.
        import jax

        _, d = jax.jvp(lambda t: _REGISTRY[name]["k_r2"](t, params),
                       (r2,), (jnp.ones_like(r2),))
        return d
    raise ValueError(f"unknown kernel {name!r}")


def d2k_dr2(name: str, r2, params: Params):
    """Second derivative d2k/d(r2)^2.

    Note: for thin_plate this is 3/(2r), singular at r=0 — but it only ever
    appears multiplied by (x-x')(x-x')^T ~ r^2, so the product vanishes at
    r=0; the Hessian assembly in `gpis_tpu.kernels.derivative` multiplies by
    the (already zero) outer product so the clamped value is never exposed.
    """
    ls = params["lengthscale"]
    sv = params["signal_variance"]
    if name == "rbf":
        inv2 = 1.0 / (ls * ls)
        return 0.25 * inv2 * inv2 * sv * jnp.exp(-0.5 * r2 * inv2)
    if name == "inverse_multiquadric":
        c2 = ls * ls
        return 0.75 * sv * (r2 + c2) ** (-2.5)
    if name == "thin_plate":
        return sv * 1.5 / _safe_sqrt(r2)
    if name in _REGISTRY and _REGISTRY[name]["d2k_dr2"] is not None:
        return _REGISTRY[name]["d2k_dr2"](r2, params)
    raise ValueError(f"kernel {name!r} does not support second derivatives")
