"""Surface projection (rebuild of reference component C4, SURVEY.md §3 C4 /
§4.3).

The reference's projector Newton-iterates a 3D point onto the `f(x)=0`
isosurface using the posterior mean and its spatial gradient (computed there
from kernel derivatives).  Here the gradient comes from `jax.grad` of the
posterior mean — identical math, zero extra code — and thousands of seeds
project in parallel under `vmap` with a `lax.while_loop` per point
(SURVEY.md §8 step 8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from gpis_tpu.gp import regression as gpr
from gpis_tpu.gp.model import GPModel

__all__ = ["project_points", "surface_normals", "project_point"]


def _mean_single(model: GPModel, x):
    return gpr.predict_mean(model, x[None, :])[0]


def project_point(model: GPModel, x0, *, max_iters: int = 20, tol: float = 1e-6,
                  step_clip: float = 0.25):
    """Newton-project one point onto f=0:  x <- x - f(x) * g / ||g||^2
    (reference §4.3).  Steps are clipped for robustness far from the surface.
    Returns (x_surf, converged)."""
    f_and_g = jax.value_and_grad(lambda x: _mean_single(model, x))

    def cond(state):
        x, f, it = state
        return jnp.logical_and(jnp.abs(f) > tol, it < max_iters)

    def body(state):
        x, f, it = state
        fval, g = f_and_g(x)
        g2 = jnp.maximum(jnp.sum(g * g), 1e-12)
        step = fval * g / g2
        norm = jnp.linalg.norm(step)
        step = jnp.where(norm > step_clip, step * (step_clip / norm), step)
        x = x - step
        fnew, _ = f_and_g(x)
        return x, fnew, it + 1

    f0, _ = f_and_g(x0)
    x, f, _ = lax.while_loop(cond, body, (x0, f0, jnp.zeros((), jnp.int32)))
    return x, jnp.abs(f) <= tol


def project_points(model: GPModel, seeds, *, max_iters: int = 20, tol: float = 1e-6):
    """vmapped projection of (M,3) seeds. Returns (points (M,3), converged (M,))."""
    fn = lambda s: project_point(model, s, max_iters=max_iters, tol=tol)
    return jax.vmap(fn)(seeds)


def surface_normals(model: GPModel, points):
    """Outward unit normals: normalized posterior-mean gradient (the GPIS
    field grows from -1 inside to +1 outside, so grad f points outward)."""
    g = jax.vmap(lambda x: jax.grad(lambda p: _mean_single(model, p))(x))(points)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=1, keepdims=True), 1e-12)
