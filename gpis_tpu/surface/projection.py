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

import functools

import jax
import jax.numpy as jnp
from jax import lax

from gpis_tpu.gp import regression as gpr
from gpis_tpu.gp.model import GPModel

__all__ = ["project_points", "surface_normals", "project_point"]


def _jittable(model) -> bool:
    """Pytree models can cross a jit boundary as arguments; sharded models
    (plain dataclasses holding a Mesh) and out-of-core models (host panel
    streaming) cannot — they take the eager path, whose predict methods run
    their own jitted programs (ADVICE r2: tracing a sharded model crashed
    every config-5 planner call)."""
    from gpis_tpu.gp.kinds import model_kind

    return model_kind(model) not in ("sharded", "sharded_joint",
                                     "ooc", "ooc_joint")


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


@functools.partial(jax.jit, static_argnames=("max_iters", "tol"))
def _project_points_jit(model, seeds, max_iters: int, tol: float):
    fn = lambda s: project_point(model, s, max_iters=max_iters, tol=tol)
    return jax.vmap(fn)(seeds)


def project_points(model: GPModel, seeds, *, max_iters: int = 20, tol: float = 1e-6):
    """vmapped projection of (M,3) seeds. Returns (points (M,3), converged (M,)).

    Jitted as ONE program for pytree models: eager execution dispatched each
    surrounding primitive as its own device round-trip (~0.2 s each on the
    tunnel), several of which bracketed the while_loop per call."""
    if _jittable(model):
        return _project_points_jit(model, seeds, max_iters, tol)
    fn = lambda s: project_point(model, s, max_iters=max_iters, tol=tol)
    return jax.vmap(fn)(seeds)


@jax.jit
def _surface_normals_jit(model, points):
    g = jax.vmap(lambda x: jax.grad(lambda p: _mean_single(model, p))(x))(points)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=1, keepdims=True), 1e-12)


def surface_normals(model: GPModel, points):
    """Outward unit normals: normalized posterior-mean gradient (the GPIS
    field grows from -1 inside to +1 outside, so grad f points outward)."""
    if _jittable(model):
        return _surface_normals_jit(model, points)
    g = jax.vmap(lambda x: jax.grad(lambda p: _mean_single(model, p))(x))(points)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=1, keepdims=True), 1e-12)
