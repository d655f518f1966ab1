"""Atlas of tangent-space charts (rebuild of reference component C5,
SURVEY.md §3 C5).

A chart is (center on the estimated surface, outward normal, tangent basis,
radius); the radius shrinks where the posterior variance is high so the
atlas treads carefully in uncertain regions (the reference's
variance-weighted chart sizing).  Chart construction is fully vectorized:
normals and variances for a whole batch of centers come from one posterior
call (SURVEY.md §3 C5 rebuild note).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpis_tpu.config import ExploreConfig
from gpis_tpu.gp import regression as gpr
from gpis_tpu.gp.model import GPModel
from gpis_tpu.surface import projection

__all__ = ["Chart", "make_charts", "disc_samples", "project_and_chart"]


@dataclasses.dataclass
class Chart:
    """One tangent-space disc of the atlas (host-side object; the tree logic
    is branchy Python per the CPU/TPU split in SURVEY.md §3 C6)."""

    id: int
    center: np.ndarray  # (3,) on the estimated surface
    normal: np.ndarray  # (3,) outward unit normal
    u: np.ndarray  # (3,) tangent basis
    v: np.ndarray  # (3,)
    radius: float
    variance: float
    parent: int  # parent chart id, -1 for the root


def _tangent_basis(normal: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Orthonormal (u, v) spanning the plane perpendicular to `normal`."""
    # Pick the world axis least aligned with the normal for stability.
    a = np.zeros(3)
    a[np.argmin(np.abs(normal))] = 1.0
    u = np.cross(normal, a)
    u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    return u, v


def chart_radius(variance: float, prior_var: float, cfg: ExploreConfig) -> float:
    """Variance-shrunk disc radius: full radius_max where the posterior is
    certain, shrinking toward radius_min as variance approaches the prior."""
    rel = float(np.clip(variance / max(prior_var, 1e-30), 0.0, 1.0))
    r = cfg.radius_max * (1.0 - cfg.variance_radius_gain * rel)
    return float(np.clip(r, cfg.radius_min, cfg.radius_max))


def make_charts(model: GPModel, centers, cfg: ExploreConfig, *, ids, parents):
    """Vectorized chart construction: one device round-trip for normals and
    one for variances, however many centers."""
    centers = jnp.asarray(centers, model.dtype)
    normals = np.asarray(projection.surface_normals(model, centers))
    _, var = gpr.predict(model, centers)
    var = np.asarray(var)
    from gpis_tpu.kernels import functions as kf

    prior = float(kf.k_diag0(model.kernel, model.params))
    charts = []
    for i in range(len(np.asarray(centers))):
        n = normals[i]
        u, v = _tangent_basis(n)
        charts.append(
            Chart(
                id=int(ids[i]),
                center=np.asarray(centers)[i],
                normal=n,
                u=u,
                v=v,
                radius=chart_radius(float(var[i]), prior, cfg),
                variance=float(var[i]),
                parent=int(parents[i]),
            )
        )
    return charts


def _project_chart_impl(model, x0):
    """Project x0 to the surface, then its normal and posterior variance —
    ONE device program (the planner's expansion step; splitting these into
    separate calls made GPAtlasRRT round-trip-latency-bound on remote
    TPU attachments)."""
    x, ok = projection.project_point(model, x0)
    g = jax.grad(lambda p: gpr.predict_mean(model, p[None, :])[0])(x)
    n = g / jnp.maximum(jnp.linalg.norm(g), 1e-12)
    _, var = gpr.predict(model, x[None, :])
    return x, ok, n, var[0]


_project_chart_device = jax.jit(_project_chart_impl)


def project_and_chart(model: GPModel, x0, cfg: ExploreConfig, *, cid, parent):
    """Project a candidate and build its Chart in one device round-trip.
    Returns None when the projection fails to converge."""
    from gpis_tpu.kernels import functions as kf

    # Sharded models hold a Mesh and are NOT pytrees, so they cannot be
    # traced jit arguments (ADVICE r2 high #1); their expansion runs the
    # same program eagerly — the while_loop/grad pieces still each compile
    # to one XLA program, and the shard_map predicts inside are jitted.
    from gpis_tpu.gp.kinds import model_kind

    fn = (_project_chart_impl
          if model_kind(model) in ("sharded", "sharded_joint", "ooc", "ooc_joint")
          else _project_chart_device)
    x, ok, n, var = fn(model, jnp.asarray(x0, model.dtype))
    if not bool(ok):
        return None
    n = np.asarray(n)
    u, v = _tangent_basis(n)
    prior = float(kf.k_diag0(model.kernel, model.params))
    return Chart(
        id=int(cid), center=np.asarray(x), normal=n, u=u, v=v,
        radius=chart_radius(float(var), prior, cfg),
        variance=float(var), parent=int(parent),
    )


def disc_samples(chart: Chart, n: int) -> np.ndarray:
    """n candidate points on the chart's disc boundary (reference §4.4:
    'sample candidate points on current chart's disc boundary')."""
    theta = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    return (
        chart.center[None, :]
        + chart.radius * (np.cos(theta)[:, None] * chart.u[None, :]
                          + np.sin(theta)[:, None] * chart.v[None, :])
    )
