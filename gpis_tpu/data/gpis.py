"""GPIS training-set construction (rebuild of reference component C3,
SURVEY.md §3 C3 and §1 step 2).

The reference turns a PCL cloud into a GPIS training set: de-mean + scale
into the unit sphere, label on-surface points 0, add internal point(s)
labelled -1 at/near the centroid, and external points labelled +1 on an
enclosing sphere (Williams & Fitzgibbon labeling), with per-role noise.
Here the same scheme operates on jnp arrays; PCL is replaced by
`gpis_tpu.data.io` loaders and `gpis_tpu.data.voxel` downsampling.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpis_tpu.config import ModelConfig

__all__ = ["Frame", "TrainingSet", "normalize_cloud", "build_training_set", "fibonacci_sphere"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Frame:
    """Similarity transform between world and normalized (unit-sphere) frames:
    x_norm = (x_world - centroid) / scale."""

    centroid: jax.Array  # (3,)
    scale: jax.Array  # ()

    def to_normalized(self, x):
        return (x - self.centroid) / self.scale

    def to_world(self, x):
        return x * self.scale + self.centroid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainingSet:
    x: jax.Array  # (N, 3) normalized-frame positions
    y: jax.Array  # (N,) labels
    noise: jax.Array  # (N,) per-point observation variance
    frame: Frame
    # Index ranges by role (static) for tests/visualization.
    n_surface: int = dataclasses.field(metadata=dict(static=True))
    n_internal: int = dataclasses.field(metadata=dict(static=True))
    n_external: int = dataclasses.field(metadata=dict(static=True))


def normalize_cloud(points) -> tuple[jnp.ndarray, Frame]:
    """Centroid-center and scale the cloud into the unit sphere
    (reference `deMeanAndNormalize`, SURVEY.md §4.1)."""
    pts = jnp.asarray(points)
    centroid = jnp.mean(pts, axis=0)
    centered = pts - centroid
    scale = jnp.max(jnp.linalg.norm(centered, axis=1))
    scale = jnp.where(scale > 0, scale, 1.0)
    return centered / scale, Frame(centroid=centroid, scale=scale)


def fibonacci_sphere(n: int, radius: float = 1.0, dtype=np.float64) -> np.ndarray:
    """Deterministic quasi-uniform points on a sphere (external label shell)."""
    i = np.arange(n, dtype=dtype) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + np.sqrt(5.0)) * i
    return radius * np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], axis=1
    )


def build_training_set(points, cfg: ModelConfig, normals=None) -> TrainingSet:
    """Cloud (world frame) -> GPIS training set (normalized frame).

    Order: [surface..., internal..., external...] — surface first so the
    incremental-update boundary logic in `gpis_tpu.gp.regression` and role
    slicing in tests stay simple.
    """
    surf, frame = normalize_cloud(points)
    dt = surf.dtype
    n_s = surf.shape[0]

    internal = jnp.zeros((cfg.n_internal, 3), dt)  # centroid of normalized frame
    if cfg.n_internal > 1:
        # Spread extra internal points on a small inner sphere.
        internal = jnp.asarray(fibonacci_sphere(cfg.n_internal, 0.1), dt)
    external = jnp.asarray(fibonacci_sphere(cfg.n_external, cfg.external_radius), dt)

    x = jnp.concatenate([surf, internal, external], axis=0)
    y = jnp.concatenate(
        [
            jnp.full((n_s,), cfg.label_surface, dt),
            jnp.full((cfg.n_internal,), cfg.label_internal, dt),
            jnp.full((cfg.n_external,), cfg.label_external, dt),
        ]
    )
    noise = jnp.concatenate(
        [
            jnp.full((n_s,), cfg.noise_surface, dt),
            jnp.full((cfg.n_internal,), cfg.noise_internal, dt),
            jnp.full((cfg.n_external,), cfg.noise_external, dt),
        ]
    )
    return TrainingSet(
        x=x, y=y, noise=noise, frame=frame,
        n_surface=n_s, n_internal=cfg.n_internal, n_external=cfg.n_external,
    )
