"""Batched multi-object fitting — the data-parallel axis (SURVEY.md §3
parallelism table: "batched multi-object fitting via jax.vmap/shard_map over
objects").

The reference models one object per node; production bin-picking scenes hold
many.  All GP transforms are pure functions over the GPModel pytree, so
batching is literally `vmap`: B objects share one capacity C (shorter clouds
ride the padding rows), fit as one batched Cholesky (B, C, C) that XLA maps
onto the MXU as batched GEMMs.  `mesh=` additionally shards the object axis
across devices — embarrassingly-parallel DP with zero collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpis_tpu.gp import regression as gpr
from gpis_tpu.gp.model import round_up

__all__ = ["fit_batch", "predict_batch"]


def _pad_one(x, y, noise, capacity, pad_noise, dtype):
    return gpr._pad_training(x, y, noise, capacity, pad_noise, dtype)


def fit_batch(kernel, clouds, ys, noises, params, *, block: int = 128,
              pad_noise: float = 1e10, dtype=jnp.float32, mesh=None,
              axis: str = "row"):
    """Fit B objects at once.

    clouds: list of (N_b, 3) arrays (ragged ok — padded to a shared
    capacity); ys/noises: matching lists (or scalars per object).
    Returns a GPModel pytree whose leaves carry a leading batch axis; index
    object b with `jax.tree.map(lambda a: a[b], batch_model)`.
    """
    b = len(clouds)
    cap = round_up(max(c.shape[0] for c in clouds), block)
    xs, ys_, ns = [], [], []
    for i in range(b):
        x = jnp.asarray(clouds[i], dtype)
        y = jnp.broadcast_to(jnp.asarray(ys[i], dtype), (x.shape[0],))
        nz = jnp.broadcast_to(jnp.asarray(noises[i], dtype), (x.shape[0],))
        xp, yp, np_ = _pad_one(x, y, nz, cap, pad_noise, dtype)
        xs.append(xp)
        ys_.append(yp)
        ns.append(np_)
    xb = jnp.stack(xs)
    yb = jnp.stack(ys_)
    nb = jnp.stack(ns)

    fit_one = lambda x, y, nz: gpr.fit_padded(kernel, x, y, nz, params, n0=cap)
    fit_v = jax.jit(jax.vmap(fit_one))
    if mesh is not None:
        # Shard the object axis; XLA propagates the batch sharding through
        # the vmapped program (embarrassingly parallel, no collectives).
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(axis))
        xb = jax.device_put(xb, sh)
        yb = jax.device_put(yb, sh)
        nb = jax.device_put(nb, sh)
    return fit_v(xb, yb, nb)


def predict_batch(batch_model, q):
    """Posterior (mean, var) for every object at shared queries q (M, 3).
    Returns (B, M) arrays."""
    return jax.vmap(lambda m: gpr.predict(m, q))(batch_model)
