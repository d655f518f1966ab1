"""Device-mesh helpers (SURVEY.md §3 parallelism table: the rebuild's
distributed-communication backend is JAX/XLA collectives over ICI — no
NCCL/MPI equivalent needs hand-writing).

One mesh axis, 'row': the Gram matrix and Cholesky factor are sharded by
block rows; queries shard by the same axis for grid evaluation.  Tests run
the identical code on an 8-device virtual CPU mesh
(`--xla_force_host_platform_device_count=8`, SURVEY.md §5 item 4).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_row_mesh", "row_sharding", "replicated_sharding", "P"]


def make_row_mesh(n_devices: int | None = None, axis_name: str = "row") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} visible")
    # Auto axis type: jax 0.9's default Explicit mode rejects mixing sharded
    # batch inputs with vmap-broadcast (unsharded) constants; Auto restores
    # propagation semantics, which is what the shard_map paths expect too.
    return jax.make_mesh(
        (n,), (axis_name,), devices=devs[:n],
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def row_sharding(mesh: Mesh, ndim: int = 2, axis_name: str = "row") -> NamedSharding:
    """First array dim sharded over the mesh axis, rest replicated."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
