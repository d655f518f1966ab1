"""Pallas panel-update pipeline for the blocked Cholesky (north-star
component: "training solves via a blocked Cholesky factorization +
triangular-solve Pallas pipeline"; SURVEY.md §8 step 5).

`blocked_cholesky` (linalg/cholesky.py) spends its time in the per-panel
trailing update `A_panel - L[:, :j0] @ L_row[:, :j0]^T`, realized there as a
full-width masked matmul — half the FLOPs are multiplications by the zero
mask.  The Pallas version tiles the contraction dimension and *skips* k
tiles at or beyond j0 (the panel index arrives via scalar prefetch, so one
compiled kernel serves every panel):

    grid (n/TN, n/TK); out[(i, k)] accumulates into column block 0
    k-tile body: @pl.when(k*TK < j0) -> masked MXU dot-accumulate

Panel potrf (B x B) and the triangular solve stay on XLA — they are O(B^2)
and O(n B^2) next to the O(n^2 B) update.  Parity vs `blocked_cholesky`
and `jnp.linalg.cholesky` is enforced in tests (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpis_tpu.kernels.pallas_gram import _interpret

__all__ = ["panel_update_pallas", "pallas_blocked_cholesky"]

_TN = 256
_TK = 256


def _panel_kernel(j0_ref, l_ref, lrow_ref, apanel_ref, out_ref):
    k = pl.program_id(1)
    j0 = j0_ref[0]

    @pl.when(k == 0)
    def _():
        out_ref[...] = apanel_ref[...]

    @pl.when(k * _TK < j0)
    def _():
        cols = k * _TK + jax.lax.broadcasted_iota(jnp.int32, l_ref.shape, 1)
        mask = (cols < j0).astype(l_ref.dtype)
        lt = l_ref[...] * mask
        lr = lrow_ref[...] * mask
        out_ref[...] -= jax.lax.dot_general(
            lt, lr,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block",))
def panel_update_pallas(l, l_row, a_panel, j0, *, block: int):
    """A_panel - L[:, :j0] @ L_row[:, :j0]^T with k-tile skipping.

    l: (nr, nc) current factor rows (nr == nc single-chip; nr = local band
    in the sharded case); l_row: (block, nc) rows [j0, j0+B) of l (already
    broadcast in the sharded case); a_panel: (nr, block); j0: traced scalar
    — the contraction runs over columns < j0."""
    nr, nc = l.shape
    if nr % _TN or nc % _TK or block > _TN:
        # Shapes outside the tiling contract: fall back to the masked matmul.
        cols = jnp.arange(nc) < j0
        l_done = l * cols[None, :].astype(l.dtype)
        lr = l_row * cols[None, :].astype(l.dtype)
        return a_panel - jnp.dot(l_done, lr.T, precision=lax.Precision.HIGHEST)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr // _TN, nc // _TK),
        in_specs=[
            pl.BlockSpec((_TN, _TK), lambda i, k, j: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, _TK), lambda i, k, j: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, block), lambda i, k, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TN, block), lambda i, k, j: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _panel_kernel,
        out_shape=jax.ShapeDtypeStruct((nr, block), a_panel.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.asarray([j0], jnp.int32), l, l_row, a_panel)


@functools.partial(jax.jit, static_argnames=("block",))
def pallas_blocked_cholesky(a, block: int = 256):
    """Left-looking blocked Cholesky whose trailing updates run as the
    Pallas panel kernel. Drop-in for `blocked_cholesky`."""
    n = a.shape[0]
    if n % block:
        raise ValueError(f"matrix size {n} must be a multiple of block {block}")
    nb = n // block
    dt = a.dtype
    col_idx = jnp.arange(n)

    def body(j, l):
        j0 = j * block
        a_panel = lax.dynamic_slice(a, (0, j0), (n, block))
        l_row = lax.dynamic_slice(l, (j0, 0), (block, n))
        a_panel = panel_update_pallas(l, l_row, a_panel, j0, block=block)
        d = lax.dynamic_slice(a_panel, (j0, 0), (block, block))
        ld = jnp.linalg.cholesky(d)
        panel = lax.linalg.triangular_solve(
            ld, a_panel.T, left_side=True, lower=True
        ).T
        row_mask = (col_idx >= j0)[:, None]
        panel = jnp.where(row_mask, panel, jnp.zeros((), dt))
        panel = lax.dynamic_update_slice(panel, ld, (j0, 0))
        return lax.dynamic_update_slice(l, panel, (0, j0))

    return lax.fori_loop(0, nb, body, jnp.zeros_like(a))
