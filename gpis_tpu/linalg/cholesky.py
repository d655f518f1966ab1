"""Blocked Cholesky + triangular solves (rebuild of reference hot loop #2,
SURVEY.md §4.1: Eigen `LLT/LDLT` factor of K + sigma^2 I, O(N^3)).

Three tiers, all bit-compared in tests (SURVEY.md §5 item 3):

1. ``cholesky`` — XLA's native `jnp.linalg.cholesky` (itself blocked on TPU).
   The default single-chip path: XLA already pipelines panel factorization
   with MXU trailing updates, and autodiff through it is free (config 3).
2. ``blocked_cholesky`` — an explicit left-looking block-panel algorithm with
   static shapes (fori_loop + dynamic slices), the form that the sharded
   (`gpis_tpu.linalg.sharded`) and Pallas variants build on.  Each iteration
   does one full-width (C x C)·(C x B) masked matmul — MXU-shaped work — plus
   one B x B panel potrf.
3. Pallas trailing-update kernels live in `gpis_tpu.linalg.pallas_chol`.

All functions operate on the full padded capacity-C matrices of
`gpis_tpu.gp.model.GPModel`; padding correctness is argued there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "cholesky",
    "blocked_cholesky",
    "solve_lower",
    "solve_lower_t",
    "cho_solve",
]


def cholesky(a):
    """Lower Cholesky factor of SPD ``a``. XLA-native path."""
    return jnp.linalg.cholesky(a)


def blocked_cholesky(a, block: int = 256):
    """Left-looking blocked Cholesky with static shapes.

    For each column panel j (width B): subtract the contribution of all
    finished panels (one masked full-width matmul), factor the B x B diagonal
    block, and form the sub-diagonal panel with a triangular solve.  The
    column mask keeps shapes static so the whole loop is one `lax.fori_loop`
    under jit.
    """
    n = a.shape[0]
    if n % block != 0:
        raise ValueError(f"matrix size {n} must be a multiple of block {block}")
    nb = n // block
    dt = a.dtype

    col_idx = jnp.arange(n)

    def body(j, l):
        j0 = j * block
        # Current column panel of A: (n, B).
        a_panel = lax.dynamic_slice(a, (0, j0), (n, block))
        # Contribution of finished panels: L[:, :j0] @ L[j0:j0+B, :j0]^T.
        # Static shapes via masking columns >= j0 to zero.
        mask = (col_idx < j0).astype(dt)[None, :]  # (1, n)
        l_done = l * mask  # (n, n) with only finished columns
        l_row = lax.dynamic_slice(l_done, (j0, 0), (block, n))  # (B, n)
        a_panel = a_panel - l_done @ l_row.T  # (n, B) MXU matmul
        # Diagonal block potrf.
        d = lax.dynamic_slice(a_panel, (j0, 0), (block, block))
        ld = jnp.linalg.cholesky(d)
        # Panel below the diagonal: solve L_d X^T = A_below^T.
        panel = lax.linalg.triangular_solve(
            ld, a_panel.T, left_side=True, lower=True, transpose_a=False
        ).T  # (n, B) = A_panel @ L_d^{-T}
        # Rows above the diagonal block must be zero; rows inside are L_d.
        row_mask = (col_idx >= j0)[:, None]  # keep rows >= j0
        panel = jnp.where(row_mask, panel, jnp.zeros((), dt))
        panel = lax.dynamic_update_slice(panel, ld, (j0, 0))
        # Zero the strict upper triangle inside the diagonal block (ld already
        # lower-triangular from jnp.linalg.cholesky, which returns zeros above).
        return lax.dynamic_update_slice(l, panel, (0, j0))

    l0 = jnp.zeros_like(a)
    return lax.fori_loop(0, nb, body, l0)


def solve_lower(l, b):
    """Solve L x = b with L lower-triangular. b: (n,) or (n, k)."""
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    x = lax.linalg.triangular_solve(l, b, left_side=True, lower=True, transpose_a=False)
    return x[:, 0] if vec else x


def solve_lower_t(l, b):
    """Solve L^T x = b."""
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    x = lax.linalg.triangular_solve(l, b, left_side=True, lower=True, transpose_a=True)
    return x[:, 0] if vec else x


def cho_solve(l, b):
    """Solve (L L^T) x = b."""
    return solve_lower_t(l, solve_lower(l, b))
