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
    "blocked_cholesky_ad",
    "blocked_linv",
    "solve_lower",
    "solve_lower_t",
    "cho_solve",
]


def cholesky(a):
    """Lower Cholesky factor of SPD ``a``.

    XLA's native cholesky on small problems; on TPU, matrices >= 4k route to
    the Pallas blocked factorization (`pallas_blocked_cholesky`) — measured
    9.2 useful TFLOP/s at 16k vs 0.42 for the masked-GEMM `blocked_cholesky`
    and an HBM blow-up (33 GB of trailing-submatrix temps for a 16k matrix)
    for XLA's own expansion.  Sizes that don't tile into the 256-block are
    identity-padded: chol([[A,0],[0,I]]) = [[L,0],[0,I]], so no size falls
    back into the OOM path.
    """
    n = a.shape[0]
    try:
        import jax

        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    if backend == "tpu" and n >= 4096:
        from gpis_tpu.linalg.pallas_chol import pallas_blocked_cholesky

        block = 256
        if n % block:
            m = -(-n // block) * block
            pad_diag = jnp.arange(n, m)
            ap = jnp.zeros((m, m), a.dtype).at[:n, :n].set(a)
            ap = ap.at[pad_diag, pad_diag].set(1.0)
            return pallas_blocked_cholesky(ap, block)[:n, :n]
        return pallas_blocked_cholesky(a, block)
    return jnp.linalg.cholesky(a)


def blocked_cholesky(a, block: int = 256, *, precision=None):
    """Left-looking blocked Cholesky with static shapes.

    For each column panel j (width B): subtract the contribution of all
    finished panels (one masked full-width matmul), factor the B x B diagonal
    block, and form the sub-diagonal panel with a triangular solve.  The
    column mask keeps shapes static so the whole loop is one `lax.fori_loop`
    under jit.

    precision: matmul precision for the trailing updates; defaults to
    HIGHEST (full f32 on TPU — bf16-rounded updates can push an
    ill-conditioned trailing block indefinite).  The string "bf16x3"
    selects the manual 3-pass split (linalg.matmul) — ~16-bit mantissa at
    full MXU speed, enough when the jitter ladder keeps K well clear of
    singular.
    """
    precision = precision or lax.Precision.HIGHEST
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
        if precision == "bf16x3":
            from gpis_tpu.linalg.matmul import matmul_bf16x3

            a_panel = a_panel - matmul_bf16x3(l_done, l_row.T)
        else:
            a_panel = a_panel - jnp.dot(l_done, l_row.T, precision=precision)
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


import functools as _functools


def _fast_blocked_chol(a, block):
    """Fastest available blocked factorization: the Pallas k-tile-skipping
    kernel on TPU when shapes tile (22x the masked-GEMM loop at 16k),
    the masked-GEMM loop otherwise."""
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    if backend == "tpu" and a.shape[0] % 256 == 0 and block % 256 == 0:
        from gpis_tpu.linalg.pallas_chol import pallas_blocked_cholesky

        return pallas_blocked_cholesky(a, 256)
    return blocked_cholesky(a, block)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def blocked_cholesky_ad(a, block: int = 256):
    """Blocked Cholesky with a custom VJP (SURVEY.md §8 hard part: "AD
    through the blocked/sharded factorization").

    The backward pass is the standard Cholesky pullback
        P    = Phi(L^T Lbar)          (Phi: lower triangle, diagonal halved)
        Abar = sym(L^{-T} P L^{-1})
    implemented with two triangular solves — O(n^3) but only O(n^2) memory,
    so the MLL objective differentiates at sizes where XLA's native
    cholesky-with-AD blows HBM (see `cholesky`).  The forward pass uses the
    fastest blocked implementation for the backend (Pallas on TPU); the
    pullback only needs L, so it is implementation-agnostic."""
    return _fast_blocked_chol(a, block)


def _blocked_chol_fwd(a, block):
    l = _fast_blocked_chol(a, block)
    return l, l


def _blocked_chol_bwd(block, l, lbar):
    n = l.shape[0]
    dt = l.dtype
    p = l.T @ lbar
    phi = jnp.tril(p) - 0.5 * jnp.diag(jnp.diagonal(p))
    x1 = lax.linalg.triangular_solve(l, phi, left_side=True, lower=True, transpose_a=True)
    abar = lax.linalg.triangular_solve(l, x1.T, left_side=True, lower=True, transpose_a=True).T
    abar = 0.5 * (abar + abar.T)
    return (abar.astype(dt),)


blocked_cholesky_ad.defvjp(_blocked_chol_fwd, _blocked_chol_bwd)


def blocked_linv(l, block: int = 512, *, precision=None):
    """W = L^{-1} by a right-looking blocked TRSM (single-chip mirror of
    `gpis_tpu.linalg.sharded.sharded_linv`): memory = L + W + one panel,
    avoiding XLA's triangular-solve expansion temps at large n.

        S := I
        for block row j: W_j = Ljj^{-1} S[j] ; S[below] -= L[:, j] W_j
    """
    precision = precision or lax.Precision.HIGHEST
    n = l.shape[0]
    if n % block != 0:
        raise ValueError(f"matrix size {n} must be a multiple of block {block}")
    nb = n // block
    dt = l.dtype
    row_ids = jnp.arange(n)[:, None]

    def body(j, s):
        j0 = j * block
        sj = lax.dynamic_slice(s, (j0, 0), (block, n))
        ljj = lax.dynamic_slice(l, (j0, j0), (block, block))
        wj = lax.linalg.triangular_solve(ljj, sj, left_side=True, lower=True)
        l_col = lax.dynamic_slice(l, (0, j0), (n, block))
        below = (row_ids[:, 0] >= j0 + block).astype(dt)[:, None]
        s = s - jnp.dot(l_col * below, wj, precision=precision)
        return lax.dynamic_update_slice(s, wj, (j0, 0))

    return lax.fori_loop(0, nb, body, jnp.eye(n, dtype=dt))


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
