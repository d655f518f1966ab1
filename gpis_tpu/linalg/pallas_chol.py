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

__all__ = ["panel_update_pallas", "pallas_blocked_cholesky",
           "row_update_pallas", "pallas_blocked_linv",
           "band_trail_update_pallas", "gemm_nt_masked_pallas",
           "gemm_nn_acc_masked_pallas", "panel_scale_pallas",
           "row_scale_pallas"]

_TN = 256
_TK = 256

# Panel-solve strategy for the 64-sequential-steps chain.  "inv" replaces
# the per-step (B, C) XLA trisolve + two full-panel transposes with one
# (B, B) trisolve against I (exact-grade substitution, PERF rule 7) and a
# Pallas bf16x3 GEMM.  MEASURED r5 at 16k on-chip: 0.0880 s vs 0.0892 s
# for the whole factorization (~1.3%, within noise) and linv identical —
# the r4 "serial-panel-bound" diagnosis was wrong about the trisolves;
# the real 4-7x roofline gap was DEAD-TILE DMA traffic (BlockSpec fetches
# for the ~5/6 of each panel grid whose compute is predicated off), fixed
# by the index-map clamps in panel_update_pallas / row_update_pallas
# (chol 0.156 -> 0.088 s, linv 0.165 -> 0.110 s at 16k).  With no
# measurable win, the default stays the backward-stable XLA substitution;
# "inv" remains selectable (GPIS_PANEL_SOLVE=inv) for re-measurement on
# other topologies.
import os as _os

_PANEL_SOLVE = _os.environ.get("GPIS_PANEL_SOLVE", "xla").lower()


def _dot3(a, b, dims):
    """bf16x3 split-dot with f32 accumulation, in-kernel.

    Mosaic lowers `dot_general` with f32 inputs + preferred f32 to a
    SINGLE-pass bf16 MXU product (measured: error identical to casting the
    inputs to bf16 — ~4e-3 relative), which is too coarse for a Cholesky
    trailing update.  The classic 3-pass split recovers ~2x bf16 mantissa
    (~16 bits, ~5e-4 worst-case on O(1) data) at 3x the MXU time — still
    ~8x faster end-to-end than XLA's HIGHEST path.

    In interpret mode (CPU CI) the plain dot IS exact f32/f64 — skip the
    split there so the 1e-6 oracle-parity tests see exact arithmetic."""
    if _interpret():
        return jax.lax.dot_general(a, b, dimension_numbers=dims)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(a.dtype)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(b.dtype)).astype(jnp.bfloat16)

    def d(u, v):
        return jax.lax.dot_general(
            u, v, dimension_numbers=dims, preferred_element_type=jnp.float32
        )

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _panel_kernel(j0_ref, l_ref, lrow_ref, apanel_ref, out_ref, *, tn, tk):
    i = pl.program_id(0)
    k = pl.program_id(1)
    j0 = j0_ref[0]
    row0 = j0_ref[1]

    @pl.when(k == 0)
    def _():
        out_ref[...] = apanel_ref[...]

    # Row tiles whose global rows all sit strictly above the panel
    # (row0 + (i+1)*TN <= j0) are discarded by the caller's row mask —
    # skip their update entirely (the strict upper half: 2x fewer FLOPs).
    @pl.when((k * tk < j0) & (row0 + (i + 1) * tn > j0))
    def _():
        # Separate masks: l tiles are (tn, tk) but the resident l_row
        # tile is (block, tk), and block < tn is legal (the guard only
        # requires block <= tn) — one shared mask shape-errored there.
        cols = k * tk + jax.lax.broadcasted_iota(jnp.int32, l_ref.shape, 1)
        lt = l_ref[...] * (cols < j0).astype(l_ref.dtype)
        cols_r = k * tk + jax.lax.broadcasted_iota(
            jnp.int32, lrow_ref.shape, 1)
        lr = lrow_ref[...] * (cols_r < j0).astype(lrow_ref.dtype)
        out_ref[...] -= _dot3(
            lt, lr, (((1,), (1,)), ((), ()))
        ).astype(out_ref.dtype)


# Panel-update tile size: 512 quarters the grid-step count vs the module
# default 256 (the per-step fixed cost is what separates the elided
# kernels from their ~22 ms MXU bound) and improves MACs/byte 256->341;
# VMEM stays ~4 MB.  Env-tunable for re-sweeps; sizes the capacity is not
# a multiple of clamp down per call.
_PANEL_TILE = int(_os.environ.get("GPIS_CHOL_TILE", "512"))


@functools.partial(jax.jit, static_argnames=("block",))
def panel_update_pallas(l, l_row, a_panel, j0, *, block: int, row0=0):
    """A_panel - L[:, :j0] @ L_row[:, :j0]^T with k-tile skipping.

    l: (nr, nc) current factor rows (nr == nc single-chip; nr = local band
    in the sharded case); l_row: (block, nc) rows [j0, j0+B) of l (already
    broadcast in the sharded case); a_panel: (nr, block); j0: traced scalar
    — the contraction runs over columns < j0.  row0 is the global row index
    of l's first row (device-band offset in the sharded case): output row
    tiles entirely above j0 are discarded by the caller and skipped here."""
    nr, nc = l.shape
    tn = tk = _PANEL_TILE
    while nr % tn or block > tn:
        tn //= 2
    while nc % tk:
        tk //= 2
    if tn < 128 or tk < 128:
        # Shapes outside the tiling contract: fall back to the masked matmul.
        cols = jnp.arange(nc) < j0
        l_done = l * cols[None, :].astype(l.dtype)
        lr = l_row * cols[None, :].astype(l.dtype)
        return a_panel - jnp.dot(l_done, lr.T, precision=lax.Precision.HIGHEST)

    # Dead-tile DMA elision (round 5 — the factor kernels' real roofline
    # gap): compute is predicated on (k*TK < j0) & (row tile below j0), but
    # BlockSpec DMAs are unconditional, and per panel only ~1/6 of the
    # (i, k) grid is live — 5/6 of the l-tile traffic was structurally-dead
    # fetches (the r4 roofline measured the kernel 4-7x above BOTH bounds
    # and blamed the serial panel solves; the 'inv' panel solve A/B came
    # back ~1.5%, pointing here instead).  Same index-map-aliasing trick as
    # `gemm_nt_masked_pallas`: dead-k steps repeat the last live k block,
    # rows entirely above the panel pin (first-live-row, 0) — consecutive
    # repeated indices skip the fetch.
    def _l_idx(i, k, j):
        kmax = jnp.maximum((j[0] + tk - 1) // tk - 1, 0)
        i_min = (j[0] - j[1]) // tn  # first row tile reaching below j0
        dead_row = i < i_min
        return (jnp.where(dead_row, i_min, i),
                jnp.where(dead_row, 0, jnp.minimum(k, kmax)))

    def _lrow_idx(i, k, j):
        kmax = jnp.maximum((j[0] + tk - 1) // tk - 1, 0)
        return (0, jnp.minimum(k, kmax))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr // tn, nc // tk),
        in_specs=[
            pl.BlockSpec((tn, tk), _l_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, tk), _lrow_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, block), lambda i, k, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tn, block), lambda i, k, j: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    scalars = jnp.stack([jnp.asarray(j0, jnp.int32), jnp.asarray(row0, jnp.int32)])
    return pl.pallas_call(
        functools.partial(_panel_kernel, tn=tn, tk=tk),
        out_shape=jax.ShapeDtypeStruct((nr, block), a_panel.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(scalars, l, l_row, a_panel)


def _trail_kernel(scal_ref, lcol_ref, wj_ref, s_ref, out_ref, *, block):
    i = pl.program_id(0)
    jt = pl.program_id(1)
    j0 = scal_ref[0]
    row0 = scal_ref[1]

    # Tiles outside the active region pass through: rows entirely above
    # j0+B are masked to zero in l_col; wj (a lower-triangular W row panel)
    # has zero columns >= j0+B.
    compute = (row0 + (i + 1) * _TN > j0 + block) & (jt * _TK < j0 + block)

    @pl.when(~compute)
    def _():
        out_ref[...] = s_ref[...]

    @pl.when(compute)
    def _():
        rows_g = row0 + i * _TN + jax.lax.broadcasted_iota(
            jnp.int32, (lcol_ref.shape[0], 1), 0
        )
        lt = lcol_ref[...] * (rows_g >= j0 + block).astype(lcol_ref.dtype)
        out_ref[...] = s_ref[...] - _dot3(
            lt, wj_ref[...], (((1,), (0,)), ((), ()))
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block",))
def band_trail_update_pallas(s, l_col, wj, j0, *, block: int, row0=0):
    """S - (L[:, j] masked to rows >= j0+B) @ W_j — the right-looking
    distributed TRSM's trailing update (`linalg.sharded.sharded_linv`).

    s: (R, C) running trailing matrix (a device band); l_col: (R, B) column
    panel j of L; wj: (B, C) the broadcast finished W row panel (lower
    triangular: columns >= j0+B are zero, so those output tiles pass
    through untouched); j0, row0: traced scalars (panel offset, band
    offset)."""
    r, c = s.shape
    if r % _TN or c % _TK or block > 512:
        rows_g = row0 + jnp.arange(r)
        lt = l_col * (rows_g >= j0 + block).astype(l_col.dtype)[:, None]
        return s - jnp.dot(lt, wj, precision=lax.Precision.HIGHEST)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // _TN, c // _TK),
        in_specs=[
            pl.BlockSpec((_TN, block), lambda i, j, sc: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, _TK), lambda i, j, sc: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, _TK), lambda i, j, sc: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, _TK), lambda i, j, sc: (i, j), memory_space=pltpu.VMEM),
    )
    scalars = jnp.stack([jnp.asarray(j0, jnp.int32), jnp.asarray(row0, jnp.int32)])
    return pl.pallas_call(
        functools.partial(_trail_kernel, block=block),
        out_shape=jax.ShapeDtypeStruct((r, c), s.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(scalars, l_col, wj, s)


def _gemm_nt_kernel(k0_ref, a_ref, b_ref, s_ref, out_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)
    k0 = k0_ref[0]

    @pl.when(k == 0)
    def _():
        out_ref[...] = s_ref[...]

    @pl.when(k * _TK < k0)
    def _():
        cols = k * _TK + jax.lax.broadcasted_iota(jnp.int32, a_ref.shape, 1)
        mask = (cols < k0).astype(a_ref.dtype)
        out_ref[...] -= _dot3(
            a_ref[...] * mask, b_ref[...] * mask, (((1,), (1,)), ((), ()))
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def gemm_nt_masked_pallas(a, b, s, k0):
    """S - A[:, :k0] @ B[:, :k0]^T with k-tile skipping — the rectangular
    generalization of `panel_update_pallas` used by the out-of-core
    factorization (`gpis_tpu.linalg.outofcore`): the streamed operands are
    fixed full-width device buffers whose columns >= k0 hold garbage; the
    contraction masks them out, so one compiled kernel serves every panel
    pair.  a: (R, K); b: (S, K); s: (R, S); k0 traced."""
    r, k_dim = a.shape
    sdim = b.shape[0]
    if r % _TN or sdim % _TN or k_dim % _TK:
        cols = (jnp.arange(k_dim) < k0).astype(a.dtype)
        return s - lax.dot_general(
            a * cols[None, :], b * cols[None, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=lax.Precision.HIGHEST,
        )
    # Fetch-aliasing for skipped k tiles: compute is predicated on
    # k*_TK < k0, but the pipeline would still stream every (i,k)/(j,k)
    # block from HBM.  Clamping the k block index at the last ACTIVE tile
    # makes the index map constant across the skipped tail, so Mosaic's
    # revisiting logic skips the re-fetch — the out-of-core callers run
    # this kernel at full matrix width with small k0 prefixes, where the
    # skipped-tail traffic would otherwise dominate.
    def _kc(k, sc):
        kmax = jnp.maximum((sc[0] + _TK - 1) // _TK - 1, 0)
        return jnp.minimum(k, kmax)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // _TN, sdim // _TN, k_dim // _TK),
        in_specs=[
            pl.BlockSpec((_TN, _TK), lambda i, j, k, sc: (i, _kc(k, sc)), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, _TK), lambda i, j, k, sc: (j, _kc(k, sc)), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, _TN), lambda i, j, k, sc: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TN, _TN), lambda i, j, k, sc: (i, j), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _gemm_nt_kernel,
        out_shape=jax.ShapeDtypeStruct((r, sdim), s.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.asarray([k0], jnp.int32), a, b, s)


def _gemm_nn_masked_kernel(w_ref, a_ref, b_ref, u_ref, out_ref):
    j = pl.program_id(1)
    k = pl.program_id(2)
    w = w_ref[0]

    @pl.when(k == 0)
    def _():
        out_ref[...] = u_ref[...]

    @pl.when(j * _TN < w)
    def _():
        cols = j * _TN + jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
        mask = (cols < w).astype(out_ref.dtype)
        out_ref[...] += mask * _dot3(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ()))
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def gemm_nn_acc_masked_pallas(u, a, b, w):
    """U + (A @ B) restricted to output columns < w, w TRACED — the
    out-of-core TRSM's panel-pair update (`linalg/outofcore.py`): B is a
    full-width zero-padded W panel whose true width w varies per panel,
    and one compiled kernel must serve every panel pair (a static width
    would cost O(nb^2) remote Mosaic compiles).  Output tiles at or beyond
    w skip both the MXU work and (via index-map aliasing to a constant
    block) the HBM fetch of their operands."""
    r, kd = a.shape
    n = b.shape[1]
    if r % _TN or n % _TN or kd % _TK:
        cols = (jnp.arange(n) < w).astype(u.dtype)
        return u + cols[None, :] * lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // _TN, n // _TN, kd // _TK),
        in_specs=[
            pl.BlockSpec(
                (_TN, _TK),
                lambda i, j, k, sc: (i, jnp.where(j * _TN < sc[0], k, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_TK, _TN),
                lambda i, j, k, sc: (
                    jnp.where(j * _TN < sc[0], k, 0),
                    jnp.where(j * _TN < sc[0], j, 0),
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((_TN, _TN), lambda i, j, k, sc: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TN, _TN), lambda i, j, k, sc: (i, j), memory_space=pltpu.VMEM
        ),
    )
    # u is accumulated IN PLACE (must-alias into the output; index 3 counts
    # the scalar-prefetch operand).  Both callers (`_trsm_kstep`,
    # `_trsm_finish`) hand over their last use of u, so no defensive copy
    # is inserted — without this the out-of-core TRSM held TWO full-width
    # (R, C) buffers per k-step, which is what OOM'd the N=100k phase 2 on
    # a 16 GB chip.
    return pl.pallas_call(
        _gemm_nn_masked_kernel,
        out_shape=jax.ShapeDtypeStruct((r, n), u.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},
        interpret=_interpret(),
    )(jnp.asarray([w], jnp.int32), a, b, u)


def _stripe_kernel(c0_ref, blk_ref, dst_ref, out_ref):
    del c0_ref, dst_ref
    out_ref[...] = blk_ref[...]


@functools.partial(jax.jit, static_argnames=())
def stripe_write_pallas(dst, blk, c0):
    """dst[:, c0:c0+W] = blk IN PLACE (must-alias), c0 TRACED.

    `lax.dynamic_update_slice` on a donated buffer is NOT reliably aliased
    in place on this backend: the out-of-core factorization's k-step wrote
    each solved column block back into its (sweep*B, C) row band with a
    dus, and at sweep=10 / N=100k the resulting second full-width buffer
    OOM'd the chip (RESOURCE_EXHAUSTED in `_chol_kstep`, 2026-08-19) —
    the same failure mode `gemm_nn_acc_masked_pallas`'s alias solved for
    the TRSM phase.  Here the GRID covers only the stripe (block index
    maps offset by the scalar-prefetched c0), so tiles outside it are
    never DMA'd or written; must-alias keeps their bytes in place.

    Requires c0 and both dims tile-aligned; falls back to dus otherwise
    (small problems, where the extra buffer is harmless)."""
    r, c = dst.shape
    w = blk.shape[1]
    if r % _TN or c % _TN or w % _TN:
        return lax.dynamic_update_slice(dst, blk, (0, c0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // _TN, w // _TN),
        in_specs=[
            pl.BlockSpec((_TN, _TN), lambda i, j, sc: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, _TN),
                         lambda i, j, sc: (i, sc[0] // _TN + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, _TN),
                               lambda i, j, sc: (i, sc[0] // _TN + j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _stripe_kernel,
        out_shape=jax.ShapeDtypeStruct((r, c), dst.dtype),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},
        interpret=_interpret(),
    )(jnp.asarray([c0], jnp.int32), blk, dst)


def _tri_small_inv(ld):
    """Ljj^{-1} of the (B, B) panel diagonal: XLA substitution against I —
    exact-grade (~7e-7 at B=1280, PERF rule 7) and B/C times the RHS
    volume of the full-panel trisolve it replaces."""
    eye = jnp.eye(ld.shape[0], dtype=ld.dtype)
    return lax.linalg.triangular_solve(ld, eye, left_side=True, lower=True)


def _panel_scale_kernel(acc_ref, v_ref, out_ref):
    # (TN, B) @ (B, B)^T: acc @ Ljj^{-T} — the right-side panel solve as
    # one MXU pass; v's BlockSpec index is constant so it is fetched once.
    out_ref[...] = _dot3(
        acc_ref[...], v_ref[...], (((1,), (1,)), ((), ()))
    ).astype(out_ref.dtype)


@jax.jit
def panel_scale_pallas(acc, v):
    """acc (R, B) @ v (B, B)^T — the Cholesky panel solve with v = Ljj^{-1}
    (bf16x3 in-kernel; no transposes, no full-panel trisolve)."""
    r, b = acc.shape
    if r % _TN or b % 128 or b > 512:
        return jnp.dot(acc, v.T, precision=lax.Precision.HIGHEST)
    return pl.pallas_call(
        _panel_scale_kernel,
        out_shape=jax.ShapeDtypeStruct((r, b), acc.dtype),
        grid=(r // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(acc, v)


def _row_scale_kernel(v_ref, rhs_ref, out_ref):
    # (B, B) @ (B, TN): Ljj^{-1} @ rhs — the left-side TRSM row solve.
    out_ref[...] = _dot3(
        v_ref[...], rhs_ref[...], (((1,), (0,)), ((), ()))
    ).astype(out_ref.dtype)


@jax.jit
def row_scale_pallas(v, rhs):
    """v (B, B) @ rhs (B, N) — the TRSM row solve with v = Ljj^{-1}."""
    b, n = rhs.shape
    if n % _TN or b % 128 or b > 512:
        return jnp.dot(v, rhs, precision=lax.Precision.HIGHEST)
    return pl.pallas_call(
        _row_scale_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), rhs.dtype),
        grid=(n // _TN,),
        in_specs=[
            pl.BlockSpec((b, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, _TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, _TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(v, rhs)


def _row_kernel(j0_ref, lrow_ref, w_ref, out_ref):
    i = pl.program_id(0)
    k = pl.program_id(1)
    j0 = j0_ref[0]

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # W[:j0] is lower-triangular with zero columns >= j0, so output column
    # tiles at i*TN >= j0 are identically zero — skip them (2x fewer FLOPs);
    # the k == 0 zero-init already wrote the correct value.
    @pl.when((k * _TK < j0) & (i * _TN < j0))
    def _():
        cols = k * _TK + jax.lax.broadcasted_iota(jnp.int32, lrow_ref.shape, 1)
        mask = (cols < j0).astype(lrow_ref.dtype)
        lt = lrow_ref[...] * mask
        out_ref[...] += _dot3(
            lt, w_ref[...], (((1,), (0,)), ((), ()))
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block",))
def row_update_pallas(w, l_row, j0, *, block: int):
    """L_row[:, :j0] @ W[:j0, :] with k-tile skipping — the left-looking
    TRSM's row update (see `pallas_blocked_linv`).

    w: (n, n) current inverse factor (rows < j0 finished and LOWER
    TRIANGULAR — the kernel skips output tiles at columns >= j0, which are
    zero only under that structure); l_row: (block, n) rows [j0, j0+B) of
    L; j0: traced scalar."""
    n = w.shape[0]
    if n % _TN or n % _TK or block % 128:
        cols = jnp.arange(n) < j0
        lr = l_row * cols[None, :].astype(l_row.dtype)
        w_done = w * cols[:, None].astype(w.dtype)
        return jnp.dot(lr, w_done, precision=lax.Precision.HIGHEST)

    # Dead-tile DMA elision (round 5, same rationale as panel_update_pallas):
    # compute runs only for (k*TK < j0) & (i*TN < j0), but W-tile DMAs were
    # unconditional — at step j only ~(j/nb)^2 of the grid is live, so the
    # early steps fetched mostly garbage-region tiles.  Dead-k steps repeat
    # the last live k block; dead-i (output columns >= j0, identically
    # zero) pin (0, last-live-i) so the whole dead row of steps repeats one
    # index and fetches once.
    def _w_idx(i, k, j):
        kmax = jnp.maximum((j[0] + _TK - 1) // _TK - 1, 0)
        imax = jnp.maximum((j[0] + _TN - 1) // _TN - 1, 0)
        dead_i = i * _TN >= j[0]
        return (jnp.where(dead_i, 0, jnp.minimum(k, kmax)),
                jnp.minimum(i, imax))

    def _lrow_idx(i, k, j):
        kmax = jnp.maximum((j[0] + _TK - 1) // _TK - 1, 0)
        return (0, jnp.minimum(k, kmax))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // _TN, n // _TK),
        in_specs=[
            pl.BlockSpec((block, _TK), _lrow_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TK, _TN), _w_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, _TN), lambda i, k, j: (0, i), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _row_kernel,
        out_shape=jax.ShapeDtypeStruct((block, n), w.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.asarray([j0], jnp.int32), l_row, w)


@functools.partial(jax.jit, static_argnames=("block", "inplace", "panel_solve"))
def pallas_blocked_linv(l, block: int = 256, *, inplace: bool = False,
                        panel_solve: str | None = None):
    """W = L^{-1} by a LEFT-looking blocked TRSM whose row updates run as
    the Pallas k-tile-skipping kernel:

        for block row j:  W[j, :] = Ljj^{-1} (I[j, :] - L[j, :j0] W[:j0, :])

    Left-looking writes only (B, n) per step (vs the right-looking variant's
    full trailing S), and the GEMM skips k tiles >= j0 — measured ~27x the
    masked-GEMM `blocked_linv` at 16k on v5e.  W stays lower-triangular
    because W[:j0, cols >= j0] is identically zero when the accumulator
    starts at zero.

    inplace=True overwrites L with W row band by row band (step j reads
    L's row panel j and the already-finished W rows < j0, both of which
    live in the same carry) — peak memory one matrix instead of two, the
    enabler for ~48k-point single-chip fits.  Donate the input at the
    caller's jit boundary to elide the initial copy.  The caller loses L."""
    n = l.shape[0]
    if n % block:
        raise ValueError(f"matrix size {n} must be a multiple of block {block}")
    nb = n // block
    dt = l.dtype
    col_idx = jnp.arange(n)
    if panel_solve is None:
        panel_solve = _PANEL_SOLVE

    def _solve_row(ljj, rhs):
        if panel_solve == "inv":
            return row_scale_pallas(_tri_small_inv(ljj), rhs)
        return lax.linalg.triangular_solve(ljj, rhs, left_side=True, lower=True)

    def body_two_buffer(j, w):
        j0 = j * block
        l_row = lax.dynamic_slice(l, (j0, 0), (block, n))
        upd = row_update_pallas(w, l_row, j0, block=block)
        rows = j0 + jax.lax.broadcasted_iota(jnp.int32, (block, n), 0)
        eye_slice = (rows == col_idx[None, :]).astype(dt)
        ljj = lax.dynamic_slice(l, (j0, j0), (block, block))
        wj = _solve_row(ljj, eye_slice - upd)
        return lax.dynamic_update_slice(w, wj, (j0, 0))

    def body_inplace(j, m):
        # m rows < j0 are finished W; rows >= j0 are still L.
        j0 = j * block
        l_row = lax.dynamic_slice(m, (j0, 0), (block, n))  # L's row panel j
        # row_update contracts columns < j0 of l_row against rows < j0 of
        # m — exactly the finished W rows; the masked-out columns of m's
        # unfinished region never enter.
        upd = row_update_pallas(m, l_row, j0, block=block)
        rows = j0 + jax.lax.broadcasted_iota(jnp.int32, (block, n), 0)
        eye_slice = (rows == col_idx[None, :]).astype(dt)
        ljj = lax.dynamic_slice(l_row, (0, j0), (block, block))
        wj = _solve_row(ljj, eye_slice - upd)
        return lax.dynamic_update_slice(m, wj, (j0, 0))

    if inplace:
        return lax.fori_loop(0, nb, body_inplace, l)
    return lax.fori_loop(0, nb, body_two_buffer, jnp.zeros_like(l))


@functools.partial(jax.jit, static_argnames=("block", "panel_solve"))
def pallas_blocked_cholesky(a, block: int = 256, *, panel_solve: str | None = None):
    """Left-looking blocked Cholesky whose trailing updates run as the
    Pallas panel kernel. Drop-in for `blocked_cholesky`.

    IN-PLACE structure: the loop carry starts as A and is overwritten
    column panel by column panel — step j reads A's panel j (untouched so
    far) and the finished L columns < j0 from the same carry (the panel
    kernel masks contraction columns >= j0, so the not-yet-factored region
    never leaks in).  Peak memory is ONE matrix; donate the input at the
    caller's jit boundary to elide the initial copy entirely."""
    n = a.shape[0]
    if n % block:
        raise ValueError(f"matrix size {n} must be a multiple of block {block}")
    nb = n // block
    dt = a.dtype
    col_idx = jnp.arange(n)
    if panel_solve is None:
        panel_solve = _PANEL_SOLVE

    def body(j, m):
        j0 = j * block
        a_panel = lax.dynamic_slice(m, (0, j0), (n, block))
        l_row = lax.dynamic_slice(m, (j0, 0), (block, n))
        a_panel = panel_update_pallas(m, l_row, a_panel, j0, block=block)
        d = lax.dynamic_slice(a_panel, (j0, 0), (block, block))
        ld = jnp.linalg.cholesky(d)
        if panel_solve == "inv":
            # Serial-panel-bound fix (module comment at _PANEL_SOLVE): the
            # (B, B) inverse by exact substitution, then ONE Pallas bf16x3
            # GEMM against the panel — no (n, B) transposes, no full-panel
            # XLA trisolve on the 64-step critical path.
            panel = panel_scale_pallas(a_panel, _tri_small_inv(ld))
        else:
            # XLA path kept selectable (GPIS_PANEL_SOLVE=xla): exact
            # backward-stable substitution, at 1-2 ms per step of
            # panel-thin HIGHEST trisolve plus two full-panel transposes.
            # (Note: the XLA-level bf16x3 split miscompiles to NaN inside
            # fori_loop on this backend; only in-kernel splits are
            # trustworthy.)
            panel = lax.linalg.triangular_solve(
                ld, a_panel.T, left_side=True, lower=True
            ).T
        row_mask = (col_idx >= j0)[:, None]
        panel = jnp.where(row_mask, panel, jnp.zeros((), dt))
        panel = lax.dynamic_update_slice(panel, ld, (j0, 0))
        return lax.dynamic_update_slice(m, panel, (0, j0))

    return lax.fori_loop(0, nb, body, a)
