"""Fused posterior-query Pallas kernel (speed-of-light dense-grid path).

`predict` with W = L^{-1} does: assemble kq = K(Q,X) (HBM write+read), then
mean = kq @ alpha and v = W kq^T, quad = colsum(v^2).  This kernel fuses all
of it: each (TI, TC) tile of W meets a (TQ, TC) tile of kq that is
*generated in VMEM* from the coordinate vectors — the cross-covariance never
exists in HBM.  Per query chunk the only HBM traffic is W's lower triangle
(read once per TQ-sized query tile; dead upper-half DMAs are elided by the
index map) plus O(M) outputs.

    grid (M/TQ, C/TI, C/TC), c innermost:
      r2/kq tile from per-dim coordinate broadcasts (VPU), gated to the
        live lower-triangular half plus the i==0 mean plane
      v_scratch (TI, TQ) accumulates W_tile @ kq^T over c     (MXU)
      at the last c-tile: quad[mq] += colsum(v^2)
      mean[mq] accumulates kq @ alpha on the i==0 plane

Returns (mean (M,), quad (M,)); var = k(0) - quad at the caller.  Validated
against the linv predict path in tests (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels.pallas_gram import _coord_split, _interpret
from gpis_tpu.linalg.pallas_chol import _dot3

__all__ = ["fused_query_pallas", "fused_quad_band_pallas", "quad_dot",
           "staged_query_from_kq"]

# Staged-kq variant (round 5): the on-the-fly kernel regenerates each
# (TQ, TC) kq tile once per LIVE i-plane — at 16k/TI=1024 that is ~8.5
# VPU generations per unique tile, and the r2+exp chain competes with the
# MXU for the critical path (the kernel measured 52% of MXU peak with the
# VPU work as the named residual, docs/PERF.md rooflines).  The staged
# path generates kq ONCE into an HBM buffer (one write-bound Pallas pass,
# ~6 ms per 8192-query chunk at 16k) and the quad kernel then READS tiles
# instead of generating them: HBM pays M*C*4 bytes of extra write+read
# traffic (~1 GB per chunk at 16k = ~2.5 ms at 819 GB/s) to take the VPU
# off the MXU's path entirely.  Gated by buffer size (GPIS_QSTAGE_MAX
# bytes) so beyond-HBM capacities fall back to the on-the-fly kernel.

# Large query tile: W is re-streamed from HBM once per query tile, so TQ
# sets the arithmetic intensity — at TQ=256 the kernel was W-DMA-bound
# (~1 GB x M/TQ per chunk); TQ=1024 amortizes W 4x and leaves the MXU
# (lower-triangular tiles only) as the critical path.  VMEM per step:
# W tile 256 KB + kq 1 MB + v_scr 1 MB + outputs — well under budget.
#
# TI taller than TC cuts the kq-generation bill: kq depends on (mq, c)
# only, yet is re-formed per i-plane — C/TI times — and its exp() chain is
# VPU work that competes with the MXU for the critical path.  Swept on
# hardware at 16k (2026-08-18): TI 256/512/1024 -> 1.867/1.528/1.384 s for
# the 64^3 grid; TI=2048 and TC=512 both exceed the 16 MB scoped-VMEM
# limit (v_scr TIxTQ f32 + double-buffered W tiles, ~19 MB).  Env
# overrides (GPIS_QTILE_Q/I/C) exist for re-sweeps.
import os as _os


def _tile_env(name: str, default: int) -> int:
    v = int(_os.environ.get(name, str(default)))
    # Power-of-two multiples of 128 only: the per-call clamp loop halves
    # down to a divisor of the capacity, and a stray value (0, 384, ...)
    # would either divide by zero or degenerate to 1-row blocks with no
    # error pointing at the env var.
    if v < 128 or v & (v - 1):
        raise ValueError(
            f"{name}={v}: query tile sizes must be powers of two >= 128"
        )
    return v


_TQ = _tile_env("GPIS_QTILE_Q", 1024)
_TI = _tile_env("GPIS_QTILE_I", 1024)
_TC = _tile_env("GPIS_QTILE_C", 256)

# Mosaic lowers f32 dot_general to a SINGLE-pass bf16 MXU product.  That is
# fine for the mean GEMV (validated by the surface-RMSE gates) but too
# coarse for the variance quad: W = L^{-1} rows scale as noise^{-1/2}, the
# W kq^T contraction cancels heavily (|v| <= sqrt(k0) while individual
# products are O(10)), and the rounding error survives the cancellation —
# measured ~1e-2 absolute on O(1e-1) posterior variances at C=1024,
# noise=1e-3 (vs the exact quad from the same W).  The quad products
# therefore use the same in-kernel bf16x3 split as the Cholesky trailing
# update (linalg/pallas_chol._dot3, ~16-bit mantissa at 3x MXU time);
# GPIS_QUERY_SPLIT=0 restores the single-pass dots for sweeps.
_QSPLIT = _os.environ.get("GPIS_QUERY_SPLIT", "1").lower() not in (
    "0", "false", "off")


def quad_dot(w, kq):
    """(TI, TC) x (TQ, TC) -> (TI, TQ) contraction for the variance quad,
    f32-accurate in-kernel (bf16x3 split unless GPIS_QUERY_SPLIT=0)."""
    dims = (((1,), (1,)), ((), ()))
    if _QSPLIT:
        return _dot3(w, kq, dims)
    return jax.lax.dot_general(
        w, kq, dimension_numbers=dims, preferred_element_type=jnp.float32)
# The sharded ring's band kernel keeps fixed tiles: per-chip W bands are
# C/n_devices rows, frequently smaller than the single-chip TI sweep above.
_TQB, _TIB, _TCB = 1024, 256, 256


def _kernel(q0, q1, q2, x0, x1, x2, w_ref, alpha_ref, ls_ref, sv_ref,
            mean_ref, quad_ref, v_scr, *, name, ti, tc):
    i = pl.program_id(1)
    c = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        v_scr[...] = jnp.zeros_like(v_scr)

    @pl.when((i == 0) & (c == 0))
    def _():
        mean_ref[...] = jnp.zeros_like(mean_ref)
        quad_ref[...] = jnp.zeros_like(quad_ref)

    # W is lower-triangular: tiles whose columns all exceed the tile's last
    # row are identically zero, so the MXU skips the strict upper half — 2x
    # fewer FLOPs on the dominant contraction.  The kq tile (r2 + exp chain,
    # VPU) is ALSO gated: it used to be formed unconditionally, but the VPU
    # generation is re-run per i-plane and competes with the MXU for the
    # critical path; only the live half plus the i == 0 mean plane needs it.
    live = c * tc < (i + 1) * ti

    @pl.when(live | (i == 0))
    def _():
        d0 = q0[...] - x0[...]
        d1 = q1[...] - x1[...]
        d2 = q2[...] - x2[...]
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        params = {"lengthscale": ls_ref[0, 0],
                  "signal_variance": sv_ref[0, 0]}
        kq = kf.k_r2(name, r2, params)  # (TQ, TC)

        @pl.when(live)
        def _():
            v_scr[...] += quad_dot(w_ref[...], kq).astype(v_scr.dtype)  # (TI, TQ)

        @pl.when(i == 0)
        def _():
            mean_ref[...] += jax.lax.dot_general(
                kq, alpha_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(mean_ref.dtype).T  # (1, TQ)

    @pl.when(c == nc - 1)
    def _():
        quad_ref[...] += jnp.sum(v_scr[...] * v_scr[...], axis=0)[None, :].astype(
            quad_ref.dtype
        )


def _band_quad_kernel(row0_ref, q0, q1, q2, x0, x1, x2, w_ref, ls_ref, sv_ref,
                      quad_ref, v_scr, *, name):
    i = pl.program_id(1)
    c = pl.program_id(2)
    nc = pl.num_programs(2)
    row0 = row0_ref[0]

    @pl.when(c == 0)
    def _():
        v_scr[...] = jnp.zeros_like(v_scr)

    # W band rows sit at global rows [row0 + i*TI, row0 + (i+1)*TI); tiles
    # whose columns all exceed the last global row are zero (W lower-tri).
    @pl.when(c * _TCB < row0 + (i + 1) * _TIB)
    def _():
        d0 = q0[...] - x0[...]
        d1 = q1[...] - x1[...]
        d2 = q2[...] - x2[...]
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        params = {"lengthscale": ls_ref[0, 0], "signal_variance": sv_ref[0, 0]}
        kq = kf.k_r2(name, r2, params)  # (TQ, TC)
        v_scr[...] += quad_dot(w_ref[...], kq).astype(v_scr.dtype)

    @pl.when(c == nc - 1)
    def _():
        @pl.when(i == 0)
        def _():
            quad_ref[...] = jnp.zeros_like(quad_ref)

        quad_ref[...] += jnp.sum(v_scr[...] * v_scr[...], axis=0)[None, :].astype(
            quad_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("name",))
def fused_quad_band_pallas(name: str, q, x, params, w_band, row0):
    """quad partial ||W_band kq^T||^2 colsums for a row band of W at global
    rows [row0, row0+R) — the per-hop contribution of the sharded ring
    variance (`linalg.sharded.sharded_predict_linv`), with the
    cross-covariance generated in VMEM (never in HBM) and lower-triangular
    tiles skipped.  Returns (M,)."""
    m, c = q.shape[0], x.shape[0]
    r = w_band.shape[0]
    dt = q.dtype
    if c % _TIB or c % _TCB or r % _TIB:
        raise ValueError(
            f"W band ({r}, {c}) must tile into {_TIB} x {_TCB} blocks"
        )
    qc, _ = _coord_split(q.astype(dt), _TQB)
    _, xr = _coord_split(x.astype(dt), _TCB)
    mp = qc[0].shape[0]
    ls = jnp.asarray(params["lengthscale"], dt).reshape(1, 1)
    sv = jnp.asarray(params["signal_variance"], dt).reshape(1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // _TQB, r // _TIB, c // _TCB),
        in_specs=[
            *[pl.BlockSpec((_TQB, 1), lambda mq, i, cc, s: (mq, 0), memory_space=pltpu.VMEM)] * 3,
            *[pl.BlockSpec((1, _TCB), lambda mq, i, cc, s: (0, cc), memory_space=pltpu.VMEM)] * 3,
            # Columns beyond the band's last global row are zero (W is
            # lower-triangular; trimmed panels are zero-padded): clamp the
            # block index to the last live column so the repeated index
            # elides those tiles' DMAs — the scalar-prefetched row0 makes
            # the liveness bound available to the index map.
            pl.BlockSpec(
                (_TIB, _TCB),
                lambda mq, i, cc, s: (
                    i, jnp.minimum(cc, (s[0] + (i + 1) * _TIB - 1) // _TCB)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda mq, i, cc, s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda mq, i, cc, s: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TQB), lambda mq, i, cc, s: (0, mq), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((_TIB, _TQB), jnp.float32)],
    )
    quad = pl.pallas_call(
        functools.partial(_band_quad_kernel, name=name),
        out_shape=jax.ShapeDtypeStruct((1, mp), dt),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.asarray([row0], jnp.int32), *qc, *xr, w_band, ls, sv)
    return quad[0, :m]


def _staged_kernel(w_ref, kq_ref, alpha_ref, mean_ref, quad_ref, v_scr,
                   *, ti, tc):
    """Quad/mean kernel reading PRE-STAGED kq tiles from HBM — no VPU
    generation on the critical path; same liveness gating and accumulator
    structure as _kernel."""
    i = pl.program_id(1)
    c = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        v_scr[...] = jnp.zeros_like(v_scr)

    @pl.when((i == 0) & (c == 0))
    def _():
        mean_ref[...] = jnp.zeros_like(mean_ref)
        quad_ref[...] = jnp.zeros_like(quad_ref)

    live = c * tc < (i + 1) * ti

    @pl.when(live)
    def _():
        v_scr[...] += quad_dot(w_ref[...], kq_ref[...]).astype(v_scr.dtype)

    @pl.when(i == 0)
    def _():
        mean_ref[...] += jax.lax.dot_general(
            kq_ref[...], alpha_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(mean_ref.dtype).T  # (1, TQ)

    @pl.when(c == nc - 1)
    def _():
        quad_ref[...] += jnp.sum(v_scr[...] * v_scr[...], axis=0)[None, :].astype(
            quad_ref.dtype
        )


def _stage_kq(name, qc, xr, ls, sv, *, mp, c, tc, dt):
    """Stage A: kq = K(Q, X) (mp, c) assembled in ONE write-bound Pallas
    pass (pallas_gram._cross_kernel body, TQ x tc tiles)."""
    from gpis_tpu.kernels.pallas_gram import _cross_kernel

    return pl.pallas_call(
        functools.partial(_cross_kernel, name=name),
        out_shape=jax.ShapeDtypeStruct((mp, c), dt),
        grid=(mp // _TQ, c // tc),
        in_specs=[
            *[pl.BlockSpec((_TQ, 1), lambda mq, cc: (mq, 0), memory_space=pltpu.VMEM)] * 3,
            *[pl.BlockSpec((1, tc), lambda mq, cc: (0, cc), memory_space=pltpu.VMEM)] * 3,
            pl.BlockSpec((1, 1), lambda mq, cc: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda mq, cc: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TQ, tc), lambda mq, cc: (mq, cc),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*qc, *xr, ls, sv)


def staged_query_from_kq(kq, w, alpha_row, *, ti: int, tc: int):
    """Stage B shared by the value AND joint fused queries: (mean, quad)
    from a PRE-STAGED (mp, C) kq in HBM against W (C, C) and alpha (1, C).
    Returns (1, mp) rows — callers slice.  Once kq exists, the quad is
    metadata-free, so the joint path reuses this call verbatim (its stage
    A is `pallas_joint.joint_rows_pallas` on value-query rows)."""
    mp, c = kq.shape
    dt = kq.dtype
    grid = (mp // _TQ, c // ti, c // tc)
    return pl.pallas_call(
        functools.partial(_staged_kernel, ti=ti, tc=tc),
        out_shape=(
            jax.ShapeDtypeStruct((1, mp), dt),
            jax.ShapeDtypeStruct((1, mp), dt),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ti, tc),
                lambda mq, i, cc: (i, jnp.minimum(cc, ((i + 1) * ti - 1) // tc)),
                memory_space=pltpu.VMEM,
            ),
            # kq tiles: needed on every LIVE step plus the whole i==0
            # mean plane; dead steps clamp to the last live column so
            # the repeated block index elides the fetch (same trick as
            # the W spec).
            pl.BlockSpec(
                (_TQ, tc),
                lambda mq, i, cc: (
                    mq,
                    jnp.where(i == 0, cc,
                              jnp.minimum(cc, ((i + 1) * ti - 1) // tc)),
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, tc), lambda mq, i, cc: (0, cc), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _TQ), lambda mq, i, cc: (0, mq), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ), lambda mq, i, cc: (0, mq), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((ti, _TQ), jnp.float32)],
        interpret=_interpret(),
    )(w, kq, alpha_row)


_QSTAGE_MAX = int(_os.environ.get("GPIS_QSTAGE_MAX", str(2 << 30)))
_QSTAGED_ENV = _os.environ.get("GPIS_QUERY_STAGED", "auto").lower()


def _want_staged(mp: int, c: int, ti: int, itemsize: int) -> bool:
    if _QSTAGED_ENV in ("0", "false", "off"):
        return False
    if _QSTAGED_ENV in ("1", "true", "on"):
        return True
    # auto: enough i-planes for the regeneration bill to matter, and a
    # staging buffer that leaves the model's W + factor comfortably
    # resident (beyond-HBM capacities keep the on-the-fly kernel).
    return c // ti >= 4 and mp * c * itemsize <= _QSTAGE_MAX


@functools.partial(jax.jit, static_argnames=("name", "staged"))
def fused_query_pallas(name: str, q, x, params, alpha, w, staged: bool | None = None):
    """(mean, quad) at queries q (M,3); w = L^{-1} (C,C); alpha (C,).

    staged=None (default) auto-selects the two-pass staged-kq variant
    (module comment above) for in-core capacities; pass True/False to
    force a path (tile sweeps, parity tests)."""
    m, c = q.shape[0], x.shape[0]
    dt = q.dtype
    if c % 128:
        raise ValueError(f"capacity {c} must be a multiple of 128")
    # Clamp the sweep-tunable tiles down to divisors of this capacity (the
    # parity tests run at C=256..1024; the headline sizes take the defaults).
    ti, tc = _TI, _TC
    while c % ti:
        ti //= 2
    while c % tc:
        tc //= 2
    qc, _ = _coord_split(q.astype(dt), _TQ)
    _, xr = _coord_split(x.astype(dt), tc)
    mp = qc[0].shape[0]
    ls = jnp.asarray(params["lengthscale"], dt).reshape(1, 1)
    sv = jnp.asarray(params["signal_variance"], dt).reshape(1, 1)
    alpha_row = jnp.asarray(alpha, dt)[None, :]  # (1, C)

    if staged is None:
        staged = _want_staged(mp, c, ti, jnp.dtype(dt).itemsize)
    if staged:
        kq = _stage_kq(name, qc, xr, ls, sv, mp=mp, c=c, tc=tc, dt=dt)
        mean, quad = staged_query_from_kq(kq, w, alpha_row, ti=ti, tc=tc)
        return mean[0, :m], quad[0, :m]

    grid = (mp // _TQ, c // ti, c // tc)
    mean, quad = pl.pallas_call(
        functools.partial(_kernel, name=name, ti=ti, tc=tc),
        out_shape=(
            jax.ShapeDtypeStruct((1, mp), dt),
            jax.ShapeDtypeStruct((1, mp), dt),
        ),
        grid=grid,
        in_specs=[
            *[pl.BlockSpec((_TQ, 1), lambda mq, i, cc: (mq, 0), memory_space=pltpu.VMEM)] * 3,
            *[pl.BlockSpec((1, tc), lambda mq, i, cc: (0, cc), memory_space=pltpu.VMEM)] * 3,
            # W DMA elision on the dead upper half: tiles with
            # c*TC >= (i+1)*TI are identically zero and never read (the
            # kernel gates the dot), so their index maps to the LAST live
            # column block of row i — consecutive grid steps with an
            # unchanged block index skip the fetch entirely, halving W's
            # HBM traffic (the BlockSpec DMA is otherwise unconditional,
            # pl.when does not stop it).
            pl.BlockSpec(
                (ti, tc),
                lambda mq, i, cc: (i, jnp.minimum(cc, ((i + 1) * ti - 1) // tc)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, tc), lambda mq, i, cc: (0, cc), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda mq, i, cc: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda mq, i, cc: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _TQ), lambda mq, i, cc: (0, mq), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ), lambda mq, i, cc: (0, mq), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((ti, _TQ), jnp.float32)],
        interpret=_interpret(),
    )(*qc, *xr, w, alpha_row, ls, sv)
    return mean[0, :m], quad[0, :m]
