"""Tiled Pallas kernels for Gram / cross-covariance assembly (north-star
component: "covariance assembly ... runs as tiled Pallas kernels writing an
HBM-resident Gram matrix"; reference hot loop #1, SURVEY.md §4.1).

Design (see /opt/skills/guides/pallas_guide.md):

* Coordinates are pre-split into per-dimension column vectors x_d (N, 1) and
  row vectors z_d (1, M) so each (TN, TM) tile computes
  r2 = sum_d (x_d - z_d)^2 as three fused broadcast-subtract-square VPU
  sweeps — the direct (cancellation-free) form, not the ||x||^2 - 2x.z
  matmul identity, which loses ~half the mantissa exactly where it matters
  (r -> 0).  With K=3 the matmul form couldn't tile the MXU anyway.
* The covariance function is applied in the same kernel — the distance
  matrix never exists in HBM.  One HBM write per Gram element: the kernel is
  purely bandwidth-bound at the speed-of-light (N*M*4 bytes written).
* Diagonal handling for the symmetric Gram (exact k(0) + per-point noise)
  happens in-kernel via broadcasted_iota row/col comparison — only diagonal
  tiles pay for it.
* On non-TPU backends the kernels run in interpreter mode, so the whole test
  suite exercises identical code paths on CPU (SURVEY.md §5 item 3).

Tile size 256x256 f32: 256 KB out + ~400 KB coordinate tiles, comfortably
double-buffered in 16 MB VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpis_tpu.kernels import functions as kf

__all__ = ["cross_cov_pallas", "gram_pallas", "gram_band_pallas"]

_TN = 256
_TM = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _pad_rows(a, mult, fill=0.0):
    n = a.shape[0]
    p = _cdiv(n, mult) * mult - n
    if p == 0:
        return a
    return jnp.pad(a, ((0, p),) + ((0, 0),) * (a.ndim - 1), constant_values=fill)


def _coord_split(x, m_pad):
    """(N,3) -> three (N_pad, 1) columns; and transposed (1, N_pad) rows."""
    xp = _pad_rows(x, m_pad)
    cols = [xp[:, d : d + 1] for d in range(3)]
    rows = [c.T for c in cols]
    return cols, rows


def _cross_kernel(x0, x1, x2, z0, z1, z2, ls_ref, sv_ref, out_ref, *, name):
    d0 = x0[...] - z0[...]
    d1 = x1[...] - z1[...]
    d2 = x2[...] - z2[...]
    r2 = d0 * d0 + d1 * d1 + d2 * d2
    params = {"lengthscale": ls_ref[0, 0], "signal_variance": sv_ref[0, 0]}
    out_ref[...] = kf.k_r2(name, r2, params)


def _gram_kernel(x0, x1, x2, z0, z1, z2, noise, ls_ref, sv_ref, out_ref, *, name):
    i, j = pl.program_id(0), pl.program_id(1)
    d0 = x0[...] - z0[...]
    d1 = x1[...] - z1[...]
    d2 = x2[...] - z2[...]
    r2 = d0 * d0 + d1 * d1 + d2 * d2
    params = {"lengthscale": ls_ref[0, 0], "signal_variance": sv_ref[0, 0]}
    k = kf.k_r2(name, r2, params)
    out_ref[...] = k

    @pl.when(i == j)
    def _():
        # Diagonal tile: exact k(0) plus per-point observation noise.
        rows = jax.lax.broadcasted_iota(jnp.int32, (_TN, _TM), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (_TN, _TM), 1)
        diag = rows == cols
        k0 = kf.k_diag0(name, params).astype(out_ref.dtype)
        out_ref[...] = jnp.where(diag, k0 + noise[...], out_ref[...])


@functools.partial(jax.jit, static_argnames=("name",))
def cross_cov_pallas(name: str, q, x, params):
    """K(Q, X): (M, N) cross-covariance, tiled. Drop-in for
    `gpis_tpu.kernels.gram.cross_cov`."""
    m, n = q.shape[0], x.shape[0]
    dt = q.dtype
    qc, _ = _coord_split(q.astype(dt), _TN)
    _, xr = _coord_split(x.astype(dt), _TM)
    mp, np_ = qc[0].shape[0], xr[0].shape[1]
    ls = jnp.asarray(params["lengthscale"], dt).reshape(1, 1)
    sv = jnp.asarray(params["signal_variance"], dt).reshape(1, 1)

    grid = (mp // _TN, np_ // _TM)
    out = pl.pallas_call(
        functools.partial(_cross_kernel, name=name),
        out_shape=jax.ShapeDtypeStruct((mp, np_), dt),
        grid=grid,
        in_specs=[
            *[pl.BlockSpec((_TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)] * 3,
            *[pl.BlockSpec((1, _TM), lambda i, j: (0, j), memory_space=pltpu.VMEM)] * 3,
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TN, _TM), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*qc, *xr, ls, sv)
    return out[:m, :n]


def _band_kernel(row0_ref, x0, x1, x2, z0, z1, z2, noise_col, ls_ref, sv_ref,
                 out_ref, *, name):
    i, j = pl.program_id(0), pl.program_id(1)
    row0 = row0_ref[0]
    d0 = x0[...] - z0[...]
    d1 = x1[...] - z1[...]
    d2 = x2[...] - z2[...]
    r2 = d0 * d0 + d1 * d1 + d2 * d2
    params = {"lengthscale": ls_ref[0, 0], "signal_variance": sv_ref[0, 0]}
    k = kf.k_r2(name, r2, params)
    # Band rows live at global rows [row0, row0+R): the diagonal entry of
    # local row r sits at global column row0 + r.
    rows_g = row0 + i * _TN + jax.lax.broadcasted_iota(jnp.int32, (_TN, _TM), 0)
    cols_g = j * _TM + jax.lax.broadcasted_iota(jnp.int32, (_TN, _TM), 1)
    k0 = kf.k_diag0(name, params).astype(out_ref.dtype)
    out_ref[...] = jnp.where(rows_g == cols_g, k0 + noise_col[...], k)


@functools.partial(jax.jit, static_argnames=("name",))
def gram_band_pallas(name: str, x_band, x_full, params, noise_band, row0):
    """K(X_band, X_full) + band diagonal noise: the (R, C) row band of the
    global Gram for rows [row0, row0+R) — the per-device tile of
    `linalg.sharded.sharded_gram`.  row0 is a traced scalar (device-band
    offset), delivered via scalar prefetch so one compiled kernel serves
    every device."""
    r, c = x_band.shape[0], x_full.shape[0]
    dt = x_band.dtype
    bc, _ = _coord_split(x_band.astype(dt), _TN)
    _, xr = _coord_split(x_full.astype(dt), _TM)
    rp, cp = bc[0].shape[0], xr[0].shape[1]
    noise_col = _pad_rows(
        jnp.broadcast_to(jnp.asarray(noise_band, dt), (r,)), _TN
    )[:, None]
    ls = jnp.asarray(params["lengthscale"], dt).reshape(1, 1)
    sv = jnp.asarray(params["signal_variance"], dt).reshape(1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rp // _TN, cp // _TM),
        in_specs=[
            *[pl.BlockSpec((_TN, 1), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM)] * 3,
            *[pl.BlockSpec((1, _TM), lambda i, j, s: (0, j), memory_space=pltpu.VMEM)] * 3,
            pl.BlockSpec((_TN, 1), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j, s: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TN, _TM), lambda i, j, s: (i, j), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_band_kernel, name=name),
        out_shape=jax.ShapeDtypeStruct((rp, cp), dt),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.asarray([row0], jnp.int32), *bc, *xr, noise_col, ls, sv)
    return out[:r, :c]


@functools.partial(jax.jit, static_argnames=("name",))
def gram_pallas(name: str, x, params, noise):
    """K(X, X) + diag(noise): (N, N) symmetric Gram with in-kernel diagonal.
    Drop-in for `gpis_tpu.kernels.gram.gram`. noise: (N,) vector."""
    n = x.shape[0]
    dt = x.dtype
    cols, rows = _coord_split(x.astype(dt), max(_TN, _TM))
    np_ = cols[0].shape[0]
    noise_row = jnp.pad(
        jnp.broadcast_to(jnp.asarray(noise, dt), (n,)), (0, np_ - n)
    )[None, :]
    ls = jnp.asarray(params["lengthscale"], dt).reshape(1, 1)
    sv = jnp.asarray(params["signal_variance"], dt).reshape(1, 1)

    grid = (np_ // _TN, np_ // _TM)
    out = pl.pallas_call(
        functools.partial(_gram_kernel, name=name),
        out_shape=jax.ShapeDtypeStruct((np_, np_), dt),
        grid=grid,
        in_specs=[
            *[pl.BlockSpec((_TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)] * 3,
            *[pl.BlockSpec((1, _TM), lambda i, j: (0, j), memory_space=pltpu.VMEM)] * 3,
            pl.BlockSpec((1, _TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TN, _TM), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*cols, *rows, noise_row, ls, sv)
    return out[:n, :n]
