"""Tiled Pallas kernels for derivative-observation covariance blocks
(BASELINE config 2 at scale; SURVEY.md §8 step 4).

The joint 4C x 4C Gram decomposes into a 4x4 grid of dense C x C blocks
(dimension-major layout, `gpis_tpu.kernels.derivative`).  The jnp assembly
materializes (C, C, 3) difference tensors — 3x the Gram itself in HBM
traffic; these kernels compute each block tile-by-tile with the per-dim
coordinate split of `pallas_gram` (fused distance + derivative factors, one
HBM write per element).

Blocks:
  value-value  k(r2)                               (pallas_gram.gram_pallas)
  value-grad   -2 dk_dr2 (x_d - z_d)               kfg_pallas(d)
  grad-grad    -2 dk_dr2 δ_de - 4 d2k_dr2 diff_d diff_e   kgg_pallas(d, e)

Symmetries used by the assembler: K_gf = K_fg^T per dim; K_gg(e,d) =
K_gg(d,e)^T.  `joint_gram_pallas` assembles the full matrix (13 unique
block computations instead of 16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels.pallas_gram import _TM, _TN, _coord_split, _interpret

__all__ = ["kfg_pallas", "kgg_pallas", "joint_gram_pallas"]


def _kfg_kernel(x0, x1, x2, z0, z1, z2, ls_ref, sv_ref, out_ref, *, name, d):
    diffs = (x0[...] - z0[...], x1[...] - z1[...], x2[...] - z2[...])
    r2 = diffs[0] * diffs[0] + diffs[1] * diffs[1] + diffs[2] * diffs[2]
    params = {"lengthscale": ls_ref[0, 0], "signal_variance": sv_ref[0, 0]}
    out_ref[...] = -2.0 * kf.dk_dr2(name, r2, params) * diffs[d]


def _kgg_kernel(x0, x1, x2, z0, z1, z2, noise, ls_ref, sv_ref, out_ref, *,
                name, d, e, diag_block):
    i, j = pl.program_id(0), pl.program_id(1)
    diffs = (x0[...] - z0[...], x1[...] - z1[...], x2[...] - z2[...])
    r2 = diffs[0] * diffs[0] + diffs[1] * diffs[1] + diffs[2] * diffs[2]
    params = {"lengthscale": ls_ref[0, 0], "signal_variance": sv_ref[0, 0]}
    dk = kf.dk_dr2(name, r2, params)
    d2k = kf.d2k_dr2(name, r2, params)
    # The d2k term is multiplied by diff products vanishing at r=0; mask the
    # (potentially singular) clamped value there explicitly.
    outer = diffs[d] * diffs[e]
    val = -4.0 * jnp.where(r2 <= 1e-24, 0.0, d2k * outer)
    if d == e:
        val = val - 2.0 * dk
    out_ref[...] = val

    if diag_block and d == e:
        # r=0 already yields the exact -2 dk(0) value (the d2k term is
        # masked); only the observation noise needs adding on the diagonal.
        @pl.when(i == j)
        def _():
            rows = jax.lax.broadcasted_iota(jnp.int32, (_TN, _TM), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (_TN, _TM), 1)
            diag = rows == cols
            out_ref[...] = jnp.where(diag, out_ref[...] + noise[...], out_ref[...])


def _call_block(kernel_fn, q, x, params, extra_inputs=(), extra_specs=()):
    m, n = q.shape[0], x.shape[0]
    dt = q.dtype
    qc, _ = _coord_split(q, _TN)
    _, xr = _coord_split(x, _TM)
    mp, np_ = qc[0].shape[0], xr[0].shape[1]
    ls = jnp.asarray(params["lengthscale"], dt).reshape(1, 1)
    sv = jnp.asarray(params["signal_variance"], dt).reshape(1, 1)
    out = pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((mp, np_), dt),
        grid=(mp // _TN, np_ // _TM),
        in_specs=[
            *[pl.BlockSpec((_TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)] * 3,
            *[pl.BlockSpec((1, _TM), lambda i, j: (0, j), memory_space=pltpu.VMEM)] * 3,
            *extra_specs,
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TN, _TM), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*qc, *xr, *extra_inputs, ls, sv)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("name", "d"))
def kfg_pallas(name: str, q, x, params, d: int):
    """cov(f(q_i), d_d f(x_j)) block: (M, N)."""
    return _call_block(functools.partial(_kfg_kernel, name=name, d=d), q, x, params)


@functools.partial(jax.jit, static_argnames=("name", "d", "e", "diag_block"))
def kgg_pallas(name: str, q, x, params, d: int, e: int, noise=None,
               diag_block: bool = False):
    """cov(d_d f(q_i), d_e f(x_j)) block: (M, N). With diag_block=True (same
    point set), the r=0 diagonal gets the exact -2 dk(0) δ value plus
    per-point gradient noise."""
    dt = q.dtype
    if noise is None:
        noise = jnp.zeros((x.shape[0],), dt)
    np_pad = -(-x.shape[0] // max(_TN, _TM)) * max(_TN, _TM)
    noise_row = jnp.pad(
        jnp.broadcast_to(jnp.asarray(noise, dt), (x.shape[0],)),
        (0, np_pad - x.shape[0]),
    )[None, :]
    return _call_block(
        functools.partial(_kgg_kernel, name=name, d=d, e=e, diag_block=diag_block),
        q, x, params,
        extra_inputs=(noise_row,),
        extra_specs=(pl.BlockSpec((1, _TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),),
    )


def joint_gram_pallas(name: str, x, params, noise_f, noise_g):
    """Full (4C, 4C) joint Gram assembled from tiled blocks (13 unique
    computations; K_gf and K_gg(e>d) reuse transposes)."""
    from gpis_tpu.kernels.pallas_gram import gram_pallas

    c = x.shape[0]
    dt = x.dtype
    noise_f = jnp.broadcast_to(jnp.asarray(noise_f, dt), (c,))
    noise_g = jnp.broadcast_to(jnp.asarray(noise_g, dt), (c,))

    kff = gram_pallas(name, x, params, noise_f)
    kfg = [kfg_pallas(name, x, x, params, d) for d in range(3)]
    kgg = {}
    for d in range(3):
        for e in range(d, 3):
            kgg[(d, e)] = kgg_pallas(
                name, x, x, params, d, e,
                noise=noise_g if d == e else None, diag_block=(d == e),
            )
    rows = [jnp.concatenate([kff] + kfg, axis=1)]
    for d in range(3):
        blocks = [kfg[d].T]
        for e in range(3):
            blocks.append(kgg[(d, e)] if d <= e else kgg[(e, d)].T)
        rows.append(jnp.concatenate(blocks, axis=1))
    return jnp.concatenate(rows, axis=0)
