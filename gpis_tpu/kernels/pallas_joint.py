"""ONE flag-blended Pallas kernel family for every joint (value+gradient)
covariance surface (config 2; SURVEY.md §3 C1 derivative-capable kernels,
§8 step 4).

The round-2 implementation (kernels/pallas_deriv.py) assembled the joint
4C x 4C Gram from 13 specialized block kernels — correct, but each block
shape cost its own remote Mosaic compile: ~8 minutes of one-time compile on
the first config-2 fit at ~5k points (BASELINE.md round-2 notes).  The
sharded joint assembly (gp/sharded_joint.py:46) already showed the fix: give
every joint index i metadata

    p_i (3,)  coordinates        u_i (3,)  gradient direction (0 for values)
    f_i  ()   1.0 if a value row

and blend the four block formulas (kernels/derivative.py:8-11) into one
expression valid for ANY (row, col) pair.  With diff = p_r - p_c:

    K[r, c] = f_r f_c k(r2)                       value-value
            + 2 dk (u_r . diff) f_c               grad-value
            - 2 dk (u_c . diff) f_r               value-grad
            - 2 dk (u_r . u_c)                    grad-grad delta term
            - 4 d2k (u_r . diff)(u_c . diff)      grad-grad outer term

(each term self-selects: u vanishes on value rows, f on gradient rows).
One Pallas kernel computes any (TN, TM) tile of any joint operator — the
full Gram, a sharded row band, or a query cross-covariance — so the joint
path compiles exactly TWO Mosaic kernels (assembly + fused query) instead
of 13.

The fused joint query kernel mirrors kernels/pallas_query.fused_query_pallas:
each W tile meets a cross-covariance tile GENERATED IN VMEM from the column
metadata, so kq never exists in HBM and the HIGHEST-precision GEMM chain of
the old joint predict (gp/derivative.py round-2, ~1 actual TFLOP/s on this
backend) is replaced by Mosaic dots (bf16x3 split on the variance quad —
see kernels/pallas_query.quad_dot; single-pass for the mean GEMV).

Parity: tests/test_pallas_joint.py checks every surface against the dense
jnp reference (kernels/derivative.py) in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels.pallas_gram import _TM, _TN, _interpret, _pad_rows
from gpis_tpu.kernels.pallas_query import (_TC, _TCB, _TI, _TIB, _TQ, _TQB,
                                           quad_dot)

__all__ = ["joint_meta", "joint_rows_ref", "joint_rows_pallas",
           "joint_gram_fused_pallas", "joint_cross_value_pallas",
           "fused_joint_query_pallas", "fused_joint_quad_band_pallas"]

# Query tiles for the fused joint query are SHARED with the value kernel
# (kernels/pallas_query.py, env GPIS_QTILE_Q/I/C): the sizing arguments are
# identical — TQ sets how often W is re-streamed from HBM, and TI taller
# than TC cuts the per-i-plane kq regeneration, which for the joint blend
# is ~2x the VPU work per element (dk chain + direction dot).  Per-call the
# tiles clamp down to divisors of the joint size J = 4C + T.


def joint_meta(x, touch_x=None):
    """Metadata arrays for the dimension-major joint index space
    [f(1..C) | d1(1..C) | d2(1..C) | d3(1..C) | f(touch 1..T)]:
    returns (coords (J, 3), dirs (J, 3), flag (J,)) with J = 4C + T."""
    c = x.shape[0]
    dt = x.dtype
    reps = [x, x, x, x]
    dirs = [jnp.zeros((c, 3), dt)]
    flag = [jnp.ones((c,), dt), jnp.zeros((3 * c,), dt)]
    for d in range(3):
        e = jnp.zeros((1, 3), dt).at[0, d].set(1.0)
        dirs.append(jnp.broadcast_to(e, (c, 3)))
    if touch_x is not None:
        t = touch_x.shape[0]
        reps.append(touch_x.astype(dt))
        dirs.append(jnp.zeros((t, 3), dt))
        flag.append(jnp.ones((t,), dt))
    return (jnp.concatenate(reps, axis=0), jnp.concatenate(dirs, axis=0),
            jnp.concatenate(flag))


def _joint_tile(d0, d1, d2, ud, vd, uv, fr, fc, name, params, dt):
    """The blended joint-covariance tile given per-tile broadcasts."""
    r2 = d0 * d0 + d1 * d1 + d2 * d2
    zero = r2 <= 1e-24
    k = kf.k_r2(name, r2, params)
    # Exact k(0) where points coincide (thin-plate's log clamp); the same
    # pin the dense assembly applies on its diagonal.
    k = jnp.where(zero, kf.k_diag0(name, params).astype(dt), k)
    dk = kf.dk_dr2(name, r2, params)
    h = kf.d2k_dr2(name, r2, params)
    # d2k may be singular at r=0 (thin-plate); its term carries diff
    # factors that vanish there — mask the product, exactly like the dense
    # reference masks d2k*outer.
    outer = jnp.where(zero, 0.0, h * ud * vd)
    return (fr * fc * k + 2.0 * dk * (ud * fc - vd * fr - uv)
            - 4.0 * outer)


def joint_rows_ref(name: str, rmeta, cmeta, params, noise_col=None, row0=0):
    """Dense jnp evaluation of the same blended joint operator rows —
    the CPU / fallback twin of `joint_rows_pallas` (identical formula via
    `_joint_tile`, so the two paths agree to rounding).  Materializes an
    (R, S, 3) broadcast: fine for row bands and small crosses, not for a
    full 100k-class Gram."""
    rc, rd, rf = rmeta
    cc, cd, cf = cmeta
    dt = rc.dtype
    diff = rc[:, None, :] - cc[None, :, :]            # (R, S, 3)
    d0, d1, d2 = diff[..., 0], diff[..., 1], diff[..., 2]
    ud = jnp.einsum("rd,rsd->rs", rd, diff)
    vd = jnp.einsum("sd,rsd->rs", cd, diff)
    uv = jnp.dot(rd, cd.T)
    out = _joint_tile(d0, d1, d2, ud, vd, uv, rf[:, None], cf[None, :],
                      name, params, dt)
    if noise_col is not None:
        r, s = out.shape
        rows_g = row0 + jax.lax.broadcasted_iota(jnp.int32, (r, s), 0)
        cols_g = jax.lax.broadcasted_iota(jnp.int32, (r, s), 1)
        out = jnp.where(rows_g == cols_g, out + noise_col[None, :], out)
    return out


def _rows_kernel(row0_ref, r0, r1, r2c, ru0, ru1, ru2, rf,
                 z0, z1, z2, cu0, cu1, cu2, cf, noise_col,
                 ls_ref, sv_ref, out_ref, *, name):
    i, j = pl.program_id(0), pl.program_id(1)
    row0 = row0_ref[0]
    d0 = r0[...] - z0[...]
    d1 = r1[...] - z1[...]
    d2 = r2c[...] - z2[...]
    ud = ru0[...] * d0 + ru1[...] * d1 + ru2[...] * d2
    vd = cu0[...] * d0 + cu1[...] * d1 + cu2[...] * d2
    uv = ru0[...] * cu0[...] + ru1[...] * cu1[...] + ru2[...] * cu2[...]
    params = {"lengthscale": ls_ref[0, 0], "signal_variance": sv_ref[0, 0]}
    out = _joint_tile(d0, d1, d2, ud, vd, uv, rf[...], cf[...], name, params,
                      out_ref.dtype)
    # Diagonal observation noise: local row r is global joint row
    # row0 + i*TN + r; its noise lands at the equal global column.  Callers
    # assembling pure cross-covariances pass row0 = -(padded rows) so no
    # column can match.
    rows_g = row0 + i * _TN + jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    cols_g = j * _TM + jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    out_ref[...] = jnp.where(rows_g == cols_g, out + noise_col[...], out)


def _meta_cols(coords, dirs, flag, pad_to):
    """Row-vector layout (1, Jp) x 7 for a column operand."""
    cp = _pad_rows(coords, pad_to)
    dp = _pad_rows(dirs, pad_to)
    fp = _pad_rows(flag, pad_to)
    return ([cp[:, d : d + 1].T for d in range(3)]
            + [dp[:, d : d + 1].T for d in range(3)] + [fp[None, :]])


def _meta_rows(coords, dirs, flag, pad_to):
    """Column-vector layout (Jp, 1) x 7 for a row operand."""
    cp = _pad_rows(coords, pad_to)
    dp = _pad_rows(dirs, pad_to)
    fp = _pad_rows(flag, pad_to)
    return ([cp[:, d : d + 1] for d in range(3)]
            + [dp[:, d : d + 1] for d in range(3)] + [fp[:, None]])


@functools.partial(jax.jit, static_argnames=("name",))
def joint_rows_pallas(name: str, rmeta, cmeta, params, noise_col=None,
                      row0=None):
    """Generic joint-operator rows: K[rows, cols] for any row/col metadata
    (from `joint_meta`, or value-query rows).  rmeta/cmeta = (coords, dirs,
    flag).  `noise_col` (len cols) is added where global row index
    (row0 + local) equals the column index; row0 defaults to 0 (the full
    Gram / leading band).  ONE Mosaic compile serves every caller."""
    rc, rd, rf = rmeta
    cc, cd, cf = cmeta
    r, s = rc.shape[0], cc.shape[0]
    dt = rc.dtype
    rows_in = _meta_rows(rc, rd, rf, _TN)
    cols_in = _meta_cols(cc, cd, cf, _TM)
    rp, sp = rows_in[0].shape[0], cols_in[0].shape[1]
    if noise_col is None:
        noise_col = jnp.zeros((s,), dt)
        if row0 is None:
            row0 = -rp  # no global row can match a column index
    if row0 is None:
        row0 = 0
    ncol = jnp.pad(jnp.broadcast_to(jnp.asarray(noise_col, dt), (s,)),
                   (0, sp - s))[None, :]
    ls = jnp.asarray(params["lengthscale"], dt).reshape(1, 1)
    sv = jnp.asarray(params["signal_variance"], dt).reshape(1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rp // _TN, sp // _TM),
        in_specs=[
            *[pl.BlockSpec((_TN, 1), lambda i, j, s_: (i, 0),
                           memory_space=pltpu.VMEM)] * 7,
            *[pl.BlockSpec((1, _TM), lambda i, j, s_: (0, j),
                           memory_space=pltpu.VMEM)] * 7,
            pl.BlockSpec((1, _TM), lambda i, j, s_: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, s_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j, s_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TN, _TM), lambda i, j, s_: (i, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_rows_kernel, name=name),
        out_shape=jax.ShapeDtypeStruct((rp, sp), dt),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.asarray([row0], jnp.int32), *rows_in, *cols_in, ncol, ls, sv)
    return out[:r, :s]


def _joint_noise(c, noise_f, noise_g, touch_noise, dt):
    parts = [jnp.broadcast_to(jnp.asarray(noise_f, dt), (c,))]
    ng = jnp.broadcast_to(jnp.asarray(noise_g, dt), (c,))
    parts += [ng, ng, ng]
    if touch_noise is not None:
        t = touch_noise.shape[0]
        parts.append(jnp.broadcast_to(jnp.asarray(touch_noise, dt), (t,)))
    return jnp.concatenate(parts)


@functools.partial(jax.jit, static_argnames=("name",))
def joint_gram_fused_pallas(name: str, x, params, noise_f, noise_g,
                            touch_x=None, touch_noise=None):
    """Full (J, J) joint Gram, J = 4C + T, in ONE kernel launch — the
    replacement for the 13-block assembly (and its ~8-minute one-time
    Mosaic compile) of the round-2 pallas_deriv module."""
    meta = joint_meta(x, touch_x)
    dn = _joint_noise(x.shape[0], noise_f, noise_g, touch_noise, x.dtype)
    return joint_rows_pallas(name, meta, meta, params, noise_col=dn, row0=0)


@functools.partial(jax.jit, static_argnames=("name",))
def joint_cross_value_pallas(name: str, q, x, params, touch_x=None):
    """cov(f(q), joint obs): (M, J) — value-query rows against the joint
    columns, same single kernel."""
    dt = q.dtype
    m = q.shape[0]
    rmeta = (q.astype(dt), jnp.zeros((m, 3), dt), jnp.ones((m,), dt))
    return joint_rows_pallas(name, rmeta, joint_meta(x, touch_x), params)


# ------------------------------------------------- fused joint query


def _query_kernel(q0, q1, q2, z0, z1, z2, cu0, cu1, cu2, cf, w_ref,
                  alpha_ref, ls_ref, sv_ref, mean_ref, quad_ref, v_scr, *,
                  name, ti, tc):
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

    # W = chol^{-1} is lower-triangular: tiles whose columns all exceed the
    # tile's last row are zero.  The kq blend (k_r2 + dk_dr2 chains, VPU)
    # is gated like the dot — it is re-generated per i-plane and only the
    # live half plus the i == 0 mean plane reads it (same optimization as
    # pallas_query._kernel).
    live = c * tc < (i + 1) * ti

    @pl.when(live | (i == 0))
    def _():
        d0 = q0[...] - z0[...]
        d1 = q1[...] - z1[...]
        d2 = q2[...] - z2[...]
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        params = {"lengthscale": ls_ref[0, 0],
                  "signal_variance": sv_ref[0, 0]}
        # Value-query row (f=1, u=0) against a joint column: the blend
        # collapses to  f_c k(r2) - 2 dk (u_c . diff).
        vd = cu0[...] * d0 + cu1[...] * d1 + cu2[...] * d2
        kq = (cf[...] * kf.k_r2(name, r2, params)
              - 2.0 * kf.dk_dr2(name, r2, params) * vd)  # (TQ, TC)

        @pl.when(live)
        def _():
            # bf16x3 split: single-pass Mosaic dots are too coarse for the
            # cancelling variance quad (see kernels/pallas_query.quad_dot).
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
        quad_ref[...] += jnp.sum(v_scr[...] * v_scr[...], axis=0)[
            None, :
        ].astype(quad_ref.dtype)


@functools.partial(jax.jit, static_argnames=("name", "staged"))
def fused_joint_query_pallas(name: str, q, x, params, alpha, w,
                             touch_x=None, staged: bool | None = None):
    """(mean, quad) of f at queries q (M, 3) for a JOINT model: w = joint
    chol^{-1} (J, J), alpha (J,), J = 4C + T.  The (M, J) cross-covariance
    is generated tile-by-tile in VMEM from the column metadata — never in
    HBM — and W's strict upper triangle is skipped.  var = k(0) - quad at
    the caller (gp/derivative.predict).

    staged=None auto-selects the staged-kq variant for in-core J (same
    restructure as the value kernel, kernels/pallas_query module comment):
    stage A assembles the value-vs-joint cross in HBM via
    `joint_rows_pallas` (the blended dk chains run ONCE per (q, col) pair
    instead of once per live i-plane), stage B is the shared
    metadata-free quad kernel `pallas_query.staged_query_from_kq`."""
    m = q.shape[0]
    j = w.shape[0]
    dt = q.dtype
    if j % 128:
        raise ValueError(f"joint size {j} must be a multiple of 128")
    # Clamp the sweep-tunable tiles down to divisors of this joint size
    # (J = 4C + T is a 256-multiple for the standard layouts; 1024-aligned
    # capacities keep the fast tall TI — see config.align_capacity).
    ti, tc = _TI, _TC
    while j % ti:
        ti //= 2
    while j % tc:
        tc //= 2
    qp = _pad_rows(q.astype(dt), _TQ)
    mp = qp.shape[0]
    qc = [qp[:, d : d + 1] for d in range(3)]
    coords, dirs, flag = joint_meta(x, touch_x)
    cols_in = _meta_cols(coords, dirs, flag, tc)
    if cols_in[0].shape[1] != j:
        raise ValueError("joint metadata does not tile to the factor size")
    ls = jnp.asarray(params["lengthscale"], dt).reshape(1, 1)
    sv = jnp.asarray(params["signal_variance"], dt).reshape(1, 1)
    alpha_row = jnp.asarray(alpha, dt)[None, :]  # (1, J)

    from gpis_tpu.kernels.pallas_query import (_want_staged,
                                               staged_query_from_kq)

    if staged is None:
        staged = _want_staged(mp, j, ti, jnp.dtype(dt).itemsize)
    if staged:
        rmeta = (qp, jnp.zeros((mp, 3), dt), jnp.ones((mp,), dt))
        kq = joint_rows_pallas(name, rmeta, (coords, dirs, flag), params)
        mean, quad = staged_query_from_kq(kq, w, alpha_row, ti=ti, tc=tc)
        return mean[0, :m], quad[0, :m]

    grid = (mp // _TQ, j // ti, j // tc)
    mean, quad = pl.pallas_call(
        functools.partial(_query_kernel, name=name, ti=ti, tc=tc),
        out_shape=(
            jax.ShapeDtypeStruct((1, mp), dt),
            jax.ShapeDtypeStruct((1, mp), dt),
        ),
        grid=grid,
        in_specs=[
            *[pl.BlockSpec((_TQ, 1), lambda mq, i, cc: (mq, 0),
                           memory_space=pltpu.VMEM)] * 3,
            *[pl.BlockSpec((1, tc), lambda mq, i, cc: (0, cc),
                           memory_space=pltpu.VMEM)] * 7,
            # Dead upper-triangle W tiles map to the last live column block
            # of their row: the repeated index elides the DMA (the kernel
            # never reads them — same trick as pallas_query).
            pl.BlockSpec(
                (ti, tc),
                lambda mq, i, cc: (i, jnp.minimum(cc, ((i + 1) * ti - 1) // tc)),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda mq, i, cc: (0, cc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda mq, i, cc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda mq, i, cc: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _TQ), lambda mq, i, cc: (0, mq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ), lambda mq, i, cc: (0, mq),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((ti, _TQ), jnp.float32)],
        interpret=_interpret(),
    )(*qc, *cols_in, w, alpha_row, ls, sv)
    return mean[0, :m], quad[0, :m]


# --------------------------------------------- fused joint band quad


def _joint_band_quad_kernel(row0_ref, q0, q1, q2, z0, z1, z2, cu0, cu1, cu2,
                            cf, w_ref, ls_ref, sv_ref, quad_ref, v_scr, *,
                            name):
    i = pl.program_id(1)
    c = pl.program_id(2)
    nc = pl.num_programs(2)
    row0 = row0_ref[0]

    @pl.when(c == 0)
    def _():
        v_scr[...] = jnp.zeros_like(v_scr)

    # W band rows sit at global joint rows [row0 + i*TI, row0 + (i+1)*TI);
    # tiles whose columns all exceed the last global row are zero (W is
    # lower-triangular, trimmed panels zero-padded) — skip dot AND blend.
    @pl.when(c * _TCB < row0 + (i + 1) * _TIB)
    def _():
        d0 = q0[...] - z0[...]
        d1 = q1[...] - z1[...]
        d2 = q2[...] - z2[...]
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        params = {"lengthscale": ls_ref[0, 0], "signal_variance": sv_ref[0, 0]}
        # Value-query row (f=1, u=0) against a joint column (same collapse
        # as the fused joint query kernel): f_c k(r2) - 2 dk (u_c . diff).
        vd = cu0[...] * d0 + cu1[...] * d1 + cu2[...] * d2
        kq = (cf[...] * kf.k_r2(name, r2, params)
              - 2.0 * kf.dk_dr2(name, r2, params) * vd)  # (TQ, TC)
        v_scr[...] += quad_dot(w_ref[...], kq).astype(v_scr.dtype)

    @pl.when(c == nc - 1)
    def _():
        @pl.when(i == 0)
        def _():
            quad_ref[...] = jnp.zeros_like(quad_ref)

        quad_ref[...] += jnp.sum(v_scr[...] * v_scr[...], axis=0)[
            None, :
        ].astype(quad_ref.dtype)


@functools.partial(jax.jit, static_argnames=("name",))
def fused_joint_quad_band_pallas(name: str, q, cmeta, params, w_band, row0):
    """quad partial ||W_band kq^T||^2 colsums for a row band of the JOINT
    factor's W at global joint rows [row0, row0+R): the joint mirror of
    kernels.pallas_query.fused_quad_band_pallas, feeding the out-of-core
    joint query (linalg.outofcore) and any joint ring hop.  cmeta =
    (coords (J, 3), dirs (J, 3), flag (J,)) from `joint_meta`; the value-
    query cross-covariance tile is generated in VMEM from the column
    metadata (never in HBM).  Returns (M,)."""
    coords, dirs, flag = cmeta
    m, j = q.shape[0], coords.shape[0]
    r = w_band.shape[0]
    dt = q.dtype
    if j % _TIB or j % _TCB or r % _TIB:
        raise ValueError(
            f"joint W band ({r}, {j}) must tile into {_TIB} x {_TCB} blocks"
        )
    qp = _pad_rows(q.astype(dt), _TQB)
    mp = qp.shape[0]
    qc = [qp[:, d : d + 1] for d in range(3)]
    cols_in = _meta_cols(coords, dirs, flag, _TCB)
    ls = jnp.asarray(params["lengthscale"], dt).reshape(1, 1)
    sv = jnp.asarray(params["signal_variance"], dt).reshape(1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // _TQB, r // _TIB, j // _TCB),
        in_specs=[
            *[pl.BlockSpec((_TQB, 1), lambda mq, i, cc, s: (mq, 0),
                           memory_space=pltpu.VMEM)] * 3,
            *[pl.BlockSpec((1, _TCB), lambda mq, i, cc, s: (0, cc),
                           memory_space=pltpu.VMEM)] * 7,
            # Columns beyond the band's last global row are zero — clamp the
            # block index to the last live column so the repeated index
            # elides the dead tiles' DMAs (scalar-prefetched row0 makes the
            # liveness bound available to the index map).
            pl.BlockSpec(
                (_TIB, _TCB),
                lambda mq, i, cc, s: (
                    i, jnp.minimum(cc, (s[0] + (i + 1) * _TIB - 1) // _TCB)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda mq, i, cc, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda mq, i, cc, s: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TQB), lambda mq, i, cc, s: (0, mq), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((_TIB, _TQB), jnp.float32)],
    )
    quad = pl.pallas_call(
        functools.partial(_joint_band_quad_kernel, name=name),
        out_shape=jax.ShapeDtypeStruct((1, mp), dt),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.asarray([row0], jnp.int32), *qc, *cols_in, w_band, ls, sv)
    return quad[0, :m]
