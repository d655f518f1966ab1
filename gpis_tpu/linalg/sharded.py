"""Row-block-sharded Gram assembly and ICI-distributed blocked Cholesky
(BASELINE config 5; SURVEY.md §3 parallelism table and §8 step 7).

The reference is single-process (SURVEY.md §2); everything here is new,
justified by the north star: "Multi-chip scaling shards the Gram matrix
row-blocks and the panel-update in Cholesky over ICI so clouds well beyond
single-HBM capacity factor in-core."

Layout: capacity C = P * rows_per_device; device p owns the contiguous row
band [p*C/P, (p+1)*C/P).  Within the factorization the loop runs over
B-sized block columns; the owner of block row j is device j*B // (C/P)
(bands, not cyclic — band imbalance costs <2x on the dominant trailing
GEMMs and keeps index arithmetic trivially static; a block-cyclic variant
is a planned refinement).

Algorithm (left-looking, in-place, masked full-width — every step is one
(C/P, C) x (C, B) MXU GEMM per device plus one B x B host-free potrf):

    for block column j:
      owner computes S = A[j,j] - L[j,:<j] L[j,:<j]^T ; Ljj = potrf(S)
      broadcast finished block row j of L            (psum-style bcast)
      all devices: panel = A[:, j] - L[:, :<j] L[j, :<j]^T
                   L[:, j] = panel @ Ljj^{-T}   (rows > j; owner writes Ljj)

Communication per step: one (B, C) block-row broadcast over ICI; total
C*B*nb = C^2 words — asymptotically free next to the C^3/P compute.

All functions are shard_map'ed over a 1-axis mesh and run identically on
the virtual CPU mesh used in CI (SURVEY.md §5 item 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg

__all__ = [
    "sharded_gram",
    "sharded_cholesky",
    "sharded_solve_lower_vec",
    "sharded_solve_lower_t_vec",
    "sharded_cho_solve_vec",
    "sharded_update_tail",
    "sharded_linv_ll",
]


# ----------------------------------------------------------- Gram assembly


def _pallas_band_ok(name: str, params, rows_per: int, c: int,
                    tile: int = 256) -> bool:
    """Route a sharded body to the Pallas band kernels: real TPU backend,
    band/capacity tiled, built-in kernel with standard params.  (Inside
    shard_map the generic dispatch in kernels.gram CANNOT be used: its
    pallas attempt raises under the varying-axis checker and the
    try/except silently falls back to the jnp broadcast path — measured
    1250x slower for the band Gram at 16k on v5e.)"""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return (
        backend == "tpu"
        and name in kf.KERNEL_NAMES
        and set(params) == {"lengthscale", "signal_variance"}
        and rows_per % tile == 0
        and c % tile == 0
    )


@functools.partial(jax.jit, static_argnames=("name", "mesh", "axis"))
def sharded_gram(name: str, x, params, noise, mesh, *, axis: str = "row"):
    """Row-band-sharded Gram: device p computes K[rows_p, :] locally from the
    replicated coordinate array (C*3 floats — tiny), so assembly needs zero
    communication and scales O(C^2 / P).  On TPU each band runs as the
    Pallas band kernel (fused distance+covariance+diagonal, one HBM write
    per element)."""

    c = x.shape[0]
    p = mesh.shape[axis]
    if c % p:
        raise ValueError(f"capacity {c} not divisible by mesh size {p}")
    use_pallas = _pallas_band_ok(name, params, c // p, c)

    def body(x_rows, x_full, noise_rows):
        idx = lax.axis_index(axis)
        rows_per = x_rows.shape[0]
        if use_pallas:
            from gpis_tpu.kernels.pallas_gram import gram_band_pallas

            return gram_band_pallas(name, x_rows, x_full, params, noise_rows,
                                    idx * rows_per)
        k_rows = kg.cross_cov(name, x_rows, x_full, params)  # (C/P, C)
        row_ids = idx * rows_per + jax.lax.broadcasted_iota(
            jnp.int32, k_rows.shape, 0
        )
        col_ids = jax.lax.broadcasted_iota(jnp.int32, k_rows.shape, 1)
        diag = row_ids == col_ids
        k0 = kf.k_diag0(name, params).astype(k_rows.dtype)
        return jnp.where(diag, k0 + noise_rows[:, None], k_rows)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(axis)),
        out_specs=P(axis, None),
        check_vma=not use_pallas,
    )
    return fn(x, x, jnp.broadcast_to(jnp.asarray(noise, x.dtype), (c,)))


# ------------------------------------------------------ sharded Cholesky


def _bcast_from(value, owner, axis):
    """Broadcast `value` from device `owner` to all (psum of masked value)."""
    me = lax.axis_index(axis)
    return lax.psum(jnp.where(me == owner, value, jnp.zeros_like(value)), axis)


@functools.partial(jax.jit, static_argnames=("block", "axis", "mesh", "use_pallas"))
def sharded_cholesky(a, mesh, *, block: int = 256, axis: str = "row",
                     precision=lax.Precision.HIGHEST, use_pallas: bool = False):
    """Lower Cholesky of a row-band-sharded SPD matrix. Returns L with the
    same sharding. a: (C, C) sharded P(axis, None).

    use_pallas: run each panel's trailing update through the k-tile-skipping
    Pallas kernel (linalg.pallas_chol) instead of the masked full-width
    matmul — same math, skips the masked-out half of the contraction."""
    c = a.shape[0]
    p = mesh.shape[axis]
    rows_per = c // p
    if c % p or rows_per % block or c % block:
        raise ValueError(f"capacity {c} must tile into {p} devices x {block} blocks")
    nb = c // block
    dt = a.dtype

    def body(a_loc):
        # a_loc: (rows_per, C) — overwritten column-block by column-block
        # with L (in-place left-looking; see module docstring).
        me = lax.axis_index(axis)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_per, c), 1)
        grow_ids = me * rows_per + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per, c), 0
        )

        def step(j, l_loc):
            j0 = j * block
            owner = j0 // rows_per
            lrow = j0 - owner * rows_per  # local row offset at owner

            # Finished columns mask (< j0).
            done = (col_ids < j0).astype(dt)
            l_done = l_loc * done  # (rows_per, C)

            # Owner's block row j (masked to finished columns), broadcast.
            mine = lax.dynamic_slice(l_done, (lrow, 0), (block, c))
            row_j = _bcast_from(jnp.where(me == owner, mine, jnp.zeros_like(mine)), owner, axis)
            # (block, C) finished block row j of L.

            # Column panel j update for all local rows.
            a_panel = lax.dynamic_slice(l_loc, (0, j0), (rows_per, block))
            if use_pallas:
                from gpis_tpu.linalg.pallas_chol import panel_update_pallas

                a_panel = panel_update_pallas(l_loc, row_j, a_panel, j0,
                                              block=block, row0=me * rows_per)
            else:
                upd = lax.dot_general(
                    l_done, row_j,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision,
                )  # (rows_per, block) = L_loc[:, :j0] @ row_j[:, :j0]^T
                a_panel = a_panel - upd

            # Diagonal block (owner computes, all compute identically after bcast).
            s_mine = lax.dynamic_slice(a_panel, (lrow, 0), (block, block))
            s = _bcast_from(jnp.where(me == owner, s_mine, jnp.zeros_like(s_mine)), owner, axis)
            ljj = jnp.linalg.cholesky(s)

            # panel rows: L[i, j] = a_panel @ Ljj^{-T} for global rows > j.
            panel = lax.linalg.triangular_solve(
                ljj, a_panel, left_side=False, lower=True, transpose_a=True
            )  # solves X Ljj^T = a_panel
            grow = grow_ids[:, :block]
            below = grow >= (j0 + block)
            panel = jnp.where(below, panel, jnp.zeros((), dt))
            # Owner writes the diagonal block into its local rows.
            panel_with_diag = lax.dynamic_update_slice(panel, ljj, (lrow, 0))
            panel = jnp.where(me == owner, panel_with_diag, panel)

            return lax.dynamic_update_slice(l_loc, panel, (0, j0))

        l_loc = lax.fori_loop(0, nb, step, a_loc)
        # Zero any strict-upper leftovers (columns >= my last row+1 beyond
        # diagonal are already zeroed per panel; nothing else to do).
        return l_loc

    # check_vma=False: pallas_call outputs inside shard_map have no varying
    # annotation in jax 0.9; the body is manifestly per-device correct.
    fn = shard_map(body, mesh=mesh, in_specs=(P(axis, None),),
                   out_specs=P(axis, None), check_vma=not use_pallas)
    return fn(a)


# ----------------------------------------------------- distributed solves


@functools.partial(jax.jit, static_argnames=("block", "axis", "mesh"))
def sharded_solve_lower_vec(l, b, mesh, *, block: int = 256, axis: str = "row"):
    """Forward-substitute L y = b with L row-band-sharded, b replicated.
    Returns y replicated. Block-sequential; each step broadcasts one B-vector."""
    c = l.shape[0]
    p = mesh.shape[axis]
    rows_per = c // p
    nb = c // block
    dt = l.dtype

    def body(l_loc, b_full):
        me = lax.axis_index(axis)

        def step(j, y):
            j0 = j * block
            owner = (j * block) // rows_per
            lrow = j * block - owner * rows_per
            row_block = lax.dynamic_slice(l_loc, (lrow, 0), (block, c))  # only owner's is valid
            # rhs_j = b_j - L[j, :j0] y[:j0]
            ymask = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (c,), 0) < j0, y, 0.0)
            rhs = lax.dynamic_slice(b_full, (j0,), (block,)) - row_block @ ymask
            ljj = lax.dynamic_slice(row_block, (0, j0), (block, block))
            yj = lax.linalg.triangular_solve(
                ljj, rhs[:, None], left_side=True, lower=True
            )[:, 0]
            yj = _bcast_from(jnp.where(me == owner, yj, jnp.zeros_like(yj)), owner, axis)
            return lax.dynamic_update_slice(y, yj, (j0,))

        return lax.fori_loop(0, nb, step, jnp.zeros((c,), dt))

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P())
    return fn(l, b)


@functools.partial(jax.jit, static_argnames=("block", "axis", "mesh"))
def sharded_solve_lower_t_vec(l, b, mesh, *, block: int = 256, axis: str = "row"):
    """Back-substitute L^T y = b (L row-band-sharded, b replicated).

    Step j (descending): y_j = Ljj^{-T} (b_j - sum_{i>j} L[i, j]^T y_i).
    The partial sums come from *columns* j of rows below — computed locally
    on every device from its row band, then psum-reduced."""
    c = l.shape[0]
    p = mesh.shape[axis]
    rows_per = c // p
    nb = c // block
    dt = l.dtype

    def body(l_loc, b_full):
        me = lax.axis_index(axis)
        grow_ids = me * rows_per + jax.lax.broadcasted_iota(jnp.int32, (rows_per,), 0)

        def step(t, y):
            j = nb - 1 - t
            j0 = j * block
            owner = (j * block) // rows_per
            lrow = j * block - owner * rows_per
            # Local contribution: L[rows>j0+B, j0:j0+B]^T @ y[rows>j0+B]
            col_blk = lax.dynamic_slice(l_loc, (0, j0), (rows_per, block))
            below = (grow_ids >= j0 + block).astype(dt)
            y_rows = lax.dynamic_slice(y, (me * rows_per,), (rows_per,))
            contrib = (col_blk * (below * y_rows)[:, None]).sum(axis=0)  # (block,)
            contrib = lax.psum(contrib, axis)
            rhs = lax.dynamic_slice(b_full, (j0,), (block,)) - contrib
            row_block = lax.dynamic_slice(l_loc, (lrow, 0), (block, c))
            ljj = lax.dynamic_slice(row_block, (0, j0), (block, block))
            yj = lax.linalg.triangular_solve(
                ljj, rhs[:, None], left_side=True, lower=True, transpose_a=True
            )[:, 0]
            yj = _bcast_from(jnp.where(me == owner, yj, jnp.zeros_like(yj)), owner, axis)
            return lax.dynamic_update_slice(y, yj, (j0,))

        return lax.fori_loop(0, nb, step, jnp.zeros((c,), dt))

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P())
    return fn(l, b)


def sharded_cho_solve_vec(l, b, mesh, *, block: int = 256, axis: str = "row"):
    y = sharded_solve_lower_vec(l, b, mesh, block=block, axis=axis)
    return sharded_solve_lower_t_vec(l, y, mesh, block=block, axis=axis)


# ------------------------------------------------- sharded inverse factor


@functools.partial(jax.jit, static_argnames=("block", "axis", "mesh", "use_pallas"))
def sharded_linv(l, mesh, *, block: int = 256, axis: str = "row",
                 precision=lax.Precision.HIGHEST, use_pallas: bool = False):
    """W = L^{-1}, row-band-sharded, via a right-looking distributed TRSM:

        S_loc := I[rows_loc, :]
        for block row j:  owner solves W_j = Ljj^{-1} S[j, :] ; broadcast W_j
                          all: S_loc -= L_loc[:, j] W_j     (local GEMM)

    O(C^3 / P) compute per device, C^2 words of ICI broadcast total.  With W
    in hand, posterior variance and alpha become pure local GEMMs + psum
    (see `sharded_predict_linv`):  var = k0 - ||W kq^T||^2,
    alpha = W^T (W y).

    use_pallas routes the trailing update through the Pallas band kernel
    (`band_trail_update_pallas`) — measured SLOWER than the masked XLA
    GEMM at mesh-1/16k (0.50 s vs 0.33 s: the panel-thin HIGHEST GEMM
    already runs ~27 actual TFLOP/s here and the kernel pays copy-through
    DMA on pass-through tiles), so it stays off by default; kept as a
    tested option to re-measure on a real pod."""
    c = l.shape[0]
    p = mesh.shape[axis]
    rows_per = c // p
    nb = c // block
    dt = l.dtype

    def body(l_loc):
        me = lax.axis_index(axis)
        grow_ids = me * rows_per + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per, 1), 0
        )
        # S starts as this device's rows of the identity.
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_per, c), 1)
        s0 = (col_ids == grow_ids).astype(dt)

        def step(j, s_loc):
            j0 = j * block
            owner = j0 // rows_per
            lrow = j0 - owner * rows_per

            s_mine = lax.dynamic_slice(s_loc, (lrow, 0), (block, c))
            ljj_mine = lax.dynamic_slice(l_loc, (lrow, j0), (block, block))
            wj_mine = lax.linalg.triangular_solve(
                ljj_mine, s_mine, left_side=True, lower=True
            )
            wj = _bcast_from(
                jnp.where(me == owner, wj_mine, jnp.zeros_like(wj_mine)), owner, axis
            )  # (block, C)

            # Trailing update on strictly-below rows (others masked).
            l_col = lax.dynamic_slice(l_loc, (0, j0), (rows_per, block))
            if use_pallas:
                from gpis_tpu.linalg.pallas_chol import band_trail_update_pallas

                s_loc = band_trail_update_pallas(
                    s_loc, l_col, wj, j0, block=block, row0=me * rows_per
                )
            else:
                below = (grow_ids[:, 0] >= j0 + block).astype(dt)[:, None]
                s_loc = s_loc - jnp.dot(l_col * below, wj, precision=precision)
            # Owner's own rows become final W_j (wj is the clean broadcast
            # value — identical to wj_mine at the owner, NaN-free elsewhere).
            s_with = lax.dynamic_update_slice(s_loc, wj, (lrow, 0))
            return jnp.where(me == owner, s_with, s_loc)

        return lax.fori_loop(0, nb, step, s0)

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis, None),),
                   out_specs=P(axis, None), check_vma=not use_pallas)
    return fn(l)


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def sharded_alpha_from_linv(w, y, mesh, *, axis: str = "row"):
    """alpha = K^{-1} y = W^T (W y) with W = L^{-1} row-sharded, y replicated."""

    def body(w_loc, y_full):
        vy = jnp.dot(w_loc, y_full, precision=lax.Precision.HIGHEST)  # (C/P,)
        contrib = jnp.dot(w_loc.T, vy, precision=lax.Precision.HIGHEST)  # (C,)
        return lax.psum(contrib, axis)

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P())
    return fn(w, y)


@functools.partial(jax.jit, static_argnames=("name", "mesh", "axis", "precision",
                                                "cross_fn"))
def sharded_predict_linv(name: str, q, x, params, alpha, w, mesh, *, axis: str = "row",
                         precision=lax.Precision.HIGHEST, cross_fn=None):
    """Posterior mean + variance with the precomputed sharded W = L^{-1}:
    entirely local GEMMs + one psum per query shard — the speed-of-light
    distributed variance path.  On TPU the per-hop band contribution runs
    as the fused Pallas quad kernel (cross-covariance generated in VMEM,
    lower-triangular tiles skipped)."""
    m = q.shape[0]
    p = mesh.shape[axis]
    if m % p:
        raise ValueError(f"query count {m} not divisible by mesh size {p}")
    cross = cross_fn or kg.cross_cov
    # The fused band kernel covers the standard (value-only, W over the
    # same C as x) layout; custom cross_fns (joint models) keep the
    # GEMM ring.
    use_pallas = cross_fn is None and _pallas_band_ok(
        name, params, w.shape[0] // p, x.shape[0]
    ) and w.shape[1] == x.shape[0]

    def body(q_loc, x_full, alpha_full, w_loc):
        me = lax.axis_index(axis)
        rows_per = w_loc.shape[0]
        if use_pallas:
            from gpis_tpu.kernels.pallas_gram import cross_cov_pallas

            kq = cross_cov_pallas(name, q_loc, x_full, params)
        else:
            kq = cross(name, q_loc, x_full, params)  # (M/P, C) or (M/P, 4C)
        mean = jnp.dot(kq, alpha_full, precision=precision)
        # ||W kq^T||^2 pairs every W row band with every query shard, so the
        # query block rides the ring (M/P x 3 floats per hop) accumulating
        # each band's partial square-norm; kq is recomputed per hop from the
        # replicated coordinates (cheap next to the GEMM).
        perm = [(i, (i + 1) % p) for i in range(p)]

        def ring_step(s, carry):
            qv, quadv = carry
            if use_pallas:
                from gpis_tpu.kernels.pallas_query import fused_quad_band_pallas

                quadv = quadv + fused_quad_band_pallas(
                    name, qv, x_full, params, w_loc, me * rows_per
                )
            else:
                kqv = cross(name, qv, x_full, params)
                v = jnp.dot(w_loc, kqv.T, precision=precision)  # (rows/P, M/P)
                quadv = quadv + jnp.sum(v * v, axis=0)
            qv = lax.ppermute(qv, axis, perm)
            quadv = lax.ppermute(quadv, axis, perm)
            return qv, quadv

        quad0 = lax.pcast(jnp.zeros((q_loc.shape[0],), kq.dtype), (axis,), to="varying")
        _, quad = lax.fori_loop(0, p, ring_step, (q_loc, quad0))
        k0 = kf.k_diag0(name, params).astype(kq.dtype)
        return mean, k0 - quad

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(axis, None)),
        out_specs=(P(axis), P(axis)),
        check_vma=not use_pallas,
    )
    return fn(q, x, alpha, w)


@functools.partial(jax.jit, static_argnames=("block", "axis", "mesh"))
def sharded_linv_ll(l, mesh, *, block: int = 256, axis: str = "row",
                    precision=lax.Precision.HIGHEST):
    """W = L^{-1} by a LEFT-looking distributed TRSM:

        for block row j (owner o):
          o broadcasts L's row panel j                     (1 bcast, (B, C))
          every device q: partial_q = Lrow[:, band_q<j0] @ W[band_q<j0, :]
          psum(partials) -> upd; o writes W_j = Ljj^{-1}(I_j - upd)

    vs the right-looking `sharded_linv`: the per-step GEMM contracts over
    the device's whole finished band (k = C/P, MXU-friendly) instead of a
    B-thin panel, and only the owner's (B, C) row is written per step
    (total C^2 writes vs C^3/(P*B)).  Costs one extra psum per step.
    Parity-tested against `sharded_linv`; pick per pod by measurement."""
    c = l.shape[0]
    p = mesh.shape[axis]
    rows_per = c // p
    nb = c // block
    dt = l.dtype

    def body(l_loc):
        me = lax.axis_index(axis)
        grow_ids = me * rows_per + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per,), 0
        )
        col_ids = jnp.arange(c)

        def step(j, w_loc):
            j0 = j * block
            owner = j0 // rows_per
            lrow_off = j0 - owner * rows_per
            # Owner broadcasts L's row panel j, masked to finished cols.
            mine = lax.dynamic_slice(l_loc, (lrow_off, 0), (block, c))
            l_row = _bcast_from(
                jnp.where(me == owner, mine, jnp.zeros_like(mine)), owner, axis
            )
            colmask = (col_ids < j0).astype(dt)[None, :]
            # My band's contribution: Lrow[:, my rows < j0] @ W[my rows < j0, :].
            sel = lax.dynamic_slice(
                l_row * colmask,
                (jnp.zeros((), grow_ids.dtype), me * rows_per),
                (block, rows_per),
            )  # (B, rows_per) — columns of Lrow that hit my band
            wmask = (grow_ids < j0).astype(dt)[:, None]
            partial = jnp.dot(sel, w_loc * wmask, precision=precision)
            upd = lax.psum(partial, axis)  # (B, C)
            rows = j0 + jax.lax.broadcasted_iota(jnp.int32, (block, c), 0)
            eye_slice = (rows == col_ids[None, :]).astype(dt)
            ljj = lax.dynamic_slice(l_row, (0, j0), (block, block))
            wj = lax.linalg.triangular_solve(
                ljj, eye_slice - upd, left_side=True, lower=True
            )
            w_with = lax.dynamic_update_slice(w_loc, wj, (lrow_off, 0))
            return jnp.where(me == owner, w_with, w_loc)

        w0 = lax.pcast(jnp.zeros((rows_per, c), dt), (axis,), to="varying")
        return lax.fori_loop(0, nb, step, w0)

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis, None),),
                   out_specs=P(axis, None))
    return fn(l)


# ------------------------------------------------- sharded bordering update


@functools.partial(jax.jit, static_argnames=("name", "mesh", "axis"))
def sharded_update_tail(name: str, params, x, noise, l, w, mesh, *, axis: str = "row"):
    """Refactor the LAST row band of the sharded Cholesky factor and W after
    its training rows changed (tactile update, reference §4.5).

    Preconditions: only rows in the last device's band [rest, C) changed
    (touch slots are placed there by `gpis_tpu.gp.sharded_model`); leading
    rows untouched.  Uses W11 = L11^{-1} (the unchanged leading block of W)
    so the bordering solve is pure GEMMs:

        L21 = K21 W11^T     (each device contributes its W-band's columns,
                             one all_gather assembles the tail rows)
        L22 = chol(K22 - L21 L21^T)            (local to the last device)
        W21 = -L22^{-1} (L21 W11)              (psum of band partials)
        W22 = L22^{-1}

    Returns (l_new, w_new) with the same shardings."""
    c = l.shape[0]
    p = mesh.shape[axis]
    band = c // p
    rest = c - band
    dt = l.dtype

    def body(x_full, noise_full, l_loc, w_loc):
        me = lax.axis_index(axis)
        last = p - 1
        x_tail = x_full[rest:]

        kt = kg.cross_cov(name, x_tail, x_full, params)  # (band, C)
        l21_cols = jnp.dot(kt, w_loc.T, precision=lax.Precision.HIGHEST)
        l21_cols = jnp.where(me == last, jnp.zeros_like(l21_cols), l21_cols)

        gathered = lax.all_gather(l21_cols, axis)  # (p, band, band)
        l21 = jnp.moveaxis(gathered, 0, 1).reshape(band, c)

        k22 = kg.cross_cov(name, x_tail, x_tail, params)
        k22 = jnp.where(
            jnp.eye(band, dtype=bool),
            kf.k_diag0(name, params).astype(dt) + noise_full[rest:],
            k22,
        )
        s = k22 - jnp.dot(l21, l21.T, precision=lax.Precision.HIGHEST)
        l22 = jnp.linalg.cholesky(s)

        part = jnp.dot(l21_cols, w_loc, precision=lax.Precision.HIGHEST)
        t = lax.psum(part, axis)
        w21 = -lax.linalg.triangular_solve(l22, t, left_side=True, lower=True)
        w22 = lax.linalg.triangular_solve(
            l22, jnp.eye(band, dtype=dt), left_side=True, lower=True
        )
        w_tail = lax.dynamic_update_slice(w21, w22, (0, rest))
        l_tail = lax.dynamic_update_slice(l21, l22, (0, rest))

        l_new = jnp.where(me == last, l_tail, l_loc)
        w_new = jnp.where(me == last, w_tail, w_loc)
        return l_new, w_new

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    return fn(x, jnp.broadcast_to(jnp.asarray(noise, dt), (c,)), l, w)


# --------------------------------------------------------- sharded query


