"""Sharded GP with derivative (normal) observations — config 2 at config 5
scale.  The joint system (dimension-major layout, `gpis_tpu.kernels.
derivative`) is row-band-sharded like the value-only system and reuses the
whole distributed pipeline (sharded Cholesky, W=L⁻¹, alpha, ring queries)
unchanged; only the Gram/cross-cov assembly differs.

Joint index space (J = 4C + T):

    [ f(1..C) | d1(1..C) | d2(1..C) | d3(1..C) | f(touch 1..T) ]

The first 4C rows are the dimension-major core (values + gradients at the C
core points); the trailing T rows are value-only observations at tactile
points (reference §4.5), preallocated as inert padding (origin point, huge
noise) and filled by `ShardedJointModel.update` via the tail-band bordering
— the same O(band·J²/P) update as the value-only sharded model, never a
full refactor.

Band assembly: device p owns joint rows [p·J/P, (p+1)·J/P).  Rather than
branch per band, each local row carries `flag` (value row?) and a one-hot of
its gradient dimension, and the column blocks are formed by flag-blended
kernel formulas — fully vectorized, one pass, correct for any band/block
alignment.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from gpis_tpu.gp.model import round_up
from gpis_tpu.kernels import derivative as kd
from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg
from gpis_tpu.linalg import sharded as sh
from gpis_tpu.parallel import mesh as pm

__all__ = ["ShardedJointModel", "fit_sharded_joint", "sharded_joint_gram"]


def _joint_band_rows(name, x_all, params, nf_all, ng, grows, c):
    """Joint covariance rows (R, J) for global joint row indices `grows`,
    with per-row observation noise on the diagonal.

    x_all: (C+T, 3) core + touch coordinates; nf_all: (C+T,) value-obs
    noise (touch slots included); ng: (C,) gradient-obs noise.  Joint row
    g < 4C is (type t = g // C, point i = g % C) with t=0 the value row and
    t=1..3 the gradient rows; g >= 4C is a value row at touch point
    C + (g - 4C).
    """
    dt = x_all.dtype
    ctot = x_all.shape[0]
    t_slots = ctot - c
    n4 = 4 * c
    j_tot = n4 + t_slots
    r = grows.shape[0]

    is_touch = grows >= n4
    t_row = jnp.where(is_touch, 0, grows // c)
    i_row = jnp.where(is_touch, c + (grows - n4), grows % c)
    flag = (t_row == 0).astype(dt)[:, None]                  # (R, 1)
    onehot = jax.nn.one_hot(jnp.maximum(t_row - 1, 0), 3, dtype=dt)
    onehot = onehot * (1.0 - flag)                           # zero for value rows

    xi = x_all[i_row]                                        # (R, 3)
    diff = xi[:, None, :] - x_all[None, :, :]                # (R, C+T, 3)
    r2 = jnp.sum(diff * diff, axis=-1)
    kv = kf.k_r2(name, r2, params)
    dk = kf.dk_dr2(name, r2, params)
    h = kf.d2k_dr2(name, r2, params)
    zero = r2 <= 1e-24
    # dsel = diff along this row's gradient dim (zero for value rows).
    dsel = jnp.einsum("rd,rcd->rc", onehot, diff)

    # Exact diagonal values at r=0 (thin-plate clamps are sub-fp here, but
    # pin them exactly like the dense assembly does).
    col_pt = jax.lax.broadcasted_iota(jnp.int32, (r, ctot), 1)
    same_pt = col_pt == i_row[:, None]
    k0 = kf.k_diag0(name, params).astype(dt)
    kv = jnp.where(same_pt, k0, kv)

    # Value columns (all C+T points): cov(row, f(x_j)).
    val_cols = flag * kv + (1.0 - flag) * (2.0 * dk * dsel)  # (R, C+T)
    blocks = [val_cols[:, :c]]
    # Gradient columns exist only for the C core points.
    for e in range(3):
        de = diff[:, :c, e]
        # value rows: cov(f(x_i), d_e f(x_j)) = -2 dk diff_e
        v_val = -2.0 * dk[:, :c] * de
        # gradient rows: -2 dk δ_{d,e} - 4 h diff_d diff_e
        delta = onehot[:, e : e + 1]                         # (R, 1)
        hterm = jnp.where(zero[:, :c], 0.0, h[:, :c] * dsel[:, :c] * de)
        v_grad = -2.0 * dk[:, :c] * delta - 4.0 * hterm
        blocks.append(flag * v_val + (1.0 - flag) * v_grad)
    if t_slots:
        blocks.append(val_cols[:, c:])
    k_rows = jnp.concatenate(blocks, axis=1)                 # (R, J)

    # Diagonal noise: joint row g gets its observation noise at column g.
    jcol = jax.lax.broadcasted_iota(jnp.int32, (r, j_tot), 1)
    diag = jcol == grows[:, None]
    row_noise = jnp.where(
        t_row == 0, nf_all[i_row], ng[jnp.minimum(i_row, c - 1)]
    )[:, None]
    return jnp.where(diag, k_rows + row_noise, k_rows)


@functools.partial(jax.jit, static_argnames=("name", "mesh", "c", "axis"))
def sharded_joint_gram(name: str, x_all, params, nf_all, ng, mesh, *,
                       c: int | None = None, axis: str = "row"):
    """Row-band-sharded joint Gram (J, J), J = 4C + T.  x_all (C+T, 3),
    nf_all (C+T,), ng (C,).  `c` defaults to x_all.shape[0] (T = 0)."""
    if not kf.supports_derivatives(name):
        raise ValueError(f"kernel {name!r} does not support derivative observations")
    c = x_all.shape[0] if c is None else c
    t_slots = x_all.shape[0] - c
    j_tot = 4 * c + t_slots
    p = mesh.shape[axis]
    if j_tot % p:
        raise ValueError(f"joint size {j_tot} not divisible by mesh size {p}")
    rows_per = j_tot // p
    dt = x_all.dtype
    # The jnp band assembly materializes a (band, J, 3) broadcast per
    # device; on TPU the flag-blended Pallas kernel generates tiles in VMEM
    # instead (the value path learned this the hard way in r2: generic
    # dispatch silently falls back to jnp INSIDE shard_map — the kernel
    # must be invoked explicitly).  row0 is scalar-prefetched, so one
    # Mosaic compile serves every device band.
    use_pallas = (jax.default_backend() == "tpu"
                  and name in kf.KERNEL_NAMES
                  and rows_per * j_tot >= 1 << 22)  # kernel pads both dims

    def body(x_full, nf, ng_):
        me = lax.axis_index(axis)
        r0 = me * rows_per
        grows = r0 + jax.lax.broadcasted_iota(jnp.int32, (rows_per,), 0)
        if not use_pallas:
            return _joint_band_rows(name, x_full, params, nf, ng_, grows, c)
        from gpis_tpu.kernels import pallas_joint as pj

        coords, dirs, flag = pj.joint_meta(x_full[:c], x_full[c:] if t_slots else None)
        rmeta = (coords[grows], dirs[grows], flag[grows])
        dn = pj._joint_noise(c, nf[:c], ng_, nf[c:] if t_slots else None, dt)
        return pj.joint_rows_pallas(name, rmeta, (coords, dirs, flag),
                                    params, noise_col=dn, row0=r0)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(axis, None),
    )
    return fn(x_all, jnp.broadcast_to(jnp.asarray(nf_all, dt), (c + t_slots,)),
              jnp.broadcast_to(jnp.asarray(ng, dt), (c,)))


@functools.partial(jax.jit, static_argnames=("name", "c", "mesh", "axis"))
def _joint_update_tail(name, params, x_all, nf_all, ng, c, l, w, mesh, *,
                       axis: str = "row"):
    """Refactor the LAST row band of the sharded joint factor and W after
    touch rows changed (the joint mirror of `sharded.sharded_update_tail`;
    see its docstring for the bordering algebra).  Touch rows live at the
    joint tail, inside the last device's band by construction
    (`fit_sharded_joint` enforces T <= J/P)."""
    j_tot = l.shape[0]
    p = mesh.shape[axis]
    band = j_tot // p
    rest = j_tot - band
    dt = l.dtype

    def body(x_full, nf, ng_, l_loc, w_loc):
        me = lax.axis_index(axis)
        last = p - 1
        grows = rest + jax.lax.broadcasted_iota(jnp.int32, (band,), 0)
        # (band, J) tail covariance rows with diagonal noise — the noise
        # diagonal lands in columns [rest, J), which pair with zero entries
        # of W11 rows below, so L21 = kt @ W11^T is unaffected by it.
        kt = _joint_band_rows(name, x_full, params, nf, ng_, grows, c)

        l21_cols = jnp.dot(kt, w_loc.T, precision=lax.Precision.HIGHEST)
        l21_cols = jnp.where(me == last, jnp.zeros_like(l21_cols), l21_cols)
        gathered = lax.all_gather(l21_cols, axis)            # (p, band, band)
        l21 = jnp.moveaxis(gathered, 0, 1).reshape(band, j_tot)

        k22 = kt[:, rest:]
        s = k22 - jnp.dot(l21, l21.T, precision=lax.Precision.HIGHEST)
        l22 = jnp.linalg.cholesky(s)

        part = jnp.dot(l21_cols, w_loc, precision=lax.Precision.HIGHEST)
        tsum = lax.psum(part, axis)
        w21 = -lax.linalg.triangular_solve(l22, tsum, left_side=True, lower=True)
        w22 = lax.linalg.triangular_solve(
            l22, jnp.eye(band, dtype=dt), left_side=True, lower=True
        )
        w_tail = lax.dynamic_update_slice(w21, w22, (0, rest))
        l_tail = lax.dynamic_update_slice(l21, l22, (0, rest))
        l_new = jnp.where(me == last, l_tail, l_loc)
        w_new = jnp.where(me == last, w_tail, w_loc)
        return l_new, w_new

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    return fn(x_all, nf_all, ng, l, w)


def _joint_capacity(n: int, touch: int, p: int, block: int) -> tuple[int, int]:
    """Smallest (C, T) with C >= n core slots and T >= touch tail slots such
    that J = 4C + T tiles into p devices x block tiles (J % (p*block) == 0,
    so each band is a whole number of factorization blocks) and the whole
    touch band fits the last device's band (T <= J/p, the tail-band
    bordering precondition)."""
    c = round_up(n, p)
    for _ in range(8 * block + 8):
        rem = (-(4 * c)) % (p * block)
        if touch == 0:
            if rem == 0:
                return c, 0
        else:
            t = rem
            if t < touch:
                t += round_up(touch - t, p * block)
            elif t == 0:
                t = round_up(touch, p * block)
            if t <= (4 * c + t) // p:
                return c, t
        c += p
    raise ValueError(
        f"no joint capacity found for n={n}, touch={touch}, p={p}, block={block}"
    )


@functools.lru_cache(maxsize=None)
def _joint_cross_fn(c: int):
    """Joint cross-covariance column layout [4C core | T touch] for a given
    core capacity C, with a STABLE function identity (it is a static jit
    argument of `sharded_predict_linv`)."""

    def cross(name, qq, xx, pp):
        kv4 = kd.cross_cov_value(name, qq, xx[:c], pp)  # (M, 4C)
        if xx.shape[0] > c:
            kt = kg.cross_cov(name, qq, xx[c:], pp)     # (M, T)
            return jnp.concatenate([kv4, kt], axis=1)
        return kv4

    return cross


@dataclasses.dataclass
class ShardedJointModel:
    """Sharded joint (value+gradient) GP; same opaque-model contract as
    ShardedGPModel (predict / update / capacity / dtype / checkpoint
    fields)."""

    kernel: str
    x: jax.Array  # (C+T, 3) replicated: core points + touch slots
    params: dict
    l: jax.Array  # (J, J) row-band-sharded, J = 4C + T
    w: jax.Array  # (J, J) row-band-sharded
    alpha: jax.Array  # (J,) replicated
    mesh: object
    block: int
    n0: int  # core capacity C
    normals: jax.Array | None = None  # (C, 3) kept for session dispatch
    y: jax.Array | None = None        # (J,) joint targets [f; d1; d2; d3; touch]
    noise_f: jax.Array | None = None  # (C+T,) value-observation noise
    noise_g: jax.Array | None = None  # (C,) gradient-observation noise
    n_touch: int = 0
    n_real: int = 0        # real (non-padding) core points
    pad_noise: float = 1e10

    @property
    def capacity(self) -> int:
        return self.n0

    @property
    def touch_capacity(self) -> int:
        return self.x.shape[0] - self.n0

    @property
    def noise(self):
        """Value-observation noise over the core rows (GPModel-compatible
        alias: the planner's on-surface test reads model.y/model.noise)."""
        return self.noise_f[: self.n0]

    @property
    def dtype(self):
        return self.x.dtype

    def predict(self, q, *, precision=None):
        m = q.shape[0]
        p = self.mesh.shape["row"]
        pad = (-m) % p
        qp = jnp.pad(jnp.asarray(q, self.dtype), ((0, pad), (0, 0)))
        # The cross fn is a static jit argument of sharded_predict_linv, so
        # its identity must be stable across calls — a fresh closure per
        # predict caused a retrace/recompile on every query (ADVICE r2
        # medium).  _joint_cross_fn caches one function object per core
        # capacity C.
        mean, var = sh.sharded_predict_linv(
            self.kernel, qp, self.x, self.params, self.alpha, self.w,
            self.mesh, cross_fn=_joint_cross_fn(self.n0),
        )
        return mean[:m], var[:m]

    def update(self, new_x, new_y, new_noise) -> "ShardedJointModel":
        """Incremental tactile update (reference §4.5, distributed joint):
        write the touch points into tail slots and refactor only the last
        row band via the joint bordering update."""
        c = self.n0
        t_cap = self.touch_capacity
        k_new = int(np.asarray(new_x).shape[0])
        if self.n_touch + k_new > t_cap:
            raise ValueError(
                f"cumulative touches {self.n_touch + k_new} exceed touch "
                f"capacity {t_cap}; refit with a larger touch_capacity"
            )
        dt = self.dtype
        slot = c + self.n_touch
        jrow = 4 * c + self.n_touch
        x = self.x.at[slot : slot + k_new].set(jnp.asarray(new_x, dt))
        new_y = jnp.broadcast_to(jnp.asarray(new_y, dt), (k_new,))
        y = self.y.at[jrow : jrow + k_new].set(new_y)
        floor = 4.0 * float(jnp.finfo(dt).eps) * (4 * c + t_cap) * abs(
            float(kf.k_diag0(self.kernel, self.params))
        )
        nz = jnp.maximum(jnp.broadcast_to(jnp.asarray(new_noise, dt), (k_new,)), floor)
        noise_f = self.noise_f.at[slot : slot + k_new].set(nz)

        l_new, w_new = _joint_update_tail(
            self.kernel, self.params, x, noise_f, self.noise_g, c,
            self.l, self.w, self.mesh,
        )
        alpha = sh.sharded_alpha_from_linv(w_new, y, self.mesh)
        return dataclasses.replace(
            self, x=x, y=y, noise_f=noise_f, l=l_new, w=w_new, alpha=alpha,
            n_touch=self.n_touch + k_new,
        )


def fit_sharded_joint(
    kernel: str,
    x,
    y,
    normals,
    noise_f,
    noise_g,
    params,
    mesh=None,
    *,
    n_devices: int | None = None,
    block: int = 128,
    touch_capacity: int = 0,
    pad_noise: float = 1e10,
    dtype=None,
) -> ShardedJointModel:
    """Distributed joint fit. Core capacity C is padded so J = 4C + T tiles
    into the mesh; T touch slots are preallocated at the joint tail, inside
    the last device's band, so tactile updates are tail-band borderings."""
    mesh = mesh or pm.make_row_mesh(n_devices)
    p = mesh.shape["row"]
    dtype = dtype or jnp.asarray(x).dtype
    n = x.shape[0]
    c, t_slots = _joint_capacity(n, touch_capacity, p, block)
    j_tot = 4 * c + t_slots
    xp = jnp.zeros((c + t_slots, 3), dtype).at[:n].set(jnp.asarray(x, dtype))
    yp = jnp.zeros((c,), dtype).at[:n].set(jnp.asarray(y, dtype))
    nrm = jnp.zeros((c, 3), dtype).at[:n].set(jnp.asarray(normals, dtype))
    nf = jnp.full((c + t_slots,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise_f, dtype), (n,)))
    ng = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise_g, dtype), (n,)))
    params = {k: jnp.asarray(v, dtype) for k, v in params.items()}

    eps = float(jnp.finfo(dtype).eps)
    jitter0 = 4.0 * eps * j_tot * abs(float(kf.k_diag0(kernel, params)))
    use_pallas = jax.default_backend() == "tpu"
    for extra in (0.0, jitter0, jitter0 * 100.0, jitter0 * 1e4):
        a = sharded_joint_gram(kernel, xp, params, nf + extra, ng + extra,
                               mesh, c=c)
        l = sh.sharded_cholesky(a, mesh, block=block, use_pallas=use_pallas)
        if not bool(jnp.isnan(jnp.diagonal(l)).any()):
            # Fold the escalated jitter into the stored noise so later
            # tail-band borderings recompute K consistently with L/W
            # (ADVICE r2 low; mirrors fit_sharded's np_ = np_ + extra).
            nf = nf + extra
            ng = ng + extra
            break
    else:
        raise FloatingPointError("sharded joint Cholesky failed even with jitter")
    w = sh.sharded_linv(l, mesh, block=block)
    yj = kd.joint_targets(yp, nrm)
    if t_slots:
        yj = jnp.concatenate([yj, jnp.zeros((t_slots,), dtype)])
    alpha = sh.sharded_alpha_from_linv(w, yj, mesh)
    return ShardedJointModel(
        kernel=kernel, x=xp, params=params, l=l, w=w, alpha=alpha,
        mesh=mesh, block=block, n0=c, normals=nrm, y=yj,
        noise_f=nf, noise_g=ng, n_real=n, pad_noise=pad_noise,
    )
