"""Sharded GP with derivative (normal) observations — config 2 at config 5
scale.  The joint 4C x 4C system (dimension-major layout,
`gpis_tpu.kernels.derivative`) is row-band-sharded like the value-only
system and reuses the whole distributed pipeline (sharded Cholesky, W=L⁻¹,
alpha, ring queries) unchanged; only the Gram/cross-cov assembly differs.

Band assembly: device p owns joint rows [p·4C/P, (p+1)·4C/P).  A joint row
`g` is (type t = g // C, point i = g % C) with t=0 the value row and
t=1..3 the gradient rows.  Rather than branch per band, each local row
carries `flag` (value row?) and a one-hot of its gradient dimension, and
the four column blocks are formed by flag-blended kernel formulas — fully
vectorized, one pass, correct for any band/block alignment.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from gpis_tpu.gp.model import round_up
from gpis_tpu.kernels import derivative as kd
from gpis_tpu.kernels import functions as kf
from gpis_tpu.linalg import sharded as sh
from gpis_tpu.parallel import mesh as pm

__all__ = ["ShardedJointModel", "fit_sharded_joint", "sharded_joint_gram"]


def sharded_joint_gram(name: str, x, params, noise_f, noise_g, mesh, *,
                       axis: str = "row"):
    """Row-band-sharded joint Gram (4C, 4C). x (C,3), noise_* (C,)."""
    if not kf.supports_derivatives(name):
        raise ValueError(f"kernel {name!r} does not support derivative observations")
    c = x.shape[0]
    n4 = 4 * c
    p = mesh.shape[axis]
    if n4 % p:
        raise ValueError(f"joint size {n4} not divisible by mesh size {p}")
    rows_per = n4 // p
    dt = x.dtype

    def body(x_full, nf, ng):
        me = lax.axis_index(axis)
        g0 = me * rows_per
        grows = g0 + jax.lax.broadcasted_iota(jnp.int32, (rows_per,), 0)
        t = grows // c          # row type: 0=value, 1..3 = gradient dim+1
        i = grows % c           # underlying point index
        flag = (t == 0).astype(dt)[:, None]            # (R, 1)
        onehot = jax.nn.one_hot(jnp.maximum(t - 1, 0), 3, dtype=dt)  # (R, 3)
        onehot = onehot * (1.0 - flag)                  # zero for value rows

        xi = x_full[i]                                  # (R, 3)
        diff = xi[:, None, :] - x_full[None, :, :]      # (R, C, 3)
        r2 = jnp.sum(diff * diff, axis=-1)
        kv = kf.k_r2(name, r2, params)
        dk = kf.dk_dr2(name, r2, params)
        h = kf.d2k_dr2(name, r2, params)
        # dsel = diff along this row's gradient dim (zero for value rows).
        dsel = jnp.einsum("rd,rcd->rc", onehot, diff)
        zero = r2 <= 1e-24

        # Exact diagonal values at r=0 (thin-plate clamps are sub-fp here,
        # but pin them exactly like the dense assembly does).
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_per, c), 1)
        same_pt = col_ids == i[:, None]
        k0 = kf.k_diag0(name, params).astype(dt)
        kv = jnp.where(same_pt, k0, kv)

        blocks = []
        # Block u=0: cov(row, f(x_j)).
        val = flag * kv + (1.0 - flag) * (2.0 * dk * dsel)
        blocks.append(val)
        for e in range(3):
            de = diff[:, :, e]
            # value rows: cov(f(x_i), d_e f(x_j)) = -2 dk diff_e
            v_val = -2.0 * dk * de
            # gradient rows: -2 dk δ_{d,e} - 4 h diff_d diff_e
            delta = onehot[:, e : e + 1]               # (R, 1)
            hterm = jnp.where(zero, 0.0, h * dsel * de)
            v_grad = -2.0 * dk * delta - 4.0 * hterm
            blocks.append(flag * v_val + (1.0 - flag) * v_grad)
        k_rows = jnp.concatenate(blocks, axis=1)       # (R, 4C)

        # Diagonal noise: joint row g gets noise_f (t=0) or noise_g (t>0)
        # at joint column == g.
        jcol = jax.lax.broadcasted_iota(jnp.int32, (rows_per, n4), 1)
        diag = jcol == grows[:, None]
        row_noise = jnp.where(t == 0, nf[i], ng[i])[:, None]
        return jnp.where(diag, k_rows + row_noise, k_rows)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(axis, None),
    )
    return fn(x, jnp.broadcast_to(jnp.asarray(noise_f, dt), (c,)),
              jnp.broadcast_to(jnp.asarray(noise_g, dt), (c,)))


@dataclasses.dataclass
class ShardedJointModel:
    """Sharded joint (value+gradient) GP; same opaque-model contract as
    ShardedGPModel (predict / capacity / dtype)."""

    kernel: str
    x: jax.Array  # (C, 3) replicated
    params: dict
    l: jax.Array  # (4C, 4C) row-band-sharded
    w: jax.Array  # (4C, 4C) row-band-sharded
    alpha: jax.Array  # (4C,) replicated
    mesh: object
    block: int
    n0: int
    normals: jax.Array | None = None  # (C, 3) kept for session dispatch

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def dtype(self):
        return self.x.dtype

    def predict(self, q, *, precision=None):
        m = q.shape[0]
        p = self.mesh.shape["row"]
        pad = (-m) % p
        qp = jnp.pad(jnp.asarray(q, self.dtype), ((0, pad), (0, 0)))
        cross = lambda name, qq, xx, pp: kd.cross_cov_value(name, qq, xx, pp)
        mean, var = sh.sharded_predict_linv(
            self.kernel, qp, self.x, self.params, self.alpha, self.w,
            self.mesh, cross_fn=cross,
        )
        return mean[:m], var[:m]


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
    pad_noise: float = 1e10,
    dtype=None,
) -> ShardedJointModel:
    """Distributed joint fit. Capacity is padded so 4C tiles into the mesh."""
    mesh = mesh or pm.make_row_mesh(n_devices)
    p = mesh.shape["row"]
    dtype = dtype or jnp.asarray(x).dtype
    n = x.shape[0]
    # 4C must divide into p devices x block tiles; C itself to p for queries.
    c = round_up(n, max(p, (p * block) // 4 + ((p * block) % 4 > 0)))
    while (4 * c) % (p * block) or c % p:
        c += 1
    xp = jnp.zeros((c, 3), dtype).at[:n].set(jnp.asarray(x, dtype))
    yp = jnp.zeros((c,), dtype).at[:n].set(jnp.asarray(y, dtype))
    nrm = jnp.zeros((c, 3), dtype).at[:n].set(jnp.asarray(normals, dtype))
    nf = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise_f, dtype), (n,)))
    ng = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise_g, dtype), (n,)))
    params = {k: jnp.asarray(v, dtype) for k, v in params.items()}

    eps = float(jnp.finfo(dtype).eps)
    jitter0 = 4.0 * eps * 4 * c * abs(float(kf.k_diag0(kernel, params)))
    for extra in (0.0, jitter0, jitter0 * 100.0, jitter0 * 1e4):
        a = sharded_joint_gram(kernel, xp, params, nf + extra, ng + extra, mesh)
        l = sh.sharded_cholesky(a, mesh, block=block)
        if not bool(jnp.isnan(jnp.diagonal(l)).any()):
            break
    else:
        raise FloatingPointError("sharded joint Cholesky failed even with jitter")
    w = sh.sharded_linv(l, mesh, block=block)
    yj = kd.joint_targets(yp, nrm)
    alpha = sh.sharded_alpha_from_linv(w, yj, mesh)
    return ShardedJointModel(
        kernel=kernel, x=xp, params=params, l=l, w=w, alpha=alpha,
        mesh=mesh, block=block, n0=c, normals=nrm,
    )
