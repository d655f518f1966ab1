"""Sharded GP model (config 5 behind the session API).

Host-side handle owning the row-band-sharded device state (Gram factor L,
W = L^{-1}) plus replicated small state (coordinates, alpha).  Produced by
`fit_sharded`, consumed by `ObjectModelSession` when its `MeshConfig` asks
for more than one device — the same public verbs (predict / save / load)
as the single-chip `GPModel`, so the rest of the stack is oblivious.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpis_tpu.gp.model import round_up
from gpis_tpu.kernels import functions as kf
from gpis_tpu.linalg import sharded as sh
from gpis_tpu.parallel import mesh as pm

__all__ = ["ShardedGPModel", "fit_sharded"]


@dataclasses.dataclass
class ShardedGPModel:
    """Not a pytree (holds a Mesh); the session treats it as an opaque model."""

    kernel: str
    x: jax.Array  # (C, 3) replicated
    y: jax.Array  # (C,)  replicated
    noise: jax.Array  # (C,)
    params: dict
    l: jax.Array  # (C, C) row-band-sharded Cholesky factor
    w: jax.Array  # (C, C) row-band-sharded L^{-1}
    alpha: jax.Array  # (C,) replicated
    mesh: object
    block: int
    n0: int

    # Touch slots filled so far (host-side counter; slots live in the last
    # device's row band so incremental updates refactor one band only).
    n_touch: int = 0
    # Number of real (non-padding) training rows from the initial fit.
    n_real: int = 0

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def dtype(self):
        return self.x.dtype

    def update(self, new_x, new_y, new_noise) -> "ShardedGPModel":
        """Incremental tactile update (reference §4.5, distributed): write
        the touch points into tail-band slots and refactor only the last
        row band via the sharded bordering update."""
        p = self.mesh.shape["row"]
        c = self.capacity
        band = c // p
        rest = c - band
        k_new = int(np.asarray(new_x).shape[0])
        # Touch slots begin after the real rows, but never before the tail
        # band (the bordering update refactors the tail band only).
        start = max(self.n_real, rest) + self.n_touch
        if start + k_new > c:
            raise ValueError(
                f"touch batch {k_new} exceeds remaining tail-band capacity "
                f"{c - start} (band size {band})"
            )
        dt = self.dtype
        x = self.x.at[start : start + k_new].set(jnp.asarray(new_x, dt))
        y = self.y.at[start : start + k_new].set(jnp.asarray(new_y, dt))
        floor = 4.0 * float(jnp.finfo(dt).eps) * c * abs(
            float(kf.k_diag0(self.kernel, self.params))
        )
        nz = jnp.maximum(jnp.broadcast_to(jnp.asarray(new_noise, dt), (k_new,)), floor)
        noise = self.noise.at[start : start + k_new].set(nz)

        l_new, w_new = sh.sharded_update_tail(
            self.kernel, self.params, x, noise, self.l, self.w, self.mesh
        )
        alpha = sh.sharded_alpha_from_linv(w_new, y, self.mesh)
        return dataclasses.replace(
            self, x=x, y=y, noise=noise, l=l_new, w=w_new, alpha=alpha,
            n_touch=self.n_touch + k_new,
        )

    # Session-facing prediction API (GPModel-compatible shape).
    def predict(self, q, *, precision=None):
        m = q.shape[0]
        p = self.mesh.shape["row"]
        pad = (-m) % p
        qp = jnp.pad(jnp.asarray(q, self.dtype), ((0, pad), (0, 0)))
        kw = {} if precision is None else {"precision": precision}
        mean, var = sh.sharded_predict_linv(
            self.kernel, qp, self.x, self.params, self.alpha, self.w, self.mesh, **kw
        )
        return mean[:m], var[:m]


def fit_sharded(
    kernel: str,
    x,
    y,
    noise,
    params,
    mesh=None,
    *,
    n_devices: int | None = None,
    block: int = 256,
    touch_capacity: int = 0,
    pad_noise: float = 1e10,
    dtype=None,
    jitter: float | None = None,
) -> ShardedGPModel:
    """Distributed fit: row-sharded Gram -> ICI blocked Cholesky -> W=L^{-1}
    -> alpha, on `mesh` (or a fresh row mesh over n_devices)."""
    mesh = mesh or pm.make_row_mesh(n_devices)
    p = mesh.shape["row"]
    dtype = dtype or jnp.asarray(x).dtype
    n = x.shape[0]
    # Capacity: multiple of devices x block, with touch slots guaranteed to
    # fit in the LAST device's band (see ShardedGPModel.update).
    c = round_up(n + touch_capacity, p * block)
    while c - max(n, c - c // p) < touch_capacity:
        c += p * block
    xp = jnp.zeros((c, 3), dtype).at[:n].set(jnp.asarray(x, dtype))
    yp = jnp.zeros((c,), dtype).at[:n].set(jnp.asarray(y, dtype))
    np_ = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise, dtype), (n,))
    )
    params = {k: jnp.asarray(v, dtype) for k, v in params.items()}
    if jitter is None:
        eps = float(jnp.finfo(dtype).eps)
        jitter = 4.0 * eps * c * abs(float(kf.k_diag0(kernel, params)))

    # Same ladder as gpr.fit: jitter-free first (bit-parity with the
    # single-chip fit when conditioning allows), escalate on NaN.
    # On TPU the panel updates run through the k-tile-skipping Pallas
    # kernel (the masked-GEMM HIGHEST path measured ~0.4 TFLOP/s there).
    use_pallas = jax.default_backend() == "tpu"
    l = None
    for extra in (0.0, jitter, jitter * 100.0, jitter * 1e4):
        a = sh.sharded_gram(kernel, xp, params, np_ + extra, mesh)
        l = sh.sharded_cholesky(a, mesh, block=block, use_pallas=use_pallas)
        if not bool(jnp.isnan(jnp.diagonal(l)).any()):
            np_ = np_ + extra
            break
    else:
        raise FloatingPointError("sharded Cholesky failed even with jitter")
    w = sh.sharded_linv(l, mesh, block=block)
    alpha = sh.sharded_alpha_from_linv(w, yp, mesh)
    return ShardedGPModel(
        kernel=kernel, x=xp, y=yp, noise=np_, params=params,
        l=l, w=w, alpha=alpha, mesh=mesh, block=block, n0=c, n_real=n,
    )
