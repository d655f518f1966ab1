"""GPModel: the immutable model pytree (rebuild of reference component C2's
model struct, SURVEY.md §3 C2: "model holds X, y, chol(K), alpha").

TPU-first design
----------------
The reference's `GPRegressor` mutates an Eigen model in place and re-allocates
when tactile points arrive.  Under XLA everything must be static-shape, so the
rebuild preallocates a fixed *capacity* C (a multiple of the tile block):

* rows ``[0, n0)``   — the initial GPIS training set (surface/internal/external)
* rows ``[n0, C)``   — touch slots, initially *padding*

Padding rows sit at the origin with target 0 and a huge observation noise
``pad_noise``; with noise sigma^2 ~ 1e10 a padding row's contribution to the
posterior mean/variance is O(k^2/sigma^2) ~ 1e-9 — below the 1e-6 parity bar
(BASELINE.md row 2) — so *the padded model is numerically the unpadded model*
while every array shape stays static under jit.  Incremental update
(SURVEY.md §4.5) then writes touch points into slots and re-factorizes only
the trailing rows ``[n0, C)`` against the unchanged leading factor (a
bordering Cholesky update), instead of the reference's full O(N^3) refit.
"""

from __future__ import annotations

import dataclasses

import jax

__all__ = ["GPModel", "round_up", "align_capacity"]


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def align_capacity(total: int, *, align: int = 1024, floor: int = 4096) -> int:
    """Round a model/system capacity up to an MXU-friendly `align` multiple.

    The fused query kernels (kernels/pallas_query.py, pallas_joint.py) clamp
    their swept row tile TI down to a divisor of the capacity: a capacity
    like 16640 (block-multiple only) silently degrades TI 1024 -> 256, which
    the 2026-08-18 hardware sweep measured at 1.36x slower (1.884 vs
    1.384 s for a 64^3 grid at 16k).  Capacities below `floor` keep their
    exact padding: small models are launch-bound and tests rely on tight
    shapes.  Extra rows are ordinary pad/touch slots (inert under
    `pad_noise`), so alignment only ever ADDS usable touch capacity."""
    if total < floor:
        return total
    return round_up(total, align)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GPModel:
    """Exact-GP state. All arrays share capacity C (static, block-multiple)."""

    # --- data fields (traced leaves) ---
    x: jax.Array  # (C, 3) training positions (normalized frame)
    y: jax.Array  # (C,)  GPIS targets
    noise: jax.Array  # (C,) per-point observation variance (pad rows: pad_noise)
    params: dict  # kernel hyperparameters {"lengthscale","signal_variance"}
    chol: jax.Array  # (C, C) lower Cholesky factor of K + diag(noise)
    alpha: jax.Array  # (C,)  (K + diag(noise))^{-1} y
    n_touch: jax.Array  # ()   int32: touch points currently occupying slots
    # --- metadata (static, part of the jit cache key) ---
    kernel: str = dataclasses.field(metadata=dict(static=True))
    n0: int = dataclasses.field(metadata=dict(static=True))  # initial-point boundary
    # Observation variance assigned to padding rows at fit time.  Stored so
    # reset_touches can restore cleared slots to *inert* padding exactly —
    # inferring it from max(noise) is wrong once every slot holds a real
    # touch observation.
    pad_noise: float = dataclasses.field(metadata=dict(static=True), default=1e10)
    # Optional precomputed (K + diag(noise))^{-1} (C, C): turns the variance
    # path from a triangular solve into two pure GEMMs — the right trade for
    # dense-grid queries (BASELINE config 4). None = use the solve path.
    kinv: jax.Array | None = None
    # Optional precomputed L^{-1} (C, C): variance = k0 - ||W K*^T||^2 — one
    # GEMM per chunk, half the flops of the kinv path and better
    # conditioned. Preferred when present.
    linv: jax.Array | None = None

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def dtype(self):
        return self.x.dtype
