"""Precision-controlled matmuls for the posterior hot path.

On TPU the MXU multiplies bf16 natively; f32 GEMMs are emulated by
multi-pass bf16 products.  XLA's `precision=HIGHEST` requests that
emulation, but on this environment's backend it measured ~0.2 Tflop/s —
two orders below the bf16 peak — so `matmul_bf16x3` implements the
classic 3-pass split manually with plain DEFAULT-precision GEMMs:

    a = a_hi + a_lo   (a_hi = bf16(a), a_lo = bf16(a - a_hi))
    a @ b ~= a_hi b_hi + a_hi b_lo + a_lo b_hi      (f32 accumulation)

Three full-speed bf16 GEMMs recover ~2x bf16 mantissa (~16 bits), enough
for the variance quadratic form (the dropped a_lo·b_lo term is O(2^-16)
relative).  Error vs float64 is checked in tests/test_linalg.py.

`PrecisionLike` accepted by the predict paths: jax precision values, or the
string "bf16x3" to select this routine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["matmul_bf16x3", "matmul"]


def _split(a):
    hi = a.astype(jnp.bfloat16).astype(a.dtype)
    lo = a - hi
    return hi, lo


def matmul_bf16x3(a, b):
    """a @ b with three bf16 passes, f32 accumulation. f32 inputs only; any
    other dtype falls through to a plain dot."""
    if a.dtype != jnp.float32 or b.dtype != jnp.float32:
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)

    def d(x, y):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def matmul(a, b, precision=None):
    """Dispatch: "bf16x3" -> manual split; otherwise jnp.dot(precision=...)."""
    if precision == "bf16x3":
        return matmul_bf16x3(a, b)
    return jnp.dot(a, b, precision=precision)
