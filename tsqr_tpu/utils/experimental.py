"""Numerical fault-injection: forced exponent clamping.

≙ reference src/experimental.{hpp,cu}: ``min_exponent`` clamps element
exponents to force underflow, used to study fp16 exponent-range loss
(experimental.cu:5-19; invoked from the commented-out site tsqr.cu:1179).
On TPU, bf16 shares fp32's exponent range, so this is a *validation study*
tool (quantify what the reference's fp16 pipeline would have lost) rather
than a production concern — pair with
:func:`tsqr_tpu.utils.validation.exponent_distribution`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def min_exponent(x: Array, min_exp: int) -> Array:
    """Zero out elements whose binary exponent is below ``min_exp``
    (flush-to-zero at a configurable threshold, ≙ experimental.cu:5-19)."""
    x = x.astype(jnp.float32)
    mag = jnp.abs(x)
    return jnp.where(mag < jnp.float32(2.0) ** min_exp, 0.0, x)


def clamp_exponent_range(x: Array, min_exp: int, max_exp: int) -> Array:
    """Clamp magnitudes into [2^min_exp, 2^max_exp] — emulates a narrower
    exponent format (e.g. fp16's [-14, 15]) on fp32 data."""
    x = x.astype(jnp.float32)
    mag = jnp.abs(x)
    lo = jnp.float32(2.0) ** min_exp
    hi = jnp.float32(2.0) ** max_exp
    flushed = jnp.where(mag < lo, 0.0, x)
    return jnp.clip(flushed, -hi, hi)


def fp16_range_study(a: Array, qr_fn) -> dict:
    """Run a QR once on pristine data and once with fp16-range-clamped
    inputs; report the orthogonality/residual deltas.  This reproduces the
    reference's underflow experiments (EVALUATE_EXPONENT_DISTRIBUTION,
    tsqr.cu:26) as a single call."""
    import numpy as np
    from tsqr_tpu.utils import validation

    q0, r0 = qr_fn(a)
    a16 = clamp_exponent_range(a, -14, 15)
    q1, r1 = qr_fn(a16)
    return {
        "orthogonality": validation.orthogonality(np.asarray(q0)),
        "orthogonality_fp16_range": validation.orthogonality(np.asarray(q1)),
        "residual": validation.residual(np.asarray(a), np.asarray(q0),
                                        np.asarray(r0)),
        "residual_fp16_range": validation.residual(
            np.asarray(a16), np.asarray(q1), np.asarray(r1)),
        "exponent_hist": validation.exponent_distribution(np.asarray(a)),
    }
