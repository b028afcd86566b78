"""Least-squares solver via BlockQR: min ||Ax - b||_2.

The canonical consumer of a QR library (the reference exposes Q and R for
exactly this use, README.md:33-41); solves via R x = Q^T b with a
triangular solve."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr

Array = jax.Array


def lstsq(a: Array, b: Array,
          mode: modes.ComputeMode | str = "fp32",
          reorth: bool = False, **qr_kw) -> Array:
    """Solve min ||A x - b||: A (m, n) tall, b (m,) or (m, k)."""
    q, r = blockqr.qr(a, mode, reorth=reorth, **qr_kw)
    q = q.astype(jnp.float32)
    r = r.astype(jnp.float32)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    qtb = modes.mm_fp32(q.T, b.astype(jnp.float32))
    x = jax.scipy.linalg.solve_triangular(r, qtb, lower=False)
    return x[:, 0] if squeeze else x
