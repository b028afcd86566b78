"""Batched panel QR dispatch: jnp path now, Pallas kernel alongside.

≙ mtk::tcqr::qr32x16{,_batched} (tcqr.hpp:22-37): the reference factors one
<=32x16 tile per pair of warps entirely in shared memory.  The TPU version
factors one (L, n) leaf tile per Pallas program with the panel resident in
VMEM, MXU-driven reflector applications, and a grid over the leaf batch
(the 4-tiles-per-threadblock batching of qr32x16_batched_kernel,
tcqr32x16.cu:1471-1532, becomes the Pallas grid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.ops import householder

Array = jax.Array


def panel_qr(a: Array,
             mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
             block: int = 8) -> tuple[Array, Array]:
    """QR of a single (m, n) panel or a (B, m, n) batch of panels.

    ≙ qr32x16 (single, tcqr.hpp:22-28) / qr32x16_batched (tcqr.hpp:30-37),
    without the 32x16 shape restriction.
    """
    policy = modes.resolve(mode)
    fn = functools.partial(householder.blocked_householder_qr,
                           mm=policy.mm, block=block)
    if a.ndim == 2:
        q, r = fn(a.astype(jnp.float32))
    elif a.ndim == 3:
        q, r = jax.vmap(fn)(a.astype(jnp.float32))
    else:
        raise ValueError(f"expected (m, n) or (B, m, n), got {a.shape}")
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)
