"""Randomized SVD built on TSQR (BASELINE.json config: 'batched TSQR
feeding randomized SVD').  No reference analogue — the reference stops at
QR; this is the model-level consumer the TPU build ships so TSQR's
orthogonalization quality is exercised end-to-end."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import tsqr as tsqr_mod

Array = jax.Array


def rsvd(a: Array, rank: int, key: Array,
         mode: modes.ComputeMode | str = "fp32",
         oversample: int = 8, power_iters: int = 1,
         **tsqr_kw) -> tuple[Array, Array, Array]:
    """Randomized truncated SVD: A (m, n) ≈ U diag(s) V^T at given rank.

    Range finding uses TSQR (tall sketch Y = A @ Omega is exactly the
    tall-skinny shape TSQR exists for); power iterations re-orthogonalize
    with TSQR as well (Halko et al. structure, TSQR-flavored).
    """
    m, n = a.shape
    k = min(rank + oversample, n)
    omega = jax.random.normal(key, (n, k), jnp.float32)
    y = modes.mm_fp32(a, omega)
    q, _ = tsqr_mod.tsqr(y, mode, **tsqr_kw)
    for _ in range(power_iters):
        z = modes.mm_fp32(a.T, q.astype(jnp.float32))
        y = modes.mm_fp32(a, z)
        q, _ = tsqr_mod.tsqr(y, mode, **tsqr_kw)
    b = modes.mm_fp32(q.astype(jnp.float32).T, a)     # (k, n)
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = modes.mm_fp32(q.astype(jnp.float32), ub)
    return u[:, :rank], s[:rank], vt[:rank]
