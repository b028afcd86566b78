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
         mesh=None, **tsqr_kw) -> tuple[Array, Array, Array]:
    """Randomized truncated SVD: A (m, n) ≈ U diag(s) V^T at given rank.

    Range finding uses TSQR (tall sketch Y = A @ Omega is exactly the
    tall-skinny shape TSQR exists for); power iterations re-orthogonalize
    with TSQR as well (Halko et al. structure, TSQR-flavored).

    ``mesh``: pass a `parallel.mesh` Mesh with `a` row-sharded over it
    to run multi-chip — the orthogonalizations route through the
    distributed self-validating ladder (`dtsqr.dqr_auto`, one (n, n)
    psum on the fast tier) while every matmul distributes itself: a
    row-sharded operand makes A^T·Q / Q^T·A psum-contractions and
    A·Z / Q·U_b local, so U comes back row-sharded like A with no
    explicit collectives here (computation follows sharding).
    """
    m, n = a.shape
    k = min(rank + oversample, n)
    omega = jax.random.normal(key, (n, k), jnp.float32)

    def _orth(y):
        if mesh is None:
            return tsqr_mod.tsqr(y, mode, **tsqr_kw)[0]
        from tsqr_tpu.parallel import dtsqr
        return dtsqr.dqr_auto(y, mesh, mode, **tsqr_kw)[0]

    y = modes.mm_fp32(a, omega)
    q = _orth(y)
    for _ in range(power_iters):
        z = modes.mm_fp32(a.T, q.astype(jnp.float32))
        y = modes.mm_fp32(a, z)
        q = _orth(y)
    b = modes.mm_fp32(q.astype(jnp.float32).T, a)     # (k, n)
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = modes.mm_fp32(q.astype(jnp.float32), ub)
    return u[:, :rank], s[:rank], vt[:rank]
