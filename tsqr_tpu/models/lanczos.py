"""Block Lanczos with TSQR orthogonalization (BASELINE.json config:
'batched TSQR feeding ... block Lanczos').  Demonstrates the reorth-grade
orthogonality: each Lanczos block is orthonormalized by TSQR (+ optional
two-pass block CGS against the basis)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import tsqr as tsqr_mod

Array = jax.Array


def block_lanczos(matvec, n: int, block: int, iters: int, key: Array,
                  mode: modes.ComputeMode | str = "fp32",
                  full_reorth: bool = True, mesh=None,
                  **tsqr_kw) -> tuple[Array, Array, Array]:
    """Block Lanczos tridiagonalization of a symmetric operator.

    Args:
      matvec: function X (n, b) -> A @ X.
      n: operator dimension; block: block size; iters: Lanczos steps.
    Returns (basis Q (n, block*iters), alphas (iters, b, b),
    betas (iters-1, b, b)) with Q^T A Q block-tridiagonal.

    ``mesh``: run multi-chip — the basis row-shards over the mesh, the
    per-step orthogonalizations go through the distributed ladder
    (`dtsqr.dqr_auto`), and the Gram/projection contractions
    self-distribute; ``matvec`` must accept (and should return) the
    row-sharded layout (a GSPMD-compatible jnp matvec already does).
    """
    def _orth(x):
        if mesh is None:
            return tsqr_mod.tsqr(x, mode, **tsqr_kw)
        from tsqr_tpu.parallel import dtsqr
        return dtsqr.dqr_auto(x, mesh, mode, **tsqr_kw)

    v0 = jax.random.normal(key, (n, block), jnp.float32)
    if mesh is not None:
        from tsqr_tpu.parallel import mesh as mesh_mod
        v0 = jax.device_put(v0, mesh_mod.row_sharding(mesh))
    q, _ = _orth(v0)
    q = q.astype(jnp.float32)
    basis = [q]
    alphas, betas = [], []
    q_prev, b_prev = None, None
    for it in range(iters):
        w = matvec(q)
        alpha = modes.mm_fp32(q.T, w)
        w = w - modes.mm_fp32(q, alpha)
        if q_prev is not None:
            w = w - modes.mm_fp32(q_prev, b_prev.T)
        if full_reorth:
            qs = jnp.concatenate(basis, axis=1)
            w = w - modes.mm_fp32(qs, modes.mm_fp32(qs.T, w))
        alphas.append(alpha)
        if it + 1 == iters:
            break
        q_next, beta = _orth(w)
        q_next = q_next.astype(jnp.float32)
        betas.append(beta.astype(jnp.float32))
        q_prev, b_prev = q, betas[-1]
        q = q_next
        basis.append(q)
    return (jnp.concatenate(basis, axis=1), jnp.stack(alphas),
            jnp.stack(betas) if betas else jnp.zeros((0, block, block)))
