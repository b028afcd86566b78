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
          reorth: bool = False, mesh=None, **qr_kw) -> Array:
    """Solve min ||A x - b||: A (m, n) tall, b (m,) or (m, k).

    ``mesh``: row-shard A and b over a `parallel.mesh` Mesh to run
    multi-chip — the factorization goes through distributed BlockQR
    (`dtsqr.dqr`) and Q^T b contracts over the sharded axis by itself
    (computation follows sharding); x comes back replicated."""
    if mesh is not None:
        from tsqr_tpu.parallel import dtsqr
        q, r = dtsqr.dqr(a, mesh, mode, reorth=reorth, **qr_kw)
    else:
        q, r = blockqr.qr(a, mode, reorth=reorth, **qr_kw)
    q = q.astype(jnp.float32)
    r = r.astype(jnp.float32)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    qtb = modes.mm_fp32(q.T, b.astype(jnp.float32))
    x = jax.scipy.linalg.solve_triangular(r, qtb, lower=False)
    return x[:, 0] if squeeze else x


def lstsq_regen(gen_chunk, b: Array, m: int, n: int,
                mode: modes.ComputeMode | str = "bf16x6_cor",
                method: str = "cholqr2",
                chunk_rows: int = 1 << 21) -> tuple[Array, dict]:
    """Matrix-free least squares: min ||A x - b|| where A is defined by
    ``gen_chunk(i)`` (core/ooc.qr_regen's generator contract) and never
    materialized — the beyond-HBM consumer story: at m = 2^26 the data
    matrix exceeds the chip, but b (m,) and the solve stay resident.

    Uses the composed factor from the streamed QR: Q = A R^{-1}, so
    x = R^{-1} Q^T b = rinv (rinv^T (A^T b)) with A^T b accumulated
    chunk-wise, and the relative residual ||A x - b|| / ||b|| streamed
    the same way — both in one fused program per phase.

    Returns (x, info) with info = {residual, orthogonality} — residual
    is the ACHIEVED relative least-squares residual (includes any
    component of b outside range(A)); orthogonality is inherited from
    the QR's streamed self-measurement.
    """
    from jax import lax

    from tsqr_tpu.core import ooc

    assert b.shape[0] == m and m % chunk_rows == 0
    n_chunks = m // chunk_rows
    squeeze = b.ndim == 1
    bmat = b[:, None] if squeeze else b
    k = bmat.shape[1]

    _, info = ooc.qr_regen(gen_chunk, m, n, mode, method=method,
                           chunk_rows=chunk_rows)
    rinv = info["rinv"]

    @jax.jit
    def solve(bm):
        bm = bm.astype(jnp.float32)

        def atb_body(i, acc):
            x32 = gen_chunk(i).astype(jnp.float32)
            bc = lax.dynamic_slice(bm, (i * chunk_rows, 0),
                                   (chunk_rows, k))
            return acc + lax.dot_general(
                x32, bc, (((0,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        atb = lax.fori_loop(0, n_chunks, atb_body,
                            jnp.zeros((n, k), jnp.float32))
        x = modes.mm_fp32(rinv, modes.mm_fp32(rinv.T, atb))

        def res_body(i, carry):
            r2, b2 = carry
            x32 = gen_chunk(i).astype(jnp.float32)
            bc = lax.dynamic_slice(bm, (i * chunk_rows, 0),
                                   (chunk_rows, k))
            d = modes.mm_fp32(x32, x) - bc
            return r2 + jnp.sum(d * d), b2 + jnp.sum(bc * bc)

        r2, b2 = lax.fori_loop(0, n_chunks, res_body,
                               (jnp.zeros((), jnp.float32),
                                jnp.zeros((), jnp.float32)))
        return x, jnp.sqrt(r2) / jnp.sqrt(b2)

    x, resid = solve(bmat)
    out = x[:, 0] if squeeze else x
    return out, {"residual": resid,
                 "orthogonality": info["orthogonality"]}
