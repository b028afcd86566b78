"""Randomized column-pivoted (rank-revealing) QR.

No reference analogue — the reference factors full-rank panels only
(rank deficiency is the caller's problem, tcqr32x16.cu's Householder
clamps handle exact zeros but reveal nothing).  This is the standard
production answer for rank-deficient / low-rank A: A Π = Q R with the
diagonal of R non-increasing in magnitude, so a numerical rank and a
column subset (interpolative basis) fall out.

TPU-first structure (Duersch & Gu, "Randomized QR with Column
Pivoting" — pivoting decisions from a SKETCH so the m-scale work stays
pure GEMM):

  1. sketch  B = Ω A, Ω (l, m) Gaussian with l = n + oversample — one
     MXU GEMM; the only m-scale work besides the final QR.
  2. pivot   column-pivoted Householder QR of the small (l, n) B on
     device (``lax.fori_loop``, masked full-width updates — O(l n^2)
     flops, ~n^3, negligible vs m n^2).  Only the permutation and B's
     rank-revealing diagonal are kept.
  3. factor  A[:, Π] through the fast path (`fastqr` /
     `qr_auto_fused`, or the distributed ladder under ``mesh=``), so
     the m-scale QR runs at full MXU speed with NO per-column syncs —
     the classical QRCP's column-norm downdates serialize on exactly
     the hardware path TPUs are worst at.

Sketch pivoting is probabilistic: with l = n + p the sketch preserves
column-subset conditioning up to small factors w.h.p. (oblivious
subspace embedding); the returned ``diag_b`` exposes the sketch's
R-diagonal for rank thresholding by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from tsqr_tpu import modes

Array = jax.Array


@functools.partial(jax.jit, static_argnames=())
def _qrcp_small(b: Array) -> tuple[Array, Array]:
    """Column-pivoted Householder QR of a small (l, n) matrix.

    Returns (piv (n,) int32, rdiag (n,) f32): the pivot order and the
    |R| diagonal (non-increasing, the rank-revealing signal).  Q is
    never formed — only the permutation matters.  Static-shape
    formulation: per step k, one masked argmax over trailing column
    norms, one physical column swap (gather), one masked Householder
    reflection applied full-width (columns already triangularized are
    zero on the reflected rows, so they are unchanged).
    """
    l, n = b.shape
    b = b.astype(jnp.float32)
    rows = jnp.arange(l)[:, None]          # (l, 1)
    cols = jnp.arange(n)                   # (n,)

    def body(k, st):
        r, piv = st
        # trailing column norms on rows >= k, masked to columns >= k
        tail = jnp.where(rows >= k, r, 0.0)
        norms = jnp.sum(tail * tail, axis=0)
        norms = jnp.where(cols >= k, norms, -jnp.inf)
        p = jnp.argmax(norms)
        # swap columns k <-> p (gather with a swapped index vector)
        idx = cols.at[k].set(p).at[p].set(cols[k])
        r = r[:, idx]
        piv = piv[idx]
        # Householder for column k on rows >= k
        x = jnp.where(rows[:, 0] >= k, r[:, k], 0.0)
        sigma = jnp.sqrt(jnp.sum(x * x))
        xk = x[k]
        alpha = -jnp.sign(jnp.where(xk == 0, 1.0, xk)) * sigma
        v = x.at[k].add(-alpha)
        vtv = jnp.sum(v * v)
        beta = jnp.where(vtv > 0, 2.0 / jnp.where(vtv > 0, vtv, 1.0), 0.0)
        # full-precision contraction (CLAUDE.md invariant): a default
        # f32 matmul is bf16-grade on TPU, and the reflection error
        # compounds over all n steps into diag_b — the rank signal
        w = modes.mm_fp32(v[None, :], r)[0]
        r = r - beta * v[:, None] * w[None, :]
        # pin the diagonal exactly (the reflection maps col k to alpha e_k)
        r = r.at[:, k].set(jnp.where(rows[:, 0] == k, alpha,
                                     jnp.where(rows[:, 0] > k, 0.0,
                                               r[:, k])))
        return r, piv

    r, piv = lax.fori_loop(0, min(l, n), body,
                           (b, jnp.arange(n, dtype=jnp.int32)))
    return piv, jnp.abs(jnp.diagonal(r[:n, :n]))


# the chunked on-the-fly Gaussian sketch moved to core/cholqr.py
# (shared with rand_cholqr); re-exported under the historical name
from tsqr_tpu.core.cholqr import sketch_gaussian as _sketch  # noqa: E402


def pivoted_qr(a: Array, key: Array,
               mode: modes.ComputeMode | str = "fp32",
               oversample: int = 8, mesh=None,
               **qr_kw) -> tuple[Array, Array, Array, Array]:
    """Rank-revealing QR: A[:, piv] = Q R with |diag| non-increasing.

    Returns (Q (m, n), R (n, n), piv (n,), diag_b (n,)) — ``piv`` the
    column permutation (apply as ``a[:, piv]``), ``diag_b`` the
    sketch's rank-revealing |R|-diagonal: a numerical rank is
    ``int(jnp.sum(diag_b > tol * diag_b[0]))``.

    ``mesh``: row-shard A to run multi-chip — the sketch GEMM contracts
    over the sharded axis by itself (computation follows sharding) and
    the final QR routes through the distributed ladder.
    """
    m, n = a.shape
    if m < n:
        raise ValueError(f"pivoted_qr requires m >= n, got {a.shape}")
    l = min(m, n + oversample)
    b = _sketch(a, key, l)
    piv, diag_b = _qrcp_small(b)
    ap = jnp.take(a, piv, axis=1)
    if mesh is not None:
        from tsqr_tpu.parallel import dtsqr
        q, r = dtsqr.dqr_auto(ap, mesh, mode, **qr_kw)
    else:
        from tsqr_tpu.core.auto import qr_auto_fused
        q, r = qr_auto_fused(ap, mode, **qr_kw)
    return q, r, piv, diag_b
