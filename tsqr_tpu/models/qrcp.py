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
def _qrcp_small(b: Array) -> tuple[Array, Array, Array]:
    """Column-pivoted Householder QR of a small (l, n) matrix.

    Returns (piv (n,) int32, rdiag (min(l,n),) f32, r (l, n) f32): the
    pivot order, the |R| diagonal (non-increasing, the rank-revealing
    signal), and the triangularized R itself — B[:, piv] = Q_s R (the
    interpolative coefficient source).  Q is never formed — only the
    permutation and R matter.  Static-shape
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
    return piv, jnp.abs(jnp.diagonal(r[:n, :n])), r


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
    b = _sketch(a, key, l, mesh=mesh)
    piv, diag_b, _ = _qrcp_small(b)
    ap = jnp.take(a, piv, axis=1)
    if mesh is not None:
        from tsqr_tpu.parallel import dtsqr
        q, r = dtsqr.dqr_auto(ap, mesh, mode, **qr_kw)
    else:
        from tsqr_tpu.core.auto import qr_auto_fused
        q, r = qr_auto_fused(ap, mode, **qr_kw)
    return q, r, piv, diag_b


def interpolative(a: Array, key: Array, k: int,
                  oversample: int = 8,
                  mesh=None) -> tuple[Array, Array, Array]:
    """Column interpolative decomposition: A ~= A[:, cols] @ coeff.

    Sketch-only (Liberty et al. / Martinsson-Tropp structure): the
    pivots AND the coefficient both come from the column-pivoted QR of
    the small sketch B = Omega A (l = k + oversample rows), so the only
    m-scale work is the one sketch GEMM — there is NO m-scale QR at
    all.  B[:, piv] = Q_s R_s gives T = R_s[:k,:k]^{-1} R_s[:k,:]; the
    subspace embedding transfers B's column relationships to A's, so
    ||A - C T|| tracks the sketch-optimal rank-k error w.h.p.

    Returns (cols (k,) int32, coeff (k, n) f32, diag_b (l,) f32):
    ``a[:, cols] @ coeff`` approximates A in the ORIGINAL column order;
    ``coeff[:, cols] == I_k`` by construction (the skeleton columns
    reproduce exactly); ``diag_b`` is the sketch's rank-revealing
    |R|-diagonal for judging whether k was large enough (a sharp drop
    before index k means rank(A) < k and R_s[:k,:k] is ill-conditioned
    — pick k at the drop instead).

    No reference analogue (the CUDA library stops at Q/R).

    ``mesh``: row-shard A — the whole m-scale cost (the one sketch
    GEMM) reduces in a single (l, n) psum (`dtsqr.dsketch`); pivoting
    and the coefficient solve are replicated small work.
    """
    m, n = a.shape
    if not 1 <= k <= min(m, n):
        raise ValueError(f"interpolative: need 1 <= k <= min{a.shape}, "
                         f"got k={k}")
    l = min(m, min(n, k + oversample))
    b = _sketch(a, key, l, mesh=mesh)
    piv, diag_b, r_s = _qrcp_small(b)
    # T in pivot order: columns :k are exactly I_k (R11^{-1} R11)
    t = jax.scipy.linalg.solve_triangular(
        r_s[:k, :k], r_s[:k, :], lower=False)
    inv = jnp.argsort(piv)                 # back to original column order
    return piv[:k], t[:, inv], diag_b


def cur(a: Array, key: Array, k: int,
        mode: modes.ComputeMode | str = "fp32",
        oversample: int = 8, mesh=None) -> tuple[Array, Array, Array]:
    """CUR decomposition: A ~= A[:, cols] @ u @ A[rows, :].

    The self-expressive low-rank factorization — both factors are
    actual rows/columns of A, so they inherit sparsity /
    interpretability (the reason CUR exists).  Structure:

      cols   pivots of the column sketch  Omega  A      (one GEMM)
      rows   pivots of the row sketch     Omega' A^T    (one GEMM)
      u      (C^+ A) R_r^+ computed stably through QR: C = Q_c R_c by
             the library ladder (the m-scale tall QR), R_r^+ = Q_r
             R_rr^{-T} from the small QR of R_r^T — no normal equations
             anywhere.

    Cost: 2 sketch GEMMs + 1 (m, k) ladder QR + 1 (k, m)@(m, n) GEMM —
    all MXU-native.  Returns (cols (k,), u (k, k) f32, rows (k,)).
    Reconstruction error tracks sigma_{k+1} up to the skeleton
    conditioning; exactly-rank-k inputs reconstruct to eps grade.

    ``mesh``: row-shard A — the column sketch reduces via `dsketch`,
    C's QR runs through the distributed ladder (`dqr_auto`), and the
    (k, m)@(m, n) contraction self-distributes under GSPMD.  The row
    sketch Omega' A^T contracts over the small replicated n axis (an
    all-gather-shaped output, no psum), so it needs no explicit driver.
    """
    m, n = a.shape
    if not 1 <= k <= min(m, n):
        raise ValueError(f"cur: need 1 <= k <= min{a.shape}, got k={k}")
    l_c = min(m, min(n, k + oversample))
    piv_c, _, _ = _qrcp_small(_sketch(a, key, l_c, mesh=mesh))
    l_r = min(n, min(m, k + oversample))
    piv_r, _, _ = _qrcp_small(_sketch(a.T, jax.random.fold_in(key, 1), l_r))
    cols, rows = piv_c[:k], piv_r[:k]

    c = jnp.take(a, cols, axis=1).astype(jnp.float32)      # (m, k)
    r_rows = jnp.take(a, rows, axis=0).astype(jnp.float32)  # (k, n)
    # C^+ A = R_c^{-1} Q_c^T A through the ladder (tall, m-scale)
    if mesh is not None:
        from tsqr_tpu.parallel import dtsqr
        q_c, r_c = dtsqr.dqr_auto(c, mesh, mode)
    else:
        from tsqr_tpu.core.auto import qr_auto_fused
        q_c, r_c = qr_auto_fused(c, mode)
    x = jax.scipy.linalg.solve_triangular(
        r_c.astype(jnp.float32),
        modes.mm_fp32(q_c.astype(jnp.float32).T, a.astype(jnp.float32)),
        lower=False)                                        # (k, n)
    # R_r^+ = Q_r R_rr^{-T} from the small QR of R_r^T (n, k)
    q_r, r_rr = jnp.linalg.qr(r_rows.T, mode="reduced")
    y = modes.mm_fp32(x, q_r)                               # (k, k)
    u = jax.scipy.linalg.solve_triangular(r_rr, y.T, lower=False).T
    return cols, u, rows
