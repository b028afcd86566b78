"""QR factorization updating: append/delete rows and columns, low-rank
update.

Every update is expressed as a SMALL factorization (on (n+p, n)-scale
cores) plus large (m, n)-scale GEMMs — the MXU-shaped form — never as
the classical Givens / hyperbolic-rotation chains, whose element-at-a-
time dependency structure serializes on TPU and defeats XLA tiling.

The CUDA reference has no updating API (the library is stateless per
call, blockqr.hpp:142-175); this module is new capability: the
online/streaming complement to the row-streamed out-of-core pipelines
in core/ooc.py.  Each method reuses a reference-parity building block:

  qr_append_rows  — one TSQR combine node on [R; B] (the same stacked
                    (2n, n) QR the tree runs per level, ≙ tsqr.cu:
                    1121-1159) + one (m, n) GEMM.
  qr_append_cols  — one BlockQR panel step (projection, panel QR,
                    optional CGS2 second pass with the R fix-ups),
                    ≙ block_qr_core / block_qr_reorthogonalization_core
                    (blockqr.cu:45-178, 180-390) run for the new block.
  qr_delete_cols  — re-triangularize R[:, keep] by one (n, n-d) QR;
                    Q' = Q Q_s.
  qr_delete_rows  — closed-form Gram downdate: Q' = Q2 U^{-1},
                    R' = U R with U = chol(I - W^T W) — one (n, n)
                    Cholesky, no m-scale refactorization.
  qr_rank_update  — A + U V^T via orthogonalize-U-against-Q + one
                    bordered (n+k, n) QR.

All functions take the library's ComputeMode; m-scale GEMMs run the
mode's trailing math (the cuBLAS-analogue policy, modes.Policy
.trailing_mm) and the small cores run through the full library QR in
the same mode, so precision semantics compose exactly like BlockQR's.
Updates are differentiable end-to-end: the small cores are AD-wrapped
library entries (core/diff.py) and everything else is plain jnp.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr, cholqr

Array = jax.Array


def _small_qr(x: Array, policy: modes.Policy) -> tuple[Array, Array]:
    """Library QR for the small update cores ((n+p, n)-scale).

    BlockQR with the Householder-tree panel method: unconditional (the
    update cores inherit the caller's conditioning — e.g. [R; B] is as
    ill-conditioned as the updated matrix itself), and at these shapes
    the m-scale GEMMs outside dominate, so the robust path costs noise.
    """
    return blockqr.qr(x, policy)


def _check_thin(m: int, n: int, what: str) -> None:
    if n > m:
        # same contract as the factorizations (≙ blockqr.cu:407-409)
        raise ValueError(f"{what} would make the factorization wide: "
                         f"m={m} < n={n}")


def qr_append_rows(q: Array, r: Array, b: Array,
                   mode: modes.ComputeMode | str | modes.Policy = "fp32",
                   ) -> tuple[Array, Array]:
    """Update A = Q R to [A; B] = Q' R' for new rows B ((p, n)).

    One TSQR combine node: QR of the stacked [R; B] ((n+p, n)) gives
    R' and a small Q_s whose top block rotates the old Q — exactly the
    tree's per-level stacked-R reduction (≙ tsqr.cu:1121-1159), applied
    incrementally.  Cost: one small QR + one (m, n)x(n, n) GEMM;
    orthogonality of Q' adds ~eps_mode over Q's.

    This is the streaming/online QR primitive: a row block arriving
    later than the factorization costs one combine, not a refactorize.
    """
    policy = modes.resolve(mode)
    (m, n), (p, nb) = q.shape, b.shape
    if nb != n:
        raise ValueError(f"B has {nb} cols, factorization has {n}")
    q32 = q.astype(jnp.float32)
    s = jnp.concatenate([jnp.triu(r).astype(jnp.float32),
                         b.astype(jnp.float32)], axis=0)
    qs, r_new = _small_qr(s, _fp32(policy))
    mm = policy.trailing_mm
    q_new = jnp.concatenate([mm(q32, qs[:n]), qs[n:]], axis=0)
    return (q_new.astype(policy.io_dtype),
            jnp.triu(r_new).astype(policy.io_dtype))


def qr_append_cols(q: Array, r: Array, b: Array,
                   mode: modes.ComputeMode | str | modes.Policy = "fp32",
                   reorth: bool = False) -> tuple[Array, Array]:
    """Update A = Q R to [A, B] = Q' R' for new columns B ((m, p)).

    One BlockQR panel step for the new block: R12 = Q^T B, panel QR of
    the projected residual, and under ``reorth`` the CGS2 second
    projection with the R12 += S2 R2 / R22 = W R2 fix-ups — the same
    math block_qr_reorthogonalization_core runs per block
    (≙ blockqr.cu:180-390).
    """
    policy = modes.resolve(mode)
    (m, n), (mb, p) = q.shape, b.shape
    if mb != m:
        raise ValueError(f"B has {mb} rows, factorization has {m}")
    _check_thin(m, n + p, "appending these columns")
    mm = policy.trailing_mm
    q32, b32 = q.astype(jnp.float32), b.astype(jnp.float32)
    r12 = mm(q32.T, b32)
    b1 = b32 - mm(q32, r12)
    qb, r22 = _small_qr(b1, _fp32(policy))
    if reorth:
        s2 = mm(q32.T, qb)
        qb = qb - mm(q32, s2)
        qb, w = _small_qr(qb, _fp32(policy))
        r12 = r12 + mm(s2, r22)
        r22 = mm(w, r22)
    q_new = jnp.concatenate([q32, qb], axis=1)
    r_new = jnp.block([[jnp.triu(r).astype(jnp.float32), r12],
                       [jnp.zeros((p, n), jnp.float32), jnp.triu(r22)]])
    return (q_new.astype(policy.io_dtype),
            jnp.triu(r_new).astype(policy.io_dtype))


def qr_delete_cols(q: Array, r: Array, idx: int | Sequence[int],
                   mode: modes.ComputeMode | str | modes.Policy = "fp32",
                   ) -> tuple[Array, Array]:
    """Update A = Q R to A-without-columns-``idx`` = Q' R'.

    ``idx`` must be static (Python ints — shapes are compile-time on
    TPU).  R[:, keep] is upper-Hessenberg-ish; one small (n, n-d) QR
    re-triangularizes it and its Q_s rotates the old Q in one (m, n)
    GEMM.  The classical Givens restoration touches O(d n) rotations in
    sequence — scalar-dependent and TPU-hostile; the small-QR form costs
    the same flops and stays on the MXU.
    """
    policy = modes.resolve(mode)
    m, n = q.shape
    drop = {int(idx)} if isinstance(idx, int) else {int(i) for i in idx}
    bad = [i for i in drop if not 0 <= i < n]
    if bad:
        raise ValueError(f"column indices {bad} out of range for n={n}")
    keep = [j for j in range(n) if j not in drop]
    if not keep:
        raise ValueError("cannot delete every column")
    rk = jnp.triu(r).astype(jnp.float32)[:, jnp.asarray(keep)]
    qs, r_new = _small_qr(rk, _fp32(policy))
    mm = policy.trailing_mm
    q_new = mm(q.astype(jnp.float32), qs)
    return (q_new.astype(policy.io_dtype),
            jnp.triu(r_new).astype(policy.io_dtype))


def qr_delete_rows(q: Array, r: Array, p: int,
                   mode: modes.ComputeMode | str | modes.Policy = "fp32",
                   polish: bool = True) -> tuple[Array, Array]:
    """Update A = Q R to A[p:] = Q' R' (drop the FIRST p rows).

    Closed form, no m-scale refactorization: with W = Q[:p] the
    downdated Gram is A2^T A2 = R^T (I - W^T W) R, so U = chol_upper
    (I - W^T W) gives R' = U R (upper x upper stays upper) and
    Q' = Q[p:] U^{-1} — one (n, n) Cholesky + triangular inverse + one
    (m-p, n) GEMM.  To drop other rows, roll them to the front first
    (row permutation commutes with thin QR: P A = (P Q) R).

    Conditioning contract: the downdate is well-posed iff the kept rows
    still span — sigma_min(I - W^T W) measures how much of some
    direction survives.  When the dropped rows carry nearly all the
    mass (sigma_min ~ 0) the Cholesky NaNs out rather than fabricating
    an orthobasis — refactorize A[p:] directly in that regime.
    ``polish`` (default) runs one CholeskyQR pass on Q'
    (≙ cholqr2's second iteration) so orthogonality lands at
    ~eps * kappa(U)^2 instead of compounding into later updates.
    """
    policy = modes.resolve(mode)
    m, n = q.shape
    if not 0 <= p < m:
        raise ValueError(f"cannot drop {p} of {m} rows")
    _check_thin(m - p, n, f"dropping {p} rows")
    if p == 0:
        return q, r
    q32 = q.astype(jnp.float32)
    w = q32[:p]
    mm = policy.trailing_mm
    t = jnp.eye(n, dtype=jnp.float32) - jnp.matmul(
        w.T, w, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    u = cholqr._chol_r(t, shift=None)
    q_new = mm(q32[p:], cholqr._rinv(u))
    r_new = jnp.matmul(u, jnp.triu(r).astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    if polish:
        g = modes.gram(q_new, _fp32(policy))
        u2 = cholqr._chol_r(g, shift=None)
        q_new = mm(q_new, cholqr._rinv(u2))
        r_new = jnp.matmul(u2, r_new,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
    return (q_new.astype(policy.io_dtype),
            jnp.triu(r_new).astype(policy.io_dtype))


def qr_rank_update(q: Array, r: Array, u: Array, v: Array,
                   mode: modes.ComputeMode | str | modes.Policy = "fp32",
                   ) -> tuple[Array, Array]:
    """Update A = Q R to A + U V^T = Q' R' for U ((m, k)), V ((n, k)).

    Orthogonalize U against Q (one projection + one (m, k) panel QR —
    the CGS step of blockqr.cu:92-116 with U as the panel), then QR the
    bordered core [[R + C V^T], [R_u V^T]] ((n+k, n)) and rotate
    [Q, Q_u] by its Q_s in two (m, ·) GEMMs.  Downdates are
    ``qr_rank_update(q, r, -u, v)``.  kappa of the result governs
    accuracy exactly as for a fresh factorization of A + U V^T.
    """
    policy = modes.resolve(mode)
    (m, n), (mu, k) = q.shape, u.shape
    nv, kv = v.shape
    if mu != m or nv != n or kv != k:
        raise ValueError(f"U {u.shape} / V {v.shape} do not border "
                         f"a ({m}, {n}) factorization")
    mm = policy.trailing_mm
    q32 = q.astype(jnp.float32)
    u32, v32 = u.astype(jnp.float32), v.astype(jnp.float32)
    c = mm(q32.T, u32)
    u1 = u32 - mm(q32, c)
    qu, ru = _small_qr(u1, _fp32(policy))
    core = jnp.concatenate([jnp.triu(r).astype(jnp.float32) + mm(c, v32.T),
                            mm(ru, v32.T)], axis=0)
    qs, r_new = _small_qr(core, _fp32(policy))
    q_new = mm(q32, qs[:n]) + mm(qu, qs[n:])
    return (q_new.astype(policy.io_dtype),
            jnp.triu(r_new).astype(policy.io_dtype))


def _fp32(policy: modes.Policy) -> modes.Policy:
    """The caller's mode with fp32 IO — update internals stay fp32 and
    cast once at the boundary, same convention as blockqr.qr."""
    return modes.Policy(policy.mode, jnp.float32, policy.work_dtype,
                        policy.mm, policy.corrected)
