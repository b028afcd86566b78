"""Householder panel QR in pure JAX — the golden model and jnp compute path.

Re-expresses the reference panel kernel ``qr32x16_core``
(tcqr32x16.cu:1373-1469: per column — extract u, ||u|| via warp reduction,
u[k] += sign*||u||, build H = I - 2uu^T/||u||^2, apply H to [Q|R] on Tensor
Cores) as a masked ``lax.fori_loop`` over columns with batched rank-1 /
block updates routed through a precision :class:`~tsqr_tpu.modes.Policy`.

Unlike the CUDA version, which is fixed to <=32x16 tiles in shared memory,
this path handles any static (m, n) with m >= n; the TSQR driver chooses a
TPU-friendly leaf size (multiples of 8x128 tiles) instead of 32x16.

Two update strategies are provided:

* ``householder_qr``: textbook one-reflector-at-a-time (rank-1 updates), the
  numerical golden (≙ the reference's generic non-TC path,
  tcqr32x16.cu:117-137 make_h + 464-496 update_qr).
* ``blocked_householder_qr``: compact-WY blocked form — reflectors are
  accumulated into (Y, T) per column block and applied to the trailing
  matrix and to Q with large GEMMs, which is what the MXU wants (the
  reference instead forms the dense H per reflector and multiplies on WMMA;
  WY is the TPU-idiomatic equivalent, cf. PAPERS.md mixed-precision block
  Householder analysis).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from tsqr_tpu import modes

Array = jax.Array


def _house_vector(x: Array, j: Array, eps: float) -> tuple[Array, Array, Array]:
    """Householder vector for column x, zeroing entries below position j.

    Returns (v, beta, alpha) with H = I - beta*v*v^T, H x = alpha e_j.
    Entries of x above j must already be masked to zero by the caller.
    Sign convention matches the reference (tcqr32x16.cu:1421-1423):
    v = x + sign(x_j)*||x|| e_j, so R_jj = -sign(x_j)*||x||.
    """
    norm2 = jnp.sum(x * x)
    norm = jnp.sqrt(norm2)
    xj = x[j]
    sign = jnp.where(xj >= 0, 1.0, -1.0).astype(x.dtype)
    alpha = -sign * norm
    v = x.at[j].add(sign * norm)
    # ||v||^2 = ||x||^2 + 2*sign*||x||*x_j + ||x||^2
    vnorm2 = norm2 + 2.0 * sign * norm * xj + norm2
    beta = jnp.where(vnorm2 > eps, 2.0 / vnorm2, jnp.zeros_like(vnorm2))
    return v, beta, alpha


def householder_qr(a: Array,
                   mm: Callable[[Array, Array], Array] | None = None,
                   ) -> tuple[Array, Array]:
    """Thin QR of a single (m, n) panel, m >= n: returns (Q (m,n), R (n,n)).

    ``mm`` routes the reflector-application products (v^T A and the outer
    products) through a mode's matmul; None = exact fp32 golden.
    """
    m, n = a.shape
    assert m >= n, f"panel must be tall: got {a.shape}"
    dtype = jnp.float32
    a = a.astype(dtype)
    if mm is None:
        mm = modes.mm_fp32
    eps = 1e-30

    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]

    def body(j, carry):
        r, vs, betas = carry
        x = jnp.where(rows >= j, r[:, j], 0.0)
        v, beta, _ = _house_vector(x, j, eps)
        # w = beta * v^T R  (1 x n); rank-1 update R -= v w
        w = beta * mm(v[None, :], r)[0]
        r = r - v[:, None] * w[None, :]
        vs = vs.at[j].set(v)
        betas = betas.at[j].set(beta)
        return r, vs, betas

    r0 = a
    vs0 = jnp.zeros((n, m), dtype)
    betas0 = jnp.zeros((n,), dtype)
    r, vs, betas = lax.fori_loop(0, n, body, (r0, vs0, betas0))

    # Q = H_0 H_1 ... H_{n-1} I_{m x n}, applied in reverse order.
    q0 = jnp.eye(m, n, dtype=dtype)

    def back(i, q):
        j = n - 1 - i
        v = vs[j]
        w = betas[j] * mm(v[None, :], q)[0]
        return q - v[:, None] * w[None, :]

    q = lax.fori_loop(0, n, back, q0)
    r = jnp.triu(r[:n, :])
    return q, r


def _panel_reflectors(a: Array, nb: int, col0: int, rows: Array, eps: float,
                      mm: Callable) -> tuple[Array, Array, Array]:
    """Factor columns [col0, col0+nb) of panel ``a`` (already updated),
    returning (Y (m, nb), T (nb, nb) upper-tri compact-WY, Rblk (nb, nb)).

    Within the narrow block, updates are rank-1 (VPU work ~ m*nb^2, small);
    everything wider is applied by the caller with GEMMs.  The column loop
    uses lax.fori_loop: a statically-unrolled variant was measured at the
    same TPU runtime (247 vs 254 ms at m=2^20, n=128) but ~2x the compile
    time, so the rolled form wins.
    """
    m = a.shape[0]
    dtype = a.dtype

    def body(k, carry):
        ablk, ys, ts, betas = carry
        j = col0 + k
        x = jnp.where(rows >= j, ablk[:, k], 0.0)
        v, beta, _ = _house_vector(x, j, eps)
        w = beta * mm(v[None, :], ablk)[0]
        ablk = ablk - v[:, None] * w[None, :]
        # T update (compact WY, Schreiber-Van Loan):
        # T_k = [[T, -beta * T (Y^T v)], [0, beta]]
        ytv = mm(ys, v[:, None])[:, 0]            # (nb,)
        tcol = -beta * mm(ts, ytv[:, None])[:, 0]  # (nb,)
        kmask = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0] < k
        ts = ts.at[:, k].set(jnp.where(kmask, tcol, 0.0))
        ts = ts.at[k, k].set(beta)
        ys = ys.at[k].set(v)
        betas = betas.at[k].set(beta)
        return ablk, ys, ts, betas

    ablk0 = a[:, col0:col0 + nb]
    ys0 = jnp.zeros((nb, m), dtype)
    ts0 = jnp.zeros((nb, nb), dtype)
    betas0 = jnp.zeros((nb,), dtype)
    ablk, ys, ts, _ = lax.fori_loop(0, nb, body, (ablk0, ys0, ts0, betas0))
    return ys.T, ts, ablk


def blocked_householder_qr(a: Array,
                           mm: Callable[[Array, Array], Array] | None = None,
                           block: int = 8) -> tuple[Array, Array]:
    """Compact-WY blocked Householder QR of one (m, n) panel.

    Trailing updates A -= Y (T^T (Y^T A)) and the Q build
    Q = I - Y T Y^T (thin) are GEMMs -> MXU; only the intra-block rank-1
    loop runs on the VPU.
    """
    m, n = a.shape
    assert m >= n
    a = a.astype(jnp.float32)
    if mm is None:
        mm = modes.mm_fp32
    eps = 1e-30
    block = min(block, n)
    nblocks = -(-n // block)
    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]

    # Accumulate global Y (m, n) and block Ts; n is static so unroll.
    y_all = jnp.zeros((m, n), jnp.float32)
    t_all = jnp.zeros((nblocks, block, block), jnp.float32)
    r = a
    for bi in range(nblocks):
        col0 = bi * block
        nb = min(block, n - col0)
        yb, tb, rblk = _panel_reflectors(r, nb, col0, rows, eps, mm)
        r = lax.dynamic_update_slice(r, rblk, (0, col0))
        # trailing update: A2 -= Y T^T Y^T A2
        ntrail = n - col0 - nb
        if ntrail > 0:
            a2 = lax.dynamic_slice(r, (0, col0 + nb), (m, ntrail))
            w = mm(tb.T, mm(yb.T, a2))
            a2 = a2 - mm(yb, w)
            r = lax.dynamic_update_slice(r, a2, (0, col0 + nb))
        y_all = lax.dynamic_update_slice(y_all, yb, (0, col0))
        if nb < block:
            tb = jnp.pad(tb, ((0, block - nb), (0, block - nb)))
        t_all = t_all.at[bi].set(tb)

    # Q = (I - Y_0 T_0 Y_0^T) ... (I - Y_last T_last Y_last^T) I_{m x n}
    q = jnp.eye(m, n, dtype=jnp.float32)
    for bi in reversed(range(nblocks)):
        col0 = bi * block
        nb = min(block, n - col0)
        yb = lax.dynamic_slice(y_all, (0, col0), (m, nb))
        tb = t_all[bi][:nb, :nb]
        w = mm(tb, mm(yb.T, q))
        q = q - mm(yb, w)

    r = jnp.triu(r[:n, :])
    return q, r


def qr_sign_normalize(q: Array, r: Array) -> tuple[Array, Array]:
    """Flip signs so diag(R) >= 0 (canonical form for cross-mode compare,
    ≙ the sign-insensitive comparison in test_compare.hpp:143-265)."""
    s = jnp.where(jnp.diag(r) < 0, -1.0, 1.0).astype(r.dtype)
    return q * s[None, :], r * s[:, None]
