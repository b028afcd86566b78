"""Spectral consumers of the QR stack: subspace iteration + Nystrom.

No reference analogue — the reference stops at QR (SURVEY.md §2).
These are the two standard production eigensolvers for LARGE symmetric
operators, and both are tall-skinny-QR consumers end to end:

  * :func:`subspace_iteration` — top-k eigenpairs of a symmetric
    operator by orthogonal (block power) iteration: every step is one
    operator apply + one library QR of the (n, k) block, closed by a
    Rayleigh-Ritz rotation.  The robust iterative choice when Lanczos'
    three-term recurrence would lose orthogonality (models/lanczos.py
    is the cheap-per-step alternative).
  * :func:`nystrom` — one-shot randomized Nystrom approximation of a
    PSD operator (Tropp et al. 2017 stabilized variant): a single
    sketch apply, a Cholesky whitening, and a thin SVD of the
    tall-skinny whitened sketch THROUGH the library QR (QR + small SVD,
    same structure as models/svd.py).  Fixed cost, matrix-free, the
    standard kernel/Hessian-spectrum workhorse.

Both take ``matvec: X (n, b) -> A @ X`` (the operator is never
materialized; same contract as models/lanczos.py) and ``mesh=`` for
multi-chip — the block row-shards over the mesh, orthogonalization
routes through the distributed ladder, and the small contractions
self-distribute (computation follows sharding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tsqr_tpu import modes

Array = jax.Array


def _orth(mesh, mode, qr_kw):
    if mesh is None:
        from tsqr_tpu.core.auto import qr_auto_fused

        return lambda y: qr_auto_fused(y, mode, **qr_kw)
    from tsqr_tpu.parallel import dtsqr

    return lambda y: dtsqr.dqr_auto(y, mesh, mode, **qr_kw)


def subspace_iteration(matvec, n: int, k: int, key: Array,
                       iters: int = 20,
                       mode: modes.ComputeMode | str = "fp32",
                       oversample: int = 4, mesh=None,
                       return_resid: bool = False, **qr_kw):
    """Top-k eigenpairs of a symmetric operator by orthogonal iteration.

    Args:
      matvec: X (n, b) -> A @ X for symmetric A (n, n).
      n: operator dimension; k: wanted eigenpairs; iters: iterations.
      oversample: extra basis columns (converge the tail, then crop).
    Returns ``(w, v)`` — eigenvalues (k,) descending by |w| and
    eigenvectors (n, k) — plus the per-pair residual norms
    ``||A v - w v||`` (k,) when ``return_resid``.

    Convergence: pair i converges linearly at rate
    |lambda_{b+1}/lambda_i| per iteration (b = k + oversample), so the
    oversampled tail columns buy rate for the wanted head.  Each
    iteration is ONE operator apply + one ladder QR — at b in the
    fused-kernel range the QR costs ~3 streamed passes of the (n, b)
    block, so the apply dominates for any real operator.

    The final Rayleigh-Ritz rotation (eigh of the (b, b) projection)
    makes the returned pairs optimal IN the converged subspace —
    individual Ritz pairs are accurate even when the raw power basis
    still mixes them.
    """
    b = min(k + oversample, n)
    orth = _orth(mesh, mode, qr_kw)

    v0 = jax.random.normal(key, (n, b), jnp.float32)
    if mesh is not None:
        from tsqr_tpu.parallel import mesh as mesh_mod

        v0 = jax.device_put(v0, mesh_mod.row_sharding(mesh))
    q = orth(v0)[0].astype(jnp.float32)
    for _ in range(iters):
        q = orth(matvec(q))[0].astype(jnp.float32)

    # Rayleigh-Ritz: T = Q^T A Q (symmetrized against apply noise)
    aq = matvec(q)
    t = modes.mm_fp32(q.T, aq)
    t = 0.5 * (t + t.T)
    w_all, s = jnp.linalg.eigh(t)                      # ascending
    order = jnp.argsort(-jnp.abs(w_all))[:k]
    w = w_all[order]
    v = modes.mm_fp32(q, s[:, order])
    if not return_resid:
        return w, v
    # ||A v - w v|| per pair, reusing the single extra apply
    av = modes.mm_fp32(aq, s[:, order])
    resid = jnp.linalg.norm(av - v * w[None, :], axis=0)
    return w, v, resid


def nystrom(matvec, n: int, rank: int, key: Array,
            mode: modes.ComputeMode | str = "fp32",
            oversample: int = 8, mesh=None,
            **qr_kw) -> tuple[Array, Array]:
    """Randomized Nystrom approximation of a PSD operator:
    A ≈ U diag(lam) U^T at the given rank, from ONE sketch apply.

    The numerically stable form (shifted, whitened): with orthonormal
    test matrix Omega (n, l), Y = A Omega, shift nu = eps * ||Y||:

        B = (Y + nu * Omega) chol(Omega^T Y + nu I)^{-T}
        B = U S W^T  (thin SVD)  =>  lam = max(S^2 - nu, 0)

    The thin SVD of the TALL (n, l) whitened sketch runs through the
    library QR (ladder QR + (l, l) SVD — models/svd.py structure), so
    the m-scale work is MXU-native end to end.  Requires PSD A (the
    Nystrom identity is specific to PSD); indefinite operators go
    through :func:`subspace_iteration`.

    Returns ``(u (n, rank), lam (rank,))`` with lam descending >= 0.
    Error (Tropp et al. 2017): E||A - A_hat||_* <~ (1 + k/(l-k-1)) x
    the best rank-k nuclear error, for any k < l - 1 — oversampling
    buys near-optimality in expectation.
    """
    l = min(rank + oversample, n)
    orth = _orth(mesh, mode, qr_kw)

    g = jax.random.normal(key, (n, l), jnp.float32)
    if mesh is not None:
        from tsqr_tpu.parallel import mesh as mesh_mod

        g = jax.device_put(g, mesh_mod.row_sharding(mesh))
    omega = orth(g)[0].astype(jnp.float32)             # orthonormal test
    y = matvec(omega).astype(jnp.float32)
    nu = jnp.finfo(jnp.float32).eps * jnp.linalg.norm(y)
    y = y + nu * omega
    c = modes.mm_fp32(omega.T, y)                      # Omega^T Y + nu I
    w = jnp.linalg.cholesky(0.5 * (c + c.T))
    b = jax.scipy.linalg.solve_triangular(w, y.T, lower=True).T
    # thin SVD of the tall (n, l) B through the library QR
    qb, rb = orth(b)[:2]
    us, s, _ = jnp.linalg.svd(rb.astype(jnp.float32), full_matrices=False)
    u = modes.mm_fp32(qb.astype(jnp.float32), us[:, :rank])
    lam = jnp.maximum(s[:rank] ** 2 - nu, 0.0)
    return u, lam
