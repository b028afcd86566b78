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
          reorth: bool = False, mesh=None,
          ridge: float = 0.0, **qr_kw) -> Array:
    """Solve min ||A x - b|| (+ ridge * ||x||^2): A (m, n) tall, b (m,)
    or (m, k).

    ``ridge > 0`` solves the Tikhonov-regularized problem through the
    SAME m-scale factorization: with A = QR, the stacked system
    [A; sqrt(ridge) I] has R factor equal to the R of the SMALL (2n, n)
    stack [R; sqrt(ridge) I] — so regularization costs one extra tiny
    QR, never a second pass over A, and never forms the normal
    equations (the stacked-QR formulation keeps the conditioning of the
    regularized problem, not kappa(A)^2).

    ``mesh``: row-shard A and b over a `parallel.mesh` Mesh to run
    multi-chip — the factorization goes through distributed BlockQR
    (`dtsqr.dqr`) and Q^T b contracts over the sharded axis by itself
    (computation follows sharding); x comes back replicated."""
    if ridge < 0:
        raise ValueError(f"lstsq: ridge must be >= 0, got {ridge}")
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
    if ridge > 0:
        n = r.shape[0]
        stack = jnp.concatenate(
            [r, jnp.sqrt(jnp.float32(ridge)) * jnp.eye(n, dtype=jnp.float32)])
        q2, r2 = jnp.linalg.qr(stack, mode="reduced")
        # rhs of the stacked system: Q2^T [Q^T b; 0] = Q2[:n].T @ qtb
        x = jax.scipy.linalg.solve_triangular(
            r2, modes.mm_fp32(q2[:n].T, qtb), lower=False)
    else:
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


def lstsq_cgls(matvec, rmatvec, b: Array, n: int,
               key: Array | None = None,
               r_precond: Array | None = None,
               embed: float = 2.0, sketch_cols: int = 32,
               tol: float = 1e-7, max_iters: int = 100
               ) -> tuple[Array, dict]:
    """Matrix-free least squares: min ||A x - b|| where A exists only as
    ``matvec``/``rmatvec`` (the `block_lanczos` operator contract,
    extended with the transpose).

    Blendenpik/LSRN structure, TPU-first: CGLS (CG on the normal
    equations, never formed) right-preconditioned by the R factor of a
    SKETCH of the operator, so the iteration count is
    kappa-INDEPENDENT w.h.p. — kappa(A R_s^{-1}) = O(1) by the
    subspace-embedding argument (same step as `core.cholqr.rand_cholqr`,
    here reached through the transpose: B = (A^T G)^T with G an (m, l)
    on-the-fly Gaussian applied via ``rmatvec`` in ``sketch_cols``-wide
    column chunks, so peak extra memory is m*sketch_cols floats, never
    m*l).  Each iteration is ONE matvec + ONE rmatvec + two (n, k)
    triangular solves — for dense A that is ~2 HBM passes, and CGLS on
    the preconditioned system reaches the f32 gradient floor in tens of
    iterations at ANY finite kappa.

    When to use over ``lstsq``/QR: A is not materialized (PDE stencils,
    implicit Jacobians, kernel matrices), or only products are cheap.
    For a dense in-HBM A, the direct QR routes are faster.

    Args:
      matvec:  x (n, k) -> A @ x  (m, k).
      rmatvec: y (m, k) -> A^T @ y  (n, k).
      b: (m,) or (m, k) right-hand side(s).
      n: operator width.
      key: PRNG key for the preconditioner sketch; None (and no
        ``r_precond``) runs UNpreconditioned CGLS — iteration count
        then scales with kappa(A), only sensible for well-conditioned
        operators.
      r_precond: precomputed upper-triangular (n, n) preconditioner R
        (e.g. the R of a previous factorization of a nearby operator);
        overrides ``key``.
      embed: sketch height l = embed * n (the rand_cholqr embedding).
      sketch_cols: Gaussian block width per rmatvec call during setup.
      tol: stop when max-over-columns ||Ahat^T r|| / ||Ahat^T b|| < tol
        (the least-squares GRADIENT, the quantity CGLS controls; the
        residual itself includes b's component outside range(A)).  The
        f32 floor of this quantity is ~eps * kappa(A) — a tol below the
        floor is fine: the loop detects the floor and returns the best
        iterate (see below) instead of spinning to ``max_iters``.
      max_iters: iteration cap (while_loop bound; compiled once).

    Returns (x, info): x (n,) or (n, k); info = {"iters": int32,
    "grad_rel": (k,) BEST per-column relative gradient norms}.  Not
    wrapped in the QR AD rule (no Q/R outputs); differentiate via
    implicit differentiation of the normal equations if needed.

    Finite-precision safeguard: in f32 the triangular preconditioner
    solves break the exact matvec/rmatvec adjoint pairing by
    ~eps * kappa, and CG iterated PAST its gradient floor then
    amplifies rounding noise geometrically (measured ~7x/iteration on
    a kappa=1e4 system) — so the loop tracks the best-so-far iterate
    PER COLUMN and stops once every column sits far above its own
    floor (clear divergence), returning the best iterates.  This is
    the standard practical CGLS safeguard, and it is what makes a
    below-floor ``tol`` safe.
    """
    from jax import lax

    squeeze = b.ndim == 1
    bm = (b[:, None] if squeeze else b).astype(jnp.float32)
    m, k = bm.shape

    r_s = None
    if r_precond is not None:
        r_s = r_precond.astype(jnp.float32)
    elif key is not None:
        l = max(int(embed * n), n + 8)
        l = -(-l // 8) * 8
        # B^T = A^T G accumulated column-block-wise; only (m, c) of G
        # is ever live.  Setup cost: ceil(l/c) rmatvec calls, one-time.
        blocks = []
        for j in range(0, l, sketch_cols):
            c = min(sketch_cols, l - j)
            g = jax.random.normal(jax.random.fold_in(key, j),
                                  (m, c), jnp.float32)
            blocks.append(rmatvec(g).astype(jnp.float32))
        bt = jnp.concatenate(blocks, axis=1)        # (n, l)
        r_s = jnp.linalg.qr(bt.T, mode="r")
        r_s = r_s * jnp.where(jnp.diagonal(r_s) < 0, -1.0, 1.0)[:, None]

    if r_s is None:
        apply_n = apply_nt = lambda v: v
    else:
        apply_n = lambda v: jax.scipy.linalg.solve_triangular(
            r_s, v, lower=False)
        apply_nt = lambda v: jax.scipy.linalg.solve_triangular(
            r_s, v, lower=False, trans="T")

    def mv(y):                       # Ahat y = A N y
        return matvec(apply_n(y)).astype(jnp.float32)

    def rmv(u):                      # Ahat^T u = N^T A^T u
        return apply_nt(rmatvec(u).astype(jnp.float32))

    def csq(v):                      # per-column squared norms (k,)
        return jnp.sum(v * v, axis=0)

    s0 = rmv(bm)
    g0 = csq(s0)                     # ||Ahat^T b||^2 per column

    def cond(st):
        i, y, r, p, gamma, y_best, g_best = st
        rel_best = jnp.sqrt(jnp.max(g_best / jnp.maximum(g0, 1e-30)))
        # diverged: EVERY column sits >= 1e4x above its own best gamma
        # (i.e. ~100x in gradient norm) — past the f32 floor, no column
        # can improve; further steps only amplify noise
        diverged = jnp.all(gamma > 1e4 * jnp.maximum(g_best, 1e-30))
        return jnp.logical_and(
            i < max_iters,
            jnp.logical_and(rel_best > tol, jnp.logical_not(diverged)))

    def step(st):
        i, y, r, p, gamma, y_best, g_best = st
        q = mv(p)
        qq = csq(q)
        alpha = jnp.where(qq > 0, gamma / jnp.where(qq > 0, qq, 1.0), 0.0)
        y = y + alpha[None, :] * p
        r = r - alpha[None, :] * q
        s = rmv(r)
        gamma_new = csq(s)
        beta = jnp.where(gamma > 0,
                         gamma_new / jnp.where(gamma > 0, gamma, 1.0), 0.0)
        p = s + beta[None, :] * p
        improved = gamma_new < g_best
        y_best = jnp.where(improved[None, :], y, y_best)
        g_best = jnp.minimum(gamma_new, g_best)
        return i + 1, y, r, p, gamma_new, y_best, g_best

    i0 = jnp.zeros((), jnp.int32)
    y0 = jnp.zeros((n, k), jnp.float32)
    iters, y, r, p, gamma, y_best, g_best = lax.while_loop(
        cond, step, (i0, y0, bm, s0, g0, y0, g0))
    x = apply_n(y_best)
    info = {"iters": iters,
            "grad_rel": jnp.sqrt(g_best / jnp.maximum(g0, 1e-30))}
    return (x[:, 0] if squeeze else x), info
