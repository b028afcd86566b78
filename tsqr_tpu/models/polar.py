"""Polar decomposition A = U H via QDWH, built on the ladder QR.

No reference analogue — the reference stops at QR (SURVEY.md §2); this
is the standard next factorization a production linear-algebra stack
owes its users: the nearest-orthogonal-matrix problem (Procrustes,
orthogonality-constrained optimization, matrix sign/sqrt), solved by
the QR-based dynamically weighted Halley iteration (QDWH, Nakatsukasa &
Higham 2013) — backward stable, cubically convergent (<= ~6 iterations
for any kappa resolvable in f32).

TPU-first structure (m >> n reduction):

  1. m-scale   A = Q1 R through the library QR (the predictive ladder
     by default, or any ``fastqr`` method / the distributed ladder
     under ``mesh=``) — ALL m-scale flops ride the MXU fast path.
  2. n-scale   QDWH on the (n, n) R factor: R = U_r H.  Each iteration
     is one small stacked QR (2n, n) or one Cholesky + two triangular
     solves, chosen per step by the weight magnitude (`lax.cond`);
     weights update from a scalar lower-bound recurrence, all inside
     one `lax.while_loop` — no host round trips.
  3. m-scale   U = Q1 U_r — one GEMM.  H is shared: A = (Q1 U_r) H.

The n-scale iterations run in full f32 precision (modes.mm_fp32;
never the bf16-grade default matmul); overall accuracy therefore
inherits the selected QR mode's grade, exactly like models/svd.py.

Requires full column rank (the polar U of a rank-deficient A is not
unique; route through models.qrcp.pivoted_qr to detect/truncate rank
first).  Singular inputs do not crash: the sigma=0 directions are
fixed points of the QDWH map, so U comes back a partial isometry and
``U^T U = I`` fails measurably — same observable contract as a failed
Cholesky tier, caught by the caller's validation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tsqr_tpu import modes

Array = jax.Array

# Switch each QDWH step to the Cholesky form once the Halley weight c
# is modest: Z = I + c X^T X then has kappa(Z) <~ 1 + c, comfortably
# Cholesky-safe at <= ~100 (Nakatsukasa & Higham's crossover), and the
# two (n, n) triangular solves are cheaper than the stacked (2n, n) QR.
_CHOL_SWITCH = 100.0


def _qdwh_weights(l: Array) -> tuple[Array, Array, Array, Array]:
    """Dynamically weighted Halley coefficients (a, b, c) for the
    current sigma-min lower bound l, plus the updated bound.

    The map x -> x (a + b x^2) / (1 + c x^2) sends [l, 1] into
    [l', 1] with l' -> 1 cubically; the coefficients are the unique
    choice making the map optimal (a rational best approximation to
    sign(x) on [l, 1])."""
    l2 = l * l
    dd = jnp.cbrt(4.0 * (1.0 - l2) / (l2 * l2))
    sqd = jnp.sqrt(1.0 + dd)
    a = sqd + 0.5 * jnp.sqrt(
        jnp.maximum(8.0 - 4.0 * dd + 8.0 * (2.0 - l2) / (l2 * sqd), 0.0))
    b = (a - 1.0) ** 2 / 4.0
    c = a + b - 1.0
    l_new = l * (a + b * l2) / (1.0 + c * l2)
    return a, b, c, l_new


def _qdwh_square(x: Array, l0: Array, max_iter: int) -> Array:
    """QDWH orthogonal factor of a square (n, n) X with sigma_max <= 1
    and sigma_min >= l0 (a lower-bound estimate; an overestimate only
    slows convergence — every sigma in (0, 1] still increases
    monotonically under the map).  Runs entirely on-device in one
    while_loop; each step picks QR or Cholesky form by weight size."""
    n = x.shape[0]
    eye = jnp.eye(n, dtype=jnp.float32)

    def qr_step(x, a, b, c):
        # [sqrt(c) X; I] = [Q1; Q2] R  =>  X' = (b/c) X
        #                 + (a - b/c)/sqrt(c) * Q1 Q2^T
        sc = jnp.sqrt(c)
        stacked = jnp.concatenate([sc * x, eye], axis=0)
        q, _ = jnp.linalg.qr(stacked)           # (2n, n) reduced
        return (b / c) * x + ((a - b / c) / sc) * modes.mm_fp32(
            q[:n], q[n:].T)

    def chol_step(x, a, b, c):
        # X' = (b/c) X + (a - b/c) X Z^{-1},  Z = I + c X^T X = W W^T
        g = modes.mm_fp32(x.T, x)
        z = eye + c * 0.5 * (g + g.T)
        w = jnp.linalg.cholesky(z)
        t = jax.scipy.linalg.solve_triangular(w, x.T, lower=True)
        t = jax.scipy.linalg.solve_triangular(w.T, t, lower=False)
        return (b / c) * x + (a - b / c) * t.T

    def body(st):
        x, l, k = st
        a, b, c, l_new = _qdwh_weights(l)
        x_new = lax.cond(c > _CHOL_SWITCH,
                         lambda: qr_step(x, a, b, c),
                         lambda: chol_step(x, a, b, c))
        return x_new, l_new, k + 1

    def cond(st):
        _, l, k = st
        # l -> 1 cubically; once 1 - l is below a few eps the iterate
        # is orthogonal to working precision.
        return jnp.logical_and(k < max_iter,
                               jnp.abs(1.0 - l) > 5e-7)

    x, _, _ = lax.while_loop(cond, body,
                             (x, l0.astype(jnp.float32),
                              jnp.zeros((), jnp.int32)))
    # One Newton-Schulz polish: with ||X^T X - I|| << 1 post-QDWH this
    # quadratically pushes orthogonality to the f32 floor.
    g = modes.mm_fp32(x.T, x)
    return 1.5 * x - 0.5 * modes.mm_fp32(x, 0.5 * (g + g.T))


def _sigma_bounds(r: Array) -> tuple[Array, Array]:
    """(alpha, l0): alpha >= sigma_max(R) via the Frobenius norm and
    l0 <= sigma_min(R/alpha) via 1/||X^{-1}||_F, using that R is
    triangular so the inverse is two cheap (n, n) solves away."""
    r32 = r.astype(jnp.float32)
    alpha = jnp.maximum(jnp.linalg.norm(r32),
                        jnp.finfo(jnp.float32).tiny)
    x = r32 / alpha
    eye = jnp.eye(r.shape[0], dtype=jnp.float32)
    xinv = jax.scipy.linalg.solve_triangular(x, eye, lower=False)
    inv_norm = jnp.linalg.norm(xinv)
    l0 = jnp.where(jnp.isfinite(inv_norm), 1.0 / inv_norm, 0.0)
    # Clamp: a zero/overflowed estimate (singular R) must not NaN the
    # weight formulas; 1e-8 is below anything f32 can resolve anyway.
    return alpha, jnp.clip(l0, 1e-8, 0.99)


def polar(a: Array,
          mode: modes.ComputeMode | str = "fp32",
          method: str = "auto", mesh=None,
          max_iter: int = 16, **qr_kw) -> tuple[Array, Array]:
    """Polar decomposition of a tall (m, n), m >= n: returns
    (U (m, n), H (n, n)) with A = U H, U^T U = I, H symmetric PSD —
    U is the nearest matrix with orthonormal columns to A.

    ``method``: "auto" routes the m-scale QR through the predictive
    ladder (`qr_auto_fused` — no kappa caveat); any other string is a
    ``fastqr`` method (e.g. "cholqr3").  ``mesh``: row-shard A over a
    `parallel.mesh` Mesh — the QR runs the distributed ladder and the
    (n, n) QDWH + the U = Q1 U_r update stay local per shard."""
    m, n = a.shape
    if m < n:
        raise ValueError(f"polar requires m >= n, got {a.shape}")
    if mesh is not None:
        from tsqr_tpu.parallel import dtsqr
        q1, r = dtsqr.dqr_auto(a, mesh, mode, **qr_kw)
    elif method == "auto":
        from tsqr_tpu.core.auto import qr_auto_fused
        q1, r = qr_auto_fused(a, mode, **qr_kw)
    else:
        from tsqr_tpu.core import cholqr
        q1, r = cholqr.fastqr(a, mode, method=method, **qr_kw)
    alpha, l0 = _sigma_bounds(r)
    ur = _qdwh_square(r.astype(jnp.float32) / alpha, l0, max_iter)
    # R = U_r H  =>  H = U_r^T R (symmetrized against iteration noise);
    # A = Q1 R = (Q1 U_r) H shares the same H.
    h = modes.mm_fp32(ur.T, r.astype(jnp.float32))
    h = 0.5 * (h + h.T)
    u = modes.mm_fp32(q1.astype(jnp.float32), ur)
    return u, h


def procrustes(a: Array, b: Array) -> Array:
    """Orthogonal Procrustes: the (n, n) orthogonal Omega minimizing
    ||A Omega - B||_F, i.e. the polar orthogonal factor of A^T B.

    The m-scale work is the single Gram-shaped contraction A^T B
    (always full f32 precision — it carries the rotation signal); the
    QDWH runs on the small (n, n) product.  With row-sharded A, B on a
    mesh the contraction self-distributes (computation follows
    sharding).

    Requires A^T B numerically full rank — same contract as
    :func:`polar`: kappa(A^T B) ~ kappa(A) * kappa(B), so near-singular
    inputs leave the rotation unidentifiable in the noise subspace and
    Omega comes back a partial isometry there (the OBJECTIVE is still
    minimized to working precision; detect via ||Omega^T Omega - I||)."""
    if a.shape != b.shape:
        raise ValueError(f"procrustes needs matching shapes, got "
                         f"{a.shape} vs {b.shape}")
    mtx = modes.mm_fp32(a.T, b)
    alpha, l0 = _sigma_bounds_dense(mtx)
    return _qdwh_square(mtx / alpha, l0, 16)


def _sigma_bounds_dense(mtx: Array) -> tuple[Array, Array]:
    """(alpha, l0) for a dense square matrix: triangularize first (one
    small QR) so the triangular-inverse bound of `_sigma_bounds`
    applies; sigma(R) = sigma(M)."""
    _, r = jnp.linalg.qr(mtx.astype(jnp.float32))
    return _sigma_bounds(r)
