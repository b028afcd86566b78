"""Canonical correlation analysis via tall-skinny QR (Björck–Golub).

The numerically sound CCA algorithm: orthonormalize X and Y
independently — the m-scale work, exactly the tall-skinny shape this
library exists for — then take the thin SVD of the SMALL (p, q)
cross-product Qx^T Qy.  Its singular values are the canonical
correlations; the weights come back through the triangular R factors.
Working from Qx^T Qy instead of the covariance-whitening normal
equations avoids squaring kappa(X), the classical failure of
Hotelling-style CCA — so the result's accuracy degrades directly with
the library's own ||Q^T Q - I||, which is what makes CCA a natural
end-to-end consumer of corrected-mode orthogonalization quality.

Tall-skinny CCA is one of the communication-avoiding workloads the TSQR
literature was built around; the CUDA reference stops at the QR API
(mtk::qr::qr, reference blockqr.hpp:142-175) with no consumer
layer — this module is part of the model zoo the TPU build adds on top.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import tsqr as tsqr_mod

Array = jax.Array


def cca(x: Array, y: Array, rank: int | None = None,
        mode: modes.ComputeMode | str = "fp32", center: bool = False,
        mesh=None, method: str = "tsqr", **qr_kw) -> tuple[Array, Array, Array]:
    """Canonical correlations of two tall design matrices.

    Args:
      x: (m, p) observations-by-features, m >= p.
      y: (m, q) second view, same m, m >= q.
      rank: number of canonical pairs r (default min(p, q)).
      mode: precision policy for the two m-scale orthogonalizations
        (the small SVD/solves run fp32).
      center: subtract the column means first (statistical CCA);
        default False keeps the kernel linear-algebra pure.
      mesh: pass a `parallel.mesh` Mesh with `x`/`y` row-sharded to run
        multi-chip: the QRs route through the distributed
        self-validating ladder and the (p, q) cross product is a
        psum-contraction GSPMD inserts from the row sharding — no
        explicit collectives here (computation follows sharding).

    Returns:
      (corrs, wx, wy): correlations (r,) in [0, 1] descending, and
      weights (p, r), (q, r).  The canonical variates U = X @ wx and
      V = Y @ wy have unit-norm columns with U^T V = diag(corrs)
      (after centering, if requested).

    Rank-deficiency contract: the correlations are always finite (the
    SVD of Qx^T Qy is clipped to [0, 1]), but the weights back-solve
    through R and inherit its conditioning — for numerically
    rank-deficient views, reduce them first (e.g. `models.qrcp` /
    `models.rsvd`) rather than reading exploded weights.
    """
    m, p = x.shape
    m2, q = y.shape
    if m2 != m:
        raise ValueError(f"x and y must share the observation axis: "
                         f"{m} vs {m2}")
    r = min(p, q) if rank is None else min(rank, p, q)
    if center:
        x = x - jnp.mean(x, axis=0, keepdims=True)
        y = y - jnp.mean(y, axis=0, keepdims=True)

    if mesh is None:
        if method == "tsqr":
            qx, rx = tsqr_mod.tsqr(x, mode, **qr_kw)
            qy, ry = tsqr_mod.tsqr(y, mode, **qr_kw)
        elif method == "auto":
            from tsqr_tpu.core import auto
            qx, rx = auto.qr_auto_fused(x, mode, **qr_kw)
            qy, ry = auto.qr_auto_fused(y, mode, **qr_kw)
        else:
            # compact pure-GEMM program: a CCA with BOTH views through
            # the inline Householder tree serializes two distinct tree
            # programs into one HLO, which can exceed a remote-compile
            # transport's request-size cap; cholqr2/cholqr3 keep the
            # whole CCA a handful of GEMMs (same m-scale cost on
            # well-conditioned views)
            from tsqr_tpu.core import cholqr
            qx, rx = cholqr.fastqr(x, mode, method=method, **qr_kw)
            qy, ry = cholqr.fastqr(y, mode, method=method, **qr_kw)
    else:
        from tsqr_tpu.parallel import dtsqr
        qx, rx = dtsqr.dqr_auto(x, mesh, mode, **qr_kw)
        qy, ry = dtsqr.dqr_auto(y, mesh, mode, **qr_kw)

    c = modes.mm_fp32(qx.astype(jnp.float32).T, qy.astype(jnp.float32))
    u, s, vt = jnp.linalg.svd(c, full_matrices=False)   # (p,k),(k,),(k,q)
    corrs = jnp.clip(s[:r], 0.0, 1.0)
    wx = jax.scipy.linalg.solve_triangular(
        rx.astype(jnp.float32), u[:, :r], lower=False)
    wy = jax.scipy.linalg.solve_triangular(
        ry.astype(jnp.float32), vt[:r].T, lower=False)
    return corrs, wx, wy
