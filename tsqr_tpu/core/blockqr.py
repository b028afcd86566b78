"""BlockQR: column-blocked QR for wide matrices, with optional CGS2 reorth.

Re-expresses the reference BlockQR driver (blockqr.cu:45-390) TPU-first:

* ``block_qr_core`` (blockqr.cu:45-178): per column block b —
  R12 = Q^T A_b (cuBLAS GEMM, 92-101), A' = A_b - Q R12 (107-116),
  TSQR(A') -> (Q_b, R22) (129-139).  Here the trailing GEMMs are plain
  policy matmuls (XLA's fused MXU GEMM is the cuBLAS analogue) and the
  n_block loop is Python-unrolled under jit: slices are static, the whole
  factorization is one XLA program with zero host round-trips (the
  reference syncs the stream between every phase, blockqr.cu:78-140).
* ``block_qr_reorthogonalization_core`` (blockqr.cu:180-390): CGS2 —
  second projection pass S2 = Q^T Q_b (272-281), Q_b -= Q S2 (282-291),
  second TSQR (297-307), and the R fix-ups R12 += S2 R2, R22 = W R2
  (313-332).
* The reference fixes the panel width at 16 (``tsqr_colmun_size``,
  blockqr.hpp:25).  The MXU prefers 128-wide panels, so ``panel_width``
  is a parameter defaulting to min(n, 128); 16 reproduces the reference
  blocking exactly.
* Input validation (n > m -> error, blockqr.cu:407-409) raises ValueError.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from tsqr_tpu import modes
from tsqr_tpu.core import tsqr as tsqr_mod

Array = jax.Array

DEFAULT_PANEL_WIDTH = 128
REFERENCE_PANEL_WIDTH = 16  # ≙ mtk::qr::tsqr_colmun_size, blockqr.hpp:25


@functools.partial(jax.jit, static_argnames=(
    "mode", "reorth", "panel_width", "leaf_rows", "fanin", "impl",
    "leaf_qr", "panel_method"))
def qr(a: Array,
       mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
       reorth: bool = False,
       panel_width: int | None = None,
       leaf_rows: int = tsqr_mod.DEFAULT_LEAF_ROWS,
       fanin: int = tsqr_mod.DEFAULT_FANIN,
       impl: str = "jnp",
       leaf_qr: Callable | None = None,
       panel_method: str = "tsqr") -> tuple[Array, Array]:
    """Thin QR of any (m, n) matrix with m >= n: returns (Q (m,n), R (n,n)).

    ≙ mtk::qr::qr<mode, Reorth> (blockqr.hpp:142-175).

    panel_method: "tsqr" (Householder tree, reference semantics) or one of
    the CholeskyQR methods "cholqr2"/"cholqr3"/"cholqr2_fused"/
    "cholqr3_fused" — the MXU-native production path (panels after the
    trailing-update projection are well-conditioned, so CholQR's kappa
    limits are rarely binding inside BlockQR).
    """
    policy = modes.resolve(mode)
    m, n = a.shape
    if n > m:
        # ≙ error_invalid_matrix_size (blockqr.cu:407-409)
        raise ValueError(f"BlockQR requires m >= n, got {a.shape}")
    a = a.astype(jnp.float32)
    mm = policy.mm
    nb = panel_width or min(n, DEFAULT_PANEL_WIDTH)
    nb = min(nb, n)

    fp32_policy = modes.Policy(policy.mode, jnp.float32, policy.work_dtype,
                               mm, policy.corrected)

    if panel_method == "tsqr":
        def _tsqr(x):
            return tsqr_mod.tsqr(x, fp32_policy, leaf_rows=leaf_rows,
                                 fanin=fanin, impl=impl, leaf_qr=leaf_qr)
    else:
        from tsqr_tpu.core import cholqr as cholqr_mod

        def _tsqr(x):
            return cholqr_mod._METHODS[panel_method](x, fp32_policy)

    if n <= nb:
        q, r = _tsqr(a)
        return q.astype(policy.io_dtype), r.astype(policy.io_dtype)

    n_blocks = -(-n // nb)
    q = jnp.zeros((m, n), jnp.float32)
    r = jnp.zeros((n, n), jnp.float32)

    for b in range(n_blocks):
        c0 = b * nb
        w = min(nb, n - c0)
        a_b = a[:, c0:c0 + w]
        if b == 0:
            # ≙ blockqr.cu:343-353 (first block: plain TSQR)
            q_b, r22 = _tsqr(a_b)
        else:
            q_prev = q[:, :c0]
            # R12 = Q^T A_b ; A' = A_b - Q R12 (blockqr.cu:92-116)
            r12 = mm(q_prev.T, a_b)
            a_p = a_b - mm(q_prev, r12)
            if not reorth:
                q_b, r22 = _tsqr(a_p)
            else:
                # CGS2 (blockqr.cu:230-332)
                q_b, r2 = _tsqr(a_p)
                s2 = mm(q_prev.T, q_b)
                q_b = q_b - mm(q_prev, s2)
                q_b, w_fac = _tsqr(q_b)
                r12 = r12 + mm(s2, r2)
                r22 = mm(w_fac, r2)
            r = lax.dynamic_update_slice(r, r12, (0, c0))
        q = lax.dynamic_update_slice(q, q_b.astype(jnp.float32), (0, c0))
        r = lax.dynamic_update_slice(r, r22.astype(jnp.float32), (c0, c0))

    r = jnp.triu(r)
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)
