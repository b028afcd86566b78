"""BlockQR: column-blocked QR for wide matrices, with optional CGS2 reorth.

Re-expresses the reference BlockQR driver (blockqr.cu:45-390) TPU-first:

* ``block_qr_core`` (blockqr.cu:45-178): per column block b —
  R12 = Q^T A_b (cuBLAS GEMM, 92-101), A' = A_b - Q R12 (107-116),
  TSQR(A') -> (Q_b, R22) (129-139).  Here the trailing GEMMs are plain
  policy matmuls (XLA's fused MXU GEMM is the cuBLAS analogue) and the
  whole factorization is one XLA program with zero host round-trips (the
  reference syncs the stream between every phase, blockqr.cu:78-140).
* ``block_qr_reorthogonalization_core`` (blockqr.cu:180-390): CGS2 —
  second projection pass S2 = Q^T Q_b (272-281), Q_b -= Q S2 (282-291),
  second TSQR (297-307), and the R fix-ups R12 += S2 R2, R22 = W R2
  (313-332).  For a single-panel input (n <= panel_width) the projection
  terms vanish and CGS2 degenerates to a second QR pass of Q_b — applied
  here too, so ``reorth=True`` is never a silent no-op (the reference,
  with its fixed width 16, always has multiple panels at n >= 32).
* The reference fixes the panel width at 16 (``tsqr_colmun_size``,
  blockqr.hpp:25).  The MXU prefers 128-wide panels, so ``panel_width``
  is a parameter defaulting to min(n, 128); 16 reproduces the reference
  blocking exactly.
* Input validation (n > m -> error, blockqr.cu:407-409) raises ValueError.

Panel-loop compilation strategy: the reference host-loops over n/16 blocks
(blockqr.cu:77).  Unrolling that loop under jit inlines a full TSQR tree
per panel — fine for a handful of panels, a compile-time wall at the
reference's n = 2^15 (256 panels).  Above ``UNROLL_MAX_BLOCKS`` panels the
loop therefore runs as a ``lax.fori_loop`` whose body is traced ONCE:
every panel has the same static width, the projection GEMMs use the full
(m, n) Q buffer (columns of not-yet-factored panels are zero, so
Q^T A_b is exact), and a ragged final panel is handled by one statically
traced epilogue.  The full-width projections spend 2x the reference's
projection flops (4mn^2 vs 2mn^2 total) in exchange for O(1) compile time
and full-width MXU GEMMs; the unrolled path (growing slices, reference
flop count) remains the default for few-panel problems.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from tsqr_tpu import modes
from tsqr_tpu.core import diff
from tsqr_tpu.core import tsqr as tsqr_mod

Array = jax.Array

DEFAULT_PANEL_WIDTH = 128
REFERENCE_PANEL_WIDTH = 16  # ≙ mtk::qr::tsqr_colmun_size, blockqr.hpp:25
UNROLL_MAX_BLOCKS = 8       # beyond this, the fori_loop path wins


def _panel_step(q: Array, r: Array, a_b: Array, c0, mm: Callable,
                tsqr_fn: Callable, reorth: bool,
                first: bool = False,
                reduce: Callable = lambda x: x) -> tuple[Array, Array]:
    """One BlockQR panel: project against Q, factor, write back at c0.

    Works for both loop strategies: ``q`` columns at >= c0 are zero, so
    the full-width projections equal the reference's growing-slice GEMMs
    (blockqr.cu:92-116); ``first=True`` skips the provably-zero ones.

    ``reduce`` wraps the two projection contractions (Q^T A_b, Q^T Q_b):
    identity locally; ``lax.psum`` over the row axis in the distributed
    BlockQR (parallel/dtsqr.py), where those contractions run over the
    sharded m dimension.
    """
    if first:
        r12 = None
        a_p = a_b
    else:
        # R12 = Q^T A_b ; A' = A_b - Q R12 (blockqr.cu:92-116)
        r12 = reduce(mm(q.T, a_b))
        a_p = a_b - mm(q, r12)
    if not reorth:
        q_b, r22 = tsqr_fn(a_p)
    elif first:
        # CGS2 on the leading panel degenerates to a second QR pass
        # (S2 = Q^T Q_b = 0): ≙ blockqr.cu:343-353 + the second tsqr16.
        q_b, r2 = tsqr_fn(a_p)
        q_b, w_fac = tsqr_fn(q_b)
        r22 = mm(w_fac, r2)
    else:
        # CGS2 (blockqr.cu:230-332)
        q_b, r2 = tsqr_fn(a_p)
        s2 = reduce(mm(q.T, q_b))
        q_b = q_b - mm(q, s2)
        q_b, w_fac = tsqr_fn(q_b)
        r12 = r12 + mm(s2, r2)
        r22 = mm(w_fac, r2)
    if r12 is not None:
        r = lax.dynamic_update_slice(r, r12.astype(r.dtype), (0, c0))
    q = lax.dynamic_update_slice(q, q_b.astype(q.dtype), (0, c0))
    r = lax.dynamic_update_slice(r, r22.astype(r.dtype), (c0, c0))
    return q, r


@diff.differentiable
@functools.partial(jax.jit, static_argnames=(
    "mode", "reorth", "panel_width", "leaf_rows", "fanin", "impl",
    "leaf_qr", "panel_method", "loop", "_ablate"))
def qr(a: Array,
       mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
       reorth: bool = False,
       panel_width: int | None = None,
       leaf_rows: int = tsqr_mod.DEFAULT_LEAF_ROWS,
       fanin: int = tsqr_mod.DEFAULT_FANIN,
       impl: str = "jnp",
       leaf_qr: Callable | None = None,
       panel_method: str = "tsqr",
       loop: str = "auto",
       _ablate: str | None = None) -> tuple[Array, Array]:
    """Thin QR of any (m, n) matrix with m >= n: returns (Q (m,n), R (n,n)).

    ≙ mtk::qr::qr<mode, Reorth> (blockqr.hpp:142-175).

    panel_method: "tsqr" (Householder tree, reference semantics) or one of
    the CholeskyQR methods "cholqr2"/"cholqr3"/"cholqr2_fused"/
    "cholqr3_fused" — the MXU-native production path (panels after the
    trailing-update projection are well-conditioned, so CholQR's kappa
    limits are rarely binding inside BlockQR).

    loop: "auto" | "unroll" | "fori" — panel-loop compilation strategy
    (see module docstring).  "auto" unrolls up to UNROLL_MAX_BLOCKS panels.

    _ablate: profiling hook (harness/profile.blockqr_breakdown), the TPU
    analogue of the reference's in-line PROFILE_BREAKDOWN instrumentation
    compiled into blockqr.cu (6-7, 70-174).  "no_panel" replaces each
    panel factorization with (A', I); "no_project" skips the trailing
    projections (every panel treated like panel 0).  Either yields a
    REAL fused program whose runtime differs from the full program by
    exactly the ablated phase, so the breakdown is measured by
    differencing actual XLA schedules, not by timing separately-jitted
    phase estimates.  Output is numerically meaningless under ablation.
    """
    if _ablate not in (None, "no_panel", "no_project"):
        raise ValueError(f"unknown _ablate {_ablate!r}")
    policy = modes.resolve(mode)
    m, n = a.shape
    if n > m:
        # ≙ error_invalid_matrix_size (blockqr.cu:407-409)
        raise ValueError(f"BlockQR requires m >= n, got {a.shape}")
    a = a.astype(jnp.float32)
    # Trailing/projection/fix-up GEMMs use the mode's *trailing* math —
    # plain fp32 for corrected modes, exactly the reference's cuBLAS
    # DEFAULT_MATH switch (blockqr.cu:61-68); the explicit split mm stays
    # the PANEL math (inside _tsqr), ≙ the tcqr kernels.
    mm = policy.trailing_mm
    nb = panel_width or min(n, DEFAULT_PANEL_WIDTH)
    nb = min(nb, n)

    fp32_policy = modes.Policy(policy.mode, jnp.float32, policy.work_dtype,
                               policy.mm, policy.corrected)

    if panel_method == "tsqr":
        def _tsqr(x):
            return tsqr_mod.tsqr(x, fp32_policy, leaf_rows=leaf_rows,
                                 fanin=fanin, impl=impl, leaf_qr=leaf_qr)
    else:
        from tsqr_tpu.core import cholqr as cholqr_mod

        def _tsqr(x):
            return cholqr_mod._METHODS[panel_method](x, fp32_policy)

    if _ablate == "no_panel":
        def _tsqr(x):  # noqa: F811 — profiling stand-in, see docstring
            return x, jnp.eye(x.shape[1], dtype=x.dtype)

    if n <= nb:
        q, r = _tsqr(a)
        if reorth:
            # single panel: CGS2's second pass (see module docstring)
            q, w_fac = _tsqr(q)
            r = mm(w_fac, r)
        return (q.astype(policy.io_dtype),
                jnp.triu(r).astype(policy.io_dtype))

    n_blocks = -(-n // nb)
    if loop == "auto":
        loop = "unroll" if n_blocks <= UNROLL_MAX_BLOCKS else "fori"

    q = jnp.zeros((m, n), jnp.float32)
    r = jnp.zeros((n, n), jnp.float32)

    if loop == "unroll":
        # growing-slice projections: reference flop count, one inlined
        # TSQR tree per panel (compile cost ~ linear in n_blocks)
        for b in range(n_blocks):
            c0 = b * nb
            w = min(nb, n - c0)
            a_b = a[:, c0:c0 + w]
            if b == 0 or _ablate == "no_project":
                q_b, r22 = _tsqr(a_b)
                if reorth:
                    q_b, w_fac = _tsqr(q_b)
                    r22 = mm(w_fac, r22)
            else:
                q_prev = q[:, :c0]
                r12 = mm(q_prev.T, a_b)
                a_p = a_b - mm(q_prev, r12)
                if not reorth:
                    q_b, r22 = _tsqr(a_p)
                else:
                    q_b, r2 = _tsqr(a_p)
                    s2 = mm(q_prev.T, q_b)
                    q_b = q_b - mm(q_prev, s2)
                    q_b, w_fac = _tsqr(q_b)
                    r12 = r12 + mm(s2, r2)
                    r22 = mm(w_fac, r2)
                r = lax.dynamic_update_slice(r, r12, (0, c0))
            q = lax.dynamic_update_slice(q, q_b.astype(jnp.float32), (0, c0))
            r = lax.dynamic_update_slice(r, r22.astype(jnp.float32),
                                         (c0, c0))
    elif loop == "fori":
        n_full = n // nb           # count of full-width panels
        w_tail = n - n_full * nb   # ragged final panel (0 if none)

        def body(b, carry):
            qc, rc = carry
            c0 = b * nb
            a_b = lax.dynamic_slice(a, (0, c0), (m, nb))
            return _panel_step(qc, rc, a_b, c0, mm, _tsqr, reorth,
                               first=(_ablate == "no_project"))

        # panel 0 traced statically (skips the zero projections), the
        # rest share ONE traced body
        q, r = _panel_step(q, r, a[:, :nb], 0, mm, _tsqr, reorth,
                           first=True)
        q, r = lax.fori_loop(1, n_full, body, (q, r))
        if w_tail:
            q, r = _panel_step(q, r, a[:, n_full * nb:], n_full * nb,
                               mm, _tsqr, reorth,
                               first=(_ablate == "no_project"))
    else:
        raise ValueError(f"unknown loop strategy {loop!r}")

    r = jnp.triu(r)
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)
