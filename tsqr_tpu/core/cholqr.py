"""CholeskyQR2 / shifted CholeskyQR3: the MXU-native tall-skinny QR.

No direct reference analogue — the reference's answer to "make QR run on
matrix units" is Householder reflectors applied through WMMA tiles
(tcqr32x16.cu); on TPU the same question has a better-conditioned answer:
CholeskyQR-type methods whose entire flop volume is GEMMs (G = A^T A,
Q = A R^{-1}), which XLA maps straight onto the MXU with no per-column
dependences at all.  This module provides them as the fast path; the
Householder TSQR tree (core/tsqr.py) remains the robustness path and the
reference-parity semantics.

Numerics (Yamamoto/Fukaya et al.):
  * CholeskyQR2: orthogonality ~ eps once kappa(A)^2 * eps << 1, i.e.
    kappa <~ 1/sqrt(eps).  In fp32 (eps~6e-8): kappa <~ 4e3.
  * shifted CholeskyQR3: a shift s ~ 11(mn + n(n+1)) eps ||G||_2 makes the
    first Cholesky succeed for kappa up to ~1/sqrt(eps)*... then two more
    CholeskyQR passes polish to eps-level orthogonality; handles
    kappa <~ 1e7 in fp32.
  * The split-corrected modes apply naturally: G is computed with the
    policy matmul, so bf16x6_cor produces an fp32-grade Gram matrix from
    bf16 MXU passes — the same correction idea as the reference's
    fp32_tc_cor (tcqr32x16.cu:669-819), applied to a Gram product.

Distribution: across chips G is simply psum(A_loc^T A_loc) — the Gram
reduction plays the role of the reference's R-tree with one allreduce of an
(n, n) tile; see parallel/dtsqr.py.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from tsqr_tpu import modes

Array = jax.Array


def _chol_r(g: Array, shift: float | Array = 0.0) -> Array:
    """Upper-triangular R with G (+ shift*I) = R^T R."""
    n = g.shape[-1]
    g = (g + g.T) * 0.5
    if shift is not None:
        g = g + shift * jnp.eye(n, dtype=g.dtype)
    l = jnp.linalg.cholesky(g)
    return l.T


def _q_pass(a: Array, r: Array, mm: Callable) -> Array:
    """Q = A R^{-1} as a GEMM with the explicit (n, n) inverse.

    n <= a few hundred, so inverting R costs O(n^3) ~ nothing, and the
    m-scale work stays a pure MXU GEMM instead of a triangular solve
    (which XLA would serialize into n small steps over the m axis).
    """
    n = r.shape[-1]
    rinv = jax.scipy.linalg.solve_triangular(
        r, jnp.eye(n, dtype=r.dtype), lower=False)
    return mm(a, rinv)


def cholqr2(a: Array,
            mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
            ) -> tuple[Array, Array]:
    """CholeskyQR2 thin QR: (m, n) -> (Q (m, n), R (n, n)).

    Fast path for kappa(A) <~ 1/sqrt(eps_f32) ~ 4e3; use cholqr3 or the
    Householder tsqr for worse conditioning.
    """
    policy = modes.resolve(mode)
    mm = policy.mm
    a = a.astype(jnp.float32)
    g = modes.gram(a, policy)
    r1 = _chol_r(g)
    q1 = _q_pass(a, r1, mm)
    g2 = modes.gram(q1, policy)
    r2 = _chol_r(g2)
    q = _q_pass(q1, r2, mm)
    r = jnp.triu(modes.mm_fp32(r2, r1))
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)


def cholqr3(a: Array,
            mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
            ) -> tuple[Array, Array]:
    """Shifted CholeskyQR3: robust to kappa(A) ~ 1e7 in fp32.

    Pass 1 uses a Frobenius-based shift so the Cholesky cannot break down;
    passes 2-3 are plain CholeskyQR (= CholeskyQR2 on the preconditioned
    Q1).  All m-scale work is GEMMs.
    """
    policy = modes.resolve(mode)
    mm = policy.mm
    a = a.astype(jnp.float32)
    m, n = a.shape
    g = modes.gram(a, policy)
    # shift ~ 11 (mn + n(n+1)) eps ||G||_2; use trace as a cheap ||G||_2
    # upper bound (Fukaya et al. 2020 use ||A||_2^2 = ||G||_2)
    eps = jnp.float32(6.0e-8)
    gnorm = jnp.trace(g)  # = ||A||_F^2 >= ||G||_2 (safe upper bound)
    shift = 11.0 * (m * n + n * (n + 1)) * eps * gnorm
    r1 = _chol_r(g, shift=shift)
    q1 = _q_pass(a, r1, mm)
    q2, r2 = cholqr2(q1, policy)
    r = jnp.triu(modes.mm_fp32(r2.astype(jnp.float32), r1))
    return q2.astype(policy.io_dtype), r.astype(policy.io_dtype)


def _rinv(r: Array) -> Array:
    n = r.shape[-1]
    return jax.scipy.linalg.solve_triangular(
        r, jnp.eye(n, dtype=r.dtype), lower=False)


def cholqr2_fused(a: Array,
                  mode: modes.ComputeMode | str | modes.Policy = "fp32",
                  interpret: bool = False) -> tuple[Array, Array]:
    """CholeskyQR2 on the streaming Pallas kernels: reads A twice, writes
    Q1/Q2 once each — the HBM-roofline implementation (see
    ops/pallas_gram.py).

    Narrow panels delegate to the XLA variant: below ~half a lane tile the
    streaming kernels waste most of each (chunk, 128) lane tile (measured
    at n=16: 5.1 ms fused vs ~0.1 ms XLA for m=2^20)."""
    from tsqr_tpu.ops import pallas_gram

    if a.shape[1] < 64:
        return cholqr2(a, mode)

    policy = modes.resolve(mode)
    mname = policy.mode.value
    a = a.astype(jnp.float32)
    g = pallas_gram.gram_pallas(a, mname, interpret=interpret)
    r1 = _chol_r(g)
    q1, g2 = pallas_gram.qpass_pallas(a, _rinv(r1), mname,
                                      interpret=interpret, with_gram=True)
    r2 = _chol_r(g2)
    q = pallas_gram.qpass_pallas(q1, _rinv(r2), mname, interpret=interpret,
                                 with_gram=False)
    r = jnp.triu(modes.mm_fp32(r2, r1))
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)


def cholqr3_fused(a: Array,
                  mode: modes.ComputeMode | str | modes.Policy = "fp32",
                  interpret: bool = False) -> tuple[Array, Array]:
    """Shifted CholeskyQR3 on the streaming kernels (narrow panels
    delegate to the XLA variant, see cholqr2_fused)."""
    from tsqr_tpu.ops import pallas_gram

    if a.shape[1] < 64:
        return cholqr3(a, mode)

    policy = modes.resolve(mode)
    mname = policy.mode.value
    a = a.astype(jnp.float32)
    m, n = a.shape
    g = pallas_gram.gram_pallas(a, mname, interpret=interpret)
    eps = jnp.float32(6.0e-8)
    shift = 11.0 * (m * n + n * (n + 1)) * eps * jnp.trace(g)
    r1 = _chol_r(g, shift=shift)
    q1, g2 = pallas_gram.qpass_pallas(a, _rinv(r1), mname,
                                      interpret=interpret, with_gram=True)
    r2 = _chol_r(g2)
    q2, g3 = pallas_gram.qpass_pallas(q1, _rinv(r2), mname,
                                      interpret=interpret, with_gram=True)
    r3 = _chol_r(g3)
    q = pallas_gram.qpass_pallas(q2, _rinv(r3), mname, interpret=interpret,
                                 with_gram=False)
    r = jnp.triu(modes.mm_fp32(r3, modes.mm_fp32(r2, r1)))
    return q.astype(policy.io_dtype), r.astype(policy.io_dtype)


_METHODS = {"cholqr2": cholqr2, "cholqr3": cholqr3,
            "cholqr2_fused": cholqr2_fused, "cholqr3_fused": cholqr3_fused}


@functools.partial(jax.jit, static_argnames=("mode", "method"))
def fastqr(a: Array,
           mode: modes.ComputeMode | str | modes.Policy = modes.ComputeMode.FP32,
           method: str = "cholqr3") -> tuple[Array, Array]:
    """MXU-native tall-skinny QR (single jit entry point).

    methods: cholqr2 / cholqr3 (pure XLA) and cholqr2_fused /
    cholqr3_fused (streaming Pallas kernels, TPU only).
    """
    return _METHODS[method](a, mode)
